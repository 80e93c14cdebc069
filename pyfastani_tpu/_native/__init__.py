"""Native host runtime (C extension) with a pure-Python fallback.

``HAVE_NATIVE`` is True when the compiled module is importable; callers
use `parse_fasta`, `copy_upper`, `reverse_complement`, `murmur3_32`
regardless and get the fastest available implementation.
"""

from __future__ import annotations

try:
    from ._native import (  # noqa: F401
        copy_upper,
        csr_bounds,
        hist_prefix,
        max_window_count,
        murmur3_32,
        parse_fasta,
        reverse_complement,
        sort_u32_perm,
        take32,
        winnow,
    )

    HAVE_NATIVE = True

    import numpy as _np

    def argsort_u32_stable(keys):
        """Stable argsort of a uint32 array (threaded C radix sort)."""
        keys = _np.ascontiguousarray(keys, dtype=_np.uint32)
        return _np.frombuffer(sort_u32_perm(keys.data), dtype=_np.int32)

    def take_4byte(values, idx):
        """values[idx] for 4-byte-element arrays (threaded C gather)."""
        v = _np.ascontiguousarray(values)
        ix = _np.ascontiguousarray(idx, dtype=_np.int32)
        return _np.frombuffer(take32(v.data, ix.data), dtype=values.dtype)

    def csr_groups(sorted_keys):
        """(uniq u32, row_start i32, row_len i32) of an ascending u32
        array (threaded C two-pass)."""
        k = _np.ascontiguousarray(sorted_keys, dtype=_np.uint32)
        uq, rs, rl = csr_bounds(k.data)
        return (
            _np.frombuffer(uq, dtype=_np.uint32),
            _np.frombuffer(rs, dtype=_np.int32),
            _np.frombuffer(rl, dtype=_np.int32),
        )

    def prefix_hist(keys, shift, bits):
        """Histogram of ``keys >> shift`` into 2^bits i32 bins."""
        k = _np.ascontiguousarray(keys, dtype=_np.uint32)
        return _np.frombuffer(hist_prefix(k.data, shift, bits), dtype=_np.int32)

    def densest_window(sorted_vals, window):
        """Max count of an ascending i32 array in any [v, v+window)."""
        v = _np.ascontiguousarray(sorted_vals, dtype=_np.int32)
        return int(max_window_count(v.data, int(window)))
except ImportError:  # pragma: no cover - exercised when unbuilt
    HAVE_NATIVE = False

    import numpy as _np

    from ..ops import codec as _codec
    from ..ops import murmur3 as _m3

    def copy_upper(data):
        return _codec.upper_inplace(
            _np.frombuffer(bytes(data), dtype=_np.uint8)
        ).tobytes()

    def reverse_complement(data):
        return _codec.reverse_complement(
            _np.frombuffer(bytes(data), dtype=_np.uint8)
        ).tobytes()

    def murmur3_32(data, seed=42):
        return _m3.murmur3_32(bytes(data), seed)

    def parse_fasta(path):
        from .._fasta import Parser

        return [(r.id, r.seq) for r in Parser(path)]

    def winnow(data, k, w, protein=False):
        from ..models._engine_np import winnow_sequence
        from ..models._params import Parameters

        params = Parameters(
            kmer_size=k,
            window_size=w,
            alphabet_size=20 if protein else 4,
        )
        h, p = winnow_sequence(
            _np.frombuffer(bytes(data), dtype=_np.uint8), params
        )
        return h.tobytes(), p.tobytes()

    def argsort_u32_stable(keys):
        return _np.argsort(
            _np.asarray(keys, dtype=_np.uint32), kind="stable"
        ).astype(_np.int32)

    def take_4byte(values, idx):
        return _np.asarray(values)[_np.asarray(idx)]

    def csr_groups(sorted_keys):
        k = _np.asarray(sorted_keys, dtype=_np.uint32)
        n = k.shape[0]
        if n == 0:
            return (
                _np.zeros(0, _np.uint32),
                _np.zeros(0, _np.int32),
                _np.zeros(0, _np.int32),
            )
        new = _np.empty(n, dtype=bool)
        new[0] = True
        _np.not_equal(k[1:], k[:-1], out=new[1:])
        first = _np.flatnonzero(new)
        rl = _np.empty(first.shape[0], _np.int32)
        _np.subtract(first[1:], first[:-1], out=rl[:-1], casting="unsafe")
        rl[-1] = n - first[-1]
        return k[first], first.astype(_np.int32), rl

    def prefix_hist(keys, shift, bits):
        k = _np.asarray(keys, dtype=_np.uint32)
        return _np.bincount(
            (k >> _np.uint32(shift)).astype(_np.int64), minlength=1 << bits
        ).astype(_np.int32)

    def densest_window(sorted_vals, window):
        v = _np.asarray(sorted_vals, dtype=_np.int64)
        hi = _np.searchsorted(v, v + int(window), side="left")
        return int((hi - _np.arange(v.shape[0])).max(initial=0))

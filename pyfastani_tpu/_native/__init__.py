"""Native host runtime (C extension) with a pure-Python fallback.

``HAVE_NATIVE`` is True when the compiled module is importable; callers
use `parse_fasta`, `copy_upper`, `reverse_complement`, `murmur3_32`
regardless and get the fastest available implementation.
"""

from __future__ import annotations

try:
    from ._native import (  # noqa: F401
        copy_upper,
        murmur3_32,
        parse_fasta,
        reverse_complement,
        winnow,
    )

    HAVE_NATIVE = True
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

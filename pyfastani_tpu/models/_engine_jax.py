"""Device (JAX/TPU) query engine.

Pipeline split, designed for the hardware rather than ported from the
reference's thread pool (``_fastani.pyx:1006-1136``):

* **winnowing + sketching** of all fragments of a genome in one jitted,
  batched program (`ops.fragments`) -- bandwidth-bound VPU work;
* **posting probes / L1 candidate generation** on the host in vectorized
  NumPy -- tiny, irregular, latency-bound work (a few hundred seed hits
  per fragment) shared with the host engine for bitwise agreement;
* **L2 sliding intersection** as batched MXU contractions over
  fixed-width offset chunks (`ops.l2`);
* **identity / gate / CGI** on the host in one float32 code path shared
  with the host engine.

All device outputs are integers, so `backend="jax"` and `backend="numpy"`
produce identical hits.
"""

from __future__ import annotations

import numpy as np

from .. import stats
from ..ops import fragments as frag_ops
from ..ops import l2 as l2_ops
from . import _engine_np as np_engine

__all__ = ["query_contigs", "winnow_sequence_device"]

_CMAX = 256


def _bucket(n: int, lo: int = 16) -> int:
    return max(lo, 1 << int(max(n, 1) - 1).bit_length())


def winnow_sequence_device(data: np.ndarray, params) -> tuple:
    """Device equivalent of `np_engine.winnow_sequence` (bitwise identical)."""
    k, w = params.kmer_size, params.window_size
    n = int(data.shape[0])
    if n - k + 1 < 1 or n - k + 1 - w + 1 < 1:
        return (np.zeros(0, np.uint32), np.zeros(0, np.int32))
    return frag_ops.winnow_long_sequence(data, k, w, params.alphabet_size != 4)


def query_contigs(mapper, contig_arrays):
    """Full per-genome query pipeline on device; mirrors
    `np_engine.query_contigs_np` output exactly."""
    params = mapper._param
    index = mapper._index
    l = params.min_read_length
    k, w = params.kmer_size, params.window_size
    cmw = l - (k - 1)  # see the width note in _engine_np._map_fragment

    # 1. assemble fragments (the thread-pool axis becomes a batch axis)
    frag_list = []
    frag_qid = []
    total_fragments = 0
    total_length = 0
    for data in contig_arrays:
        slen = int(data.shape[0])
        n_frag = slen // l
        for i in range(n_frag):
            frag_list.append(data[i * l : (i + 1) * l])
            frag_qid.append(total_fragments + i)
        total_fragments += n_frag
        total_length += slen
    if not frag_list:
        return [], total_fragments, total_length

    F = len(frag_list)
    Fb = _bucket(F)
    frags = np.zeros((Fb, l), dtype=np.uint8)
    frags[:F] = np.stack(frag_list)

    # 2. device winnow + sketch
    q_sorted, s_sizes = frag_ops.winnow_fragments(
        frags, k, w, params.alphabet_size != 4
    )
    if s_sizes.min(initial=0) < 0:
        raise RuntimeError("fragment minimizer record count exceeded 1024")
    q_sorted, s_sizes = q_sorted[:F], s_sizes[:F]
    s_max = int(s_sizes.max(initial=1))
    Sb = _bucket(s_max)
    q_trim = np.ascontiguousarray(q_sorted[:, :Sb])

    # 3. host: per-fragment L1 candidates (shared with the host engine)
    min_hits_tab = stats.min_hits_relaxed_table(
        max(s_max, 1), k, params.percentage_identity
    )
    ivs = []  # (frag_row, seqId, c0, c1)
    for f in range(F):
        s = int(s_sizes[f])
        if s == 0:
            continue
        q_uniq = q_trim[f, :s]
        iv_seq, iv_start, iv_end = np_engine._l1_candidates(
            q_uniq, index, params, int(min_hits_tab[s])
        )
        for t in range(iv_seq.shape[0]):
            ivs.append((f, int(iv_seq[t]), int(iv_start[t]), int(iv_end[t])))
    if not ivs:
        return [], total_fragments, total_length

    # 4. split intervals into fixed-width offset chunks + ref-mini ranges
    keys = (index.mini_seqid.astype(np.int64) << 32) | index.mini_wpos.astype(
        np.int64
    )
    chunk_rows = []
    chunk_iv = []
    for ivid, (f, sid, c0, c1) in enumerate(ivs):
        span = c1 - c0 + 1
        for off in range(0, span, _CMAX):
            cc0 = c0 + off
            clen = min(_CMAX, span - off)
            lo = int(np.searchsorted(keys, (np.int64(sid) << 32) | np.int64(cc0)))
            hi = int(
                np.searchsorted(
                    keys, (np.int64(sid) << 32) | np.int64(cc0 + clen - 1 + cmw)
                )
            )
            chunk_rows.append((f, cc0, clen, lo, hi - lo))
            chunk_iv.append(ivid)
    chunks = np.asarray(chunk_rows, dtype=np.int32)
    chunk_iv = np.asarray(chunk_iv, dtype=np.int64)

    # 5. device L2
    best, first, last = l2_ops.l2_chunk_scan(
        q_trim, s_sizes, index.mini_hash, index.mini_wpos, chunks, cmw, _CMAX
    )

    # 6. merge chunks per interval: max + first/last argmax are associative
    n_iv = len(ivs)
    iv_best = np.full(n_iv, -1, dtype=np.int64)
    np.maximum.at(iv_best, chunk_iv, best.astype(np.int64))
    is_best = best.astype(np.int64) == iv_best[chunk_iv]
    iv_first = np.full(n_iv, 2**31 - 1, dtype=np.int64)
    np.minimum.at(iv_first, chunk_iv[is_best], first[is_best].astype(np.int64))
    iv_last = np.full(n_iv, -1, dtype=np.int64)
    np.maximum.at(iv_last, chunk_iv[is_best], last[is_best].astype(np.int64))

    # 7. identity + gate (same float32 path as the host engine)
    mappings = []
    for ivid, (f, sid, c0, c1) in enumerate(ivs):
        bestv = int(iv_best[ivid])
        if bestv <= 0:
            continue
        s = int(s_sizes[f])
        # plateau midpoint of best record anchors, reported at window end
        # (+cmw-1) -- see the position note in _engine_np._map_fragment
        mean_optimal = (int(iv_first[ivid]) + int(iv_last[ivid])) // 2 + (cmw - 1)
        jaccard = 1.0 * bestv / s
        mash = stats.j2md(jaccard, k)
        identity = float(np.float32(100.0 * (1.0 - mash)))
        d_lower = stats.md_lower_bound(mash, s, k, stats.CONFIDENCE_INTERVAL)
        identity_ub = float(np.float32(100.0 * (1.0 - d_lower)))
        if np.float32(identity_ub) >= np.float32(params.percentage_identity):
            mappings.append(
                np_engine.Mapping(
                    query_seq_id=frag_qid[f],
                    ref_seq_id=sid,
                    ref_start=mean_optimal,
                    shared=bestv,
                    sketch_size=s,
                    identity=identity,
                )
            )
    return mappings, total_fragments, total_length

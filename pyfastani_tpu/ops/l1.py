"""Device L1 stage: posting probes, seed gathering, candidate intervals.

The host engines run this stage in NumPy (it is tiny per genome); the
multi-chip pipeline needs it on device so the whole query step is one
jitted program.  All stages are static-shape with explicit budgets:

* ``hmax``: seed hits per fragment (overflow reported, not silently lost);
* ``ivmax``: merged candidate intervals per fragment.

Semantics mirror ``Mapper._do_l1_mappings`` + [reconstructed]
``computeL1CandidateRegions`` (``_fastani.pyx:885-954``,
``compute_map.pxd:41-44``): probe the CSR index per unique sketch hash,
skip rows at/above the frequency threshold, sort seed hits by
(seqId, wpos), find windows of ``m`` consecutive hits spanning < l, and
merge overlapping candidates.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.jaxconfig import configure as _configure_jax

_configure_jax()

__all__ = ["l1_candidates_device"]

# numpy scalar, NOT jnp: module-level jnp arrays become device-committed
# after one execution and then get lifted into extra executable parameters
# on re-trace, which this platform's dispatch fast path drops
_BIG = np.int32(2**30)


@functools.partial(
    jax.jit, static_argnames=("hmax", "ivmax", "l", "bucket_steps")
)
def l1_candidates_device(
    q_sorted,  # (F, S) u32 ascending sketch hashes, UMAX padded
    s_sizes,  # (F,) i32
    uniq_hash,  # (U,) u32
    row_start,  # (U,) i32
    row_len,  # (U,) i32
    post_seqid,  # (M,) i32
    post_wpos,  # (M,) i32
    freq_threshold,  # scalar i32
    min_hits_table,  # (T,) i32, indexed by sketch size (clipped)
    hash_bucket,  # (65537,) i32 prefix over uniq_hash >> 16
    hmax: int,
    ivmax: int,
    l: int,
    bucket_steps: int = 21,
):
    """Returns (iv_seq, iv_c0, iv_c1, iv_valid, ovf_hits, ovf_iv):
    (F, ivmax) x3, (F, ivmax) bool, and two scalar bools flagging which
    static budget (hmax / ivmax) overflowed."""
    F, S = q_sorted.shape
    M = post_seqid.shape[0]
    U = uniq_hash.shape[0]

    # --- probe the CSR index ------------------------------------------------
    # bucketed binary search: the 2^16-entry prefix narrows each probe to
    # its high-16-bit bucket, so only ~log2(max bucket) gather steps remain
    b = (q_sorted >> jnp.uint32(16)).astype(jnp.int32)
    lo = hash_bucket[b]
    hi = hash_bucket[b + 1]
    for _ in range(bucket_steps):
        active = lo < hi
        mid = (lo + hi) // 2
        mid_c = jnp.clip(mid, 0, max(U - 1, 0))
        go_right = uniq_hash[mid_c] < q_sorted
        lo = jnp.where(active & go_right, mid + 1, lo)
        hi = jnp.where(active & ~go_right, mid, hi)
    rows = lo  # (F, S) insertion points
    rows_c = jnp.clip(rows, 0, max(U - 1, 0))
    i_idx = jnp.arange(S, dtype=jnp.int32)[None, :]
    found = (
        (rows < U)
        & (uniq_hash[rows_c] == q_sorted)
        & (i_idx < s_sizes[:, None])
    )
    lens = jnp.where(
        found & (row_len[rows_c] < freq_threshold), row_len[rows_c], 0
    ).astype(jnp.int32)  # (F, S)

    # --- gather posting rows into a padded per-fragment hit buffer ----------
    off_end = jnp.cumsum(lens, axis=1)  # (F, S) exclusive-end offsets
    total = off_end[:, -1]  # (F,)
    ovf_hits = jnp.any(total > hmax)

    h_idx = jnp.arange(hmax, dtype=jnp.int32)[None, :]  # (1, H)
    # segment owning output slot h: first seg with off_end > h.  Built by
    # scattering each non-empty segment's id at its begin offset and
    # cummax-filling forward -- much cheaper on TPU than a binary search
    # per output slot.
    off_begin = off_end - lens  # (F, S)
    s_ids = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None, :], (F, S))
    scat_col = jnp.where(lens > 0, jnp.minimum(off_begin, hmax), hmax)
    seg = jnp.zeros((F, hmax + 1), jnp.int32)
    seg = seg.at[jnp.arange(F, dtype=jnp.int32)[:, None], scat_col].max(s_ids)
    seg = jax.lax.cummax(seg[:, :hmax], axis=1)  # (F, H)
    seg_c = jnp.clip(seg, 0, S - 1)
    seg_begin = off_end[jnp.arange(F)[:, None], seg_c] - lens[
        jnp.arange(F)[:, None], seg_c
    ]
    src = row_start[rows_c[jnp.arange(F)[:, None], seg_c]] + (h_idx - seg_begin)
    valid_h = h_idx < jnp.minimum(total, hmax)[:, None]
    src_c = jnp.clip(src, 0, max(M - 1, 0))
    hit_seq = jnp.where(valid_h, post_seqid[src_c], _BIG)
    hit_pos = jnp.where(valid_h, post_wpos[src_c], _BIG)

    # --- sort hits by (seqId, wpos) -----------------------------------------
    hit_seq, hit_pos = jax.lax.sort((hit_seq, hit_pos), num_keys=2)

    # --- m-consecutive-hit candidate windows --------------------------------
    m = min_hits_table[jnp.clip(s_sizes, 0, min_hits_table.shape[0] - 1)]
    m = jnp.maximum(m, 1)  # (F,)
    j_idx = jnp.arange(hmax, dtype=jnp.int32)[None, :]
    j2 = jnp.clip(j_idx + m[:, None] - 1, 0, hmax - 1)
    seq_j2 = jnp.take_along_axis(hit_seq, j2, axis=1)
    pos_j2 = jnp.take_along_axis(hit_pos, j2, axis=1)
    cand_ok = (
        (j_idx + m[:, None] - 1 < hmax)
        & (hit_seq < _BIG)
        & (seq_j2 == hit_seq)
        & (pos_j2 - hit_pos < l)
    )
    cand_start = jnp.maximum(0, pos_j2 - l + 1)
    cand_end = hit_pos

    # --- merge overlapping candidates (in place) ----------------------------
    # candidates are already in (seq, pos) order; the previous *valid*
    # candidate is found with an exclusive cummax scan instead of an
    # argsort compaction (argsort + gathers dominated this stage on TPU)
    # last-valid-candidate (seq, end) via a log-doubling masked-lag scan
    # (shift+select passes; cheaper than gathers on this platform)
    pv = cand_ok
    ps, pe = hit_seq, hit_pos
    step = 1
    while step < hmax:
        sv = jnp.concatenate([jnp.zeros((F, step), bool), pv[:, :-step]], axis=1)
        ss = jnp.concatenate([jnp.full((F, step), -1, jnp.int32), ps[:, :-step]], axis=1)
        se = jnp.concatenate([jnp.full((F, step), -_BIG, jnp.int32), pe[:, :-step]], axis=1)
        keep = pv
        ps = jnp.where(keep, ps, ss)
        pe = jnp.where(keep, pe, se)
        pv = keep | sv
        step *= 2
    prev_v = jnp.concatenate([jnp.zeros((F, 1), bool), pv[:, :-1]], axis=1)
    prev_seq = jnp.concatenate([jnp.full((F, 1), -1, jnp.int32), ps[:, :-1]], axis=1)
    prev_end = jnp.concatenate([jnp.full((F, 1), -_BIG, jnp.int32), pe[:, :-1]], axis=1)
    boundary = cand_ok & (
        (~prev_v) | (hit_seq != prev_seq) | (cand_start > prev_end)
    )
    iv_id = jnp.cumsum(boundary.astype(jnp.int32), axis=1) - 1  # (F, H)
    iv_id = jnp.where(cand_ok, iv_id, -1)
    n_iv = jnp.max(iv_id, axis=1) + 1  # (F,)
    ovf_iv = jnp.any(n_iv > ivmax)

    # segment-reduce candidate members into interval slots
    flat_seg = jnp.where(
        iv_id >= 0,
        jnp.arange(F, dtype=jnp.int32)[:, None] * ivmax + jnp.clip(iv_id, 0, ivmax - 1),
        F * ivmax,
    ).reshape(-1)
    iv_seq = jax.ops.segment_min(
        jnp.where(cand_ok, hit_seq, _BIG).reshape(-1),
        flat_seg,
        num_segments=F * ivmax + 1,
    )[: F * ivmax].reshape(F, ivmax)
    iv_c0 = jax.ops.segment_min(
        jnp.where(cand_ok, cand_start, _BIG).reshape(-1),
        flat_seg,
        num_segments=F * ivmax + 1,
    )[: F * ivmax].reshape(F, ivmax)
    iv_c1 = jax.ops.segment_max(
        jnp.where(cand_ok, cand_end, -_BIG).reshape(-1),
        flat_seg,
        num_segments=F * ivmax + 1,
    )[: F * ivmax].reshape(F, ivmax)
    iv_valid = (
        jnp.arange(ivmax, dtype=jnp.int32)[None, :] < jnp.minimum(n_iv, ivmax)[:, None]
    )
    return iv_seq, iv_c0, iv_c1, iv_valid, ovf_hits, ovf_iv

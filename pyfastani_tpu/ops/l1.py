"""Device L1 stage: posting probes, seed gathering, candidate intervals.

The host engines run this stage in NumPy (it is tiny per genome); the
multi-chip pipeline needs it on device so the whole query step is one
jitted program.  All stages are static-shape with explicit budgets:

* ``hmax``: seed hits per fragment **on average** -- the hit buffer is a
  single flat axis of ``F * hmax`` slots shared by the whole fragment
  batch, so one fragment pulling a long posting row borrows capacity
  from the others instead of forcing every row to the worst case.  (The
  previous formulation padded a dense ``(F, hmax)`` buffer to the worst
  single fragment; with typical fragments carrying a few hundred seed
  hits that made the sort/scan >95% padding work -- the dominant stage
  cost on TPU.)  Overflow of the *total* is reported, never silent;
* ``ivmax``: merged candidate intervals per fragment.

Semantics mirror ``Mapper._do_l1_mappings`` + [reconstructed]
``computeL1CandidateRegions`` (``_fastani.pyx:885-954``,
``compute_map.pxd:41-44``): probe the CSR index per unique sketch hash,
skip rows at/above the frequency threshold, sort seed hits by
(fragment, seqId, wpos), find windows of ``m`` consecutive hits spanning
< l, and merge overlapping candidates.
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
    static budget (hmax / ivmax) overflowed.  Hit capacity is
    ``F * hmax`` *in total* (see module docstring)."""
    F, S = q_sorted.shape
    M = post_seqid.shape[0]
    U = uniq_hash.shape[0]
    T = F * hmax  # flat hit capacity shared across the fragment batch

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

    # --- gather posting rows into ONE flat hit buffer -----------------------
    lens_flat = lens.reshape(-1)  # (F*S,) probe order == fragment order
    off_end = jnp.cumsum(lens_flat)
    total = off_end[-1]
    ovf_hits = total > T
    off_begin = off_end - lens_flat

    # probe owning output slot t: scatter each non-empty probe's id at its
    # begin offset and cummax-fill forward -- much cheaper on TPU than a
    # binary search per output slot.
    probe_ids = jnp.arange(F * S, dtype=jnp.int32)
    scat = jnp.where(lens_flat > 0, jnp.minimum(off_begin, T), T)
    seg = jnp.zeros((T + 1,), jnp.int32).at[scat].max(probe_ids)
    seg = jax.lax.cummax(seg[:T])  # (T,)
    t_idx = jnp.arange(T, dtype=jnp.int32)
    src = row_start[rows_c.reshape(-1)[seg]] + (t_idx - off_begin[seg])
    valid_t = t_idx < jnp.minimum(total, T)
    src_c = jnp.clip(src, 0, max(M - 1, 0))
    hit_frag = jnp.where(valid_t, seg // S, F)
    hit_seq = jnp.where(valid_t, post_seqid[src_c], _BIG)
    hit_pos = jnp.where(valid_t, post_wpos[src_c], _BIG)

    # --- sort hits by (fragment, seqId, wpos) -------------------------------
    hit_frag, hit_seq, hit_pos = jax.lax.sort(
        (hit_frag, hit_seq, hit_pos), num_keys=3
    )

    # --- m-consecutive-hit candidate windows --------------------------------
    m = min_hits_table[jnp.clip(s_sizes, 0, min_hits_table.shape[0] - 1)]
    m = jnp.maximum(m, 1)  # (F,)
    m_t = m[jnp.clip(hit_frag, 0, F - 1)]
    j2 = jnp.clip(t_idx + m_t - 1, 0, T - 1)
    frag_j2 = hit_frag[j2]
    seq_j2 = hit_seq[j2]
    pos_j2 = hit_pos[j2]
    cand_ok = (
        (hit_frag < F)
        & (hit_seq < _BIG)
        & (t_idx + m_t - 1 < T)
        & (frag_j2 == hit_frag)
        & (seq_j2 == hit_seq)
        & (pos_j2 - hit_pos < l)
    )
    cand_start = jnp.maximum(0, pos_j2 - l + 1)
    cand_end = hit_pos

    # --- merge overlapping candidates (in place) ----------------------------
    # candidates are in (frag, seq, pos) order; the previous *valid*
    # candidate is one exclusive cummax of marked indices + one gather
    cand_idx = jnp.where(cand_ok, t_idx, -1)
    prev_idx = jnp.concatenate(
        [jnp.full((1,), -1, jnp.int32), jax.lax.cummax(cand_idx)[:-1]]
    )
    p_c = jnp.clip(prev_idx, 0, T - 1)
    boundary = cand_ok & (
        (prev_idx < 0)
        | (hit_frag[p_c] != hit_frag)
        | (hit_seq[p_c] != hit_seq)
        | (cand_start > hit_pos[p_c])
    )
    b_cum = jnp.cumsum(boundary.astype(jnp.int32))
    b_excl = b_cum - boundary
    # boundaries before each fragment's first hit slot
    frag_start = off_begin.reshape(F, S)[:, 0]
    base = b_excl[jnp.clip(frag_start, 0, T - 1)]  # (F,)
    iv_local = jnp.where(
        cand_ok, (b_cum - 1) - base[jnp.clip(hit_frag, 0, F - 1)], -1
    )
    n_iv = (
        jax.ops.segment_max(
            iv_local, jnp.where(cand_ok, hit_frag, F), num_segments=F + 1
        )[:F]
        + 1
    )
    ovf_iv = jnp.any(n_iv > ivmax)

    # segment-reduce candidate members into interval slots
    flat_seg = jnp.where(
        iv_local >= 0,
        hit_frag * ivmax + jnp.clip(iv_local, 0, ivmax - 1),
        F * ivmax,
    )
    iv_seq = jax.ops.segment_min(
        jnp.where(cand_ok, hit_seq, _BIG),
        flat_seg,
        num_segments=F * ivmax + 1,
    )[: F * ivmax].reshape(F, ivmax)
    iv_c0 = jax.ops.segment_min(
        jnp.where(cand_ok, cand_start, _BIG),
        flat_seg,
        num_segments=F * ivmax + 1,
    )[: F * ivmax].reshape(F, ivmax)
    iv_c1 = jax.ops.segment_max(
        jnp.where(cand_ok, cand_end, -_BIG),
        flat_seg,
        num_segments=F * ivmax + 1,
    )[: F * ivmax].reshape(F, ivmax)
    iv_valid = (
        jnp.arange(ivmax, dtype=jnp.int32)[None, :]
        < jnp.minimum(n_iv, ivmax)[:, None]
    )
    return iv_seq, iv_c0, iv_c1, iv_valid, ovf_hits, ovf_iv

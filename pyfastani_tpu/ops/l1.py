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

TPU cost model (measured on v5e, benches/profile_l1_micro.py): random
1-element gathers cost ~28 ns each but a 12-byte row costs the same DMA
descriptor as a 4-byte one, so every multi-array lookup here gathers ONE
packed row; flat ``lax.cumsum``/``cummax`` over ~1M elements costs ~25 ms
(21 shifted passes), so scans run 2-level over a (rows, 512) reshape;
``jax.ops.segment_*`` lowers to a serialized scatter (~36 ms per call),
so the three interval reductions pack into a single ``segment_max`` and
the per-fragment interval count is derived from the boundary prefix sum
with gathers instead of a fourth scatter.

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

_SCAN_COLS = 512  # 2-level scan row width


def _scan2(op, x):
    """Flat inclusive scan via a (rows, 512) decomposition.

    A 1-D ``lax.cumsum``/``cummax`` over ~1M elements runs ~21 shifted
    full-array passes (~25 ms measured); scanning the minor axis of a 2-D
    reshape vectorizes across rows and only the tiny row-carry scan stays
    1-D.  Falls back to the flat scan when the length doesn't divide.
    """
    n = x.shape[0]
    if n % _SCAN_COLS or n <= _SCAN_COLS:
        return op(x)
    r = n // _SCAN_COLS
    x2 = x.reshape(r, _SCAN_COLS)
    rows = op(x2, axis=1)
    carry = op(rows[:, -1])
    if op is jax.lax.cumsum:
        full = rows + jnp.concatenate(
            [jnp.zeros((1,), x.dtype), carry[:-1]]
        )[:, None]
    else:
        lowest = jnp.iinfo(x.dtype).min
        full = jnp.maximum(
            rows,
            jnp.concatenate([jnp.full((1,), lowest, x.dtype), carry[:-1]])[
                :, None
            ],
        )
    return full.reshape(n)


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
    hash_bucket,  # (2^bits + 1,) i32 prefix over uniq_hash >> (32 - bits)
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
    # bucketed binary search: the adaptive hash-prefix table narrows each
    # probe to its bucket, so only ~log2(max bucket) gather steps remain
    bits = int(hash_bucket.shape[0] - 1).bit_length() - 1
    b = (q_sorted >> jnp.uint32(32 - bits)).astype(jnp.int32)
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
    # one packed row lookup for (hash, row_len, row_start)
    q_i = jax.lax.bitcast_convert_type(q_sorted, jnp.int32)
    utab = jnp.stack(
        [
            jax.lax.bitcast_convert_type(uniq_hash, jnp.int32),
            row_len,
            row_start,
        ],
        axis=1,
    )  # (U, 3)
    at_row = utab[rows_c]  # (F, S, 3)
    i_idx = jnp.arange(S, dtype=jnp.int32)[None, :]
    found = (rows < U) & (at_row[:, :, 0] == q_i) & (i_idx < s_sizes[:, None])
    lens = jnp.where(
        found & (at_row[:, :, 1] < freq_threshold), at_row[:, :, 1], 0
    ).astype(jnp.int32)  # (F, S)

    # --- gather posting rows into ONE flat hit buffer -----------------------
    lens_flat = lens.reshape(-1)  # (F*S,) probe order == fragment order
    off_end = _scan2(jax.lax.cumsum, lens_flat)
    total = off_end[-1]
    ovf_hits = total > T
    off_begin = off_end - lens_flat

    # probe owning output slot t: scatter each non-empty probe's id at its
    # begin offset and cummax-fill forward -- much cheaper on TPU than a
    # binary search per output slot.
    probe_ids = jnp.arange(F * S, dtype=jnp.int32)
    scat = jnp.where(lens_flat > 0, jnp.minimum(off_begin, T), T)
    seg = jnp.zeros((T + 1,), jnp.int32).at[scat].max(probe_ids)
    seg = _scan2(jax.lax.cummax, seg[:T])  # (T,)
    t_idx = jnp.arange(T, dtype=jnp.int32)
    # per-probe (row_start - off_begin) packed once, gathered once at seg
    delta = at_row[:, :, 2].reshape(-1) - off_begin  # (F*S,)
    src = delta[seg] + t_idx
    valid_t = t_idx < jnp.minimum(total, T)
    src_c = jnp.clip(src, 0, max(M - 1, 0))
    hit_frag = jnp.where(valid_t, seg // S, F)
    # one paired gather instead of two (see module docstring cost model)
    post_pair = jnp.stack([post_seqid, post_wpos], axis=1)  # (M, 2)
    hits2 = post_pair[src_c]  # (T, 2)
    hit_seq = jnp.where(valid_t, hits2[:, 0], _BIG)
    hit_pos = jnp.where(valid_t, hits2[:, 1], _BIG)

    # --- sort hits by (fragment, seqId, wpos) -------------------------------
    hit_frag, hit_seq, hit_pos = jax.lax.sort(
        (hit_frag, hit_seq, hit_pos), num_keys=3
    )

    # --- m-consecutive-hit candidate windows --------------------------------
    m = min_hits_table[jnp.clip(s_sizes, 0, min_hits_table.shape[0] - 1)]
    m = jnp.maximum(m, 1)  # (F,)
    m_t = m[jnp.clip(hit_frag, 0, F - 1)]
    j2 = jnp.clip(t_idx + m_t - 1, 0, T - 1)
    hits3 = jnp.stack([hit_frag, hit_seq, hit_pos], axis=1)  # (T, 3)
    at_j2 = hits3[j2]  # one 12-byte gather, not three 4-byte ones
    frag_j2 = at_j2[:, 0]
    seq_j2 = at_j2[:, 1]
    pos_j2 = at_j2[:, 2]
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
        [jnp.full((1,), -1, jnp.int32), _scan2(jax.lax.cummax, cand_idx)[:-1]]
    )
    p_c = jnp.clip(prev_idx, 0, T - 1)
    at_prev = hits3[p_c]
    boundary = cand_ok & (
        (prev_idx < 0)
        | (at_prev[:, 0] != hit_frag)
        | (at_prev[:, 1] != hit_seq)
        | (cand_start > at_prev[:, 2])
    )
    b_cum = _scan2(jax.lax.cumsum, boundary.astype(jnp.int32))
    b_excl = b_cum - boundary
    # boundaries before slot t live in b_excl; extend by the grand total
    # so per-fragment interval counts come from two gathers, not a scatter
    b_ext = jnp.concatenate([b_excl, b_cum[-1:]])  # (T + 1,)
    frag_start = off_begin.reshape(F, S)[:, 0]
    frag_next = jnp.concatenate(
        [frag_start[1:], jnp.minimum(total, T)[None]]
    )
    base = b_ext[jnp.clip(frag_start, 0, T)]  # (F,)
    n_iv = b_ext[jnp.clip(frag_next, 0, T)] - base
    ovf_iv = jnp.any(n_iv > ivmax)

    iv_local = jnp.where(
        cand_ok, (b_cum - 1) - base[jnp.clip(hit_frag, 0, F - 1)], -1
    )

    # ONE packed segment reduction for the three interval aggregates:
    # within a merged interval, seqId is constant (max == the value) and
    # cand_start is nondecreasing (max of the negation == the min)
    flat_seg = jnp.where(
        iv_local >= 0,
        hit_frag * ivmax + jnp.clip(iv_local, 0, ivmax - 1),
        F * ivmax,
    )
    packed = jnp.stack(
        [
            jnp.where(cand_ok, hit_seq, -_BIG),
            jnp.where(cand_ok, -cand_start, -_BIG),
            jnp.where(cand_ok, cand_end, -_BIG),
        ],
        axis=1,
    )  # (T, 3)
    red = jax.ops.segment_max(
        packed, flat_seg, num_segments=F * ivmax + 1
    )[: F * ivmax].reshape(F, ivmax, 3)
    iv_seq = red[:, :, 0]
    iv_c0 = -red[:, :, 1]
    iv_c1 = red[:, :, 2]
    iv_valid = (
        jnp.arange(ivmax, dtype=jnp.int32)[None, :]
        < jnp.minimum(n_iv, ivmax)[:, None]
    )
    return iv_seq, iv_c0, iv_c1, iv_valid, ovf_hits, ovf_iv

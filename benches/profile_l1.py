"""Time L1 sub-stages on representative shapes (synthetic index)."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

F = 2664
S = 384
HMAX = 1024
IVMAX = 32
U = 1_500_000
M = 1_600_000
L = 3000
BUCKET_STEPS = 8


def bench(fn, *args, n=5):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args); jax.block_until_ready(out)
    return (time.time() - t0) / n


def main():
    rng = np.random.default_rng(0)
    uniq = np.sort(rng.choice(2**32, size=U, replace=False).astype(np.uint32))
    row_len = rng.integers(1, 3, size=U).astype(np.int32)
    row_start = np.concatenate([[0], np.cumsum(row_len[:-1])]).astype(np.int32)
    post_seqid = rng.integers(0, 10, size=M).astype(np.int32)
    post_wpos = rng.integers(0, 2_000_000, size=M).astype(np.int32)
    hb = np.searchsorted(uniq >> 16, np.arange(65537)).astype(np.int32)

    take = rng.integers(0, U, size=(F, S))
    q_sorted = np.sort(uniq[take], axis=1)
    s_sizes = np.full(F, S, np.int32)

    dq = jnp.asarray(q_sorted)
    ds = jnp.asarray(s_sizes)
    duniq = jnp.asarray(uniq)
    drs = jnp.asarray(row_start)
    drl = jnp.asarray(row_len)
    dps = jnp.asarray(post_seqid)
    dpw = jnp.asarray(post_wpos)
    dhb = jnp.asarray(hb)
    _BIG = np.int32(2**30)

    @jax.jit
    def probe(q_sorted, s_sizes):
        b = (q_sorted >> jnp.uint32(16)).astype(jnp.int32)
        lo = dhb[b]
        hi = dhb[b + 1]
        for _ in range(BUCKET_STEPS):
            active = lo < hi
            mid = (lo + hi) // 2
            mid_c = jnp.clip(mid, 0, U - 1)
            go_right = duniq[mid_c] < q_sorted
            lo = jnp.where(active & go_right, mid + 1, lo)
            hi = jnp.where(active & ~go_right, mid, hi)
        rows_c = jnp.clip(lo, 0, U - 1)
        i_idx = jnp.arange(S, dtype=jnp.int32)[None, :]
        found = (lo < U) & (duniq[rows_c] == q_sorted) & (i_idx < s_sizes[:, None])
        lens = jnp.where(found & (drl[rows_c] < 100), drl[rows_c], 0).astype(jnp.int32)
        return rows_c, lens

    t_probe = bench(probe, dq, ds)

    rows_c, lens = probe(dq, ds)
    jax.block_until_ready((rows_c, lens))

    @jax.jit
    def gather(rows_c, lens):
        off_end = jnp.cumsum(lens, axis=1)
        total = off_end[:, -1]
        h_idx = jnp.arange(HMAX, dtype=jnp.int32)[None, :]
        off_begin = off_end - lens
        s_ids = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None, :], (F, S))
        scat_col = jnp.where(lens > 0, jnp.minimum(off_begin, HMAX), HMAX)
        seg = jnp.zeros((F, HMAX + 1), jnp.int32)
        seg = seg.at[jnp.arange(F, dtype=jnp.int32)[:, None], scat_col].max(s_ids)
        seg = jax.lax.cummax(seg[:, :HMAX], axis=1)
        seg_c = jnp.clip(seg, 0, S - 1)
        rI = jnp.arange(F)[:, None]
        seg_begin = off_end[rI, seg_c] - lens[rI, seg_c]
        src = drs[rows_c[rI, seg_c]] + (h_idx - seg_begin)
        valid_h = h_idx < jnp.minimum(total, HMAX)[:, None]
        src_c = jnp.clip(src, 0, M - 1)
        hit_seq = jnp.where(valid_h, dps[src_c], _BIG)
        hit_pos = jnp.where(valid_h, dpw[src_c], _BIG)
        return hit_seq, hit_pos

    t_gather = bench(gather, rows_c, lens)
    hit_seq, hit_pos = gather(rows_c, lens)
    jax.block_until_ready((hit_seq, hit_pos))

    sort2 = jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=2))
    t_sort2 = bench(sort2, hit_seq, hit_pos)

    sort1 = jax.jit(lambda a: jax.lax.sort(a))
    t_sort1 = bench(sort1, hit_pos)

    hs, hp = sort2(hit_seq, hit_pos)
    jax.block_until_ready((hs, hp))

    @jax.jit
    def windows_merge(hit_seq, hit_pos, s_sizes):
        m = jnp.full((F,), 4, jnp.int32)
        j_idx = jnp.arange(HMAX, dtype=jnp.int32)[None, :]
        j2 = jnp.clip(j_idx + m[:, None] - 1, 0, HMAX - 1)
        seq_j2 = jnp.take_along_axis(hit_seq, j2, axis=1)
        pos_j2 = jnp.take_along_axis(hit_pos, j2, axis=1)
        cand_ok = ((j_idx + m[:, None] - 1 < HMAX) & (hit_seq < _BIG)
                   & (seq_j2 == hit_seq) & (pos_j2 - hit_pos < L))
        cand_start = jnp.maximum(0, pos_j2 - L + 1)
        cand_end = hit_pos
        pv = cand_ok
        ps, pe = hit_seq, hit_pos
        step = 1
        while step < HMAX:
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
        boundary = cand_ok & ((~prev_v) | (hit_seq != prev_seq) | (cand_start > prev_end))
        iv_id = jnp.cumsum(boundary.astype(jnp.int32), axis=1) - 1
        iv_id = jnp.where(cand_ok, iv_id, -1)
        n_iv = jnp.max(iv_id, axis=1) + 1
        flat_seg = jnp.where(
            iv_id >= 0,
            jnp.arange(F, dtype=jnp.int32)[:, None] * IVMAX + jnp.clip(iv_id, 0, IVMAX - 1),
            F * IVMAX,
        ).reshape(-1)
        iv_seq = jax.ops.segment_min(
            jnp.where(cand_ok, hit_seq, _BIG).reshape(-1), flat_seg,
            num_segments=F * IVMAX + 1)[: F * IVMAX].reshape(F, IVMAX)
        iv_c0 = jax.ops.segment_min(
            jnp.where(cand_ok, cand_start, _BIG).reshape(-1), flat_seg,
            num_segments=F * IVMAX + 1)[: F * IVMAX].reshape(F, IVMAX)
        iv_c1 = jax.ops.segment_max(
            jnp.where(cand_ok, cand_end, -_BIG).reshape(-1), flat_seg,
            num_segments=F * IVMAX + 1)[: F * IVMAX].reshape(F, IVMAX)
        return iv_seq, iv_c0, iv_c1, n_iv

    t_wm = bench(windows_merge, hs, hp, ds)

    print(f"probe ({BUCKET_STEPS} steps): {t_probe*1e3:8.1f} ms")
    print(f"gather:                 {t_gather*1e3:8.1f} ms")
    print(f"sort 2-key:             {t_sort2*1e3:8.1f} ms")
    print(f"sort 1-key:             {t_sort1*1e3:8.1f} ms")
    print(f"windows+merge:          {t_wm*1e3:8.1f} ms")


if __name__ == "__main__":
    main()

"""Time the flat-L1 sub-stages on the real bench workload.

Four nested prefixes of `ops.l1.l1_candidates_device` are jitted and
timed so the dominant substage (probe gathers / flat expansion /
3-key sort / candidate+merge) is attributable on real hardware.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_REFS = int(os.environ.get("BENCH_REFS", "10"))
REF_LEN = int(os.environ.get("BENCH_REF_LEN", "2000000"))
N_QUERIES = int(os.environ.get("BENCH_QUERIES", "4"))


def main():
    import jax
    import jax.numpy as jnp

    from pyfastani_tpu import Sketch, stats
    from pyfastani_tpu.parallel.mesh import make_mesh
    from pyfastani_tpu.parallel.sharded import ShardedSession
    from pyfastani_tpu.ops.fragments import _winnow_fragments_impl

    rng = np.random.default_rng(0)
    alphabet = np.frombuffer(b"ACGT", dtype=np.uint8)
    refs = [rng.choice(alphabet, size=REF_LEN).tobytes() for _ in range(N_REFS)]
    queries = []
    for i in range(N_QUERIES):
        base = np.frombuffer(refs[i % N_REFS], dtype=np.uint8).copy()
        idx = rng.random(base.shape[0]) < 0.03
        base[idx] = rng.choice(alphabet, size=int(idx.sum()))
        queries.append(base.tobytes())

    sketch = Sketch()
    for i, r in enumerate(refs):
        sketch.add_genome(f"ref{i}", r)
    mapper = sketch.index()

    session = ShardedSession(mapper, make_mesh(1, 1))
    params = session.params
    l = params.min_read_length
    b = session.budgets
    sidx = session.sidx
    k, w = params.kmer_size, params.window_size
    smax = b["smax"]
    hmax, ivmax = b["hmax"], b["ivmax"]
    bucket_steps = sidx.bucket_steps
    print(f"budgets: {b}, bucket_steps={bucket_steps}")

    per_genome = [session._fragments([q]) for q in queries]
    F = max(-(-sum(p[1] for p in per_genome) // 128) * 128, 128)
    frags = np.zeros((F, l + 4), dtype=np.uint8)
    row = 0
    for blocks, _, _ in per_genome:
        for block in blocks:
            n = block.shape[0]
            frags[row : row + n, :l] = block
            row += n

    kc = min(smax + 128, l)
    win = jax.jit(
        lambda fr: _winnow_fragments_impl.__wrapped__(fr, k, w, l, False, kc)
    )
    _, _, q_sorted, s_sizes = win(jax.device_put(jnp.asarray(frags)))
    q_sorted = q_sorted[:, : min(smax, q_sorted.shape[1])]
    jax.block_until_ready((q_sorted, s_sizes))

    uniq = jnp.asarray(sidx.uniq_hash[0])
    rstart = jnp.asarray(sidx.row_start[0])
    rlen = jnp.asarray(sidx.row_len[0])
    pgpos = jnp.asarray(sidx.post_gpos[0])
    thr = jnp.asarray(sidx.freq_threshold[0])
    hb = jnp.asarray(np.stack(
        [sidx.hash_bucket[0][:-1], sidx.hash_bucket[0][1:]], axis=-1
    ))
    tab = jnp.asarray(
        stats.min_hits_relaxed_table(l, k, params.percentage_identity)
    )
    _BIG = np.int32(2**30)
    U = sidx.uniq_hash.shape[1]
    M = sidx.post_gpos.shape[1]
    S = q_sorted.shape[1]
    T = F * hmax

    def probe_part(q_sorted, s_sizes):
        bits = int(hb.shape[0]).bit_length() - 1
        bq = (q_sorted >> jnp.uint32(32 - bits)).astype(jnp.int32)
        bp = hb[bq]
        lo = bp[:, :, 0]
        hi = bp[:, :, 1]
        for _ in range(bucket_steps):
            active = lo < hi
            mid = (lo + hi) // 2
            mid_c = jnp.clip(mid, 0, max(U - 1, 0))
            go_right = uniq[mid_c] < q_sorted
            lo = jnp.where(active & go_right, mid + 1, lo)
            hi = jnp.where(active & ~go_right, mid, hi)
        rows_c = jnp.clip(lo, 0, max(U - 1, 0))
        i_idx = jnp.arange(S, dtype=jnp.int32)[None, :]
        found = (
            (lo < U) & (uniq[rows_c] == q_sorted) & (i_idx < s_sizes[:, None])
        )
        lens = jnp.where(
            found & (rlen[rows_c] < thr), rlen[rows_c], 0
        ).astype(jnp.int32)
        return rows_c, lens

    def expand_part(q_sorted, s_sizes):
        rows_c, lens = probe_part(q_sorted, s_sizes)
        lens_flat = lens.reshape(-1)
        off_end = jnp.cumsum(lens_flat)
        total = off_end[-1]
        off_begin = off_end - lens_flat
        probe_ids = jnp.arange(F * S, dtype=jnp.int32)
        scat = jnp.where(lens_flat > 0, jnp.minimum(off_begin, T), T)
        seg = jnp.zeros((T + 1,), jnp.int32).at[scat].max(probe_ids)
        seg = jax.lax.cummax(seg[:T])
        t_idx = jnp.arange(T, dtype=jnp.int32)
        src = rstart[rows_c.reshape(-1)[seg]] + (t_idx - off_begin[seg])
        valid_t = t_idx < jnp.minimum(total, T)
        src_c = jnp.clip(src, 0, max(M - 1, 0))
        hit_frag = jnp.where(valid_t, seg // S, F)
        hit_gpos = jnp.where(valid_t, pgpos[src_c], _BIG)
        return hit_frag, hit_gpos

    def sort_part(q_sorted, s_sizes):
        hit_frag, hit_gpos = expand_part(q_sorted, s_sizes)
        return jax.lax.sort((hit_frag, hit_gpos), num_keys=2)

    from pyfastani_tpu.ops.l1 import l1_candidates_device

    m_values = tuple(sorted({int(max(int(v), 1))
                             for v in np.asarray(tab)[: S + 1]}))

    def full(q_sorted, s_sizes):
        return l1_candidates_device.__wrapped__(
            q_sorted, s_sizes, uniq, rstart, rlen, pgpos, thr, tab, hb,
            hmax, ivmax, l, bucket_steps, m_values,
        )

    def bench(name, fn):
        f = jax.jit(fn)
        out = f(q_sorted, s_sizes)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(3):
            out = f(q_sorted, s_sizes)
            jax.block_until_ready(out)
        dt = (time.time() - t0) / 3
        print(f"{name:14s} {dt*1e3:8.1f} ms")
        return dt

    print(f"F={F}, S={S}, T={T}")
    bench("probe", probe_part)
    bench("..+expand", expand_part)
    bench("..+sort", sort_part)
    bench("full L1", full)


if __name__ == "__main__":
    main()

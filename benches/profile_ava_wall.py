"""Wall-clock breakdown of a warm all-vs-all batch: staging/submit vs
device wait, per dispatch group (run on the real chip after bench.py has
populated the compile cache)."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

AVA_GENOMES = int(os.environ.get("BENCH_AVA_GENOMES", "32"))
AVA_LEN = int(os.environ.get("BENCH_AVA_LEN", "2000000"))


def main():
    import jax

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench as B
    from pyfastani_tpu import Sketch
    from pyfastani_tpu.parallel.mesh import make_mesh
    from pyfastani_tpu.parallel.sharded import ShardedSession

    B.AVA_GENOMES = AVA_GENOMES
    B.AVA_LENGTHS = (AVA_LEN,)
    genomes = B._ava_genomes()
    sk = Sketch()
    t0 = time.time()
    for i, g in enumerate(genomes):
        sk.add_genome(f"g{i}", g)
    mapper = sk.index()
    print(f"index {time.time()-t0:.1f}s", flush=True)

    session = ShardedSession(mapper, make_mesh(1, len(jax.devices())))
    t0 = time.time()
    session.query_many([[g] for g in genomes])
    print(f"warmup {time.time()-t0:.1f}s budgets={session.budgets}", flush=True)

    # instrument one warm pass
    per_genome = [session._fragments([g]) for g in genomes]
    total_f = sum(p[1] for p in per_genome)
    n_groups = max(1, -(-total_f // session.frag_capacity),
                   -(-len(per_genome) // session.q_capacity))
    order = sorted(range(len(per_genome)), key=lambda gi: -per_genome[gi][1])
    bins = [[] for _ in range(n_groups)]
    loads = [0] * n_groups
    for gi in order:
        b = min(range(n_groups), key=lambda b: loads[b])
        bins[b].append(gi)
        loads[b] += per_genome[gi][1]
    groups = [b for b in bins if b]

    session._prepare_tables()
    t_all = time.time()
    t_submit = 0.0
    pending = []
    prev = {}
    for g_i, group in enumerate(groups):
        slot = g_i % 2
        if slot in prev:
            prev[slot].block_until_ready()
        t0 = time.time()
        d_frags, handles, row, Fcap = session._submit_group(per_genome, group, slot)
        t_submit += time.time() - t0
        prev[slot] = d_frags
        pending.append((handles, row, Fcap))
    t_after_submit = time.time()
    waits = []
    for handles, row, Fcap in pending:
        t0 = time.time()
        for h in handles:
            np.asarray(h)
        waits.append(time.time() - t0)
    total = time.time() - t_all
    print(f"groups={len(groups)} frags={total_f}")
    print(f"submit(stage+h2d issue): {t_submit:.2f}s")
    print(f"submit loop wall:        {t_after_submit - t_all:.2f}s")
    print(f"collect waits: {[f'{w:.2f}' for w in waits]}")
    print(f"TOTAL: {total:.2f}s  ({total_f and 1e3*total/total_f:.3f} ms/frag, "
          f"{sum(len(g) for g in genomes)/1e6/total:.1f} Mbp/s)")
    print(f"stats: {session.stats}")


if __name__ == "__main__":
    main()

"""Per-op device trace of the all-vs-all dispatch via the REAL session
path (shard_map program, production budgets) on a reduced family panel.

Usage: timeout 1700 python benches/profile_trace_ava.py [n_genomes]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from profile_trace import _family_panel, summarize  # noqa: E402


def main():
    import jax

    from pyfastani_tpu import Sketch
    from pyfastani_tpu.parallel.mesh import make_mesh
    from pyfastani_tpu.parallel.sharded import ShardedSession

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    import shutil
    outdir = "/tmp/pf_trace_ava"
    shutil.rmtree(outdir, ignore_errors=True)
    rng = np.random.default_rng(0)
    genomes = _family_panel(n, rng)
    print(f"{n} genomes, {sum(len(g) for g in genomes)/1e6:.0f} Mbp",
          flush=True)
    sk = Sketch()
    for i, g in enumerate(genomes):
        sk.add_genome(f"g{i}", g)
    mapper = sk.index()
    session = ShardedSession(mapper, make_mesh(1, 1))
    print(f"budgets: {session.budgets}", flush=True)
    t0 = time.time()
    print("warmup:", session.warmup(), f"{time.time()-t0:.1f}s", flush=True)
    queries = [[g] for g in genomes[:20]]
    t0 = time.time()
    session.query_many(queries)
    print(f"steady pass 1: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    session.query_many(queries)
    dt = time.time() - t0
    nf = session.stats["fragments_dispatched"] / 2
    print(f"steady pass 2: {dt:.1f}s (~{1e3*dt/ (nf/ max(1,1)):.4f} "
          f"ms/frag over {nf:.0f} frags x2)", flush=True)

    print("tracing one pass...", flush=True)
    jax.profiler.start_trace(outdir)
    session.query_many(queries)
    jax.profiler.stop_trace()
    print("parsing...", flush=True)
    summarize(outdir)


if __name__ == "__main__":
    main()

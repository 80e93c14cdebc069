"""Incremental TPU probe: compile + steady-state time of the sharded
query program at growing scales, so compile-time pathologies show up at
the smallest reproducing size instead of a 30-minute blind benchmark.

Usage: python benches/probe_tpu.py [n_refs ref_len n_queries]
Env: PROBE_PALLAS=0 to force the XLA event-scan path.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(f"[probe {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def run(n_refs, ref_len, n_queries, use_pallas):
    import jax

    from pyfastani_tpu import Sketch
    from pyfastani_tpu.parallel.mesh import make_mesh
    from pyfastani_tpu.parallel.sharded import ShardedSession

    rng = np.random.default_rng(0)
    alphabet = np.frombuffer(b"ACGT", dtype=np.uint8)
    refs = [rng.choice(alphabet, size=ref_len).tobytes() for _ in range(n_refs)]
    queries = []
    for i in range(n_queries):
        base = np.frombuffer(refs[i % n_refs], dtype=np.uint8).copy()
        idx = rng.random(base.shape[0]) < 0.03
        base[idx] = rng.choice(alphabet, size=int(idx.sum()))
        queries.append(base.tobytes())

    t0 = time.time()
    sketch = Sketch()
    for i, r in enumerate(refs):
        sketch.add_genome(f"ref{i}", r)
    mapper = sketch.index()
    log(f"scale refs={n_refs}x{ref_len} q={n_queries}: index {time.time()-t0:.1f}s")

    t0 = time.time()
    session = ShardedSession(mapper, make_mesh(1, 1), use_pallas=use_pallas)
    log(f"  session (device_put) {time.time()-t0:.1f}s budgets={session.budgets} "
        f"pallas={session._use_pallas}")

    t0 = time.time()
    r = session.query_many([[q] for q in queries])
    t_warm = time.time() - t0
    t0 = time.time()
    r = session.query_many([[q] for q in queries])
    t_run = time.time() - t0
    bp = sum(len(q) for q in queries)
    log(f"  warmup {t_warm:.1f}s steady {t_run:.3f}s -> {bp/1e6/t_run:.2f} Mbp/s "
        f"hits0={[(h.name, h.matches) for h in r[0]][:2]}")


if __name__ == "__main__":
    args = sys.argv[1:]
    use_pallas = os.environ.get("PROBE_PALLAS", "1") != "0"
    if args:
        n_refs, ref_len, n_q = int(args[0]), int(args[1]), int(args[2])
        run(n_refs, ref_len, n_q, use_pallas)
    else:
        for scale in [(2, 200_000, 2), (4, 500_000, 2), (10, 2_000_000, 4)]:
            run(*scale, use_pallas)

"""Benchmark: query throughput of the TPU ANI engine on synthetic genomes.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: reference pyfastani v0.6.0 CPU benchmark -- mean single-genome
query wall time 1.45 s at 12 threads over 50 proGenomes bacterial genomes
of mean 6.25 Mbp (``/root/reference/benches/mapping/v0.6.0.json``,
hardware ``README.md:148-152``), i.e. ~4.3 Mbp/s of query sequence.
``vs_baseline`` is this engine's query Mbp/s divided by 4.3.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# keep XLA compiles cached across bench runs (configured via jax.config by
# pyfastani_tpu.utils.jaxconfig -- env vars are ignored by this jaxlib build)

BASELINE_MBP_S = 4.3

N_REFS = int(os.environ.get("BENCH_REFS", "10"))
REF_LEN = int(os.environ.get("BENCH_REF_LEN", "2000000"))
N_QUERIES = int(os.environ.get("BENCH_QUERIES", "4"))
MUT_RATE = 0.03


def _genomes():
    rng = np.random.default_rng(0)
    alphabet = np.frombuffer(b"ACGT", dtype=np.uint8)
    refs = [rng.choice(alphabet, size=REF_LEN).tobytes() for _ in range(N_REFS)]
    queries = []
    for i in range(N_QUERIES):
        base = np.frombuffer(refs[i % N_REFS], dtype=np.uint8).copy()
        idx = rng.random(base.shape[0]) < MUT_RATE
        base[idx] = rng.choice(alphabet, size=int(idx.sum()))
        queries.append(base.tobytes())
    return refs, queries


def _log(msg):
    print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def main():
    import jax

    from pyfastani_tpu import Sketch
    from pyfastani_tpu.parallel.mesh import make_mesh
    from pyfastani_tpu.parallel.sharded import ShardedSession

    _log(f"devices: {jax.devices()}")
    refs, queries = _genomes()
    _log(f"generated {N_REFS} refs x {REF_LEN} bp, {N_QUERIES} queries")

    t0 = time.time()
    sketch = Sketch()
    for i, r in enumerate(refs):
        sketch.add_genome(f"ref{i}", r)
        _log(f"sketched ref{i}")
    mapper = sketch.index()
    t_index = time.time() - t0
    _log(f"indexed in {t_index:.1f}s ({mapper._index.n_minimizers} minimizers)")

    n_dev = len(jax.devices())
    mesh = make_mesh(1, n_dev)

    session = ShardedSession(mapper, mesh)

    # warmup: compile the batched sharded step
    _log("warmup (compiles the batched sharded step)...")
    t0 = time.time()
    session.query_many([[q] for q in queries])
    t_warm = time.time() - t0
    _log(f"warmup done in {t_warm:.1f}s")

    t0 = time.time()
    results = session.query_many([[q] for q in queries])
    elapsed = time.time() - t0
    total_bp = sum(len(q) for q in queries)
    for qi, hits in enumerate(results):
        assert hits, f"benchmark query {qi} produced no hits"
        _log(f"query {qi}: {[(h.name, h.matches) for h in hits][:2]}")

    mbp_s = total_bp / 1e6 / elapsed
    result = {
        "metric": "query_throughput",
        "value": round(mbp_s, 3),
        "unit": "Mbp/s",
        "vs_baseline": round(mbp_s / BASELINE_MBP_S, 3),
        "detail": {
            "n_refs": N_REFS,
            "ref_len": REF_LEN,
            "n_queries": N_QUERIES,
            "index_s": round(t_index, 2),
            "warmup_s": round(t_warm, 2),
            "query_s_per_genome": round(elapsed / N_QUERIES, 3),
            "devices": n_dev,
            "backend": jax.default_backend(),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()

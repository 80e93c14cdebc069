"""A REAL two-process mesh test (SURVEY.md §2a: N>=2 host configs).

Spawns two subprocesses that `jax.distributed.initialize` against each
other on the CPU platform (2 virtual devices each -> a 4-device global
mesh spanning both processes, gloo cross-process collectives), restore a
`ShardedIndex` checkpoint, and run the SPMD query path end-to-end --
exercising the process-spanning `_put` placement
(`parallel/sharded.py`) and the `process_allgather` output path that
single-process tests cannot reach.  Results must match the host engine.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from pyfastani_tpu import Sketch
from pyfastani_tpu.parallel.sharded import build_sharded_index

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = """
import json, os, sys
pid = int(sys.argv[1]); port = sys.argv[2]; work = sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize(f"localhost:{{port}}", num_processes=2, process_id=pid)
assert jax.process_count() == 2 and len(jax.devices()) == 4

import numpy as np
from pyfastani_tpu.parallel.mesh import make_mesh
from pyfastani_tpu.parallel.sharded import ShardedIndex, ShardedSession

idx = ShardedIndex.load(os.path.join(work, "index.npz"))
query = open(os.path.join(work, "query.bin"), "rb").read()
mesh = make_mesh(2, 2)  # data x shard, spanning both processes
sess = ShardedSession.from_index(
    idx, mesh=mesh,
    hmax=512, ivmax=16, cmax=128, rmax=384, t_chunks=52, bin_max=64,
    smax=256,
)
hits = sess.query([query])
if pid == 0:
    out = [[h.name, round(h.identity, 4), h.matches, h.fragments] for h in hits]
    with open(os.path.join(work, "hits.json"), "w") as f:
        json.dump(out, f)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _rand_genome(rng, n):
    return rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=n).tobytes()


def _mutate(rng, seq, rate):
    arr = np.frombuffer(seq, dtype=np.uint8).copy()
    idx = rng.random(arr.shape[0]) < rate
    arr[idx] = rng.choice(
        np.frombuffer(b"ACGT", dtype=np.uint8), size=int(idx.sum())
    )
    return arr.tobytes()


def test_two_process_mesh_matches_host(tmp_path):
    rng = np.random.default_rng(47)
    refs = [_rand_genome(rng, n) for n in (30_000, 24_000, 27_000, 21_000)]
    query = _mutate(rng, refs[1], 0.04)

    sk = Sketch(backend="numpy")
    for i, r in enumerate(refs):
        sk.add_genome(f"g{i}", r)
    mapper = sk.index()
    expected = mapper.query_genome(query)
    assert expected, "workload must produce hits"

    build_sharded_index(mapper, 2).save(str(tmp_path / "index.npz"))
    (tmp_path / "query.bin").write_bytes(query)
    child = str(tmp_path / "child.py")
    with open(child, "w") as f:
        f.write(_CHILD.format(repo=_REPO))

    port = _free_port()
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, child, str(pid), str(port), str(tmp_path)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for pid in (1, 0)
    ]
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        logs.append(out.decode(errors="replace"))
    assert all(p.returncode == 0 for p in procs), "\n".join(logs)

    got = json.load(open(tmp_path / "hits.json"))
    assert got == [
        [h.name, round(h.identity, 4), h.matches, h.fragments]
        for h in expected
    ], "\n".join(logs)

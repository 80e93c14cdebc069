"""Sharded pipeline with the Pallas L2 branch (interpreter) vs the host
engine -- exercises the exact `use_pallas=True` code path of
`parallel.sharded._l2_interval_scan` on the 8-device CPU mesh."""

import os

import numpy as np
import pytest

import jax

from pyfastani_tpu import Sketch
from pyfastani_tpu.parallel.mesh import make_mesh
from pyfastani_tpu.parallel.sharded import ShardedSession


def _rand_genome(rng, n):
    return rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=n).tobytes()


def _mutate(rng, seq, rate):
    arr = np.frombuffer(seq, dtype=np.uint8).copy()
    idx = rng.random(arr.shape[0]) < rate
    arr[idx] = rng.choice(
        np.frombuffer(b"ACGT", dtype=np.uint8), size=int(idx.sum())
    )
    return arr.tobytes()


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs 2 devices")
def test_sharded_pallas_matches_host(monkeypatch):
    monkeypatch.setenv("PYFASTANI_TPU_PALLAS_INTERPRET", "1")
    rng = np.random.default_rng(31)
    refs = [_rand_genome(rng, n) for n in (40_000, 25_000, 31_000)]
    queries = [_mutate(rng, refs[1], 0.04), refs[0]]

    sk = Sketch(backend="numpy")
    for i, r in enumerate(refs):
        sk.add_genome(f"g{i}", r)
    mapper = sk.index()
    expected = [mapper.query_genome(q) for q in queries]

    mesh = make_mesh(1, 2)
    session = ShardedSession(
        mapper, mesh,
        hmax=512, ivmax=16, cmax=128, rmax=896, t_chunks=52, bin_max=64,
        smax=256, frag_capacity=32, q_capacity=2, use_pallas=True,
    )
    got = session.query_many([[q] for q in queries])

    for g, e in zip(got, expected):
        assert [(h.name, h.matches, h.fragments) for h in g] == [
            (h.name, h.matches, h.fragments) for h in e
        ]
        for a, b in zip(g, e):
            assert a.identity == b.identity  # bitwise: fixed-point identity sums

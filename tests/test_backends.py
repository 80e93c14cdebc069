"""Bitwise agreement between the host (NumPy) and device (JAX) engines."""

import numpy as np
import pytest

from pyfastani_tpu import Sketch


def _random_genome(rng, n):
    return rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=n).tobytes()


def _mutate(rng, seq, rate):
    arr = np.frombuffer(seq, dtype=np.uint8).copy()
    idx = rng.random(arr.shape[0]) < rate
    arr[idx] = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=int(idx.sum()))
    return arr.tobytes()


def _hits_tuple(hits):
    return [(h.name, h.identity, h.matches, h.fragments) for h in hits]


@pytest.mark.parametrize("protein", [False, True])
def test_winnow_backend_parity(protein):
    rng = np.random.default_rng(11)
    alpha = b"ACGTN" if not protein else b"ACDEFGHIKLMNPQRSTVWY"
    seq = rng.choice(np.frombuffer(alpha, dtype=np.uint8), size=20_000).tobytes()
    kw = dict(fragment_length=300, protein=protein)
    s_np = Sketch(backend="numpy", **kw).add_genome("g", seq)
    s_jx = Sketch(backend="jax", **kw).add_genome("g", seq)
    a = s_np._minimizer_arrays()
    b = s_jx._minimizer_arrays()
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_query_backend_parity_nucl():
    rng = np.random.default_rng(5)
    ref = _random_genome(rng, 60_000)
    qry = _mutate(rng, ref, 0.03)  # ~97% identity

    hits = {}
    for backend in ("numpy", "jax"):
        sk = Sketch(backend=backend)
        sk.add_genome("ref", ref)
        # a second, unrelated reference genome
        sk.add_genome("other", _random_genome(rng, 30_000))
        mapper = sk.index()
        hits[backend] = _hits_tuple(mapper.query_genome(qry))

    assert hits["numpy"] == hits["jax"]
    assert len(hits["numpy"]) >= 1
    assert hits["numpy"][0][0] == "ref"
    assert hits["numpy"][0][1] > 90.0


def test_query_backend_parity_draft_protein():
    rng = np.random.default_rng(9)
    alpha = np.frombuffer(b"ACDEFGHIKLMNPQRSTVWY", dtype=np.uint8)
    contigs = [rng.choice(alpha, size=n).tobytes() for n in (700, 433, 260)]
    qry = [_mutate_prot(rng, c, 0.05) for c in contigs]

    hits = {}
    for backend in ("numpy", "jax"):
        sk = Sketch(backend=backend, protein=True, fragment_length=100)
        sk.add_draft("ref", contigs)
        mapper = sk.index()
        hits[backend] = _hits_tuple(mapper.query_draft(qry))
    assert hits["numpy"] == hits["jax"]
    assert len(hits["numpy"]) == 1


def _mutate_prot(rng, seq, rate):
    alpha = np.frombuffer(b"ACDEFGHIKLMNPQRSTVWY", dtype=np.uint8)
    arr = np.frombuffer(seq, dtype=np.uint8).copy()
    idx = rng.random(arr.shape[0]) < rate
    arr[idx] = rng.choice(alpha, size=int(idx.sum()))
    return arr.tobytes()


def test_self_query_full_identity():
    rng = np.random.default_rng(21)
    ref = _random_genome(rng, 45_000)
    for backend in ("numpy", "jax"):
        sk = Sketch(backend=backend)
        sk.add_genome("ref", ref)
        hits = sk.index().query_genome(ref)
        assert len(hits) == 1
        assert hits[0].identity == 100.0
        assert hits[0].matches == hits[0].fragments == 15

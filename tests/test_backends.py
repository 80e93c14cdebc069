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


@pytest.mark.parametrize("protein", [False, True])
def test_chunked_winnow_matches_single_shot(protein, monkeypatch):
    """Force small device chunks and compare against the host winnow."""
    from pyfastani_tpu.models import _engine_np as E
    from pyfastani_tpu.models._params import Parameters
    from pyfastani_tpu.ops import fragments as frag_ops

    monkeypatch.setattr(frag_ops, "_CHUNK_WINDOWS", 512)
    rng = np.random.default_rng(31)
    alpha = b"ACGTN" if not protein else b"ACDEFGHIKLMNPQRSTVWY"
    params = Parameters(
        kmer_size=16,
        window_size=1 if protein else 24,
        alphabet_size=20 if protein else 4,
    )
    for length in (2000, 5000, 513 + 15, 1536):
        seq = rng.choice(np.frombuffer(alpha, dtype=np.uint8), size=length)
        h_np, p_np = E.winnow_sequence(seq, params)
        h_jx, p_jx = frag_ops.winnow_long_sequence(
            seq, params.kmer_size, params.window_size, protein
        )
        np.testing.assert_array_equal(h_np, h_jx)
        np.testing.assert_array_equal(p_np, p_jx)
    # poly-A start exercises the carried phantom suppression
    seq = np.frombuffer(b"A" * 900 + b"CGTAC" * 300, dtype=np.uint8)
    h_np, p_np = E.winnow_sequence(seq, params)
    h_jx, p_jx = frag_ops.winnow_long_sequence(
        seq, params.kmer_size, params.window_size, protein
    )
    np.testing.assert_array_equal(h_np, h_jx)
    np.testing.assert_array_equal(p_np, p_jx)


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


def test_query_backend_parity_draft_nucl():
    """Multi-contig nucleotide drafts on both sides: exercises per-contig
    global coordinates, contig-clamped L2 ranges, and multi-contig query
    packing through the jax session."""
    rng = np.random.default_rng(12)
    ref_contigs = [_random_genome(rng, n) for n in (25_000, 14_000, 9_000)]
    other = [_random_genome(rng, n) for n in (11_000, 8_000)]
    qry = [_mutate(rng, c, 0.03) for c in ref_contigs[::-1]]

    hits = {}
    for backend in ("numpy", "jax"):
        sk = Sketch(backend=backend)
        sk.add_draft("ref", ref_contigs)
        sk.add_draft("other", other)
        mapper = sk.index()
        hits[backend] = _hits_tuple(mapper.query_draft(qry))

    assert hits["numpy"] == hits["jax"]
    assert hits["numpy"] and hits["numpy"][0][0] == "ref"

"""Parity tests for the Pallas L2 kernel (interpret mode on CPU).

The kernel must reproduce `ops.l2.l2_chunk_scan` (the XLA event-scan
formulation, itself validated against the host oracle and the reference
goldens) bit-exactly: same best shared-sketch count and same first/last
maximal anchors per chunk.  Reference semantics: ``slidingMap.hpp`` /
``computeL2MappedRegions`` declared at
``include/fastani/map/compute_map.pxd:30-51``.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pyfastani_tpu.ops.l2 import l2_chunk_scan
from pyfastani_tpu.ops.l2_pallas import compute_mini_prev, l2_chunks_pallas


def _mini_store(rng, m, n_contigs=2, hash_bits=18):
    """Synthetic position-ordered minimizer store with dense hash reuse."""
    gpos = np.cumsum(rng.integers(5, 20, size=m))
    bounds = np.sort(rng.choice(gpos[m // 8 :], size=n_contigs - 1, replace=False))
    seqid = np.searchsorted(bounds, gpos, side="right").astype(np.int32)
    base = np.concatenate([[0], bounds])
    wpos = (gpos - base[seqid]).astype(np.int32)
    mh = rng.integers(0, 1 << hash_bits, size=m).astype(np.uint32)
    return mh, seqid, wpos


def test_compute_mini_prev():
    rng = np.random.default_rng(0)
    mh, seqid, wpos = _mini_store(rng, 5000)
    prev = compute_mini_prev(mh, seqid, wpos)
    # oracle: dict scan in position order per (hash, contig)
    last = {}
    for j in np.lexsort((wpos, seqid)):
        key = (int(mh[j]), int(seqid[j]))
        expect = last.get(key, -(2**30))
        assert prev[j] == expect, (j, prev[j], expect)
        last[key] = int(wpos[j])


@pytest.mark.parametrize("seed", [1, 2])
def test_pallas_matches_xla_event_scan(seed):
    rng = np.random.default_rng(seed)
    M = 20000
    mh, seqid, wpos = _mini_store(rng, M)
    prev = compute_mini_prev(mh, seqid, wpos)

    F, S = 16, 256
    q = np.sort(rng.choice(mh, size=(F, S)), axis=1).astype(np.uint32)
    s_sizes = np.full(F, S, np.int32)

    N = 64
    lo = rng.integers(0, M - 900, size=N).astype(np.int32)
    rlen = rng.integers(0, 700, size=N).astype(np.int32)
    frag = rng.integers(0, F, size=N).astype(np.int32)
    c0 = wpos[lo]
    clen = rng.integers(1, 3072, size=N).astype(np.int32)
    cseq = seqid[lo]
    cmw = 2985
    # keep each range within one contig (the sharded caller guarantees
    # this via per-contig global coordinates)
    hi = np.minimum(lo + rlen, M)
    for i in range(N):
        run = np.flatnonzero(seqid[lo[i] : hi[i]] != cseq[i])
        if run.size:
            rlen[i] = run[0]

    chunks = np.stack([frag, c0, clen, lo, rlen], axis=1).astype(np.int32)
    b0, f0, l0 = l2_chunk_scan(q, s_sizes, mh, wpos, chunks, cmw, 3072)

    b1, f1, l1 = l2_chunks_pallas(
        jnp.asarray(q), mh, wpos, prev,
        jnp.asarray(frag), jnp.asarray(c0), jnp.asarray(clen),
        jnp.asarray(lo), jnp.asarray(rlen), jnp.asarray(cseq),
        cmw, 1024, interpret=True,
    )
    np.testing.assert_array_equal(b0, np.asarray(b1))
    np.testing.assert_array_equal(f0, np.asarray(f1))
    np.testing.assert_array_equal(l0, np.asarray(l1))


def test_pallas_empty_and_edge_chunks():
    rng = np.random.default_rng(3)
    M = 4096
    mh, seqid, wpos = _mini_store(rng, M, n_contigs=1)
    prev = compute_mini_prev(mh, seqid, wpos)
    F, S = 8, 128
    q = np.sort(rng.choice(mh, size=(F, S)), axis=1).astype(np.uint32)
    s_sizes = np.full(F, S, np.int32)
    cmw = 2985

    # zero-length ranges, zero-length chunks, range at the very end
    frag = np.array([0, 1, 2, 3], np.int32)
    lo = np.array([0, M - 10, 100, 0], np.int32)
    rlen = np.array([0, 10, 0, 5], np.int32)
    c0 = np.array([0, int(wpos[M - 10]), 50, 0], np.int32)
    clen = np.array([100, 3072, 0, 1], np.int32)
    cseq = np.zeros(4, np.int32)

    chunks = np.stack([frag, c0, clen, lo, rlen], axis=1).astype(np.int32)
    b0, f0, l0 = l2_chunk_scan(q, s_sizes, mh, wpos, chunks, cmw, 3072)
    b1, f1, l1 = l2_chunks_pallas(
        jnp.asarray(q), mh, wpos, prev,
        jnp.asarray(frag), jnp.asarray(c0), jnp.asarray(clen),
        jnp.asarray(lo), jnp.asarray(rlen), jnp.asarray(cseq),
        cmw, 1024, interpret=True,
    )
    np.testing.assert_array_equal(b0, np.asarray(b1))
    np.testing.assert_array_equal(f0, np.asarray(f1))
    np.testing.assert_array_equal(l0, np.asarray(l1))


def test_pallas_segmented_large_n():
    """N > _NSEG exercises the SMEM-bounded segmentation (lax.map over
    pallas_call segments); results must equal the unsegmented scan."""
    rng = np.random.default_rng(7)
    M = 20000
    mh, seqid, wpos = _mini_store(rng, M)
    prev = compute_mini_prev(mh, seqid, wpos)
    F, S = 8, 128
    q = np.sort(rng.choice(mh, size=(F, S)), axis=1).astype(np.uint32)
    s_sizes = np.full(F, S, np.int32)
    cmw = 2985

    from pyfastani_tpu.ops import l2_pallas as LP

    N = LP._NSEG * 2 + 100
    lo = rng.integers(0, M - 900, size=N).astype(np.int32)
    rlen = rng.integers(0, 400, size=N).astype(np.int32)
    frag = rng.integers(0, F, size=N).astype(np.int32)
    c0 = wpos[lo]
    clen = rng.integers(1, 1024, size=N).astype(np.int32)
    cseq = seqid[lo]
    hi = np.minimum(lo + rlen, M)
    for i in range(N):
        run = np.flatnonzero(seqid[lo[i] : hi[i]] != cseq[i])
        if run.size:
            rlen[i] = run[0]

    chunks = np.stack([frag, c0, clen, lo, rlen], axis=1).astype(np.int32)
    b0, f0, l0 = l2_chunk_scan(q, s_sizes, mh, wpos, chunks, cmw, 1024)
    b1, f1, l1 = l2_chunks_pallas(
        jnp.asarray(q), mh, wpos, prev,
        jnp.asarray(frag), jnp.asarray(c0), jnp.asarray(clen),
        jnp.asarray(lo), jnp.asarray(rlen), jnp.asarray(cseq),
        cmw, 1024, interpret=True,
    )
    np.testing.assert_array_equal(b0, np.asarray(b1))
    np.testing.assert_array_equal(f0, np.asarray(f1))
    np.testing.assert_array_equal(l0, np.asarray(l1))

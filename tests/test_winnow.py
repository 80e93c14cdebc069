"""Vectorized winnowing vs the literal deque-port oracle."""

import numpy as np
import pytest

from pyfastani_tpu.models._engine_np import winnow_sequence
from pyfastani_tpu.models._params import Parameters
from pyfastani_tpu.ops.codec import to_bytes

from .oracle import add_minimizers_oracle


def _params(k, w, protein=False):
    return Parameters(
        kmer_size=k,
        window_size=w,
        alphabet_size=20 if protein else 4,
    )


def _run_np(seq, k, w, protein=False):
    data = to_bytes(seq)
    h, p = winnow_sequence(data, _params(k, w, protein))
    return list(zip(h.tolist(), p.tolist()))


def _run_oracle(seq, k, w, protein=False):
    mins = add_minimizers_oracle(seq, k, w, 0, protein=protein)
    return [(m[0], m[2]) for m in mins]


@pytest.mark.parametrize("protein", [False, True])
@pytest.mark.parametrize("k,w", [(3, 1), (3, 5), (5, 4), (16, 24), (16, 5), (7, 7)])
def test_random_nucleotide_sequences(k, w, protein):
    rng = np.random.default_rng(hash((k, w, protein)) % 2**32)
    alphabet = np.frombuffer(b"ACGTNacgtRYSWn", dtype=np.uint8)
    for trial in range(8):
        length = int(rng.integers(k + w - 1, 600))
        seq = rng.choice(alphabet, size=length).tobytes()
        assert _run_np(seq, k, w, protein) == _run_oracle(seq, k, w, protein), (
            k,
            w,
            protein,
            trial,
        )


def test_low_complexity_tie_breaking():
    # homopolymers / dimers exercise equal-hash pops and the window-0
    # suppression quirk (a poly-A prefix yields exactly one record)
    for seq in [b"A" * 100, b"AT" * 60, b"ACG" * 50, b"AAAT" + b"A" * 80]:
        for k, w in [(4, 3), (16, 24), (5, 1)]:
            if len(seq) < k + w - 1:
                continue
            assert _run_np(seq, k, w) == _run_oracle(seq, k, w), (seq[:8], k, w)


def test_polyA_suppression_single_record():
    # every window chooses a new occurrence (tie -> latest) but the
    # reference's dedup-vs-mutable-wpos quirk collapses them into one
    res = _run_oracle(b"A" * 80, 16, 5)
    assert len(res) == 1 and res[0][1] == 0
    assert _run_np(b"A" * 80, 16, 5) == res


def test_short_sequences_empty():
    assert _run_np(b"ACGT" * 4, 16, 24) == []  # windows never reach id >= 0
    assert _run_oracle(b"ACGT" * 4, 16, 24) == []


def test_multi_contig_dedup_across_contigs():
    # dedup compares seqId: identical consecutive contigs still both record
    mins = []
    add_minimizers_oracle(b"ACGTACGGTACCAGTTACA" * 3, 5, 4, 0, minimizer_index=mins)
    n0 = len(mins)
    add_minimizers_oracle(b"ACGTACGGTACCAGTTACA" * 3, 5, 4, 1, minimizer_index=mins)
    assert len(mins) == 2 * n0
    p = _params(5, 4)
    h, w = winnow_sequence(to_bytes(b"ACGTACGGTACCAGTTACA" * 3), p)
    assert [(m[0], m[2]) for m in mins[:n0]] == list(zip(h.tolist(), w.tolist()))


def test_jax_winnow_matches_numpy():
    import jax
    import jax.numpy as jnp

    from pyfastani_tpu.ops import winnow as wops

    rng = np.random.default_rng(3)
    alphabet = np.frombuffer(b"ACGTN", dtype=np.uint8)
    seq = rng.choice(alphabet, size=500)
    k, w = 16, 24
    n_pos = seq.shape[0] - k + 1
    padded = np.concatenate([seq, np.zeros(4, np.uint8)])

    with np.errstate(over="ignore"):
        canon_np, valid_np = wops.nucl_canonical(np, padded, seq.shape[0], k, n_pos)
        rec_np, h_np = wops.winnow(np, canon_np, valid_np, w)

    @jax.jit
    def device_path(data):
        canon, valid = wops.nucl_canonical(jnp, data, seq.shape[0], k, n_pos)
        return wops.winnow(jnp, canon, valid, w)

    rec_j, h_j = device_path(jnp.asarray(padded))
    np.testing.assert_array_equal(rec_np, np.asarray(rec_j))
    np.testing.assert_array_equal(h_np[rec_np], np.asarray(h_j)[np.asarray(rec_j)])


def test_scan2_matches_flat_scans():
    """The 2-level flat-scan decomposition in ops.l1 must equal the plain
    cumulative scans for both multiples and non-multiples of the row
    width (the non-multiple path falls back)."""
    import jax
    import jax.numpy as jnp

    from pyfastani_tpu.ops.l1 import _scan2

    rng = np.random.default_rng(11)
    for n in (512 * 7, 512 * 7 + 3, 100):
        x = jnp.asarray(rng.integers(-50, 50, size=n, dtype=np.int64).astype(np.int32))
        assert np.array_equal(np.asarray(_scan2(jax.lax.cumsum, x)), np.cumsum(np.asarray(x)).astype(np.int32))
        assert np.array_equal(np.asarray(_scan2(jax.lax.cummax, x)), np.maximum.accumulate(np.asarray(x)))

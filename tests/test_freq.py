"""Frequency-threshold behavior (``computeFreqHist`` / L1 row drop).

Covers the [reconstructed] histogram walk of
``winSketch.hpp::computeFreqHist`` (declared ``win_sketch.pxd:25-40``)
plus the L1-side row drop (``_fastani.pyx:941-948``), on both the host
and the device L1 implementations.
"""

import numpy as np
import pytest

from pyfastani_tpu import Sketch
from pyfastani_tpu.models import _engine_np as np_engine
from pyfastani_tpu.models._engine_np import INT_MAX, compute_freq_threshold


class TestComputeFreqThreshold:
    def test_empty(self):
        assert compute_freq_threshold(np.zeros(0, np.int32)) == INT_MAX

    def test_too_small_budget(self):
        # U = 1000 -> to_ignore = int(1000 * 1e-5) = 0: nothing can be
        # ignored, the first bucket always overshoots
        row_len = np.ones(1000, np.int32)
        row_len[0] = 50
        assert compute_freq_threshold(row_len) == INT_MAX

    def test_first_bucket_overshoot(self):
        # to_ignore = 1 but two hashes share the top frequency: acc = 2 > 1
        # on the first bucket -> no filtering
        row_len = np.ones(100_000, np.int32)
        row_len[0] = 50
        row_len[1] = 50
        assert compute_freq_threshold(row_len) == INT_MAX

    def test_exact_boundary_included(self):
        # to_ignore = 1, a single hash at the top frequency: acc == budget
        # -> the boundary bucket IS included
        row_len = np.ones(100_000, np.int32)
        row_len[0] = 50
        assert compute_freq_threshold(row_len) == 50

    def test_walk_descends_buckets(self):
        # to_ignore = 3; top freqs 9, 8, 7 held by one hash each:
        # acc hits 3 exactly at freq 7
        row_len = np.ones(300_000, np.int32)
        row_len[0] = 9
        row_len[1] = 8
        row_len[2] = 7
        assert compute_freq_threshold(row_len) == 7

    def test_walk_stops_below_budget(self):
        # to_ignore = 3; freqs 9 (x1) then 5 (x4): after 9 acc=1 < 3 so
        # threshold=9; the 5-bucket would overshoot (acc=5 > 3) -> stop
        row_len = np.ones(300_000, np.int32)
        row_len[0] = 9
        row_len[1:5] = 5
        assert compute_freq_threshold(row_len) == 9


def _protein_genome(rng, n, motif, n_repeats, spacing):
    """Random protein sequence with ``motif`` planted ``n_repeats`` times."""
    alphabet = np.frombuffer(b"ACDEFGHIKLMNPQRSTVWY", dtype=np.uint8)
    seq = rng.choice(alphabet, size=n)
    for i in range(n_repeats):
        p = 1000 + i * spacing
        seq[p : p + len(motif)] = np.frombuffer(motif, dtype=np.uint8)
    return seq


class TestEndToEndThreshold:
    """Protein mode (w=1: every k-mer recorded) makes a planted 16-mer's
    posting row exactly as long as its repeat count, so a single hot hash
    can cross the ignore budget deterministically."""

    MOTIF = b"WYKLMNPQRSTVACDE"

    @pytest.fixture(scope="class")
    def mapper(self):
        rng = np.random.default_rng(7)
        seq = _protein_genome(rng, 130_000, self.MOTIF, 50, 2000)
        sketch = Sketch(protein=True, fragment_length=100, backend="numpy")
        sketch.add_genome("hot", seq.tobytes())
        return sketch.index()

    def test_threshold_below_intmax(self, mapper):
        # ~115k unique 16-mers -> to_ignore = 1; the planted motif is the
        # unique most-frequent hash -> threshold == its occurrence count
        assert mapper.occurences_threshold == 50

    def test_hot_row_dropped_in_l1_host(self, mapper):
        from pyfastani_tpu.ops.murmur3 import murmur3_32

        index = mapper._index
        hot = np.uint32(murmur3_32(self.MOTIF, 42))
        u = np.searchsorted(index.uniq_hash, hot)
        assert index.uniq_hash[u] == hot and index.row_len[u] >= 50

        # a sketch holding ONLY the hot hash yields no candidates: all its
        # 50 postings are skipped by the threshold
        q = np.asarray([hot], dtype=np.uint32)
        iv_seq, iv_c0, iv_c1 = np_engine._l1_candidates(
            q, index, mapper._param, 1
        )
        assert iv_seq.shape[0] == 0

        # the same probe against an index rebuilt with no filtering finds
        # candidate regions at the planted repeats
        import dataclasses

        unfiltered = dataclasses.replace(index, freq_threshold=INT_MAX)
        iv_seq, iv_c0, iv_c1 = np_engine._l1_candidates(
            q, unfiltered, mapper._param, 1
        )
        assert iv_seq.shape[0] == 50

    def test_device_l1_agrees(self, mapper):
        import jax.numpy as jnp

        from pyfastani_tpu import stats
        from pyfastani_tpu.ops.l1 import l1_candidates_device
        from pyfastani_tpu.ops.murmur3 import murmur3_32

        index = mapper._index
        params = mapper._param
        hot = np.uint32(murmur3_32(self.MOTIF, 42))

        # two fragments: one sketch = {hot} only, one = {hot, cold} where
        # cold is a real single-occurrence hash
        cold_u = int(np.flatnonzero(index.row_len == 1)[0])
        cold = np.uint32(index.uniq_hash[cold_u])
        S = 4
        q = np.full((2, S), 0xFFFFFFFF, np.uint32)
        q[0, 0] = hot
        q[1, 0], q[1, 1] = min(hot, cold), max(hot, cold)
        s_sizes = np.asarray([1, 2], np.int32)

        tab = stats.min_hits_relaxed_table(
            params.min_read_length, params.kmer_size,
            params.percentage_identity,
        )
        # min_hits for these sketch sizes is table-driven; force m=1 the
        # same way the host test does by clamping the table
        tab = np.minimum(tab, 1)

        for thr, exp0, exp1 in [
            (index.freq_threshold, 0, 1),  # hot dropped; cold alone maps
            (INT_MAX, 50, 51),  # unfiltered: all hot postings surface
        ]:
            # device L1 hits carry global positions: lay contigs out with
            # the same dead-gap rule as build_sharded_index
            n_ctg = int(index.mini_seqid.max()) + 1 if index.n_minimizers else 1
            max_wpos = np.zeros(n_ctg, np.int64)
            np.maximum.at(max_wpos, index.mini_seqid, index.mini_wpos)
            off = np.zeros(n_ctg + 1, np.int64)
            off[1:] = np.cumsum(max_wpos + params.min_read_length + 8)
            post_gpos = (
                off[index.post_seqid] + index.post_wpos
            ).astype(np.int32)
            m_values = tuple(sorted({int(max(int(v), 1)) for v in tab[:5]}))
            out = l1_candidates_device(
                jnp.asarray(q), jnp.asarray(s_sizes),
                jnp.asarray(index.uniq_hash),
                jnp.asarray(index.row_start.astype(np.int32)),
                jnp.asarray(index.row_len),
                jnp.asarray(post_gpos),
                jnp.asarray(np.int32(min(thr, INT_MAX))),
                jnp.asarray(tab),
                jnp.asarray(np.stack(
                    [index.hash_bucket[:-1], index.hash_bucket[1:]],
                    axis=-1,
                )),
                128, 64, params.min_read_length, index.bucket_steps,
                m_values,
            )
            iv_valid = np.asarray(out[2])
            ovf = bool(np.asarray(out[3])) or bool(np.asarray(out[4]))
            assert not ovf
            assert int(iv_valid[0].sum()) == exp0
            assert int(iv_valid[1].sum()) == exp1


def test_device_l1_beyond_2_30_gpos():
    """Global positions legitimately exceed 2**30 once a shard holds
    > ~1 Gbp of reference (the 512-genome bench).  The L1 padding
    sentinel must stay above every real gpos -- this probes a posting
    block parked beyond 2**30 (regression: the old 2**30 sentinel made
    deep-shard hits indistinguishable from padding -> zero hits)."""
    import jax.numpy as jnp

    from pyfastani_tpu.ops.l1 import l1_candidates_device

    l = 3000
    base = np.int32(2**30 + 12345)
    # two hashes, each with one posting 100 bp apart at gpos > 2**30
    uniq = np.asarray([100, 200], np.uint32)
    row_start = np.asarray([0, 1], np.int32)
    row_len = np.asarray([1, 1], np.int32)
    post_gpos = np.asarray([base, base + 100], np.int32)
    q = np.full((1, 4), 0xFFFFFFFF, np.uint32)
    q[0, 0], q[0, 1] = 100, 200
    s_sizes = np.asarray([2], np.int32)
    tab = np.full(l + 1, 2, np.int32)  # m = 2: both hits required
    hb_full = np.asarray([0, 2], np.int32)  # 1-bit prefix table... build 2^1
    hb = np.stack([np.asarray([0, 2], np.int32), np.asarray([2, 2], np.int32)])
    # proper (2^bits, 2) pair table for bits=1: bucket 0 covers all rows
    pair = np.asarray([[0, 2], [2, 2]], np.int32)
    out = l1_candidates_device(
        jnp.asarray(q), jnp.asarray(s_sizes), jnp.asarray(uniq),
        jnp.asarray(row_start), jnp.asarray(row_len),
        jnp.asarray(post_gpos), jnp.asarray(np.int32(2**31 - 1)),
        jnp.asarray(tab), jnp.asarray(pair),
        16, 8, l, 4, (2,),
    )
    iv_g0, iv_g1, iv_valid = (np.asarray(out[0]), np.asarray(out[1]),
                              np.asarray(out[2]))
    assert int(iv_valid.sum()) == 1
    assert iv_g1[0, 0] == base  # cand_end = first hit's gpos
    assert iv_g0[0, 0] == base + 100 - l + 1

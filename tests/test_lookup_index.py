"""Live `MinimizerIndex` view semantics (ref ``_fastani.pyx:1431-1539``).

The reference view wraps the C++ ``minimizerPosLookupIndex`` that L1
actually probes, so writes/deletes change subsequent query results; the
position-ordered store and frequency threshold are untouched.
"""

import pickle

import numpy as np
import pytest

from pyfastani_tpu import Position, Sketch


def _rng_genome(rng, n):
    return rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=n).tobytes()


@pytest.fixture()
def mapper():
    rng = np.random.default_rng(3)
    sketch = Sketch(backend="numpy")
    sketch.add_genome("g0", _rng_genome(rng, 60_000))
    return sketch.index()


def test_len_iter_contains_getitem(mapper):
    idx = mapper.lookup_index
    assert len(idx) == mapper._index.n_unique
    keys = list(idx)
    assert len(keys) == len(idx)
    h = keys[5]
    assert h in idx
    row = idx[h]
    assert all(isinstance(p, Position) for p in row)
    # rows are fresh lists, not views
    row.clear()
    assert len(idx[h]) > 0
    with pytest.raises(KeyError):
        idx[2**32 - 1 if (2**32 - 1) not in idx else keys[0] ^ 0x1]


def test_setitem_writes_through(mapper):
    idx = mapper.lookup_index
    h = next(iter(idx))
    idx[h] = [Position(0, 3), Position(0, 77)]
    # a fresh view over the same mapper sees the edit: the write went into
    # the queryable CSR, not a detached snapshot
    again = mapper.lookup_index
    assert [(p.sequence_id, p.window_position) for p in again[h]] == [
        (0, 3),
        (0, 77),
    ]
    # inserting an absent hash grows the index
    absent = 0
    while absent in idx:
        absent += 1
    n = len(idx)
    idx[absent] = [Position(0, 1)]
    assert len(mapper.lookup_index) == n + 1
    assert mapper._index.row_len.sum() == mapper._index.post_seqid.shape[0]


def test_delitem_writes_through(mapper):
    idx = mapper.lookup_index
    h = next(iter(idx))
    n = len(idx)
    total = mapper._index.post_seqid.shape[0]
    dropped = len(idx[h])
    del idx[h]
    assert h not in mapper.lookup_index
    assert len(mapper.lookup_index) == n - 1
    assert mapper._index.post_seqid.shape[0] == total - dropped
    with pytest.raises(KeyError):
        del idx[h]


def test_edits_change_query_results(mapper):
    """Emptying every posting row kills all hits -- queries read the
    edited index (the reference's L1 probes the same live map)."""
    rng = np.random.default_rng(3)
    query = _rng_genome(rng, 60_000)  # same seed: identical to the ref
    assert mapper.query_genome(query)

    idx = mapper.lookup_index
    for h in list(idx):
        del idx[h]
    assert len(mapper.lookup_index) == 0
    assert mapper.query_genome(query) == []


def test_edits_do_not_touch_minimizers_or_threshold(mapper):
    n_minis = len(mapper.minimizers)
    thr = mapper.occurences_threshold
    idx = mapper.lookup_index
    h = next(iter(idx))
    del idx[h]
    idx[12345] = [Position(0, 9)]
    assert len(mapper.minimizers) == n_minis
    assert mapper.occurences_threshold == thr


def test_pickle_detaches(mapper):
    idx = mapper.lookup_index
    clone = pickle.loads(pickle.dumps(idx))
    assert len(clone) == len(idx)
    h = next(iter(idx))
    assert clone[h] == idx[h]
    # the clone is standalone: editing it does not touch the mapper
    del clone[h]
    assert h in mapper.lookup_index

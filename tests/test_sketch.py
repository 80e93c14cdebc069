"""Port of the reference ``tests/test_sketch.py``
(``/root/reference/src/pyfastani/tests/test_sketch.py``) plus extra
input-polymorphism coverage that runs without optional dependencies."""

import pickle
import unittest
import warnings

import numpy as np

import pyfastani_tpu as pyfastani


class TestSketch(unittest.TestCase):

    def test_init_errors(self):
        """Check that constructor parameters are properly validated."""
        self.assertRaises(TypeError, pyfastani.Sketch, k="1")
        self.assertRaises(TypeError, pyfastani.Sketch, fragment_length="1")
        self.assertRaises(TypeError, pyfastani.Sketch, minimum_fraction="0.5")

        self.assertRaises(OverflowError, pyfastani.Sketch, k=2**32)
        self.assertRaises(ValueError, pyfastani.Sketch, k=0)
        self.assertRaises(ValueError, pyfastani.Sketch, p_value=-1.0)
        self.assertRaises(ValueError, pyfastani.Sketch, percentage_identity=-1.0)
        self.assertRaises(ValueError, pyfastani.Sketch, percentage_identity=200.0)
        self.assertRaises(BufferError, pyfastani.Sketch, k=4000)

    def test_reinit(self):
        """Check that calling `__init__` more than once does not crash."""
        sketch = pyfastani.Sketch(fragment_length=100)
        sketch.add_genome("test", "ATGC" * 100)
        self.assertEqual(sketch.names, ["test"])
        self.assertEqual(sketch.fragment_length, 100)

        sketch.__init__(fragment_length=200)
        self.assertEqual(sketch.names, [])
        self.assertEqual(sketch.fragment_length, 200)

    def test_add_draft_warnings(self):
        """Check that `Sketch.add_draft` raises warnings as expected."""
        sketch = pyfastani.Sketch()
        with warnings.catch_warnings(record=True) as catch:
            warnings.simplefilter("always")
            sketch.add_draft("short_seq", ["ATGC" * 1000, "ATGC"])
            self.assertEqual(len(catch), 1)  # second sequence is too short

    def test_add_sequence_short(self):
        """Check that a sequence too short to be hashed is still recorded."""
        sketch = pyfastani.Sketch()
        with warnings.catch_warnings(record=True):
            warnings.simplefilter("ignore")
            sketch.add_genome("short", "ATGC")
        self.assertEqual(sketch.names, ["short"])
        self.assertEqual(len(sketch.minimizers), 0)

    def test_sketch_pickle(self):
        """`Sketch` pickle round-trip preserves state."""
        sketch = pyfastani.Sketch(fragment_length=200)
        sketch.add_genome("g1", "ACGTAGCTAGCTTAGCAGCATCGAGCGAGCTATCAGCAGT" * 20)
        copy = pickle.loads(pickle.dumps(sketch))
        self.assertEqual(copy.names, sketch.names)
        self.assertEqual(copy.k, sketch.k)
        self.assertEqual(copy.fragment_length, sketch.fragment_length)
        self.assertEqual(len(copy.minimizers), len(sketch.minimizers))
        for a, b in zip(copy.minimizers, sketch.minimizers):
            self.assertEqual(a, b)

    def test_parameters_properties(self):
        sketch = pyfastani.Sketch()
        self.assertEqual(sketch.k, 16)
        self.assertEqual(sketch.window_size, 24)
        self.assertEqual(sketch.fragment_length, 3000)
        self.assertAlmostEqual(sketch.minimum_fraction, 0.2, places=6)
        self.assertAlmostEqual(sketch.percentage_identity, 80.0)
        self.assertAlmostEqual(sketch.p_value, 1e-3)
        self.assertFalse(sketch.protein)

        prot = pyfastani.Sketch(protein=True)
        self.assertTrue(prot.protein)
        self.assertEqual(prot.window_size, 1)

    def test_k_warning(self):
        with warnings.catch_warnings(record=True) as catch:
            warnings.simplefilter("always")
            pyfastani.Sketch(k=17)
            self.assertTrue(any("accuracy" in str(w.message) for w in catch))

    def test_mapper_not_instantiable(self):
        self.assertRaises(TypeError, pyfastani.Mapper)

    def test_occurences_threshold_before_index(self):
        sketch = pyfastani.Sketch()
        self.assertEqual(sketch.occurences_threshold, 2**31 - 1)


class TestInputTypes(unittest.TestCase):
    """Any buffer or string input must produce identical minimizers
    (the reference contract pinned by its 4-way test matrix)."""

    SEQ = "ACGTAGCTAGCTTAGCAGCATCGAGCGAGCTATCAGCAGTTTACGCATCAGT" * 10

    def _minimizers(self, seq_obj):
        sketch = pyfastani.Sketch(fragment_length=100)
        sketch.add_genome("x", seq_obj)
        return [(m.hash, m.window_position) for m in sketch.minimizers]

    def test_equivalence(self):
        base = self._minimizers(self.SEQ)
        self.assertGreater(len(base), 0)
        variants = [
            self.SEQ.encode("ascii"),
            bytearray(self.SEQ.encode("ascii")),
            memoryview(self.SEQ.encode("ascii")),
            np.frombuffer(self.SEQ.encode("ascii"), dtype=np.uint8),
            self.SEQ.lower(),
            self.SEQ.lower().encode("ascii"),
        ]
        for v in variants:
            self.assertEqual(self._minimizers(v), base, type(v).__name__)

    def test_query_input_types(self):
        rng = np.random.default_rng(42)
        ref = "".join(rng.choice(list("ACGT"), size=3200).tolist())
        sketch = pyfastani.Sketch(fragment_length=100, backend="numpy")
        sketch.add_genome("ref", ref)
        mapper = sketch.index()
        expected = mapper.query_genome(ref)
        self.assertEqual(len(expected), 1)
        for v in (ref.encode(), bytearray(ref.encode()), ref.lower()):
            hits = mapper.query_genome(v)
            self.assertEqual(hits, expected)


if __name__ == "__main__":
    unittest.main()

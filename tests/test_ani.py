"""Port of the reference ANI integration tests
(``/root/reference/src/pyfastani/tests/test_ani.py``), including the
4-way input-type polymorphism matrix.

The two bacterial genomes ship via the reference's ``vendor/FastANI``
submodule which is empty in the snapshot, so those cases self-skip
exactly like the reference suite does; the MIBiG protein golden
(130/176 matches against two identical references) is on disk and is the
end-to-end acceptance gate for the reconstructed L1/L2/CGI pipeline.
"""

import os
import pickle
import unittest

from pyfastani_tpu import Sketch
from pyfastani_tpu._fasta import Parser

DATA_FOLDER = os.path.realpath(
    os.path.join(__file__, "..", "data")
)

ECOLI = os.path.join(DATA_FOLDER, "Escherichia_coli_str_K12_MG1655.fna")
SFLEXNERI = os.path.join(DATA_FOLDER, "Shigella_flexneri_2a_01.fna")

BGC0001425 = os.path.join(DATA_FOLDER, "BGC0001425.faa")
BGC0001427 = os.path.join(DATA_FOLDER, "BGC0001427.faa")
BGC0001428 = os.path.join(DATA_FOLDER, "BGC0001428.faa")


class _TestANI(object):

    @unittest.skipUnless(os.path.exists(ECOLI), "missing FastANI data files")
    @unittest.skipUnless(os.path.exists(SFLEXNERI), "missing FastANI data files")
    def test_fastani_example(self):
        """Check that we get the same results as FastANI on their example data."""
        sketch = Sketch()
        sketch.add_draft(
            "Escherichia_coli_str_K12_MG1655",
            [self._get_sequence(r) for r in self._load_fasta(ECOLI)],
        )
        mapper = sketch.index()
        contigs = self._load_fasta(SFLEXNERI)
        hits = mapper.query_draft(map(self._get_sequence, contigs))

        self.assertEqual(len(hits), 1)
        self.assertEqual(hits[0].name, "Escherichia_coli_str_K12_MG1655")
        self.assertEqual(hits[0].matches, 1303)
        self.assertEqual(hits[0].fragments, 1608)
        self.assertAlmostEqual(hits[0].identity, 97.7507, places=4)

    @unittest.skipUnless(os.path.exists(ECOLI), "missing FastANI data files")
    def test_escherichia_minimizers(self):
        """Check that we extract as many minimizers as FastANI on their data."""
        contigs = [self._get_sequence(r) for r in self._load_fasta(ECOLI)]

        sketch = Sketch()
        self.assertEqual(sketch.window_size, 24)
        sketch.add_draft("Escherichia_coli_str_K12_MG1655", contigs)
        self.assertEqual(len(sketch.minimizers), 371301)
        mapper = sketch.index()
        self.assertEqual(len(mapper.lookup_index), 361568)

        hits = mapper.query_draft(contigs)
        self.assertEqual(len(hits), 1)
        self.assertEqual(hits[0].name, "Escherichia_coli_str_K12_MG1655")
        self.assertEqual(hits[0].matches, 1547)
        self.assertEqual(hits[0].fragments, 1547)
        self.assertAlmostEqual(hits[0].identity, 100.0)

    @unittest.skipUnless(os.path.exists(SFLEXNERI), "missing FastANI data files")
    def test_shigella_minimizers(self):
        """Check that we extract as many minimizers as FastANI on their data."""
        contigs = [self._get_sequence(r) for r in self._load_fasta(SFLEXNERI)]

        sketch = Sketch()
        self.assertEqual(sketch.window_size, 24)
        sketch.add_draft("Shigella_flexneri_2a_01", contigs)
        self.assertEqual(len(sketch.minimizers), 386387)
        mapper = sketch.index()
        self.assertEqual(len(mapper.lookup_index), 347908)

        hits = mapper.query_draft(contigs)
        self.assertEqual(len(hits), 1)
        self.assertEqual(hits[0].name, "Shigella_flexneri_2a_01")
        self.assertEqual(hits[0].matches, 1600)
        self.assertEqual(hits[0].fragments, 1608)
        self.assertAlmostEqual(hits[0].identity, 100.0)

    @unittest.skipUnless(os.path.exists(BGC0001425), "missing test data files")
    @unittest.skipUnless(os.path.exists(BGC0001427), "missing test data files")
    @unittest.skipUnless(os.path.exists(BGC0001428), "missing test data files")
    def test_myxochromide_bgcs(self):
        """Check that we get expected hits between homologous BGCs."""
        sketch = Sketch(protein=True, fragment_length=100)
        bgc1 = self._load_fasta(BGC0001425)
        sketch.add_draft("BGC0001425", map(self._get_sequence, bgc1))
        # NB: the reference test adds bgc1 twice (under the 1427 name)
        sketch.add_draft("BGC0001427", map(self._get_sequence, bgc1))

        mapper = sketch.index()
        bgc3 = self._load_fasta(BGC0001428)
        hits = mapper.query_draft(map(self._get_sequence, bgc3))

        self.assertEqual(len(hits), 2)
        self.assertEqual(hits[0].name, "BGC0001425")
        # the un-edited reference golden (test_ani.py:109-115)
        self.assertEqual(hits[0].matches, 130)
        self.assertEqual(hits[0].fragments, 176)
        # the reference does not assert the protein identity; this engine's
        # deterministic value is pinned as a regression guard
        self.assertAlmostEqual(hits[0].identity, 96.7250, places=3)
        self.assertEqual(hits[1].name, "BGC0001427")
        self.assertEqual(hits[1].matches, 130)
        self.assertEqual(hits[1].fragments, 176)
        self.assertEqual(hits[0].identity, hits[1].identity)


class TestANIString(_TestANI, unittest.TestCase):

    def _load_fasta(self, path):
        return list(Parser(path))

    def _get_sequence(self, record):
        return record.seq.decode("ascii")


class TestANIBytes(_TestANI, unittest.TestCase):

    def _load_fasta(self, path):
        return list(Parser(path))

    def _get_sequence(self, record):
        return record.seq

    @unittest.skipUnless(os.path.exists(ECOLI), "missing FastANI data files")
    def test_sketch_pickling(self):
        """Check that pickling before indexing produces consistent results."""
        sketch = Sketch()
        ref = self._load_fasta(ECOLI)
        sketch.add_genome(
            "Escherichia_coli_str_K12_MG1655", self._get_sequence(ref[0])
        )
        mapper = pickle.loads(pickle.dumps(sketch)).index()
        contigs = self._load_fasta(SFLEXNERI)
        hits = mapper.query_draft(map(self._get_sequence, contigs))
        self.assertEqual(len(hits), 1)
        self.assertEqual(hits[0].matches, 1303)
        self.assertEqual(hits[0].fragments, 1608)
        self.assertAlmostEqual(hits[0].identity, 97.7507, places=4)

    @unittest.skipUnless(os.path.exists(ECOLI), "missing FastANI data files")
    def test_mapper_pickling(self):
        """Check that pickling after indexing produces consistent results."""
        sketch = Sketch()
        ref = self._load_fasta(ECOLI)
        sketch.add_genome(
            "Escherichia_coli_str_K12_MG1655", self._get_sequence(ref[0])
        )
        mapper = pickle.loads(pickle.dumps(sketch.index()))
        contigs = self._load_fasta(SFLEXNERI)
        hits = mapper.query_draft(map(self._get_sequence, contigs))
        self.assertEqual(len(hits), 1)
        self.assertEqual(hits[0].matches, 1303)
        self.assertEqual(hits[0].fragments, 1608)
        self.assertAlmostEqual(hits[0].identity, 97.7507, places=4)

    def test_protein_pickling(self):
        """Pickle round-trips reproduce the protein golden (on-disk data)."""
        if not os.path.exists(BGC0001425):
            self.skipTest("missing test data files")
        sketch = Sketch(protein=True, fragment_length=100)
        bgc1 = self._load_fasta(BGC0001425)
        sketch.add_draft("BGC0001425", map(self._get_sequence, bgc1))

        # pickle before indexing
        mapper = pickle.loads(pickle.dumps(sketch)).index()
        bgc3 = self._load_fasta(BGC0001428)
        hits = mapper.query_draft(map(self._get_sequence, bgc3))
        self.assertEqual(len(hits), 1)
        self.assertEqual(hits[0].matches, 130)
        self.assertEqual(hits[0].fragments, 176)

        # pickle after indexing
        sketch2 = Sketch(protein=True, fragment_length=100)
        sketch2.add_draft("BGC0001425", map(self._get_sequence, bgc1))
        mapper2 = pickle.loads(pickle.dumps(sketch2.index()))
        hits2 = mapper2.query_draft(map(self._get_sequence, bgc3))
        self.assertEqual(hits2[0].matches, 130)
        self.assertEqual(hits2[0].fragments, 176)
        self.assertEqual(hits2[0].identity, hits[0].identity)


try:
    import skbio.io as skbio_io
except ImportError:
    skbio_io = None


@unittest.skipUnless(skbio_io, "Scikit-bio is required for this test suite")
class TestANISkbio(_TestANI, unittest.TestCase):

    def _load_fasta(self, path):
        return list(skbio_io.read(path, "fasta"))

    def _get_sequence(self, sequence):
        return sequence.values.view("B")


try:
    import Bio.SeqIO
except ImportError:
    Bio = None


@unittest.skipUnless(Bio, "Biopython is required for this test suite")
class TestANIBiopython(_TestANI, unittest.TestCase):

    def _load_fasta(self, path):
        return list(Bio.SeqIO.parse(path, "fasta"))

    def _get_sequence(self, record):
        return bytes(record.seq)

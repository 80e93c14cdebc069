"""Native C runtime vs pure-Python fallback parity."""

import os
import tempfile

import numpy as np
import pytest

from pyfastani_tpu import _native
from pyfastani_tpu._fasta import Parser, _NativeParser
from pyfastani_tpu.ops import codec
from pyfastani_tpu.ops.murmur3 import murmur3_32


pytestmark = pytest.mark.skipif(
    not _native.HAVE_NATIVE, reason="native extension not built"
)


def test_murmur_parity():
    rng = np.random.default_rng(0)
    for n in (0, 1, 3, 4, 5, 16, 33):
        data = rng.integers(0, 256, size=n, dtype=np.uint8).tobytes()
        assert _native.murmur3_32(data, 42) == murmur3_32(data, 42)


def test_codec_parity():
    rng = np.random.default_rng(1)
    data = rng.integers(0, 256, size=1000, dtype=np.uint8)
    assert _native.copy_upper(data.tobytes()) == codec.upper_inplace(data).tobytes()
    up = np.frombuffer(_native.copy_upper(data.tobytes()), dtype=np.uint8)
    assert _native.reverse_complement(up.tobytes()) == codec.reverse_complement(up).tobytes()


def test_parser_parity(tmp_path):
    path = tmp_path / "x.fa"
    path.write_text(">a desc\nacgt\nACGTNn\n>b\n" + "A" * 5000 + "\n\n>c\n\n")
    native = list(Parser(str(path)))
    # force the pure-python parser by bypassing Parser.__new__ dispatch
    pyp = object.__new__(Parser)
    pyp.__init__(str(path))
    records = []
    while True:
        try:
            records.append(pyp.__next__())
        except StopIteration:
            break
    assert [r.id for r in native] == [r.id for r in records]
    assert [r.seq for r in native] == [r.seq for r in records]
    assert native[0].seq == b"ACGTACGTNN"
    assert len(native[1].seq) == 5000


def test_parser_no_leading_header(tmp_path):
    path = tmp_path / "bad.fa"
    path.write_text("ACGT\n>a\nACGT\n")
    assert list(Parser(str(path))) == []


def test_winnow_two_segment_parity():
    """The native winnow's two-segment path (mid-sequence rule + phantom
    stitch + threaded hash pass, fastamod.c) only activates at
    P >= 2^20 windows; exercise it against the oracle-validated numpy
    winnow on multi-Mbp inputs, including a poly-A prefix long enough
    that the window-0 phantom's reign spans the segment seam."""
    from pyfastani_tpu.models._engine_np import winnow_sequence
    from pyfastani_tpu.models._params import Parameters

    k, w = 16, 24
    params = Parameters(kmer_size=k, window_size=w)
    rng = np.random.default_rng(97)
    alphabet = np.frombuffer(b"ACGT", dtype=np.uint8)

    rand = rng.choice(alphabet, size=2_200_000)
    seam_polyA = rand.copy()
    seam_polyA[:1_200_000] = ord("A")  # phantom reign crosses the P/2 seam

    for data in (rand, seam_polyA):
        buf = data.tobytes()
        hn, pn = _native.winnow(buf, k, w)
        eh, ep = winnow_sequence(data, params)
        got_h = np.frombuffer(hn, dtype=np.uint32)
        got_p = np.frombuffer(pn, dtype=np.int32)
        assert got_h.shape == eh.shape
        assert np.array_equal(got_h, eh)
        assert np.array_equal(got_p, ep)

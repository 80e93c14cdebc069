"""Minimal FASTA parser (parity with ``/root/reference/src/pyfastani/_fasta.pyx``).

Reads uncompressed FASTA with a 2048-byte line buffer semantics: a header
line longer than the buffer raises `BufferError` like the reference
(``_fasta.pyx:77-80``); sequence lines are uppercased (C locale) and
concatenated; records are ``Record(id: str, seq: bytes)``.

A native C implementation lives in ``pyfastani_tpu._native`` and is used
automatically when built; this module is the portable fallback and the
behavioral specification.
"""

from __future__ import annotations

import numpy as np

from .ops.codec import upper_inplace

__all__ = ["Record", "Parser"]

_LINE_BUFFER = 2048


class Record:
    """A FASTA record with an identifier and a sequence."""

    __slots__ = ("id", "seq")

    def __init__(self, id: str, seq: bytes):
        self.id = id
        self.seq = seq


class Parser:
    """An iterator over the records of an (uncompressed) FASTA file."""

    def __new__(cls, path: str):
        from . import _native

        if _native.HAVE_NATIVE:
            return _NativeParser(path)
        return super().__new__(cls)

    def __init__(self, path: str):
        self._file = open(path, "rb")
        self._line = self._file.readline(_LINE_BUFFER)

    def __del__(self):
        try:
            self._file.close()
        except Exception:
            pass

    def __iter__(self):
        return self

    def __next__(self):
        line = self._line
        if not line.startswith(b">"):
            self._file.close()
            raise StopIteration()
        if not line.endswith(b"\n"):
            raise BufferError("FASTA identifier too large for the line buffer")
        # strip '>' and trailing newline (and a carriage return, if any)
        header = line[1:-1]
        record_id = header.decode("latin-1")

        chunks = []
        while True:
            line = self._file.readline()
            if not line:
                self._line = b""
                break
            if line.startswith(b">"):
                self._line = line
                break
            if line.endswith(b"\n"):
                line = line[:-1]
            chunks.append(line)

        raw = b"".join(chunks)
        seq = upper_inplace(np.frombuffer(raw, dtype=np.uint8)).tobytes()
        return Record(record_id, seq)


class _NativeParser:
    """Iterator facade over the C extension's batch FASTA reader."""

    def __init__(self, path: str):
        from . import _native

        with open(path, "rb") as f:
            first = f.read(1)
        if first != b">":
            # parity with the line-oriented parser: no leading header,
            # no records (it stops at the first non-header line)
            self._records = iter(())
        else:
            self._records = iter(_native.parse_fasta(path))

    def __iter__(self):
        return self

    def __next__(self):
        record_id, seq = next(self._records)
        return Record(record_id, seq)

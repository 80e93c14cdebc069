"""Result and introspection types of the public API.

Behavioral parity targets:
  * ``Hit``            -- ``/root/reference/src/pyfastani/_fastani.pyx:1271-1324``
  * ``MinimizerInfo``  -- ``:1327-1379``
  * ``Position``       -- ``:1382-1428``
  * ``Minimizers``     -- ``:1203-1268`` (read-only sequence view)
  * ``MinimizerIndex`` -- ``:1431-1539`` (mutable mapping view)

Unlike the reference (views over C++ vectors/unordered_maps), the backing
store here is three flat NumPy/JAX integer arrays (hash, seqId, wpos) in
structure-of-arrays form -- the layout the TPU kernels consume directly and
the only thing that needs serializing (the posting index is always rebuilt,
matching ``_fastani.pyx:861-865``).
"""

from __future__ import annotations

import numpy as np

__all__ = ["Hit", "MinimizerInfo", "Position", "Minimizers", "MinimizerIndex"]


class Hit:
    """A single hit found when querying a `Mapper` with a genome.

    Attributes:
        name (`object`): The name of the genome that produced a hit, as
            given to `Sketch.add_genome` or `Sketch.add_draft`.
        matches (`int`): The number of fragments that matched the target
            genome.
        fragments (`int`): The total number of fragments used to compare
            the query and target genomes.
        identity (`float`): The average nucleotide identity between the
            two genomes, given as a percentage.
    """

    __slots__ = ("name", "matches", "fragments", "identity")

    def __init__(self, name, identity, matches, fragments):
        self.name = name
        # the reference stores identity as a C float; mirror the rounding
        self.identity = float(np.float32(identity))
        self.matches = int(matches)
        self.fragments = int(fragments)

    def __repr__(self):
        return "{}(name={!r}, identity={!r}, matches={!r}, fragments={!r})".format(
            type(self).__name__, self.name, self.identity, self.matches, self.fragments
        )

    def __eq__(self, other):
        if not isinstance(other, Hit):
            return NotImplemented
        return (
            self.name == other.name
            and self.matches == other.matches
            and self.fragments == other.fragments
            and self.identity == other.identity
        )

    def __reduce__(self):
        return (Hit, (self.name, self.identity, self.matches, self.fragments))


class MinimizerInfo:
    """The information about a single minimizer."""

    __slots__ = ("hash", "sequence_id", "window_position")

    def __init__(self, hash, sequence_id, window_position):
        self.hash = int(hash)
        self.sequence_id = int(sequence_id)
        self.window_position = int(window_position)

    def __repr__(self):
        return "{}(hash={!r}, sequence_id={!r}, window_position={!r})".format(
            type(self).__name__, self.hash, self.sequence_id, self.window_position
        )

    def __eq__(self, other):
        if not isinstance(other, MinimizerInfo):
            return NotImplemented
        return (
            self.hash == other.hash
            and self.sequence_id == other.sequence_id
            and self.window_position == other.window_position
        )

    def __reduce__(self):
        return (MinimizerInfo, (self.hash, self.sequence_id, self.window_position))


class Position:
    """A (sequence id, window position) location of a minimizer."""

    __slots__ = ("sequence_id", "window_position")

    def __init__(self, sequence_id, window_position):
        self.sequence_id = int(sequence_id)
        self.window_position = int(window_position)

    def __repr__(self):
        return "{}(sequence_id={!r}, window_position={!r})".format(
            type(self).__name__, self.sequence_id, self.window_position
        )

    def __eq__(self, other):
        if not isinstance(other, Position):
            return NotImplemented
        return (
            self.sequence_id == other.sequence_id
            and self.window_position == other.window_position
        )

    def __reduce__(self):
        return (Position, (self.sequence_id, self.window_position))


class Minimizers:
    """A read-only sequence view over the minimizers of a `Sketch`/`Mapper`.

    Backed by the owner's structure-of-arrays minimizer store; indexing
    materializes `MinimizerInfo` objects lazily like the reference view.
    """

    def __init__(self, owner=None):
        self._owner = owner
        # detached storage, only used when unpickling a standalone view
        self._state = None

    def _arrays(self):
        """Return (hashes, seq_ids, wpos) uint64/int64 numpy arrays."""
        if self._owner is not None:
            return self._owner._minimizer_arrays()
        if self._state is not None:
            return self._state
        z = np.zeros(0, dtype=np.int64)
        return z, z, z

    def __len__(self):
        return int(self._arrays()[0].shape[0])

    def __getitem__(self, index):
        hashes, ids, offsets = self._arrays()
        length = hashes.shape[0]
        idx = int(index)
        if idx < 0:
            idx += length
        if idx < 0 or idx >= length:
            raise IndexError(index)
        return MinimizerInfo(hashes[idx], ids[idx], offsets[idx])

    def __iter__(self):
        hashes, ids, offsets = self._arrays()
        for h, i, o in zip(hashes, ids, offsets):
            yield MinimizerInfo(h, i, o)

    def __getstate__(self):
        hashes, ids, offsets = self._arrays()
        return {
            "hashes": [int(x) for x in hashes],
            "ids": [int(x) for x in ids],
            "offsets": [int(x) for x in offsets],
            "length": int(hashes.shape[0]),
        }

    def __setstate__(self, state):
        hashes = np.asarray(state["hashes"], dtype=np.uint32)
        ids = np.asarray(state["ids"], dtype=np.int32)
        offsets = np.asarray(state["offsets"], dtype=np.int32)
        if self._owner is not None:
            self._owner._set_minimizer_arrays(hashes, ids, offsets)
        else:
            self._state = (hashes, ids, offsets)


class MinimizerIndex:
    """The index mapping minimizer hash values to their positions.

    A `dict`-backed MutableMapping view (hash -> list of `Position`),
    mirroring the reference's view over the C++ ``unordered_map``
    (``_fastani.pyx:1431-1539``).
    """

    def __init__(self):
        self._map = {}
        self.owner = None

    @classmethod
    def _from_dict(cls, mapping, owner):
        self = cls.__new__(cls)
        self._map = mapping
        self.owner = owner
        return self

    def __len__(self):
        return len(self._map)

    def __iter__(self):
        return iter(self._map)

    def __contains__(self, item):
        return int(item) in self._map

    def __getitem__(self, item):
        try:
            return list(self._map[int(item)])
        except KeyError:
            raise KeyError(item) from None

    def __setitem__(self, item, value):
        self._map[int(item)] = [
            Position(p.sequence_id, p.window_position) for p in value
        ]

    def __delitem__(self, item):
        try:
            del self._map[int(item)]
        except KeyError:
            raise KeyError(item) from None

    def __reduce__(self):
        return (MinimizerIndex, (), None, None, self.items())

    def items(self):
        for key, positions in self._map.items():
            yield key, list(positions)

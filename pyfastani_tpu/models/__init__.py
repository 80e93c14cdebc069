"""High-level engine classes: `Sketch`, `Mapper`, result and view types.

Mirrors the reference public API surface
(``/root/reference/src/pyfastani/_fastani.pyx:449-1539``).
"""

from ._types import Hit, MinimizerInfo, Position, Minimizers, MinimizerIndex
from ._sketch import Sketch, Mapper, MAX_KMER_SIZE

__all__ = [
    "Sketch",
    "Mapper",
    "Hit",
    "Minimizers",
    "MinimizerInfo",
    "MinimizerIndex",
    "Position",
    "MAX_KMER_SIZE",
]

"""Vectorized MurmurHash3_x86_32 over every k-mer position of a sequence.

The reference hashes each k-mer with ``skch::CommonFunc::getHash``
(declared ``/root/reference/include/fastani/map/common_func.pxd:10``;
[reconstructed] MurmurHash3_x86_32 with ``seed = 42``, first 32 bits taken,
per FastANI's vendored ``common/murmur3.h``), one scalar call per position.

Here the hash of *all* positions is computed at once: the byte stream is
turned into a rolling array of little-endian uint32 words ``W[i]``; the
Murmur block loop for position ``i`` then reads ``W[i + 4*j]`` -- pure
shifted slices, so the whole computation is k/4 rounds of elementwise
uint32 VPU math over the position axis, identical for NumPy and JAX.

All operations use wrapping uint32 arithmetic (both backends wrap
silently for arrays).
"""

from __future__ import annotations

import numpy as np

__all__ = ["kmer_hashes", "murmur3_32"]

_C1 = 0xCC9E2D51
_C2 = 0x1B873593


def _rotl32(xp, x, r: int):
    r = r & 31
    return (x << xp.uint32(r)) | (x >> xp.uint32(32 - r))


def _fmix32(xp, h):
    h = h ^ (h >> xp.uint32(16))
    h = h * xp.uint32(0x85EBCA6B)
    h = h ^ (h >> xp.uint32(13))
    h = h * xp.uint32(0xC2B2AE35)
    h = h ^ (h >> xp.uint32(16))
    return h


def kmer_hashes(xp, data, k: int, seed: int = 42, out_len: int | None = None):
    """Murmur3_x86_32 of ``data[i:i+k]`` for every position ``i``.

    Args:
        xp: array namespace (``numpy`` or ``jax.numpy``).
        data: uint8 array of length ``L`` (may include padding; positions
            whose k-mer reads padding produce garbage hashes that callers
            must mask).
        k: k-mer length (static).
        seed: murmur seed (42 in FastANI).
        out_len: number of positions to emit; defaults to ``L - k + 1``.

    Returns:
        uint32 array of length ``out_len``.
    """
    L = data.shape[0]
    n = L - k + 1 if out_len is None else out_len
    if n <= 0:
        return xp.zeros((0,), dtype=xp.uint32)

    u8 = data.astype(xp.uint32)

    def word_at(off):
        # little-endian uint32 at byte offset `off`, for n positions
        return (
            u8[off : off + n]
            | (u8[off + 1 : off + 1 + n] << xp.uint32(8))
            | (u8[off + 2 : off + 2 + n] << xp.uint32(16))
            | (u8[off + 3 : off + 3 + n] << xp.uint32(24))
        )

    h1 = xp.full((n,), seed, dtype=xp.uint32)
    nblocks = k // 4
    for j in range(nblocks):
        k1 = word_at(4 * j)
        k1 = k1 * xp.uint32(_C1)
        k1 = _rotl32(xp, k1, 15)
        k1 = k1 * xp.uint32(_C2)
        h1 = h1 ^ k1
        h1 = _rotl32(xp, h1, 13)
        h1 = h1 * xp.uint32(5) + xp.uint32(0xE6546B64)

    tail = k & 3
    if tail:
        base = 4 * nblocks
        k1 = xp.zeros((n,), dtype=xp.uint32)
        if tail >= 3:
            k1 = k1 ^ (u8[base + 2 : base + 2 + n] << xp.uint32(16))
        if tail >= 2:
            k1 = k1 ^ (u8[base + 1 : base + 1 + n] << xp.uint32(8))
        k1 = k1 ^ u8[base : base + n]
        k1 = k1 * xp.uint32(_C1)
        k1 = _rotl32(xp, k1, 15)
        k1 = k1 * xp.uint32(_C2)
        h1 = h1 ^ k1

    h1 = h1 ^ xp.uint32(k)
    return _fmix32(xp, h1)


def murmur3_32(data: bytes, seed: int = 42) -> int:
    """Scalar MurmurHash3_x86_32 of a byte string (host-side oracle)."""
    with np.errstate(over="ignore"):
        arr = np.frombuffer(data, dtype=np.uint8)
        k = len(data)
        if k == 0:
            h = np.uint32(seed)
            return int(_fmix32(np, h ^ np.uint32(0)))
        # pad so kmer_hashes can form full words safely
        padded = np.concatenate([arr, np.zeros(4, dtype=np.uint8)])
        return int(kmer_hashes(np, padded, k, seed=seed, out_len=1)[0])

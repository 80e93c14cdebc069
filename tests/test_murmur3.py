"""MurmurHash3_x86_32 correctness against a freshly-compiled C oracle."""

import ctypes
import os
import subprocess
import tempfile

import numpy as np
import pytest

from pyfastani_tpu.ops.murmur3 import kmer_hashes, murmur3_32

_C_SOURCE = r"""
#include <stdint.h>
#include <string.h>

static inline uint32_t rotl32(uint32_t x, int8_t r) {
    return (x << r) | (x >> (32 - r));
}

uint32_t murmur3_x86_32(const void *key, int len, uint32_t seed) {
    const uint8_t *data = (const uint8_t *)key;
    const int nblocks = len / 4;
    uint32_t h1 = seed;
    const uint32_t c1 = 0xcc9e2d51;
    const uint32_t c2 = 0x1b873593;
    const uint8_t *blocks = data;
    for (int i = 0; i < nblocks; i++) {
        uint32_t k1;
        memcpy(&k1, blocks + i * 4, 4);
        k1 *= c1; k1 = rotl32(k1, 15); k1 *= c2;
        h1 ^= k1; h1 = rotl32(h1, 13); h1 = h1 * 5 + 0xe6546b64;
    }
    const uint8_t *tail = data + nblocks * 4;
    uint32_t k1 = 0;
    switch (len & 3) {
    case 3: k1 ^= tail[2] << 16; /* fallthrough */
    case 2: k1 ^= tail[1] << 8;  /* fallthrough */
    case 1: k1 ^= tail[0];
            k1 *= c1; k1 = rotl32(k1, 15); k1 *= c2; h1 ^= k1;
    }
    h1 ^= len;
    h1 ^= h1 >> 16; h1 *= 0x85ebca6b; h1 ^= h1 >> 13;
    h1 *= 0xc2b2ae35; h1 ^= h1 >> 16;
    return h1;
}
"""


@pytest.fixture(scope="module")
def c_oracle():
    tmp = tempfile.mkdtemp(prefix="mm3_")
    src = os.path.join(tmp, "mm3.c")
    lib = os.path.join(tmp, "mm3.so")
    with open(src, "w") as f:
        f.write(_C_SOURCE)
    subprocess.run(
        ["cc", "-O2", "-shared", "-fPIC", "-o", lib, src], check=True
    )
    dll = ctypes.CDLL(lib)
    dll.murmur3_x86_32.restype = ctypes.c_uint32
    dll.murmur3_x86_32.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_uint32]

    def call(data: bytes, seed: int = 42) -> int:
        return int(dll.murmur3_x86_32(data, len(data), seed))

    return call


def test_scalar_vs_c(c_oracle):
    rng = np.random.default_rng(0)
    for length in [1, 2, 3, 4, 5, 7, 8, 15, 16, 17, 31, 100]:
        for _ in range(5):
            data = rng.integers(0, 256, size=length, dtype=np.uint8).tobytes()
            for seed in (0, 42, 0xDEADBEEF):
                assert murmur3_32(data, seed) == c_oracle(data, seed), (length, seed)


@pytest.mark.parametrize("k", [3, 4, 5, 15, 16, 17, 20])
def test_kmer_hashes_numpy_vs_c(c_oracle, k):
    rng = np.random.default_rng(k)
    data = rng.integers(0, 256, size=200, dtype=np.uint8)
    n = data.shape[0] - k + 1
    with np.errstate(over="ignore"):
        hashes = kmer_hashes(np, np.concatenate([data, np.zeros(4, np.uint8)]), k, out_len=n)
    for i in range(n):
        assert int(hashes[i]) == c_oracle(data[i : i + k].tobytes()), i


def test_kmer_hashes_jax_matches_numpy():
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    data = rng.integers(0, 256, size=500, dtype=np.uint8)
    padded = np.concatenate([data, np.zeros(4, np.uint8)])
    n = data.shape[0] - 16 + 1
    with np.errstate(over="ignore"):
        h_np = kmer_hashes(np, padded, 16, out_len=n)
    h_jax = np.asarray(kmer_hashes(jnp, jnp.asarray(padded), 16, out_len=n))
    np.testing.assert_array_equal(h_np, h_jax)

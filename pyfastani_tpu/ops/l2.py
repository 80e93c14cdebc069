"""Batched L2 stage: sliding union-sketch intersection as MXU matmuls.

The reference evaluates, for each L1 candidate region, the shared-sketch
count at every window offset with an ordered-map sliding intersection
([reconstructed] ``slidingMap.hpp`` / ``computeL2MappedRegions``, declared
at ``include/fastani/map/compute_map.pxd:30-51``); the effective count is
``|Sq ∩ window|`` (containment -- see the note in
``_engine_np._l2_shared_curve``, forced by the exact-100.0 self-query
goldens).  Pointer-chasing over a ``std::map`` has no TPU analogue;
instead the computation is one dense contraction per
(offset-chunk x ref-minimizer x sketch-hash) block:

    present[c, i] = (InWin @ P) >= 1      (query hash i in ref window c)
    shared[c]     = sum_i present[c, i]

All matrices are 0/1 in float32 (counts < 2^24, exact), so the contraction
rides the MXU.  Intervals longer than the chunk size are split into chunks;
(max, first-argmax, last-argmax) merge associatively across chunks.

Outputs are integers only -- identity and gate math happen on the host in
one shared float32 code path, so host and device engines agree bitwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.jaxconfig import configure as _configure_jax

_configure_jax()

__all__ = ["l2_chunk_scan"]

_UMAX = jnp.uint32(0xFFFFFFFF)
_SLAB = 16  # chunks processed per inner step to bound memory


@functools.partial(
    jax.jit, static_argnames=("cmax", "rmax", "smax", "cmw")
)
def _l2_chunks_impl(
    q_sorted,  # (F, S) u32 per-fragment sketch hashes, ascending, UMAX pad
    s_sizes,  # (F,) i32
    mini_hash,  # (M,) u32 position-ordered reference minimizers
    mini_wpos,  # (M,) i32
    chunk_frag,  # (N,) i32 fragment id per chunk
    chunk_c0,  # (N,) i32 first window offset of the chunk
    chunk_clen,  # (N,) i32 number of offsets (<= cmax)
    chunk_lo,  # (N,) i32 first ref-minimizer index for the chunk
    chunk_rlen,  # (N,) i32 number of ref minimizers (<= rmax)
    cmax: int,
    rmax: int,
    smax: int,
    cmw: int,
):
    M = mini_hash.shape[0]

    def slab(args):
        frag, c0, clen, lo, rlen = args
        B = frag.shape[0]

        # gather ref minimizers for each chunk
        j_idx = jnp.arange(rmax, dtype=jnp.int32)[None, :]  # (1, R)
        valid_j = j_idx < rlen[:, None]
        gidx = jnp.clip(lo[:, None] + j_idx, 0, max(M - 1, 0))
        rh = jnp.where(valid_j, mini_hash[gidx], _UMAX)
        rp = jnp.where(valid_j, mini_wpos[gidx], jnp.int32(-(10**9)))

        q = q_sorted[frag]  # (B, S)
        s = s_sizes[frag]  # (B,)

        # rank of each ref hash within the query sketch
        i_idx = jnp.arange(smax, dtype=jnp.int32)[None, None, :]  # (1,1,S)
        valid_i = i_idx < s[:, None, None]  # (B,1,S)
        qrank = jnp.sum(
            (q[:, None, :] < rh[:, :, None]) & valid_i, axis=2
        ).astype(jnp.int32)  # (B, R)
        in_q = jnp.any(
            (q[:, None, :] == rh[:, :, None]) & valid_i, axis=2
        ) & valid_j  # (B, R)

        # P[j, i] = 1 iff ref mini j realizes query hash i
        i2 = jnp.arange(smax, dtype=jnp.int32)[None, None, :]
        P = (in_q[:, :, None] & (i2 == qrank[:, :, None])).astype(jnp.float32)

        # window membership per offset
        c = c0[:, None] + jnp.arange(cmax, dtype=jnp.int32)[None, :]  # (B,C)
        in_win = (
            (rp[:, None, :] >= c[:, :, None])
            & (rp[:, None, :] < c[:, :, None] + cmw)
            & valid_j[:, None, :]
        ).astype(jnp.float32)  # (B, C, R)

        present = (
            jnp.einsum("bcr,brs->bcs", in_win, P, preferred_element_type=jnp.float32)
            >= 1.0
        )
        shared = jnp.sum(present, axis=2).astype(jnp.int32)  # (B,C)

        # mask offsets beyond the chunk length
        off_ok = jnp.arange(cmax, dtype=jnp.int32)[None, :] < clen[:, None]
        shared = jnp.where(off_ok, shared, jnp.int32(-1))

        best = jnp.max(shared, axis=1)
        off = jnp.arange(cmax, dtype=jnp.int32)[None, :]
        is_best = shared == best[:, None]
        first = jnp.min(jnp.where(is_best, off, jnp.int32(2**30)), axis=1)
        last = jnp.max(jnp.where(is_best, off, jnp.int32(-1)), axis=1)
        return best, c0 + first, c0 + last

    N = chunk_frag.shape[0]
    n_slabs = N // _SLAB
    args = (
        chunk_frag.reshape(n_slabs, _SLAB),
        chunk_c0.reshape(n_slabs, _SLAB),
        chunk_clen.reshape(n_slabs, _SLAB),
        chunk_lo.reshape(n_slabs, _SLAB),
        chunk_rlen.reshape(n_slabs, _SLAB),
    )
    best, first, last = jax.lax.map(slab, args)
    return best.reshape(N), first.reshape(N), last.reshape(N)


def _bucket(n: int, lo: int = 16) -> int:
    return max(lo, 1 << int(n - 1).bit_length())


def l2_chunk_scan(
    q_sorted: np.ndarray,
    s_sizes: np.ndarray,
    mini_hash,
    mini_wpos,
    chunks: np.ndarray,
    cmw: int,
    cmax: int = 256,
):
    """Evaluate shared-sketch curves for interval chunks on device.

    Args:
        q_sorted: (F, S) uint32 per-fragment sketches (ascending, UMAX pad).
        s_sizes: (F,) int32.
        mini_hash/mini_wpos: device (or numpy) reference minimizer arrays.
        chunks: (N, 5) int32 [frag, c0, clen, lo, rlen] with clen <= cmax.
        cmw: countMinimizerWindows.
        cmax: static chunk width.

    Returns:
        (best, first, last) int32 numpy arrays of length N; `first`/`last`
        are absolute window offsets of the first/last maximal position
        within the chunk.
    """
    N = chunks.shape[0]
    if N == 0:
        z = np.zeros(0, np.int32)
        return z, z, z
    rmax = _bucket(int(chunks[:, 4].max(initial=1)))
    n_pad = -N % _SLAB
    if n_pad:
        pad = np.zeros((n_pad, 5), dtype=np.int32)
        chunks = np.concatenate([chunks, pad], axis=0)
    best, first, last = _l2_chunks_impl(
        jnp.asarray(q_sorted),
        jnp.asarray(s_sizes),
        jnp.asarray(mini_hash),
        jnp.asarray(np.asarray(mini_wpos, dtype=np.int32)),
        jnp.asarray(chunks[:, 0]),
        jnp.asarray(chunks[:, 1]),
        jnp.asarray(chunks[:, 2]),
        jnp.asarray(chunks[:, 3]),
        jnp.asarray(chunks[:, 4]),
        cmax,
        rmax,
        int(q_sorted.shape[1]),
        cmw,
    )
    return (
        np.asarray(best)[:N],
        np.asarray(first)[:N],
        np.asarray(last)[:N],
    )

"""Batched device winnowing and sketch construction for query fragments.

The reference maps each 3 kb fragment on a thread pool
(``_fastani.pyx:1099-1102``); here the fragment axis is a vectorized batch
dimension: one jitted program winnows every fragment of a genome, sorts
per-fragment hashes, and compacts them to unique sketch hashes -- all
integer outputs, so the host-side and device-side engines agree bitwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import winnow as wops

__all__ = ["winnow_fragments", "winnow_long_sequence"]

_UMAX = jnp.uint32(0xFFFFFFFF)


@functools.partial(
    jax.jit, static_argnames=("k", "w", "length", "protein")
)
def _winnow_fragments_impl(frags, k: int, w: int, length: int, protein: bool):
    """frags: (F, length + pad) uint8 -> (record (F,P) bool, hash (F,P) u32,
    q_sorted (F,P) u32 sketch hashes sorted ascending with UMAX padding,
    s (F,) int32 sketch sizes)."""
    n_pos = length - k + 1

    def one(frag):
        if protein:
            canon, valid = wops.prot_hashes(jnp, frag, length, k, n_pos)
        else:
            canon, valid = wops.nucl_canonical(jnp, frag, length, k, n_pos)
        return wops.winnow(jnp, canon, valid, w)

    record, win_hash = jax.vmap(one)(frags)

    # per-fragment sketch: sorted unique hashes of recorded minimizers
    masked = jnp.where(record, win_hash, _UMAX)
    s_sorted = jnp.sort(masked, axis=1)
    # first-occurrence mask (UMAX padding collapses into the tail)
    first = jnp.ones_like(record)
    first = first.at[:, 1:].set(s_sorted[:, 1:] != s_sorted[:, :-1])
    first = first & (s_sorted != _UMAX)
    q_sorted = jnp.sort(jnp.where(first, s_sorted, _UMAX), axis=1)
    s = jnp.sum(first, axis=1).astype(jnp.int32)
    return record, win_hash, q_sorted, s


def winnow_fragments(frags_np: np.ndarray, k: int, w: int, protein: bool):
    """Host wrapper: frags_np (F, length) uint8 -> numpy results."""
    F, length = frags_np.shape
    padded = np.zeros((F, length + 4), dtype=np.uint8)
    padded[:, :length] = frags_np
    record, win_hash, q_sorted, s = _winnow_fragments_impl(
        jnp.asarray(padded), k, w, length, protein
    )
    return (
        np.asarray(record),
        np.asarray(win_hash),
        np.asarray(q_sorted),
        np.asarray(s),
    )


@functools.partial(jax.jit, static_argnames=("k", "w", "n_pos", "protein"))
def _winnow_seq_impl(data, n, k: int, w: int, n_pos: int, protein: bool):
    if protein:
        canon, valid = wops.prot_hashes(jnp, data, n, k, n_pos)
    else:
        canon, valid = wops.nucl_canonical(jnp, data, n, k, n_pos)
    record, win_hash = wops.winnow(jnp, canon, valid, w)
    return record, win_hash


def winnow_long_sequence(data_np: np.ndarray, k: int, w: int, protein: bool):
    """Winnow one long sequence on device with power-of-two length bucketing.

    Returns (hashes u32, wpos i32) of the recorded minimizers, identical to
    the host `winnow_sequence`.
    """
    n = int(data_np.shape[0])
    n_pos = n - k + 1
    if n_pos < 1 or n_pos - w + 1 < 1:
        return np.zeros(0, np.uint32), np.zeros(0, np.int32)
    # bucket the padded length to limit recompilation
    bucket = 1 << max(12, (n + k + 4 - 1).bit_length())
    padded = np.zeros(bucket, dtype=np.uint8)
    padded[:n] = data_np
    record, win_hash = _winnow_seq_impl(
        jnp.asarray(padded), n, k, w, bucket - k + 1, protein
    )
    record = np.asarray(record)
    win_hash = np.asarray(win_hash)
    wpos = np.flatnonzero(record).astype(np.int32)
    return win_hash[record], wpos

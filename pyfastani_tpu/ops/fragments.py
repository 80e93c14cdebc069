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


_CHUNK_WINDOWS = 1 << 20  # windows winnowed per device call


@functools.partial(
    jax.jit, static_argnames=("k", "w", "B", "protein", "first_chunk")
)
def _winnow_chunk_jit(
    slice_bytes,  # (L,) u8: bytes covering this chunk's k-mers (+halo)
    n_slice,  # valid byte count within the slice
    carry,  # (has_prev, prev_pos_local, phantom, h0)
    k: int,
    w: int,
    B: int,
    protein: bool,
    first_chunk: bool,
):
    halo = w - 1
    n_pos_slice = B + (halo if first_chunk else 2 * halo)
    if protein:
        canon, valid = wops.prot_hashes(jnp, slice_bytes, n_slice, k, n_pos_slice)
    else:
        canon, valid = wops.nucl_canonical(jnp, slice_bytes, n_slice, k, n_pos_slice)
    if first_chunk and halo:
        canon = jnp.concatenate(
            [jnp.full((halo,), 0xFFFFFFFF, jnp.uint32), canon]
        )
        valid = jnp.concatenate([jnp.zeros((halo,), bool), valid])
    record, win_hash, carry = wops.winnow_chunk(
        jnp, canon, valid, w, carry, first_chunk=first_chunk
    )
    return record, win_hash, carry


def winnow_long_sequence(data_np: np.ndarray, k: int, w: int, protein: bool):
    """Winnow one long sequence on device, in fixed-size chunks.

    One compiled shape serves every sequence length (the reference
    streams through a fixed 2*2048-byte ring buffer for the same reason,
    ``_fastani.pyx:179-196``).  Returns (hashes u32, wpos i32), identical
    to the host `winnow_sequence`.
    """
    n = int(data_np.shape[0])
    n_pos = n - k + 1
    if n_pos < 1 or n_pos - w + 1 < 1:
        return np.zeros(0, np.uint32), np.zeros(0, np.int32)

    B = _CHUNK_WINDOWS
    halo = w - 1
    L = B + 2 * halo + k - 1 + 4  # fixed slice length
    n_windows = n_pos - w + 1  # valid windows: [0, n_windows)

    carry = (
        jnp.asarray(False),
        jnp.asarray(0, jnp.int32),
        jnp.asarray(False),
        jnp.asarray(0, jnp.uint32),
    )
    out_h, out_p = [], []
    base = 0
    first = True
    while base < n_windows:
        lo = 0 if first else base - halo
        sl = np.zeros(L, dtype=np.uint8)
        avail = data_np[lo : lo + L]
        sl[: avail.shape[0]] = avail
        record, win_hash, carry = _winnow_chunk_jit(
            jnp.asarray(sl), min(n - lo, L), carry, k, w, B, protein, first
        )
        rec = np.asarray(record)
        wh = np.asarray(win_hash)
        take = min(B, n_windows - base)
        rec = rec[:take]
        sel = np.flatnonzero(rec)
        out_h.append(wh[:take][sel])
        out_p.append((sel + base).astype(np.int32))
        base += B
        first = False
    return (
        np.concatenate(out_h) if out_h else np.zeros(0, np.uint32),
        np.concatenate(out_p) if out_p else np.zeros(0, np.int32),
    )

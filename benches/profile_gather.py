"""Micro-profile the L1 hit-gather substage ops."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

F, S, HMAX, M = 2664, 384, 1024, 1_600_000


def bench(fn, *args, n=5):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args); jax.block_until_ready(out)
    return (time.time() - t0) / n


rng = np.random.default_rng(0)
lens = jnp.asarray(rng.integers(0, 3, size=(F, S)).astype(np.int32))
table = jnp.asarray(rng.integers(0, 2**30, size=M).astype(np.int32))
src = jnp.asarray(rng.integers(0, M, size=(F, HMAX)).astype(np.int32))
scat_col = jnp.asarray(rng.integers(0, HMAX + 1, size=(F, S)).astype(np.int32))
s_ids = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None, :], (F, S))

t_cumsum = bench(jax.jit(lambda x: jnp.cumsum(x, axis=1)), lens)

def scatter(sc):
    seg = jnp.zeros((F, HMAX + 1), jnp.int32)
    return seg.at[jnp.arange(F, dtype=jnp.int32)[:, None], sc].max(s_ids)
t_scatter = bench(jax.jit(scatter), scat_col)

seg0 = scatter(scat_col)
t_cummax = bench(jax.jit(lambda x: jax.lax.cummax(x[:, :HMAX], axis=1)), seg0)

t_gather_big = bench(jax.jit(lambda s: table[s]), src)

segc = jnp.asarray(rng.integers(0, S, size=(F, HMAX)).astype(np.int32))
t_tala = bench(jax.jit(lambda a, i: jnp.take_along_axis(a, i, axis=1)), lens, segc)

print(f"cumsum (F,S):           {t_cumsum*1e3:8.1f} ms")
print(f"scatter-max (F,S->H):   {t_scatter*1e3:8.1f} ms")
print(f"cummax (F,H):           {t_cummax*1e3:8.1f} ms")
print(f"big gather (F,H)<-M:    {t_gather_big*1e3:8.1f} ms")
print(f"take_along_axis (F,H):  {t_tala*1e3:8.1f} ms")

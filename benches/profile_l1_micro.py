"""Micro-time the flat-L1 primitive ops at bench shapes (synthetic data).

Separates: N-step probe gathers, the expansion scatter+cummax, flat
random gathers, take-at-offset gathers, lax.sort, segment reductions
(scatter-based), and searchsorted-based first/last extraction -- so the
optimization target on real hardware is unambiguous.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pyfastani_tpu.utils.jaxconfig import configure

configure()

F, S = 2688, 384
HMAX = 512
IVMAX = 48
T = F * HMAX
U = 1_270_000
M = 1_600_000


def bench(name, fn, *args, n=5):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = f(*args)
        jax.block_until_ready(out)
    print(f"{name:28s} {(time.time()-t0)/n*1e3:8.1f} ms", flush=True)


def main():
    rng = np.random.default_rng(0)
    tbl = jnp.asarray(np.sort(rng.integers(0, 2**32, U, dtype=np.uint64).astype(np.uint32)))
    q = jnp.asarray(rng.integers(0, 2**32, (F, S), dtype=np.uint64).astype(np.uint32))
    idx_T = jnp.asarray(rng.integers(0, M, T, dtype=np.int64).astype(np.int32))
    vals_M = jnp.asarray(rng.integers(0, 2**20, M, dtype=np.int64).astype(np.int32))
    vals_M2 = jnp.asarray(rng.integers(0, 2**20, (M, 2), dtype=np.int64).astype(np.int32))
    flat_T = jnp.asarray(rng.integers(0, 2**20, T, dtype=np.int64).astype(np.int32))
    seg_T = jnp.asarray(np.sort(rng.integers(0, F * IVMAX, T, dtype=np.int64)).astype(np.int32))
    lens = jnp.asarray(rng.integers(0, 2, (F * S,), dtype=np.int64).astype(np.int32))
    keys3 = tuple(
        jnp.asarray(rng.integers(0, 2**20, T, dtype=np.int64).astype(np.int32))
        for _ in range(3)
    )
    g2d = jnp.asarray(rng.integers(0, T, (F, IVMAX), dtype=np.int64).astype(np.int32))
    bcum = jnp.asarray(np.sort(rng.integers(0, F * 2, T, dtype=np.int64)).astype(np.int32))

    def probe10(q):
        lo = jnp.zeros_like(q, dtype=jnp.int32)
        hi = jnp.full_like(lo, U)
        for _ in range(10):
            mid = (lo + hi) // 2
            v = tbl[jnp.clip(mid, 0, U - 1)]
            go = v < q
            lo = jnp.where(go, mid + 1, lo)
            hi = jnp.where(~go, mid, hi)
        return lo

    bench("probe 10-step (F,S)", probe10, q)

    def scatter_cummax(lens):
        off_end = jnp.cumsum(lens)
        off_begin = off_end - lens
        pid = jnp.arange(F * S, dtype=jnp.int32)
        scat = jnp.where(lens > 0, jnp.minimum(off_begin, T), T)
        seg = jnp.zeros((T + 1,), jnp.int32).at[scat].max(pid)
        return jax.lax.cummax(seg[:T])

    bench("scatter+cummax (T,)", scatter_cummax, lens)
    bench("gather M->T x1", lambda i: vals_M[i], idx_T)
    bench("gather M->T pair (M,2)", lambda i: vals_M2[i], idx_T)
    bench(
        "near-gather x[t+m] x3",
        lambda x, i: (x[i], x[i], x[i]),
        flat_T,
        jnp.clip(jnp.arange(T, dtype=jnp.int32) + 7, 0, T - 1),
    )
    bench("sort3 (T,) flat", lambda a, b, c: jax.lax.sort((a, b, c), num_keys=3), *keys3)
    bench(
        "segment_max T->F*IVMAX",
        lambda x, s: jax.ops.segment_max(x, s, num_segments=F * IVMAX + 1),
        flat_T,
        seg_T,
    )
    bench(
        "searchsorted T for (F,IVMAX)",
        lambda bc, g: jnp.searchsorted(bc, g.reshape(-1)).reshape(F, IVMAX),
        bcum,
        g2d,
    )
    bench("cumsum (T,)", lambda x: jnp.cumsum(x), flat_T)
    bench(
        "rowsort (F,1024)",
        lambda x: jnp.sort(x, axis=1),
        jnp.asarray(
            rng.integers(0, 2**32, (F, 1024), dtype=np.uint64).astype(np.uint32)
        ),
    )


if __name__ == "__main__":
    main()

"""Isolate the Pallas L2 kernel on the real TPU: time lower/compile/run
separately at a tiny size, so a pathological Mosaic compile or a runtime
hang is distinguishable from the surrounding XLA program.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(f"[kp {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from pyfastani_tpu.ops.l2_pallas import _l2_pallas_impl, _pad_rows_2d

    log(f"devices: {jax.devices()}")

    N = int(os.environ.get("KP_N", "8"))
    Rr = int(os.environ.get("KP_RR", "8"))
    Sc = int(os.environ.get("KP_SC", "128"))
    cmw = 2985
    M = 4096
    Mr = M // 128
    F = 8

    rng = np.random.default_rng(0)
    mini_hash = rng.integers(0, 2**32, size=M, dtype=np.uint64).astype(np.uint32)
    mini_wpos = np.sort(rng.integers(0, 100_000, size=M)).astype(np.int32)
    mini_seqid = np.zeros(M, np.int32)
    mini_prev = np.full(M, -(2**30), np.int32)

    mh2d = _pad_rows_2d(jnp.asarray(mini_hash), np.uint32(0xFFFFFFFF), Mr, Rr + 8)
    mp2d = _pad_rows_2d(jnp.asarray(mini_wpos), np.int32(2**30), Mr, Rr + 8)
    ms2d = _pad_rows_2d(jnp.asarray(mini_seqid), np.int32(2**30), Mr, Rr + 8)
    mv2d = _pad_rows_2d(jnp.asarray(mini_prev), np.int32(-(2**30)), Mr, Rr + 8)
    q_pad = jnp.full((F + 8, Sc), np.uint32(0xFFFFFFFF), jnp.uint32)

    row = jnp.zeros(N, jnp.int32)
    ofs = jnp.zeros(N, jnp.int32)
    rlen = jnp.full(N, Rr * 128 - 128, jnp.int32)
    frag = jnp.zeros(N, jnp.int32)
    c0 = jnp.zeros(N, jnp.int32)
    clen = jnp.full(N, 3072, jnp.int32)
    seq = jnp.zeros(N, jnp.int32)

    t0 = time.time()
    lowered = _l2_pallas_impl.lower(
        row, ofs, rlen, frag, c0, clen, seq, mh2d, mp2d, ms2d, mv2d, q_pad,
        Rr, Sc, cmw, False,
    )
    log(f"lowered in {time.time()-t0:.1f}s")
    t0 = time.time()
    compiled = lowered.compile()
    log(f"compiled in {time.time()-t0:.1f}s")
    t0 = time.time()
    out = compiled(
        row, ofs, rlen, frag, c0, clen, seq, mh2d, mp2d, ms2d, mv2d, q_pad
    )
    jax.block_until_ready(out)
    log(f"first run in {time.time()-t0:.3f}s; best[:4]={np.asarray(out[0][:4])}")
    t0 = time.time()
    for _ in range(5):
        out = compiled(
            row, ofs, rlen, frag, c0, clen, seq, mh2d, mp2d, ms2d, mv2d, q_pad
        )
        jax.block_until_ready(out)
    log(f"steady {((time.time()-t0)/5)*1e3:.1f} ms/call (N={N})")


if __name__ == "__main__":
    main()

"""Bisect the real L2 kernel's TPU hang: KP_CUT disables pieces.

KP_CUT values: none (full kernel), mem (skip membership), stab (skip
stabbing loop), qdma (skip the q-row DMA), out1 (single output).
"""
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CUT = os.environ.get("KP_CUT", "none")
_BIG = np.int32(2**30)
Rr, Sc, N, cmw = 8, 128, 8, 2985
Mr = 32
F = 8


def log(m):
    print(f"[real {time.strftime('%H:%M:%S')}] {m}", flush=True)


def _kernel(
    row_ref, ofs_ref, rlen_ref, frag_ref, c0_ref, clen_ref, seq_ref,
    mh_ref, mp_ref, ms_ref, mv_ref, q_ref,
    best_ref, first_ref, last_ref,
    rh_s, rp_s, rs_s, rv_s, q_s, acc_s, sem,
):
    i = pl.program_id(0)
    row = row_ref[i]
    frag = frag_ref[i]
    fbase = (frag // 8) * 8
    fsub = frag - fbase

    ofs = ofs_ref[i]
    rlen = rlen_ref[i]
    c0 = c0_ref[i]
    clen = clen_ref[i]
    seq = seq_ref[i]

    best_ref[i] = jnp.int32(-1)
    first_ref[i] = c0
    last_ref[i] = c0

    @pl.when((rlen > 0) & (clen > 0))
    def _live():
        cp_h = pltpu.make_async_copy(mh_ref.at[pl.ds(row, Rr)], rh_s, sem.at[0])
        cp_p = pltpu.make_async_copy(mp_ref.at[pl.ds(row, Rr)], rp_s, sem.at[1])
        cp_s = pltpu.make_async_copy(ms_ref.at[pl.ds(row, Rr)], rs_s, sem.at[2])
        cp_v = pltpu.make_async_copy(mv_ref.at[pl.ds(row, Rr)], rv_s, sem.at[3])
        cp_h.start()
        cp_p.start()
        cp_s.start()
        cp_v.start()
        if CUT != "qdma":
            cp_q = pltpu.make_async_copy(q_ref.at[pl.ds(fbase, 8)], q_s, sem.at[4])
            cp_q.start()
        cp_h.wait()
        cp_p.wait()
        cp_s.wait()
        cp_v.wait()
        if CUT != "qdma":
            cp_q.wait()

        flat = jax.lax.broadcasted_iota(jnp.int32, (Rr, 128), 0) * 128 + (
            jax.lax.broadcasted_iota(jnp.int32, (Rr, 128), 1)
        )
        valid = (flat >= ofs) & (flat < ofs + rlen) & (rs_s[...] == seq)
        rp = jnp.where(valid, rp_s[...], _BIG)

        ident = (
            jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        ).astype(jnp.float32)
        dn = (((1,), (1,)), ((), ()))

        def _t(x_f32):
            return jax.lax.dot_general(
                ident, x_f32, dn, preferred_element_type=jnp.float32
            )

        rh_i = rh_s[...].astype(jnp.int32)
        rpT = _t(rp.astype(jnp.float32))
        rhT_hi = _t(((rh_i >> 16) & 0xFFFF).astype(jnp.float32))
        rhT_lo = _t((rh_i & 0xFFFF).astype(jnp.float32))
        rvT = _t(rv_s[...].astype(jnp.float32))
        validT = _t(valid.astype(jnp.float32))

        row_ids = jax.lax.broadcasted_iota(jnp.int32, (8, Sc), 0)
        q_i32 = jnp.where(
            row_ids == fsub, q_s[...].astype(jnp.int32), jnp.int32(0)
        )
        q_row = jnp.sum(q_i32, axis=0, keepdims=True)
        q_hi = ((q_row >> 16) & 0xFFFF).astype(jnp.float32)
        q_lo = (q_row & 0xFFFF).astype(jnp.float32)

        anchor_ok = valid & (rp >= c0) & (rp < c0 + clen)
        rp_f = rp.astype(jnp.float32)
        acc_s[...] = jnp.zeros((Rr, 128), jnp.int32)

        if CUT != "stab":
            for jb in range(Rr):

                @pl.when(jb * 128 < ofs + rlen)
                def _blk(jb=jb):
                    pj = rpT[:, jb : jb + 1]
                    st = jnp.maximum(pj - (cmw - 1), rvT[:, jb : jb + 1] + 1)
                    if CUT == "mem":
                        cd = validT[:, jb : jb + 1] > 0.5
                    else:
                        eq = (rhT_hi[:, jb : jb + 1] == q_hi) & (
                            rhT_lo[:, jb : jb + 1] == q_lo
                        )
                        in_q = jnp.any(eq, axis=1, keepdims=True)
                        cd = in_q & (validT[:, jb : jb + 1] > 0.5)

                    for ab in range(Rr):

                        @pl.when(ab * 128 < ofs + rlen)
                        def _ablk(jb=jb, ab=ab, st=st, pj=pj, cd=cd):
                            pa = rp_f[ab : ab + 1, :]
                            stab = cd & (st <= pa) & (pa <= pj)
                            acc_s[ab : ab + 1, :] += jnp.sum(
                                stab.astype(jnp.int32), axis=0, keepdims=True
                            )

        shared = jnp.where(anchor_ok, acc_s[...], -1)
        best = jnp.max(shared)
        is_best = shared == best
        first = jnp.min(jnp.where(is_best, rp, _BIG))
        last = jnp.max(jnp.where(is_best, rp, -_BIG))
        none = best < 0
        best_ref[i] = best
        first_ref[i] = jnp.where(none, c0, first)
        last_ref[i] = jnp.where(none, c0, last)


def main():
    log(f"cut={CUT} devices={jax.devices()}")
    rng = np.random.default_rng(0)
    Mrows = Mr + Rr + 8
    mh2d = jnp.asarray(rng.integers(0, 2**31, (Mrows, 128)).astype(np.uint32))
    mp2d = jnp.asarray(
        np.sort(rng.integers(0, 100_000, Mrows * 128)).astype(np.int32).reshape(Mrows, 128)
    )
    ms2d = jnp.zeros((Mrows, 128), jnp.int32)
    mv2d = jnp.full((Mrows, 128), -_BIG, jnp.int32)
    q_pad = jnp.full((F + 8, Sc), np.uint32(0xFFFFFFFF), jnp.uint32)

    row = jnp.zeros(N, jnp.int32)
    ofs = jnp.zeros(N, jnp.int32)
    rlen = jnp.full(N, Rr * 128 - 128, jnp.int32)
    frag = jnp.zeros(N, jnp.int32)
    c0 = jnp.zeros(N, jnp.int32)
    clen = jnp.full(N, 3072, jnp.int32)
    seq = jnp.zeros(N, jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(N,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 5,
        out_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 3,
        scratch_shapes=[
            pltpu.VMEM((Rr, 128), jnp.uint32),
            pltpu.VMEM((Rr, 128), jnp.int32),
            pltpu.VMEM((Rr, 128), jnp.int32),
            pltpu.VMEM((Rr, 128), jnp.int32),
            pltpu.VMEM((8, Sc), jnp.uint32),
            pltpu.VMEM((Rr, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((5,)),
        ],
    )
    fn = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((N,), jnp.int32)] * 3,
    )
    t0 = time.time()
    out = jax.jit(fn)(row, ofs, rlen, frag, c0, clen, seq, mh2d, mp2d, ms2d, mv2d, q_pad)
    jax.block_until_ready(out)
    log(f"compile+run {time.time()-t0:.1f}s best={np.asarray(out[0][:4])}")
    t0 = time.time()
    for _ in range(5):
        out = jax.jit(fn)(row, ofs, rlen, frag, c0, clen, seq, mh2d, mp2d, ms2d, mv2d, q_pad)
        jax.block_until_ready(out)
    log(f"steady {(time.time()-t0)/5*1e3:.1f} ms")


if __name__ == "__main__":
    main()

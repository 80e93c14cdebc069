"""A/B isolation of the L2 kernel hang on real TPU.

KP_MODE=dma    : manual make_async_copy HBM->VMEM, trivial compute
KP_MODE=comp   : whole-array VMEM in_specs, full compute path, no manual DMA
KP_MODE=both   : manual DMA + full compute (the real kernel shape)
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

MODE = os.environ.get("KP_MODE", "dma")
Rr, Sc, N = 8, 128, 8
Mr = 32
cmw = 2985
_BIG = np.int32(2**30)


def log(m):
    print(f"[ab {time.strftime('%H:%M:%S')}] {m}", flush=True)


def compute(rh_i, rp_i, rv_i, rs_i, q_row_i, ofs, rlen, c0, clen, seq):
    flat = jax.lax.broadcasted_iota(jnp.int32, (Rr, 128), 0) * 128 + (
        jax.lax.broadcasted_iota(jnp.int32, (Rr, 128), 1)
    )
    valid = (flat >= ofs) & (flat < ofs + rlen) & (rs_i == seq)
    rp = jnp.where(valid, rp_i, _BIG)
    ident = (
        jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    ).astype(jnp.float32)
    dn = (((1,), (1,)), ((), ()))

    def _t(x):
        return jax.lax.dot_general(ident, x, dn, preferred_element_type=jnp.float32)

    rpT = _t(rp.astype(jnp.float32))
    rhT_hi = _t(((rh_i >> 16) & 0xFFFF).astype(jnp.float32))
    rhT_lo = _t((rh_i & 0xFFFF).astype(jnp.float32))
    rvT = _t(rv_i.astype(jnp.float32))
    validT = _t(valid.astype(jnp.float32))
    q_hi = ((q_row_i >> 16) & 0xFFFF).astype(jnp.float32)
    q_lo = (q_row_i & 0xFFFF).astype(jnp.float32)
    anchor_ok = valid & (rp >= c0) & (rp < c0 + clen)
    rp_f = rp.astype(jnp.float32)
    acc = jnp.zeros((Rr, 128), jnp.int32)
    for jb in range(Rr):
        pj = rpT[:, jb : jb + 1]
        st = jnp.maximum(pj - (cmw - 1), rvT[:, jb : jb + 1] + 1)
        eq = (rhT_hi[:, jb : jb + 1] == q_hi) & (rhT_lo[:, jb : jb + 1] == q_lo)
        in_q = jnp.any(eq, axis=1, keepdims=True)
        cd = in_q & (validT[:, jb : jb + 1] > 0.5)
        row_acc = []
        for ab in range(Rr):
            pa = rp_f[ab : ab + 1, :]
            stab = cd & (st <= pa) & (pa <= pj)
            row_acc.append(jnp.sum(stab.astype(jnp.int32), axis=0, keepdims=True))
        acc = acc + jnp.concatenate(row_acc, axis=0)
    shared = jnp.where(anchor_ok, acc, -1)
    return jnp.max(shared)


def kernel_dma(row_ref, ofs_ref, mh_ref, mp_ref, out_ref, rh_s, rp_s, sem):
    i = pl.program_id(0)
    row = row_ref[i]
    cp1 = pltpu.make_async_copy(mh_ref.at[pl.ds(row, Rr)], rh_s, sem.at[0])
    cp2 = pltpu.make_async_copy(mp_ref.at[pl.ds(row, Rr)], rp_s, sem.at[1])
    cp1.start()
    cp2.start()
    cp1.wait()
    cp2.wait()
    out_ref[i] = jnp.sum(rp_s[...]) + ofs_ref[i]


def kernel_comp(row_ref, ofs_ref, mh_ref, mp_ref, out_ref):
    i = pl.program_id(0)
    rh_i = mh_ref[pl.ds(0, Rr)].astype(jnp.int32)
    rp_i = mp_ref[pl.ds(0, Rr)]
    q_row = rh_i[0:1, :Sc] * 0 + 7
    out_ref[i] = compute(
        rh_i, rp_i, rp_i * 0 - _BIG, rp_i * 0, q_row,
        ofs_ref[i], jnp.int32(896), jnp.int32(0), jnp.int32(3072), jnp.int32(0),
    )


def kernel_both(row_ref, ofs_ref, mh_ref, mp_ref, out_ref, rh_s, rp_s, sem):
    i = pl.program_id(0)
    row = row_ref[i]
    cp1 = pltpu.make_async_copy(mh_ref.at[pl.ds(row, Rr)], rh_s, sem.at[0])
    cp2 = pltpu.make_async_copy(mp_ref.at[pl.ds(row, Rr)], rp_s, sem.at[1])
    cp1.start()
    cp2.start()
    cp1.wait()
    cp2.wait()
    rh_i = rh_s[...].astype(jnp.int32)
    rp_i = rp_s[...]
    q_row = rh_i[0:1, :Sc] * 0 + 7
    out_ref[i] = compute(
        rh_i, rp_i, rp_i * 0 - _BIG, rp_i * 0, q_row,
        ofs_ref[i], jnp.int32(896), jnp.int32(0), jnp.int32(3072), jnp.int32(0),
    )


def kernel_when(row_ref, ofs_ref, mh_ref, mp_ref, out_ref, rh_s, rp_s, acc_s, sem):
    """both + outer pl.when + defaults + nested pl.when scratch accumulation
    -- mirrors the real kernel's control structure."""
    i = pl.program_id(0)
    row = row_ref[i]
    ofs = ofs_ref[i]
    out_ref[i] = jnp.int32(-1)

    @pl.when(row >= 0)
    def _live():
        cp1 = pltpu.make_async_copy(mh_ref.at[pl.ds(row, Rr)], rh_s, sem.at[0])
        cp2 = pltpu.make_async_copy(mp_ref.at[pl.ds(row, Rr)], rp_s, sem.at[1])
        cp1.start()
        cp2.start()
        cp1.wait()
        cp2.wait()
        rh_i = rh_s[...].astype(jnp.int32)
        rp_i = rp_s[...]
        q_row = rh_i[0:1, :Sc] * 0 + 7
        rlen = jnp.int32(896)
        acc_s[...] = jnp.zeros((Rr, 128), jnp.int32)
        for jb in range(Rr):

            @pl.when(jb * 128 < ofs + rlen)
            def _blk(jb=jb):
                for ab in range(Rr):

                    @pl.when(ab * 128 < ofs + rlen)
                    def _ablk(jb=jb, ab=ab):
                        pa = rp_i[ab : ab + 1, :].astype(jnp.float32)
                        pj = rp_i[:, jb : jb + 1].astype(jnp.float32)
                        stab = (pj <= pa) & (pa <= pj + 100.0)
                        acc_s[ab : ab + 1, :] += jnp.sum(
                            stab.astype(jnp.int32), axis=0, keepdims=True
                        )

        out_ref[i] = jnp.max(acc_s[...])


def kernel_whendot(row_ref, ofs_ref, mh_ref, mp_ref, out_ref, rh_s, rp_s, acc_s, sem):
    """kernel_when + an MXU dot_general inside the pl.when region."""
    i = pl.program_id(0)
    row = row_ref[i]
    ofs = ofs_ref[i]
    out_ref[i] = jnp.int32(-1)

    @pl.when(row >= 0)
    def _live():
        cp1 = pltpu.make_async_copy(mh_ref.at[pl.ds(row, Rr)], rh_s, sem.at[0])
        cp2 = pltpu.make_async_copy(mp_ref.at[pl.ds(row, Rr)], rp_s, sem.at[1])
        cp1.start()
        cp2.start()
        cp1.wait()
        cp2.wait()
        rp_i = rp_s[...]
        ident = (
            jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        ).astype(jnp.float32)
        dn = (((1,), (1,)), ((), ()))
        rpT = jax.lax.dot_general(
            ident, rp_i.astype(jnp.float32), dn,
            preferred_element_type=jnp.float32,
        )  # (128, Rr)
        acc_s[...] = jnp.zeros((Rr, 128), jnp.int32)
        for jb in range(Rr):

            @pl.when(jb * 128 < ofs + jnp.int32(896))
            def _blk(jb=jb):
                pj = rpT[:, jb : jb + 1]
                pa = rp_i[jb : jb + 1, :].astype(jnp.float32)
                stab = (pj <= pa) & (pa <= pj + 100.0)
                acc_s[jb : jb + 1, :] += jnp.sum(
                    stab.astype(jnp.int32), axis=0, keepdims=True
                )

        out_ref[i] = jnp.max(acc_s[...])


def main():
    log(f"mode={MODE} devices={jax.devices()}")
    rng = np.random.default_rng(0)
    mh = jnp.asarray(
        rng.integers(0, 2**31, size=(Mr + Rr + 8, 128)).astype(np.uint32)
    )
    mp = jnp.asarray(
        np.sort(rng.integers(0, 100_000, size=(Mr + Rr + 8) * 128))
        .astype(np.int32)
        .reshape(Mr + Rr + 8, 128)
    )
    row = jnp.zeros(N, jnp.int32)
    ofs = jnp.zeros(N, jnp.int32)

    if MODE == "dma":
        kern, scratch = kernel_dma, [
            pltpu.VMEM((Rr, 128), jnp.uint32),
            pltpu.VMEM((Rr, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ]
        in_specs = [pl.BlockSpec(memory_space=pl.ANY)] * 2
    elif MODE == "whendot":
        kern, scratch = kernel_whendot, [
            pltpu.VMEM((Rr, 128), jnp.uint32),
            pltpu.VMEM((Rr, 128), jnp.int32),
            pltpu.VMEM((Rr, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ]
        in_specs = [pl.BlockSpec(memory_space=pl.ANY)] * 2
    elif MODE == "when":
        kern, scratch = kernel_when, [
            pltpu.VMEM((Rr, 128), jnp.uint32),
            pltpu.VMEM((Rr, 128), jnp.int32),
            pltpu.VMEM((Rr, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ]
        in_specs = [pl.BlockSpec(memory_space=pl.ANY)] * 2
    elif MODE == "comp":
        kern, scratch = kernel_comp, []
        in_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
    else:
        kern, scratch = kernel_both, [
            pltpu.VMEM((Rr, 128), jnp.uint32),
            pltpu.VMEM((Rr, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ]
        in_specs = [pl.BlockSpec(memory_space=pl.ANY)] * 2

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(N,),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        scratch_shapes=scratch,
    )
    fn = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((N,), jnp.int32)],
    )
    t0 = time.time()
    out = jax.jit(fn)(row, ofs, mh, mp)
    jax.block_until_ready(out)
    log(f"compile+run {time.time()-t0:.1f}s out={np.asarray(out[0][:4])}")
    t0 = time.time()
    for _ in range(5):
        out = jax.jit(fn)(row, ofs, mh, mp)
        jax.block_until_ready(out)
    log(f"steady {(time.time()-t0)/5*1e3:.1f} ms")


if __name__ == "__main__":
    main()

"""Attribute the L2 kernel's per-chunk cost on real hardware.

Self-contained cut-down variants of the production kernel (grid+scalars
only -> +DMA -> +MXU transposes -> +membership -> full stabbing) run on
one synthetic workload at bench-like shapes, so the next optimization
round knows which stage of the kernel actually costs.  Variants copy
the production kernel's structure on purpose -- they are lab probes and
must not constrain `ops/l2_pallas.py`.
"""
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pyfastani_tpu.utils.jaxconfig import configure

configure()

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 4096        # live chunks (bench-like: ~8 per fragment at F=512)
RR = 16         # rows per range (R = 2048)
SC = 384        # sketch columns
M = 5_000_000   # minimizer store
CMW = 2985
_BIG = np.int32(2**30)


def _mk_kernel(level: int):
    def kernel(row_ref, ofs_ref, rlen_ref, frag_ref, c0_ref, clen_ref,
               seq_ref, slabs_ref, q_ref, best_ref, first_ref, last_ref,
               s3, q_s, acc_s, sem):
        i = pl.program_id(0)
        row = row_ref[i]
        frag = frag_ref[i]
        fbase = (frag // 8) * 8
        ofs = ofs_ref[i]
        rlen = rlen_ref[i]
        c0 = c0_ref[i]
        clen = clen_ref[i]
        best_ref[i] = jnp.int32(-1)
        first_ref[i] = c0
        last_ref[i] = c0
        if level == 0:
            return

        @pl.when((rlen > 0) & (clen > 0))
        def _live():
            cp_m = pltpu.make_async_copy(
                slabs_ref.at[:, pl.ds(row, RR)], s3, sem.at[0]
            )
            cp_q = pltpu.make_async_copy(
                q_ref.at[pl.ds(fbase, 8)], q_s, sem.at[1]
            )
            cp_m.start()
            cp_q.start()
            cp_m.wait()
            cp_q.wait()
            if level == 1:
                best_ref[i] = s3[0, 0, 0]
                return
            rp_s = s3.at[1]
            flat = jax.lax.broadcasted_iota(jnp.int32, (RR, 128), 0) * 128 + (
                jax.lax.broadcasted_iota(jnp.int32, (RR, 128), 1)
            )
            valid = (flat >= ofs) & (flat < ofs + rlen)
            rp = jnp.where(valid, rp_s[...], _BIG)
            ident = (
                jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
                == jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
            ).astype(jnp.float32)
            dn = (((1,), (1,)), ((), ()))

            def _t(x):
                return jax.lax.dot_general(
                    ident, x, dn, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )

            rh_i = s3[0]
            rpT = _t(rp.astype(jnp.float32))
            rhT_hi = _t(((rh_i >> 16) & 0xFFFF).astype(jnp.float32))
            rhT_lo = _t((rh_i & 0xFFFF).astype(jnp.float32))
            rvT = _t(s3[2].astype(jnp.float32))
            validT = _t(valid.astype(jnp.float32))
            if level == 2:
                best_ref[i] = (rpT[0, 0] + rhT_hi[0, 0] + rhT_lo[0, 0]
                               + rvT[0, 0] + validT[0, 0]).astype(jnp.int32)
                return

            row_ids = jax.lax.broadcasted_iota(jnp.int32, (8, SC), 0)
            q_i32 = jnp.where(
                row_ids == (frag - fbase), q_s[...].astype(jnp.int32), 0
            )
            q_row = jnp.sum(q_i32, axis=0, keepdims=True)
            q_hi = ((q_row >> 16) & 0xFFFF).astype(jnp.float32)
            q_lo = (q_row & 0xFFFF).astype(jnp.float32)
            anchor_ok = valid & (rp >= c0) & (rp < c0 + clen)
            rp_f = rp.astype(jnp.float32)
            acc_s[...] = jnp.zeros((RR, 128), jnp.int32)

            for jb in range(RR):

                @pl.when(jb * 128 < ofs + rlen)
                def _blk(jb=jb):
                    pj = rpT[:, jb : jb + 1]
                    st = jnp.maximum(pj - (CMW - 1), rvT[:, jb : jb + 1] + 1)
                    eq = (rhT_hi[:, jb : jb + 1] == q_hi) & (
                        rhT_lo[:, jb : jb + 1] == q_lo
                    )
                    in_q = jnp.any(eq, axis=1, keepdims=True)
                    cd = in_q & (validT[:, jb : jb + 1] > 0.5)
                    if level >= 4:
                        for ab in range(RR):

                            @pl.when(ab * 128 < ofs + rlen)
                            def _ablk(jb=jb, ab=ab, st=st, pj=pj, cd=cd):
                                pa = rp_f[ab : ab + 1, :]
                                stab = cd & (st <= pa) & (pa <= pj)
                                acc_s[ab : ab + 1, :] += jnp.sum(
                                    stab.astype(jnp.int32), axis=0,
                                    keepdims=True,
                                )
                    else:
                        acc_s[jb : jb + 1, :] = jnp.sum(
                            cd.astype(jnp.int32)
                        ) + jnp.zeros((1, 128), jnp.int32)

            shared = jnp.where(anchor_ok, acc_s[...], -1)
            best = jnp.max(shared)
            best_ref[i] = best
            first_ref[i] = jnp.where(best < 0, c0, jnp.min(
                jnp.where(shared == best, rp, _BIG)))
            last_ref[i] = jnp.where(best < 0, c0, jnp.max(
                jnp.where(shared == best, rp, -_BIG)))

    return kernel


@functools.partial(jax.jit, static_argnames=("level",))
def _run(row, ofs, rlen, frag, c0, clen, seq, slabs, q_pad, level):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(N,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 3,
        scratch_shapes=[
            pltpu.VMEM((3, RR, 128), jnp.int32),
            pltpu.VMEM((8, SC), jnp.uint32),
            pltpu.VMEM((RR, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        _mk_kernel(level),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((N,), jnp.int32)] * 3,
    )(row, ofs, rlen, frag, c0, clen, seq, slabs, q_pad)


def main():
    rng = np.random.default_rng(0)
    Mr = M // 128
    slabs = rng.integers(0, 2**24, (3, Mr + RR + 8, 128), dtype=np.int64).astype(np.int32)
    q_pad = rng.integers(0, 2**32, (520, SC), dtype=np.int64).astype(np.uint32)
    row = rng.integers(0, Mr - RR, N, dtype=np.int64).astype(np.int32)
    ofs = rng.integers(0, 128, N, dtype=np.int64).astype(np.int32)
    rlen = rng.integers(300, 600, N, dtype=np.int64).astype(np.int32)
    frag = rng.integers(0, 512, N, dtype=np.int64).astype(np.int32)
    c0 = rng.integers(0, 2**20, N, dtype=np.int64).astype(np.int32)
    clen = np.full(N, 3072, np.int32)
    seq = np.zeros(N, np.int32)
    args = [jnp.asarray(a) for a in
            (row, ofs, rlen, frag, c0, clen, seq, slabs, q_pad)]

    names = ["grid+scalars", "+DMA", "+transposes", "+membership", "full"]
    prev = 0.0
    for level in range(5):
        out = _run(*args, level=level)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(3):
            out = _run(*args, level=level)
            jax.block_until_ready(out)
        dt = (time.time() - t0) / 3
        print(f"level {level} {names[level]:13s} {dt*1e3:8.1f} ms "
              f"(+{(dt-prev)*1e3:6.1f})  {dt/N*1e6:6.2f} us/chunk", flush=True)
        prev = dt


if __name__ == "__main__":
    main()

"""Minimal repro: Pallas manual-DMA hangs when the operand is a jit
parameter (VERDICT r04 #9 / the `PYFASTANI_TPU_HOIST` workaround).

The production symptom: feeding the L2 kernel's index slabs as a hoisted
jit parameter (or any slice of one) makes the Mosaic `make_async_copy`
from a `pl.ANY` operand hang AT EXECUTION -- compile succeeds, the
process sleeps forever in `np.asarray`.  Rebuilding the slabs in-graph
(a copy pass) works.  This script reduces it to a ~30-line kernel and
tries the candidate workarounds in order, each under a watchdog:

  1. operand built in-graph from the parameter (`x + 0`)  [known good]
  2. operand = the raw jit parameter                      [known hang]
  3. raw parameter with donate_argnums
  4. raw parameter through lax.optimization_barrier

Run: timeout 900 python benches/repro_mosaic_hoist.py
Each case prints PASS / HANG(>Ns) / ERROR.

FINDING (2026-08-21, TPU v5e / axon): all four cases PASS -- the
minimal kernel does NOT reproduce the hang.  The production trigger
needs the full context (a (3, Mr, 128) ANY-space operand whose plane is
indexed inside the kernel, dispatched through a jit(shard_map(...))
program at multi-hundred-MB operand sizes).  The in-graph slab rebuild
stays as the default workaround (it costs ~3-5 ms per dispatch);
`PYFASTANI_TPU_HOIST=1` re-enables the hoisted path for platforms
without the bug.
"""
import os
import signal
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WATCHDOG_S = 150  # first call per case includes an XLA compile (~30-60 s
# on this platform); a genuine DMA hang sleeps far past this


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R = 8  # rows DMA'd per grid step

    def kernel(idx_ref, big_ref, out_ref, scratch, sem):
        i = pl.program_id(0)
        row = idx_ref[i]
        cp = pltpu.make_async_copy(big_ref.at[pl.ds(row, R)], scratch, sem)
        cp.start()
        cp.wait()
        out_ref[i] = jnp.sum(scratch[...])

    def call(big, idx):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(idx.shape[0],),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=[
                pltpu.VMEM((R, 128), jnp.int32),
                pltpu.SemaphoreType.DMA,
            ],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((idx.shape[0],), jnp.int32),
        )(idx, big)

    big_np = np.arange(1024 * 128, dtype=np.int32).reshape(1024, 128)
    idx_np = np.arange(0, 64, dtype=np.int32) * 8
    expected = np.asarray(
        [big_np[r : r + R].sum() for r in idx_np], dtype=np.int64
    )

    cases = {
        "in-graph copy (x+0)": jax.jit(lambda b, i: call(b + 0, i)),
        "raw jit parameter": jax.jit(lambda b, i: call(b, i)),
        "donated parameter": jax.jit(
            lambda b, i: call(b, i), donate_argnums=(0,)
        ),
        "optimization_barrier": jax.jit(
            lambda b, i: call(jax.lax.optimization_barrier(b), i)
        ),
    }

    for name, fn in cases.items():
        big = jax.device_put(jnp.asarray(big_np))
        idx = jax.device_put(jnp.asarray(idx_np))

        def alarm(signum, frame):
            raise TimeoutError

        signal.signal(signal.SIGALRM, alarm)
        signal.alarm(WATCHDOG_S)
        try:
            out = np.asarray(fn(big, idx))
            signal.alarm(0)
            ok = np.array_equal(out.astype(np.int64), expected)
            print(f"{name:26s} {'PASS' if ok else 'WRONG RESULT'}", flush=True)
        except TimeoutError:
            print(f"{name:26s} HANG (> {WATCHDOG_S}s)", flush=True)
            # the wedged dispatch poisons the client; report and stop
            print("client wedged by the hang; remaining cases skipped")
            break
        except Exception as e:  # noqa: BLE001
            signal.alarm(0)
            print(f"{name:26s} ERROR: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()

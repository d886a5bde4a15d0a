"""Experiment 4: unrolled Pallas serial scatter/gather variants.

P6 measured 41ns/row (serial loop, 1 row per iteration). Try 4x/8x
unrolling and 2-row vector ops to pipeline the scalar-dependent slices.
"""

import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NL = 262144
TL = 1 << 16
W = 16

rng = np.random.RandomState(0)
idxL = jnp.asarray(rng.randint(0, TL, size=(NL,)).astype(np.int32))
gL = jnp.asarray(rng.randn(NL, W).astype(np.float32))
tabW = jnp.asarray(rng.randn(TL, W).astype(np.float32))


def timed(fn, *a, n=3, warmup=1, label=""):
    try:
        for _ in range(warmup):
            out = fn(*a)
        float(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*a)
        float(out)
        dt = (time.perf_counter() - t0) / n
        print(f"{label}: {dt*1e3:.2f} ms ({NL/dt/1e6:.1f} Mrows/s)", flush=True)
        return dt
    except Exception as e:
        print(f"{label}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
        return None


def make_scatter(stile, unroll):
    def k(idx_ref, g_ref, acc_ref):
        gi = pl.program_id(0)

        @pl.when(gi == 0)
        def _init():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        def body(i, carry):
            base = i * unroll
            for u in range(unroll):
                r = idx_ref[base + u]
                acc_ref[pl.ds(r, 1), :] = (
                    acc_ref[pl.ds(r, 1), :] + g_ref[pl.ds(base + u, 1), :]
                )
            return carry

        jax.lax.fori_loop(0, stile // unroll, body, 0)

    @jax.jit
    def f(i, g):
        out = pl.pallas_call(
            k,
            grid=(NL // stile,),
            in_specs=[
                pl.BlockSpec((stile,), lambda gi: (gi,), memory_space=pltpu.SMEM),
                pl.BlockSpec((stile, W), lambda gi: (gi, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TL, W), lambda gi: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((TL, W), jnp.float32),
        )(i, g)
        return jnp.sum(out)

    return f


for unroll in (4, 8):
    timed(make_scatter(1024, unroll), idxL, gL, label=f"scatter unroll={unroll}")

# NOTE on correctness: unrolled read-modify-write is only safe if the u
# lanes within one unroll group have distinct r — they don't in general!
# This probe measures THROUGHPUT ONLY; the real kernel must either keep
# serial RMW (unroll=1) or combine duplicates. Compare numerics:
f1 = make_scatter(1024, 1)
timed(f1, idxL, gL, label="scatter unroll=1 (control)")


# gather unrolled
def make_gather(itile, unroll):
    def k(idx_ref, tab_ref, o_ref):
        def body(i, carry):
            base = i * unroll
            for u in range(unroll):
                r = idx_ref[base + u]
                o_ref[pl.ds(base + u, 1), :] = tab_ref[pl.ds(r, 1), :]
            return carry

        jax.lax.fori_loop(0, itile // unroll, body, 0)

    @jax.jit
    def f(tab, i):
        out = pl.pallas_call(
            k,
            grid=(NL // itile,),
            in_specs=[
                pl.BlockSpec((itile,), lambda gi: (gi,), memory_space=pltpu.SMEM),
                pl.BlockSpec((TL, W), lambda gi: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((itile, W), lambda gi: (gi, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((NL, W), jnp.float32),
        )(i, tab)
        return jnp.sum(out)

    return f


for unroll in (8,):
    timed(make_gather(1024, unroll), tabW, idxL, label=f"gather unroll={unroll}")

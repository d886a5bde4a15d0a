"""Experiment 3: backward (scatter) cost + Pallas serial-slice retry.

Brick layout premise (from exp2: XLA gather is row-count bound at
~207 Mrows/s): one row per point per level holding all 8 corners' F=2
features -> fwd rows drop 8x (33.5M -> 4.2M). Questions:

S1: scatter-add 4.2M rows x 16 lanes into [2^19, 16]   (brick bwd, one level-set)
S2: scatter-add 4.2M rows x 16 with indices SORTED     (locality effect)
S3: argsort(4.2M) alone                                (sort-based alternative)
S4: scatter-add 2.1M rows x 16                         (scaling check)
P5: pallas serial row-slice gather, ITILE=1024 SMEM    (retry with small SMEM tile)
P6: pallas serial row accumulate (scatter) same shape
"""

import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NP_ = 262144  # points per step
L = 16
NI = NP_ * L  # 4.2M brick rows per step
T = 1 << 19
W = 16  # 8 corners x F=2

rng = np.random.RandomState(0)
idx_np = rng.randint(0, T, size=(NI,)).astype(np.int32)
idx = jnp.asarray(idx_np)
g_np = rng.randn(NI, W).astype(np.float32)
g = jnp.asarray(g_np)


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
        print(f"{label}: {dt*1e3:.2f} ms", flush=True)
        return dt
    except Exception as e:
        print(f"{label}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
        return None


@jax.jit
def s1(i, g):
    return jnp.sum(jnp.zeros((T, W), jnp.float32).at[i].add(g))


timed(s1, idx, g, label="S1 scatter-add 4.2M x16")

idx_sorted = jnp.asarray(np.sort(idx_np))
timed(s1, idx_sorted, g, label="S2 scatter-add 4.2M x16 (pre-sorted idx)")


@jax.jit
def s3(i):
    return jnp.sum(jnp.argsort(i))


timed(s3, idx, label="S3 argsort 4.2M")


@jax.jit
def s4(i, g):
    return jnp.sum(jnp.zeros((T, W), jnp.float32).at[i].add(g))


timed(s4, idx[: NI // 2], g[: NI // 2], label="S4 scatter-add 2.1M x16")

# --- P5: pallas serial gather, small SMEM tile ---
# Realistic brick config: per-level table [2^16, 16] (= 1M params/level,
# tcnn capacity parity), processed one level per outer grid dim; here we
# probe a single level (262144 rows) and scale by 16.
TL = 1 << 16
NL = NP_  # rows gathered per level
ITILE = 1024
tab_np = rng.randn(TL, W).astype(np.float32)
tabW = jnp.asarray(tab_np)
idxL = jnp.asarray((idx_np[:NL] % TL).astype(np.int32))


def k_serial(idx_ref, tab_ref, o_ref):
    def body(i, carry):
        r = idx_ref[i]
        o_ref[pl.ds(i, 1), :] = tab_ref[pl.ds(r, 1), :]
        return carry

    jax.lax.fori_loop(0, ITILE, body, 0)


@jax.jit
def p5(tab, i):
    out = pl.pallas_call(
        k_serial,
        grid=(NL // ITILE,),
        in_specs=[
            pl.BlockSpec((ITILE,), lambda gi: (gi,), memory_space=pltpu.SMEM),
            pl.BlockSpec((TL, W), lambda gi: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ITILE, W), lambda gi: (gi, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NL, W), jnp.float32),
    )(i, tab)
    return jnp.sum(out)


timed(p5, tabW, idxL, label="P5 pallas serial gather 262k rows, VMEM [65536,16] table (x16=step)")

# --- P6: pallas serial scatter accumulate: out IS the table ---
STILE = 1024
gL = g[:NL]


def k_scatter(idx_ref, g_ref, acc_ref):
    gi = pl.program_id(0)

    @pl.when(gi == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    def body(i, carry):
        r = idx_ref[i]
        acc_ref[pl.ds(r, 1), :] = acc_ref[pl.ds(r, 1), :] + g_ref[pl.ds(i, 1), :]
        return carry

    jax.lax.fori_loop(0, STILE, body, 0)


@jax.jit
def p6(i, g):
    out = pl.pallas_call(
        k_scatter,
        grid=(NL // STILE,),
        in_specs=[
            pl.BlockSpec((STILE,), lambda gi: (gi,), memory_space=pltpu.SMEM),
            pl.BlockSpec((STILE, W), lambda gi: (gi, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TL, W), lambda gi: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((TL, W), jnp.float32),
    )(i, g)
    return jnp.sum(out)


timed(p6, idxL, gL, label="P6 pallas serial scatter-acc 262k rows -> [65536,16] (x16=step)")

"""Experiment: which hash-table gather formulation is fastest on TPU.

N points x L levels x 8 corners gathered from a [L, T, F] table.
HONEST timing: every jitted candidate reduces to a scalar and the loop is
closed by fetching that scalar (device_get) — on relayed PJRT transports
``block_until_ready`` can acknowledge before remote execution drains.
"""

import time
import numpy as np
import jax
import jax.numpy as jnp

N = 262144  # 4096 rays x 64 samples
L, T, F = 16, 1 << 19, 2
C = 8

rng = np.random.RandomState(0)
idx_np = rng.randint(0, T, size=(L, N, C)).astype(np.int32)
tab_np = rng.randn(L, T, F).astype(np.float32)
idx = jnp.asarray(idx_np)
tab = jnp.asarray(tab_np)


def timed(fn, *a, n=5, warmup=2, label=""):
    try:
        for _ in range(warmup):
            out = fn(*a)
        float(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*a)
        float(out)  # forces completion of the whole chain
        dt = (time.perf_counter() - t0) / n
        print(f"{label}: {dt*1e3:.2f} ms", flush=True)
        return dt
    except Exception as e:
        print(f"{label}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)
        return None


# --- A: current formulation (take_along_axis with L batch) ---
@jax.jit
def ga_batch(tab, idx):
    out = jnp.take_along_axis(
        tab[:, :, None, :], idx.reshape(L, N * C)[:, :, None, None], axis=1
    )
    return jnp.sum(out)

timed(ga_batch, tab, idx, label="A take_along_axis [L,T,F] batched")

# --- B: flat row gather [L*T, F] ---
flat_tab = tab.reshape(L * T, F)
flat_idx = (idx + (jnp.arange(L, dtype=jnp.int32) * T)[:, None, None]).reshape(-1)

@jax.jit
def gb_rows(ft, fi):
    return jnp.sum(jnp.take(ft, fi, axis=0))

timed(gb_rows, flat_tab, flat_idx, label="B row gather [L*T, F]")

# --- C: fully flat scalar gather, packed 2xbf16 in int32 ---
tab_bf = tab.astype(jnp.bfloat16)
packed = jax.lax.bitcast_convert_type(
    tab_bf.reshape(L * T, F), jnp.int32
).reshape(L * T)

@jax.jit
def gc_packed(pk, fi):
    w = jnp.take(pk, fi, axis=0)
    v = jax.lax.bitcast_convert_type(w[:, None], jnp.bfloat16)
    return jnp.sum(v.astype(jnp.float32))

timed(gc_packed, packed, flat_idx, label="C packed-int32 scalar gather")

# --- D: per-level python loop of row gathers ---
@jax.jit
def gd_loop(tab, idx):
    acc = 0.0
    for l in range(L):
        acc += jnp.sum(jnp.take(tab[l], idx[l].reshape(-1), axis=0))
    return acc

timed(gd_loop, tab, idx, label="D per-level loop row gather")

# --- E: one level only (scaling probe) ---
@jax.jit
def ge_one(t0, i0):
    return jnp.sum(jnp.take(t0, i0.reshape(-1), axis=0))

timed(ge_one, tab[0], idx[0], label="E single level row gather (2M rows)")

# --- F: scatter-add transpose of B (bwd probe) ---
g_np = rng.randn(L * N * C, F).astype(np.float32)
g = jnp.asarray(g_np)

@jax.jit
def gf_scatter(fi, g):
    return jnp.sum(jnp.zeros((L * T, F), jnp.float32).at[fi].add(g))

timed(gf_scatter, flat_idx, g, label="F scatter-add [33.5M rows]")

# --- G: segment_sum after sort (bwd alternative) ---
@jax.jit
def gg_sorted(fi, g):
    order = jnp.argsort(fi)
    fs = fi[order]
    gs = g[order]
    return jnp.sum(jax.ops.segment_sum(gs, fs, num_segments=L * T))

timed(gg_sorted, flat_idx, g, label="G sort+segment_sum bwd")

# --- H: f32 flat scalar gather (feature-expanded indices) ---
flat_tab1 = tab.reshape(-1)
fi2 = (flat_idx[:, None] * 2 + jnp.arange(2, dtype=jnp.int32)[None]).reshape(-1)

@jax.jit
def gh_scalar(ft, fi):
    return jnp.sum(jnp.take(ft, fi, axis=0))

timed(gh_scalar, flat_tab1, fi2, label="H flat scalar gather 67M elems")

# --- Pallas kernels ---
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 2048  # points per tile -> TILE*C = 16384 indices
IR = TILE * C // 128  # index rows of 128 lanes


def k_take(tab_ref, idx_ref, o_ref):
    t = tab_ref[:]                      # [T, F]
    ii = idx_ref[:].reshape(-1)         # [TILE*C]
    o_ref[:] = jnp.take(t, ii, axis=0)  # [TILE*C, F]


def run_pallas_take(tab_l, idx_l, dtype):
    """Single level: tab [T, F], idx [N*C] -> gathered [N*C, F]."""
    nidx = idx_l.shape[0]
    idx2 = idx_l.reshape(nidx // 128, 128)
    grid = (nidx // (TILE * C),)
    return pl.pallas_call(
        k_take,
        grid=grid,
        in_specs=[
            pl.BlockSpec((T, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((IR, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (TILE * C, F), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nidx, F), dtype),
    )(tab_l, idx2)


@jax.jit
def gp_take(tab, idx):
    acc = 0.0
    for l in range(L):
        acc += jnp.sum(run_pallas_take(tab[l], idx[l].reshape(-1), jnp.float32))
    return acc

timed(gp_take, tab, idx, label="P1 pallas jnp.take f32 VMEM table")


@jax.jit
def gp_take_bf(tab, idx):
    tb = tab.astype(jnp.bfloat16)
    acc = 0.0
    for l in range(L):
        acc += jnp.sum(
            run_pallas_take(tb[l], idx[l].reshape(-1), jnp.bfloat16).astype(
                jnp.float32
            )
        )
    return acc

timed(gp_take_bf, tab, idx, label="P2 pallas jnp.take bf16 VMEM table")


# P3: packed int32 table [T] -> gather along a 2D-reshaped table via take
def k_take_packed(tab_ref, idx_ref, o_ref):
    t = tab_ref[:].reshape(-1)          # [T] int32
    ii = idx_ref[:]                     # [IR, 128]
    o_ref[:] = jnp.take(t, ii, axis=0)  # [IR, 128] int32


def run_pallas_packed(pk_l, idx_l):
    nidx = idx_l.shape[0]
    idx2 = idx_l.reshape(nidx // 128, 128)
    grid = (nidx // (TILE * C),)
    return pl.pallas_call(
        k_take_packed,
        grid=grid,
        in_specs=[
            pl.BlockSpec((T // 128, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((IR, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((IR, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nidx // 128, 128), jnp.int32),
    )(pk_l, idx2)


@jax.jit
def gp_packed(packed, idx):
    pk = packed.reshape(L, T // 128, 128)
    acc = 0
    for l in range(L):
        acc += jnp.sum(run_pallas_packed(pk[l], idx[l].reshape(-1)))
    return acc.astype(jnp.float32)

timed(gp_packed, packed, idx, label="P3 pallas packed-int32 take")

"""Round-3 experiment: vertex-layout hash-grad strategies on real TPU.

The vertex (tcnn-exact) Instant-NGP layout needs, per train step
(262k points, 16 levels, 8 corners, F=2):
  fwd:  33.5M row gathers (width 2)
  bwd:  33.5M row scatter-adds (width 2) into [16, 2^19, 2]
plus a dL/dx term that re-gathers.

Questions measured here (v5e):
  A  one fused take() of 33.5M width-2 rows          (fwd cost floor)
  B  XLA scatter-add 33.5M x 2, one call             (current vertex bwd)
  C  XLA scatter-add per level (16 x 2.1M)           (loop split effect)
  D  sort_key_val of 2.1M int32 keys + 2-lane vals   (sort-based bwd, per level)
  E  XLA scatter-add 2.1M x 2 with PRE-SORTED idx    (does XLA exploit locality?)
  F  segment_sum(sorted, indices_are_sorted=True)    (same, through segment path)
  G  Pallas serial scatter, width-2 rows packed into [T/64, 128] lanes
  H  Pallas K-accumulator round-robin scatter (K=2,4,8) width 16 (brick shape)
  I  Pallas serial scatter width 16 (brick baseline re-measure)
  J  one-hot MXU scatter for dense coarse level (res<=32)
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NP_ = 262144
L = 16
T = 1 << 19
F = 2
N8 = NP_ * 8  # 2.1M rows per level

rng = np.random.RandomState(0)
idx1 = jnp.asarray(rng.randint(0, T, size=(N8,)).astype(np.int32))  # one level
idxL = jnp.asarray(rng.randint(0, L * T, size=(L * N8,)).astype(np.int32))
g1 = jnp.asarray(rng.randn(N8, F).astype(np.float32))
gL = jnp.asarray(rng.randn(L * N8, F).astype(np.float32))
tab = jnp.asarray(rng.randn(L * T, F).astype(np.float32))


def timed(fn, *a, n=3, warmup=1, label="", rows=None):
    try:
        for _ in range(warmup):
            out = fn(*a)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*a)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / n
        per = f"  {dt/rows*1e9:.2f} ns/row" if rows else ""
        print(f"{label}: {dt*1e3:.2f} ms{per}", flush=True)
        return dt
    except Exception as e:
        print(f"{label}: FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)
        return None


# --- A: fused forward gather, all levels at once ---
@jax.jit
def a_gather(tab, i):
    return jnp.sum(jnp.take(tab, i, axis=0))


timed(a_gather, tab, idxL, label="A  take 33.5M x2", rows=L * N8)


# --- B: one big scatter ---
@jax.jit
def b_scatter(i, g):
    return jnp.sum(jnp.zeros((L * T, F), jnp.float32).at[i].add(g))


timed(b_scatter, idxL, gL, label="B  XLA scatter 33.5M x2", rows=L * N8, n=1)


# --- C: per-level scatter ---
@jax.jit
def c_scatter(i, g):
    out = 0.0
    for l in range(L):
        s = l * N8
        out += jnp.sum(
            jnp.zeros((T, F), jnp.float32).at[i[s : s + N8] % T].add(g[s : s + N8])
        )
    return out


timed(c_scatter, idxL, gL, label="C  XLA scatter 16x(2.1M x2)", rows=L * N8, n=1)


# --- D: sort cost per level ---
@jax.jit
def d_sort(i, g):
    sk, sv0, sv1 = jax.lax.sort((i, g[:, 0], g[:, 1]), num_keys=1)
    return sk[-1] + sv0[-1] + sv1[-1]


timed(d_sort, idx1, g1, label="D  sort_key_val 2.1M (x16 = step)", rows=N8)

idx1s = jnp.sort(idx1)


# --- E: scatter with pre-sorted indices ---
@jax.jit
def e_scatter(i, g):
    return jnp.sum(jnp.zeros((T, F), jnp.float32).at[i].add(g))


timed(e_scatter, idx1s, g1, label="E  XLA scatter 2.1M x2 sorted idx (x16)", rows=N8)


# --- F: segment_sum sorted ---
@jax.jit
def f_seg(i, g):
    return jnp.sum(
        jax.ops.segment_sum(g, i, num_segments=T, indices_are_sorted=True)
    )


timed(f_seg, idx1s, g1, label="F  segment_sum sorted 2.1M x2 (x16)", rows=N8)


# --- G: Pallas serial scatter, width-2 packed into 128 lanes ---
TPACK = T // 64  # [8192, 128] f32 = 4.2MB


def g_kernel(idx_ref, g_ref, acc_ref):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    def body(i, carry):
        v = idx_ref[i]
        r = v // 64
        c = (v % 64) * 2
        gv = g_ref[pl.ds(i, 1), :]  # [1, 2]
        vec = jnp.where(lanes == c, gv[0, 0], 0.0) + jnp.where(
            lanes == c + 1, gv[0, 1], 0.0
        )
        acc_ref[pl.ds(r, 1), :] = acc_ref[pl.ds(r, 1), :] + vec
        return carry

    jax.lax.fori_loop(0, 1024, body, 0)


@jax.jit
def g_pallas(i, g):
    out = pl.pallas_call(
        g_kernel,
        grid=(N8 // 1024,),
        in_specs=[
            pl.BlockSpec((1024,), lambda gi: (gi,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1024, F), lambda gi: (gi, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TPACK, 128), lambda gi: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((TPACK, 128), jnp.float32),
    )(i, g)
    return jnp.sum(out)


timed(g_pallas, idx1, g1, label="G  pallas serial width-2-in-128 2.1M (x16)", rows=N8)

# --- H: K-accumulator round-robin, width 16 rows (brick geometry) ---
TB = 1 << 16
W = 16
idxB = jnp.asarray(rng.randint(0, TB, size=(N8,)).astype(np.int32))
gB = jnp.asarray(rng.randn(N8, W).astype(np.float32))


def make_h(K):
    def kern(idx_ref, g_ref, acc_ref):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _init():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        def body(i, carry):
            base = i * K
            for u in range(K):
                r = idx_ref[base + u]
                acc_ref[u, pl.ds(r, 1), :] = (
                    acc_ref[u, pl.ds(r, 1), :] + g_ref[pl.ds(base + u, 1), :]
                )
            return carry

        jax.lax.fori_loop(0, 1024 // K, body, 0)

    @jax.jit
    def f(i, g):
        out = pl.pallas_call(
            kern,
            grid=(N8 // 1024,),
            in_specs=[
                pl.BlockSpec((1024,), lambda gi: (gi,), memory_space=pltpu.SMEM),
                pl.BlockSpec((1024, W), lambda gi: (gi, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (K, TB, W), lambda gi: (0, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((K, TB, W), jnp.float32),
        )(i, g)
        return jnp.sum(out)

    return f


for K in (2, 4):
    timed(make_h(K), idxB, gB, label=f"H  pallas K={K} round-robin 2.1M x16w", rows=N8)


# --- I: serial width-16 baseline ---
def i_kernel(idx_ref, g_ref, acc_ref):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    def body(i, carry):
        r = idx_ref[i]
        acc_ref[pl.ds(r, 1), :] = acc_ref[pl.ds(r, 1), :] + g_ref[pl.ds(i, 1), :]
        return carry

    jax.lax.fori_loop(0, 1024, body, 0)


@jax.jit
def i_pallas(i, g):
    out = pl.pallas_call(
        i_kernel,
        grid=(N8 // 1024,),
        in_specs=[
            pl.BlockSpec((1024,), lambda gi: (gi,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1024, W), lambda gi: (gi, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, W), lambda gi: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((TB, W), jnp.float32),
    )(idxB, gB)
    return jnp.sum(out)


timed(i_pallas, idxB, gB, label="I  pallas serial 2.1M x16w (brick bwd baseline)", rows=N8)


# --- J: one-hot MXU scatter, dense coarse level res=32 (32768 rows) ---
D = 32768


@jax.jit
def j_onehot(i, g):
    acc = jnp.zeros((D, F), jnp.float32)
    ii = i % D
    TILE = 2048
    for s in range(0, N8, TILE * 8):  # sample 1/8th then x8 in reporting
        sl = ii[s : s + TILE]
        oh = (sl[:, None] == jax.lax.broadcasted_iota(jnp.int32, (TILE, D), 1)).astype(
            jnp.bfloat16
        )
        acc += jax.lax.dot_general(
            oh.T.astype(jnp.bfloat16),
            g[s : s + TILE].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    return jnp.sum(acc)


timed(j_onehot, idx1, g1, label="J  one-hot MXU scatter 262k rows into 32k (x8 for 2.1M)", rows=N8 // 8)

"""Round-3 experiment v2: fold-proof timings + correctness checks.

v1 (exp_round3_vertex.py) consumed results via jnp.sum(), which XLA can
algebraically fold (sum of scatter-add == sum of updates), making most
numbers bogus. Here every op returns its full output array and is
verified against numpy once.
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
idx1_np = rng.randint(0, T, size=(N8,)).astype(np.int32)
idx1 = jnp.asarray(idx1_np)
idxL = jnp.asarray(rng.randint(0, L * T, size=(L * N8,)).astype(np.int32))
g1_np = rng.randn(N8, F).astype(np.float32)
g1 = jnp.asarray(g1_np)
gL = jnp.asarray(rng.randn(L * N8, F).astype(np.float32))
tab = jnp.asarray(rng.randn(L * T, F).astype(np.float32))

# numpy reference for one level
ref1 = np.zeros((T, F), np.float32)
np.add.at(ref1, idx1_np, g1_np)


def timed(fn, *a, n=3, warmup=1, label="", rows=None, check=None, tol=1e-3):
    try:
        for _ in range(warmup):
            out = fn(*a)
        jax.block_until_ready(out)
        if check is not None:
            got = np.asarray(out).reshape(check.shape)
            err = np.abs(got - check).max()
            ok = "OK" if err < tol else f"WRONG maxerr={err:.3e}"
        else:
            ok = ""
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*a)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / n
        per = f"  {dt/rows*1e9:.2f} ns/row" if rows else ""
        print(f"{label}: {dt*1e3:.2f} ms{per}  {ok}", flush=True)
        return dt
    except Exception as e:
        print(f"{label}: FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)
        return None


# --- A: forward gather returning full output ---
timed(
    jax.jit(lambda t, i: jnp.take(t, i, axis=0)),
    tab,
    idxL,
    label="A  take 33.5M x2 (full out)",
    rows=L * N8,
)

# --- B: one big XLA scatter (full out) ---
timed(
    jax.jit(lambda i, g: jnp.zeros((L * T, F), jnp.float32).at[i].add(g)),
    idxL,
    gL,
    label="B  XLA scatter 33.5M x2 (full out)",
    rows=L * N8,
)

# --- B1: one-level scatter check ---
timed(
    jax.jit(lambda i, g: jnp.zeros((T, F), jnp.float32).at[i].add(g)),
    idx1,
    g1,
    label="B1 XLA scatter 2.1M x2 one level",
    rows=N8,
    check=ref1,
)

# --- D: sort ---
timed(
    jax.jit(lambda i, g: jax.lax.sort((i, g[:, 0], g[:, 1]), num_keys=1)),
    idx1,
    g1,
    label="D  sort 2.1M k+2v",
    rows=N8,
)

idx1s_np = np.sort(idx1_np)
order = np.argsort(idx1_np, kind="stable")
g1s = jnp.asarray(g1_np[order])
idx1s = jnp.asarray(idx1s_np)

# --- E: scatter with sorted indices ---
timed(
    jax.jit(lambda i, g: jnp.zeros((T, F), jnp.float32).at[i].add(g)),
    idx1s,
    g1s,
    label="E  XLA scatter sorted 2.1M x2",
    rows=N8,
    check=ref1,
)

# --- F: segment_sum sorted ---
timed(
    jax.jit(
        lambda i, g: jax.ops.segment_sum(
            g, i, num_segments=T, indices_are_sorted=True
        )
    ),
    idx1s,
    g1s,
    label="F  segment_sum sorted 2.1M x2",
    rows=N8,
    check=ref1,
)

# --- F2: full sort-based bwd: sort + segment_sum, one level ---
@jax.jit
def f2(i, g):
    sk, s0, s1 = jax.lax.sort((i, g[:, 0], g[:, 1]), num_keys=1)
    return jax.ops.segment_sum(
        jnp.stack([s0, s1], -1), sk, num_segments=T, indices_are_sorted=True
    )


timed(f2, idx1, g1, label="F2 sort+segsum 2.1M x2 (full bwd, 1 level)", rows=N8, check=ref1)

# --- F3: all 16 levels in one sort+segsum ---
@jax.jit
def f3(i, g):
    sk, s0, s1 = jax.lax.sort((i, g[:, 0], g[:, 1]), num_keys=1)
    return jax.ops.segment_sum(
        jnp.stack([s0, s1], -1), sk, num_segments=L * T, indices_are_sorted=True
    )


timed(f3, idxL, gL, label="F3 sort+segsum 33.5M x2 (all levels fused)", rows=L * N8)

# --- H: K-accumulator round-robin with verification ---
TB = 1 << 16
W = 16
NB = N8
idxB_np = rng.randint(0, TB, size=(NB,)).astype(np.int32)
gB_np = rng.randn(NB, W).astype(np.float32)
idxB = jnp.asarray(idxB_np)
gB = jnp.asarray(gB_np)
refB = np.zeros((TB, W), np.float32)
np.add.at(refB, idxB_np, gB_np)


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
            grid=(NB // 1024,),
            in_specs=[
                pl.BlockSpec((1024,), lambda gi: (gi,), memory_space=pltpu.SMEM),
                pl.BlockSpec((1024, W), lambda gi: (gi, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (K, TB, W), lambda gi: (0, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((K, TB, W), jnp.float32),
        )(i, g)
        return out.sum(0)

    return f


timed(make_h(2), idxB, gB, label="H  pallas K=2 2.1M x16w", rows=NB, check=refB)

# --- I: serial width-16 with verification ---
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
    return pl.pallas_call(
        i_kernel,
        grid=(NB // 1024,),
        in_specs=[
            pl.BlockSpec((1024,), lambda gi: (gi,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1024, W), lambda gi: (gi, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, W), lambda gi: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((TB, W), jnp.float32),
    )(i, g)


timed(i_pallas, idxB, gB, label="I  pallas serial 2.1M x16w", rows=NB, check=refB)

# --- X: XLA scatter at brick shape for comparison ---
timed(
    jax.jit(lambda i, g: jnp.zeros((TB, W), jnp.float32).at[i].add(g)),
    idxB,
    gB,
    label="X  XLA scatter 2.1M x16w (brick bwd via XLA)",
    rows=NB,
    check=refB,
)

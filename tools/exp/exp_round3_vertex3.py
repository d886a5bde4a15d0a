"""Round-3 experiment v3: chained-dependency timings (axon-tunnel-proof).

v2 showed impossible numbers for some ops (0.1-0.7 ms for 33.5M-row
gathers) — on the relayed PJRT transport block_until_ready can ack
before execution drains (see bench.py notes). Here each timing iteration
consumes the previous output and a scalar is fetched at the end, forcing
the full chain.
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
N8 = NP_ * 8

rng = np.random.RandomState(0)
idx1_np = rng.randint(0, T, size=(N8,)).astype(np.int32)
idx1 = jnp.asarray(idx1_np)
idxL = jnp.asarray(rng.randint(0, L * T, size=(L * N8,)).astype(np.int32))
g1_np = rng.randn(N8, F).astype(np.float32)
g1 = jnp.asarray(g1_np)
gL = jnp.asarray(rng.randn(L * N8, F).astype(np.float32))
tab = jnp.asarray(rng.randn(L * T, F).astype(np.float32))

ref1 = np.zeros((T, F), np.float32)
np.add.at(ref1, idx1_np, g1_np)


def timed_chain(make_fn, n=3, label="", rows=None, check=None, tol=1e-3):
    """make_fn(carry) -> (new_carry_scalar, out). carry threads dependency."""
    try:
        fn = jax.jit(make_fn)
        c = jnp.float32(0.0)
        c, out = fn(c)
        float(c)  # warmup + full drain
        if check is not None:
            got = np.asarray(out).reshape(check.shape)
            err = np.abs(got - check).max()
            ok = "OK" if err < tol else f"WRONG maxerr={err:.3e}"
        else:
            ok = ""
        t0 = time.perf_counter()
        for _ in range(n):
            c, out = fn(c)
        float(c)  # forces the whole chain
        dt = (time.perf_counter() - t0) / n
        per = f"  {dt/rows*1e9:.2f} ns/row" if rows else ""
        print(f"{label}: {dt*1e3:.2f} ms{per}  {ok}", flush=True)
        return dt
    except Exception as e:
        print(f"{label}: FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)
        return None


# --- A: forward gather 33.5M x2 ---
def a_fn(c):
    out = jnp.take(tab, idxL, axis=0) + c
    return out[123457, 0] + out[-1, 1], out


timed_chain(a_fn, label="A  take 33.5M x2 chained", rows=L * N8)


# --- A2: forward gather 2.1M x2 (one level) ---
def a2_fn(c):
    out = jnp.take(tab[:T], idx1, axis=0) + c
    return out[123457, 0] + out[-1, 1], out


timed_chain(a2_fn, label="A2 take 2.1M x2 chained", rows=N8)


# --- A3: forward gather 4.2M x16 (brick fwd shape) ---
TB = 1 << 16
W = 16
NBR = NP_ * 16
idxB2 = jnp.asarray(rng.randint(0, TB, size=(NBR,)).astype(np.int32))
tabB = jnp.asarray(rng.randn(TB, W).astype(np.float32))


def a3_fn(c):
    out = jnp.take(tabB, idxB2, axis=0) + c
    return out[123457, 0] + out[-1, 1], out


timed_chain(a3_fn, label="A3 take 4.2M x16 chained (brick fwd)", rows=NBR)


# --- B: one big scatter chained ---
def b_fn(c):
    out = jnp.full((L * T, F), c).at[idxL].add(gL)
    return out[123457, 0] + out[-1, 1], out


timed_chain(b_fn, n=1, label="B  XLA scatter 33.5M x2 chained", rows=L * N8)


# --- G: pallas width-2-in-128 serial, chained + checked ---
TPACK = T // 64


def g_kernel(idx_ref, g_ref, acc_ref):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    def body(i, carry):
        v = idx_ref[i]
        r = v // 64
        col = (v % 64) * 2
        gv = g_ref[pl.ds(i, 1), :]
        vec = jnp.where(lanes == col, gv[0, 0], 0.0) + jnp.where(
            lanes == col + 1, gv[0, 1], 0.0
        )
        acc_ref[pl.ds(r, 1), :] = acc_ref[pl.ds(r, 1), :] + vec
        return carry

    jax.lax.fori_loop(0, 1024, body, 0)


ref1_packed = ref1.reshape(TPACK, 128)


def g_fn(c):
    out = pl.pallas_call(
        g_kernel,
        grid=(N8 // 1024,),
        in_specs=[
            pl.BlockSpec((1024,), lambda gi: (gi,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1024, F), lambda gi: (gi, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TPACK, 128), lambda gi: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((TPACK, 128), jnp.float32),
    )(idx1, g1 + 0 * c)
    return out[1234, 17] + out[-1, -1] + c, out


timed_chain(g_fn, label="G  pallas serial w2-in-128 2.1M chained", rows=N8, check=ref1_packed)

# --- W: windowed one-hot MXU scatter on SORTED indices (the round-3 design) ---
# sorted idx -> tiles of 2048 rows; per tile: base=aligned min idx, window of
# 2048 table rows (32 packed rows of 64x2 lanes); build transposed update
# matrix via 2 compares, MXU-reduce over the tile, RMW the window.
TILE = 2048
WIN = 2048  # table rows per window
WINP = WIN * F // 128  # packed rows (32)

idx1s_np = np.sort(idx1_np)
order_np = np.argsort(idx1_np, kind="stable")
idx1s = jnp.asarray(idx1s_np)
g1s = jnp.asarray(g1_np[order_np])

# precompute per-tile aligned base (host-side here; in prod: jnp)
bases_np = (idx1s_np[:: TILE] // 64 * 64).astype(np.int32)
# overflow stats
spans = idx1s_np.reshape(-1, TILE).max(1) - bases_np
print(f"   window spans: max={spans.max()} p99={np.percentile(spans,99):.0f} (WIN={WIN})")
bases = jnp.asarray(bases_np)


def w_kernel(base_ref, idx_ref, g_ref, acc_ref):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    base = base_ref[0]
    # local offset of each row within the window [TILE]
    loc = idx_ref[:] - base  # [TILE] int32 in [0, WIN) if no overflow
    # update matrix U[w, i] = g[i, f] where w = loc[i]*F + f, else 0
    # build transposed: rows = window cols (WIN*F lanes... too many). Use
    # onehot [TILE, WIN] then matmul [WIN, TILE] @ [TILE, F].
    win_ids = jax.lax.broadcasted_iota(jnp.int32, (TILE, WIN), 1)
    oh = (win_ids == loc[:, None]).astype(jnp.bfloat16)  # [TILE, WIN]
    upd = jax.lax.dot_general(
        oh,
        g_ref[:].astype(jnp.bfloat16),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [WIN, F]
    upd_packed = upd.reshape(WINP, 128)
    r0 = base * F // 128
    acc_ref[pl.ds(r0, WINP), :] = acc_ref[pl.ds(r0, WINP), :] + upd_packed


def w_fn(c):
    out = pl.pallas_call(
        w_kernel,
        grid=(N8 // TILE,),
        in_specs=[
            pl.BlockSpec((1,), lambda gi: (gi,), memory_space=pltpu.SMEM),
            pl.BlockSpec((TILE,), lambda gi: (gi,), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, F), lambda gi: (gi, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TPACK, 128), lambda gi: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((TPACK, 128), jnp.float32),
    )(bases, idx1s, g1s + 0 * c)
    return out[1234, 17] + out[-1, -1] + c, out


timed_chain(
    w_fn,
    label="W  windowed one-hot MXU scatter 2.1M sorted chained",
    rows=N8,
    check=ref1_packed,
    tol=2e-2,  # bf16 one-hot matmul accumulation
)


# --- W2: same idea for GATHER (forward): out[i] = table[idx[i]] ---
def w2_kernel(base_ref, idx_ref, tab_ref, o_ref):
    base = base_ref[0]
    loc = idx_ref[:] - base
    r0 = base * F // 128
    window = tab_ref[pl.ds(r0, WINP), :].reshape(WIN, F)  # [WIN, F]
    win_ids = jax.lax.broadcasted_iota(jnp.int32, (TILE, WIN), 1)
    oh = (win_ids == loc[:, None]).astype(jnp.bfloat16)
    o_ref[:] = jax.lax.dot_general(
        oh,
        window.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


tab1_packed = jnp.asarray(
    np.ascontiguousarray(np.asarray(tab[:T]).reshape(TPACK, 128))
)
ref_gather = np.asarray(tab[:T])[idx1s_np]


def w2_fn(c):
    out = pl.pallas_call(
        w2_kernel,
        grid=(N8 // TILE,),
        in_specs=[
            pl.BlockSpec((1,), lambda gi: (gi,), memory_space=pltpu.SMEM),
            pl.BlockSpec((TILE,), lambda gi: (gi,), memory_space=pltpu.VMEM),
            pl.BlockSpec((TPACK, 128), lambda gi: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, F), lambda gi: (gi, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N8, F), jnp.float32),
    )(bases, idx1s, tab1_packed + 0 * c)
    return out[1234, 1] + out[-1, 0] + c, out


timed_chain(
    w2_fn,
    label="W2 windowed one-hot MXU gather 2.1M sorted chained",
    rows=N8,
    check=ref_gather,
    tol=2e-2,
)

# --- S: sort cost re-check chained ---
def s_fn(c):
    sk, s0, s1 = jax.lax.sort((idx1, g1[:, 0] + c, g1[:, 1]), num_keys=1)
    return sk[12345].astype(jnp.float32) + s0[-1], (sk, s0, s1)


timed_chain(s_fn, label="S  sort 2.1M k+2v chained", rows=N8)


# --- S2: sort 262k points by 18-bit morton key + payload iota ---
NPTS = NP_
pkeys = jnp.asarray(rng.randint(0, 1 << 18, size=(NPTS,)).astype(np.int32))


def s2_fn(c):
    sk, sp = jax.lax.sort((pkeys, jax.lax.iota(jnp.int32, NPTS)), num_keys=1)
    return sk[1234].astype(jnp.float32) + sp[-1].astype(jnp.float32) + c, sk


timed_chain(s2_fn, label="S2 sort 262k pts (morton+iota) chained", rows=NPTS)

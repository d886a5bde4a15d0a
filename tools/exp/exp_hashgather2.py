"""Experiment 2: row-width scaling of XLA gather + Pallas serial-slice gather.

Honest timing (scalar fetch closes the loop, as exp_hashgather.py).

Q1: XLA gather cost — per-row or per-byte?  Gather NI rows from tables of
    row width 2 / 8 / 32 / 128 f32.
Q2: The 128-wide-row trick end to end: pack 64 (F=2) entries per row,
    row-gather + lane extract. Compare vs plain [T,2] gather.
Q3: Pallas kernel, table resident in VMEM, serial fori_loop of dynamic
    row slices driven by SMEM indices. Throughput?
Q4: Pallas two-stage vectorized gather: window = 8x128 tile (1024
    entries); sublane-gather then lane-gather inside each window, looping
    over windows per index tile with masking.
"""

import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NI = 2 * 1024 * 1024  # indices per level (262144 pts x 8 corners)
T = 1 << 19

rng = np.random.RandomState(0)
idx_np = rng.randint(0, T, size=(NI,)).astype(np.int32)
idx = jnp.asarray(idx_np)


def timed(fn, *a, n=5, warmup=2, label=""):
    try:
        for _ in range(warmup):
            out = fn(*a)
        float(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*a)
        float(out)
        dt = (time.perf_counter() - t0) / n
        print(f"{label}: {dt*1e3:.2f} ms ({NI/dt/1e6:.0f} Mrows/s)", flush=True)
        return dt
    except Exception as e:
        print(f"{label}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
        return None


# --- Q1: row width scaling ---
for width in (2, 8, 32, 128):
    nrows = T * 2 // width  # keep table bytes constant (4MB f32)
    tabw = jnp.asarray(rng.randn(nrows, width).astype(np.float32))
    idw = jnp.asarray((idx_np % nrows).astype(np.int32))

    @jax.jit
    def g(t, i):
        return jnp.sum(jnp.take(t, i, axis=0))

    timed(g, tabw, idw, label=f"Q1 row gather width={width} rows={nrows}")

# --- Q2: packed row trick ---
tab2 = jnp.asarray(rng.randn(T, 2).astype(np.float32))
tab128 = tab2.reshape(T // 64, 128)
eye = jnp.eye(128, dtype=jnp.float32)


@jax.jit
def g_packed(t128, i):
    r = i >> 6
    l = (i & 63) * 2
    rows = jnp.take(t128, r, axis=0)              # [NI, 128]
    f0 = jnp.take_along_axis(rows, l[:, None], axis=1)
    f1 = jnp.take_along_axis(rows, l[:, None] + 1, axis=1)
    return jnp.sum(f0) + jnp.sum(f1)


timed(g_packed, tab128, idx, label="Q2 packed 128-wide row gather + lane extract")


@jax.jit
def g_plain(t, i):
    return jnp.sum(jnp.take(t, i, axis=0))


timed(g_plain, tab2, idx, label="Q2 plain [T,2] gather (control)")

# --- Q3: Pallas serial dynamic-slice gather, bf16 table in VMEM ---
tab_bf = tab2.astype(jnp.bfloat16).reshape(T // 64, 128)  # 1MB bf16
ITILE = 8192  # indices per grid step


def k_serial(idx_ref, tab_ref, o_ref):
    def body(i, _):
        r = idx_ref[i, 0]
        o_ref[pl.ds(i, 1), :] = tab_ref[pl.ds(r, 1), :]
        return _

    jax.lax.fori_loop(0, ITILE, body, None)


@jax.jit
def gp_serial(tab, i):
    r = (i >> 6).reshape(NI, 1)
    out = pl.pallas_call(
        k_serial,
        grid=(NI // ITILE,),
        in_specs=[
            pl.BlockSpec((ITILE, 1), lambda g: (g, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((T // 64, 128), lambda g: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ITILE, 128), lambda g: (g, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NI, 128), jnp.bfloat16),
    )(r, tab)
    return jnp.sum(out[:, 0].astype(jnp.float32))


timed(gp_serial, tab_bf, idx, label="Q3 pallas serial row-slice (VMEM table)")

# --- Q4: Pallas window sweep: 512 windows of [8,128], vectorized in-window ---
NW = T // 1024  # 512 windows
tab_w = tab2.astype(jnp.bfloat16).reshape(NW * 8, 128)  # window w = rows 8w..8w+7
IR = 64  # index tile rows of 128 -> 8192 idx per grid step


def k_window(idx_ref, tab_ref, o_ref):
    ii = idx_ref[:]                    # [IR, 128] int32 global entry idx
    w = ii >> 10                       # window id
    within = ii & 1023
    sub = within >> 7                  # sublane 0..7
    lane = within & 127

    acc = jnp.zeros((IR, 128), jnp.float32)

    def body(wi, acc):
        blk = tab_ref[pl.ds(wi * 8, 8), :]               # [8,128] bf16
        # lane-gather: for each (s,j) pick blk[sub, lane]: do it as
        # sublane-gather via take_along_axis on 8 rows after broadcasting?
        # Simpler: select over 8 sublanes (8 compares) then lane-gather.
        rowsel = jnp.zeros((IR, 128), jnp.float32)
        for s in range(8):
            row = blk[s, :].astype(jnp.float32)           # [128]
            picked = jnp.take_along_axis(
                jnp.broadcast_to(row, (IR, 128)), lane, axis=1
            )
            rowsel = jnp.where(sub == s, picked, rowsel)
        acc = jnp.where(w == wi, rowsel, acc)
        return acc

    acc = jax.lax.fori_loop(0, NW, body, acc)
    o_ref[:] = acc


@jax.jit
def gp_window(tab, i):
    # gather the packed f32-pair as... just fetch lane of 128-packed layout:
    # here we gather single bf16 elements from [NW*8,128] layout where
    # entry e lives at (row e>>7, lane e&127); remap to window coords.
    i2 = i.reshape(NI // 128, 128)
    out = pl.pallas_call(
        k_window,
        grid=(NI // (IR * 128),),
        in_specs=[
            pl.BlockSpec((IR, 128), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NW * 8, 128), lambda g: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((IR, 128), lambda g: (g, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NI // 128, 128), jnp.float32),
    )(i2, tab)
    return jnp.sum(out)


timed(gp_window, tab_w, idx, label="Q4 pallas 512-window sweep")

"""Round-3 scatter-kernel variants for the vertex hash backward.

The vertex layout's table gradient is 2M scatter-add rows per level
(4096 rays x 64 samples x 8 corners) into a [T=2^19, F=2] table. The
shipped kernel packs 8 table rows into one [T/8, 16] VMEM row and does
one serial RMW per input row (~12 ns). This experiment measures:

  a) shipped packed kernel: acc [T/8, 16] (lane-padded 8x in VMEM)
  b) K-way accumulators, 64-row lane packing: acc [K, T/64, 128]
     (4 MB per accumulator, no padding waste); input row i goes to
     accumulator i%K, so the K RMW chains are independent and can
     overlap their load->add->store latency.
  c) XLA scatter-add baseline.

Timing uses chained iterations (output feeds a dummy dependency into
the next call's values) to defeat dispatch overlap, like
exp_round3_vertex2.py.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T = 1 << 19
F = 2
N = 4096 * 64 * 8  # rows per level
TILE = 1024


def timeit(f, *args, iters=20, warmup=3):
    out = None
    for _ in range(warmup):
        out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


# --- variant a: shipped kernel -------------------------------------------
from xrnerf_tpu.ops.pallas.scatter_rows import scatter_add_rows  # noqa: E402


# --- variant b: K-way [T/64, 128] accumulators ---------------------------
def kway_kernel(K):
    def _kernel(idx_ref, vals_ref, *accs):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _init():
            for a in accs:
                a[:] = jnp.zeros_like(a)

        def body(i, carry):
            base = i * K
            for j in range(K):
                r = idx_ref[base + j]

                @pl.when(r >= 0)
                def _(j=j, r=r):
                    accs[j][pl.ds(r, 1), :] = (
                        accs[j][pl.ds(r, 1), :] + vals_ref[pl.ds(base + j, 1), :]
                    )

            return carry

        jax.lax.fori_loop(0, TILE // K, body, 0)

    return _kernel


def kway_scatter(idx, gl, K):
    """idx [N] table row ids, gl [N, F] grad rows -> [T, F]."""
    n = idx.shape[0]
    rid = idx >> 6
    sub = idx & 63
    lanei = jnp.arange(128, dtype=jnp.int32)
    vals128 = jnp.where(
        (lanei[None, :] // F) == sub[:, None], jnp.tile(gl, (1, 64)), 0.0
    )
    rows = T // 64
    out = pl.pallas_call(
        kway_kernel(K),
        grid=(n // TILE,),
        in_specs=[
            pl.BlockSpec((TILE,), lambda g: (g,), memory_space=pltpu.SMEM),
            pl.BlockSpec((TILE, 128), lambda g: (g, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((rows, 128), lambda g: (0, 0), memory_space=pltpu.VMEM)
            for _ in range(K)
        ],
        out_shape=[jax.ShapeDtypeStruct((rows, 128), jnp.float32) for _ in range(K)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(rid, vals128)
    acc = sum(out)
    return acc.reshape(T, F)


def main():
    rng = np.random.RandomState(0)
    idx = jnp.asarray(rng.randint(0, T, size=(N,)).astype(np.int32))
    gl = jnp.asarray(rng.randn(N, F).astype(np.float32))

    # correctness cross-check on a small case
    ns = 1 << 14
    idx_s, gl_s = idx[:ns], gl[:ns]
    ref = jnp.zeros((T, F)).at[idx_s].add(gl_s)
    for K in (4, 8):
        got = kway_scatter(idx_s, gl_s, K)
        err = float(jnp.max(jnp.abs(got - ref)))
        print(f"K={K} correctness max|err| = {err:.2e}")
        assert err < 1e-4

    # shipped kernel (packed [T/8, 16])
    lane = jnp.arange(8 * F, dtype=jnp.int32)
    sub = idx & 7

    @jax.jit
    def shipped(idx, gl):
        vals = jnp.where(
            (lane[None, :] // F) == sub[:, None], jnp.tile(gl, (1, 8)), 0.0
        )
        return scatter_add_rows(idx >> 3, vals, T // 8)

    dt = timeit(shipped, idx, gl)
    print(f"a) shipped packed kernel: {dt*1e3:8.2f} ms  {dt/N*1e9:6.2f} ns/row")

    for K in (2, 4, 8, 16):
        f = jax.jit(lambda i, g, K=K: kway_scatter(i, g, K))
        dt = timeit(f, idx, gl)
        print(f"b) K={K:2d} [T/64,128] accs:  {dt*1e3:8.2f} ms  {dt/N*1e9:6.2f} ns/row")

    @jax.jit
    def xla(idx, gl):
        return jnp.zeros((T, F)).at[idx].add(gl)

    dt = timeit(xla, idx, gl)
    print(f"c) XLA scatter-add:       {dt*1e3:8.2f} ms  {dt/N*1e9:6.2f} ns/row")


if __name__ == "__main__":
    main()

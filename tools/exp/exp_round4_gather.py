"""Round-4: occupancy-lookup (element gather) rates on TPU.

KiloNeRF inference is occupancy-lookup bound (docs/benchmark.md): the
394 ms reference bar needs the lookup count per ray in the single
digits AND a competitive per-lookup cost. This experiment pins down the
real per-row cost of every way to test a sample against a bool grid:

  flat-{bool,i8,i32,f32}   one flat element gather, various elem types
  take-fill                jnp.take(mode='fill')
  row64-dot                [4096,64] (x,y)->z-column rows: one 64-lane
                           row gather + one-hot-z dot (wide DMA per row)
  bitpack-u32              [4096,2] uint32 z-bitmask rows: 2-lane row
                           gather + shift/mask (16 B per row)
  scan-96                  the sphere-march shape: 96 sequential
                           65536-element gathers inside lax.scan
  pallas-serial            VMEM-resident grid, serial scalar loads
  pallas-vector            VMEM-resident grid, vectorized dyn gather
                           (may not lower on this Mosaic version)

Sizes: N=25.2M (dense-march chunk: 65536 rays x 384) and N=6.3M
(sphere-march chunk: 65536 x 96); grid 64^3. Chained-scalar timing.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

R = 64  # grid res
NBIG = 65536 * 384
NSMALL = 65536 * 96
ITERS = 6


def timeit(fn, *args, iters=ITERS, warmup=2):
    # operands as explicit jit args: closed-over arrays embed as HLO
    # constants and big ones trip the remote-compile HTTP body limit
    @jax.jit
    def jfn(x, *a):
        def body(c, _):
            return jnp.sum(fn(c, *a)) * 0.0 + c + 1.0, None

        return jax.lax.scan(body, x, None, length=iters)[0]

    for _ in range(warmup):
        out = jfn(jnp.float32(1.0), *args)
    float(out)
    t0 = time.perf_counter()
    float(jfn(jnp.float32(1.0), *args))
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.RandomState(0)
    occ_np = (rng.rand(R, R, R) < 0.15)
    flat_b = jnp.asarray(occ_np.reshape(-1))
    flat_i8 = flat_b.astype(jnp.int8)
    flat_i32 = flat_b.astype(jnp.int32)
    flat_f32 = flat_b.astype(jnp.float32)
    rows64 = flat_f32.reshape(R * R, R)  # (x,y) -> z-column
    bits_np = np.zeros((R * R, 2), np.uint32)
    zz = occ_np.reshape(R * R, R)
    for w in range(2):
        for b in range(32):
            bits_np[:, w] |= zz[:, w * 32 + b].astype(np.uint32) << b
    bits = jnp.asarray(bits_np)

    for N, tag in [(NSMALL, "6.3M"), (NBIG, "25.2M")]:
        idx = jnp.asarray(rng.randint(0, R**3, size=N).astype(np.int32))
        xy = idx // R
        z = idx % R

        def rate(name, sec):
            print(f"  [{tag}] {name:24s} {sec*1e3:8.2f} ms  {sec/N*1e9:6.2f} ns/row")

        rate("flat-bool", timeit(lambda c, i: flat_b[i].astype(jnp.float32) + c, idx))
        rate("flat-i8", timeit(lambda c, i: flat_i8[i].astype(jnp.float32) + c, idx))
        rate("flat-i32", timeit(lambda c, i: flat_i32[i].astype(jnp.float32) + c, idx))
        rate("flat-f32", timeit(lambda c, i: flat_f32[i] + c, idx))
        rate(
            "take-fill",
            timeit(lambda c, i: jnp.take(flat_f32, i, mode="fill", fill_value=0.0) + c, idx),
        )

        def row64dot(c, xy, z):
            r = rows64[xy]  # [N, 64]
            oh = (jnp.arange(R)[None, :] == z[:, None]).astype(jnp.float32)
            return jnp.sum(r * oh, -1) + c

        rate("row64-dot", timeit(row64dot, xy, z))

        def bitpack(c, xy, z):
            w = bits[xy, z // 32]  # [N] u32
            bit = (w >> (z % 32).astype(jnp.uint32)) & 1
            return bit.astype(jnp.float32) + c

        rate("bitpack-u32", timeit(bitpack, xy, z))

        if N == NSMALL:
            idx_steps = idx.reshape(96, 65536)

            def scan96(c, isteps):
                def body(carry, i):
                    v = flat_f32[i]
                    return carry + jnp.sum(v) * 0.0, v[0]

                out, _ = jax.lax.scan(body, c, isteps)
                return out

            rate("scan-96x65536", timeit(scan96, idx_steps))

    # --- pallas VMEM gather kernels -----------------------------------
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        TILE = 8192
        N = NSMALL
        idx = jnp.asarray(rng.randint(0, R**3, size=N).astype(np.int32))

        def serial_kernel(idx_ref, occ_ref, out_ref):
            def body(i, _):
                out_ref[pl.ds(i, 1)] = occ_ref[pl.ds(idx_ref[i], 1)]
                return 0

            jax.lax.fori_loop(0, TILE, body, 0)

        def pallas_serial(c, idx):
            return pl.pallas_call(
                serial_kernel,
                grid=(N // TILE,),
                in_specs=[
                    pl.BlockSpec((TILE,), lambda g: (g,), memory_space=pltpu.SMEM),
                    pl.BlockSpec((R**3,), lambda g: (0,), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((TILE,), lambda g: (g,), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((N,), jnp.float32),
            )(idx, flat_f32) + c

        sec = timeit(pallas_serial, idx)
        print(f"  [6.3M] {'pallas-serial':24s} {sec*1e3:8.2f} ms  {sec/N*1e9:6.2f} ns/row")
    except Exception as e:  # noqa: BLE001
        print(f"  pallas-serial FAILED: {type(e).__name__}: {str(e)[:200]}")

    try:
        # vectorized in-kernel gather: rely on jnp indexing inside the
        # kernel body (lowers iff Mosaic supports dynamic_gather here)
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        TILE = 8192
        N = NSMALL
        idx = jnp.asarray(rng.randint(0, R**3, size=N).astype(np.int32))

        def vec_kernel(idx_ref, occ_ref, out_ref):
            out_ref[:] = occ_ref[idx_ref[:]]

        def pallas_vec(c, idx):
            return pl.pallas_call(
                vec_kernel,
                grid=(N // TILE,),
                in_specs=[
                    pl.BlockSpec((TILE,), lambda g: (g,), memory_space=pltpu.VMEM),
                    pl.BlockSpec((R**3,), lambda g: (0,), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((TILE,), lambda g: (g,), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((N,), jnp.float32),
            )(idx, flat_f32) + c

        sec = timeit(pallas_vec, idx)
        print(f"  [6.3M] {'pallas-vector':24s} {sec*1e3:8.2f} ms  {sec/N*1e9:6.2f} ns/row")
    except Exception as e:  # noqa: BLE001
        print(f"  pallas-vector FAILED: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()

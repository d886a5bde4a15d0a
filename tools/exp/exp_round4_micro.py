"""Round-4 corrected micro rates: every op carries a REAL dependency on
the scan carry (docs/benchmark.md "Second measurement caveat") so XLA
cannot hoist it. Rates for: element gather (f32/i32), row gather, sort
(2/3-col), cumsum, scatter-add, and a Pallas serial VMEM gather — the
numbers the march/dispatch/backward designs are sized against.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp

import xrnerf_tpu  # noqa: F401  (enables the persistent compile cache)

ITERS = 8
N = 48 * 65536  # 3.1M


def timeit(fn, *args, iters=ITERS, warmup=2):
    @jax.jit
    def jfn(x, *a):
        def body(c, _):
            return jnp.sum(fn(c, *a)).astype(jnp.float32) * 0.0 + c + 1.0, None

        return jax.lax.scan(body, x, None, length=iters)[0]

    for _ in range(warmup):
        out = jfn(jnp.float32(1.0), *args)
    float(out)
    t0 = time.perf_counter()
    float(jfn(jnp.float32(1.0), *args))
    return (time.perf_counter() - t0) / iters


def dep_i(c, i):
    """int32 zero that provably depends on the carry at runtime."""
    return (c * 1e-30).astype(jnp.int32)


def main():
    rng = np.random.RandomState(0)
    tab_f = jnp.asarray(rng.rand(128**3).astype(np.float32))
    rows16 = jnp.asarray(rng.rand(1 << 16, 16).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, 128**3, N).astype(np.int32))
    idx64k = idx % (1 << 16)
    vals2 = jnp.asarray(rng.randn(N, 2).astype(np.float32))

    def r(name, sec, n=N):
        print(f"  {name:32s} {sec*1e3:8.2f} ms {sec/n*1e9:6.2f} ns/row", flush=True)

    r("gather f32 elem", timeit(lambda c, i: tab_f[i + dep_i(c, i)], idx))
    r("gather 16-lane row", timeit(lambda c, i: rows16[i + dep_i(c, i)], idx64k))
    r(
        "sort 2-col int32",
        timeit(
            lambda c, i: jax.lax.sort(
                (i + dep_i(c, i), jnp.arange(N, dtype=jnp.int32)), num_keys=1
            )[0].astype(jnp.float32),
            idx,
        ),
    )
    r(
        "sort 3-col (f32x2 payload)",
        timeit(
            lambda c, i, v: jax.lax.sort(
                (i + dep_i(c, i), v[:, 0], v[:, 1]), num_keys=1
            )[1],
            idx, vals2,
        ),
    )
    r("cumsum [N,2]", timeit(lambda c, v: jnp.cumsum(v + c * 1e-30, axis=0), vals2))
    r(
        "scatter-add [N,2]->[2^19,2]",
        timeit(
            lambda c, i, v: jnp.zeros((1 << 19, 2), jnp.float32)
            .at[i % (1 << 19) + dep_i(c, i)]
            .add(v, mode="drop"),
            idx, vals2,
        ),
    )

    # Pallas serial VMEM gather
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        TILE = 8192
        R3 = 128**3

        def serial_kernel(idx_ref, occ_ref, out_ref):
            def body(i, _):
                out_ref[pl.ds(i, 1)] = occ_ref[pl.ds(idx_ref[i], 1)]
                return 0

            jax.lax.fori_loop(0, TILE, body, 0)

        def pallas_gather(c, i):
            i = i + dep_i(c, i)
            return pl.pallas_call(
                serial_kernel,
                grid=(N // TILE,),
                in_specs=[
                    pl.BlockSpec((TILE,), lambda g: (g,), memory_space=pltpu.SMEM),
                    pl.BlockSpec((R3,), lambda g: (0,), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(
                    (TILE,), lambda g: (g,), memory_space=pltpu.VMEM
                ),
                out_shape=jax.ShapeDtypeStruct((N,), jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=R3 * 4 + 16 * 1024 * 1024
                ),
            )(i, tab_f)

        r("pallas serial VMEM gather", timeit(pallas_gather, idx))
    except Exception as e:  # noqa: BLE001
        print(f"  pallas gather FAILED: {type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__":
    main()

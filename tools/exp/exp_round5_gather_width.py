"""Round-5: does XLA's TPU gather cost scale with ROW COUNT or BYTES?

The pooled KiloNeRF march is bound by ~7.3M single-element occupancy
gathers per chunk at ~8 ns/row. If a gather of a WIDE row (64-512 B)
costs the same ~8 ns as a 4 B element, the march can fetch a bit-packed
8^3..16^3 cell neighborhood per probe and cut the row count 4-8x
(block-march design, docs/benchmark.md round-5). This measures, at the
real shapes:

  - element gather: [3.1M] idx into a 2M-entry f32/int8 table
  - row gathers:    [3.1M]x[16 u32], [1.6M]x[128 u32], [0.5M]x[128 u32]
  - lane-extract:   one-hot word select among 128 lanes at [65536,128]
                    x 384 candidate iterations (the block-march's
                    per-candidate bit extraction cost)

Chained-scan timing (the docs' measurement caveat: standalone micro
rates on the relay overstate; these shapes chain through a scalar).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

ITERS = 8


def timeit(fn, *args, iters=ITERS, warmup=2):
    @jax.jit
    def jfn(x, *a):
        def body(c, _):
            out = fn(c, *a)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return (leaf.reshape(-1)[0].astype(jnp.float32) * 1e-30 + c), None

        return jax.lax.scan(body, x, None, length=iters)[0]

    for _ in range(warmup):
        out = jfn(jnp.float32(1.0), *args)
    float(out)
    t0 = time.perf_counter()
    float(jfn(jnp.float32(1.0), *args))
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.RandomState(0)
    T = 2 * 1024 * 1024

    tab_f32 = jnp.asarray(rng.rand(T).astype(np.float32))
    tab_i8 = jnp.asarray((rng.rand(T) < 0.1).astype(np.int8))

    for M in (3_145_728,):
        idx = jnp.asarray(rng.randint(0, T, M).astype(np.int32))

        def g_f32(c, idx, tab):
            return jnp.take(tab, idx + jnp.int32(c * 0), axis=0)

        s = timeit(g_f32, idx, tab_f32)
        print(f"elem f32   [{M/1e6:.1f}M] from 2M:  {s*1e3:7.2f} ms  "
              f"{s/M*1e9:6.2f} ns/row", flush=True)
        s = timeit(g_f32, idx, tab_i8)
        print(f"elem int8  [{M/1e6:.1f}M] from 2M:  {s*1e3:7.2f} ms  "
              f"{s/M*1e9:6.2f} ns/row", flush=True)

    # row gathers: [R, W] uint32 tables
    for (E, W, M) in (
        (32768, 16, 3_145_728),   # 8^3-nbhd table, stage-A count
        (4096, 128, 1_572_864),   # 16^3-nbhd table, G=16 probe count
        (4096, 128, 524_288),
        (4096, 128, 3_145_728),
    ):
        tab = jnp.asarray(rng.randint(0, 2**31, (E, W)).astype(np.uint32))
        idx = jnp.asarray(rng.randint(0, E, M).astype(np.int32))

        def g_row(c, idx, tab):
            return jnp.take(tab, idx + jnp.int32(c * 0), axis=0)

        s = timeit(g_row, idx, tab)
        print(f"row  [{M/1e6:4.1f}M]x[{W:3d} u32] from {E}: {s*1e3:7.2f} ms  "
              f"{s/M*1e9:6.2f} ns/row  {M*W*4/s/1e9:6.1f} GB/s", flush=True)

    # lane extraction: per-candidate one-hot word select among 128 lanes
    N = 65536
    rows = jnp.asarray(rng.randint(0, 2**31, (N, 128)).astype(np.uint32))
    widx = jnp.asarray(rng.randint(0, 128, (N,)).astype(np.int32))
    lanes = jax.lax.broadcasted_iota(jnp.int32, (N, 128), 1)

    def extract(c, rows, widx):
        w = widx + jnp.int32(c * 0)
        acc = jnp.uint32(0)
        out = 0
        for k in range(16):  # 16 candidates' worth per call
            sel = jnp.where(lanes == ((w + k) % 128)[:, None], rows, jnp.uint32(0))
            word = sel.max(axis=-1)
            out = out + (word >> jnp.uint32(k % 32)) & jnp.uint32(1)
        return out

    s = timeit(extract, rows, widx)
    per_cand = s / 16
    print(f"lane-extract [{N}] x16 cands: {s*1e3:7.2f} ms "
          f"({per_cand*1e3:5.2f} ms/cand-slab; x384 = {per_cand*384*1e3:6.1f} ms/chunk)",
          flush=True)


if __name__ == "__main__":
    main()

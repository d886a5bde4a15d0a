"""Round-5: which gather shapes hit the TPU fast path, and what does the
MoE sort cost?

exp_round5_gather_width.py showed: element gathers from a 2M-entry table
run ~8 ns/row regardless of dtype, while ROW gathers ([16..128] u32 wide)
from small tables run ~2.8 ns/row. This pins down the boundary at the
shapes the block-march redesign needs:

  - element gathers from small tables (64k/16k/4k entries)
  - narrow row gathers ([2]/[4]/[8] u32) from 16k-entry tables — the
    z-column bitfield design gathers [4 u32] (128 z bits) per sample
  - a [16 u32] row gather from a 256k-entry (16 MB) table — table-size
    vs row-width attribution
  - planar-layout gather+extract: the march's real access pattern,
    idx [Q, N] -> rows [Q, N, 4] -> word select + variable shift
  - jax.lax.sort 2-operand at 768k/512k rows — the MoE dispatch's two
    sorts (kilonerf_field.py gather_dispatch)
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

    # --- element gathers from small tables ---
    M = 3_145_728
    for E in (65536, 16384, 4096):
        tab = jnp.asarray(rng.randint(0, 2**31, E).astype(np.uint32))
        idx = jnp.asarray(rng.randint(0, E, M).astype(np.int32))

        def g(c, idx, tab):
            return jnp.take(tab, idx + jnp.int32(c * 0), axis=0)

        s = timeit(g, idx, tab)
        print(f"elem u32 [{M/1e6:.1f}M] from {E:6d}: {s*1e3:7.2f} ms  "
              f"{s/M*1e9:6.2f} ns/row", flush=True)

    # --- narrow row gathers ---
    for (E, W, M2) in (
        (16384, 2, 4_194_304),
        (16384, 4, 4_194_304),
        (65536, 4, 4_194_304),
        (16384, 8, 4_194_304),
        (262144, 16, 3_145_728),  # 16 MB table: width vs size
    ):
        tab = jnp.asarray(rng.randint(0, 2**31, (E, W)).astype(np.uint32))
        idx = jnp.asarray(rng.randint(0, E, M2).astype(np.int32))

        def gr(c, idx, tab):
            return jnp.take(tab, idx + jnp.int32(c * 0), axis=0)

        s = timeit(gr, idx, tab)
        print(f"row  [{M2/1e6:.1f}M]x[{W:2d} u32] from {E:6d} "
              f"({E*W*4//1024//1024:3d}MB): {s*1e3:7.2f} ms  "
              f"{s/M2*1e9:6.2f} ns/row", flush=True)

    # --- planar gather + word-select + shift (the march's access) ---
    Q, N = 64, 65536  # stage-B shape [Kg*G, n_rays]
    tab = jnp.asarray(rng.randint(0, 2**31, (16384, 4)).astype(np.uint32))
    idx2 = jnp.asarray(rng.randint(0, 16384, (Q, N)).astype(np.int32))
    zc = jnp.asarray(rng.randint(0, 128, (Q, N)).astype(np.int32))

    def planar(c, idx2, zc, tab):
        rows = jnp.take(tab, idx2 + jnp.int32(c * 0), axis=0)  # [Q,N,4]
        w = zc >> 5  # word index 0..3
        word = jnp.where(
            w == 0, rows[..., 0],
            jnp.where(w == 1, rows[..., 1],
                      jnp.where(w == 2, rows[..., 2], rows[..., 3])),
        )
        return (word >> (zc & 31).astype(jnp.uint32)) & jnp.uint32(1)

    s = timeit(planar, idx2, zc, tab)
    print(f"planar [{Q}x{N}] row4-gather+extract: {s*1e3:7.2f} ms  "
          f"{s/(Q*N)*1e9:6.2f} ns/sample", flush=True)

    # --- MoE sort cost ---
    for B in (786_432, 524_288, 393_216):
        key = jnp.asarray(rng.randint(0, 4097, B).astype(np.int32))
        iota = jnp.arange(B, dtype=jnp.int32)

        def srt(c, key):
            return jax.lax.sort((key + jnp.int32(c * 0), iota), num_keys=1)[1]

        s = timeit(srt, key)
        print(f"sort 2-col [{B/1e3:.0f}k]: {s*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()

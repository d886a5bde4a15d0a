"""Round-5 part 3: break one level's dense_segment_grad into pieces.

At M=1.05M rows, V=T=2^19: sort1 (3-op key+2 f32 lanes), the two
H-merge sorts ([M+V] 2-col), the cumsum, and the boundary gather.
Plus: the fwd+bwd residual-saving variant's cost model (feats saved
vs rematerialized).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

N = 4096 * 32
F = 2
T = 1 << 19
M = N * 8
ITERS = 6


def timeit(fn, *args, iters=ITERS, warmup=2):
    @jax.jit
    def jfn(x, *a):
        def body(c, _):
            out = fn(c * 1e-30, *a)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return jnp.sum(leaf).astype(jnp.float32) * 0.0 + c, None

        return jax.lax.scan(body, x, None, length=iters)[0]

    for _ in range(warmup):
        out = jfn(jnp.float32(1.0), *args)
    float(out)
    t0 = time.perf_counter()
    float(jfn(jnp.float32(1.0), *args))
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.RandomState(0)
    key = jnp.asarray(rng.randint(0, T, M).astype(np.int32))
    vals = jnp.asarray(rng.randn(M, F).astype(np.float32) * 1e-3)
    l0 = jax.lax.bitcast_convert_type(vals[:, 0], jnp.int32)
    l1 = jax.lax.bitcast_convert_type(vals[:, 1], jnp.int32)

    s = timeit(
        lambda c, k, a, b: jax.lax.sort(
            (k + jnp.int32(c * 0), a, b), num_keys=1
        )[0],
        key, l0, l1,
    )
    print(f"sort1 3-op [{M/1e6:.2f}M]:          {s*1e3:6.2f} ms", flush=True)

    si = jax.jit(lambda k: jax.lax.sort((k,))[0])(key)
    q = jnp.arange(T + 1, dtype=jnp.int32)
    comb = jnp.concatenate([si * 2 + 1, q * 2])
    tag = jnp.concatenate([jnp.full((M,), M + T + 2, jnp.int32), q])

    s = timeit(
        lambda c, cb, tg: jax.lax.sort((cb + jnp.int32(c * 0), tg), num_keys=1)[1],
        comb, tag,
    )
    print(f"merge sort 2-col [{(M+T)/1e6:.2f}M]:   {s*1e3:6.2f} ms", flush=True)

    stag = jax.jit(lambda cb, tg: jax.lax.sort((cb, tg), num_keys=1)[1])(comb, tag)
    iot = jnp.arange(M + T + 1, dtype=jnp.int32)

    s = timeit(
        lambda c, st: jax.lax.sort((st + jnp.int32(c * 0), iot), num_keys=1)[1],
        stag,
    )
    print(f"unsort 2-col [{(M+T)/1e6:.2f}M]:       {s*1e3:6.2f} ms", flush=True)

    sv = jnp.asarray(rng.randn(M, F).astype(np.float32))

    s = timeit(lambda c, v: jnp.cumsum(v + c, axis=0), sv)
    print(f"cumsum [{M/1e6:.2f}M, 2]:          {s*1e3:6.2f} ms", flush=True)

    cs = jnp.concatenate([jnp.zeros((1, F)), jnp.cumsum(sv, axis=0)])
    H = jnp.asarray(np.sort(rng.randint(0, M, T + 1)).astype(np.int32))

    s = timeit(lambda c, cs, H: jnp.take(cs + c, H, axis=0), cs, H)
    print(f"boundary gather [{(T+1)/1e3:.0f}k x 8B]: {s*1e3:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()

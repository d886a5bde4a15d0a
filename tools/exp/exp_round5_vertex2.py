"""Round-5 part 2: level-BATCHED vertex table ops.

jax.lax.sort sorts along the last axis independently per leading-dim
row, so all 16 levels' segment reductions can ride ONE batched sort
call ([16, M] operands) instead of 48 separate sort dispatches; dense
levels pad their query range to T (extra segments are empty -> zero
rows, which is exactly the [L, T, F] grad layout). Same for the fwd
gather: one batched take_along_axis vs 16 takes vs 1 flat take, plus
row-packed table factorizations ([T/k, k*F] wider rows).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

N = 4096 * 32
L, F = 16, 2
T = 1 << 19
M = N * 8
ITERS = 4


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
    table = jnp.asarray(rng.randn(L, T, F).astype(np.float32) * 1e-2)
    idx = jnp.asarray(rng.randint(0, T, (L, N, 8)).astype(np.int32))
    vals = jnp.asarray(rng.randn(L, M, F).astype(np.float32) * 1e-3)

    # --- fwd: row-packed factorizations [T/k, k*F] ---
    for k in (2, 4, 8):
        tk = table.reshape(L, T // k, k * F)

        def packed(c, tk, idx):
            outs = []
            for l in range(L):
                fi = idx[l].reshape(-1)
                rows = jnp.take(tk[l], fi >> int(np.log2(k)), axis=0)
                lane = (fi & (k - 1)) * F
                f0 = jnp.zeros_like(rows[:, 0])
                f1 = jnp.zeros_like(rows[:, 0])
                for j in range(k):
                    pick = lane == j * F
                    f0 = jnp.where(pick, rows[:, j * F], f0)
                    f1 = jnp.where(pick, rows[:, j * F + 1], f1)
                outs.append(jnp.stack([f0 + c, f1], -1))
            return jnp.stack(outs)

        s = timeit(packed, tk, idx)
        print(f"fwd packed [T/{k}, {k*F}F] ({T//k} rows): {s*1e3:7.1f} ms "
              f"({s/(L*M)*1e9:5.2f} ns/row)", flush=True)

    # --- fwd: batched take_along_axis [L, T, F] ---
    def batched(c, table, idx):
        fi = idx.reshape(L, M)
        return jnp.take_along_axis(
            table, (fi + jnp.int32(c * 0))[..., None], axis=1
        )

    s = timeit(batched, table, idx)
    print(f"fwd batched take_along [L,T,F]:   {s*1e3:7.1f} ms "
          f"({s/(L*M)*1e9:5.2f} ns/row)", flush=True)

    # --- tablegrad: level-batched sorts ---
    def seg_batched(c, idx, vals):
        key = idx.reshape(L, M)  # [L, M]
        v16 = (vals + c).astype(jnp.bfloat16)  # [L, M, 2]
        packed = jax.lax.bitcast_convert_type(v16, jnp.int32)  # [L, M]
        si, sp = jax.lax.sort((key, packed), num_keys=1, dimension=-1)
        v2 = jax.lax.bitcast_convert_type(sp, jnp.bfloat16).astype(jnp.float32)
        cs = jnp.concatenate(
            [jnp.zeros((L, 1, F), jnp.float32), jnp.cumsum(v2, axis=1)], axis=1
        )  # [L, M+1, F]
        q = jnp.arange(T + 1, dtype=jnp.int32)
        qb = jnp.broadcast_to(q, (L, T + 1))
        comb = jnp.concatenate([si * 2 + 1, qb * 2], axis=1)  # [L, M+T+1]
        tag = jnp.concatenate(
            [jnp.full((L, M), M + T + 2, jnp.int32), qb], axis=1
        )
        _, stag = jax.lax.sort((comb, tag), num_keys=1, dimension=-1)
        iot = jnp.broadcast_to(
            jnp.arange(M + T + 1, dtype=jnp.int32), (L, M + T + 1)
        )
        _, qpos = jax.lax.sort((stag, iot), num_keys=1, dimension=-1)
        H = qpos[:, : T + 1] - qb  # [L, T+1]
        csH = jnp.take_along_axis(cs, H[..., None], axis=1)  # [L, T+1, F]
        return csH[:, 1:] - csH[:, :-1]  # [L, T, F]

    s = timeit(seg_batched, idx, vals)
    print(f"tablegrad level-batched packed:   {s*1e3:7.1f} ms", flush=True)

    # f32 lanes variant (3-op batched sort, exact)
    def seg_batched_f32(c, idx, vals):
        key = idx.reshape(L, M)
        v = vals + c
        l0 = jax.lax.bitcast_convert_type(v[..., 0], jnp.int32)
        l1 = jax.lax.bitcast_convert_type(v[..., 1], jnp.int32)
        si, s0, s1 = jax.lax.sort((key, l0, l1), num_keys=1, dimension=-1)
        v2 = jnp.stack(
            [
                jax.lax.bitcast_convert_type(s0, jnp.float32),
                jax.lax.bitcast_convert_type(s1, jnp.float32),
            ],
            -1,
        )
        cs = jnp.concatenate(
            [jnp.zeros((L, 1, F), jnp.float32), jnp.cumsum(v2, axis=1)], axis=1
        )
        q = jnp.arange(T + 1, dtype=jnp.int32)
        qb = jnp.broadcast_to(q, (L, T + 1))
        comb = jnp.concatenate([si * 2 + 1, qb * 2], axis=1)
        tag = jnp.concatenate(
            [jnp.full((L, M), M + T + 2, jnp.int32), qb], axis=1
        )
        _, stag = jax.lax.sort((comb, tag), num_keys=1, dimension=-1)
        iot = jnp.broadcast_to(
            jnp.arange(M + T + 1, dtype=jnp.int32), (L, M + T + 1)
        )
        _, qpos = jax.lax.sort((stag, iot), num_keys=1, dimension=-1)
        H = qpos[:, : T + 1] - qb
        csH = jnp.take_along_axis(cs, H[..., None], axis=1)
        return csH[:, 1:] - csH[:, :-1]

    s = timeit(seg_batched_f32, idx, vals)
    print(f"tablegrad level-batched f32:      {s*1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()

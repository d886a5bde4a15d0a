"""Round-5: vertex hash-encoding gather/reduction variants at step shape.

Facts from exp_round5_gather2.py: row gathers (>=8 B rows) from
on-chip-size tables run ~2.8 ns/row; the same rows from 16 MB+ tables
run ~7-11 ns/row. The vertex fwd is ONE flat gather of 33.5M x 8 B rows
from a 67 MB [L*T, F] table (237 ms measured) — per-level gathers pull
from 4 MB [T, F] tables instead. Also: value-lane packing (2 x bf16 in
one u32) for the segment-reduction sorts, and a shared one-sort-
across-levels variant.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from xrnerf_tpu.ops.sorted_segment import dense_segment_grad

N = 4096 * 32  # bench-shape samples (sample_budget 2^17)
L, F = 16, 2
T = 1 << 19
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
    vals = jnp.asarray(rng.randn(L, N * 8, F).astype(np.float32) * 1e-3)

    def flat_gather(c, table, idx):
        flat = table.reshape(L * T, F)
        offs = (jnp.arange(L, dtype=jnp.int32) * T)[:, None]
        fidx = (idx.reshape(L, N * 8) + offs).reshape(-1)
        return jnp.take(flat, fidx + jnp.int32(c * 0), axis=0).reshape(L, N, 8, F)

    s = timeit(flat_gather, table, idx)
    print(f"fwd flat [L*T,F] gather 16.8M rows: {s*1e3:7.1f} ms "
          f"({s/(L*N*8)*1e9:5.2f} ns/row)", flush=True)

    def perlevel_gather(c, table, idx):
        outs = []
        for l in range(L):
            outs.append(
                jnp.take(table[l], idx[l].reshape(-1) + jnp.int32(c * 0), axis=0)
            )
        return jnp.stack(outs).reshape(L, N, 8, F)

    s = timeit(perlevel_gather, table, idx)
    print(f"fwd per-level gathers from [T,F]:   {s*1e3:7.1f} ms "
          f"({s/(L*N*8)*1e9:5.2f} ns/row)", flush=True)

    # bf16 table variant (tcnn stores fp16 tables)
    table16 = table.astype(jnp.bfloat16)

    def perlevel_gather16(c, table16, idx):
        outs = []
        for l in range(L):
            outs.append(
                jnp.take(table16[l], idx[l].reshape(-1) + jnp.int32(c * 0), axis=0)
            )
        return jnp.stack(outs).reshape(L, N, 8, F)

    s = timeit(perlevel_gather16, table16, idx)
    print(f"fwd per-level bf16 [T,F]:           {s*1e3:7.1f} ms "
          f"({s/(L*N*8)*1e9:5.2f} ns/row)", flush=True)

    # --- segment reduction variants (table grad) ---
    def seg_f32(c, idx, vals):
        acc = jnp.float32(0)
        for l in range(L):
            gl = dense_segment_grad(idx[l].reshape(-1), vals[l] + c, T)
            acc = acc + jnp.sum(gl)
        return acc

    s = timeit(seg_f32, idx, vals)
    print(f"tablegrad per-level f32 lanes:      {s*1e3:7.1f} ms", flush=True)

    def seg_packed(c, idx, vals):
        """values packed 2xbf16 -> one u32 sort lane (tcnn accumulates
        fp16; rounding rows to bf16 pre-sum is the same class of
        approximation)."""
        acc = jnp.float32(0)
        for l in range(L):
            v16 = (vals[l] + c).astype(jnp.bfloat16)  # [M, 2]
            packed = jax.lax.bitcast_convert_type(
                v16.reshape(-1, 2), jnp.int32
            )[:, 0] if False else jax.lax.bitcast_convert_type(
                v16, jnp.int32
            )  # bitcast [M,2] bf16 -> [M] i32
            key = idx[l].reshape(-1)
            si, sp = jax.lax.sort((key, packed), num_keys=1)
            v2 = jax.lax.bitcast_convert_type(sp, jnp.bfloat16).astype(
                jnp.float32
            )  # [M, 2]
            cs = jnp.concatenate(
                [jnp.zeros((1, F), jnp.float32), jnp.cumsum(v2, axis=0)]
            )
            q = jnp.arange(T + 1, dtype=jnp.int32)
            comb = jnp.concatenate([si * 2 + 1, q * 2])
            tag = jnp.concatenate(
                [jnp.full((N * 8,), N * 8 + T + 2, jnp.int32), q]
            )
            _, stag = jax.lax.sort((comb, tag), num_keys=1)
            _, qpos = jax.lax.sort(
                (stag, jnp.arange(N * 8 + T + 1, dtype=jnp.int32)), num_keys=1
            )
            H = qpos[: T + 1] - q
            gl = cs[H[1:]] - cs[H[:-1]]
            acc = acc + jnp.sum(gl)
        return acc

    s = timeit(seg_packed, idx, vals)
    print(f"tablegrad per-level packed-bf16:    {s*1e3:7.1f} ms", flush=True)

    def seg_shared(c, idx, vals):
        """one shared sort across all levels, level-offset keys."""
        offs = (jnp.arange(L, dtype=jnp.int32) * T)[:, None]
        key = (idx.reshape(L, N * 8) + offs).reshape(-1)
        v16 = (vals + c).astype(jnp.bfloat16).reshape(-1, 2)
        packed = jax.lax.bitcast_convert_type(v16, jnp.int32)
        si, sp = jax.lax.sort((key, packed), num_keys=1)
        v2 = jax.lax.bitcast_convert_type(sp, jnp.bfloat16).astype(jnp.float32)
        M = L * N * 8
        V = L * T
        cs = jnp.concatenate(
            [jnp.zeros((1, F), jnp.float32), jnp.cumsum(v2, axis=0)]
        )
        q = jnp.arange(V + 1, dtype=jnp.int32)
        comb = jnp.concatenate([si * 2 + 1, q * 2])
        tag = jnp.concatenate([jnp.full((M,), M + V + 2, jnp.int32), q])
        _, stag = jax.lax.sort((comb, tag), num_keys=1)
        _, qpos = jax.lax.sort(
            (stag, jnp.arange(M + V + 1, dtype=jnp.int32)), num_keys=1
        )
        H = qpos[: V + 1] - q
        gl = cs[H[1:]] - cs[H[:-1]]
        return jnp.sum(gl)

    s = timeit(seg_shared, idx, vals)
    print(f"tablegrad shared-sort packed-bf16:  {s*1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()

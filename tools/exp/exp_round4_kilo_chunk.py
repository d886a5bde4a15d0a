"""Round-4: time ONLY the full pooled render chunk (fast iteration on
the budget-compaction / dispatch changes). Chained-scalar timing."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import bench
from xrnerf_tpu.models.networks.kilonerf import (
    KiloNerfNetwork,
    prepare_march_aux,
)

ITERS = 5


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
    occ_np, chunks, _ = bench._lego_kilonerf_inputs()
    occ = jnp.asarray(occ_np)
    b = chunks[len(chunks) // 2]
    aux = jax.jit(prepare_march_aux)(occ)
    jax.block_until_ready(aux.dist)

    net = KiloNerfNetwork(
        resolution=(16, 16, 16), domain_min=(0, 0, 0), domain_max=(1, 1, 1),
        hidden=32, n_hidden_layers=2, n_samples=384, n_keep=32,
        dtype=jnp.bfloat16, march="pooled", eval_budget=768 * 1024,
    )
    params = net.init(
        jax.random.PRNGKey(0), b, rng=None, train=False, aux=aux
    )["params"]

    def full(c, p, b):
        b = dict(b)
        b["rays_o"] = b["rays_o"] + c
        return net.apply({"params": p}, b, rng=None, train=False, aux=aux)["rgb"]

    sec = timeit(full, params, b)
    print(f"  full render chunk: {sec*1e3:8.1f} ms  (x10 chunks/frame)", flush=True)


if __name__ == "__main__":
    main()

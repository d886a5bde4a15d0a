"""Round-4: KiloNeRF pooled-frame chunk breakdown on the real lego inputs.

Times, per 65536-ray chunk: the distance transform (once-per-grid cost),
the pooled march alone, the MoE field eval alone (dispatch + grouped
matmuls at [N*K] points), and the full render chunk. Chained-scalar
timing.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import bench
from xrnerf_tpu.models.networks.kilonerf import (
    KiloNerfNetwork,
    kilonerf_pooled_march,
    prepare_march_aux,
)

ITERS = 5


def timeit(fn, *args, iters=ITERS, warmup=2):
    """Chained-scan timing (docs/benchmark.md measurement caveat): fn
    takes (c, *args) with c a scalar perturbation; iterations chain so
    neither dispatch latency nor relay ack skew the number."""

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
    print(f"occ: {occ_np.mean():.3%} occupied", flush=True)

    sec = timeit(lambda c, o: prepare_march_aux(o).dist + jnp.int32(c * 0), occ)
    print(f"  dist transform (once/grid): {sec*1e3:8.1f} ms", flush=True)

    dmin = jnp.zeros(3)
    dmax = jnp.ones(3)

    def march_only(c, ro, rd, near, far, dist):
        return kilonerf_pooled_march(
            ro + c, rd, near, far, occ, dmin, dmax, 384, 32,
            group=8, n_groups_keep=8, dist=dist,
        )[0]

    sec = timeit(
        march_only, b["rays_o"], b["rays_d"], b["near"], b["far"], aux.dist
    )
    print(f"  pooled march only:          {sec*1e3:8.1f} ms", flush=True)

    net = KiloNerfNetwork(
        resolution=(16, 16, 16), domain_min=(0, 0, 0), domain_max=(1, 1, 1),
        hidden=32, n_hidden_layers=2, n_samples=384, n_keep=32,
        dtype=jnp.bfloat16, march="pooled", eval_budget=768 * 1024,
    )
    params = net.init(jax.random.PRNGKey(0), b, rng=None, train=False, aux=aux)[
        "params"
    ]

    # field eval alone: fixed pts/dirs/net_idx through the MoE dispatch
    from xrnerf_tpu.models.fields.kilonerf_field import assign_networks

    n = b["rays_o"].shape[0] * 32
    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.rand(n, 3).astype(np.float32))
    dirs = jnp.asarray(rng.randn(n, 3).astype(np.float32))

    def pts_assign_only(c, p2, z_keep, ro, rd):
        pts = ro[:, None, :] + rd[:, None, :] * (z_keep + c)[..., None]
        flat = pts.reshape(-1, 3)
        net_idx, local = assign_networks(flat, dmin, dmax, (16, 16, 16))
        return local

    def field_only(c, p, pts, dirs):
        net_idx, local = assign_networks(pts + c, dmin, dmax, (16, 16, 16))
        return net.apply(
            {"params": p}, local, dirs, net_idx, gather_dispatch=True,
            method=lambda m, *a, **k: m.mlp(*a, **k),
        )[0]

    sec = timeit(field_only, params, pts, dirs)
    print(f"  MoE field eval [N*K]:       {sec*1e3:8.1f} ms", flush=True)

    from xrnerf_tpu.models.networks.kilonerf import kilonerf_pooled_march as _pm

    zk = jax.jit(
        lambda ro, rd, near, far: _pm(
            ro, rd, near, far, occ, dmin, dmax, 384, 32,
            group=8, n_groups_keep=8, dist=aux.dist,
        )[0]
    )(b["rays_o"], b["rays_d"], b["near"], b["far"])
    sec = timeit(pts_assign_only, params, zk, b["rays_o"], b["rays_d"])
    print(f"  pts+assign [N*K] AoS:       {sec*1e3:8.1f} ms", flush=True)

    # MoE at the eval_budget row count
    M = 768 * 1024
    sec = timeit(field_only, params, pts[:M], dirs[:M])
    print(f"  MoE field eval [768k]:      {sec*1e3:8.1f} ms", flush=True)

    def full(c, p, b):
        b = dict(b); b["rays_o"] = b["rays_o"] + c
        return net.apply({"params": p}, b, rng=None, train=False, aux=aux)["rgb"]

    sec = timeit(full, params, b)
    print(f"  full render chunk:          {sec*1e3:8.1f} ms  (x10 chunks/frame)", flush=True)


if __name__ == "__main__":
    main()

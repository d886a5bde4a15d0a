"""Benchmark: training-throughput rays/s on the flagship config.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Current flagship: full-size vanilla NeRF (8x256 MLP, 64 coarse + 128 fine
samples, posenc 10/4) — the reference's nerf_blender_base01 config. The
reference publishes no training-throughput numbers (SURVEY §6), so
``vs_baseline`` normalizes against REF_RAYS_S = 20_000 rays/s, a
representative figure for the PyTorch reference's single-GPU vanilla-NeRF
training loop on a datacenter GPU of its era (CUDA 11.1, benchmark.md env).
"""

import json
import time

import numpy as np

REF_RAYS_S = 20_000.0
BATCH = 4096
WARMUP = 3
ITERS = 20


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from xrnerf_tpu.models.networks.nerf import NerfNetwork

    rng = np.random.RandomState(0)
    d = rng.randn(BATCH, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    batch = {
        "rays_o": jnp.asarray(rng.randn(BATCH, 3).astype(np.float32)),
        "rays_d": jnp.asarray(d),
        "near": jnp.full((BATCH, 1), 2.0, jnp.float32),
        "far": jnp.full((BATCH, 1), 6.0, jnp.float32),
        "target": jnp.asarray(rng.rand(BATCH, 3).astype(np.float32)),
    }

    net = NerfNetwork(n_samples=64, n_importance=128, netdepth=8, netwidth=256)
    params = net.init(jax.random.PRNGKey(0), batch, rng=None, train=False)["params"]
    tx = optax.adam(5e-4)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, batch, key):
        def lf(p):
            out = net.apply({"params": p}, batch, rng=key, train=True)
            return net.loss(out, batch)[0]

        loss, g = jax.value_and_grad(lf)(params)
        upd, opt_state2 = tx.update(g, opt_state)
        return optax.apply_updates(params, upd), opt_state2, loss

    key = jax.random.PRNGKey(0)
    for i in range(WARMUP):
        params, opt_state, loss = step(params, opt_state, batch, jax.random.fold_in(key, i))
    loss.block_until_ready()

    t0 = time.perf_counter()
    for i in range(ITERS):
        params, opt_state, loss = step(
            params, opt_state, batch, jax.random.fold_in(key, WARMUP + i)
        )
    loss.block_until_ready()
    dt = time.perf_counter() - t0

    rays_s = BATCH * ITERS / dt
    print(
        json.dumps(
            {
                "metric": "nerf_train_rays_per_sec",
                "value": round(rays_s, 1),
                "unit": "rays/s",
                "vs_baseline": round(rays_s / REF_RAYS_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

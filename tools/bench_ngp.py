"""Micro-bench: Instant-NGP training-step throughput (rays/s) on TPU.

Measures the full HashNerfNetwork train step (march + hash-MLP + composite
+ Huber + adam) under a 10-step scan-fused dispatch, same methodology as
bench.py. Also times the components in isolation (hash encoding fwd+bwd,
march) to locate the bottleneck.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args, n=5, warmup=2):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4096)
    p.add_argument("--n_keep", type=int, default=64)
    p.add_argument("--n_candidates", type=int, default=512)
    p.add_argument("--pallas", action="store_true")
    p.add_argument("--components", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from xrnerf_tpu.models.networks.hashnerf import HashNerfNetwork

    B = args.batch
    rng = np.random.RandomState(0)
    d = rng.randn(B, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    batch = {
        "rays_o": jnp.asarray(rng.rand(B, 3).astype(np.float32) * 0.2 + 0.1),
        "rays_d": jnp.asarray(d),
        "target": jnp.asarray(rng.rand(B, 3).astype(np.float32)),
    }

    net = HashNerfNetwork(
        n_candidates=args.n_candidates, n_keep=args.n_keep,
    )
    key = jax.random.PRNGKey(0)
    params = net.init(key, batch, rng=None, train=False)["params"]
    aux = net.init_aux(params)
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    STEPS = 10

    @jax.jit
    def run_steps(params, opt_state, aux, key):
        def body(carry, k):
            params, opt_state = carry

            def lf(p):
                out = net.apply({"params": p}, batch, rng=k, train=True, aux=aux)
                return net.loss(out, batch)[0]

            loss, g = jax.value_and_grad(lf)(params)
            upd, opt_state2 = tx.update(g, opt_state)
            return (optax.apply_updates(params, upd), opt_state2), loss

        keys = jax.random.split(key, STEPS)
        (params, opt_state), losses = jax.lax.scan(body, (params, opt_state), keys)
        return params, opt_state, losses[-1]

    def step_call(params, opt_state, aux, key):
        p2, o2, loss = run_steps(params, opt_state, aux, key)
        float(loss)
        return p2, o2, loss

    dt = timed(lambda k: run_steps(params, opt_state, aux, k)[2], key, n=5)
    # force completion like bench.py
    t0 = time.perf_counter()
    for i in range(5):
        _, _, loss = run_steps(params, opt_state, aux, jax.random.fold_in(key, i))
    float(loss)
    dt = (time.perf_counter() - t0) / 5
    rays_s = B * STEPS / dt
    print(f"train: {dt*1e3/STEPS:.2f} ms/step  {rays_s:,.0f} rays/s")

    if args.components:
        from xrnerf_tpu.models.samplers.ngp_march import march_rays

        @jax.jit
        def do_march(k):
            return march_rays(k, batch["rays_o"], batch["rays_d"], aux,
                              n_candidates=args.n_candidates, n_keep=args.n_keep)

        dt = timed(do_march, key, n=10)
        print(f"march: {dt*1e3:.2f} ms")

        n_pts = B * args.n_keep
        pts = jnp.asarray(rng.rand(n_pts, 3).astype(np.float32))
        dirs = jnp.asarray(np.tile(d, (args.n_keep, 1))[:n_pts])

        from xrnerf_tpu.models.fields.ngp_mlp import NGPField

        field = NGPField(use_pallas=args.pallas)
        fparams = field.init(key, pts, dirs)["params"]

        @jax.jit
        def fwd(fp):
            rgb, sig = field.apply({"params": fp}, pts, dirs)
            return jnp.sum(rgb) + jnp.sum(sig)

        @jax.jit
        def fwdbwd(fp):
            return jax.grad(lambda p: fwd(p))(fp)

        dt = timed(fwd, fparams, n=10)
        print(f"field fwd ({n_pts} pts): {dt*1e3:.2f} ms  "
              f"{n_pts/dt/1e6:.1f} Mpts/s")
        dt = timed(fwdbwd, fparams, n=10)
        print(f"field fwd+bwd: {dt*1e3:.2f} ms  {n_pts/dt/1e6:.1f} Mpts/s")

        from xrnerf_tpu.models.embedders.hashenc import HashEncoding

        enc = HashEncoding()
        eparams = enc.init(key, pts)["params"]

        @jax.jit
        def enc_fwd(ep):
            return jnp.sum(enc.apply({"params": ep}, pts))

        @jax.jit
        def enc_bwd(ep):
            return jax.grad(lambda p: enc_fwd(p))(ep)

        dt = timed(enc_fwd, eparams, n=10)
        print(f"hashenc fwd: {dt*1e3:.2f} ms  {n_pts/dt/1e6:.1f} Mpts/s")
        dt = timed(enc_bwd, eparams, n=10)
        print(f"hashenc fwd+bwd: {dt*1e3:.2f} ms  {n_pts/dt/1e6:.1f} Mpts/s")


if __name__ == "__main__":
    main()

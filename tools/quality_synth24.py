"""Definitive in-env vertex-vs-brick quality A/B at FULL table scale.

VERDICT r4 item 3c: the round-1/3 A/Bs ran at toy scale (6 levels, 2^14
feats, max_res 64); the full blender datasets are not vendored, but a
CONVERGED multi-view run at the production table config (16 levels,
2^19 features, base 16 -> max_res 2048 — `hashnerf_mlp.py:17-20`
get_per_level_scale parity) is entirely possible on the in-repo
synthetic scene: 24 train views, 2 held-out val views. This is the
environment's definitive vertex quality number.

Training is scan-fused (16 steps/dispatch); grid updates every 16.

Usage: python tools/quality_synth24.py [--iters 4000] [--hw 320]
       [--layouts vertex,brick]
"""

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(scene_dir, layout, iters, batch):
    import jax
    import jax.numpy as jnp
    import optax

    from xrnerf_tpu.datasets.hashnerf import HashNerfDataset
    from xrnerf_tpu.models.networks.hashnerf import HashNerfNetwork
    from xrnerf_tpu.utils.metrics import mse2psnr, ssim

    ds = HashNerfDataset(scene_dir, half_res=False, testskip=1, N_rand=batch)
    net = HashNerfNetwork(
        hash_layout=layout, n_lattices=2 if layout == "brick" else 1,
    )  # full production table config (16 levels, 2^19, max_res 2048)
    b0 = {k: jnp.asarray(v) for k, v in ds.train_batch(0).items()}
    params = net.init(jax.random.PRNGKey(0), b0, rng=None, train=False)["params"]
    aux = net.init_aux(params, ds)
    tx = optax.adam(1e-2, b2=0.99, eps=1e-15)
    opt = tx.init(params)

    SPAN = 16

    def stage(i0):
        bs = [ds.train_batch(i0 + j) for j in range(SPAN)]
        return {k: jnp.asarray(np.stack([b[k] for b in bs])) for k in bs[0]}

    @jax.jit
    def steps(params, opt, aux, batches, key):
        def body(carry, xs):
            params, opt = carry
            b, k = xs

            def lf(p):
                out = net.apply({"params": p}, b, rng=k, train=True, aux=aux)
                loss, logs = net.loss(out, b)
                return loss, logs["psnr"]

            (loss, psnr), g = jax.value_and_grad(lf, has_aux=True)(params)
            u, opt2 = tx.update(g, opt)
            return (optax.apply_updates(params, u), opt2), psnr

        ks = jax.random.split(key, SPAN)
        (params, opt), psnrs = jax.lax.scan(body, (params, opt), (batches, ks))
        return params, opt, psnrs[-1]

    upd_aux = jax.jit(net.update_aux)
    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    psnr = None
    for d in range(iters // SPAN):
        params, opt, psnr = steps(
            params, opt, aux, stage(d * SPAN), jax.random.fold_in(key, d)
        )
        aux = upd_aux(
            params, aux, jnp.asarray(d * SPAN), jax.random.fold_in(key, 2**30 + d)
        )
        if d % 25 == 0:
            print(f"  [{layout}] iter {d*SPAN}: train psnr {float(psnr):.2f}",
                  flush=True)
    train_s = time.perf_counter() - t0

    @jax.jit
    def render_chunk(p, b):
        return net.apply({"params": p}, b, rng=None, train=False, aux=aux)["rgb"]

    chunk = 8192
    vp, vs = [], []
    for vi in ds.i_val:
        rays = ds.image_rays(vi)
        gt = ds.imgs[vi]
        n = rays["rays_o"].shape[0]
        pad = (-n) % chunk
        rays = {
            k: np.concatenate([v, np.repeat(v[-1:], pad, 0)]) if pad else v
            for k, v in rays.items()
        }
        outs = []
        for s0 in range(0, n + pad, chunk):
            cb = {k: jnp.asarray(v[s0 : s0 + chunk]) for k, v in rays.items()}
            outs.append(np.asarray(render_chunk(params, cb)))
        img = np.concatenate(outs)[:n].reshape(gt.shape)
        mse = float(np.mean((img - gt) ** 2))
        vp.append(float(mse2psnr(jnp.asarray(mse))))
        vs.append(float(ssim(jnp.asarray(img), jnp.asarray(gt))))
    return {
        "layout": layout,
        "iters": iters,
        "train_psnr": round(float(psnr), 2),
        "val_psnr": round(float(np.mean(vp)), 2),
        "val_ssim": round(float(np.mean(vs)), 4),
        "train_seconds": round(train_s, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=4000)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--layouts", default="vertex,brick")
    ap.add_argument("--hw", type=int, default=320)
    args = ap.parse_args()

    from xrnerf_tpu.datasets.load.synthetic import make_synthetic_blender

    work = tempfile.mkdtemp(prefix="synth24_")
    scene = os.path.join(work, "scene")
    make_synthetic_blender(scene, n_train=24, n_val=2, n_test=2,
                           H=args.hw, W=args.hw)
    results = []
    for k in args.layouts.split(","):
        print(f"=== {k}", flush=True)
        results.append(run(scene, k, args.iters, args.batch))
        print(json.dumps(results[-1]), flush=True)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()

"""Quality reproduction on the real reference lego fixture.

The reference publishes full-dataset PSNR tables
(`/root/reference/docs/en/benchmark.md:231-250`: Instant-NGP lego 35.1,
blender avg 32.58) that need the full 100-view datasets (not vendored
here). What IS vendored is the reference's own miniature REAL fixture:
2 train / 2 val 800x800 lego renders + transforms
(`/root/reference/test/datasets/data/nerf_synthetic/lego`). This tool
trains Instant-NGP on those 2 train views and reports PSNR/SSIM on the
2 held-out val views — a small-scale but honest quality row produced by
the full pipeline (dataset -> mark-untrained grid -> march -> hash-MLP
-> composite -> Adam+EMA -> eval renderer), for both hash layouts.

Usage: python tools/quality_lego.py [--layout vertex|brick|both]
       [--iters 3000] [--half_res]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LEGO = "/root/reference/test/datasets/data/nerf_synthetic/lego"


def run(layout: str, iters: int, half_res: bool, batch: int, blend: str = "mean", eval_chunk: int = 16384):
    import jax
    import jax.numpy as jnp
    import optax

    from xrnerf_tpu.datasets.hashnerf import HashNerfDataset
    from xrnerf_tpu.models.networks.hashnerf import HashNerfNetwork
    from xrnerf_tpu.utils.metrics import mse2psnr, ssim

    ds = HashNerfDataset(LEGO, half_res=half_res, testskip=1, N_rand=batch)
    net = HashNerfNetwork(
        hash_layout=layout, n_lattices=2 if layout == "brick" else 1,
        brick_blend=blend,
    )
    b0 = {k: jnp.asarray(v) for k, v in ds.train_batch(0).items()}
    params = net.init(jax.random.PRNGKey(0), b0, rng=None, train=False)["params"]
    aux = net.init_aux(params, ds)
    tx = optax.adam(1e-2, b2=0.99, eps=1e-15)
    opt = tx.init(params)
    ema = params

    @jax.jit
    def step(params, opt, ema, aux, batch, k):
        def lf(p):
            out = net.apply({"params": p}, batch, rng=k, train=True, aux=aux)
            loss, logs = net.loss(out, batch)
            return loss, logs["psnr"]

        (loss, psnr), g = jax.value_and_grad(lf, has_aux=True)(params)
        upd, opt2 = tx.update(g, opt)
        p2 = optax.apply_updates(params, upd)
        ema2 = jax.tree_util.tree_map(
            lambda e, p: 0.95 * e + 0.05 * p, ema, p2
        )
        return p2, opt2, ema2, psnr

    upd_aux = jax.jit(net.update_aux)

    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    psnr = None
    for i in range(iters):
        b = {k: jnp.asarray(v) for k, v in ds.train_batch(i).items()}
        params, opt, ema, psnr = step(
            params, opt, ema, aux, b, jax.random.fold_in(key, i)
        )
        if i % 16 == 0:
            aux = upd_aux(params, aux, jnp.asarray(i), jax.random.fold_in(key, 2**31 + i))
        if i % 500 == 0:
            print(f"  [{layout}] iter {i}: train psnr {float(psnr):.2f}", flush=True)
    train_psnr = float(psnr)
    train_s = time.perf_counter() - t0

    # held-out eval with EMA params, chunked
    @jax.jit
    def render_chunk(p, batch):
        return net.apply({"params": p}, batch, rng=None, train=False, aux=aux)["rgb"]

    chunk = eval_chunk
    val_psnrs, val_ssims = [], []
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
        for s in range(0, n + pad, chunk):
            cb = {k: jnp.asarray(v[s : s + chunk]) for k, v in rays.items()}
            outs.append(np.asarray(render_chunk(ema, cb)))
        img = np.concatenate(outs)[:n].reshape(gt.shape)
        mse = float(np.mean((img - gt) ** 2))
        val_psnrs.append(float(mse2psnr(jnp.asarray(mse))))
        val_ssims.append(float(ssim(jnp.asarray(img), jnp.asarray(gt))))

    return {
        "layout": layout,
        "blend": blend,
        "iters": iters,
        "train_psnr": round(train_psnr, 2),
        "train_seconds": round(train_s, 1),
        "val_psnr": round(float(np.mean(val_psnrs)), 2),
        "val_ssim": round(float(np.mean(val_ssims)), 4),
        "per_view_psnr": [round(p, 2) for p in val_psnrs],
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--layout", default="both", choices=["vertex", "brick", "both"])
    p.add_argument("--iters", type=int, default=3000)
    p.add_argument("--half_res", action="store_true")
    p.add_argument("--batch", type=int, default=8192)
    p.add_argument("--blend", default="mean", choices=["mean", "smooth"])
    p.add_argument("--eval_chunk", type=int, default=16384)
    args = p.parse_args()
    if not os.path.isdir(LEGO):
        sys.exit("reference lego fixture not mounted")

    layouts = ["brick", "vertex"] if args.layout == "both" else [args.layout]
    results = [
        run(lo, args.iters, args.half_res, args.batch, args.blend, args.eval_chunk)
        for lo in layouts
    ]
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()

"""NeuralBody quality row: train on the synthetic ZJU rig, eval a
HELD-OUT camera (PSNR/SSIM).

The reference's NeuralBody table
(/root/reference/docs/en/benchmark.md:257-307) is per-subject PSNR/SSIM
on real ZJU-MoCap (not vendored). This produces the framework's first
measured NeuralBody quality numbers on the in-repo synthetic rig
(make_synthetic_zju: a moving capsule 'person' with SMPL-like vertices
seen by a camera ring): train on views 0-2, evaluate view 3 — never
seen by the loss. VERDICT r4 item 8 (first non-test evidence for the
human-NeRF family beyond a throughput number).

Usage: python tools/quality_neuralbody.py [--iters 1500] [--size 256]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=1500)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--n_rand", type=int, default=1024)
    ap.add_argument("--chunk", type=int, default=8192)
    ap.add_argument("--lr", type=float, default=5e-4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from xrnerf_tpu.datasets.load.synthetic import make_synthetic_zju
    from xrnerf_tpu.datasets.neuralbody import NeuralBodyDataset
    from xrnerf_tpu.models.networks.neuralbody import NeuralBodyNetwork
    from xrnerf_tpu.utils.metrics import mse2psnr, ssim

    H = W = args.size
    arrays = make_synthetic_zju(n_frames=4, n_cams=4, H=H, W=W, n_verts=6890)
    # train on cams 0-2; cam 3 is never seen by the loss
    ds = NeuralBodyDataset(arrays=arrays, N_rand=args.n_rand,
                           training_view=(0, 1, 2))
    net = NeuralBodyNetwork(num_frames=4, n_samples=64, white_bkgd=False)
    b0 = {k: jnp.asarray(v) for k, v in ds.train_batch(0).items()}
    params = net.init(jax.random.PRNGKey(0), b0, rng=None, train=False)["params"]
    tx = optax.adam(args.lr)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, batch, k):
        def lf(p):
            out = net.apply({"params": p}, batch, rng=k, train=True)
            loss, logs = net.loss(out, batch)
            return loss, logs["psnr"]

        (loss, psnr), g = jax.value_and_grad(lf, has_aux=True)(params)
        upd, opt2 = tx.update(g, opt)
        return optax.apply_updates(params, upd), opt2, psnr

    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    psnr = None
    for i in range(args.iters):
        b = {k_: jnp.asarray(v) for k_, v in ds.train_batch(i).items()}
        params, opt, psnr = step(params, opt, b, jax.random.fold_in(key, i))
        if i % 200 == 0:
            print(f"iter {i}: train psnr {float(psnr):.2f}", flush=True)
    train_s = time.perf_counter() - t0

    @jax.jit
    def render_chunk(p, batch):
        return net.apply({"params": p}, batch, rng=None, train=False)["rgb"]

    # evaluate the test split: every (frame, cam) pair of the held-out
    # camera(s) — with training_view=(0,1,2) on a 4-cam rig that's cam 3
    # for each frame. Per-ray keys are chunked; frame-context keys
    # (verts, latent ids, ...) broadcast whole.
    ray_keys = ("rays_o", "rays_d", "near", "far")
    vp, vs = [], []
    for i, (frame, cam) in enumerate(ds.test_pairs):
        rays, gt = ds.eval_item(i)
        n = rays["rays_o"].shape[0]
        pad = (-n) % args.chunk
        ctx = {k: jnp.asarray(v) for k, v in rays.items() if k not in ray_keys}
        per_ray = {
            k: np.concatenate([rays[k], np.repeat(rays[k][-1:], pad, 0)])
            if pad else rays[k]
            for k in ray_keys
        }
        outs = []
        for s0 in range(0, n + pad, args.chunk):
            cb = dict(ctx)
            cb.update(
                {k: jnp.asarray(v[s0 : s0 + args.chunk]) for k, v in per_ray.items()}
            )
            outs.append(np.asarray(render_chunk(params, cb)))
        img = np.concatenate(outs)[:n].reshape(gt.shape)
        mse = float(np.mean((img - gt) ** 2))
        vp.append(float(mse2psnr(jnp.asarray(mse))))
        vs.append(float(ssim(jnp.asarray(img), jnp.asarray(gt))))
        print(f"eval frame {frame} cam {cam}: psnr {vp[-1]:.2f}", flush=True)
    n_eval = len(vp)

    out = {
        "iters": args.iters,
        "train_psnr": round(float(psnr), 2),
        "train_seconds": round(train_s, 1),
        "heldout_cam_psnr": round(float(np.mean(vp)), 2) if vp else None,
        "heldout_cam_ssim": round(float(np.mean(vs)), 4) if vs else None,
        "n_eval_imgs": n_eval,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

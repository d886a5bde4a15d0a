"""GNR quality row: train on the synthetic GeneBody rig, eval a HELD-OUT
camera (PSNR/SSIM) and check the reconstructed mesh against the known
analytic body.

The reference's GNR table (/root/reference/docs/en/benchmark.md:355-409)
is per-subject PSNR/SSIM/LPIPS on real GeneBody data (not vendored, and
LPIPS is PSNR/SSIM-only per the documented metrics policy,
docs/benchmark.md). This tool produces the framework's first measured
GNR quality numbers on the in-repo synthetic rig: an icosphere 'person'
seen by a ring of 8 cameras — 4 input (conditioning) views, 3 query
views supervise training, camera 7 is never seen by the loss and is the
eval view. ``reconstruct`` quality is checked geometrically: the
body is a radius-0.3 sphere, so mesh-vertex radial error is an exact
mesh metric (the reference has no mesh-quality number at all).

Usage: python tools/quality_gnr.py [--iters 2000] [--size 256]
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
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--n_rand", type=int, default=1024)
    ap.add_argument("--chunk", type=int, default=8192)
    ap.add_argument("--lr", type=float, default=1e-4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from xrnerf_tpu.datasets.genebody import GeneBodyDataset
    from xrnerf_tpu.datasets.load.synthetic import make_synthetic_genebody
    from xrnerf_tpu.models.networks.gnr import GnrNetwork
    from xrnerf_tpu.utils.metrics import mse2psnr, ssim

    H = W = args.size
    arrays = make_synthetic_genebody(n_frames=1, n_cams=8, H=H, W=W)
    ds = GeneBodyDataset(
        arrays=arrays, num_views=4, input_views=(0, 1, 2, 3), N_rand=args.n_rand
    )
    # hold camera 7 out of training entirely; 4-6 supervise
    eval_pair_idx = ds.test_pairs.index((0, 7))
    ds.query_views = [4, 5, 6]

    net = GnrNetwork(
        num_views=4, n_samples=128, load_size=W, num_stack=2,
        num_hourglass=2, hourglass_dim=128, mlp_depth=8, mlp_width=256,
        skips=(2, 4, 6),
    )
    b0 = {k: jnp.asarray(v) for k, v in ds.train_batch(0).items()}
    params = net.init(jax.random.PRNGKey(0), b0, rng=None, train=False)["params"]
    tx = optax.adam(args.lr)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, batch, k):
        def lf(p):
            out = net.apply({"params": p}, batch, rng=k, train=True)
            loss, logs = net.loss(out, batch)
            return loss, logs

        (loss, logs), g = jax.value_and_grad(lf, has_aux=True)(params)
        upd, opt2 = tx.update(g, opt)
        return optax.apply_updates(params, upd), opt2, loss

    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    for i in range(args.iters):
        b = {k: jnp.asarray(v) for k, v in ds.train_batch(i).items()}
        params, opt, loss = step(params, opt, b, jax.random.fold_in(key, i))
        if i % 250 == 0:
            print(f"  iter {i}: loss {float(loss):.5f}", flush=True)
    train_s = time.perf_counter() - t0

    # ---- held-out camera render ----
    rays, gt = ds.eval_item(eval_pair_idx)
    n = rays["rays_s"].shape[0]
    ctx = {k: jnp.asarray(v) for k, v in rays.items() if k.startswith("ctx_")}

    @jax.jit
    def render_chunk(params, rs, re):
        b = dict(ctx)
        b["rays_s"], b["rays_e"] = rs, re
        return net.apply({"params": params}, b, rng=None, train=False)["rgb"]

    chunk = args.chunk
    pad = (-n) % chunk
    rs = np.concatenate([rays["rays_s"], np.zeros((pad, 3), np.float32)])
    re = np.concatenate([rays["rays_e"], np.ones((pad, 3), np.float32)])
    outs = []
    for s in range(0, n + pad, chunk):
        outs.append(
            np.asarray(
                render_chunk(params, jnp.asarray(rs[s : s + chunk]), jnp.asarray(re[s : s + chunk]))
            )
        )
    img = np.concatenate(outs)[:n].reshape(H, W, 3)
    mse = float(np.mean((img - gt) ** 2))
    val_psnr = float(mse2psnr(jnp.asarray(mse)))
    val_ssim = float(ssim(jnp.asarray(img), jnp.asarray(gt)))

    # ---- mesh quality: radial error of the reconstructed sphere ----
    from xrnerf_tpu.models.renders.gnr_render import reconstruct_gnr

    b0 = {k: jnp.asarray(v) for k, v in ds.train_batch(0).items()}

    def density(pts):
        return net.apply({"params": params}, b0, pts, method=net.query_density)

    def color(pts, normals):
        return net.apply({"params": params}, b0, pts, normals, method=net.query_color)

    verts, faces, rgbs = reconstruct_gnr(
        density, color,
        center=np.asarray(b0["ctx_center"]),
        spatial_freq=float(b0["ctx_spatial_freq"]),
        load_size=W, n_grid=64, chunk=65536, laplacian=2,
    )
    mesh = {}
    if len(verts):
        center = np.asarray(arrays["smpl_verts"][0]).mean(0)
        r = np.linalg.norm(verts - center, axis=-1)
        mesh = {
            "n_verts": int(len(verts)),
            "n_faces": int(len(faces)),
            "radius_mean": round(float(r.mean()), 4),
            "radius_mae_vs_0.3": round(float(np.abs(r - 0.3).mean()), 4),
        }

    print(json.dumps({
        "iters": args.iters,
        "train_seconds": round(train_s, 1),
        "held_out_view": 7,
        "val_psnr": round(val_psnr, 2),
        "val_ssim": round(val_ssim, 4),
        "mesh": mesh,
    }, indent=1))


if __name__ == "__main__":
    main()

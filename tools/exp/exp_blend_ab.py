"""Quality A/B: vertex vs brick-mean vs brick-smooth hash encodings.

Re-runs the round-1 synthetic-scene A/B (docs/benchmark.md "Quality
trade-off" table: 24 views, 2k iters, matched param budget, max_res 64,
6 levels, 2^14 features) with the round-3 `brick_blend='smooth'`
face-bump cross-fade, to measure how much of the ~1.9 dB trilerp
discontinuity cost the continuous blend recovers.

Training is scan-fused (16 steps per dispatch, `update_aux` between
dispatches) so relay dispatch latency doesn't dominate wall time.

Usage: python tools/exp_blend_ab.py [--iters 2000] [--configs v,bm,bs]
"""

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIGS = {
    "v": dict(hash_layout="vertex", n_lattices=1, brick_blend="mean"),
    "bm": dict(hash_layout="brick", n_lattices=2, brick_blend="mean"),
    "bs": dict(hash_layout="brick", n_lattices=2, brick_blend="smooth"),
}
SMALL = dict(n_levels=6, log2_table_size=14, base_res=16, max_res=64)


def run(scene_dir, cfg_key, iters, batch):
    import jax
    import jax.numpy as jnp
    import optax

    from xrnerf_tpu.datasets.hashnerf import HashNerfDataset
    from xrnerf_tpu.models.networks.hashnerf import HashNerfNetwork
    from xrnerf_tpu.utils.metrics import mse2psnr, ssim

    ds = HashNerfDataset(scene_dir, half_res=False, testskip=1, N_rand=batch)
    net = HashNerfNetwork(**CONFIGS[cfg_key], **SMALL)
    b0 = {k: jnp.asarray(v) for k, v in ds.train_batch(0).items()}
    params = net.init(jax.random.PRNGKey(0), b0, rng=None, train=False)["params"]
    aux = net.init_aux(params, ds)
    tx = optax.adam(1e-2, b2=0.99, eps=1e-15)
    opt = tx.init(params)

    SPAN = 16

    def stage(i0):
        bs = [ds.train_batch(i0 + j) for j in range(SPAN)]
        return {
            k: jnp.asarray(np.stack([b[k] for b in bs])) for k in bs[0]
        }

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
            print(f"  [{key_name}] iter {d*SPAN}: train psnr {float(psnr):.2f}",
                  flush=True)
    train_s = time.perf_counter() - t0

    @jax.jit
    def render_chunk(p, b):
        return net.apply({"params": p}, b, rng=None, train=False, aux=aux)["rgb"]

    # vertex: 8 corner-gathers/pt produce [N*8, F] temps whose 2-wide
    # minor dim lane-pads 64x in HBM — keep eval peaks ~1 GB
    chunk = 4096 if CONFIGS[cfg_key]["hash_layout"] == "vertex" else 16384
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
        "config": cfg_key,
        "train_psnr": round(float(psnr), 2),
        "val_psnr": round(float(np.mean(vp)), 2),
        "val_ssim": round(float(np.mean(vs)), 4),
        "train_seconds": round(train_s, 1),
    }


key_name = ""


def main():
    global key_name
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--configs", default="bs,bm,v")
    ap.add_argument("--hw", type=int, default=96)
    args = ap.parse_args()

    from xrnerf_tpu.datasets.load.synthetic import make_synthetic_blender

    work = tempfile.mkdtemp(prefix="blend_ab_")
    scene = os.path.join(work, "scene")
    make_synthetic_blender(scene, n_train=24, n_val=2, n_test=2,
                           H=args.hw, W=args.hw)
    results = []
    for k in args.configs.split(","):
        key_name = k
        print(f"=== {k}: {CONFIGS[k]}", flush=True)
        results.append(run(scene, k, args.iters, args.batch))
        print(json.dumps(results[-1]), flush=True)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()

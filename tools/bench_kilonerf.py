"""Micro-bench: KiloNeRF full-frame inference latency on TPU.

The reference's headline perf number (docs/en/benchmark.md:117-136, see
BASELINE.md): 800x800 NSVF-synthetic frames in 393.61 ms avg (lego
365.16 ms) on a CUDA GPU with ESS/ERT through MAGMA grouped GEMMs.

This measures our equivalent: the spatial-MoE multi-network evaluated
chunk-by-chunk over one 800x800 frame with occupancy-grid empty-space
skipping, jitted once per chunk shape. Scene content is synthetic
(random net params, ~15% occupied grid like a typical object) — this is
a pure compute-path latency measurement on real hardware, not a quality
claim.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--hw", type=int, default=800)
    p.add_argument("--chunk", type=int, default=65536)
    p.add_argument("--n_samples", type=int, default=384)
    p.add_argument("--n_keep", type=int, default=32)
    p.add_argument("--resolution", type=int, default=16)
    p.add_argument("--occupied_frac", type=float, default=0.15)
    p.add_argument("--frames", type=int, default=3)
    p.add_argument("--f32", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from xrnerf_tpu.models.networks.kilonerf import KiloNerfNetwork

    R = args.resolution
    net = KiloNerfNetwork(
        resolution=(R, R, R), hidden=32, n_hidden_layers=2,
        n_samples=args.n_samples, n_keep=args.n_keep,
        dtype=jnp.float32 if args.f32 else jnp.bfloat16,
    )

    HW, C = args.hw, args.chunk
    n_rays = HW * HW
    rng = np.random.RandomState(0)

    d = rng.randn(C, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    chunk_batch = {
        "rays_o": jnp.asarray(rng.randn(C, 3).astype(np.float32) * 0.1),
        "rays_d": jnp.asarray(d),
        "near": jnp.full((C, 1), 0.5, np.float32),
        "far": jnp.full((C, 1), 2.5, np.float32),
    }
    occ = jnp.asarray(rng.rand(R * 4, R * 4, R * 4) < args.occupied_frac)

    params = net.init(
        jax.random.PRNGKey(0), chunk_batch, rng=None, train=False, aux=occ
    )["params"]

    @jax.jit
    def render_chunk(params, batch):
        out = net.apply({"params": params}, batch, rng=None, train=False, aux=occ)
        return out["rgb"]

    # one frame = ceil(n_rays / C) chunk dispatches
    n_chunks = (n_rays + C - 1) // C

    def frame():
        acc = None
        for _ in range(n_chunks):
            acc = render_chunk(params, chunk_batch)
        return float(jnp.sum(acc))  # forces completion of the chain

    frame()  # compile + warm
    t0 = time.perf_counter()
    for _ in range(args.frames):
        frame()
    dt = (time.perf_counter() - t0) / args.frames
    rays_s = n_rays / dt
    print(
        f"kilonerf frame {HW}x{HW} ({R}^3 nets, {args.n_samples} cands, "
        f"keep {args.n_keep}, {'f32' if args.f32 else 'bf16'}, "
        f"{n_chunks} chunks of {C}): {dt*1e3:.2f} ms/frame  "
        f"{rays_s/1e6:.2f} Mrays/s  (reference GPU: 365-394 ms)"
    )


if __name__ == "__main__":
    main()

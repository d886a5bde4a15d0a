"""Procedural miniature blender-format dataset for tests and smoke runs.

The reference ships a checked-in miniature lego dataset for tests
(``/root/reference/test/datasets/data/nerf_synthetic/lego``); instead of
vendoring binary assets we *generate* an equivalent fixture: an
analytically ray-traced sphere (colored by surface normal) written out as
``transforms_{split}.json`` + RGBA pngs in the exact nerf_synthetic layout,
so loaders/pipelines/trainers are exercised end-to-end on real files.
"""

from __future__ import annotations

import json
import os

import numpy as np

from ..rays import get_rays_np, intrinsics_from_hwf, pose_spherical


def _trace_sphere(H, W, focal, c2w, radius=1.0):
    """Ray-trace a normal-colored sphere at the origin. Returns [H,W,4] u8."""
    K = intrinsics_from_hwf(H, W, focal)
    rays_o, rays_d = get_rays_np(H, W, K, c2w)
    d = rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)
    o = rays_o
    b = np.sum(o * d, axis=-1)
    c = np.sum(o * o, axis=-1) - radius**2
    disc = b * b - c
    hit = disc > 0
    t = -b - np.sqrt(np.maximum(disc, 0.0))
    hit &= t > 0
    p = o + t[..., None] * d
    n = p / radius
    rgb = np.clip(0.5 * (n + 1.0), 0.0, 1.0)
    img = np.zeros((H, W, 4), dtype=np.float32)
    img[..., :3] = np.where(hit[..., None], rgb, 0.0)
    img[..., 3] = hit.astype(np.float32)
    return (img * 255).astype(np.uint8)


def make_synthetic_blender(
    out_dir: str,
    n_train: int = 4,
    n_val: int = 2,
    n_test: int = 2,
    H: int = 32,
    W: int = 32,
    camera_angle_x: float = 0.6911112070083618,
    radius: float = 4.0,
    seed: int = 0,
) -> str:
    """Write a tiny nerf_synthetic-layout scene; returns ``out_dir``."""
    import imageio.v2 as imageio

    rng = np.random.RandomState(seed)
    focal = 0.5 * W / np.tan(0.5 * camera_angle_x)
    counts = {"train": n_train, "val": n_val, "test": n_test}
    for split, n in counts.items():
        os.makedirs(os.path.join(out_dir, split), exist_ok=True)
        frames = []
        for i in range(n):
            theta = float(rng.uniform(-180, 180))
            phi = float(rng.uniform(-60, -10))
            c2w = pose_spherical(theta, phi, radius)
            img = _trace_sphere(H, W, focal, c2w)
            rel = f"./{split}/r_{i}"
            imageio.imwrite(os.path.join(out_dir, f"{split}/r_{i}.png"), img)
            frames.append(
                {"file_path": rel, "transform_matrix": c2w.tolist()}
            )
        meta = {"camera_angle_x": camera_angle_x, "frames": frames}
        with open(os.path.join(out_dir, f"transforms_{split}.json"), "w") as f:
            json.dump(meta, f)
    return out_dir

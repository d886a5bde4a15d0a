"""GNR rendering: projection, pixel-aligned sampling, visual hull,
compositing.

Parity target: ``GnrRenderer``
(``/root/reference/xrnerf/models/renders/gnr_render.py``):
  - ``index`` grid_sample projection + ``orthogonal``/``perspective``
    (``networks/utils/gnr.py:286-350``)
  - ``get_rays_orthogonal``/``get_rays_perspective`` (:118-187) — ray
    *segments* (start, end), not origin+direction
  - ``make_att_input`` (:189-222), ``make_nerf_input`` (:224-309),
    ``make_nerf_output`` compositing (:311-357), ``inside_pts_vh`` visual
    hull (:489-526)

TPU-first: everything static-shape. The reference compacts sample points
to those inside the visual hull (``pts = pts[inside]``) and scatters back
through a sparse matmul; here the full [R*S] set is evaluated and hull-
rejected points just get sigma = -1e4 — no dynamic shapes, no scatter,
and XLA fuses the mask into the compositing. Ray *generation* is host-side
numpy in the dataset (fixed pixel batches), matching the rest of the
framework.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# grid_sample + projections
# ---------------------------------------------------------------------------
def grid_sample_2d(
    feat: jnp.ndarray,  # [H, W, C]
    uv: jnp.ndarray,  # [N, 2] in [-1, 1] (x, y)
    mode: str = "bilinear",
) -> jnp.ndarray:
    """torch.F.grid_sample semantics (align_corners=False, zero padding)."""
    H, W = feat.shape[:2]
    x = (uv[:, 0] + 1.0) * W / 2.0 - 0.5
    y = (uv[:, 1] + 1.0) * H / 2.0 - 0.5
    if mode == "nearest":
        xi = jnp.round(x).astype(jnp.int32)
        yi = jnp.round(y).astype(jnp.int32)
        valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        v = feat[jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1)]
        return jnp.where(valid[:, None], v, 0.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    wx = (x - x0)[:, None]
    wy = (y - y0)[:, None]

    def tap(yi, xi):
        valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        v = feat[jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1)]
        return jnp.where(valid[:, None], v, 0.0)

    return (
        tap(y0, x0) * (1 - wx) * (1 - wy)
        + tap(y0, x0 + 1) * wx * (1 - wy)
        + tap(y0 + 1, x0) * (1 - wx) * wy
        + tap(y0 + 1, x0 + 1) * wx * wy
    )


def index_views(feats: jnp.ndarray, uv: jnp.ndarray, mode: str = "bilinear"):
    """[V, H, W, C] feats at [V, N, 2] uv -> [V, N, C] (the reference's
    ``index``, vmapped over views)."""
    return jax.vmap(lambda f, u: grid_sample_2d(f, u, mode))(feats, uv)


def orthogonal_project(points: jnp.ndarray, calibs: jnp.ndarray) -> jnp.ndarray:
    """[N,3] world pts through [V,4,4] ortho calib -> [V, N, 3]."""
    return (
        jnp.einsum("vab,nb->vna", calibs[:, :3, :3], points)
        + calibs[:, None, :3, 3]
    )


def perspective_project(
    points: jnp.ndarray,  # [N, 3]
    w2c: jnp.ndarray,  # [V, 4, 4]
    cam: jnp.ndarray,  # [V, >=6]: fx fy cx cy [k1 k2 p1 p2 k3] near far
) -> jnp.ndarray:
    """-> [V, N, 3]: pixel xy + camera-depth z (utils/gnr.py perspective)."""
    p = (
        jnp.einsum("vab,nb->vna", w2c[:, :3, :3], points)
        + w2c[:, None, :3, 3]
    )
    z = jnp.maximum(p[..., 2], 1e-9)
    xy = p[..., :2] / z[..., None]
    if cam.shape[1] > 6:
        x, y = xy[..., 0], xy[..., 1]
        x2, y2, xy_ = x * x, y * y, x * y
        r2 = x2 + y2
        k1, k2, p1, p2, k3 = (
            cam[:, 4, None],
            cam[:, 5, None],
            cam[:, 6, None],
            cam[:, 7, None],
            cam[:, 8, None],
        )
        c = 1 + r2 * (k1 + r2 * (k2 + r2 * k3))
        xd = c * x + p1 * 2 * xy_ + p2 * (r2 + 2 * x2)
        yd = c * y + p2 * 2 * xy_ + p1 * (r2 + 2 * y2)
        xy = jnp.stack([xd, yd], -1)
    xy = cam[:, None, 0:2] * xy + cam[:, None, 2:4]
    return jnp.concatenate([xy, p[..., 2:3]], -1)


# ---------------------------------------------------------------------------
# Host-side ray-segment generation (numpy; dataset path)
# ---------------------------------------------------------------------------
def rays_orthogonal_np(pix, calib, H, W):
    """Ray segments (start, end) for ortho cameras at pixel coords
    [N,2] (x,y); matches get_rays_orthogonal's sphere-clipped z span."""
    cy, cx, focal = H / 2.0, W / 2.0, H / 2.0
    x = (pix[:, 0] - cx) / focal
    y = (pix[:, 1] - cy) / focal
    radian = np.max(np.sqrt(x * x + y * y)) + 1e-3
    z = np.sqrt(np.maximum(radian**2 - x * x, 1e-9))
    starts = np.stack([x, y, z], -1)
    ends = np.stack([x, y, -z], -1)
    c2w = np.linalg.inv(calib)
    R, t = c2w[:3, :3], c2w[:3, 3]
    return (starts @ R.T + t).astype(np.float32), (ends @ R.T + t).astype(np.float32)


def rays_perspective_np(pix, w2c, cam):
    """Ray segments for perspective cameras: pixel grid unprojected to the
    near and far planes (get_rays_perspective, incl. undistortion)."""
    fx, fy, cx, cy = cam[0], cam[1], cam[2], cam[3]
    near, far = cam[-2], cam[-1]
    x = (pix[:, 0] - cx) / fx
    y = (pix[:, 1] - cy) / fy
    if len(cam) > 6:
        xp, yp = x.copy(), y.copy()
        for _ in range(3):
            x2, y2, xy = x * x, y * y, x * y
            r2 = x2 + y2
            c = 1 + r2 * (cam[4] + r2 * (cam[5] + r2 * cam[8]))
            x = (xp - cam[6] * 2 * xy - cam[7] * (r2 + 2 * x2)) / (c + 1e-9)
            y = (yp - cam[7] * 2 * xy - cam[6] * (r2 + 2 * y2)) / (c + 1e-9)
    starts = np.stack([x * near, y * near, np.full_like(x, near)], -1)
    ends = np.stack([x * far, y * far, np.full_like(x, far)], -1)
    c2w = np.linalg.inv(w2c)
    R, t = c2w[:3, :3], c2w[:3, 3]
    return (starts @ R.T + t).astype(np.float32), (ends @ R.T + t).astype(np.float32)


# ---------------------------------------------------------------------------
# Jittable render building blocks
# ---------------------------------------------------------------------------
def sample_segment(
    rays_s: jnp.ndarray,  # [R, 3]
    rays_e: jnp.ndarray,  # [R, 3]
    n_samples: int,
    rng: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """-> (pts [R,S,3], t_vals [R,S]); t=0 at start, 1 at end, jittered
    during training (render_rays :384-396)."""
    R = rays_s.shape[0]
    t = jnp.broadcast_to(jnp.linspace(0.0, 1.0, n_samples), (R, n_samples))
    if rng is not None:
        t = t + (jax.random.uniform(rng, t.shape) - 0.5) / (n_samples - 1)
    pts = rays_e[:, None] * t[..., None] + rays_s[:, None] * (1 - t[..., None])
    return pts, t


def visual_hull_mask(
    pts: jnp.ndarray,  # [P, 3]
    masks: jnp.ndarray,  # [V, H, W] (0/1)
    calibs: jnp.ndarray,  # [V, 4, 4]
    persps: Optional[jnp.ndarray],  # [V, >=6] or None (ortho)
    width: int,
    height: int,
) -> jnp.ndarray:
    """Point is kept iff its projection lands in EVERY view's mask
    (inside_pts_vh :489-517). -> bool [P]."""
    if persps is not None:
        xyz = perspective_project(pts, calibs, persps)
        uv = xyz[..., :2] / jnp.asarray([[[width, height]]]) * 2.0 - 1.0
    else:
        xyz = orthogonal_project(pts, calibs)
        uv = xyz[..., :2]
    m = index_views(masks[..., None], uv, mode="nearest")[..., 0]  # [V, P]
    return jnp.prod(m, axis=0) > 0


def smpl_visibility(
    pts: jnp.ndarray,
    smpl_depth: jnp.ndarray,  # [V, H, W] rasterized SMPL depth
    calibs: jnp.ndarray,
    persps: jnp.ndarray,
    width: int,
    height: int,
) -> jnp.ndarray:
    """Per-view visibility: point depth <= SMPL depth at its footprint
    (inside_pts_vh :518-523). -> [P, V] float."""
    xyz = perspective_project(pts, calibs, persps)
    uv = xyz[..., :2] / jnp.asarray([[[width, height]]]) * 2.0 - 1.0
    d_smpl = index_views(smpl_depth[..., None], uv, mode="nearest")[..., 0]  # [V,P]
    depth = xyz[..., 2]  # [V, P]
    vis = ((depth - d_smpl) <= 0) & (d_smpl > 0)
    return vis.T.astype(jnp.float32)


def composite_gnr(
    rgb_raw: jnp.ndarray,  # [R, S, 3]
    sigma_raw: jnp.ndarray,  # [R, S]
    t_vals: jnp.ndarray,  # [R, S]
    norm: jnp.ndarray,  # [R, 1] segment length scale
    rng: Optional[jax.Array] = None,
    att: Optional[jnp.ndarray] = None,  # [R, S, V+1]
    source_rgb: Optional[jnp.ndarray] = None,  # [R, S, V, 3]
    white_bkgd: bool = False,
) -> Dict[str, jnp.ndarray]:
    """make_nerf_output (:311-357): sigmoid rgb, relu density noise, alpha
    compositing; with attention, a second rgb map blending (self + source
    views) by the attention weights."""
    dists = t_vals[..., 1:] - t_vals[..., :-1]
    dists = jnp.concatenate(
        [dists, jnp.full_like(dists[..., :1], 1e10)], -1
    ) * norm
    rgb = jax.nn.sigmoid(rgb_raw)
    noise = (
        jax.random.normal(rng, sigma_raw.shape) if rng is not None else 0.0
    )
    alpha = 1.0 - jnp.exp(-jax.nn.relu(sigma_raw + noise))
    trans = jnp.cumprod(
        jnp.concatenate([jnp.ones_like(alpha[..., :1]), 1.0 - alpha + 1e-10], -1),
        -1,
    )[..., :-1]
    weights = alpha * trans
    rgb_map = jnp.sum(weights[..., None] * rgb, -2)
    acc = jnp.sum(weights, -1)
    out = {"rgb": rgb_map, "weights": weights, "acc": acc, "alpha": alpha}
    if att is not None and source_rgb is not None:
        cand = jnp.concatenate([rgb[..., None, :], source_rgb], -2)  # [R,S,V+1,3]
        blend = jnp.sum(cand * att[..., None], -2)
        att_rgb = jnp.sum(weights[..., None] * blend, -2)
        if white_bkgd:
            att_rgb = att_rgb + (1.0 - acc[..., None])
        out["att_rgb"] = att_rgb
    if white_bkgd:
        out["rgb"] = out["rgb"] + (1.0 - acc[..., None])
    return out


# ---------------------------------------------------------------------------
# Host-side mesh reconstruction driver (reconstruct, gnr_render.py:643-726)
# ---------------------------------------------------------------------------
def reconstruct_gnr(
    density_fn,  # (pts [P,3]) -> occupancy [P] in [0,1]  (jittable)
    color_fn,  # (pts [P,3], normals [P,3]) -> rgb [P,3]  (jittable)
    center: np.ndarray,
    spatial_freq: float,
    load_size: int = 512,
    n_grid: int = 128,
    threshold: float = 0.5,
    chunk: int = 65536,
    laplacian: int = 3,
):
    """Density grid sweep -> marching tetrahedra -> smoothing -> vertex
    colors. The reference's octree refinement is replaced by one dense
    chunked sweep: on TPU the full [n_grid^3] field evaluation is batched
    matmul work, while the octree's data-dependent refinement would force
    recompiles per level.

    Returns (verts [V,3] world, faces [T,3], rgbs [V,3]).
    """
    import jax

    from ...ops.marching import (
        laplacian_smooth,
        marching_tetrahedra,
        vertex_normals,
    )

    half = load_size / 2.0
    lin = np.linspace(-half, half, n_grid, dtype=np.float32)
    grid = np.stack(np.meshgrid(lin, lin, lin, indexing="ij"), -1)
    pts = grid.reshape(-1, 3) / spatial_freq + np.asarray(center)

    fn = jax.jit(density_fn)
    occ = np.concatenate(
        [
            np.asarray(fn(jax.numpy.asarray(pts[i : i + chunk])))
            for i in range(0, len(pts), chunk)
        ]
    ).reshape(n_grid, n_grid, n_grid)

    verts_idx, faces = marching_tetrahedra(occ, level=threshold)
    if len(verts_idx) == 0:
        return verts_idx, faces, np.zeros((0, 3), np.float32)
    # index coords -> normalized body coords -> world
    verts = (verts_idx / (n_grid - 1) * 2.0 - 1.0) * half
    verts = verts / spatial_freq + np.asarray(center)
    if laplacian > 0:
        verts = laplacian_smooth(verts.astype(np.float32), faces, laplacian)

    normals = vertex_normals(verts.astype(np.float32), faces)
    cfn = jax.jit(color_fn)
    rgbs = []
    n = len(verts)
    pad = (-n) % chunk if n > chunk else 0
    v_in = np.concatenate([verts, verts[-1:].repeat(pad, 0)]) if pad else verts
    n_in = np.concatenate([normals, normals[-1:].repeat(pad, 0)]) if pad else normals
    for i in range(0, len(v_in), chunk):
        rgbs.append(
            np.asarray(
                cfn(
                    jax.numpy.asarray(v_in[i : i + chunk].astype(np.float32)),
                    jax.numpy.asarray(n_in[i : i + chunk].astype(np.float32)),
                )
            )
        )
    rgbs = np.concatenate(rgbs)[:n]
    return verts.astype(np.float32), faces, rgbs

"""NGP ray marching with occupancy skipping — static-shape TPU design.

Replaces the reference's ``rays_sampler_cuda`` DDA march + atomic sample
allocation and ``compacted_coord_cuda``
(``/root/reference/extensions/ngp_raymarch/src/ray_sampler.cu:5-200``,
``src/compacted_coord.cu:6-143``).

TPU-first redesign (SURVEY §7.3): instead of variable-length atomic
buffers, a **two-pass masked march** over static shapes:

  pass 1 (cheap):   per ray, n_candidates stratified steps through the
                    AABB; O(1) bitfield lookups mark live samples —
                    empty-space skipping without per-ray while loops.
  compact (static): a key-sort per ray moves live samples to the front;
                    the first n_keep survive (transmittance-ordered,
                    like compacted_coord's recount — note the reference
                    keeps its T-threshold break disabled, so pure
                    front-compaction matches its actual behavior).
  pass 2 (hot):     hash-MLP evaluates only [N, n_keep] positions.

Both passes are fully vectorized: the sort is a [N, S] segmented sort on
the VPU, every shape static, so one XLA program serves every step.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .occupancy import GRID_RES, OccupancyGrid, occupied_at

# NGP step size: sqrt(3)/1024 covers the unit cube in <= 1024 steps
# (raymarch_shared.h:41-56 NERF_STEPS=1024, STEPSIZE).
SQRT3 = 1.7320508075688772


class MarchResult(NamedTuple):
    pts: jnp.ndarray      # [N, K, 3] sample positions (unit-cube coords)
    dirs: jnp.ndarray     # [N, 3] ray directions (normalized)
    z_vals: jnp.ndarray   # [N, K] distances along the ray
    dt: jnp.ndarray       # [N, K] step sizes
    mask: jnp.ndarray     # [N, K] live-sample mask


def aabb_intersect(
    rays_o: jnp.ndarray, rays_d: jnp.ndarray, aabb_min: float = 0.0, aabb_max: float = 1.0
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Slab test returning (t_near, t_far), clamped to t >= 0."""
    inv = 1.0 / jnp.where(jnp.abs(rays_d) > 1e-10, rays_d, 1e-10)
    t0 = (aabb_min - rays_o) * inv
    t1 = (aabb_max - rays_o) * inv
    t_near = jnp.max(jnp.minimum(t0, t1), axis=-1)
    t_far = jnp.min(jnp.maximum(t0, t1), axis=-1)
    t_near = jnp.maximum(t_near, 0.0)
    return t_near, jnp.maximum(t_far, t_near)


def _cascade_of(pos: jnp.ndarray, n_cascades: int) -> jnp.ndarray:
    """NGP mip selection: smallest cascade whose box contains the point."""
    d = jnp.max(jnp.abs(pos - 0.5), axis=-1)
    casc = jnp.ceil(jnp.log2(jnp.maximum(2.0 * d, 1e-10)))
    return jnp.clip(casc, 0, n_cascades - 1).astype(jnp.int32)


def march_rays(
    rng: jax.Array | None,
    rays_o: jnp.ndarray,  # [N, 3] in grid (unit-cube) coords
    rays_d: jnp.ndarray,  # [N, 3]
    grid: OccupancyGrid,
    n_candidates: int = 512,
    n_keep: int = 64,
    cone_angle: float = 0.0,
    res: int = GRID_RES,
) -> MarchResult:
    """Two-pass masked march (see module docstring).

    Candidate schedule: with ``cone_angle == 0`` (single-cascade scenes),
    ``n_candidates`` stratified steps across [t_near, t_far]. With
    ``cone_angle > 0`` (multi-cascade / unbounded), the NGP stepping rule
    ``dt = clamp(t * cone_angle, dt_min, dt_max)`` with
    dt_min = sqrt(3)/n_candidates and dt_max = dt_min * 2^(C-1)
    (``raymarch_shared.h:41-56`` calc_dt), realised as the closed-form
    linear -> exponential -> capped-linear lattice so shapes stay static.
    """
    dirs = rays_d / jnp.maximum(jnp.linalg.norm(rays_d, axis=-1, keepdims=True), 1e-10)
    bound = 0.5 * jnp.exp2(grid.n_cascades - 1)
    t_near, t_far = aabb_intersect(rays_o, dirs, 0.5 - bound, 0.5 + bound)

    n = rays_o.shape[0]
    S = n_candidates
    if cone_angle > 0.0:
        dt_min = SQRT3 / S
        dt_max = dt_min * float(2 ** (grid.n_cascades - 1))
        # per-ray start jitter (ray_sampler.cu jitters t_start once per ray)
        i = jnp.arange(S, dtype=rays_o.dtype)[None, :]
        if rng is not None:
            i = i + jax.random.uniform(rng, (n, 1), dtype=rays_o.dtype)
        tn = t_near[:, None]
        ta = jnp.maximum(tn, dt_min / cone_angle)  # end of dt_min regime
        tb = dt_max / cone_angle  # start of dt_max regime
        ia = jnp.maximum((ta - tn) / dt_min, 0.0)
        ib = ia + jnp.log(jnp.maximum(tb / ta, 1.0)) / jnp.log1p(cone_angle)
        t_lin = tn + dt_min * i
        t_exp = ta * jnp.exp(jnp.log1p(cone_angle) * (i - ia))
        t_cap = tb + dt_max * (i - ib)
        z = jnp.where(i <= ia, t_lin, jnp.where(i <= ib, t_exp, t_cap))
        dt = jnp.clip(z * cone_angle, dt_min, dt_max)  # [N, S]
    else:
        # stratified candidate steps; jittered so grid aliasing
        # decorrelates across steps
        u = jnp.linspace(0.0, 1.0, S, dtype=rays_o.dtype)
        if rng is not None:
            u = u + jax.random.uniform(rng, (n, S), dtype=u.dtype) / S
        else:
            u = jnp.broadcast_to(u, (n, S))
        span = (t_far - t_near)[:, None]
        z = t_near[:, None] + u * span  # [N, S]
        dt = jnp.broadcast_to(span / S, z.shape)

    pts = rays_o[:, None, :] + dirs[:, None, :] * z[..., None]  # [N, S, 3]
    casc = _cascade_of(pts, grid.n_cascades)
    live = occupied_at(grid, pts, casc, res) & (z < t_far[:, None])

    # static compaction: sort by (dead, z) and keep first n_keep
    sort_key = jnp.where(live, z, jnp.inf)
    order = jnp.argsort(sort_key, axis=-1)[:, :n_keep]  # [N, K]
    z_keep = jnp.take_along_axis(z, order, axis=-1)
    mask = jnp.take_along_axis(live, order, axis=-1)
    z_keep = jnp.where(mask, z_keep, t_far[:, None])  # park dead samples at far
    dt_keep = jnp.take_along_axis(dt, order, axis=-1)
    pts_keep = rays_o[:, None, :] + dirs[:, None, :] * z_keep[..., None]
    pts_keep = jnp.clip(pts_keep, 0.5 - bound, 0.5 + bound)
    return MarchResult(pts=pts_keep, dirs=dirs, z_vals=z_keep, dt=dt_keep, mask=mask)


def composite_masked(
    raw_rgb: jnp.ndarray,   # [N, K, 3] pre-activation
    raw_sigma: jnp.ndarray,  # [N, K] pre-activation
    march: MarchResult,
    white_bkgd: bool = True,
    density_activation: str = "exp",
) -> dict:
    """Alpha compositing over masked marched samples.

    Parity: compute_rgbs fwd semantics (calc_rgb.cu:6-67): activation
    dispatch (NGP uses exp density / sigmoid rgb), residual-transmittance
    background blend. Backward comes from XLA autodiff of this exact
    graph — replacing the hand-derived compute_rgbs_grad
    (calc_rgb.cu:71-144); equivalence is asserted in tests against a
    manual suffix-sum implementation of that gradient.
    """
    rgb = jax.nn.sigmoid(raw_rgb)
    if density_activation == "exp":
        sigma = jnp.exp(jnp.clip(raw_sigma, -15.0, 15.0))
    elif density_activation == "relu":
        sigma = jax.nn.relu(raw_sigma)
    else:
        raise ValueError(density_activation)
    sigma = jnp.where(march.mask, sigma, 0.0)

    alpha = 1.0 - jnp.exp(-sigma * march.dt)
    trans = jnp.concatenate(
        [
            jnp.ones_like(alpha[..., :1]),
            jnp.cumprod(1.0 - alpha[..., :-1] + 1e-10, axis=-1),
        ],
        axis=-1,
    )
    weights = alpha * trans
    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
    acc = jnp.sum(weights, axis=-1)
    depth = jnp.sum(weights * march.z_vals, axis=-1)
    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc[..., None])
    return {"rgb": rgb_map, "acc": acc, "depth": depth, "weights": weights}

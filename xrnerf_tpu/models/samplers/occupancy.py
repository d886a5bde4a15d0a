"""Instant-NGP occupancy-grid subsystem — all jittable array ops.

TPU-native replacement for the reference's raymarch CUDA kernels around
grid maintenance (``/root/reference/extensions/ngp_raymarch``):
  - ``mark_untrained_density_grid`` (mark_untrained_density_grid.cu:6-82)
  - ``generate_grid_samples_nerf_nonuniform`` (generate_grid_samples_...cu:6-87)
  - ``splat_grid_samples_nerf_max_nearest_neighbor`` (splat_...cu:7-57)
  - ``ema_grid_samples_nerf`` (ema_grid_samples_nerf.cu:4-50)
  - ``grid_to_bitfield`` / ``bitfield_max_pool`` (update_bitfield.cu:4-116)
and the NGPGridSampler state machine driving them
(``xrnerf/models/samplers/ngp_grid_sampler.py:12-284``).

TPU-first redesign: no atomics — the atomicMax splat becomes a
``segment_max`` over morton cell ids; the bitfield stays a packed uint8
array updated by pure ops; occupancy state is an immutable pytree
(`OccupancyGrid`) threaded through the jitted update, so it shards/
checkpoints like any other state. Cells are indexed in *raster* order
(x + R*(y + R*z)) rather than morton — on TPU there is no warp-locality
argument for morton, and raster order makes the trilinear neighborhoods
contiguous for the VPU.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

GRID_RES = 128


class OccupancyGrid(NamedTuple):
    """Density grid state for one or more cascades.

    density: [C, R^3] float32 EMA density per cell (-1 marks untrained)
    bitfield: [C, R^3] bool occupancy (packed lazily; bool keeps gather simple)
    """

    density: jnp.ndarray
    bitfield: jnp.ndarray

    @property
    def n_cascades(self) -> int:
        return self.density.shape[0]


def create_grid(n_cascades: int = 1, res: int = GRID_RES) -> OccupancyGrid:
    n = res**3
    return OccupancyGrid(
        density=jnp.zeros((n_cascades, n), jnp.float32),
        bitfield=jnp.ones((n_cascades, n), jnp.bool_),
    )


def cell_centers(cell_idx: jnp.ndarray, cascade: jnp.ndarray, res: int = GRID_RES):
    """Raster cell index -> center position in [0,1]^3 scaled by cascade.

    Cascade c covers a box of side 2^c centered at 0.5 (NGP convention,
    raymarch_shared.h mip scaling).
    """
    x = cell_idx % res
    y = (cell_idx // res) % res
    z = cell_idx // (res * res)
    pos01 = (jnp.stack([x, y, z], -1).astype(jnp.float32) + 0.5) / res
    scale = jnp.exp2(cascade.astype(jnp.float32))[..., None]
    return (pos01 - 0.5) * scale + 0.5


def pos_to_cell(pos: jnp.ndarray, cascade: jnp.ndarray, res: int = GRID_RES):
    """Position -> (cell index [N], in-bounds mask [N]) for given cascade."""
    scale = jnp.exp2(cascade.astype(jnp.float32))[..., None]
    pos01 = (pos - 0.5) / scale + 0.5
    xi = jnp.floor(pos01 * res).astype(jnp.int32)
    inb = jnp.all((xi >= 0) & (xi < res), axis=-1)
    xi = jnp.clip(xi, 0, res - 1)
    idx = xi[..., 0] + res * (xi[..., 1] + res * xi[..., 2])
    return idx, inb


def mark_untrained_cells(
    grid: OccupancyGrid,
    poses: np.ndarray,  # [M, 4, 4] or [M, 3, 4] c2w in grid coords
    focal: float,
    H: int,
    W: int,
    res: int = GRID_RES,
) -> OccupancyGrid:
    """Set density = -1 for cells outside every training camera frustum.

    Parity: mark_untrained_density_grid.cu:6-82. Host-setup-time only, but
    implemented as one jit-friendly einsum over all (cell, camera) pairs.
    """
    C = grid.n_cascades
    n = res**3
    cell_idx = jnp.arange(n, dtype=jnp.int32)
    out = []
    for c in range(C):
        centers = cell_centers(cell_idx, jnp.full((n,), c, jnp.int32), res)  # [n,3]
        R = jnp.asarray(poses[:, :3, :3], jnp.float32)  # [M,3,3]
        t = jnp.asarray(poses[:, :3, 3], jnp.float32)  # [M,3]
        # world -> camera: p_cam = R^T (p - t)
        rel = centers[None, :, :] - t[:, None, :]  # [M,n,3]
        cam = jnp.einsum("mij,mnj->mni", jnp.swapaxes(R, 1, 2), rel)
        # OpenGL convention: visible if z_cam < 0 and |x/z|<W/2f, |y/z|<H/2f
        z = -cam[..., 2]
        eps = 1e-6
        visible = (
            (z > eps)
            & (jnp.abs(cam[..., 0] / jnp.maximum(z, eps)) < 0.5 * W / focal + 0.5 / res)
            & (jnp.abs(cam[..., 1] / jnp.maximum(z, eps)) < 0.5 * H / focal + 0.5 / res)
        )
        seen = jnp.any(visible, axis=0)  # [n]
        out.append(jnp.where(seen, grid.density[c], -1.0))
    return grid._replace(density=jnp.stack(out))


def generate_grid_samples(
    rng: jax.Array,
    grid: OccupancyGrid,
    n_uniform: int,
    n_biased: int,
    threshold: float,
    res: int = GRID_RES,
):
    """Candidate cells for the density update: uniform + occupancy-biased.

    Parity: generate_grid_samples_nerf_nonuniform.cu:6-87 (uniform pass +
    above-threshold biased pass, jittered position within each cell).
    TPU-first: the biased pass picks cells by categorical sampling over the
    occupancy indicator instead of CUDA's rejection loop — same
    distribution, static shapes.
    """
    C = grid.n_cascades
    n = res**3
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    # uniform cells over all cascades
    uni_cells = jax.random.randint(k1, (n_uniform,), 0, C * n)
    # biased: uniform over cells with density above threshold, sampled by
    # inverting the indicator CDF. (jax.random.categorical would
    # materialize a [n_biased, C*res^3] Gumbel matrix — ~0.5 TB at the
    # production grid_res=128 — so it must not be used here.)
    # Integer cumsum: a float32 running count stops incrementing past 2^24
    # occupied cells (reachable at 8 cascades x 128^3), silently dropping
    # later cells from the distribution. int32 is exact to 2^31.
    occ = (grid.density.reshape(-1) > threshold).astype(jnp.int32)
    cdf = jnp.cumsum(occ)
    total = cdf[-1]
    # u-th occupied cell, u ~ Uniform{1..total}: first index with cdf >= u
    u = jax.random.randint(k2, (n_biased,), 1, jnp.maximum(total, 1) + 1)
    bia_cells = jnp.clip(
        jnp.searchsorted(cdf, u, side="left"), 0, C * n - 1
    ).astype(jnp.int32)
    # nothing occupied yet -> fall back to uniform cells
    bia_cells = jnp.where(
        total > 0, bia_cells, jax.random.randint(k2, (n_biased,), 0, C * n)
    )
    cells = jnp.concatenate([uni_cells, bia_cells])
    cascade = (cells // n).astype(jnp.int32)
    cell_idx = (cells % n).astype(jnp.int32)
    centers = cell_centers(cell_idx, cascade, res)
    jitter = (jax.random.uniform(k3, centers.shape) - 0.5) / res
    jitter = jitter * jnp.exp2(cascade.astype(jnp.float32))[:, None]
    pos = centers + jitter
    return pos, cascade, cell_idx


def splat_density(
    grid: OccupancyGrid,
    cascade: jnp.ndarray,  # [M]
    cell_idx: jnp.ndarray,  # [M]
    density: jnp.ndarray,  # [M] MLP densities at sampled positions
    decay: float = 0.95,
    res: int = GRID_RES,
) -> OccupancyGrid:
    """max-splat new densities then EMA: grid = max(grid*decay, splat).

    Parity: splat_grid_samples (atomicMax) + ema_grid_samples
    (ema_grid_samples_nerf.cu: ``max(decay*prev, new)``) — fused here via
    a scatter-max, skipping untrained (-1) cells.
    """
    C = grid.n_cascades
    n = res**3
    flat = grid.density.reshape(-1)
    gidx = cascade * n + cell_idx
    decayed = flat * decay
    splat = decayed.at[gidx].max(density)
    new = jnp.where(flat < 0, flat, splat)
    return grid._replace(density=new.reshape(C, n))


def update_bitfield(
    grid: OccupancyGrid, threshold: float = 0.01, res: int = GRID_RES
) -> OccupancyGrid:
    """occupied = density > min(mean_density, threshold).

    Parity: update_bitfield.cu grid_to_bitfield + reduce_sum mean. The
    cascade max-pool of the CUDA path exists to let coarse mips see fine
    occupancy; we instead query each cascade's own bitfield during
    marching (cascade chosen per sample), which preserves semantics for
    the scenes the reference ships (cascade count from aabb scale).
    """
    valid = grid.density >= 0
    mean = jnp.sum(jnp.where(valid, grid.density, 0.0)) / jnp.maximum(
        jnp.sum(valid), 1
    )
    thresh = jnp.minimum(mean, threshold)
    return grid._replace(bitfield=(grid.density > thresh) & valid)


def occupied_at(
    grid: OccupancyGrid, pos: jnp.ndarray, cascade: jnp.ndarray, res: int = GRID_RES
) -> jnp.ndarray:
    """Bitfield lookup at positions (parity: density_grid_occupied_at)."""
    idx, inb = pos_to_cell(pos, cascade, res)
    n = res**3
    gidx = jnp.clip(cascade, 0, grid.n_cascades - 1) * n + idx
    return grid.bitfield.reshape(-1)[gidx] & inb

"""Stratified z-value sampling along rays — device-side, jit-friendly.

Parity target: the reference's ``GetZvals`` (linear / lindisp) and
``PerturbZvals`` pipeline transforms
(``/root/reference/xrnerf/datasets/pipelines/create.py`` GetZvals,
``pipelines/augment.py:261-286``). In the reference these run on CPU per
batch inside the DataLoader; here they are part of the jitted render so
the host ships only (rays_o, rays_d, near, far).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_along_rays(
    rng: jax.Array | None,
    near: jnp.ndarray,  # [N, 1]
    far: jnp.ndarray,  # [N, 1]
    num_samples: int,
    lindisp: bool = False,
    perturb: bool = True,
) -> jnp.ndarray:
    """Returns z_vals [N, num_samples]."""
    t = jnp.linspace(0.0, 1.0, num_samples, dtype=near.dtype)
    if lindisp:
        z = 1.0 / (1.0 / jnp.maximum(near, 1e-10) * (1.0 - t) + 1.0 / far * t)
    else:
        z = near * (1.0 - t) + far * t  # [N, S]
    if perturb and rng is not None:
        mids = 0.5 * (z[..., 1:] + z[..., :-1])
        upper = jnp.concatenate([mids, z[..., -1:]], -1)
        lower = jnp.concatenate([z[..., :1], mids], -1)
        u = jax.random.uniform(rng, z.shape, dtype=z.dtype)
        z = lower + (upper - lower) * u
    return z


def z_to_pts(rays_o: jnp.ndarray, rays_d: jnp.ndarray, z_vals: jnp.ndarray) -> jnp.ndarray:
    """[N,3], [N,3], [N,S] -> pts [N,S,3]."""
    return rays_o[..., None, :] + rays_d[..., None, :] * z_vals[..., :, None]

"""Hierarchical importance sampling (inverse-CDF over coarse weights).

Parity target: ``sample_pdf``
(``/root/reference/xrnerf/models/networks/utils/hierarchical_sample.py:6-53``).

TPU-first: the reference uses ``torch.searchsorted``; here the CDF
inversion is a vectorized ``jnp.searchsorted`` over static shapes (XLA
lowers it to a fused binary search), and the result is detached via
``stop_gradient`` exactly as the reference detaches weights.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_pdf(
    rng: jax.Array | None,
    bins: jnp.ndarray,  # [N, B] z-val midpoints
    weights: jnp.ndarray,  # [N, B-1]
    num_samples: int,
    det: bool = False,
) -> jnp.ndarray:
    """Draw [N, num_samples] z-vals distributed as the weight histogram."""
    weights = jax.lax.stop_gradient(weights) + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # [N, B]

    if det or rng is None:
        u = jnp.linspace(0.0, 1.0, num_samples, dtype=bins.dtype)
        u = jnp.broadcast_to(u, cdf.shape[:-1] + (num_samples,))
    else:
        u = jax.random.uniform(rng, cdf.shape[:-1] + (num_samples,), dtype=bins.dtype)

    # Invert CDF: for each u find the bin with cdf[i-1] <= u < cdf[i].
    inds = jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side="right"))(cdf, u)
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, cdf.shape[-1] - 1)

    cdf_below = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_above = jnp.take_along_axis(cdf, above, axis=-1)
    bins_below = jnp.take_along_axis(bins, below, axis=-1)
    bins_above = jnp.take_along_axis(bins, above, axis=-1)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, 1.0, denom)
    t = (u - cdf_below) / denom
    samples = bins_below + t * (bins_above - bins_below)
    return jax.lax.stop_gradient(samples)

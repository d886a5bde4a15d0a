"""Image/quality metrics in pure jnp (jit-friendly, TPU-resident).

Covers the reference's metric set: ``img2mse``/``mse2psnr``/``to8b``
(``/root/reference/xrnerf/core/hooks/utils.py:5-28``), Huber loss
(``xrnerf/models/networks/utils/metrics.py``) and SSIM
(skimage ``calculate_ssim`` / GNR's ``ssim_`` in
``xrnerf/models/networks/utils/gnr.py:122-186``). Unlike the reference we
keep everything device-side so eval never forces host sync mid-loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def img2mse(pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray | None = None) -> jnp.ndarray:
    err = (pred - target) ** 2
    if mask is not None:
        denom = jnp.maximum(jnp.sum(mask), 1.0) * err.shape[-1]
        return jnp.sum(err * mask[..., None]) / denom
    return jnp.mean(err)


def mse2psnr(mse: jnp.ndarray) -> jnp.ndarray:
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-10))


def psnr(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return mse2psnr(img2mse(pred, target))


def to8b(x: np.ndarray) -> np.ndarray:
    """float [0,1] image -> uint8 (host-side, for png/mp4 dumps)."""
    return (255 * np.clip(np.asarray(x), 0.0, 1.0)).astype(np.uint8)


def huber(pred: jnp.ndarray, target: jnp.ndarray, delta: float = 0.1) -> jnp.ndarray:
    """Mean Huber loss; matches the reference's HuberLoss used by Instant-NGP."""
    err = pred - target
    abs_err = jnp.abs(err)
    quad = jnp.minimum(abs_err, delta)
    return jnp.mean(0.5 * quad**2 + delta * (abs_err - quad))


def _ssim_components(
    img0: jnp.ndarray,
    img1: jnp.ndarray,
    max_val: float,
    filter_size: int,
    filter_sigma: float,
    k1: float,
    k2: float,
):
    """Gaussian-windowed SSIM map over an [H, W, C] image pair."""
    hw = filter_size // 2
    shift = jnp.arange(-hw, hw + 1, dtype=jnp.float32)
    f = jnp.exp(-0.5 * (shift / filter_sigma) ** 2)
    f = f / jnp.sum(f)

    def blur(z):
        # separable conv over H then W, channelwise; 'valid' like mipnerf's jax SSIM
        z = jnp.moveaxis(z, -1, 0)  # [C,H,W]
        z = jax.vmap(
            lambda im: jax.scipy.signal.convolve2d(im, f[:, None] * f[None, :], mode="valid")
        )(z)
        return jnp.moveaxis(z, 0, -1)

    mu0 = blur(img0)
    mu1 = blur(img1)
    mu00, mu11, mu01 = mu0 * mu0, mu1 * mu1, mu0 * mu1
    sigma00 = blur(img0 * img0) - mu00
    sigma11 = blur(img1 * img1) - mu11
    sigma01 = blur(img0 * img1) - mu01
    # Clip to keep numerics sane (matches the jax mipnerf ssim convention).
    sigma00 = jnp.maximum(0.0, sigma00)
    sigma11 = jnp.maximum(0.0, sigma11)
    sigma01 = jnp.sign(sigma01) * jnp.minimum(jnp.sqrt(sigma00 * sigma11), jnp.abs(sigma01))
    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    numer = (2 * mu01 + c1) * (2 * sigma01 + c2)
    denom = (mu00 + mu11 + c1) * (sigma00 + sigma11 + c2)
    return numer / denom


def ssim(
    img0: jnp.ndarray,
    img1: jnp.ndarray,
    max_val: float = 1.0,
    filter_size: int = 11,
    filter_sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jnp.ndarray:
    """Scalar SSIM between two [H, W, C] images in [0, max_val]."""
    return jnp.mean(
        _ssim_components(img0, img1, max_val, filter_size, filter_sigma, k1, k2)
    )

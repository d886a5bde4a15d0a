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


class LPIPS:
    """Learned perceptual metric (GNR evaluation; reference:
    ``xrnerf/models/networks/utils/gnr.py:66-120`` wraps lpips.LPIPS).

    This environment has no torchvision/pretrained VGG and no network
    egress, so construction requires an explicit ``weights_path`` to a
    torch state dict holding ``vgg16.features`` conv weights (and
    optionally per-layer ``lin{i}.weight`` LPIPS calibrations). Without
    weights the class raises at init — callers gate on availability.
    """

    _SLICES = ((0, 4), (4, 9), (9, 16), (16, 23), (23, 30))

    def __init__(self, weights_path: str):
        import torch

        self._torch = torch
        sd = torch.load(weights_path, map_location="cpu")
        self.convs = {k: v.float() for k, v in sd.items() if k.endswith("weight") and v.ndim == 4}
        self.biases = {k: v.float() for k, v in sd.items() if k.endswith("bias")}
        self.lins = {k: v.float() for k, v in sd.items() if "lin" in k}
        if not self.convs:
            raise ValueError(f"no conv weights found in {weights_path}")

    def __call__(self, pred: np.ndarray, target: np.ndarray) -> float:
        """pred/target [H, W, 3] in [0,1] -> scalar LPIPS distance."""
        torch = self._torch
        mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
        std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)

        import re

        def _key_num(k):
            m = re.search(r"(\d+)", k)
            return int(m.group(1)) if m else 0

        # VGG16 features: 2/2/3/3/3 convs per LPIPS slice
        slice_ends = (2, 4, 7, 10, 13)

        def feats(img):
            x = torch.from_numpy(np.ascontiguousarray(img)).float()
            x = x.permute(2, 0, 1)[None]
            x = (x - mean) / std
            outs = []
            conv_items = sorted(self.convs.items(), key=lambda kv: _key_num(kv[0]))
            ci = 0
            with torch.no_grad():
                for end in slice_ends:
                    while ci < min(end, len(conv_items)):
                        k, w = conv_items[ci]
                        b = self.biases.get(k.replace("weight", "bias"))
                        x = torch.nn.functional.conv2d(x, w, b, padding=1)
                        x = torch.relu(x)
                        ci += 1
                    outs.append(x / (x.norm(dim=1, keepdim=True) + 1e-10))
                    x = torch.nn.functional.max_pool2d(x, 2)
            return outs

        fa, fb = feats(pred), feats(target)
        d = 0.0
        for i, (a, b) in enumerate(zip(fa, fb)):
            diff = (a - b) ** 2
            lin = self.lins.get(f"lin{i}.weight")
            if lin is not None:
                diff = diff * lin.view(1, -1, 1, 1).abs()
                d += float(diff.sum(dim=1).mean())
            else:
                d += float(diff.mean())
        return d

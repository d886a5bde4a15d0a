"""GNR image encoders + coordinate/direction embedders.

Parity targets (``/root/reference/xrnerf/models/embedders/gnr_embedder.py``):
  - ``ConvBlock`` (:26-80): residual block concatenating out/2+out/4+out/4
    channel branches
  - ``HourGlass`` (:210-272): recursive pool-down / upsample-add pyramid
  - ``HGFilter`` (:275-387): PIFu stacked-hourglass image encoder
  - ``SRFilters`` (:181-207): pixel-aligned feature upsampler
  - ``PositionalEncoding`` (:83-131): linear-frequency-band Fourier
    features (freq bands scale with GNR's spatial_freq)
  - ``SphericalHarmonics`` (:134-177): real SH via Legendre recurrence

TPU-first: NHWC layout throughout (XLA's native conv layout on TPU), group
norm instead of batch norm (the reference supports both and GNR's MLP
config disables BN; group norm avoids cross-chunk batch statistics inside
jit), and ``jax.image.resize`` bilinear/cubic for the up-sampling paths.
"""

from __future__ import annotations

import math
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...registry import EMBEDDERS


def _norm(name: str, norm: str = "group"):
    if norm == "group":
        return nn.GroupNorm(num_groups=32, name=name)
    return nn.BatchNorm(use_running_average=True, name=name)


class ConvBlock(nn.Module):
    """Residual conv block: 3x3 convs at C/2, C/4, C/4 concatenated."""

    out_ch: int
    norm: str = "group"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.out_ch
        in_ch = x.shape[-1]
        h1 = nn.Conv(c // 2, (3, 3), use_bias=False, dtype=self.dtype, name="conv1")(
            nn.relu(_norm("bn1", self.norm)(x))
        )
        h2 = nn.Conv(c // 4, (3, 3), use_bias=False, dtype=self.dtype, name="conv2")(
            nn.relu(_norm("bn2", self.norm)(h1))
        )
        h3 = nn.Conv(c // 4, (3, 3), use_bias=False, dtype=self.dtype, name="conv3")(
            nn.relu(_norm("bn3", self.norm)(h2))
        )
        out = jnp.concatenate([h1, h2, h3], -1)
        if in_ch != c:
            x = nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype, name="down")(
                nn.relu(_norm("bn4", self.norm)(x))
            )
        return out + x


def _resize2x(x: jnp.ndarray, method: str = "cubic") -> jnp.ndarray:
    h, w = x.shape[-3], x.shape[-2]
    return jax.image.resize(x, x.shape[:-3] + (h * 2, w * 2, x.shape[-1]), method)


class HourGlass(nn.Module):
    """Recursive hourglass: pool -> recurse -> upsample-add skip."""

    depth: int
    features: int
    norm: str = "group"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        def level(inp, lv):
            up1 = ConvBlock(self.features, self.norm, self.dtype, name=f"b1_{lv}")(inp)
            low = nn.avg_pool(inp, (2, 2), (2, 2))
            low = ConvBlock(self.features, self.norm, self.dtype, name=f"b2_{lv}")(low)
            if lv > 1:
                low = level(low, lv - 1)
            else:
                low = ConvBlock(
                    self.features, self.norm, self.dtype, name=f"b2_plus_{lv}"
                )(low)
            low = ConvBlock(self.features, self.norm, self.dtype, name=f"b3_{lv}")(low)
            return up1 + _resize2x(low)

        return level(x, self.depth)


@EMBEDDERS.register
class HGFilter(nn.Module):
    """Stacked-hourglass image encoder -> [V, H/4, W/4, hourglass_dim]."""

    num_stack: int = 4
    num_hourglass: int = 2
    hourglass_dim: int = 256
    norm: str = "group"
    hg_down: str = "ave_pool"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images):  # [V, H, W, 3]
        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=3, dtype=self.dtype, name="conv1"
        )(images)
        x = nn.relu(_norm("bn1", self.norm)(x))

        if self.hg_down == "ave_pool":
            x = ConvBlock(128, self.norm, self.dtype, name="conv2")(x)
            x = nn.avg_pool(x, (2, 2), (2, 2))
        elif self.hg_down in ("conv64", "conv128"):
            c = 64 if self.hg_down == "conv64" else 128
            x = ConvBlock(c, self.norm, self.dtype, name="conv2")(x)
            x = nn.Conv(
                128, (3, 3), strides=(2, 2), dtype=self.dtype, name="down_conv2"
            )(x)
        else:
            raise ValueError(f"unknown hg_down {self.hg_down!r}")

        x = ConvBlock(128, self.norm, self.dtype, name="conv3")(x)
        x = ConvBlock(256, self.norm, self.dtype, name="conv4")(x)

        previous = x
        tmp_out = None
        for i in range(self.num_stack):
            hg = HourGlass(self.num_hourglass, 256, self.norm, self.dtype, name=f"m{i}")(
                previous
            )
            ll = ConvBlock(256, self.norm, self.dtype, name=f"top_m_{i}")(hg)
            ll = nn.relu(
                _norm(f"bn_end{i}", self.norm)(
                    nn.Conv(256, (1, 1), dtype=self.dtype, name=f"conv_last{i}")(ll)
                )
            )
            tmp_out = nn.Conv(
                self.hourglass_dim, (1, 1), dtype=self.dtype, name=f"l{i}"
            )(ll)
            if i < self.num_stack - 1:
                ll = nn.Conv(256, (1, 1), dtype=self.dtype, name=f"bl{i}")(ll)
                tmp_out_ = nn.Conv(256, (1, 1), dtype=self.dtype, name=f"al{i}")(
                    tmp_out
                )
                previous = previous + ll + tmp_out_
        return tmp_out


@EMBEDDERS.register
class SRFilters(nn.Module):
    """Feature super-resolution: upsample 2x per order, fusing the image."""

    order: int = 2
    out_ch: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat, images):  # feat [V,h,w,C], images [V,H,W,3]
        factors = [0.5 ** (self.order - i) for i in range(self.order + 1)]
        for i, f in enumerate(factors):
            if f != 1:
                tgt = (
                    images.shape[0],
                    int(images.shape[1] * f),
                    int(images.shape[2] * f),
                    images.shape[3],
                )
                im = jax.image.resize(images, tgt, "cubic")
            else:
                im = images
            if i != 0:
                feat = _resize2x(feat)
            feat = jnp.concatenate([feat, im], -1)
            feat = nn.Conv(self.out_ch, (3, 3), dtype=self.dtype, name=f"conv{i}")(feat)
        return feat


# ---------------------------------------------------------------------------
# Coordinate / direction embedders (stateless)
# ---------------------------------------------------------------------------
def gnr_posenc_freqs(
    num_freqs: int,
    min_freq: float | None = None,
    max_freq: float | None = None,
) -> np.ndarray:
    """Linear frequency bands in [min*2pi, max*2pi] (PositionalEncoding
    'linear' freq_type; GNR scales them by spatial_freq*0.1 .. *10)."""
    lo = 0.0 if min_freq is None else min_freq
    hi = float(2 ** (num_freqs - 1)) if max_freq is None else max_freq
    return np.linspace(lo * 2 * math.pi, hi * 2 * math.pi, num_freqs).astype(
        np.float32
    )


def gnr_posenc(x: jnp.ndarray, freqs: Sequence[float]) -> jnp.ndarray:
    """[..., d] -> [..., d*(1+2F)]: identity + sin/cos per band."""
    fb = jnp.asarray(freqs)
    xb = x[..., None, :] * fb[:, None]  # [..., F, d]
    enc = jnp.concatenate([jnp.sin(xb), jnp.cos(xb)], -1)
    return jnp.concatenate([x, enc.reshape(*x.shape[:-1], -1)], -1)


def gnr_posenc_dim(d: int, num_freqs: int) -> int:
    return d * (1 + 2 * num_freqs)


def spherical_harmonics(xyz: jnp.ndarray, rank: int = 3) -> jnp.ndarray:
    """Real SH basis at unit dirs via the Legendre recurrence
    (SphericalHarmonics.SH, gnr_embedder.py:153-175) -> [..., rank^2]."""
    cs = xyz[..., 0:1]
    sn = xyz[..., 1:2]
    z = xyz[..., 2:3]
    omx = cs * cs + sn * sn

    # associated Legendre P_l^m(z) stored at index l(l+1)/2 + m
    Fml = [None] * ((rank + 1) * rank // 2)
    Fml[0] = jnp.ones_like(z)
    for l in range(1, rank):
        b = (l * l + l) // 2
        Fml[b + l] = -Fml[b - 1] * (2 * l - 1)
        Fml[b + l - 1] = Fml[b - 1] * (2 * l - 1) * z
        for m in range(l, 1, -1):
            Fml[b + m - 2] = -(
                omx * Fml[b + m] + 2 * (m - 1) * z * Fml[b + m - 1]
            ) / ((l - m + 2) * (l + m - 1))

    H = [None] * (rank * rank)
    for l in range(rank):
        b = l * l + l
        attr = np.sqrt((2 * l + 1) / math.pi / 4)
        H[b] = attr * Fml[b // 2]
        attr = attr * np.sqrt(2)
        snM, csM = sn, cs
        for m in range(1, l + 1):
            attr = -attr / np.sqrt((l + m) * (l + 1 - m))
            H[b - m] = attr * Fml[b // 2 + m] * snM
            H[b + m] = attr * Fml[b // 2 - m] * csM
            snM, csM = snM * cs + csM * sn, csM * cs - snM * sn
    return jnp.concatenate(H, -1)


def sh_dim(rank: int = 3, d: int = 3) -> int:
    return rank * rank * (d // 3)

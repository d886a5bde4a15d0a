"""Instant-NGP field: hash encoding + fused tiny MLPs (flax).

Replaces the reference's tcnn stack (``HashNerfMLP``,
``/root/reference/xrnerf/models/mlps/hashnerf_mlp.py:24-111``): HashGrid
16x2 @ 2^19 -> density FullyFusedMLP (64 wide, 1 hidden, 16 out) and
SH(deg 4) + geo features -> color FullyFusedMLP (64 wide, 2 hidden, 3 out).

TPU note: "fully fused" on TPU means letting XLA keep the whole
hash-gather -> 64-wide matmul chain in one fusion; 64-wide matmuls pad to
the 128 MXU lane dim, so we default to bf16 compute (halves the pad
waste) with fp32 params and fp32 outputs.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..embedders.hashenc import HashEncoding
from ..embedders.sh import sh_encode


class NGPField(nn.Module):
    n_levels: int = 16
    n_features: int = 2
    log2_table_size: int = 19
    base_res: int = 16
    max_res: int = 2048
    hidden_dim: int = 64
    geo_feat_dim: int = 15
    sh_degree: int = 4
    dtype: Any = jnp.bfloat16

    def setup(self):
        self.encoding = HashEncoding(
            n_levels=self.n_levels,
            n_features=self.n_features,
            log2_table_size=self.log2_table_size,
            base_res=self.base_res,
            max_res=self.max_res,
            dtype=self.dtype,
        )
        self.density_net = nn.Sequential(
            [
                nn.Dense(self.hidden_dim, dtype=self.dtype),
                nn.relu,
                nn.Dense(1 + self.geo_feat_dim, dtype=self.dtype),
            ]
        )
        self.color_net = nn.Sequential(
            [
                nn.Dense(self.hidden_dim, dtype=self.dtype),
                nn.relu,
                nn.Dense(self.hidden_dim, dtype=self.dtype),
                nn.relu,
                nn.Dense(3, dtype=self.dtype),
            ]
        )

    def density(self, pts: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """pts [..., 3] in [0,1]^3 -> (raw_sigma [...], geo_feat [..., G])."""
        h = self.density_net(self.encoding(pts))
        return h[..., 0].astype(jnp.float32), h[..., 1:]

    def __call__(self, pts: jnp.ndarray, dirs: jnp.ndarray):
        """pts [..., 3], unit dirs [..., 3] -> (raw_rgb [..., 3], raw_sigma)."""
        raw_sigma, geo = self.density(pts)
        sh = sh_encode(dirs, self.sh_degree).astype(self.dtype)
        raw_rgb = self.color_net(jnp.concatenate([geo, sh], axis=-1))
        return raw_rgb.astype(jnp.float32), raw_sigma

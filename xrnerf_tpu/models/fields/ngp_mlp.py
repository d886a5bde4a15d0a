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

from ..embedders.hashenc import BrickHashEncoding, HashEncoding
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
    use_pallas: bool = False  # fused Pallas MLP kernels (ops/pallas/fused_mlp)
    # 'vertex' = exact tcnn interpolation semantics (default; quality
    # parity). 'brick' = one row-gather per point per level with a Pallas
    # VMEM scatter backward: ~29x faster training on TPU, but trilerp is
    # discontinuous at cell faces and collisions tie whole cells — a
    # measured ~2-4 dB val-PSNR cost at toy scale (docs/benchmark.md).
    # n_lattices=2 staggers two half-cell-offset brick lattices to
    # decorrelate collisions and halve the jumps at 2 gathers/pt/level.
    hash_layout: str = "vertex"
    n_lattices: int = 1
    brick_blend: str = "mean"  # brick only: 'smooth' = face-bump cross-fade
    dtype: Any = jnp.bfloat16

    def setup(self):
        kw = {}
        if self.hash_layout == "brick":
            enc_cls = BrickHashEncoding
            kw["n_lattices"] = self.n_lattices
            kw["blend"] = self.brick_blend
        else:
            enc_cls = HashEncoding
        self.encoding = enc_cls(
            n_levels=self.n_levels,
            n_features=self.n_features,
            log2_table_size=self.log2_table_size,
            base_res=self.base_res,
            max_res=self.max_res,
            dtype=self.dtype,
            **kw,
        )
        if self.use_pallas:
            init = nn.initializers.lecun_normal()
            enc_dim = self.n_levels * self.n_features
            sh_dim = self.sh_degree**2
            H, G = self.hidden_dim, self.geo_feat_dim
            mk = lambda name, shape: self.param(name, init, shape)  # noqa: E731
            zeros = nn.initializers.zeros
            self.d_w1 = mk("d_w1", (enc_dim, H))
            self.d_b1 = self.param("d_b1", zeros, (H,))
            self.d_w2 = mk("d_w2", (H, 1 + G))
            self.d_b2 = self.param("d_b2", zeros, (1 + G,))
            self.c_w1 = mk("c_w1", (G + sh_dim, H))
            self.c_b1 = self.param("c_b1", zeros, (H,))
            self.c_w2 = mk("c_w2", (H, H))
            self.c_b2 = self.param("c_b2", zeros, (H,))
            self.c_w3 = mk("c_w3", (H, 3))
            self.c_b3 = self.param("c_b3", zeros, (3,))
        else:
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
        enc = self.encoding(pts)
        if self.use_pallas:
            from ...ops.pallas.fused_mlp import fused_mlp2

            lead = enc.shape[:-1]
            h = fused_mlp2(
                enc.reshape(-1, enc.shape[-1]).astype(jnp.float32),
                self.d_w1, self.d_b1, self.d_w2, self.d_b2,
            ).reshape(*lead, 1 + self.geo_feat_dim)
        else:
            h = self.density_net(enc)
        return h[..., 0].astype(jnp.float32), h[..., 1:]

    def __call__(self, pts: jnp.ndarray, dirs: jnp.ndarray):
        """pts [..., 3], unit dirs [..., 3] -> (raw_rgb [..., 3], raw_sigma)."""
        raw_sigma, geo = self.density(pts)
        sh = sh_encode(dirs, self.sh_degree).astype(self.dtype)
        cin = jnp.concatenate([geo.astype(self.dtype), sh], axis=-1)
        if self.use_pallas:
            from ...ops.pallas.fused_mlp import fused_mlp3

            lead = cin.shape[:-1]
            raw_rgb = fused_mlp3(
                cin.reshape(-1, cin.shape[-1]).astype(jnp.float32),
                self.c_w1, self.c_b1, self.c_w2, self.c_b2, self.c_w3, self.c_b3,
            ).reshape(*lead, 3)
        else:
            raw_rgb = self.color_net(cin)
        return raw_rgb.astype(jnp.float32), raw_sigma

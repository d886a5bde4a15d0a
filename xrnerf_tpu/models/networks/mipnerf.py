"""Mip-NeRF network: multi-level IPE rendering with one shared MLP.

Parity target: ``MipNerfNetwork``
(``/root/reference/xrnerf/models/networks/mipnerf.py:15-117``): num_levels
loop of sample/resample → IPE → shared MLP → mip compositing; masked
multiscale loss with per-ray ``lossmult`` and ``coarse_loss_mult``.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ...registry import NETWORKS
from ...utils.metrics import mse2psnr
from ..embedders.mip import (
    integrated_pos_enc,
    pos_enc,
    resample_along_rays,
    sample_along_rays_mip,
)
from ..fields.nerf_mlp import NerfMLP
from ..renders.volume import mip_volume_render
from .base import BaseNetwork


@NETWORKS.register
class MipNerfNetwork(BaseNetwork):
    num_levels: int = 2
    n_samples: int = 128
    min_deg_point: int = 0
    max_deg_point: int = 16
    deg_view: int = 4
    netdepth: int = 8
    netwidth: int = 256
    use_viewdirs: bool = True
    white_bkgd: bool = True
    lindisp: bool = False
    ray_shape: str = "cone"
    stop_level_grad: bool = True
    resample_padding: float = 0.01
    rgb_padding: float = 0.001
    density_bias: float = -1.0
    density_noise: float = 0.0
    coarse_loss_mult: float = 0.1
    dtype: Any = jnp.float32

    def setup(self):
        # ONE MLP shared across levels (key difference from vanilla NeRF)
        self.mlp = NerfMLP(
            netdepth=self.netdepth,
            netwidth=self.netwidth,
            use_viewdirs=self.use_viewdirs,
            dtype=self.dtype,
        )

    def __call__(
        self,
        batch: Dict[str, jnp.ndarray],
        rng: Optional[jax.Array] = None,
        train: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        rays_o, rays_d = batch["rays_o"], batch["rays_d"]
        near, far = batch["near"], batch["far"]
        radii = batch.get("radii")
        if radii is None:
            radii = jnp.full_like(near, 1e-3)
        viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
        randomized = train

        keys = (
            list(jax.random.split(rng, 2 * self.num_levels))
            if rng is not None
            else [None] * (2 * self.num_levels)
        )

        levels: List[Dict[str, jnp.ndarray]] = []
        t_vals, weights = None, None
        for lvl in range(self.num_levels):
            k_samp, k_noise = keys[2 * lvl], keys[2 * lvl + 1]
            if lvl == 0:
                t_vals, (means, covs) = sample_along_rays_mip(
                    k_samp, rays_o, rays_d, radii, self.n_samples,
                    near, far, randomized, self.lindisp, self.ray_shape,
                )
            else:
                t_vals, (means, covs) = resample_along_rays(
                    k_samp, rays_o, rays_d, radii, t_vals, weights,
                    randomized, self.ray_shape, self.stop_level_grad,
                    self.resample_padding,
                )
            n, s, _ = means.shape
            enc = integrated_pos_enc(
                (means.reshape(n * s, 3), covs.reshape(n * s, 3)),
                self.min_deg_point,
                self.max_deg_point,
            )
            views_enc = None
            if self.use_viewdirs:
                views_enc = pos_enc(viewdirs, 0, self.deg_view)
                views_enc = jnp.repeat(views_enc, s, axis=0)
            raw_rgb, raw_sigma = self.mlp(enc, views_enc)
            raw_sigma = raw_sigma.reshape(n, s)
            if train and self.density_noise > 0 and k_noise is not None:
                raw_sigma = raw_sigma + self.density_noise * jax.random.normal(
                    k_noise, raw_sigma.shape, raw_sigma.dtype
                )
            ret = mip_volume_render(
                raw_rgb.reshape(n, s, 3),
                raw_sigma,
                t_vals,
                rays_d,
                white_bkgd=self.white_bkgd,
                rgb_padding=self.rgb_padding,
                density_bias=self.density_bias,
            )
            weights = ret["weights"]
            levels.append(ret)

        out = {
            "rgb": levels[-1]["rgb"],
            "acc": levels[-1]["acc"],
            "distance": levels[-1]["distance"],
        }
        for i, lv in enumerate(levels[:-1]):
            out[f"level{i}_rgb"] = lv["rgb"]
        return out

    def loss(
        self, outputs: Dict[str, jnp.ndarray], batch: Dict[str, jnp.ndarray]
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        target = batch["target"]
        lossmult = batch.get("lossmult")
        if lossmult is None:
            lossmult = jnp.ones_like(target[..., :1])
        denom = jnp.maximum(jnp.sum(lossmult), 1e-8)

        def masked_mse(pred):
            return jnp.sum(lossmult * (pred - target) ** 2) / (denom * 3.0) * 1.0

        mse_fine = masked_mse(outputs["rgb"])
        loss = mse_fine
        log = {"mse": mse_fine, "psnr": mse2psnr(mse_fine)}
        lvl = 0
        while f"level{lvl}_rgb" in outputs:
            mse_c = masked_mse(outputs[f"level{lvl}_rgb"])
            loss = loss + self.coarse_loss_mult * mse_c
            log[f"level{lvl}_mse"] = mse_c
            lvl += 1
        log["loss"] = loss
        return loss, log

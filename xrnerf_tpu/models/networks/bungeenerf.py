"""BungeeNeRF: progressive multi-scale NeRF (city -> building zoom levels).

Parity target: ``BungeeNerfNetwork``
(``/root/reference/xrnerf/models/networks/bungeenerf.py:16-177``):
mip-style sampling + one importance resample, BungeeEmbedder IPE
(``embedders/bungee_embedder.py:9-106`` — variance term exp(-0.5 4^k cov)
attenuating high frequencies == diagonal IPE), per-stage residual MLP,
stage-cumulative compositing (``renders/bungeenerf_render.py:11-105``:
softplus density with bias -1, contributions summed over stages <= stage),
loss masked by ``scale_code <= stage`` (:72-96).

TPU-first: the progressive stage is DATA (a per-batch scalar driving
masks), not a runner-level python loop over differently-shaped models
(the reference's BungeeNerfTrainRunner, bungeenerf_runner.py:19-33) — one
compiled program serves the whole curriculum.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

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
from ..fields.bungee_mlp import BungeeNerfMLP
from .base import BaseNetwork


def _stage_composite(
    raw_rgb: jnp.ndarray,  # [N, S, stages, 3]
    raw_sigma: jnp.ndarray,  # [N, S, stages]
    stage_mask: jnp.ndarray,  # [stages] 0/1
    t_vals: jnp.ndarray,  # [N, S+1]
    rays_d: jnp.ndarray,
    white_bkgd: bool,
):
    """Sum per-stage contributions for stages <= current, then composite
    (bungeenerf_render.py semantics)."""
    rgb = jnp.sum(
        jax.nn.sigmoid(raw_rgb) * stage_mask[None, None, :, None], axis=-2
    ) / jnp.maximum(jnp.sum(stage_mask), 1.0)
    sigma = jnp.sum(
        jax.nn.softplus(raw_sigma - 1.0) * stage_mask[None, None, :], axis=-1
    )
    t_mids = 0.5 * (t_vals[..., :-1] + t_vals[..., 1:])
    delta = (t_vals[..., 1:] - t_vals[..., :-1]) * jnp.linalg.norm(
        rays_d, axis=-1, keepdims=True
    )
    dd = sigma * delta
    alpha = 1.0 - jnp.exp(-dd)
    trans = jnp.exp(
        -jnp.concatenate([jnp.zeros_like(dd[..., :1]), jnp.cumsum(dd[..., :-1], -1)], -1)
    )
    weights = alpha * trans
    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
    acc = jnp.sum(weights, -1)
    depth = jnp.sum(weights * t_mids, -1)
    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc[..., None])
    return {"rgb": rgb_map, "acc": acc, "depth": depth, "weights": weights}


@NETWORKS.register
class BungeeNerfNetwork(BaseNetwork):
    n_stages: int = 4
    n_samples: int = 64
    n_resample: int = 64
    min_deg_point: int = 0
    max_deg_point: int = 10
    deg_view: int = 4
    netwidth: int = 256
    white_bkgd: bool = False
    iters_per_stage: int = 50000
    coarse_loss_mult: float = 1.0
    dtype: Any = jnp.float32

    def setup(self):
        self.mlp = BungeeNerfMLP(
            n_stages=self.n_stages, netwidth=self.netwidth, dtype=self.dtype
        )

    def _run_level(self, t_vals, means_covs, viewdirs, stage_mask, rays_d):
        means, covs = means_covs
        n, s, _ = means.shape
        enc = integrated_pos_enc(
            (means.reshape(n * s, 3), covs.reshape(n * s, 3)),
            self.min_deg_point,
            self.max_deg_point,
        )
        venc = jnp.repeat(pos_enc(viewdirs, 0, self.deg_view), s, axis=0)
        raw_rgb, raw_sigma = self.mlp(enc, venc)
        raw_rgb = raw_rgb.reshape(n, s, self.n_stages, 3)
        raw_sigma = raw_sigma.reshape(n, s, self.n_stages)
        return _stage_composite(
            raw_rgb, raw_sigma, stage_mask, t_vals, rays_d, self.white_bkgd
        )

    def __call__(
        self,
        batch: Dict[str, jnp.ndarray],
        rng: Optional[jax.Array] = None,
        train: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        rays_o, rays_d = batch["rays_o"], batch["rays_d"]
        near, far = batch["near"], batch["far"]
        radii = batch.get("radii", jnp.full_like(near, 1e-3))
        stage = batch.get("stage", jnp.asarray(self.n_stages - 1))
        stage_mask = (
            jnp.arange(self.n_stages) <= jnp.asarray(stage)
        ).astype(jnp.float32)
        viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
        randomized = train

        k1, k2 = (
            jax.random.split(rng) if rng is not None else (None, None)
        )
        t_vals, mc = sample_along_rays_mip(
            k1, rays_o, rays_d, radii, self.n_samples, near, far, randomized, False
        )
        ret_c = self._run_level(t_vals, mc, viewdirs, stage_mask, rays_d)

        t2, mc2 = resample_along_rays(
            k2, rays_o, rays_d, radii, t_vals, ret_c["weights"], randomized
        )
        ret_f = self._run_level(t2, mc2, viewdirs, stage_mask, rays_d)

        return {
            "rgb": ret_f["rgb"],
            "acc": ret_f["acc"],
            "depth": ret_f["depth"],
            "coarse_rgb": ret_c["rgb"],
        }

    def loss(
        self, outputs: Dict[str, jnp.ndarray], batch: Dict[str, jnp.ndarray]
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        target = batch["target"]
        stage = batch.get("stage", jnp.asarray(self.n_stages - 1))
        scale_code = batch.get("scale_code", jnp.zeros_like(target[..., :1]))
        # train only rays whose scale is unlocked (bungeenerf.py:72-96)
        m = (scale_code[..., 0] <= stage).astype(jnp.float32)[..., None]
        denom = jnp.maximum(jnp.sum(m) * 3.0, 1.0)

        def masked_mse(pred):
            return jnp.sum(m * (pred - target) ** 2) / denom

        mse = masked_mse(outputs["rgb"])
        mse_c = masked_mse(outputs["coarse_rgb"])
        loss = mse + self.coarse_loss_mult * mse_c
        return loss, {
            "loss": loss,
            "mse": mse,
            "coarse_mse": mse_c,
            "psnr": mse2psnr(mse),
        }

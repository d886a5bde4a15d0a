"""NeuralBody network: SMPL latent-code volume -> NeRF head -> compositing.

Parity target: ``NeuralBodyNetwork``
(``/root/reference/xrnerf/models/networks/neuralbody.py:15-69``):
``smpl_conv`` (SparseConvNet embedder) -> ``nerf_mlp`` (NB_NeRFMLP) ->
NerfRender. Batch context (posed SMPL vertices, frame index, person
bounds) rides in replicated ``ctx_*`` keys; rays shard along the data
axis as usual.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ...registry import NETWORKS
from ...utils.metrics import img2mse, mse2psnr
from ..embedders.neuralbody import SmplEmbedder
from ..fields.nb_mlp import NBNerfMLP
from ..renders.volume import volume_render
from ..samplers.stratified import sample_along_rays, z_to_pts
from .base import BaseNetwork


@NETWORKS.register
class NeuralBodyNetwork(BaseNetwork):
    n_verts: int = 6890
    code_dim: int = 16
    grid_dims: Tuple[int, int, int] = (96, 96, 96)
    conv_widths: Tuple[int, ...] = (32, 32, 32, 32)
    num_frames: int = 1000
    appearance_dim: int = 128
    hidden: int = 256
    n_samples: int = 64
    white_bkgd: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        self.embedder = SmplEmbedder(
            n_verts=self.n_verts,
            code_dim=self.code_dim,
            grid_dims=self.grid_dims,
            widths=self.conv_widths,
            dtype=self.dtype,
        )
        self.mlp = NBNerfMLP(
            num_frames=self.num_frames,
            appearance_dim=self.appearance_dim,
            hidden=self.hidden,
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
        verts = batch["ctx_verts"]  # [V, 3]
        frame_idx = batch["ctx_frame_idx"].astype(jnp.int32)
        bmin = batch["ctx_bmin"]
        bmax = batch["ctx_bmax"]
        viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

        z_vals = sample_along_rays(
            rng if train else None, near, far, self.n_samples, perturb=train
        )
        pts = z_to_pts(rays_o, rays_d, z_vals)  # [N, S, 3]
        n, s, _ = pts.shape
        flat = pts.reshape(n * s, 3)

        vert_ids = jnp.arange(self.n_verts)
        feats = self.embedder(vert_ids, verts, flat, bmin, bmax)
        rel = jnp.clip((flat - bmin) / jnp.maximum(bmax - bmin, 1e-6), 0.0, 1.0)
        dirs_flat = jnp.repeat(viewdirs, s, axis=0)
        raw_rgb, raw_sigma = self.mlp(feats, dirs_flat, rel * 2.0 - 1.0, frame_idx)

        # points outside the person bbox contribute nothing
        inb = jnp.all((flat >= bmin) & (flat <= bmax), axis=-1)
        raw_sigma = jnp.where(inb, raw_sigma, -1e3)

        ret = volume_render(
            raw_rgb.reshape(n, s, 3),
            raw_sigma.reshape(n, s),
            z_vals,
            rays_d,
            white_bkgd=self.white_bkgd,
        )
        return {"rgb": ret["rgb"], "acc": ret["acc"], "depth": ret["depth"], "disp": ret["disp"]}

    def loss(
        self, outputs: Dict[str, jnp.ndarray], batch: Dict[str, jnp.ndarray]
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        mse = img2mse(outputs["rgb"], batch["target"])
        log = {"loss": mse, "mse": mse, "psnr": mse2psnr(mse)}
        if "mask" in batch:
            log["acc_err"] = img2mse(outputs["acc"][..., None], batch["mask"])
        return mse, log

"""Vanilla NeRF network: coarse->importance->fine hierarchical rendering.

Parity target: ``NerfNetwork``
(``/root/reference/xrnerf/models/networks/nerf.py:16-173``): coarse MLP →
volume render → sample_pdf importance resampling → fine MLP → render;
MSE loss on fine + coarse rgb, PSNR logging.

TPU-first restructure: the whole forward is one pure function over a
fixed-shape ray batch (no mutable ``data`` dict threading, no chunked
``batchify_forward`` — chunking happens outside jit in the eval renderer),
so XLA sees a single fusable graph: posenc → MXU matmul stack → composite.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ...registry import NETWORKS
from ...utils.metrics import img2mse, mse2psnr
from ..embedders.posenc import posenc, posenc_fast
from ..fields.nerf_mlp import NerfMLP
from ..renders.volume import volume_render
from ..samplers.pdf import sample_pdf
from ..samplers.stratified import sample_along_rays, z_to_pts
from .base import BaseNetwork


@NETWORKS.register
class NerfNetwork(BaseNetwork):
    n_samples: int = 64
    n_importance: int = 128
    multires: int = 10
    multires_dirs: int = 4
    netdepth: int = 8
    netwidth: int = 256
    use_viewdirs: bool = True
    white_bkgd: bool = True
    raw_noise_std: float = 0.0
    lindisp: bool = False
    perturb: bool = True
    coarse_loss_weight: float = 1.0
    dtype: Any = jnp.float32
    # Route both MLPs through the fused Pallas trunk kernel (bf16 MXU,
    # f32 accumulate; ops/pallas/fused_nerf_mlp.py). Same param tree.
    fused: bool = False

    def _eval_mlp(self, mlp, pts, viewdirs):
        """Encode + run MLP over [N, S, 3] pts with per-ray viewdirs [N, 3]."""
        n, s, _ = pts.shape
        # The fused path consumes encodings in bf16, where the double-angle
        # recurrence's ~1e-4 error is invisible — and it is ~6x cheaper on
        # the VPU (posenc is several ms/step at 10^6 pts otherwise).
        enc = posenc_fast if self.fused else posenc
        pts_enc = enc(pts.reshape(n * s, 3), self.multires)
        views_enc = None
        if self.use_viewdirs:
            views_enc = enc(viewdirs, self.multires_dirs)
            views_enc = jnp.repeat(views_enc, s, axis=0)
        rgb, sigma = mlp(pts_enc, views_enc)
        return rgb.reshape(n, s, 3), sigma.reshape(n, s)

    def setup(self):
        self.mlp_coarse = NerfMLP(
            netdepth=self.netdepth,
            netwidth=self.netwidth,
            use_viewdirs=self.use_viewdirs,
            dtype=self.dtype,
            fused=self.fused,
        )
        if self.n_importance > 0:
            self.mlp_fine = NerfMLP(
                netdepth=self.netdepth,
                netwidth=self.netwidth,
                use_viewdirs=self.use_viewdirs,
                dtype=self.dtype,
                fused=self.fused,
            )

    def __call__(
        self,
        batch: Dict[str, jnp.ndarray],
        rng: Optional[jax.Array] = None,
        train: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        rays_o, rays_d = batch["rays_o"], batch["rays_d"]
        near, far = batch["near"], batch["far"]
        viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

        if rng is not None:
            k_strat, k_noise_c, k_pdf, k_noise_f = jax.random.split(rng, 4)
        else:
            k_strat = k_noise_c = k_pdf = k_noise_f = None

        perturb = self.perturb and train
        z_vals = sample_along_rays(
            k_strat if perturb else None, near, far, self.n_samples,
            lindisp=self.lindisp, perturb=perturb,
        )
        pts = z_to_pts(rays_o, rays_d, z_vals)
        rgb_c, sigma_c = self._eval_mlp(self.mlp_coarse, pts, viewdirs)
        ret_c = volume_render(
            rgb_c, sigma_c, z_vals, rays_d,
            rng=k_noise_c if train else None,
            raw_noise_std=self.raw_noise_std if train else 0.0,
            white_bkgd=self.white_bkgd,
        )

        out = {
            "coarse_rgb": ret_c["rgb"],
            "coarse_disp": ret_c["disp"],
            "coarse_acc": ret_c["acc"],
        }
        if self.n_importance > 0:
            z_mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
            z_samples = sample_pdf(
                k_pdf if perturb else None,
                z_mids,
                ret_c["weights"][..., 1:-1],
                self.n_importance,
                det=not perturb,
            )
            z_all = jnp.sort(jnp.concatenate([z_vals, z_samples], axis=-1), axis=-1)
            pts_f = z_to_pts(rays_o, rays_d, z_all)
            rgb_f, sigma_f = self._eval_mlp(self.mlp_fine, pts_f, viewdirs)
            ret_f = volume_render(
                rgb_f, sigma_f, z_all, rays_d,
                rng=k_noise_f if train else None,
                raw_noise_std=self.raw_noise_std if train else 0.0,
                white_bkgd=self.white_bkgd,
            )
            out.update(
                rgb=ret_f["rgb"], disp=ret_f["disp"], acc=ret_f["acc"],
                depth=ret_f["depth"],
            )
        else:
            out.update(
                rgb=ret_c["rgb"], disp=ret_c["disp"], acc=ret_c["acc"],
                depth=ret_c["depth"],
            )
        return out

    def eval_field(
        self, pts: jnp.ndarray, viewdirs: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Point-wise field eval (fine MLP): [B,3],[B,3] -> (rgb, sigma).

        Used as the frozen KiloNeRF distillation teacher
        (student_nerf.py:104-124 teacher_batchify_forward). Activations
        applied: sigmoid rgb, relu sigma.
        """
        mlp = self.mlp_fine if self.n_importance > 0 else self.mlp_coarse
        raw_rgb, raw_sigma = self._eval_mlp(mlp, pts[:, None, :], viewdirs)
        return jax.nn.sigmoid(raw_rgb[:, 0]), jax.nn.relu(raw_sigma[:, 0])

    def loss(
        self, outputs: Dict[str, jnp.ndarray], batch: Dict[str, jnp.ndarray]
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        target = batch["target"]
        mse = img2mse(outputs["rgb"], target)
        loss = mse
        log = {"mse": mse, "psnr": mse2psnr(mse)}
        if "coarse_rgb" in outputs and self.n_importance > 0:
            mse_c = img2mse(outputs["coarse_rgb"], target)
            loss = loss + self.coarse_loss_weight * mse_c
            log["coarse_mse"] = mse_c
        log["loss"] = loss
        return loss, log

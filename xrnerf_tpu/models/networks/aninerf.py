"""Animatable NeRF: neural-blend-weight LBS deformation + canonical human.

Parity targets in the reference:
  - ``AniNeRFNetwork`` (``/root/reference/xrnerf/models/networks/aninerf.py:16-89``):
    deform_field (posed pts -> SMPL-proximity filter -> neural blend
    weights -> LBS to tpose) + tpose_human (density + color MLPs); two
    phases: ``train_pose`` (img loss + smooth-L1 pbw/tbw consistency,
    :61-78) and ``novel_pose`` (only the novel-pose bw MLP trains)
  - ``DeformField``/``TPoseHuman``/``AN_*MLP``
    (``xrnerf/models/mlps/aninerf_mlp.py:12-117,121+``)
  - LBS/knn utilities (``networks/utils/aninerf.py``), see utils/lbs.py.

Batch context: ``ctx_verts`` posed SMPL verts, ``ctx_A`` [J,4,4] joint
transforms, ``ctx_bw_verts`` per-vertex SMPL blend weights, per-frame
latent index — all replicated; rays shard on data.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...registry import NETWORKS
from ...utils.metrics import img2mse, mse2psnr
from ..embedders.posenc import posenc
from ..renders.volume import volume_render
from ..samplers.stratified import sample_along_rays, z_to_pts
from .base import BaseNetwork
from .utils.lbs import pose_to_tpose, sample_blend_weights


class BlendWeightMLP(nn.Module):
    """Residual blend-weight field (AN_BlendWeightMLP): posed coords +
    per-frame latent -> J logits; final bw = normalize(smpl_bw * exp(mlp))."""

    n_joints: int = 24
    num_frames: int = 1000
    latent_dim: int = 128
    hidden: int = 256
    depth: int = 4
    multires: int = 6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pts, smpl_bw, frame_idx):
        # atleast_1d: flax Embed's num_embeddings==1 broadcast shortcut
        # mishandles scalar indices
        latent = nn.Embed(self.num_frames, self.latent_dim, name="latent")(
            jnp.atleast_1d(frame_idx)
        )
        latent = jnp.broadcast_to(latent[0], (pts.shape[0], self.latent_dim))
        h = jnp.concatenate([posenc(pts, self.multires), latent], -1).astype(self.dtype)
        for i in range(self.depth):
            h = nn.relu(nn.Dense(self.hidden, dtype=self.dtype, name=f"fc{i}")(h))
        resid = nn.Dense(self.n_joints, dtype=self.dtype, name="bw_out")(h).astype(
            jnp.float32
        )
        bw = smpl_bw * jnp.exp(resid)
        return bw / jnp.maximum(jnp.sum(bw, -1, keepdims=True), 1e-8)


class TPoseHuman(nn.Module):
    """Canonical-space density + color fields (aninerf_mlp.py TPoseHuman)."""

    num_frames: int = 1000
    color_latent_dim: int = 128
    hidden: int = 256
    depth: int = 4
    multires: int = 6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tpts, viewdirs, frame_idx):
        h = posenc(tpts, self.multires).astype(self.dtype)
        for i in range(self.depth):
            h = nn.relu(nn.Dense(self.hidden, dtype=self.dtype, name=f"density_fc{i}")(h))
        sigma = nn.Dense(1, dtype=self.dtype, name="density_out")(h)[..., 0]
        feat = nn.Dense(self.hidden, dtype=self.dtype, name="feature")(h)
        latent = nn.Embed(self.num_frames, self.color_latent_dim, name="color_latent")(
            jnp.atleast_1d(frame_idx)
        )
        latent = jnp.broadcast_to(latent[0], (tpts.shape[0], self.color_latent_dim))
        c = jnp.concatenate(
            [feat, latent, posenc(viewdirs, 4).astype(self.dtype)], -1
        )
        c = nn.relu(nn.Dense(self.hidden // 2, dtype=self.dtype, name="color_fc")(c))
        rgb = nn.Dense(3, dtype=self.dtype, name="rgb")(c)
        return rgb.astype(jnp.float32), sigma.astype(jnp.float32)


@NETWORKS.register
class AniNeRFNetwork(BaseNetwork):
    n_joints: int = 24
    num_frames: int = 1000
    n_samples: int = 64
    hidden: int = 256
    smpl_dist_threshold: float = 0.08
    bw_consistency_weight: float = 1.0
    phase: str = "train_pose"  # or "novel_pose"
    white_bkgd: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        self.pose_bw_mlp = BlendWeightMLP(
            n_joints=self.n_joints, num_frames=self.num_frames, dtype=self.dtype
        )
        self.novel_pose_bw_mlp = BlendWeightMLP(
            n_joints=self.n_joints, num_frames=self.num_frames, dtype=self.dtype
        )
        self.tpose_bw_mlp = BlendWeightMLP(
            n_joints=self.n_joints, num_frames=1, dtype=self.dtype
        )
        self.tpose_human = TPoseHuman(
            num_frames=self.num_frames, hidden=self.hidden, dtype=self.dtype
        )

    def __call__(
        self,
        batch: Dict[str, jnp.ndarray],
        rng: Optional[jax.Array] = None,
        train: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        rays_o, rays_d = batch["rays_o"], batch["rays_d"]
        near, far = batch["near"], batch["far"]
        verts = batch["ctx_verts"]
        A = batch["ctx_A"]  # [J, 4, 4]
        vert_bw = batch["ctx_bw_verts"]  # [V, J]
        frame_idx = batch["ctx_frame_idx"].astype(jnp.int32)
        viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

        z_vals = sample_along_rays(
            rng if train else None, near, far, self.n_samples, perturb=train
        )
        pts = z_to_pts(rays_o, rays_d, z_vals)
        n, s, _ = pts.shape
        flat = pts.reshape(n * s, 3)

        # SMPL-proximity filter + initial blend weights (knn)
        smpl_bw, dist = sample_blend_weights(flat, verts, vert_bw)
        near_body = dist < self.smpl_dist_threshold

        bw_mlp = (
            self.novel_pose_bw_mlp if self.phase == "novel_pose" else self.pose_bw_mlp
        )
        pbw = bw_mlp(flat, smpl_bw + 1e-9, frame_idx)
        if self.is_initializing():
            # materialize BOTH phase mlps so checkpoints transfer between
            # train_pose and novel_pose configurations
            other = (
                self.pose_bw_mlp
                if self.phase == "novel_pose"
                else self.novel_pose_bw_mlp
            )
            other(flat, smpl_bw + 1e-9, frame_idx)
        tpts = pose_to_tpose(flat, pbw, A)

        dirs_flat = jnp.repeat(viewdirs, s, axis=0)
        raw_rgb, raw_sigma = self.tpose_human(tpts, dirs_flat, frame_idx)
        raw_sigma = jnp.where(near_body, raw_sigma, -1e3)

        ret = volume_render(
            raw_rgb.reshape(n, s, 3),
            raw_sigma.reshape(n, s),
            z_vals,
            rays_d,
            white_bkgd=self.white_bkgd,
        )
        out = {"rgb": ret["rgb"], "acc": ret["acc"], "depth": ret["depth"], "disp": ret["disp"]}

        # tpose_bw_mlp params must exist regardless of the train flag used
        # at init time, hence the is_initializing() branch.
        if train or self.is_initializing():
            # blend-weight consistency: pbw(x) vs tbw(T(x)) on body points
            tbw = self.tpose_bw_mlp(tpts, smpl_bw + 1e-9, jnp.zeros_like(frame_idx))
            mask = near_body.astype(jnp.float32)[:, None]
            diff = jnp.abs(pbw - tbw) * mask
            # smooth-L1 (huber with delta=1)
            sl1 = jnp.where(diff < 1.0, 0.5 * diff**2, diff - 0.5)
            out["bw_consistency"] = jnp.sum(sl1) / jnp.maximum(jnp.sum(mask), 1.0)
        return out

    def loss(
        self, outputs: Dict[str, jnp.ndarray], batch: Dict[str, jnp.ndarray]
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        mse = img2mse(outputs["rgb"], batch["target"])
        loss = mse
        log = {"mse": mse, "psnr": mse2psnr(mse)}
        if "bw_consistency" in outputs:
            loss = loss + self.bw_consistency_weight * outputs["bw_consistency"]
            log["bw_consistency"] = outputs["bw_consistency"]
        if self.phase == "novel_pose":
            # only the bw consistency drives novel-pose training
            loss = outputs.get("bw_consistency", loss)
        log["loss"] = loss
        return loss, log

    def trainable_filter(self):
        """Param-path filter for the novel_pose phase (aninerf.py: only
        novel_pose_bw_mlp trains). Used by the Trainer's optimizer mask."""
        if self.phase != "novel_pose":
            return None
        return lambda path: "novel_pose_bw_mlp" in path

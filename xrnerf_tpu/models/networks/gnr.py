"""GNR: Generalizable Neural Human Radiance field.

Parity target: ``GnrNetwork``
(``/root/reference/xrnerf/models/networks/gnr.py:17-190``): stacked-
hourglass image encoder (+optional feature SR) -> pixel-aligned per-view
features -> ``GnrRenderer.render`` (geometry body-shape embedding from
SMPL nearest-point/SDF queries, visual-hull sample rejection, attention
appearance blending). Loss = nerf mse + attention-blend mse
(``gnr_render.py:96-115``); the RenderPeople-only scan/occlusion/VGG
supervision paths are config-gated off by default, as in the released
GeneBody config.

Batch layout: ray segments (``rays_s``/``rays_e``) shard on the data
axis; all per-frame context (source images, masks, calibs, SMPL mesh)
rides in replicated ``ctx_*`` keys.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.mesh import inside_mesh, nearest_points
from ...registry import NETWORKS
from ...utils.metrics import img2mse, mse2psnr
from ..embedders.gnr_embedder import HGFilter, SRFilters
from ..fields.gnr_mlp import GNRMLP
from ..renders.gnr_render import (
    composite_gnr,
    index_views,
    orthogonal_project,
    perspective_project,
    sample_segment,
    smpl_visibility,
    visual_hull_mask,
)
from .base import BaseNetwork


@NETWORKS.register
class GnrNetwork(BaseNetwork):
    num_views: int = 4
    n_samples: int = 256
    load_size: int = 512
    projection_mode: str = "perspective"  # or "orthogonal"
    use_feat_sr: bool = False
    use_smpl_sdf: bool = True
    use_t_pose: bool = True
    use_smpl_depth: bool = True
    use_nml: bool = True
    use_attention: bool = True
    use_occlusion: bool = True
    use_occlusion_net: bool = False
    use_vh: bool = True
    vh_compact_frac: float = 0.0  # >0: evaluate only this fraction of
    # points, hull-first (sort-compaction; the reference compacts
    # dynamically with pts[inside] — here the budget is static)
    use_white_bkgd: bool = False
    use_viewdirs: bool = True
    train_encoder: bool = False
    num_stack: int = 4
    num_hourglass: int = 2
    hourglass_dim: int = 256
    mlp_depth: int = 8
    mlp_width: int = 256
    skips: Any = (2, 4, 6)
    mesh_chunk: int = 2048
    dtype: Any = jnp.float32

    def setup(self):
        self.image_filter = HGFilter(
            num_stack=self.num_stack,
            num_hourglass=self.num_hourglass,
            hourglass_dim=self.hourglass_dim,
            dtype=self.dtype,
        )
        feat_dim = 64 if self.use_feat_sr else self.hourglass_dim
        if self.use_feat_sr:
            self.sr_filter = SRFilters(order=2, out_ch=feat_dim, dtype=self.dtype)
        self.nerf = GNRMLP(
            depth=self.mlp_depth,
            width=self.mlp_width,
            skips=tuple(self.skips),
            num_views=self.num_views,
            use_smpl_sdf=self.use_smpl_sdf,
            use_t_pose=self.use_t_pose,
            use_attention=self.use_attention,
            use_viewdirs=self.use_viewdirs,
            use_occlusion_net=self.use_occlusion_net,
            dtype=self.dtype,
        )

    # ------------------------------------------------------------------
    def encode_images(self, images: jnp.ndarray) -> jnp.ndarray:
        """[V, H, W, 3] -> [V, h, w, F] pixel-aligned features
        (get_image_feature, gnr.py:54-63)."""
        feats = self.image_filter(images)
        if not self.train_encoder:
            feats = jax.lax.stop_gradient(feats)
        if self.use_feat_sr:
            feats = self.sr_filter(feats, images)
        return feats

    # ------------------------------------------------------------------
    def _project_uv(self, pts, calibs, persps):
        if self.projection_mode == "perspective" and persps is not None:
            xyz = perspective_project(pts, calibs, persps)
            uv = xyz[..., :2] / jnp.asarray(
                [[[self.load_size, self.load_size]]], jnp.float32
            ) * 2.0 - 1.0
        else:
            xyz = orthogonal_project(pts, calibs)
            uv = xyz[..., :2]
        return uv

    def field(
        self,
        batch: Dict[str, jnp.ndarray],
        feats: jnp.ndarray,  # [V, h, w, F] encoded source features
        flat: jnp.ndarray,  # [P, 3] world points
        viewdirs: Optional[jnp.ndarray] = None,  # [P, 3] (query ray dirs)
        alpha_only: bool = False,
    ):
        """Point-level field query: geometry body-shape embedding +
        pixel-aligned features -> GNRMLP outputs. Shared by rendering and
        mesh reconstruction. -> (mlp_out dict, src_rgb [V,P,3], keep [P])."""
        src_images = batch["ctx_images"][: self.num_views]
        src_masks = batch["ctx_masks"][: self.num_views]
        src_calibs = batch["ctx_calibs"][: self.num_views]
        persps = batch.get("ctx_persps")
        src_persps = persps[: self.num_views] if persps is not None else None
        center = batch["ctx_center"]
        spatial_freq = batch["ctx_spatial_freq"]
        rot = batch.get("ctx_smpl_rot")
        V = self.num_views
        P = flat.shape[0]

        # visual hull rejection (mask, not compaction — static shapes)
        keep = None
        if self.use_vh:
            keep = visual_hull_mask(
                flat, src_masks, src_calibs, src_persps,
                self.load_size, self.load_size,
            )

        # Optional sort-compaction: spend MLP/mesh-query FLOPs only on a
        # static budget of points, hull hits first. Dropped points read
        # back sigma=-1e4 like hull misses.
        restore = None
        if keep is not None and 0.0 < self.vh_compact_frac < 1.0:
            budget = max(int(P * self.vh_compact_frac), 1)
            order = jnp.argsort(~keep)  # hull hits first (stable)
            sel = order[:budget]
            restore = (order, sel, P)
            flat = flat[sel]
            keep = keep[sel]
            if viewdirs is not None:
                viewdirs = viewdirs[sel]
            P = budget

        # attention directions: query dir first, then dirs to source cams
        attdirs = None
        if self.use_attention and viewdirs is not None:
            if self.projection_mode == "perspective" and persps is not None:
                cam_c = jnp.linalg.inv(src_calibs)[:, :3, 3]  # [V, 3]
                src_dirs = cam_c[None] - flat[:, None]  # [P, V, 3]
            else:
                src_dirs = jnp.broadcast_to(
                    jnp.linalg.inv(src_calibs)[:, :3, 2][None], (P, V, 3)
                )
            if rot is not None:
                viewdirs = viewdirs @ rot
                src_dirs = src_dirs @ rot
            attdirs = jnp.concatenate([viewdirs[:, None], src_dirs], 1)
            attdirs = attdirs / jnp.clip(
                jnp.linalg.norm(attdirs, axis=-1, keepdims=True), 1e-9
            )

        # geometry body-shape embedding (make_nerf_input :224-309)
        half = self.load_size / 2.0
        pts_nml = (flat - center) * spatial_freq / half
        if self.use_smpl_sdf and rot is not None:
            pts_nml = pts_nml @ rot
        mlp_pts = pts_nml if self.use_nml else flat

        smpl_feat = None
        if self.use_smpl_sdf or self.use_t_pose:
            verts = batch["ctx_smpl_verts"]
            faces = batch["ctx_smpl_faces"].astype(jnp.int32)
            closest, fidx, _ = nearest_points(flat, verts, faces, chunk=self.mesh_chunk)
            pieces = []
            if self.use_t_pose:
                t_verts = batch["ctx_smpl_t_verts"]
                pieces.append(jnp.mean(t_verts[faces[fidx]], axis=1))
            if self.use_smpl_sdf:
                reg = flat - closest
                if self.use_nml:
                    reg = reg * spatial_freq / half
                    if rot is not None:
                        reg = reg @ rot
                signs = inside_mesh(flat, verts, faces, chunk=self.mesh_chunk)
                norm_r = jnp.linalg.norm(reg, axis=-1, keepdims=True) + 1e-8
                pieces.append(reg / norm_r)
                pieces.append(jnp.tanh(norm_r * signs[:, None] * 20.0))
            smpl_feat = jnp.concatenate(pieces, -1)

        # pixel-aligned multiview features + source rgb
        uv = self._project_uv(flat, src_calibs, src_persps)
        latent = index_views(feats, uv)  # [V, P, F]
        src_rgb = index_views(src_images, uv)  # [V, P, 3]
        view_feats = jnp.concatenate([latent, src_rgb], -1).transpose(1, 0, 2)

        smpl_vis = None
        if self.use_occlusion and self.use_smpl_depth and "ctx_smpl_depth" in batch:
            smpl_vis = smpl_visibility(
                flat, batch["ctx_smpl_depth"], src_calibs, src_persps,
                self.load_size, self.load_size,
            )

        mlp_out = self.nerf(
            mlp_pts,
            view_feats,
            smpl_feat=smpl_feat,
            attdirs=attdirs,
            smpl_vis=smpl_vis,
            alpha_only=alpha_only,
        )
        if restore is not None:
            order, sel, full_p = restore

            def scatter(x, fill=0.0):
                out = jnp.full((full_p,) + x.shape[1:], fill, x.dtype)
                return out.at[sel].set(x)

            mlp_out = {
                k: scatter(v, -1e4 if k == "sigma_raw" else 0.0)
                for k, v in mlp_out.items()
            }
            src_rgb = jnp.swapaxes(scatter(jnp.swapaxes(src_rgb, 0, 1)), 0, 1)
            keep = scatter(keep.astype(jnp.float32)) > 0.5
        return mlp_out, src_rgb, keep

    def query_density(self, batch, pts):
        """Hull-masked occupancy in [0,1] at world points (the
        reconstruction field: sigmoid(sigma * gamma), gnr_render.py:434)."""
        feats = self.encode_images(batch["ctx_images"][: self.num_views])
        mlp_out, _, keep = self.field(batch, feats, pts, None, alpha_only=True)
        sigma = mlp_out["sigma_raw"]
        if keep is not None:
            sigma = jnp.where(keep, sigma, -1e4)
        return jax.nn.sigmoid(sigma)

    def query_color(self, batch, pts, normals):
        """Attention-blended color at surface points (reconstruct
        :708-724); ``normals`` serve as the query directions."""
        feats = self.encode_images(batch["ctx_images"][: self.num_views])
        mlp_out, src_rgb, _ = self.field(batch, feats, pts, normals)
        rgb = jax.nn.sigmoid(mlp_out["rgb_raw"])
        if "att" in mlp_out:
            cand = jnp.concatenate(
                [rgb[:, None], src_rgb.transpose(1, 0, 2)], 1
            )  # [P, V+1, 3]
            rgb = jnp.sum(cand * mlp_out["att"][..., None], 1)
        return rgb

    def __call__(
        self,
        batch: Dict[str, jnp.ndarray],
        rng: Optional[jax.Array] = None,
        train: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        rays_s, rays_e = batch["rays_s"], batch["rays_e"]
        persps = batch.get("ctx_persps")
        spatial_freq = batch["ctx_spatial_freq"]
        V = self.num_views

        feats = self.encode_images(batch["ctx_images"][:V])

        k_sample, k_noise = (
            jax.random.split(rng) if rng is not None else (None, None)
        )
        pts, t_vals = sample_segment(
            rays_s, rays_e, self.n_samples, k_sample if train else None
        )
        R, S = pts.shape[:2]
        flat = pts.reshape(R * S, 3)
        viewdirs = jnp.repeat(rays_s - rays_e, S, axis=0)  # [R*S, 3]

        mlp_out, src_rgb, keep = self.field(
            batch, feats, flat, viewdirs, alpha_only=False
        )
        sigma = mlp_out["sigma_raw"]
        if keep is not None:
            sigma = jnp.where(keep, sigma, -1e4)

        norm = jnp.linalg.norm(rays_e - rays_s, axis=-1, keepdims=True)
        if self.use_nml:
            norm = norm * spatial_freq / (self.load_size / 2.0)

        att = (
            mlp_out["att"].reshape(R, S, -1) if "att" in mlp_out else None
        )
        ret = composite_gnr(
            mlp_out["rgb_raw"].reshape(R, S, 3),
            sigma.reshape(R, S),
            t_vals,
            norm,
            rng=k_noise if train else None,
            att=att,
            source_rgb=src_rgb.transpose(1, 0, 2).reshape(R, S, V, 3),
            white_bkgd=self.use_white_bkgd,
        )
        # depth in the query camera's metric range when available
        if persps is not None:
            q_near, q_far = persps[-1, -2], persps[-1, -1]
            z_vals = t_vals * q_far + (1 - t_vals) * q_near
        else:
            z_vals = 2 * t_vals - 1
        depth = jnp.sum(ret["weights"] * z_vals, -1)

        out = {
            "rgb": ret.get("att_rgb", ret["rgb"]),
            "nerf_rgb": ret["rgb"],
            "acc": ret["acc"],
            "depth": depth,
            "disp": depth,
        }
        if "att_rgb" in ret:
            out["att_rgb"] = ret["att_rgb"]
        return out

    # ------------------------------------------------------------------
    def loss(
        self, outputs: Dict[str, jnp.ndarray], batch: Dict[str, jnp.ndarray]
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        target = batch["target"]
        nerf_mse = img2mse(outputs["nerf_rgb"], target)
        loss = nerf_mse
        log = {"nerf_mse": nerf_mse}
        if "att_rgb" in outputs:
            att_mse = img2mse(outputs["att_rgb"], target)
            loss = loss + att_mse
            log["att_mse"] = att_mse
            log["psnr"] = mse2psnr(att_mse)
        else:
            log["psnr"] = mse2psnr(nerf_mse)
        log["loss"] = loss
        return loss, log

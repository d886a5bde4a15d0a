"""GNR MLP: density/color field over pixel-aligned multi-view features
with attention-based appearance blending.

Parity target: ``GNRMLP``
(``/root/reference/xrnerf/models/mlps/gnr_mlp.py:11-260``):
  - alpha branch over per-view rows with a mean/weighted view-pool at the
    first skip connection (:167-180)
  - rgb branch from the pooled trunk + SH-embedded query direction
    (:183-203)
  - key/value attention over (self + num_views) appearance candidates
    with occlusion- or visibility-weighted softmax (:205-245, :252-259)
  - plucker-coordinate occlusion net (:120-125, :151-164)

TPU-first: inputs are structured arrays ([P,3] points, [P,V,F] view
features) instead of one packed tensor sliced with ``torch.split``; the
view axis folds into the batch for every Dense so the MXU sees [P*V, C]
matmuls; outputs are a dict, not a channel-packed vector.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ...registry import FIELDS
from ..embedders.gnr_embedder import gnr_posenc, gnr_posenc_freqs, spherical_harmonics


def weighted_softmax(att: jnp.ndarray, weight: jnp.ndarray) -> jnp.ndarray:
    """Softmax over the last axis where entries 1: are pre-scaled by
    ``weight`` (entry 0 — the model's own rgb — is never down-weighted)."""
    e = jnp.exp(att - jnp.max(att, -1, keepdims=True))
    e = jnp.concatenate([e[..., :1], e[..., 1:] * weight], -1)
    return e / (jnp.sum(e, -1, keepdims=True) + 1e-8)


@FIELDS.register
class GNRMLP(nn.Module):
    depth: int = 8
    width: int = 256
    skips: Sequence[int] = (2, 4, 6)
    num_views: int = 4
    pose_freqs: int = 10
    att_freqs: int = 6
    spatial_freq: float = 1.0 / 256.0
    use_smpl_sdf: bool = True
    use_t_pose: bool = True
    use_attention: bool = True
    weighted_pool: bool = True
    use_viewdirs: bool = True
    use_sh: bool = True
    use_occlusion_net: bool = False
    angle_diff: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        # linear frequency bands scaled by spatial_freq (gnr_mlp.py:56-59)
        self.pose_bands = gnr_posenc_freqs(
            self.pose_freqs, self.spatial_freq * 0.1, self.spatial_freq * 10
        )
        self.att_bands = gnr_posenc_freqs(self.att_freqs)

    def _pose_embed(self, x):
        return gnr_posenc(x, self.pose_bands)

    def _att_embed(self, d):
        if self.use_sh and not self.angle_diff:
            return spherical_harmonics(d, rank=3)
        return gnr_posenc(d, self.att_bands)

    @nn.compact
    def __call__(
        self,
        pts: jnp.ndarray,  # [P, 3] normalized body coords
        view_feats: jnp.ndarray,  # [P, V, F] pixel-aligned feats (+ src rgb)
        smpl_feat: Optional[jnp.ndarray] = None,  # [P, S]
        attdirs: Optional[jnp.ndarray] = None,  # [P, V+1, 3] (query first)
        smpl_vis: Optional[jnp.ndarray] = None,  # [P, V]
        alpha_only: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        P, V = view_feats.shape[:2]
        W = self.width
        act = nn.relu
        smpl = (
            smpl_feat
            if smpl_feat is not None
            else jnp.zeros((P, 0), view_feats.dtype)
        )

        pe_pts = self._pose_embed(pts).astype(self.dtype)  # [P, E]
        base = jnp.concatenate([pe_pts, smpl.astype(self.dtype)], -1)
        base_v = jnp.broadcast_to(base[:, None], (P, V, base.shape[-1]))

        if self.use_attention and attdirs is not None:
            qrydirs = attdirs[:, :1]  # [P, 1, 3]
            srcdirs = attdirs[:, 1:]  # [P, V, 3]

        occ = None
        if self.use_occlusion_net and attdirs is not None:
            # plucker coords (d, m = pts x d) per source view
            d = srcdirs
            m = jnp.cross(jnp.broadcast_to(pts[:, None], d.shape), d)
            oh = jnp.concatenate(
                [base_v[..., pe_pts.shape[-1] :], d, m, view_feats], -1
            ).astype(self.dtype)
            oin = jnp.concatenate([smpl[:, None].repeat(V, 1), d, m], -1).astype(
                self.dtype
            )
            oh = act(nn.Dense(W // 4, dtype=self.dtype, name="occ0")(oh))
            oh = act(nn.Dense(W // 16, dtype=self.dtype, name="occ1")(oh))
            oh = nn.Dense(1, dtype=self.dtype, name="occ2")(
                jnp.concatenate([oin, oh], -1)
            )
            occ = nn.sigmoid(oh[..., 0].astype(jnp.float32))  # [P, V]

        # ------------------------------------------------------------------
        # alpha trunk over per-view rows, pooled across views at skips[0]
        # ------------------------------------------------------------------
        h = jnp.concatenate([base_v, view_feats.astype(self.dtype)], -1)
        tmp_h = None
        pooled = False
        for i in range(self.depth):
            h = act(nn.Dense(W, dtype=self.dtype, name=f"alpha{i}")(h))
            if i in self.skips:
                if not pooled:
                    tmp_h = h  # [P, V, W] pre-pool trunk for rgb/attention
                    h = jnp.mean(h, axis=1)  # [P, W]
                    pooled = True
                h = jnp.concatenate([base, h], -1)
        sigma = nn.Dense(1, dtype=self.dtype, name="alpha_out")(h).astype(jnp.float32)
        if alpha_only:
            return {"sigma_raw": sigma[..., 0]}

        # ------------------------------------------------------------------
        # rgb branch from the (optionally view-weighted) pooled trunk
        # ------------------------------------------------------------------
        if self.use_attention and self.weighted_pool and attdirs is not None:
            s = self.param("s", nn.initializers.ones, (1,))
            w = jnp.exp(s * (jnp.sum(srcdirs * qrydirs, -1) - 1.0))  # [P, V]
            w = w / (jnp.sum(w, -1, keepdims=True) + 1e-8)
            h0 = jnp.sum(tmp_h * w[..., None].astype(self.dtype), axis=1)
        else:
            h0 = jnp.mean(tmp_h, axis=1)

        h = jnp.concatenate([base, h0], -1)
        h = act(nn.Dense(W // 4, dtype=self.dtype, name="rgb0")(h))
        if self.use_viewdirs and self.use_attention and attdirs is not None:
            h = jnp.concatenate(
                [self._att_embed(-qrydirs[:, 0]).astype(self.dtype), h], -1
            )
        h = act(nn.Dense(W // 8, dtype=self.dtype, name="rgb1")(h))
        h = act(nn.Dense(W // 16, dtype=self.dtype, name="rgb2")(h))
        rgb = nn.Dense(3, dtype=self.dtype, name="rgb_out")(h).astype(jnp.float32)

        out = {"rgb_raw": rgb, "sigma_raw": sigma[..., 0]}

        # ------------------------------------------------------------------
        # key/value attention over (self + V) appearance candidates
        # ------------------------------------------------------------------
        if self.use_attention and attdirs is not None:
            att_e = self._att_embed(attdirs).astype(self.dtype)  # [P, V+1, A]
            pts_all = jnp.concatenate(
                [pe_pts[:, None], jnp.broadcast_to(pe_pts[:, None], (P, V, pe_pts.shape[-1]))],
                1,
            )  # [P, V+1, E]
            h_all = jnp.concatenate([h0[:, None].astype(self.dtype), tmp_h], 1)
            val = jnp.concatenate([pts_all, att_e, h_all], -1)
            for i, wd in enumerate((W // 4, W // 8, W // 16)):
                val = nn.Dense(wd, dtype=self.dtype, name=f"value{i}")(val)
                if i < 2:
                    val = jnp.concatenate([att_e, act(val)], -1)

            q_e = self._att_embed(qrydirs[:, 0]).astype(self.dtype)
            key = jnp.concatenate([pe_pts, q_e, h0.astype(self.dtype)], -1)
            for i, wd in enumerate((W // 4, W // 8, W // 16)):
                key = nn.Dense(wd, dtype=self.dtype, name=f"key{i}")(key)
                if i < 2:
                    key = jnp.concatenate([q_e, act(key)], -1)

            att = jnp.einsum("pvc,pc->pv", val, key).astype(jnp.float32)
            if occ is not None:
                att = weighted_softmax(att, occ)
            elif smpl_vis is not None:
                att = weighted_softmax(att, smpl_vis.astype(jnp.float32))
            else:
                att = nn.softmax(att, axis=-1)
            out["att"] = att  # [P, V+1]
        if occ is not None:
            out["occ"] = occ
        return out

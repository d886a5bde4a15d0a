"""NeuralBody NeRF head (flax).

Parity target: ``NB_NeRFMLP``
(``/root/reference/xrnerf/models/mlps/nb_mlp.py:11-70``): the reference
uses Conv1d over a [1, C, P] layout — pointwise Conv1d == Dense over the
feature axis, so the TPU version is a plain Dense trunk. Per-frame 128-d
appearance codes (``nn.Embedding(num_frames, 128)``), fused with viewdir
and point positional encodings in the color branch.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..embedders.posenc import posenc


class NBNerfMLP(nn.Module):
    num_frames: int = 1000
    appearance_dim: int = 128
    hidden: int = 256
    multires_dirs: int = 4
    multires_pts: int = 6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        xyzc_feat: jnp.ndarray,  # [P, C] voxel features at query pts
        viewdirs: jnp.ndarray,  # [P, 3]
        pts: jnp.ndarray,  # [P, 3] (normalized to the person bbox)
        frame_idx: jnp.ndarray,  # [] int
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        dense = lambda w, name: nn.Dense(w, dtype=self.dtype, name=name)
        h = xyzc_feat.astype(self.dtype)
        h = nn.relu(dense(self.hidden, "fc0")(h))
        h = nn.relu(dense(self.hidden, "fc1")(h))
        sigma = dense(1, "alpha")(h)[..., 0]

        app = nn.Embed(self.num_frames, self.appearance_dim, name="appearance")(
            frame_idx
        )
        app = jnp.broadcast_to(app, (h.shape[0], self.appearance_dim)).astype(self.dtype)
        venc = posenc(viewdirs, self.multires_dirs).astype(self.dtype)
        penc = posenc(pts, self.multires_pts).astype(self.dtype)
        c = jnp.concatenate([dense(self.hidden, "feature")(h), app, venc, penc], -1)
        c = nn.relu(dense(self.hidden // 2, "color_fc")(c))
        rgb = dense(3, "rgb")(c)
        return rgb.astype(jnp.float32), sigma.astype(jnp.float32)

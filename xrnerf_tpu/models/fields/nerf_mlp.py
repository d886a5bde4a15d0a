"""Vanilla NeRF MLP field (flax.linen).

Parity target: ``NerfMLP`` (``/root/reference/xrnerf/models/mlps/nerf_mlp.py:12-94``):
8x256 trunk, skip-concat of the input encoding at layer 4, separate
alpha/feature branches, and a width/2 view-conditioned rgb head.

TPU note: evaluated over [N*S, C] flattened batches so every Dense lowers
to a single large MXU matmul; the reference's ``netchunk`` host loop is
unnecessary (memory is managed by batch sizing + remat at the network
level). ``param_dtype`` stays float32; ``dtype`` selects bf16 compute.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


class NerfMLP(nn.Module):
    netdepth: int = 8
    netwidth: int = 256
    skips: Sequence[int] = (4,)
    use_viewdirs: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, pts_enc: jnp.ndarray, views_enc: jnp.ndarray | None = None
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """pts_enc [..., Cp], views_enc [..., Cv] -> (raw_rgb [...,3], raw_sigma [...])."""
        dense = lambda w, name: nn.Dense(w, dtype=self.dtype, name=name)
        x = pts_enc.astype(self.dtype)
        h = x
        for i in range(self.netdepth):
            h = nn.relu(dense(self.netwidth, f"pts_{i}")(h))
            if i in self.skips and i != self.netdepth - 1:
                h = jnp.concatenate([x, h], axis=-1)

        if self.use_viewdirs:
            sigma = dense(1, "alpha")(h)[..., 0]
            feat = dense(self.netwidth, "feature")(h)
            v = jnp.concatenate([feat, views_enc.astype(self.dtype)], axis=-1)
            v = nn.relu(dense(self.netwidth // 2, "views_0")(v))
            rgb = dense(3, "rgb")(v)
        else:
            out = dense(4, "output")(h)
            rgb, sigma = out[..., :3], out[..., 3]
        return rgb.astype(jnp.float32), sigma.astype(jnp.float32)

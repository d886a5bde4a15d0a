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
import jax
import jax.numpy as jnp


class NerfMLP(nn.Module):
    netdepth: int = 8
    netwidth: int = 256
    skips: Sequence[int] = (4,)
    use_viewdirs: bool = True
    dtype: Any = jnp.float32
    # Evaluate the whole trunk+heads as ONE fused Pallas kernel (bf16 MXU,
    # f32 accumulate, custom VJP). Requires the reference default topology
    # (netdepth=8, skips=(4,), use_viewdirs). The param tree is identical
    # to the unfused path, so checkpoints are interchangeable.
    fused: bool = False

    def _dense_params(self, name: str, din: int, dout: int):
        """Mirror nn.Dense's param subtree ({kernel, bias}, lecun_normal /
        zeros) so fused/unfused share one checkpoint layout."""

        def init(rng):
            return {
                "kernel": nn.initializers.lecun_normal()(rng, (din, dout)),
                "bias": jnp.zeros((dout,), jnp.float32),
            }

        return self.param(name, init)

    def _fused_call(self, pts_enc, views_enc):
        from ...ops.pallas.fused_nerf_mlp import fused_nerf_mlp

        cp, cv, w = pts_enc.shape[-1], views_enc.shape[-1], self.netwidth
        params = {}
        params["pts_0"] = self._dense_params("pts_0", cp, w)
        for i in range(1, self.netdepth):
            din = cp + w if i - 1 in self.skips else w
            params[f"pts_{i}"] = self._dense_params(f"pts_{i}", din, w)
        params["alpha"] = self._dense_params("alpha", w, 1)
        params["feature"] = self._dense_params("feature", w, w)
        params["views_0"] = self._dense_params("views_0", w + cv, w // 2)
        params["rgb"] = self._dense_params("rgb", w // 2, 3)
        rgb, sigma = fused_nerf_mlp(pts_enc, views_enc, params)
        return rgb, sigma

    @nn.compact
    def __call__(
        self, pts_enc: jnp.ndarray, views_enc: jnp.ndarray | None = None
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """pts_enc [..., Cp], views_enc [..., Cv] -> (raw_rgb [...,3], raw_sigma [...])."""
        if self.fused:
            if not (
                self.netdepth == 8
                and tuple(self.skips) == (4,)
                and self.use_viewdirs
                and views_enc is not None
            ):
                raise ValueError(
                    "NerfMLP(fused=True) requires netdepth=8, skips=(4,), "
                    "use_viewdirs=True"
                )
            return self._fused_call(pts_enc, views_enc)
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

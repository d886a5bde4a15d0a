"""BungeeNeRF progressive MLP (flax).

Parity target: ``BungeeNerfMLP``
(``/root/reference/xrnerf/models/mlps/bungeenerf_mlp.py:11-127``): a base
block plus ``n_stages-1`` residual refinement blocks, each emitting its
own (rgb, alpha) head; outputs stacked per-stage ``[N, stages, 4]``.

TPU-first: all stages are evaluated every step (static graph) and the
progressive curriculum is applied by masking in the render/loss — no
shape changes as training grows stages (SURVEY §7.3 recompilation
hygiene).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp


class BungeeNerfMLP(nn.Module):
    n_stages: int = 4
    netdepth_base: int = 8
    netwidth: int = 256
    netdepth_res: int = 1
    skips: Tuple[int, ...] = (4,)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, pts_enc: jnp.ndarray, views_enc: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """-> (raw_rgb [N, stages, 3], raw_sigma [N, stages])."""
        dense = lambda w, name: nn.Dense(w, dtype=self.dtype, name=name)
        x = pts_enc.astype(self.dtype)
        h = x
        for i in range(self.netdepth_base):
            h = nn.relu(dense(self.netwidth, f"base_{i}")(h))
            if i in self.skips and i != self.netdepth_base - 1:
                h = jnp.concatenate([x, h], axis=-1)

        rgbs, sigmas = [], []

        def heads(feat, tag):
            sigma = dense(1, f"alpha_{tag}")(feat)[..., 0]
            bottleneck = dense(self.netwidth, f"bottleneck_{tag}")(feat)
            v = jnp.concatenate([bottleneck, views_enc.astype(self.dtype)], axis=-1)
            v = nn.relu(dense(self.netwidth // 2, f"views_{tag}")(v))
            rgb = dense(3, f"rgb_{tag}")(v)
            return rgb, sigma

        rgb, sigma = heads(h, "s0")
        rgbs.append(rgb)
        sigmas.append(sigma)

        for s in range(1, self.n_stages):
            # residual block conditioned on the input encoding
            r = jnp.concatenate([h, x], axis=-1)
            for j in range(self.netdepth_res):
                r = nn.relu(dense(self.netwidth, f"res_{s}_{j}")(r))
            h = h + dense(self.netwidth, f"res_proj_{s}")(r)
            rgb, sigma = heads(h, f"s{s}")
            rgbs.append(rgb)
            sigmas.append(sigma)

        raw_rgb = jnp.stack(rgbs, axis=-2).astype(jnp.float32)  # [N, S, 3]
        raw_sigma = jnp.stack(sigmas, axis=-1).astype(jnp.float32)  # [N, S]
        return raw_rgb, raw_sigma

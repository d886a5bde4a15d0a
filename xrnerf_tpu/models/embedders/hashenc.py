"""Multiresolution hash encoding (Instant-NGP) — TPU-native.

Replaces tiny-cuda-nn's HashGrid encoding that the reference wraps
(``/root/reference/xrnerf/models/mlps/hashnerf_mlp.py:36-45``: 16 levels,
2 features, 2^19 table, base res 16, per-level scale
``exp2(log2(2048*bound/16)/15)`` — ``hashnerf_mlp.py:17-20``).

Design: one stacked table param [L, T, F]; per level compute 8 corner
hashes and gather-interpolate. The forward is a pure gather + trilerp
(vectorized over all levels at once — a single [L*N*8] gather keeps the
TPU busy instead of 16 tiny ones); the backward is XLA's gather
transpose = scatter-add into the table, which is exactly tcnn's atomicAdd
semantics. Coarse levels whose dense grid fits under T use injective
(non-hashed) indexing, matching NGP's tied-grid behavior.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# NGP's spatial hash primes (pi1=1 for x).
_PRIMES = (1, 2654435761, 805459861)


def per_level_scale(max_res: int, base_res: int, n_levels: int) -> float:
    """Growth factor b = exp2(log2(max_res/base_res)/(L-1)) (hashnerf_mlp.py:17-20)."""
    return float(np.exp2(np.log2(max_res / base_res) / max(n_levels - 1, 1)))


def _level_resolutions(base_res: int, scale: float, n_levels: int) -> np.ndarray:
    return np.floor(base_res * scale ** np.arange(n_levels)).astype(np.int64)


class HashEncoding(nn.Module):
    """x in [0,1]^3 -> [..., n_levels * n_features] encoding."""

    n_levels: int = 16
    n_features: int = 2
    log2_table_size: int = 19
    base_res: int = 16
    max_res: int = 2048
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        T = 1 << self.log2_table_size
        L, F = self.n_levels, self.n_features
        scale = per_level_scale(self.max_res, self.base_res, L)
        res = _level_resolutions(self.base_res, scale, L)  # [L] host-side

        table = self.param(
            "table",
            lambda key, shape: jax.random.uniform(key, shape, jnp.float32, -1e-4, 1e-4),
            (L, T, F),
        )

        orig_shape = x.shape[:-1]
        x = x.reshape(-1, 3)
        n = x.shape[0]

        # [L, N, 3] scaled coords per level
        res_f = jnp.asarray(res, x.dtype)[:, None, None]
        xl = x[None, :, :] * (res_f - 1.0)
        x0 = jnp.floor(xl)
        w = xl - x0  # trilerp weights in [0,1)
        xi = x0.astype(jnp.int32)

        # 8 corner offsets [8, 3]
        corners = jnp.asarray(
            [[i, j, k] for i in (0, 1) for j in (0, 1) for k in (0, 1)], jnp.int32
        )
        # corner coords [L, N, 8, 3]
        cc = xi[:, :, None, :] + corners[None, None, :, :]
        cc = jnp.clip(cc, 0, jnp.asarray(res, jnp.int32)[:, None, None, None] - 1)

        # Hashed index per level: injective for levels whose dense grid fits
        # in the table, spatial hash otherwise. The dense/hashed split is
        # decided host-side in int64 (jax x64 is off; 2048^3 overflows i32).
        use_dense = (res.astype(np.int64) ** 3 <= T)  # [L] np.bool_
        res_i = jnp.asarray(res, jnp.int32)[:, None, None]
        dense_idx = cc[..., 0] + res_i * (cc[..., 1] + res_i * cc[..., 2])
        # uint32-style wrap-around hash (tcnn semantics); int32 mul wraps in
        # XLA and jnp.mod returns a value in [0, T) even for negatives.
        hash_idx = (
            cc[..., 0] * np.int32(_PRIMES[0])
            ^ cc[..., 1] * np.int32(np.uint32(_PRIMES[1]).view(np.int32))
            ^ cc[..., 2] * np.int32(np.uint32(_PRIMES[2]).view(np.int32))
        ) % T
        idx = jnp.where(
            jnp.asarray(use_dense)[:, None, None], dense_idx % T, hash_idx
        ).astype(jnp.int32)

        # gather: [L, N, 8, F]
        feats = jnp.take_along_axis(
            table[:, :, None, :],
            idx.reshape(L, n * 8)[:, :, None, None],
            axis=1,
        ).reshape(L, n, 8, F)

        # trilerp weights [L, N, 8]
        wx = jnp.where(corners[None, None, :, 0] == 1, w[..., 0:1], 1 - w[..., 0:1])
        wy = jnp.where(corners[None, None, :, 1] == 1, w[..., 1:2], 1 - w[..., 1:2])
        wz = jnp.where(corners[None, None, :, 2] == 1, w[..., 2:3], 1 - w[..., 2:3])
        cw = (wx * wy * wz)[..., None]  # [L, N, 8, 1]

        out = jnp.sum(feats * cw, axis=2)  # [L, N, F]
        out = jnp.moveaxis(out, 0, 1).reshape(n, L * F)
        return out.reshape(*orig_shape, L * F).astype(self.dtype)

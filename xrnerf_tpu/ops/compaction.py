"""Front-compaction of live samples — one-hot contraction, no sort.

``keep_first_k(live, k)`` returns, per row, the positions of the first
``k`` True entries. The classic TPU implementation is an argsort by
(dead, position); measured on v5e the sort costs ~3 ns/row while the
same selection as a fused broadcast-compare-reduce (``rank == j`` one-hot
contracted over the sample axis) is pure VPU work that XLA fuses without
materializing the [N, S, k] intermediate — and it parallelizes over
lanes instead of paying the sort network. Used by the ray marches
(KiloNeRF pooled march, NGP candidate compaction) where the per-chunk
row counts reach tens of millions.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def keep_first_k(
    live: jnp.ndarray, k: int, vals: jnp.ndarray | None = None
) -> Tuple[jnp.ndarray, ...]:
    """live [N, S] bool -> (idx [N, k] int32, mask [N, k] bool[, vk]).

    idx[n, j] = position of the (j+1)-th True in live[n] (0 where absent,
    masked by mask). Positions are in ascending order (stable). Exact for
    S < 2^24 (f32 contraction).

    ``vals`` [N, S] float: also return ``vk`` [N, k] = vals at the kept
    positions, contracted through the SAME one-hot — each output is
    exactly one addend, so the value is exact, and it replaces a
    ``take_along_axis`` whose element gather costs ~8 ns/row at
    march shapes (2.1M rows/chunk) vs ~0 for one more fused einsum.
    """
    n, s = live.shape
    rank = jnp.cumsum(live.astype(jnp.int32), axis=-1)  # [N, S] inclusive
    j1 = jnp.arange(1, k + 1, dtype=jnp.int32)  # [k]
    # one-hot over samples, [N, k, S] so the contracted axis is minor
    # (S-lane vregs; a [.., k]-minor layout wastes 1 - k/128 of each
    # vector register)
    oh = (live[:, None, :] & (rank[:, None, :] == j1[None, :, None])).astype(
        jnp.float32
    )
    pos = jnp.arange(s, dtype=jnp.float32)
    idx = jnp.einsum("nks,s->nk", oh, pos).astype(jnp.int32)
    mask = j1[None, :] <= rank[:, -1:]
    if vals is None:
        return idx, mask
    vk = jnp.einsum("nks,ns->nk", oh, vals.astype(jnp.float32))
    return idx, mask, vk

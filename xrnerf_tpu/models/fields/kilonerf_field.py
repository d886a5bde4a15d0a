"""KiloNeRF multi-network field: thousands of tiny MLPs as one batched op.

Replaces the reference's MAGMA-grouped-GEMM multi-network stack
(``/root/reference/xrnerf/models/mlps/multi_modules.py`` — 707 LoC of
``MultiNetworkLinear``/``AddMultiMatMul`` wrapping
``kilonerf_cuda.multimatmul_magma_grouped_static``; and
``kilonerf_mlp.py:29-190``'s reorder/global_to_local/scatter pipeline).

TPU-first design: KiloNeRF is a *spatial MoE*. Weights live as stacked
params ``[N_nets, in, out]``; points are dispatched to their voxel's
network with the classic MoE capacity trick (sort by expert, rank within
group, drop overflow) and evaluated with one ``[N_nets, cap, in] @
[N_nets, in, out]`` batched matmul per layer — exactly what the MXU is
for. No atomics, no grouped-GEMM plans, static shapes throughout; the
``model`` mesh axis can shard the leading N_nets dim (expert parallelism).

Architecture parity (kilonerf paper / multi_modules.py MultiNetwork):
fourier-embedded pts -> 2 hidden layers (32 wide) -> sigma + feature;
direction embedding fed late into the rgb head.
"""

from __future__ import annotations

import math
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..embedders.posenc import posenc


def assign_networks(
    pts: jnp.ndarray, domain_min: jnp.ndarray, domain_max: jnp.ndarray, res: Sequence[int]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Points -> (flat network index, local coords in [-1,1]^3).

    Parity: ``reorder_points_and_dirs`` voxel assignment + the
    ``global_to_local`` CUDA transform (networks/utils/transforms.py:100+,
    kilonerf_mlp.py:164).
    """
    res = jnp.asarray(res)
    rel = (pts - domain_min) / (domain_max - domain_min)  # [.., 3]
    vox = jnp.floor(rel * res).astype(jnp.int32)
    inb = jnp.all((rel >= 0) & (rel < 1), axis=-1)
    vox = jnp.clip(vox, 0, res - 1)
    net_idx = vox[..., 0] * (res[1] * res[2]) + vox[..., 1] * res[2] + vox[..., 2]
    local = (rel * res - vox) * 2.0 - 1.0
    return jnp.where(inb, net_idx, -1), local


def moe_dispatch(net_idx: jnp.ndarray, n_nets: int, capacity: int):
    """[B] indices (−1 = dropped) -> (dest slot [B], keep mask [B], order).

    Standard MoE capacity dispatch: stable-sort by network, rank within
    group, drop beyond ``capacity``. Returns slot ids into a
    [n_nets * capacity] buffer.
    """
    b = net_idx.shape[0]
    valid = net_idx >= 0
    key = jnp.where(valid, net_idx, n_nets)  # invalid to the end
    order = jnp.argsort(key, stable=True)
    sorted_key = key[order]
    # rank within group = position - first index of the group
    first = jnp.searchsorted(sorted_key, jnp.arange(n_nets + 1), side="left")
    rank = jnp.arange(b) - first[jnp.clip(sorted_key, 0, n_nets)]
    keep = (sorted_key < n_nets) & (rank < capacity)
    dest = jnp.where(keep, sorted_key * capacity + rank, n_nets * capacity)
    return dest, keep, order


class MultiNetworkMLP(nn.Module):
    """Stacked tiny MLPs evaluated by batched matmul over dispatched points."""

    n_nets: int
    hidden: int = 32
    n_hidden_layers: int = 2
    multires: int = 10
    multires_dirs: int = 4
    capacity_factor: float = 2.0
    dtype: Any = jnp.float32

    def _bmm_layer(self, name: str, x: jnp.ndarray, d_out: int, relu: bool = True):
        """x [N_nets, cap, d_in] -> [N_nets, cap, d_out] with per-net weights."""
        d_in = x.shape[-1]
        # per-network kaiming-uniform fan-in init (multi_modules.py:13-88)
        bound = math.sqrt(6.0 / d_in)
        w = self.param(
            name + "_w",
            lambda k, s: jax.random.uniform(k, s, jnp.float32, -bound, bound),
            (self.n_nets, d_in, d_out),
        )
        b = self.param(name + "_b", nn.initializers.zeros, (self.n_nets, 1, d_out))
        y = (
            jax.lax.dot_general(
                x.astype(self.dtype),
                w.astype(self.dtype),
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            + b
        )
        return nn.relu(y) if relu else y

    @nn.compact
    def __call__(
        self,
        local_pts: jnp.ndarray,
        dirs: jnp.ndarray,
        net_idx: jnp.ndarray,
        gather_dispatch: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """local_pts [B,3] in [-1,1], dirs [B,3] unit, net_idx [B] (−1=empty)
        -> (raw_rgb [B,3], raw_sigma [B]). Dropped/empty points get zeros.

        ``gather_dispatch`` selects the inference-oriented dispatch whose
        forward contains no HBM scatter (see _eval_grouped notes).
        """
        bsz = local_pts.shape[0]
        capacity = int(
            max(8, self.capacity_factor * bsz / max(self.n_nets, 1))
        )
        capacity = min(capacity, bsz)
        raw = jnp.concatenate([local_pts, dirs], -1)  # [B, 6]

        if gather_dispatch:
            # Sort-based dispatch made of sorts + gathers only. XLA's
            # HBM scatter runs at ~82 ns/row on v5e — at inference chunk
            # sizes (2-25M dispatch rows/frame) the scatter-based path
            # below spends seconds per frame moving rows; two int32
            # sorts + capacity gathers do the same movement at ~6 ns/row
            # (tools/exp/exp_round3_kilo.py). Grad-free by design: the
            # gathers would transpose back into scatters in a backward.
            valid = net_idx >= 0
            key = jnp.where(valid, net_idx, self.n_nets)
            # The raw rows ride through the sort as six extra bitcast-u32
            # operands: sorting payload lanes costs ~1 ns/row/lane while
            # gathering the rows afterwards through the perm indirection
            # (perm_pad[pos] element gather + dependent row gather) ran
            # ~26 ns/slot — the dispatch's dominant cost
            # (tools/exp/exp_round5_moe.py: cap-gather 41.5 ms vs the same
            # row fetch at 8.8 ms when the gather is direct).
            lanes = tuple(
                jax.lax.bitcast_convert_type(raw[:, j], jnp.int32)
                for j in range(6)
            )
            ops = jax.lax.sort(
                (key.astype(jnp.int32), jnp.arange(bsz, dtype=jnp.int32))
                + lanes,
                num_keys=1,
            )
            skey, perm = ops[0], ops[1]
            raw_sorted = jnp.stack(
                [
                    jax.lax.bitcast_convert_type(o, jnp.float32)
                    for o in ops[2:]
                ],
                axis=-1,
            )  # [B, 6] rows in net-sorted order
            first = jnp.searchsorted(
                skey, jnp.arange(self.n_nets + 1, dtype=jnp.int32), side="left"
            )  # [n_nets+1]
            # capacity gather: slot (e, r) <- sorted row first[e]+r,
            # DIRECTLY from the sorted rows (no index indirection)
            pos = first[: self.n_nets, None] + jnp.arange(capacity)[None, :]
            valid_slot = pos < jnp.minimum(
                first[1:, None], first[: self.n_nets, None] + capacity
            )
            src = jnp.where(valid_slot, jnp.clip(pos, 0, bsz - 1), bsz)
            raw_pad = jnp.concatenate(
                [raw_sorted, jnp.zeros((1, 6), raw.dtype)]
            )
            grouped_raw = raw_pad[src.reshape(-1)].reshape(
                self.n_nets, capacity, 6
            )
            rgb, sigma = self._eval_grouped(grouped_raw, local_pts.shape[-1])
            # un-dispatch: sorted row j sits at slot skey*cap + rank
            rank = jnp.arange(bsz, dtype=jnp.int32) - first[
                jnp.clip(skey, 0, self.n_nets)
            ]
            kept = (skey < self.n_nets) & (rank < capacity)
            dest = jnp.where(kept, skey * capacity + rank, self.n_nets * capacity)
            # back to original order without a scatter: sort by perm.
            # rgb+sigma ride one 4-wide row so the un-dispatch is a
            # single wide-row gather (16 B rows at ~2.8 ns/row) instead
            # of a row gather plus an ~8 ns/row element gather for sigma
            # (tools/exp/exp_round5_gather2.py).
            _, dest_orig = jax.lax.sort((perm, dest), num_keys=1)
            out4 = jnp.concatenate(
                [rgb.reshape(-1, 3), sigma.reshape(-1, 1).astype(rgb.dtype)], -1
            )
            flat4 = jnp.concatenate(
                [out4, jnp.asarray([[0.0, 0.0, 0.0, -1e3]], out4.dtype)], 0
            )
            o4 = flat4[dest_orig]
            return o4[:, :3], o4[:, 3].astype(sigma.dtype)

        dest, keep, order = moe_dispatch(net_idx, self.n_nets, capacity)

        # Scatter the RAW 6-dim (pts, dirs) into the capacity buffer and
        # positional-encode after grouping: the full-batch [B, ~90]
        # encoding never materializes (15x less scatter traffic; at
        # inference chunk sizes it was the peak-HBM allocation). Identical
        # math for kept points; unused slots' encodings are discarded by
        # the gather-back.
        buf = jnp.zeros((self.n_nets * capacity + 1, 6), raw.dtype)
        buf = buf.at[dest].set(jnp.where(keep[:, None], raw[order], 0.0))
        grouped_raw = buf[:-1].reshape(self.n_nets, capacity, 6)
        rgb, sigma = self._eval_grouped(grouped_raw, local_pts.shape[-1])

        # gather back to point order
        flat_rgb = jnp.concatenate(
            [rgb.reshape(-1, 3), jnp.zeros((1, 3), rgb.dtype)], 0
        )
        flat_sigma = jnp.concatenate([sigma.reshape(-1), jnp.zeros((1,), sigma.dtype)])
        out_rgb = jnp.zeros((bsz, 3), rgb.dtype).at[order].set(
            jnp.where(keep[:, None], flat_rgb[dest], 0.0)
        )
        out_sigma = jnp.full((bsz,), -1e3, sigma.dtype).at[order].set(
            jnp.where(keep, flat_sigma[dest], -1e3)
        )
        return out_rgb, out_sigma

    def _eval_grouped(self, grouped_raw: jnp.ndarray, pts_dim: int = 3):
        """[N_nets, cap, 6] raw (pts, dirs) -> (rgb [N,cap,3], sigma [N,cap])."""
        grouped = jnp.concatenate(
            [
                posenc(grouped_raw[..., :pts_dim], self.multires),
                posenc(grouped_raw[..., pts_dim:], self.multires_dirs),
            ],
            -1,
        )
        pts_ch = pts_dim * (1 + 2 * self.multires)
        h = grouped[..., :pts_ch]
        for i in range(self.n_hidden_layers):
            h = self._bmm_layer(f"hidden_{i}", h, self.hidden)
        sigma = self._bmm_layer("sigma", h, 1, relu=False)[..., 0]
        feat = self._bmm_layer("feature", h, self.hidden, relu=False)
        hd = nn.relu(jnp.concatenate([feat, grouped[..., pts_ch:]], axis=-1))
        hd = self._bmm_layer("color_hidden", hd, self.hidden)
        rgb = self._bmm_layer("rgb", hd, 3, relu=False)
        return rgb, sigma


class GroupedMultiMLP(nn.Module):
    """Multi-network eval over pre-grouped examples [N_nets, E, ...].

    The distill phase generates examples *per node domain*, so no MoE
    dispatch is needed — every network sees exactly its own E examples
    (KiloNerfNodeDataset semantics, kilonerf_node_dataset.py:74-100).
    Parameter names match MultiNetworkMLP layer-for-layer so fitted
    per-node weights transfer directly into the finetune field.
    """

    n_nets: int
    hidden: int = 32
    n_hidden_layers: int = 2
    multires: int = 10
    multires_dirs: int = 4
    dtype: Any = jnp.float32

    # reuse MultiNetworkMLP's batched per-net layer
    _bmm_layer = MultiNetworkMLP._bmm_layer

    @nn.compact
    def __call__(
        self, local_pts: jnp.ndarray, dirs: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """local_pts [N,E,3] in [-1,1], dirs [N,E,3] -> (rgb [N,E,3],
        sigma [N,E]) — raw (pre-activation) values, like the teacher's."""
        h = posenc(local_pts, self.multires)
        d = posenc(dirs, self.multires_dirs)
        for i in range(self.n_hidden_layers):
            h = self._bmm_layer(f"hidden_{i}", h, self.hidden)
        sigma = self._bmm_layer("sigma", h, 1, relu=False)[..., 0]
        feat = self._bmm_layer("feature", h, self.hidden, relu=False)
        hd = nn.relu(jnp.concatenate([feat, d], axis=-1))
        hd = self._bmm_layer("color_hidden", hd, self.hidden)
        rgb = self._bmm_layer("rgb", hd, 3, relu=False)
        return rgb, sigma

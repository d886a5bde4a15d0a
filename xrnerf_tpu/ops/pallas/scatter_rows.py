"""Row scatter-add for hash-table gradients.

The transpose of a row gather is a scatter-add. XLA lowers
``zeros.at[idx].add(vals)`` to a serialized HBM scatter measured at
~80 ns/row on v5e with chained-scalar-forced timing
(docs/benchmark.md "Measurement caveat (round 3)") — the row-count
bound cost of NGP training on TPU, standing in for the atomicAdd that
tiny-cuda-nn's backward uses on GPU (reference call site:
``/root/reference/xrnerf/models/mlps/hashnerf_mlp.py:36-45``).

DEFAULT PATH: XLA scatter-add. The VMEM-resident Pallas kernel in this
module keeps the accumulator table on-chip and RMWs rows in a serial
scalar loop; honest re-measurement (round 3, tools/exp/exp_round3_vertex4.py
methodology) puts it at ~95-130 ns/row at the NGP shapes — SLOWER than
XLA's scatter, because the loop is scalar-issue-bound, not
HBM-latency-bound (K-way accumulator unrolling does not help). Earlier
"~37 ns/row" / "~12 ns/row" figures were relay-timing artifacts and are
retracted. The kernel is kept behind ``XRNERF_PALLAS_SCATTER=1`` for
future Mosaic improvements and for its tests; the real win on this op
is algorithmic (row dedup before the scatter — see
``dedup_segment_sum`` in hashenc's vertex backward), not kernel-level.

The Pallas path's VMEM constraint, when enabled: the accumulator block
is lane-padded to 128 lanes, occupying ``num_rows*max(row_width,128)*4``
bytes; shapes past the scoped-VMEM cap fall back to XLA. Non-TPU
backends (CPU tests, virtual meshes) always use XLA's scatter-add,
which also keeps the op GSPMD-partitionable in multi-chip dry runs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend is absent on CPU-only installs
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None

_TILE = 1024  # indices per grid step (SMEM block: 4 KB of int32)

# Opt-in: route TPU scatters through the Pallas VMEM kernel instead of
# XLA's scatter-add (measured slower at NGP shapes; module docstring).
import os as _os

_PALLAS_SCATTER = bool(_os.environ.get("XRNERF_PALLAS_SCATTER"))

# Per-kernel scoped-VMEM ceiling we are willing to request. v5e/v5p
# have 128 MB of VMEM; leaving ~1/4 headroom for Mosaic scratch and the
# double-buffered value tiles keeps compilation robust.
_VMEM_CAP_BYTES = 96 * 1024 * 1024


def _vmem_bytes(num_rows: int, w: int, itemsize: int) -> int:
    """Scoped-VMEM footprint: lane-padded accumulator + double-buffered
    value tiles (idx tiles live in SMEM)."""
    lanes = max(((w + 127) // 128) * 128, 128)
    return (num_rows + 2 * _TILE) * lanes * itemsize


def _kernel(idx_ref, vals_ref, acc_ref):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    def body(i, carry):
        r = idx_ref[i]
        # negative id = caller-flagged zero row (masked/dead sample):
        # skipping the serial RMW costs ~2 cycles instead of ~11, a
        # near-2x win at typical NGP live fractions.
        @pl.when(r >= 0)
        def _():
            acc_ref[pl.ds(r, 1), :] = (
                acc_ref[pl.ds(r, 1), :] + vals_ref[pl.ds(i, 1), :]
            )

        return carry

    jax.lax.fori_loop(0, _TILE, body, 0)


def _pallas_scatter_add_rows(
    idx: jnp.ndarray, vals: jnp.ndarray, num_rows: int, interpret: bool = False
) -> jnp.ndarray:
    n, w = vals.shape
    pad = (-n) % _TILE
    if pad:
        # zero-valued padding rows may target any row id harmlessly
        idx = jnp.concatenate([idx, jnp.zeros((pad,), idx.dtype)])
        vals = jnp.concatenate([vals, jnp.zeros((pad, w), vals.dtype)])
        n += pad
    kw = {}
    if pltpu is not None and not interpret:
        smem, vmem = pltpu.SMEM, pltpu.VMEM
        in_specs = [
            pl.BlockSpec((_TILE,), lambda g: (g,), memory_space=smem),
            pl.BlockSpec((_TILE, w), lambda g: (g, 0), memory_space=vmem),
        ]
        out_specs = pl.BlockSpec((num_rows, w), lambda g: (0, 0), memory_space=vmem)
        need = _vmem_bytes(num_rows, w, vals.dtype.itemsize)
        # NOTE: allow_input_fusion=[False, True] (fusing the value-row
        # producer into the kernel operand) compiles standalone but hits
        # a Mosaic RET_CHECK ("marked for dematerialization has
        # complicated access") when the pallas_call sits inside a
        # lax.scan body — so value rows are materialized. The callers
        # keep peak HBM bounded by packing strictly per level.
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=min(need + 8 * 1024 * 1024, _VMEM_CAP_BYTES),
        )
    else:
        in_specs = [
            pl.BlockSpec((_TILE,), lambda g: (g,)),
            pl.BlockSpec((_TILE, w), lambda g: (g, 0)),
        ]
        out_specs = pl.BlockSpec((num_rows, w), lambda g: (0, 0))
        kw["interpret"] = True
    return pl.pallas_call(
        _kernel,
        grid=(n // _TILE,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=jax.ShapeDtypeStruct((num_rows, w), vals.dtype),
        **kw,
    )(idx, vals)


# Below this many update rows, one XLA scatter beats the sorted-segment
# pipeline's fixed costs (3 sorts + cumsum); above it, the scatter-free
# path's ~7 ns/row wins over scatter's ~42 (tools/exp/exp_round4_scatter.py).
_SORTED_SEGMENT_MIN_ROWS = 1 << 16


def _scatter_local(idx: jnp.ndarray, vals: jnp.ndarray, num_rows: int) -> jnp.ndarray:
    # gate includes the 8 MB Mosaic-scratch headroom the kernel requests
    # on top of its footprint, so the XLA fallback always triggers before
    # the request would exceed the cap (a compile failure is not a
    # fallback)
    if (
        _PALLAS_SCATTER
        and jax.default_backend() == "tpu"
        and _vmem_bytes(num_rows, vals.shape[-1], vals.dtype.itemsize)
        + 8 * 1024 * 1024
        <= _VMEM_CAP_BYTES
    ):
        return _pallas_scatter_add_rows(idx, vals, num_rows)
    if (
        jax.default_backend() == "tpu"
        and idx.shape[0] >= _SORTED_SEGMENT_MIN_ROWS
    ):
        from ..sorted_segment import dense_segment_grad

        return dense_segment_grad(idx, vals, num_rows)
    # mode='drop' discards rows flagged -1 (skip_zero_rows) instead of
    # wrapping negative indices
    return (
        jnp.zeros((num_rows, vals.shape[-1]), vals.dtype)
        .at[idx]
        .add(vals, mode="drop")
    )


# Optional mesh context for multi-chip scatters: (Mesh, axis_name). The
# Pallas kernel is opaque to GSPMD, which would otherwise all-gather the
# (data-sharded) update rows and run it replicated on every chip. With a
# mesh registered, scatter_add_rows shard_maps over that axis instead:
# each device scatters only its local rows into a local partial table,
# and one psum produces the replicated gradient — the "psum of partial
# tables" design, with the heavy row traffic staying chip-local.
_SCATTER_MESH: tuple | None = None


def set_scatter_mesh(mesh, axis: str = "data") -> None:
    """Register (or clear, with ``mesh=None``) the mesh used to
    partition hash-table gradient scatters across chips."""
    global _SCATTER_MESH
    _SCATTER_MESH = None if mesh is None else (mesh, axis)


def scatter_add_rows(
    idx: jnp.ndarray,
    vals: jnp.ndarray,
    num_rows: int,
    skip_zero_rows: bool = False,
) -> jnp.ndarray:
    """``out[idx[i], :] += vals[i, :]`` over a fresh [num_rows, W] zeros.

    idx: [N] int32 row ids in [0, num_rows); vals: [N, W] float. Uses
    XLA's scatter-add (the measured-fastest path; module docstring), or
    the VMEM Pallas kernel when XRNERF_PALLAS_SCATTER=1; with a
    registered mesh (set_scatter_mesh) the rows are processed shard-local
    with a single psum of partial tables. ``skip_zero_rows`` flags
    all-zero value rows (dead marched samples) as -1 so they are dropped
    (XLA mode='drop') or skipped (Pallas serial RMW).
    """
    if skip_zero_rows:
        nonzero = jnp.any(vals != 0.0, axis=-1)
        idx = jnp.where(nonzero, idx, -1)
    if _SCATTER_MESH is not None:
        mesh, ax = _SCATTER_MESH
        n_shards = mesh.shape.get(ax, 1)
        if n_shards > 1 and idx.shape[0] % n_shards == 0:
            from functools import partial as _partial

            from jax.experimental.shard_map import shard_map
            from jax.sharding import PartitionSpec as P

            @_partial(
                shard_map,
                mesh=mesh,
                in_specs=(P(ax), P(ax, None)),
                out_specs=P(None, None),
            )
            def _sharded(i, v):
                return jax.lax.psum(_scatter_local(i, v, num_rows), ax)

            return _sharded(idx, vals)
    return _scatter_local(idx, vals, num_rows)

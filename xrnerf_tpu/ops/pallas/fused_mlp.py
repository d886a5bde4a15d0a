"""Fused tiny-MLP Pallas kernels (the tcnn FullyFusedMLP replacement).

Parity target: tiny-cuda-nn's ``FullyFusedMLP`` used by the reference's
Instant-NGP field (``/root/reference/xrnerf/models/mlps/hashnerf_mlp.py:
60-77`` — 64-wide density MLP with 1 hidden layer and color MLP with 2).

TPU design: the whole layer chain runs inside ONE kernel per row-tile —
weights (64x64ish, a few KB) sit in VMEM for the entire grid sweep and
activations never round-trip to HBM between layers. Each grid step
processes a [TILE_N, d_in] row block: matmul on the MXU
(``preferred_element_type=f32``), bias+ReLU on the VPU, next matmul —
exactly the fusion tcnn hand-writes in CUDA, expressed as a Pallas
program. The backward recomputes the (cheap) hidden activations instead
of saving them, and accumulates weight grads across row tiles in a VMEM
block that every grid step maps to (the TPU grid is sequential, so
read-modify-write accumulation is race-free).

Numerics: inputs/weights are cast to bf16 for the MXU, accumulation in
fp32 (same as tcnn's fp16 storage/fp32 accumulate split).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend is absent on CPU-only installs
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None

TILE_N = 512


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pad_rows(x: jnp.ndarray, tile: int) -> Tuple[jnp.ndarray, int]:
    n = x.shape[0]
    pad = (-n) % tile
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], 0)
    return x, n


def _bspec(block=None, index_map=None):
    kw = {"memory_space": _VMEM} if _VMEM is not None else {}
    if block is None:
        return pl.BlockSpec(**kw)
    return pl.BlockSpec(block, index_map, **kw)


# ---------------------------------------------------------------------------
# 2-layer chain: out = relu(x@w1 + b1) @ w2 + b2
# ---------------------------------------------------------------------------
def _fwd2_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    x = x_ref[:].astype(jnp.bfloat16)
    h = (
        jnp.dot(x, w1_ref[:].astype(jnp.bfloat16), preferred_element_type=jnp.float32)
        + b1_ref[:]
    )
    h = jnp.maximum(h, 0.0).astype(jnp.bfloat16)
    o_ref[:] = (
        jnp.dot(h, w2_ref[:].astype(jnp.bfloat16), preferred_element_type=jnp.float32)
        + b2_ref[:]
    )


def _bwd2_kernel(x_ref, w1_ref, b1_ref, w2_ref, g_ref,
                 dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref):
    x = x_ref[:].astype(jnp.bfloat16)
    w1 = w1_ref[:].astype(jnp.bfloat16)
    w2 = w2_ref[:].astype(jnp.bfloat16)
    g = g_ref[:]

    pre = (
        jnp.dot(x, w1, preferred_element_type=jnp.float32) + b1_ref[:]
    )
    h = jnp.maximum(pre, 0.0)

    gb = g.astype(jnp.bfloat16)
    dh = jnp.dot(gb, w2.T, preferred_element_type=jnp.float32)
    dpre = jnp.where(pre > 0.0, dh, 0.0)
    dpre_b = dpre.astype(jnp.bfloat16)

    dx_ref[:] = jnp.dot(dpre_b, w1.T, preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)

    dw1_ref[:] += jnp.dot(x.T, dpre_b, preferred_element_type=jnp.float32)
    db1_ref[:] += jnp.sum(dpre, axis=0, keepdims=True)
    dw2_ref[:] += jnp.dot(
        h.astype(jnp.bfloat16).T, gb, preferred_element_type=jnp.float32
    )
    db2_ref[:] += jnp.sum(g, axis=0, keepdims=True)


@jax.custom_vjp
def fused_mlp2(x, w1, b1, w2, b2):
    """relu(x@w1+b1)@w2+b2 as one fused kernel. x [N, d_in] fp32;
    weights fp32 (bf16 compute). Returns [N, d_out] fp32."""
    return _fused2_fwd_impl(x, w1, b1, w2, b2)


def _fused2_fwd_impl(x, w1, b1, w2, b2):
    xp, n = _pad_rows(x.astype(jnp.float32), TILE_N)
    grid = (xp.shape[0] // TILE_N,)
    out = pl.pallas_call(
        _fwd2_kernel,
        grid=grid,
        in_specs=[
            _bspec((TILE_N, x.shape[1]), lambda i: (i, 0)),
            _bspec((w1.shape[0], w1.shape[1]), lambda i: (0, 0)),
            _bspec((1, b1.shape[0]), lambda i: (0, 0)),
            _bspec((w2.shape[0], w2.shape[1]), lambda i: (0, 0)),
            _bspec((1, b2.shape[0]), lambda i: (0, 0)),
        ],
        out_specs=_bspec((TILE_N, w2.shape[1]), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((xp.shape[0], w2.shape[1]), jnp.float32),
        interpret=_use_interpret(),
    )(xp, w1, b1[None], w2, b2[None])
    return out[:n]


def _fused2_fwd(x, w1, b1, w2, b2):
    return _fused2_fwd_impl(x, w1, b1, w2, b2), (x, w1, b1, w2, b2)


def _fused2_bwd(res, g):
    x, w1, b1, w2, b2 = res
    xp, n = _pad_rows(x.astype(jnp.float32), TILE_N)
    gp, _ = _pad_rows(g.astype(jnp.float32), TILE_N)
    grid = (xp.shape[0] // TILE_N,)
    d_in, hdim = w1.shape
    d_out = w2.shape[1]
    dx, dw1, db1, dw2, db2 = pl.pallas_call(
        _bwd2_kernel,
        grid=grid,
        in_specs=[
            _bspec((TILE_N, d_in), lambda i: (i, 0)),
            _bspec((d_in, hdim), lambda i: (0, 0)),
            _bspec((1, hdim), lambda i: (0, 0)),
            _bspec((hdim, d_out), lambda i: (0, 0)),
            _bspec((TILE_N, d_out), lambda i: (i, 0)),
        ],
        out_specs=[
            _bspec((TILE_N, d_in), lambda i: (i, 0)),
            _bspec((d_in, hdim), lambda i: (0, 0)),
            _bspec((1, hdim), lambda i: (0, 0)),
            _bspec((hdim, d_out), lambda i: (0, 0)),
            _bspec((1, d_out), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((xp.shape[0], d_in), jnp.float32),
            jax.ShapeDtypeStruct((d_in, hdim), jnp.float32),
            jax.ShapeDtypeStruct((1, hdim), jnp.float32),
            jax.ShapeDtypeStruct((hdim, d_out), jnp.float32),
            jax.ShapeDtypeStruct((1, d_out), jnp.float32),
        ],
        interpret=_use_interpret(),
    )(xp, w1, b1[None], w2, gp)
    return dx[:n].astype(x.dtype), dw1, db1[0], dw2, db2[0]


fused_mlp2.defvjp(_fused2_fwd, _fused2_bwd)


# ---------------------------------------------------------------------------
# 3-layer chain: out = relu(relu(x@w1+b1)@w2+b2)@w3+b3
# ---------------------------------------------------------------------------
def _fwd3_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, o_ref):
    x = x_ref[:].astype(jnp.bfloat16)
    h1 = jnp.maximum(
        jnp.dot(x, w1_ref[:].astype(jnp.bfloat16), preferred_element_type=jnp.float32)
        + b1_ref[:],
        0.0,
    ).astype(jnp.bfloat16)
    h2 = jnp.maximum(
        jnp.dot(h1, w2_ref[:].astype(jnp.bfloat16), preferred_element_type=jnp.float32)
        + b2_ref[:],
        0.0,
    ).astype(jnp.bfloat16)
    o_ref[:] = (
        jnp.dot(h2, w3_ref[:].astype(jnp.bfloat16), preferred_element_type=jnp.float32)
        + b3_ref[:]
    )


def _bwd3_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, g_ref,
                 dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, dw3_ref, db3_ref):
    x = x_ref[:].astype(jnp.bfloat16)
    w1 = w1_ref[:].astype(jnp.bfloat16)
    w2 = w2_ref[:].astype(jnp.bfloat16)
    w3 = w3_ref[:].astype(jnp.bfloat16)
    g = g_ref[:]

    pre1 = jnp.dot(x, w1, preferred_element_type=jnp.float32) + b1_ref[:]
    h1 = jnp.maximum(pre1, 0.0)
    h1b = h1.astype(jnp.bfloat16)
    pre2 = jnp.dot(h1b, w2, preferred_element_type=jnp.float32) + b2_ref[:]
    h2 = jnp.maximum(pre2, 0.0)
    h2b = h2.astype(jnp.bfloat16)

    gb = g.astype(jnp.bfloat16)
    dh2 = jnp.dot(gb, w3.T, preferred_element_type=jnp.float32)
    dpre2 = jnp.where(pre2 > 0.0, dh2, 0.0)
    dpre2_b = dpre2.astype(jnp.bfloat16)
    dh1 = jnp.dot(dpre2_b, w2.T, preferred_element_type=jnp.float32)
    dpre1 = jnp.where(pre1 > 0.0, dh1, 0.0)
    dpre1_b = dpre1.astype(jnp.bfloat16)

    dx_ref[:] = jnp.dot(dpre1_b, w1.T, preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)
        dw3_ref[:] = jnp.zeros_like(dw3_ref)
        db3_ref[:] = jnp.zeros_like(db3_ref)

    dw1_ref[:] += jnp.dot(x.T, dpre1_b, preferred_element_type=jnp.float32)
    db1_ref[:] += jnp.sum(dpre1, axis=0, keepdims=True)
    dw2_ref[:] += jnp.dot(h1b.T, dpre2_b, preferred_element_type=jnp.float32)
    db2_ref[:] += jnp.sum(dpre2, axis=0, keepdims=True)
    dw3_ref[:] += jnp.dot(h2b.T, gb, preferred_element_type=jnp.float32)
    db3_ref[:] += jnp.sum(g, axis=0, keepdims=True)


@jax.custom_vjp
def fused_mlp3(x, w1, b1, w2, b2, w3, b3):
    """Two hidden ReLU layers + linear out, fused. Returns fp32 [N, d_out]."""
    return _fused3_fwd_impl(x, w1, b1, w2, b2, w3, b3)


def _fused3_fwd_impl(x, w1, b1, w2, b2, w3, b3):
    xp, n = _pad_rows(x.astype(jnp.float32), TILE_N)
    grid = (xp.shape[0] // TILE_N,)
    out = pl.pallas_call(
        _fwd3_kernel,
        grid=grid,
        in_specs=[
            _bspec((TILE_N, x.shape[1]), lambda i: (i, 0)),
            _bspec((w1.shape[0], w1.shape[1]), lambda i: (0, 0)),
            _bspec((1, b1.shape[0]), lambda i: (0, 0)),
            _bspec((w2.shape[0], w2.shape[1]), lambda i: (0, 0)),
            _bspec((1, b2.shape[0]), lambda i: (0, 0)),
            _bspec((w3.shape[0], w3.shape[1]), lambda i: (0, 0)),
            _bspec((1, b3.shape[0]), lambda i: (0, 0)),
        ],
        out_specs=_bspec((TILE_N, w3.shape[1]), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((xp.shape[0], w3.shape[1]), jnp.float32),
        interpret=_use_interpret(),
    )(xp, w1, b1[None], w2, b2[None], w3, b3[None])
    return out[:n]


def _fused3_fwd(x, w1, b1, w2, b2, w3, b3):
    return _fused3_fwd_impl(x, w1, b1, w2, b2, w3, b3), (x, w1, b1, w2, b2, w3, b3)


def _fused3_bwd(res, g):
    x, w1, b1, w2, b2, w3, b3 = res
    xp, n = _pad_rows(x.astype(jnp.float32), TILE_N)
    gp, _ = _pad_rows(g.astype(jnp.float32), TILE_N)
    grid = (xp.shape[0] // TILE_N,)
    d_in, h1d = w1.shape
    h2d = w2.shape[1]
    d_out = w3.shape[1]
    dx, dw1, db1, dw2, db2, dw3, db3 = pl.pallas_call(
        _bwd3_kernel,
        grid=grid,
        in_specs=[
            _bspec((TILE_N, d_in), lambda i: (i, 0)),
            _bspec((d_in, h1d), lambda i: (0, 0)),
            _bspec((1, h1d), lambda i: (0, 0)),
            _bspec((h1d, h2d), lambda i: (0, 0)),
            _bspec((1, h2d), lambda i: (0, 0)),
            _bspec((h2d, d_out), lambda i: (0, 0)),
            _bspec((TILE_N, d_out), lambda i: (i, 0)),
        ],
        out_specs=[
            _bspec((TILE_N, d_in), lambda i: (i, 0)),
            _bspec((d_in, h1d), lambda i: (0, 0)),
            _bspec((1, h1d), lambda i: (0, 0)),
            _bspec((h1d, h2d), lambda i: (0, 0)),
            _bspec((1, h2d), lambda i: (0, 0)),
            _bspec((h2d, d_out), lambda i: (0, 0)),
            _bspec((1, d_out), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((xp.shape[0], d_in), jnp.float32),
            jax.ShapeDtypeStruct((d_in, h1d), jnp.float32),
            jax.ShapeDtypeStruct((1, h1d), jnp.float32),
            jax.ShapeDtypeStruct((h1d, h2d), jnp.float32),
            jax.ShapeDtypeStruct((1, h2d), jnp.float32),
            jax.ShapeDtypeStruct((h2d, d_out), jnp.float32),
            jax.ShapeDtypeStruct((1, d_out), jnp.float32),
        ],
        interpret=_use_interpret(),
    )(xp, w1, b1[None], w2, b2[None], w3, gp)
    return (
        dx[:n].astype(x.dtype),
        dw1, db1[0], dw2, db2[0], dw3, db3[0],
    )


fused_mlp3.defvjp(_fused3_fwd, _fused3_bwd)

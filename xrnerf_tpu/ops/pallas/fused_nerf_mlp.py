"""Fully-fused vanilla-NeRF MLP as one Pallas TPU kernel.

Parity target: ``NerfMLP``
(``/root/reference/xrnerf/models/mlps/nerf_mlp.py:12-94``): 8x256 trunk
with an input skip-concat at layer 4, alpha/feature heads off the trunk,
and a width/2 view-conditioned rgb branch. The reference evaluates this
with cuBLAS layer-by-layer (plus a ``netchunk`` host loop); XLA does the
same thing better, but at NeRF batch sizes (~10^6 points x 256 features)
every layer round-trips ~1.6 GB of activations through HBM, which is the
actual bottleneck on TPU (the matmuls themselves are tiny by MXU
standards).

TPU design: ONE kernel evaluates the entire network per [TILE_N] row
block — all weights (~0.6M params, ~1.2 MB bf16) stay resident in VMEM
across the whole grid sweep and activations never leave VMEM between
layers. Matmuls run on the MXU in bf16 with f32 accumulation
(``preferred_element_type``), element-wise ReLU on the VPU. The skip
concat is expressed as a split matmul (``h@W_h + x@W_x``) so no
unaligned concatenated operand is materialized. The custom VJP
recomputes the (cheap, compute-bound) hidden activations inside the
backward kernel instead of saving them — the classic remat trade — and
accumulates weight grads across row tiles in VMEM blocks that every grid
step maps to (the TPU grid is sequential, so read-modify-write is
race-free).

Numerics: bf16 operands / f32 accumulation — the same split tcnn's
FullyFusedMLP uses (fp16 storage, fp32 accumulate). Params remain f32
master copies outside the kernel; weight matrices are cast to bf16 ONCE
in XLA before the kernel (biases stay f32 — they add into the f32
accumulators), so the kernel holds half the weight VMEM and does no
per-grid-step casting. Backward transposed matmuls are written as
``dot_general`` contractions over the transposed dims rather than
explicit ``.T`` relayouts.

Measured (v5e, 4096 rays x 64+192 samples, full train step): 56.5 ms —
linear in MLP points across ablations (64/192/256-sample steps all at
~0.22 ms per 4096-sample slab), i.e. the step is entirely MLP-bound and
the sampler/PDF/compositing cost ~1 ms combined. TILE_BWD is VMEM-bound:
1024-row backward tiles exceed the ~16 MB/core VMEM (activations 9x
[T,256] bf16 + f32 grad accumulators + weights); 512 is the optimum
(256 measured 7% slower, 768 ~1% slower).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend is absent on CPU-only installs
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None

TILE_FWD = 2048
TILE_BWD = 512

_BF = jnp.bfloat16
_F32 = jnp.float32

# Packed head widths: feature(width) | alpha(1) | pad -> next 128 multiple
_RGB_W = 128
_OUT_W = 8  # rgb(3) | sigma(1) | pad(4)


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _bspec(block=None, index_map=None):
    kw = {"memory_space": _VMEM} if _VMEM is not None else {}
    if block is None:
        return pl.BlockSpec(**kw)
    return pl.BlockSpec(block, index_map, **kw)


def _pad_rows(x: jnp.ndarray, tile: int) -> Tuple[jnp.ndarray, int]:
    n = x.shape[0]
    pad = (-n) % tile
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], 0)
    return x, n


def _pad_cols(x: jnp.ndarray, to: int) -> jnp.ndarray:
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, to - x.shape[-1])])


def _ceil_to(n: int, m: int) -> int:
    return -(-n // m) * m


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------
_N_W = 24  # packed weight/bias operand count


def _unpack_wrefs(refs):
    (w0, b0, w1, b1, w2, b2, w3, b3, w4, b4,
     w5h, w5x, b5, w6, b6, w7, b7, waf, baf, wvf, wvv, bv, wrgb, brgb) = refs
    return (w0, b0, w1, b1, w2, b2, w3, b3, w4, b4,
            w5h, w5x, b5, w6, b6, w7, b7, waf, baf, wvf, wvv, bv, wrgb, brgb)


def _trunk_forward(x, v, ws, keep: bool):
    """Shared fwd math. x [T, PX] bf16, v [T, PV] bf16; returns the output
    [T, OUT_W] f32 plus (optionally) the bf16 hidden activations for the
    bwd. Only bf16 h's are kept (the ReLU mask is recovered as ``h > 0``),
    halving the bwd VMEM working set vs saving f32 pre-activations."""
    (w0, b0, w1, b1, w2, b2, w3, b3, w4, b4,
     w5h, w5x, b5, w6, b6, w7, b7, waf, baf, wvf, wvv, bv, wrgb, brgb) = ws

    def mm(a, w):
        return jnp.dot(a, w[:], preferred_element_type=_F32)

    hs = []
    h = jnp.maximum(mm(x, w0) + b0[:], 0.0).astype(_BF)
    hs.append(h)
    for w, b in ((w1, b1), (w2, b2), (w3, b3), (w4, b4)):
        h = jnp.maximum(mm(h, w) + b[:], 0.0).astype(_BF)
        hs.append(h)
    h = jnp.maximum(mm(h, w5h) + mm(x, w5x) + b5[:], 0.0).astype(_BF)
    hs.append(h)
    for w, b in ((w6, b6), (w7, b7)):
        h = jnp.maximum(mm(h, w) + b[:], 0.0).astype(_BF)
        hs.append(h)

    width = w1.shape[0]
    af = mm(h, waf) + baf[:]  # [T, AF_W]: feature(width) | alpha(1) | pad
    feat = af[:, :width].astype(_BF)
    sigma = af[:, width : width + 1]
    v1 = jnp.maximum(mm(feat, wvf) + mm(v, wvv) + bv[:], 0.0).astype(_BF)
    rgb = mm(v1, wrgb) + brgb[:]  # [T, 128]; cols 3+ are zero by pack
    t = x.shape[0]
    out = jnp.concatenate(
        [rgb[:, :3], sigma, jnp.zeros((t, _OUT_W - 4), _F32)], axis=-1
    )
    if keep:
        return out, hs, feat, v1
    return out


def _fwd_kernel(*refs):
    x_ref, v_ref = refs[0], refs[1]
    ws = _unpack_wrefs(refs[2 : 2 + _N_W])
    o_ref = refs[2 + _N_W]
    x = x_ref[:].astype(_BF)
    v = v_ref[:].astype(_BF)
    o_ref[:] = _trunk_forward(x, v, ws, keep=False)


def _bwd_kernel(*refs):
    x_ref, v_ref = refs[0], refs[1]
    ws = refs[2 : 2 + _N_W]
    g_ref = refs[2 + _N_W]
    outs = refs[3 + _N_W :]
    (dx_ref, dv_ref,
     dw0, db0, dw1, db1, dw2, db2, dw3, db3, dw4, db4,
     dw5h, dw5x, db5, dw6, db6, dw7, db7, dwaf, dbaf,
     dwvf, dwvv, dbv, dwrgb, dbrgb) = outs
    (w0, b0, w1, b1, w2, b2, w3, b3, w4, b4,
     w5h, w5x, b5, w6, b6, w7, b7, waf, baf, wvf, wvv, bv, wrgb, brgb) = (
        _unpack_wrefs(ws)
    )

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in outs[2:]:
            r[:] = jnp.zeros_like(r)

    x = x_ref[:].astype(_BF)
    v = v_ref[:].astype(_BF)
    t = x.shape[0]

    # --- recompute forward, keeping bf16 activations (remat) ---
    _, hs, feat, v1 = _trunk_forward(x, v, _unpack_wrefs(ws), keep=True)
    width = w1.shape[0]
    af_w = waf.shape[1]

    def mm(a, w):
        return jnp.dot(a, w, preferred_element_type=_F32)

    def mm_tt(a, b):
        # a.T @ b as a contraction over dim 0 of both operands — Mosaic
        # feeds the MXU directly instead of materializing a VMEM
        # transpose of the [T, width] activation first.
        return jax.lax.dot_general(
            a, b, (((0,), (0,)), ((), ())), preferred_element_type=_F32
        )

    def mm_nt(a, b):
        # a @ b.T (contraction over dim 1 of both) — same reasoning for
        # the weight transposes in the dgrad chain.
        return jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())), preferred_element_type=_F32
        )

    g = g_ref[:]  # [T, 8] f32
    gr = jnp.concatenate([g[:, :3], jnp.zeros((t, _RGB_W - 3), _F32)], -1)
    grb = gr.astype(_BF)
    gsig = g[:, 3:4]

    # rgb head
    dwrgb[:] += mm_tt(v1, grb)
    dbrgb[:] += jnp.sum(gr, axis=0, keepdims=True)
    dv1 = mm_nt(grb, wrgb[:])
    dpre_v = jnp.where(v1.astype(_F32) > 0.0, dv1, 0.0)
    dpvb = dpre_v.astype(_BF)

    # view branch (split concat: feature part + viewdir part)
    dwvf[:] += mm_tt(feat, dpvb)
    dwvv[:] += mm_tt(v, dpvb)
    dbv[:] += jnp.sum(dpre_v, axis=0, keepdims=True)
    dfeat = mm_nt(dpvb, wvf[:])  # [T, 256]
    dv_ref[:] = mm_nt(dpvb, wvv[:])

    # packed feature|alpha head
    gaf = jnp.concatenate(
        [dfeat, gsig, jnp.zeros((t, af_w - width - 1), _F32)], -1
    )
    gafb = gaf.astype(_BF)
    dwaf[:] += mm_tt(hs[7], gafb)
    dbaf[:] += jnp.sum(gaf, axis=0, keepdims=True)
    dh = mm_nt(gafb, waf[:])

    # trunk layers 7, 6
    for wi, dwi, dbi, h_in, h_out in (
        (w7, dw7, db7, hs[6], hs[7]),
        (w6, dw6, db6, hs[5], hs[6]),
    ):
        dpre = jnp.where(h_out.astype(_F32) > 0.0, dh, 0.0)
        dpb = dpre.astype(_BF)
        dwi[:] += mm_tt(h_in, dpb)
        dbi[:] += jnp.sum(dpre, axis=0, keepdims=True)
        dh = mm_nt(dpb, wi[:])

    # layer 5 (skip: input is [x | h4] expressed as split matmuls)
    dpre = jnp.where(hs[5].astype(_F32) > 0.0, dh, 0.0)
    dpb = dpre.astype(_BF)
    dw5h[:] += mm_tt(hs[4], dpb)
    dw5x[:] += mm_tt(x, dpb)
    db5[:] += jnp.sum(dpre, axis=0, keepdims=True)
    dh = mm_nt(dpb, w5h[:])
    dx_acc = mm_nt(dpb, w5x[:])

    # trunk layers 4..1
    for wi, dwi, dbi, h_in, h_out in (
        (w4, dw4, db4, hs[3], hs[4]),
        (w3, dw3, db3, hs[2], hs[3]),
        (w2, dw2, db2, hs[1], hs[2]),
        (w1, dw1, db1, hs[0], hs[1]),
    ):
        dpre = jnp.where(h_out.astype(_F32) > 0.0, dh, 0.0)
        dpb = dpre.astype(_BF)
        dwi[:] += mm_tt(h_in, dpb)
        dbi[:] += jnp.sum(dpre, axis=0, keepdims=True)
        dh = mm_nt(dpb, wi[:])

    # layer 0
    dpre = jnp.where(hs[0].astype(_F32) > 0.0, dh, 0.0)
    dpb = dpre.astype(_BF)
    dw0[:] += mm_tt(x, dpb)
    db0[:] += jnp.sum(dpre, axis=0, keepdims=True)
    dx_ref[:] = dx_acc + mm_nt(dpb, w0[:])


# ---------------------------------------------------------------------------
# packed core with custom VJP
# ---------------------------------------------------------------------------
def _w_specs(shapes):
    return [_bspec(s, lambda i: (0, 0)) for s in shapes]


def _packed_shapes(px, pv, width, hv):
    af_w = _ceil_to(width + 1, 128)
    return [
        (px, width), (1, width),                 # w0, b0
        (width, width), (1, width),              # w1
        (width, width), (1, width),              # w2
        (width, width), (1, width),              # w3
        (width, width), (1, width),              # w4
        (width, width), (px, width), (1, width), # w5h, w5x, b5
        (width, width), (1, width),              # w6
        (width, width), (1, width),              # w7
        (width, af_w), (1, af_w),                # waf
        (width, hv), (pv, hv), (1, hv),          # wvf, wvv, bv
        (hv, _RGB_W), (1, _RGB_W),               # wrgb
    ]


def _cast_weights(packed):
    """bf16 weight matrices / f32 biases, cast ONCE in XLA before the
    kernel: the kernel then holds half the weight VMEM and does no
    per-grid-step casting. Biases (shape [1, n]) stay f32 — they add
    directly into the f32 matmul accumulators."""
    return tuple(
        p.astype(_BF) if p.shape[0] > 1 else p for p in packed
    )


@jax.custom_vjp
def _fused_core(xp, vp, *packed):
    return _fused_core_fwd_impl(xp, vp, *packed)


def _fused_core_fwd_impl(xp, vp, *packed):
    n, px = xp.shape
    pv = vp.shape[1]
    width = packed[2].shape[0]
    hv = packed[19].shape[1]
    xt, n_orig = _pad_rows(xp, TILE_FWD)
    vt, _ = _pad_rows(vp, TILE_FWD)
    grid = (xt.shape[0] // TILE_FWD,)
    out = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            _bspec((TILE_FWD, px), lambda i: (i, 0)),
            _bspec((TILE_FWD, pv), lambda i: (i, 0)),
            *_w_specs(_packed_shapes(px, pv, width, hv)),
        ],
        out_specs=_bspec((TILE_FWD, _OUT_W), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((xt.shape[0], _OUT_W), _F32),
        interpret=_use_interpret(),
    )(xt, vt, *_cast_weights(packed))
    return out[:n_orig]


def _fused_core_fwd(xp, vp, *packed):
    return _fused_core_fwd_impl(xp, vp, *packed), (xp, vp, packed)


def _fused_core_bwd(res, g):
    xp, vp, packed = res
    n, px = xp.shape
    pv = vp.shape[1]
    width = packed[2].shape[0]
    hv = packed[19].shape[1]
    xt, n_orig = _pad_rows(xp, TILE_BWD)
    vt, _ = _pad_rows(vp, TILE_BWD)
    gt, _ = _pad_rows(g.astype(_F32), TILE_BWD)
    grid = (xt.shape[0] // TILE_BWD,)
    wshapes = _packed_shapes(px, pv, width, hv)
    outs = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            _bspec((TILE_BWD, px), lambda i: (i, 0)),
            _bspec((TILE_BWD, pv), lambda i: (i, 0)),
            *_w_specs(wshapes),
            _bspec((TILE_BWD, _OUT_W), lambda i: (i, 0)),
        ],
        out_specs=[
            _bspec((TILE_BWD, px), lambda i: (i, 0)),
            _bspec((TILE_BWD, pv), lambda i: (i, 0)),
            *_w_specs(wshapes),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((xt.shape[0], px), _F32),
            jax.ShapeDtypeStruct((xt.shape[0], pv), _F32),
            *[jax.ShapeDtypeStruct(s, _F32) for s in wshapes],
        ],
        interpret=_use_interpret(),
    )(xt, vt, *_cast_weights(packed), gt)
    dx, dv = outs[0][:n_orig], outs[1][:n_orig]
    return (dx, dv, *outs[2:])


_fused_core.defvjp(_fused_core_fwd, _fused_core_bwd)


# ---------------------------------------------------------------------------
# public wrapper over the flax NerfMLP param tree
# ---------------------------------------------------------------------------
def fused_nerf_mlp(
    pts_enc: jnp.ndarray,
    views_enc: jnp.ndarray,
    params: Dict[str, Dict[str, jnp.ndarray]],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused NerfMLP forward: (raw_rgb [N,3], raw_sigma [N]).

    ``params`` uses the exact nn.Dense tree of
    :class:`xrnerf_tpu.models.fields.nerf_mlp.NerfMLP` (pts_0..pts_7,
    alpha, feature, views_0, rgb — each {kernel, bias}), so fused and
    unfused checkpoints are interchangeable. Packing/padding below is
    plain differentiable jnp, so grads to the original tree flow through
    this function around the custom-VJP core.

    Topology constraints (the reference default): netdepth=8, skip at
    layer 4, use_viewdirs=True.
    """
    din = pts_enc.shape[-1]
    dv = views_enc.shape[-1]
    width = params["pts_0"]["kernel"].shape[1]
    hv = params["views_0"]["kernel"].shape[1]
    px = _ceil_to(din, 64)
    pv = _ceil_to(dv, 32)

    def k(name):
        return params[name]["kernel"]

    def b(name):
        return params[name]["bias"][None]

    def padr(w, to):  # pad kernel rows (input dim)
        return jnp.pad(w, [(0, to - w.shape[0]), (0, 0)])

    af_w = _ceil_to(width + 1, 128)
    w5 = k("pts_5")  # [din+width, width]: rows 0:din = x part (concat order)
    waf = _pad_cols(
        jnp.concatenate([k("feature"), k("alpha")], axis=1), af_w
    )
    baf = _pad_cols(jnp.concatenate([b("feature"), b("alpha")], axis=1), af_w)
    wrgb = _pad_cols(k("rgb"), _RGB_W)
    brgb = _pad_cols(b("rgb"), _RGB_W)

    packed = (
        padr(k("pts_0"), px), b("pts_0"),
        k("pts_1"), b("pts_1"),
        k("pts_2"), b("pts_2"),
        k("pts_3"), b("pts_3"),
        k("pts_4"), b("pts_4"),
        w5[din:], padr(w5[:din], px), b("pts_5"),
        k("pts_6"), b("pts_6"),
        k("pts_7"), b("pts_7"),
        waf, baf,
        k("views_0")[:width], padr(k("views_0")[width:], pv), b("views_0"),
        wrgb, brgb,
    )
    xp = _pad_cols(pts_enc.astype(_F32), px)
    vp = _pad_cols(views_enc.astype(_F32), pv)
    out = _fused_core(xp, vp, *packed)
    return out[:, :3], out[:, 3]

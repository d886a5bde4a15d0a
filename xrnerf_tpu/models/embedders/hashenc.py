"""Multiresolution hash encoding (Instant-NGP) — TPU-native.

Replaces tiny-cuda-nn's HashGrid encoding that the reference wraps
(``/root/reference/xrnerf/models/mlps/hashnerf_mlp.py:36-45``: 16 levels,
2 features, 2^19 table, base res 16, per-level scale
``exp2(log2(2048*bound/16)/15)`` — ``hashnerf_mlp.py:17-20``).

Design: one stacked table param [L, T, F]; per level compute 8 corner
hashes and gather-interpolate. The forward is a pure gather + trilerp
(vectorized over all levels at once — a single [L*N*8] gather keeps the
TPU busy instead of 16 tiny ones); the backward realises tcnn's
atomicAdd semantics as a scatter-free sorted segment reduction on TPU
(ops/sorted_segment.py via scatter_add_rows; plain XLA scatter-add on
CPU/small shapes). Coarse levels whose dense grid fits under T use
injective (non-hashed) indexing, matching NGP's tied-grid behavior.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# NGP's spatial hash primes (pi1=1 for x).
_PRIMES = (1, 2654435761, 805459861)

# corner offsets of a cell, k fastest: [8, 3]
_CORNERS = tuple(
    (i, j, k) for i in (0, 1) for j in (0, 1) for k in (0, 1)
)


def per_level_scale(max_res: int, base_res: int, n_levels: int) -> float:
    """Growth factor b = exp2(log2(max_res/base_res)/(L-1)) (hashnerf_mlp.py:17-20)."""
    return float(np.exp2(np.log2(max_res / base_res) / max(n_levels - 1, 1)))


def _level_resolutions(base_res: int, scale: float, n_levels: int) -> np.ndarray:
    return np.floor(base_res * scale ** np.arange(n_levels)).astype(np.int64)


def _vertex_cells(x: jnp.ndarray, cfg) -> tuple:
    """x [N,3] in [0,1] -> (corner idx [L,N,8] int32, frac t [L,N,3]).

    Hashed index per level: injective for levels whose dense grid fits
    in the table, spatial hash otherwise (tcnn tied-grid behavior). The
    dense/hashed split is decided host-side in int64 (jax x64 is off;
    2048^3 overflows i32).
    """
    res, T, _ = cfg
    res_np = np.asarray(res, np.int64)
    res_f = jnp.asarray(res_np, x.dtype)[:, None, None]
    xl = x[None, :, :] * (res_f - 1.0)
    x0 = jnp.floor(xl)
    t = xl - x0  # trilerp fractions in [0,1)
    xi = x0.astype(jnp.int32)

    # Per-corner index computation from clipped per-axis coords: a
    # broadcasted [L, N, 8, 3] corner tensor pads its 3-minor dim to 128
    # lanes (42x) and OOMed the eval renderer at big chunks when XLA
    # materialized it; eight [L, N] computations never do.
    res_i = jnp.asarray(res_np, jnp.int32)[:, None]
    p = (
        np.int32(_PRIMES[0]),
        np.int32(np.uint32(_PRIMES[1]).view(np.int32)),
        np.int32(np.uint32(_PRIMES[2]).view(np.int32)),
    )
    ax = []  # ax[d] = (coord at offset 0, coord at offset 1), each [L, N]
    for d in range(3):
        c0 = jnp.clip(xi[..., d], 0, res_i - 1)
        c1 = jnp.clip(xi[..., d] + 1, 0, res_i - 1)
        ax.append((c0, c1))

    use_dense = jnp.asarray(res_np**3 <= T)[:, None]  # [L, 1]
    corners_idx = []
    for (i, j, k) in _CORNERS:
        cx, cy, cz = ax[0][i], ax[1][j], ax[2][k]
        dense_idx = cx + res_i * (cy + res_i * cz)
        # uint32-style wrap-around hash (tcnn semantics); int32 mul
        # wraps in XLA and jnp.mod returns a value in [0, T) even for
        # negatives.
        hash_idx = (cx * p[0] ^ cy * p[1] ^ cz * p[2]) % T
        corners_idx.append(jnp.where(use_dense, dense_idx % T, hash_idx))
    idx = jnp.stack(corners_idx, axis=-1).astype(jnp.int32)  # [L, N, 8]
    return idx, t


def _vertex_gather(table: jnp.ndarray, idx: jnp.ndarray, cfg) -> jnp.ndarray:
    """table [L,T,F], idx [L,N,8] -> corner feats [L,N,8,F].

    Per-level takes from the [T, F] slices: gather cost rises with the
    gathered table's size, and a 4 MB per-level table beats the 67 MB
    flat [L*T, F] view by ~26% (85.3 vs 114.8 ms at the 16.8M-row step
    shape, tools/exp/exp_round5_vertex.py; the round-4 flat-view result held
    only against level-batched take_along_axis, which is worse than
    either). Unrolled python loop — XLA fuses the L takes into one
    program; batched/stacked formulations all measured slower."""
    _, T, F = cfg
    L, n, _ = idx.shape
    outs = [
        jnp.take(table[l], idx[l].reshape(-1), axis=0) for l in range(L)
    ]
    return jnp.stack(outs).reshape(L, n, 8, F)


def _vertex_impl(table, x, cfg):
    _, _, F = cfg
    n = x.shape[0]
    idx, t = _vertex_cells(x, cfg)
    feats = _vertex_gather(table, idx, cfg)
    w8 = _corner_weights(t)  # [L, N, 8]
    out = jnp.sum(feats * w8[..., None], axis=2)  # [L, N, F]
    L = idx.shape[0]
    return jnp.moveaxis(out, 0, 1).reshape(n, L * F)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _vertex_lookup(table, x, cfg):
    return _vertex_impl(table, x, cfg)


def _vertex_fwd(table, x, cfg):
    # Residuals save the corner indices, fractions AND gathered rows:
    # at the step shape they total ~300 MB of HBM, read back at
    # bandwidth (<1 ms), whereas rematerializing them in the backward
    # repeats the 16.8M-row gather (~85 ms) plus the cell/hash chain
    # (~11 ms) — round 4 had this trade backwards
    # (tools/exp/exp_round5_vertex.py rates).
    idx, t = _vertex_cells(x, cfg)
    feats = _vertex_gather(table, idx, cfg)
    w8 = _corner_weights(t)
    out = jnp.sum(feats * w8[..., None], axis=2)  # [L, N, F]
    n = x.shape[0]
    L = idx.shape[0]
    F = cfg[2]
    return jnp.moveaxis(out, 0, 1).reshape(n, L * F), (idx, t, feats)


def _splat_dense_level(i0, i7, tl, gl, res, F, chunk=32768):
    """Separable trilinear splat: dense [res^3, F] table gradient via two
    chained MXU matmuls — no sort, no scatter.

    For a DENSE level the 8-corner accumulation factorizes per axis:
      out[i,j,k,f] = sum_n Ax[n,i] * Ay[n,j] * Az[n,k] * g[n,f]
    with Ax[n,i] = (i==cx0)(1-tx) + (i==cx1)tx (2 nonzeros; collapsing
    corners at the clip boundary sum to 1 additively, matching the
    gather semantics). Contract as ([res^2, N] @ [N, res*F]) with
    WXY[n,(i,j)] = Ax*Ay and B[n,(k,f)] = Az*g — ~160 GFLOP f32 for
    res=67 vs ~12 ms of sort/merge/cumsum per level in the sorted-
    segment path (tools/exp/exp_round5_vertex3.py pieces). Chunked over n to
    bound the [chunk, res^2] temporary. The hash levels keep the
    sorted-segment reduction (no separable structure to exploit).

    i0/i7: corner-(0,0,0)/(1,1,1) flat indices [N] (decode the clipped
    per-axis coords); tl: fractions [N, 3]; gl: [N, F] f32.
    """
    n = i0.shape[0]
    r = res
    cx0, cy0, cz0 = i0 % r, (i0 // r) % r, i0 // (r * r)
    cx7, cy7, cz7 = i7 % r, (i7 // r) % r, i7 // (r * r)
    pad = (-n) % chunk
    if pad:
        z = jnp.zeros((pad,), i0.dtype)
        cx0, cy0, cz0 = (
            jnp.concatenate([a, z]) for a in (cx0, cy0, cz0)
        )
        cx7, cy7, cz7 = (
            jnp.concatenate([a, z]) for a in (cx7, cy7, cz7)
        )
        tl = jnp.concatenate([tl, jnp.zeros((pad, 3), tl.dtype)])
        gl = jnp.concatenate([gl, jnp.zeros((pad, F), gl.dtype)])
    nc = (n + pad) // chunk
    ar = jnp.arange(r, dtype=jnp.int32)

    def axis_mat(c0, c1, t):  # [C], [C], [C] -> [C, r]
        oh0 = (ar[None, :] == c0[:, None]).astype(jnp.float32)
        oh1 = (ar[None, :] == c1[:, None]).astype(jnp.float32)
        return oh0 * (1.0 - t)[:, None] + oh1 * t[:, None]

    def body(acc, args):
        cx0c, cy0c, cz0c, cx7c, cy7c, cz7c, tc, gc = args
        ax = axis_mat(cx0c, cx7c, tc[:, 0].astype(jnp.float32))
        ay = axis_mat(cy0c, cy7c, tc[:, 1].astype(jnp.float32))
        az = axis_mat(cz0c, cz7c, tc[:, 2].astype(jnp.float32))
        wxy = (ax[:, :, None] * ay[:, None, :]).reshape(chunk, r * r)
        b = (az[:, :, None] * gc[:, None, :]).reshape(chunk, r * F)
        acc = acc + jax.lax.dot_general(
            wxy, b, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            # default matmul precision is bf16-class on TPU (~1e-3 rel);
            # the table gradient matches the sorted-segment path to f32
            # only at HIGHEST (measured 1.2e-3 -> 1.8e-7 rel)
            precision=jax.lax.Precision.HIGHEST,
        )  # [r*r, r*F]
        return acc, None

    args = tuple(
        a.reshape(nc, chunk, *a.shape[1:])
        for a in (cx0, cy0, cz0, cx7, cy7, cz7, tl, gl)
    )
    acc, _ = jax.lax.scan(body, jnp.zeros((r * r, r * F), jnp.float32), args)
    # [r*r, r*F] -> [r^3, F] in cx + r*(cy + r*cz) flat order: acc is
    # [(cx,cy), (cz,f)] — transpose to (cz, cy, cx) major ordering used
    # by the dense corner index (x fastest)
    return (
        acc.reshape(r, r, r, F).transpose(2, 1, 0, 3).reshape(r * r * r, F)
    )


def _vertex_bwd(cfg, residuals, g):
    """Table gradient: per-level scatter-FREE dense segment reduction.

    The transpose of the 8-corner gather is 33.5M width-F update rows
    per Instant-NGP step. TPU scatter-add is row-count bound at
    ~42 ns/row while sorts/gathers/cumsums run at ~2-3 ns/row
    (tools/exp/exp_round4_scatter.py), so the rows are sorted by destination
    and the dense [T, F] gradient is read off as boundary differences of
    one prefix sum (ops/sorted_segment.py) — no scatter in the entire
    backward. This replaces tcnn's atomicAdd semantics (only the f32
    summation order differs; tcnn itself accumulates in fp16).
    Routed through scatter_add_rows so the multichip path (shard_map
    over the data axis + psum of partial tables) applies unchanged.
    """
    from ...ops.pallas.scatter_rows import scatter_add_rows

    res, T, F = cfg
    idx, t, feats = residuals
    L = len(res)
    n = t.shape[1]

    w8 = _corner_weights(t)  # [L, N, 8]
    g3 = jnp.moveaxis(g.reshape(n, L, F).astype(jnp.float32), 0, 1)  # [L,N,F]
    grad_rows = w8[..., None] * g3[:, :, None, :]  # [L, N, 8, F]

    # per level (dense coarse levels only occupy res^3 < T rows: reduce
    # over that prefix and zero-pad the rest). Dense levels use the
    # separable-splat matmul (no sort/scatter — _splat_dense_level);
    # hashed levels and the sharded multichip path keep the
    # sorted-segment reduction.
    from ...ops.pallas import scatter_rows as _sr

    sharded = _sr._SCATTER_MESH is not None
    idx2 = idx.reshape(L, n * 8)
    gr = grad_rows.reshape(L, n * 8, F)
    grads = []
    for l in range(L):
        V = min(int(res[l]) ** 3, T)
        if V < T and not sharded:
            gl = _splat_dense_level(
                idx[l, :, 0], idx[l, :, 7], t[l], g3[l], int(res[l]), F
            )
        else:
            gl = scatter_add_rows(idx2[l], gr[l], V)
        if V < T:
            gl = jnp.concatenate([gl, jnp.zeros((T - V, F), gl.dtype)])
        grads.append(gl)
    grad_table = jnp.stack(grads).astype(feats.dtype)

    # --- position gradient: d(out)/dx through the trilerp weights ---
    # feats come from the residuals (saved in the forward; re-gathering
    # them here cost ~85 ms/step)
    gdot = jnp.sum(feats * g3[:, :, None, :], axis=-1)  # [L, N, 8]
    c = jnp.asarray(_CORNERS, t.dtype)  # [8, 3]
    sign = jnp.where(c == 1.0, 1.0, -1.0)[None, None]  # [1,1,8,3]
    wd = jnp.where(
        c[None, None, :, :] == 1.0, t[:, :, None, :], 1.0 - t[:, :, None, :]
    )  # [L,N,8,3] per-dim factors
    prod_others = jnp.stack(
        [
            wd[..., 1] * wd[..., 2],
            wd[..., 0] * wd[..., 2],
            wd[..., 0] * wd[..., 1],
        ],
        axis=-1,
    )  # [L,N,8,3]
    dw = jnp.sum(gdot[..., None] * sign * prod_others, axis=2)  # [L,N,3]
    res_f = jnp.asarray(np.asarray(res, np.float64) - 1.0, t.dtype)[:, None, None]
    grad_x = jnp.sum(dw * res_f, axis=0).astype(t.dtype)  # [N,3]
    return grad_table, grad_x


_vertex_lookup.defvjp(_vertex_fwd, _vertex_bwd)


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
        res = tuple(int(r) for r in _level_resolutions(self.base_res, scale, L))

        table = self.param(
            "table",
            lambda key, shape: jax.random.uniform(key, shape, jnp.float32, -1e-4, 1e-4),
            (L, T, F),
        )

        orig_shape = x.shape[:-1]
        x2 = x.reshape(-1, 3).astype(jnp.float32)
        out = _vertex_lookup(table, x2, (res, T, F))
        return out.reshape(*orig_shape, L * F).astype(self.dtype)


# ---------------------------------------------------------------------------
# Brick layout — the TPU-fast variant.
#
# Motivation (measured, tools/exp_hashgather{2,3}.py): XLA's TPU gather is
# row-COUNT bound at ~5 ns/row regardless of row width (2..128 f32 lanes),
# so the vertex layout's 8 corner gathers per point per level cost 8x more
# than they need to. The brick layout stores, at hash(cell), the features
# of all 8 corners of that cell in ONE row of 8*F lanes: one gather per
# point per level (33.5M -> 4.2M rows per Instant-NGP step, ~160 ms ->
# ~20 ms fwd), and an 8x smaller backward scatter served by the
# VMEM-resident Pallas kernel (ops/pallas/scatter_rows.py).
#
# Capacity parity: rows per level T_b = 2^(log2_table_size-3), so
# L * T_b * 8F == L * T * F — the same parameter count as tcnn's vertex
# table (reference config /root/reference/xrnerf/models/mlps/
# hashnerf_mlp.py:36-45).
#
# Trade-off (documented, deliberate): corner features are NOT shared
# between adjacent cells, so the encoding is trilinear inside each cell
# but discontinuous across cell faces (the vertex layout is C0). The MLP
# sees the same feature statistics; quality on the reference benchmarks
# is to be validated — use ``hash_layout='vertex'`` for exact tcnn
# interpolation semantics.
# ---------------------------------------------------------------------------


def _brick_cells(x: jnp.ndarray, cfg, k: int = 0) -> tuple:
    """x [N,3] in [0,1] -> (row idx [L,N] int32, frac t [L,N,3]).

    Lattice k's grid is offset by k/2 of a cell: vertices at j - k/2 in
    level units, so cell index j0 = floor(xl + k/2), ncells = res-1+k.
    """
    res, tb = cfg[0], cfg[1]
    res_np = np.asarray(res, np.int64)
    res_f = jnp.asarray(res_np, x.dtype)[:, None, None]
    xl = x[None, :, :] * (res_f - 1.0) + 0.5 * k
    ncells = res_np - 1 + k  # cells per axis
    nc_f = jnp.asarray(ncells, x.dtype)[:, None, None]
    c0 = jnp.clip(jnp.floor(xl), 0, nc_f - 1.0)
    t = jnp.clip(xl - c0, 0.0, 1.0)
    ci = c0.astype(jnp.int32)

    use_dense = ncells**3 <= tb  # [L] np.bool_
    nc_i = jnp.asarray(ncells, jnp.int32)[:, None]
    dense_idx = ci[..., 0] + nc_i * (ci[..., 1] + nc_i * ci[..., 2])
    hash_idx = (
        ci[..., 0] * np.int32(_PRIMES[0])
        ^ ci[..., 1] * np.int32(np.uint32(_PRIMES[1]).view(np.int32))
        ^ ci[..., 2] * np.int32(np.uint32(_PRIMES[2]).view(np.int32))
    ) % tb
    idx = jnp.where(
        jnp.asarray(use_dense)[:, None], dense_idx % tb, hash_idx
    ).astype(jnp.int32)
    return idx, t


def _corner_weights(t: jnp.ndarray) -> jnp.ndarray:
    """t [L,N,3] -> trilerp weights [L,N,8] (corner order = _CORNERS).

    Built from per-axis factor pairs ([L, N] each) instead of a
    broadcast-select [L, N, 8, 3] tensor, whose 3-minor dim pads 42x in
    HBM when XLA materializes it (eval-renderer OOM at 65k-ray chunks).
    """
    w = [(1.0 - t[..., d], t[..., d]) for d in range(3)]
    return jnp.stack(
        [w[0][i] * w[1][j] * w[2][k] for (i, j, k) in _CORNERS], axis=-1
    )


def _brick_rows(table: jnp.ndarray, idx: jnp.ndarray, cfg, k: int) -> jnp.ndarray:
    """Gather one row per (level, point) from lattice k: [L,N] -> [L,N,8,F]."""
    res, tb, f, n_lat = cfg[:4]
    L = len(res)
    n = idx.shape[1]
    flat = table.reshape(L * n_lat * tb, 8 * f)
    offs = (jnp.arange(L, dtype=jnp.int32) * n_lat + k) * tb
    fidx = (idx + offs[:, None]).reshape(-1)
    return jnp.take(flat, fidx, axis=0).reshape(L, n, 8, f)


_BLEND_EPS = 1e-7


def _face_bump(t: jnp.ndarray) -> jnp.ndarray:
    """beta(t) = prod_d t_d(1-t_d): vanishes on the lattice's cell faces.

    Used by the smooth blend: weighting lattice k's trilerp by its own
    face bump (normalized across lattices) mutes each lattice exactly
    where its per-cell interpolation jumps. The staggered lattices'
    face planes are parallel-distinct per axis but still intersect on
    codim-2 curves (e.g. an x-face of lattice 0 with a y-face of
    lattice 1); on those measure-zero curves both bumps vanish and the
    blend retains a bounded jump — see BrickHashEncoding's docstring.
    """
    b = t * (1.0 - t)
    return b[..., 0] * b[..., 1] * b[..., 2]  # [L,N]


def _brick_impl(table, x, cfg):
    res, tb, f, n_lat, blend = cfg
    L = len(res)
    n = x.shape[0]
    if blend and n_lat > 1:
        s, beta = [], []
        for k in range(n_lat):
            idx, t = _brick_cells(x, cfg, k)
            rows = _brick_rows(table, idx, cfg, k)
            w8 = _corner_weights(t)
            s.append(jnp.sum(rows * w8[..., None], axis=2))  # [L,N,F]
            beta.append(_face_bump(t))
        B = sum(beta) + _BLEND_EPS
        out = sum(
            ((bk + _BLEND_EPS / n_lat) / B)[..., None] * sk
            for bk, sk in zip(beta, s)
        )
    else:
        out = 0.0
        for k in range(n_lat):
            idx, t = _brick_cells(x, cfg, k)
            rows = _brick_rows(table, idx, cfg, k)
            w8 = _corner_weights(t)
            out = out + jnp.sum(rows * w8[..., None], axis=2)  # [L,N,F]
        out = out / n_lat
    return jnp.moveaxis(out, 0, 1).reshape(n, L * f)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _brick_lookup(table, x, cfg):
    return _brick_impl(table, x, cfg)


def _brick_fwd(table, x, cfg):
    # Residuals are just (table, x): the gather is rematerialized in the
    # backward (one extra ~20 ms gather) instead of saving 268 MB of rows.
    return _brick_impl(table, x, cfg), (table, x)


def _brick_bwd(cfg, residuals, g):
    from ...ops.pallas.scatter_rows import scatter_add_rows

    res, tb, f, n_lat, blend = cfg
    table, x = residuals
    L = len(res)
    n = x.shape[0]
    blended = blend and n_lat > 1

    g3 = jnp.moveaxis(g.reshape(n, L, f).astype(jnp.float32), 0, 1)  # [L,N,F]
    c = jnp.asarray(_CORNERS, x.dtype)  # [8,3]
    sign = jnp.where(c == 1.0, 1.0, -1.0)[None, None]  # [1,1,8,3]
    res_f = jnp.asarray(np.asarray(res, np.float64) - 1.0, x.dtype)[:, None, None]

    # Per-lattice trilerp values s_k and blend weights u_k (remat).
    if blended:
        ts, w8s, betas, ss = [], [], [], []
        for k in range(n_lat):
            idx_k, t_k = _brick_cells(x, cfg, k)
            w8_k = _corner_weights(t_k)
            rows_k = _brick_rows(table, idx_k, cfg, k)
            ts.append(t_k)
            w8s.append(w8_k)
            betas.append(_face_bump(t_k))
            ss.append(jnp.sum(rows_k * w8_k[..., None], axis=2))  # [L,N,F]
        B = sum(betas) + _BLEND_EPS  # [L,N]
        us = [(bk + _BLEND_EPS / n_lat) / B for bk in betas]
        out_blend = sum(uk[..., None] * sk for uk, sk in zip(us, ss))

    grad_lat = []
    grad_x = jnp.zeros_like(x)
    for k in range(n_lat):
        idx, t = _brick_cells(x, cfg, k)
        w8 = _corner_weights(t)  # [L,N,8]
        # d(out)/d(s_k): u_k for the smooth blend, 1/K for the mean.
        uk = us[k][..., None] if blended else 1.0 / n_lat
        gk = g3 * uk  # [L,N,F]

        # --- table gradient: per-level VMEM scatter-add ---
        grad_rows = w8[..., None] * gk[:, :, None, :]  # [L,N,8,F]
        gr2 = grad_rows.reshape(L, n, 8 * f)
        grad_lat.append(
            jnp.stack(
                [
                    scatter_add_rows(idx[l], gr2[l], tb, skip_zero_rows=True)
                    for l in range(L)
                ]
            )
        )  # [L, tb, 8F]

        # --- position gradient: d(out)/dx through the trilerp weights ---
        rows = _brick_rows(table, idx, cfg, k)  # remat
        gdot = jnp.sum(rows * gk[:, :, None, :], axis=-1)  # [L,N,8]
        wd = jnp.where(
            c[None, None, :, :] == 1.0, t[:, :, None, :], 1.0 - t[:, :, None, :]
        )  # [L,N,8,3] per-dim factors
        # dw8/dt_d = sign_d * prod_{d'!=d} wd_d'
        prod_others = jnp.stack(
            [
                wd[..., 1] * wd[..., 2],
                wd[..., 0] * wd[..., 2],
                wd[..., 0] * wd[..., 1],
            ],
            axis=-1,
        )  # [L,N,8,3]
        dw = jnp.sum(gdot[..., None] * sign * prod_others, axis=2)  # [L,N,3]
        grad_x = grad_x + jnp.sum(dw * res_f, axis=0).astype(x.dtype)  # [N,3]

        if blended:
            # --- position gradient through the blend weights ---
            # d(out)/d(beta_j) = (s_j - out) / B (normalization included),
            # d(beta)/dt_d = (1-2t_d) * prod_{d'!=d} t(1-t).
            gb = jnp.sum((ss[k] - out_blend) * g3, axis=-1) / B  # [L,N]
            bq = t * (1.0 - t)  # [L,N,3]
            dbeta = jnp.stack(
                [
                    (1.0 - 2.0 * t[..., 0]) * bq[..., 1] * bq[..., 2],
                    (1.0 - 2.0 * t[..., 1]) * bq[..., 0] * bq[..., 2],
                    (1.0 - 2.0 * t[..., 2]) * bq[..., 0] * bq[..., 1],
                ],
                axis=-1,
            )  # [L,N,3]
            grad_x = grad_x + jnp.sum(
                gb[..., None] * dbeta * res_f, axis=0
            ).astype(x.dtype)

    grad_table = (
        jnp.stack(grad_lat, axis=1).reshape(table.shape).astype(table.dtype)
    )
    return grad_table, grad_x


_brick_lookup.defvjp(_brick_fwd, _brick_bwd)


class BrickHashEncoding(nn.Module):
    """Brick-layout multiresolution hash encoding (see module comment).

    Same interface and parameter budget as :class:`HashEncoding`;
    ``n_lattices`` row-gathers per (point, level) instead of eight.
    ``n_lattices=2`` staggers two half-cell-offset lattices (features
    averaged): colliding cells differ between the lattices and every cell
    face of one lattice is interior to the other, so collision artifacts
    decorrelate and the trilerp jumps halve — at 2x the gathers.

    ``blend='smooth'`` replaces the plain average with a face-bump
    cross-fade: lattice k's trilerp is weighted by its own
    ``prod_d t_d(1-t_d)`` (normalized across lattices), which vanishes
    exactly on lattice k's cell faces — where its per-cell interpolation
    jumps — while the staggered lattice still carries weight there. The
    blended field is continuous across every cell FACE (the measure-one
    discontinuity set of the plain brick layout); a measure-zero
    codim-2 exception remains on the curves where a face plane of one
    lattice intersects a face plane of the other (both bumps vanish,
    the normalized weights snap to 1/2 each while both trilerp values
    jump — a bounded jump, halved vs. the raw layouts). The custom VJP
    carries the extra d(weights)/dx term.

    MEASURED NEGATIVE RESULT (round-4 A/B, docs/benchmark.md): despite
    the continuity, 'smooth' scores ~2 dB BELOW 'mean' at matched
    budget — muting each lattice near its own faces costs capacity
    where detail is needed. Kept for reproducibility; use 'mean' for
    the fast path and the vertex layout for quality.
    """

    n_levels: int = 16
    n_features: int = 2
    log2_table_size: int = 19
    base_res: int = 16
    max_res: int = 2048
    n_lattices: int = 1
    blend: str = "mean"  # 'mean' | 'smooth'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        L, F = self.n_levels, self.n_features
        tb = (1 << max(self.log2_table_size - 3, 4)) // self.n_lattices
        scale = per_level_scale(self.max_res, self.base_res, L)
        res = tuple(int(r) for r in _level_resolutions(self.base_res, scale, L))

        table = self.param(
            "table",
            lambda key, shape: jax.random.uniform(key, shape, jnp.float32, -1e-4, 1e-4),
            (L, self.n_lattices, tb, 8 * F),
        )

        orig_shape = x.shape[:-1]
        x2 = x.reshape(-1, 3).astype(jnp.float32)
        out = _brick_lookup(
            table, x2, (res, tb, F, self.n_lattices, self.blend == "smooth")
        )
        return out.reshape(*orig_shape, L * F).astype(self.dtype)

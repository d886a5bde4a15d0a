"""Chunked full-image rendering for eval/test — host loop around one jit.

Replaces the reference's ``batchify_forward``
(``/root/reference/xrnerf/models/networks/nerf.py:50-69``): rays are padded
to a static chunk size so XLA compiles exactly one program regardless of
image resolution, and chunks stream through the device back-to-back.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import numpy as np

# jit wrappers cached per (apply_fn, mesh) so repeated evals don't
# retrace. Contract: callers pass a *stable* function object (e.g. a
# method bound once at trainer construction), not a per-call lambda.
_JIT_CACHE: Dict[tuple, Callable] = {}


def _get_jitted(apply_fn: Callable, mesh=None) -> Callable:
    key = (id(apply_fn), id(mesh))
    if key not in _JIT_CACHE:
        _JIT_CACHE[key] = jax.jit(apply_fn)
    return _JIT_CACHE[key]


def render_rays_chunked(
    apply_fn: Callable,
    params,
    rays: Dict[str, np.ndarray],
    chunk: int = 8192,
    rng: Optional[jax.Array] = None,
    keys: tuple = ("rgb", "disp", "acc"),
    mesh: Optional[jax.sharding.Mesh] = None,
    active_fn: Optional[Callable] = None,
    background: Optional[Dict[str, float]] = None,
) -> Dict[str, np.ndarray]:
    """Run ``apply_fn(params, chunk_batch, rng)`` over [R, ...] rays.

    ``apply_fn`` must be jittable with train=False semantics baked in.
    Returns host numpy arrays of leading dim R. With ``mesh``, chunk ray
    batches are sharded along the mesh's data axis so eval renders use
    every chip instead of wasting N-1 of them (the reference renders
    rank-0-only; GSPMD splits ours across the pod).

    ``active_fn(ray_dict) -> [R] bool`` enables conservative ray
    culling (the static-shape analog of the reference CUDA renderers'
    per-ray early exit): rays it marks inactive are never rendered and
    receive the constant ``background`` fill per key (defaults: 1.0 for
    'rgb', 1e10 for 'disp' — an uncalled empty ray yields
    disp = 1/1e-10, volume.py — and 0.0 otherwise). The prepass MUST be
    conservative — only mark rays whose render provably equals the
    background (e.g. ``kilonerf_strip_active`` proves no occupied
    sample). Active rays are compacted into full chunks, so a frame
    that is half empty costs half the chunks. A fully-culled frame
    renders one probe chunk (to learn output shapes) and returns
    all-background arrays.
    """
    # ``ctx_*`` keys (and scalars) are per-item context shared by every
    # chunk (e.g. SMPL vertices, frame index); only ray keys get chunked.
    ctx = {
        k: jax.numpy.asarray(v)
        for k, v in rays.items()
        if k.startswith("ctx_") or np.ndim(v) == 0
    }
    ray_keys = {
        k: v for k, v in rays.items() if k not in ctx and k != "target"
    }
    n = next(iter(ray_keys.values())).shape[0]
    n_pad = (-n) % chunk
    padded = {
        k: np.concatenate([v, np.repeat(v[-1:], n_pad, axis=0)], axis=0)
        if n_pad
        else v
        for k, v in ray_keys.items()
    }
    jitted = _get_jitted(apply_fn, mesh)
    data_sh = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        data_sh = NamedSharding(mesh, PartitionSpec("data"))
    total = n + n_pad

    if active_fn is not None:
        act = np.asarray(
            _get_jitted(active_fn, None)(
                {k: jax.numpy.asarray(v) for k, v in padded.items()}
            )
        )
        idx = np.nonzero(act)[0]
        if idx.size < total:  # something culled: compact + fill
            bg = background or {}

            def bg_val(k):
                return float(
                    bg.get(k, 1.0 if k == "rgb" else 1e10 if k == "disp" else 0.0)
                )

            if idx.size == 0:
                # fully-empty frame: render one probe chunk only to
                # learn per-key output shapes/dtypes, then background-
                # fill everything (ADVICE r4: returning {} crashed
                # callers expecting result['rgb']).
                cb = {
                    k: jax.numpy.asarray(v[:chunk]) for k, v in padded.items()
                }
                cb.update(ctx)
                ret = jitted(params, cb, rng)
                return {
                    k: np.full(
                        (n, *np.asarray(ret[k]).shape[1:]),
                        bg_val(k),
                        np.asarray(ret[k]).dtype,
                    )
                    for k in keys
                    if k in ret
                }
            sel_pad = (-idx.size) % chunk
            # pad with an ACTIVE index; pad-slot renders are DISCARDED
            # below (only flat[:idx.size] is assigned) — a pad re-render
            # can differ from the original slot's render whenever the
            # network has cross-ray coupling (MoE capacity overflow), so
            # it must never overwrite anything (ADVICE r4).
            idxp = (
                np.concatenate([idx, np.full(sel_pad, idx[0], np.int64)])
                if sel_pad
                else idx
            )
            result = {}
            parts: Dict[str, list] = {k: [] for k in keys}
            for start in range(0, idxp.size, chunk):
                sel = idxp[start : start + chunk]
                cb = {
                    k: jax.numpy.asarray(v[sel]) for k, v in padded.items()
                }
                if data_sh is not None:
                    cb = {k: jax.device_put(v, data_sh) for k, v in cb.items()}
                cb.update(ctx)
                ret = jitted(params, cb, rng)
                for k in keys:
                    if k in ret:
                        parts[k].append(np.asarray(ret[k]))
            for k, v in parts.items():
                if not v:
                    continue
                flat = np.concatenate(v, axis=0)
                out = np.full(
                    (total, *flat.shape[1:]), bg_val(k), flat.dtype
                )
                out[idx] = flat[: idx.size]
                result[k] = out[:n]
            return result

    outs: Dict[str, list] = {k: [] for k in keys}
    for start in range(0, total, chunk):
        cb = {k: jax.numpy.asarray(v[start : start + chunk]) for k, v in padded.items()}
        if data_sh is not None:
            cb = {k: jax.device_put(v, data_sh) for k, v in cb.items()}
        cb.update(ctx)
        ret = jitted(params, cb, rng)
        for k in keys:
            if k in ret:
                outs[k].append(np.asarray(ret[k]))
    result = {k: np.concatenate(v, axis=0)[:n] for k, v in outs.items() if v}
    return result


def render_image(
    apply_fn: Callable,
    params,
    rays: Dict[str, np.ndarray],
    H: int,
    W: int,
    chunk: int = 8192,
    rng: Optional[jax.Array] = None,
    keys: tuple = ("rgb", "disp", "acc"),
    mesh: Optional[jax.sharding.Mesh] = None,
) -> Dict[str, np.ndarray]:
    flat = render_rays_chunked(apply_fn, params, rays, chunk, rng, keys, mesh)
    out = {}
    for k, v in flat.items():
        out[k] = v.reshape(H, W, *v.shape[1:])
    return out

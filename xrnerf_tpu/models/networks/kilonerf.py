"""KiloNeRF: finetune network, distill student, occupancy-grid builder.

Parity targets in the reference:
  - ``KiloNerfNetwork`` (``/root/reference/xrnerf/models/networks/kilonerf.py:19-144``):
    NerfNetwork-style rendering through the multi-network + L2 reg on
    view-dependent params (:37-42)
  - ``StudentNerfNetwork`` (``networks/student_nerf.py:18-148``): frozen
    teacher generates (rgb, sigma) targets at random points; student =
    multi-network; per-network MSE
  - ``BuildOccupancyTreeHook`` (``core/hooks/build_occupancy_tree_hook.py:19-123``):
    dense density sampling -> threshold -> any-pool -> occupancy grid

TPU-first: the finetune render is the same static two-pass pattern as NGP
(uniform samples, occupancy-mask, MoE-dispatch multi-MLP eval, composite);
the occupancy grid is a plain bool array built by one jitted sweep.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...registry import NETWORKS
from ...utils.metrics import img2mse, mse2psnr
from ..fields.kilonerf_field import MultiNetworkMLP, assign_networks
from ..renders.volume import volume_render
from ..samplers.stratified import sample_along_rays, z_to_pts
from .base import BaseNetwork


def kilonerf_march(
    rays_o: jnp.ndarray,  # [N, 3]
    rays_d: jnp.ndarray,  # [N, 3]
    near: jnp.ndarray,  # [N, 1]
    far: jnp.ndarray,  # [N, 1]
    occ: jnp.ndarray,  # [ox, oy, oz] bool
    domain_min: jnp.ndarray,
    domain_max: jnp.ndarray,
    n_candidates: int,
    n_keep: int,
):
    """Keep-K empty-space-skipping march for KiloNeRF inference.

    The reference culls samples with per-ray CUDA ESS + early ray
    termination (``kilonerf_mlp.py:29-190`` reorder + occupancy mask,
    ``multi_modules.py``); the TPU redesign is the same static two-pass
    pattern as the NGP march (ngp_march.py): test ``n_candidates``
    uniform steps against the occupancy grid, keep the first ``n_keep``
    live samples per ray (z-ordered front compaction == the reference's
    transmittance-ordered recount with its T-break disabled). Returns
    (z_keep [N,K], mask [N,K], dt [N,1]).
    """
    n = rays_o.shape[0]
    S = n_candidates
    # endpoint lattice matching sample_along_rays(perturb=False) so the
    # kept samples land exactly on the full path's sample positions
    u = jnp.linspace(0.0, 1.0, S, dtype=rays_o.dtype)
    z = near + (far - near) * u[None, :]  # [N, S]
    dt = (far - near) / max(S - 1, 1)  # [N, 1]
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]
    ores = jnp.asarray(occ.shape)
    rel = (pts - domain_min) / (domain_max - domain_min)
    inb = jnp.all((rel >= 0) & (rel < 1), axis=-1)
    cell = jnp.clip(jnp.floor(rel * ores).astype(jnp.int32), 0, ores - 1)
    flat_occ = occ.reshape(-1)
    cidx = cell[..., 0] * (ores[1] * ores[2]) + cell[..., 1] * ores[2] + cell[..., 2]
    live = flat_occ[cidx] & inb  # [N, S]
    sort_key = jnp.where(live, z, jnp.inf)
    order = jnp.argsort(sort_key, axis=-1)[:, :n_keep]
    z_keep = jnp.take_along_axis(z, order, axis=-1)
    mask = jnp.take_along_axis(live, order, axis=-1)
    z_keep = jnp.where(mask, z_keep, far)
    return z_keep, mask, dt


def distance_transform_linf(occ: jnp.ndarray, max_d: int = 15) -> jnp.ndarray:
    """L-inf (chessboard) distance-in-cells to the nearest occupied cell.

    0 on occupied cells; capped at ``max_d``. Built by ``max_d``
    iterations of a separable 3-wide min-erosion. NOT cheap at render
    time (~45 reduce_window passes over the grid): precompute once per
    grid via ``prepare_march_aux`` and pass the result to the marches —
    recomputing it per chunk dominated the round-4 frame profile.
    """
    import jax.lax as lax

    init = np.int32(max_d)  # concrete: reduce_window requires a literal
    d = jnp.where(occ, jnp.int32(0), jnp.int32(max_d))

    def erode(_, d):
        m = d
        for ax in range(3):
            window = [1, 1, 1]
            window[ax] = 3
            m = lax.reduce_window(
                m, init, lax.min, tuple(window), (1, 1, 1), "SAME"
            )
        return jnp.minimum(d, m + 1)

    return lax.fori_loop(0, max_d, erode, d)


class KiloAux(NamedTuple):
    """Inference aux: occupancy + its precomputed L-inf distance field.

    The distance transform costs ~45 reduce_window passes over the full
    grid; recomputing it inside every chunk render dominated the frame
    (round-4 profiling). ``prepare_march_aux`` builds it once per grid;
    the network accepts either a raw bool grid (computes inline) or this.
    """

    occ: jnp.ndarray  # [ox, oy, oz] bool
    dist: jnp.ndarray  # [ox, oy, oz] int32 L-inf distance to occupancy


def prepare_march_aux(occ: jnp.ndarray) -> KiloAux:
    return KiloAux(occ=occ, dist=distance_transform_linf(occ))


def kilonerf_sphere_march(
    rays_o: jnp.ndarray,  # [N, 3]
    rays_d: jnp.ndarray,  # [N, 3]
    near: jnp.ndarray,  # [N, 1]
    far: jnp.ndarray,  # [N, 1]
    occ: jnp.ndarray,  # [ox, oy, oz] bool
    domain_min: jnp.ndarray,
    domain_max: jnp.ndarray,
    n_candidates: int,
    n_keep: int,
    n_steps: int = 96,
    dist: jnp.ndarray | None = None,
):
    """Sphere-trace ESS march: ~``n_steps`` grid lookups per ray instead
    of ``n_candidates``.

    The dense march above tests every point of the uniform z-lattice
    against the occupancy grid — 25M lookups per 65k-ray chunk at
    ~70 ns/row is the measured bottleneck of KiloNeRF inference on TPU
    (docs/benchmark.md round-3 caveat). This variant walks the SAME
    z-lattice but jumps through empty space using an L-inf distance
    transform of the grid: from a cell at distance d cells, the nearest
    occupied point is at least (d-1)*min_cell_edge away, so the march
    advances that far (floored to whole lattice steps, always >= 1).
    Positions stay exactly on the lattice (integer step carry), so when
    the step budget suffices the kept samples are IDENTICAL to the
    dense march's first-``n_keep`` live set. Returns the same
    (z_keep [N,K], mask [N,K], dt [N,1]) contract.
    """
    n = rays_o.shape[0]
    S = n_candidates
    dt = (far - near) / max(S - 1, 1)  # [N, 1]
    dt1 = jnp.maximum(dt[:, 0], 1e-9)
    # world-space distance advanced per lattice step: rays_d need NOT be
    # unit-norm (get_rays-style pixel directions have |d| up to ~1.12 at
    # image corners) — the free-space skip below is in world units, so
    # convert with the per-ray norm or the march overshoots occupancy.
    world_dt = dt1 * jnp.maximum(jnp.linalg.norm(rays_d, axis=-1), 1e-9)
    ores = jnp.asarray(occ.shape)
    extent = domain_max - domain_min
    min_edge = jnp.min(extent / ores.astype(rays_o.dtype))
    if dist is None:
        dist = distance_transform_linf(occ)  # [ox,oy,oz] int32
    flat_dist = dist.reshape(-1)

    # start at the ray/domain entry (slab test), snapped up to the lattice
    safe_d = jnp.where(jnp.abs(rays_d) > 1e-9, rays_d, 1e-9)
    t0 = (domain_min - rays_o) / safe_d
    t1 = (domain_max - rays_o) / safe_d
    t_enter = jnp.max(jnp.minimum(t0, t1), axis=-1)  # [N]
    k_start = jnp.clip(
        jnp.ceil((t_enter - near[:, 0]) / dt1 - 1e-4).astype(jnp.int32), 0, S
    )

    def step(k, _):
        t = near[:, 0] + k.astype(rays_o.dtype) * dt1  # [N]
        p = rays_o + rays_d * t[:, None]
        rel = (p - domain_min) / extent
        inb = jnp.all((rel >= 0) & (rel < 1), axis=-1) & (k < S)
        cell = jnp.clip(jnp.floor(rel * ores).astype(jnp.int32), 0, ores - 1)
        cidx = (
            cell[..., 0] * (ores[1] * ores[2])
            + cell[..., 1] * ores[2]
            + cell[..., 2]
        )
        d = flat_dist[cidx]  # [N] int32; 0 = occupied
        live = inb & (d == 0)
        skip = jnp.floor(
            jnp.maximum(d - 1, 0).astype(rays_o.dtype) * min_edge / world_dt
        ).astype(jnp.int32)
        k_next = k + jnp.maximum(1, jnp.where(inb, skip, 1))
        return k_next, (t, live)

    ks, (zs, lives) = jax.lax.scan(step, k_start, None, length=n_steps)
    z = jnp.moveaxis(zs, 0, 1)  # [N, n_steps]
    live = jnp.moveaxis(lives, 0, 1)
    sort_key = jnp.where(live, z, jnp.inf)
    order = jnp.argsort(sort_key, axis=-1)[:, :n_keep]
    z_keep = jnp.take_along_axis(z, order, axis=-1)
    mask = jnp.take_along_axis(live, order, axis=-1)
    z_keep = jnp.where(mask, z_keep, far)
    return z_keep, mask, dt


def _pack_z_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """[ox, oy, oz] bool -> [ox*oy, ceil(oz/32)] uint32, bit z&31 of word
    z>>5 = bits[x, y, z].

    TPU gathers are ROW-COUNT bound: element gathers from a 2M-entry
    table run ~8 ns/row while multi-word row gathers from small tables
    run ~2.8 ns/row AND carry 128+ cells of occupancy per row
    (tools/exp/exp_round5_gather_width.py). Packing the z-axis into u32
    words turns every per-sample occupancy test into one narrow row
    gather + a variable shift — no one-hot lane select needed because
    the bit position is pure arithmetic in z.
    """
    ox, oy, oz = bits.shape
    wz = (oz + 31) // 32
    pad = wz * 32 - oz
    b = bits
    if pad:
        b = jnp.pad(b, ((0, 0), (0, 0), (0, pad)))
    b = b.reshape(ox * oy, wz, 32).astype(jnp.uint32)
    w = jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(b * w, axis=-1, dtype=jnp.uint32)


def _zrow_bit(rows: jnp.ndarray, cz: jnp.ndarray) -> jnp.ndarray:
    """rows [..., WZ] uint32 (packed z-columns), cz [...] int32 -> bool
    bit cz of the column. Word select is a static WZ-way where-chain
    (WZ = 4 for a 128-deep grid), bit select a variable shift — both
    plain VPU ops at the march's planar [Q, N] shapes."""
    wz = rows.shape[-1]
    w = cz >> 5
    word = rows[..., 0]
    for j in range(1, wz):
        word = jnp.where(w == j, rows[..., j], word)
    return ((word >> (cz & 31).astype(jnp.uint32)) & jnp.uint32(1)).astype(bool)


def kilonerf_pooled_march(
    rays_o: jnp.ndarray,  # [N, 3]
    rays_d: jnp.ndarray,  # [N, 3] (need NOT be unit-norm)
    near: jnp.ndarray,  # [N, 1]
    far: jnp.ndarray,  # [N, 1]
    occ: jnp.ndarray,  # [ox, oy, oz] bool
    domain_min: jnp.ndarray,
    domain_max: jnp.ndarray,
    n_candidates: int,
    n_keep: int,
    group: int = 8,
    n_groups_keep: int = 8,
    dist: jnp.ndarray | None = None,
):
    """Two-stage flat-gather ESS march — no scan, no sort.

    The scan-based sphere march pays ~34 ns per occupancy lookup (96
    sequential 65k-element gathers per chunk); flat batched gathers run
    at ~2 ns/row on v5e (tools/exp/exp_round4_scatter.py micro rates). This
    march restructures ESS into two fully-batched passes over the SAME
    z-lattice as the dense march:

      stage A  test one center point per ``group`` consecutive
               candidates against the L-inf distance transform: a group
               is live iff dist[center_cell] <= r where r cells cover
               the group's world half-extent — conservative for every
               sample in the group (per-ray r handles unnormalized
               dirs). [N, S/G] flat gather.
      stage B  expand the first ``n_groups_keep`` live groups to their
               ``group`` candidates and test each against the REAL grid
               (exact dense-march semantics). [N, Kg*G] flat gather.

    Compactions use the one-hot contraction (ops/compaction.py), so the
    whole march is gathers + cumsums + fused elementwise. Kept samples
    equal the dense march's first-``n_keep`` live set whenever the first
    ``n_groups_keep`` live groups contain them (equivalence-tested);
    budget overflow truncates from the far end, like every keep-K march
    here and the reference's capped compaction.
    """
    from ...ops.compaction import keep_first_k

    n = rays_o.shape[0]
    S = n_candidates
    G = group
    assert S % G == 0, "n_candidates must be a multiple of group"
    SG = S // G
    Kg = n_groups_keep
    o0, o1, o2 = (int(v) for v in occ.shape)  # static
    dt = (far - near) / max(S - 1, 1)  # [N, 1]
    dt1 = jnp.maximum(dt[:, 0], 1e-9)  # [N]
    dnorm = jnp.linalg.norm(rays_d, axis=-1)  # [N]
    extent = domain_max - domain_min  # [3]
    min_edge = jnp.min(extent / jnp.asarray([o0, o1, o2], rays_o.dtype))
    if dist is None:
        dist = distance_transform_linf(occ)  # [ox,oy,oz] int32
    # Packed-bitfield tables (see _pack_z_bits): stage A tests group
    # centers against dilated occupancy (dist <= r) bitfields — one
    # [WZ]-word row gather + arithmetic bit extract per probe instead of
    # an 8 ns/row element gather from the 2M-entry grid; stage B tests
    # exact occupancy the same way. Bit-identical to the element-gather
    # formulation for r <= RMAX; rays needing a fatter radius (not seen
    # at bench shapes: r is 2-3 there) degrade conservatively to
    # group-live. Packing is ~14M VPU ops per call — noise next to the
    # 7.3M gathers it accelerates ~3x.
    RMAX = 6
    dil_packed = jnp.concatenate(
        [_pack_z_bits(dist <= rr) for rr in range(1, RMAX + 1)], axis=0
    )  # [RMAX*ox*oy, WZ]
    occ_packed = _pack_z_bits(occ)  # [ox*oy, WZ]

    # Planar (structure-of-arrays) layout throughout: every bulk tensor
    # is [steps, N] with N minor — a [..., 3]-minor layout stores 3 of
    # each 128 vector lanes and measured ~10x slower on these volumes.
    near1 = near[:, 0]
    ox, oy, oz_ = rays_o[:, 0], rays_o[:, 1], rays_o[:, 2]
    dx, dy, dz = rays_d[:, 0], rays_d[:, 1], rays_d[:, 2]
    ores = (o0, o1, o2)

    def cells_planar(z):  # z [Q, N] -> (per-axis cells [3][Q,N], rels)
        rels, cids = [], []
        for (oc, dc, dmn, ext, orr) in (
            (ox, dx, domain_min[0], extent[0], o0),
            (oy, dy, domain_min[1], extent[1], o1),
            (oz_, dz, domain_min[2], extent[2], o2),
        ):
            rel = (oc[None, :] + dc[None, :] * z - dmn) / ext
            rels.append(rel)
            cids.append(
                jnp.clip(jnp.floor(rel * orr).astype(jnp.int32), 0, orr - 1)
            )
        return cids, rels

    # ---- stage A: group centers vs dilated-occupancy bitfields ----
    gc = jnp.arange(SG, dtype=rays_o.dtype) * G + (G - 1) / 2.0  # [SG]
    zc = near1[None, :] + gc[:, None] * dt1[None, :]  # [SG, N]
    cidsc, relsc = cells_planar(zc)
    half_w = (G - 1) / 2.0 * dt1 * dnorm  # [N] world half-extent of a group
    r = jnp.floor(half_w / min_edge).astype(jnp.int32) + 1  # [N]
    inb_c = jnp.ones_like(zc, dtype=bool)
    for i, rel in enumerate(relsc):
        m = (half_w / extent[i])[None, :]
        inb_c &= (rel >= -m) & (rel < 1 + m)
    rowA = (
        (jnp.clip(r, 1, RMAX) - 1)[None, :] * (o0 * o1)
        + cidsc[0] * o1
        + cidsc[1]
    )  # [SG, N]
    bitA = _zrow_bit(dil_packed[rowA], cidsc[2])  # dist[cell] <= min(r,RMAX)
    liveA = inb_c & (bitA | (r > RMAX)[None, :])  # [SG, N]
    gidx, gmask = keep_first_k(liveA.T, Kg)  # [N, Kg]

    # ---- stage B: expand kept groups, exact per-sample test ----
    s_idx = (gidx[:, :, None] * G + jnp.arange(G, dtype=jnp.int32)).reshape(
        n, Kg * G
    )  # [N, Kg*G] candidate indices (ascending: groups kept in order)
    s_t = s_idx.T  # [Kg*G, N]
    zB = near1[None, :] + s_t.astype(rays_o.dtype) * dt1[None, :]  # [KgG, N]
    cidsB, relsB = cells_planar(zB)
    inb = jnp.ones_like(zB, dtype=bool)
    for rel in relsB:
        inb &= (rel >= 0) & (rel < 1)
    bitB = _zrow_bit(occ_packed[cidsB[0] * o1 + cidsB[1]], cidsB[2])
    liveB = (
        bitB
        & inb
        & jnp.repeat(gmask, G, axis=-1).T
        & (s_t < S)
    )  # [KgG, N]
    _, mask, z_keep = keep_first_k(liveB.T, n_keep, vals=zB.T)  # [N, K]
    z_keep = jnp.where(mask, z_keep.astype(rays_o.dtype), far)
    return z_keep, mask, dt


def kilonerf_strip_active(
    rays_o: jnp.ndarray,  # [N, 3]
    rays_d: jnp.ndarray,  # [N, 3] (need NOT be unit-norm)
    near: jnp.ndarray,  # [N, 1]
    far: jnp.ndarray,  # [N, 1]
    dist: jnp.ndarray,  # [ox,oy,oz] int32 L-inf distance transform
    domain_min: jnp.ndarray,
    domain_max: jnp.ndarray,
    strip: int = 16,
    n_probes: int = 48,
) -> jnp.ndarray:
    """Conservative frame-level ray culling: [N] bool, False only for rays
    that provably have NO occupied sample.

    The reference's CUDA renderer skips empty rays via per-thread early
    exit (kilonerf_cuda render loop); with static shapes the TPU analog
    is a cheap conservative prepass + host-side chunk compaction: strips
    of ``strip`` consecutive rays (consecutive pixels of a row-major
    bundle) share one probe march along their mean ray, with the probe
    radius inflated by the strip's exact worst-case divergence, so a
    strip tests ``n_probes`` distance-field lookups instead of
    ``strip * n_candidates`` occupancy lookups. Inactive rays render as
    pure background under every march here (no live samples -> acc 0),
    so culling them is output-identical.

    Soundness: a live sample of ray i at t in [near_i, far_i] lies
    within L-inf radius spread + |dc|_inf*(t1-t0)/(2P) of some probe
    point (spread bounds |p_i(t)-p_c(t)| at the segment endpoints, which
    is exact for linear rays); the probe's cell then has L-inf cell
    distance <= floor(R/min_edge)+1, which is what the distance field
    test accepts.
    """
    n = rays_o.shape[0]
    pad = (-n) % strip
    if pad:  # pad by duplicating the last ray (shapes are static, so
        # this costs one trace); the strip containing duplicates is
        # still conservative for its real members, and the result is
        # sliced back to n (ADVICE r4: the assert coupled the
        # renderer's chunk size to the prepass strip size).
        rays_o = jnp.concatenate([rays_o, jnp.repeat(rays_o[-1:], pad, 0)])
        rays_d = jnp.concatenate([rays_d, jnp.repeat(rays_d[-1:], pad, 0)])
        near = jnp.concatenate([near, jnp.repeat(near[-1:], pad, 0)])
        far = jnp.concatenate([far, jnp.repeat(far[-1:], pad, 0)])
    ns = (n + pad) // strip
    ro = rays_o.reshape(ns, strip, 3)
    rd = rays_d.reshape(ns, strip, 3)
    t0 = jnp.min(near.reshape(ns, strip), axis=1)  # [ns]
    t1 = jnp.max(far.reshape(ns, strip), axis=1)  # [ns]
    oc = jnp.mean(ro, axis=1)  # [ns, 3]
    dc = jnp.mean(rd, axis=1)  # [ns, 3]
    do_ = ro - oc[:, None]
    dd = rd - dc[:, None]
    spread = jnp.maximum(
        jnp.max(jnp.abs(do_ + t0[:, None, None] * dd), axis=(1, 2)),
        jnp.max(jnp.abs(do_ + t1[:, None, None] * dd), axis=(1, 2)),
    )  # [ns] exact endpoint bound, linear in t
    seg = (t1 - t0) / n_probes  # [ns]
    half = 0.5 * seg * jnp.max(jnp.abs(dc), axis=-1)  # [ns] along-ray L-inf
    R = spread + half  # [ns] world L-inf probe radius

    o0, o1, o2 = (int(v) for v in dist.shape)
    ores = jnp.asarray([o0, o1, o2], rays_o.dtype)
    extent = domain_max - domain_min
    min_edge = jnp.min(extent / ores)
    r = jnp.floor(R / min_edge).astype(jnp.int32) + 1  # [ns] cell radius
    flat_dist = dist.reshape(-1)

    tm = t0[:, None] + (jnp.arange(n_probes, dtype=rays_o.dtype) + 0.5) * seg[
        :, None
    ]  # [ns, P]
    p = oc[:, None, :] + dc[:, None, :] * tm[..., None]  # [ns, P, 3]
    rel = (p - domain_min) / extent
    m = (R[:, None] / extent)[..., None, :] * jnp.ones_like(rel)
    inb = jnp.all((rel >= -m) & (rel < 1 + m), axis=-1)  # [ns, P]
    cell = jnp.clip(
        jnp.floor(rel * ores).astype(jnp.int32),
        0,
        jnp.asarray([o0 - 1, o1 - 1, o2 - 1]),
    )
    cidx = cell[..., 0] * (o1 * o2) + cell[..., 1] * o2 + cell[..., 2]
    hit = inb & (flat_dist[cidx] <= r[:, None])  # [ns, P]
    return jnp.repeat(jnp.any(hit, axis=-1), strip)[:n]


@NETWORKS.register
class KiloNerfNetwork(BaseNetwork):
    """Finetune/inference network over a fixed grid of tiny MLPs."""

    resolution: Sequence[int] = (16, 16, 16)
    domain_min: Sequence[float] = (-1.0, -1.0, -1.0)
    domain_max: Sequence[float] = (1.0, 1.0, 1.0)
    hidden: int = 32
    n_hidden_layers: int = 2
    multires: int = 10
    multires_dirs: int = 4
    n_samples: int = 384
    n_keep: int = 32  # inference ESS budget; 0 = evaluate all n_samples
    # 'dense'  — test every candidate (flat gather)
    # 'sphere' — scan-based distance-field ESS (~6x fewer lookups)
    # 'pooled' — two-stage flat-gather ESS (no scan/sort; fastest)
    march: str = "dense"
    n_march_steps: int = 96  # sphere march step budget
    march_group: int = 8  # pooled: candidates per stage-A group
    march_groups_keep: int = 8  # pooled: live groups kept per ray
    # inference MoE cap: at most this many (live-first) samples reach
    # the dispatch per chunk; 0 = all n_rays*n_keep slots. Parity with
    # compacted_coord's target_batch_size (ngp_grid_sampler.py:229-234).
    eval_budget: int = 0
    capacity_factor: float = 2.0
    white_bkgd: bool = True
    view_dep_reg: float = 1e-6
    occupancy_path: str = ""  # .npy bool grid from build_occupancy_grid
    dtype: Any = jnp.float32

    @property
    def n_nets(self) -> int:
        r = self.resolution
        return int(r[0] * r[1] * r[2])

    def setup(self):
        self.mlp = MultiNetworkMLP(
            n_nets=self.n_nets,
            hidden=self.hidden,
            n_hidden_layers=self.n_hidden_layers,
            multires=self.multires,
            multires_dirs=self.multires_dirs,
            capacity_factor=self.capacity_factor,
            dtype=self.dtype,
        )

    def __call__(
        self,
        batch: Dict[str, jnp.ndarray],
        rng: Optional[jax.Array] = None,
        train: bool = False,
        aux: Optional[jnp.ndarray] = None,  # bool occupancy [ox, oy, oz]
    ) -> Dict[str, jnp.ndarray]:
        rays_o, rays_d = batch["rays_o"], batch["rays_d"]
        near, far = batch["near"], batch["far"]
        viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
        dmin = jnp.asarray(self.domain_min)
        dmax = jnp.asarray(self.domain_max)
        occ_aux, dist_aux = (
            (aux.occ, aux.dist) if isinstance(aux, KiloAux) else (aux, None)
        )

        if not train and occ_aux is not None and self.n_keep > 0:
            return self._render_fast(
                batch, occ_aux, dmin, dmax, viewdirs, dist=dist_aux
            )

        z_vals = sample_along_rays(
            rng if train else None, near, far, self.n_samples, perturb=train
        )
        pts = z_to_pts(rays_o, rays_d, z_vals)  # [N, S, 3]
        n, s, _ = pts.shape
        flat = pts.reshape(n * s, 3)
        net_idx, local = assign_networks(flat, dmin, dmax, self.resolution)

        if occ_aux is not None:
            # empty-space skip: points in unoccupied cells become inactive
            ores = jnp.asarray(occ_aux.shape)
            rel = (flat - dmin) / (dmax - dmin)
            cell = jnp.clip(jnp.floor(rel * ores).astype(jnp.int32), 0, ores - 1)
            occ = occ_aux[cell[:, 0], cell[:, 1], cell[:, 2]]
            net_idx = jnp.where(occ, net_idx, -1)

        dirs_flat = jnp.repeat(viewdirs, s, axis=0)
        raw_rgb, raw_sigma = self.mlp(local, dirs_flat, net_idx)
        ret = volume_render(
            raw_rgb.reshape(n, s, 3),
            raw_sigma.reshape(n, s),
            z_vals,
            rays_d,
            white_bkgd=self.white_bkgd,
        )
        return {"rgb": ret["rgb"], "disp": ret["disp"], "acc": ret["acc"], "depth": ret["depth"]}

    def _render_fast(self, batch, occ, dmin, dmax, viewdirs, dist=None):
        """ESS + keep-K inference path (reference bar: 365-394 ms/frame,
        ``/root/reference/docs/en/benchmark.md:117-136``). Marches
        ``n_samples`` candidates, evaluates only ``n_keep`` live samples
        through the gather-only MoE dispatch, composites with the fixed
        candidate step as dt."""
        rays_o, rays_d = batch["rays_o"], batch["rays_d"]
        if self.march == "pooled":
            z_keep, mask, dt = kilonerf_pooled_march(
                rays_o, rays_d, batch["near"], batch["far"], occ,
                dmin, dmax, self.n_samples, self.n_keep,
                group=self.march_group, n_groups_keep=self.march_groups_keep,
                dist=dist,
            )
        elif self.march == "sphere":
            z_keep, mask, dt = kilonerf_sphere_march(
                rays_o, rays_d, batch["near"], batch["far"], occ,
                dmin, dmax, self.n_samples, self.n_keep, self.n_march_steps,
                dist=dist,
            )
        else:
            z_keep, mask, dt = kilonerf_march(
                rays_o, rays_d, batch["near"], batch["far"], occ,
                dmin, dmax, self.n_samples, self.n_keep,
            )
        n, k = z_keep.shape
        pts = rays_o[:, None, :] + rays_d[:, None, :] * z_keep[..., None]
        flat = pts.reshape(n * k, 3)
        net_idx, local = assign_networks(flat, dmin, dmax, self.resolution)
        net_idx = jnp.where(mask.reshape(-1), net_idx, -1)
        dirs_flat = jnp.repeat(viewdirs, k, axis=0)
        M = self.eval_budget
        # (local, dirs, net_idx) fused into one 8-wide f32 row so the
        # budget compaction below is a single wide-row gather: element
        # gathers cost ~8 ns/row on TPU while 32 B row gathers cost
        # ~2.8 ns (tools/exp/exp_round5_gather2.py); three separate takes of
        # [M] rows were ~13 ms/chunk. net_idx rides as f32 (< 2^12,
        # exact); lane 7 pads the row to a power of two.
        row8 = jnp.concatenate(
            [
                local,
                dirs_flat,
                net_idx.astype(jnp.float32)[:, None],
                jnp.zeros((n * k, 1), jnp.float32),
            ],
            axis=-1,
        )
        if 0 < M < n * k:
            # live-sample compaction before the MoE (same capped-budget
            # semantics as the NGP sample_budget / the reference's
            # compacted_coord): only M slots — live first, ray-major
            # stable — reach the dispatch; overflow renders empty.
            #
            # Every march here front-compacts per ray (keep_first_k
            # contract: ray i's live slots are exactly (i, 0..c_i)), so
            # the global live-first ray-major selection is a ragged
            # concat of per-ray prefixes. Slot (i, j) lands at
            # offset[i] + j with offset the exclusive cumsum of live
            # counts — one [n]-row scatter-add plus cumsums replaces the
            # former pair of [n*k]-row sorts (2x 2.1M rows per chunk,
            # the chunk's largest non-gather cost), selecting the SAME
            # slots in the SAME order.
            c = jnp.sum(mask.astype(jnp.int32), axis=-1)  # [n] live/ray
            offset = jnp.cumsum(c) - c  # [n] exclusive
            # ray_id[m] = max{i : offset[i] <= m}: scatter ray starts,
            # cumsum. Ties (c=0 runs) resolve to the last ray, whose
            # prefix owns the slot.
            starts = (
                jnp.zeros((M + 1,), jnp.int32)
                .at[jnp.minimum(offset, M)]
                .add(1)
            )
            ray_id = jnp.clip(jnp.cumsum(starts[:M]) - 1, 0, n - 1)  # [M]
            j_in = jnp.arange(M, dtype=jnp.int32) - offset[ray_id]
            valid = (j_in >= 0) & (j_in < c[ray_id])  # False past total live
            sel = jnp.where(valid, ray_id * k + jnp.maximum(j_in, 0), 0)
            sel8 = jnp.take(row8, sel, axis=0)  # [M, 8] one wide-row gather
            rgb_c, sigma_c = self.mlp(
                sel8[:, :3],
                sel8[:, 3:6],
                jnp.where(valid, sel8[:, 6].astype(jnp.int32), -1),
                gather_dispatch=True,
            )
            # un-compact without a sort: slot (i, j) sits at offset[i]+j;
            # rays past the budget truncate from the far end (overflow
            # renders empty, as before). rgb+sigma ride one 4-wide row so
            # the [n*k]-row un-compact is a single wide gather (the
            # separate sigma take was an 8 ns/row element gather).
            pos = offset[:, None] + jnp.arange(k, dtype=jnp.int32)[None, :]
            ok = (mask & (pos < M)).reshape(-1)
            posc = jnp.clip(pos, 0, M - 1).reshape(-1)
            out4_c = jnp.concatenate(
                [rgb_c, sigma_c[:, None].astype(rgb_c.dtype)], axis=-1
            )  # [M, 4]
            o4 = jnp.take(out4_c, posc, axis=0)  # [n*k, 4]
            raw_rgb = jnp.where(ok[:, None], o4[:, :3], 0).astype(rgb_c.dtype)
            raw_sigma = jnp.where(ok, o4[:, 3], -1e3).astype(sigma_c.dtype)
        else:
            raw_rgb, raw_sigma = self.mlp(
                local, dirs_flat, net_idx, gather_dispatch=True
            )
        rgb = jax.nn.sigmoid(raw_rgb.reshape(n, k, 3).astype(jnp.float32))
        sigma = jax.nn.relu(raw_sigma.reshape(n, k).astype(jnp.float32))
        sigma = jnp.where(mask, sigma, 0.0)
        dists = dt * jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
        alpha = 1.0 - jnp.exp(-sigma * dists)
        trans = jnp.concatenate(
            [jnp.ones_like(alpha[..., :1]),
             jnp.cumprod(1.0 - alpha[..., :-1] + 1e-10, axis=-1)], -1
        )
        weights = alpha * trans
        rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
        acc = jnp.sum(weights, axis=-1)
        depth = jnp.sum(weights * z_keep, axis=-1)
        disp = 1.0 / jnp.maximum(1e-10, depth / jnp.maximum(acc, 1e-10))
        if self.white_bkgd:
            rgb_map = rgb_map + (1.0 - acc[..., None])
        return {"rgb": rgb_map, "disp": disp, "acc": acc, "depth": depth}

    def init_aux(self, params, dataset=None) -> Optional[jnp.ndarray]:
        """Occupancy aux from the pretrain phase's grid file (the
        reference ships it as occupancy.pth; ours is a bool .npy)."""
        if self.occupancy_path:
            return jnp.asarray(np.load(self.occupancy_path))
        return None

    def param_spec(self, path: Tuple[str, ...]):
        """Expert parallelism: the multi-network weight stacks [n_nets, ...]
        shard their leading (network) dim on the mesh's model axis (SURVEY
        §2.6 — the reference evaluates all networks on one GPU via MAGMA
        grouped GEMM; here the spatial MoE spans chips)."""
        if "mlp" in path and (path[-1].endswith("_w") or path[-1].endswith("_b")):
            return jax.sharding.PartitionSpec("model")
        return None

    def loss(self, outputs, batch) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        mse = img2mse(outputs["rgb"], batch["target"])
        return mse, {"loss": mse, "mse": mse, "psnr": mse2psnr(mse)}

    def param_loss(self, params) -> jnp.ndarray:
        """L2 on view-dependent (color-branch) weights (kilonerf.py:37-42)."""
        reg = 0.0
        mlp = params["mlp"]
        for k in ("color_hidden_w", "rgb_w"):
            reg = reg + jnp.sum(mlp[k] ** 2)
        return self.view_dep_reg * reg


@NETWORKS.register
class StudentNerfNetwork(BaseNetwork):
    """Distill-phase student: multi-network fit to teacher point samples.

    The frozen teacher lives in the *dataset* (targets are precomputed per
    batch with one jitted teacher call), so the student's params contain
    only trainable weights — no frozen-parameter bookkeeping in the
    optimizer (the reference instead wraps the teacher network inside the
    student module, student_nerf.py:33-38).
    """

    resolution: Sequence[int] = (16, 16, 16)
    domain_min: Sequence[float] = (-1.0, -1.0, -1.0)
    domain_max: Sequence[float] = (1.0, 1.0, 1.0)
    hidden: int = 32
    n_hidden_layers: int = 2
    multires: int = 10
    multires_dirs: int = 4
    capacity_factor: float = 4.0
    sigma_loss_weight: float = 0.1
    dtype: Any = jnp.float32

    @property
    def n_nets(self) -> int:
        r = self.resolution
        return int(r[0] * r[1] * r[2])

    def setup(self):
        self.mlp = MultiNetworkMLP(
            n_nets=self.n_nets,
            hidden=self.hidden,
            n_hidden_layers=self.n_hidden_layers,
            multires=self.multires,
            multires_dirs=self.multires_dirs,
            capacity_factor=self.capacity_factor,
            dtype=self.dtype,
        )

    def __call__(self, batch, rng=None, train=False) -> Dict[str, jnp.ndarray]:
        pts, dirs = batch["pts"], batch["dirs"]
        net_idx, local = assign_networks(
            pts, jnp.asarray(self.domain_min), jnp.asarray(self.domain_max), self.resolution
        )
        raw_rgb, raw_sigma = self.mlp(local, dirs, net_idx)
        return {"rgb": jax.nn.sigmoid(raw_rgb), "sigma": jax.nn.relu(raw_sigma)}

    def loss(self, outputs, batch) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        rgb_mse = img2mse(outputs["rgb"], batch["target_rgb"])
        sigma_mse = jnp.mean((outputs["sigma"] - batch["target_sigma"]) ** 2)
        loss = rgb_mse + self.sigma_loss_weight * sigma_mse
        return loss, {"loss": loss, "rgb_mse": rgb_mse, "sigma_mse": sigma_mse}


def build_occupancy_grid(
    density_fn,
    domain_min: Sequence[float],
    domain_max: Sequence[float],
    res: Sequence[int] = (256, 256, 256),
    subsamples: int = 3,
    threshold: float = 10.0,
    chunk: int = 262144,
) -> np.ndarray:
    """Dense teacher-density sweep -> bool occupancy grid.

    Parity: BuildOccupancyTreeHook.after_run (build_occupancy_tree_hook.py:
    32-123): subsampled per-voxel density, threshold, any-pool. density_fn
    maps [M,3] world pts -> [M] densities (jit-compatible).
    """
    res = tuple(int(r) for r in res)
    dmin = np.asarray(domain_min, np.float32)
    dmax = np.asarray(domain_max, np.float32)
    # voxel-corner lattice at (res*subsamples) resolution
    fine = [r * subsamples for r in res]
    xs = [(np.arange(f, dtype=np.float32) + 0.5) / f for f in fine]
    occ = np.zeros(res, bool)
    fn = jax.jit(density_fn)
    # sweep plane by plane to bound memory
    for ix in range(fine[0]):
        yy, zz = np.meshgrid(xs[1], xs[2], indexing="ij")
        plane = np.stack(
            [np.full_like(yy, xs[0][ix]), yy, zz], axis=-1
        ).reshape(-1, 3)
        world = dmin + plane * (dmax - dmin)
        dens = np.asarray(fn(jnp.asarray(world))).reshape(fine[1], fine[2])
        hit = dens > threshold
        # any-pool into the coarse grid
        hit = hit.reshape(res[1], subsamples, res[2], subsamples).any((1, 3))
        occ[ix // subsamples] |= hit
    return occ

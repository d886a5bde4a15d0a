"""Instant-NGP component + network tests: hash encoding, SH, occupancy
grid ops, masked march, compositing gradient parity, end-to-end training."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xrnerf_tpu.models.embedders.hashenc import (
    BrickHashEncoding,
    HashEncoding,
    _brick_impl,
    per_level_scale,
)
from xrnerf_tpu.ops.pallas.scatter_rows import (
    _pallas_scatter_add_rows,
    scatter_add_rows,
)
from xrnerf_tpu.models.embedders.sh import sh_encode
from xrnerf_tpu.models.networks.hashnerf import HashNerfNetwork
from xrnerf_tpu.models.samplers.ngp_march import (
    MarchResult,
    aabb_intersect,
    composite_masked,
    march_rays,
)
from xrnerf_tpu.models.samplers.occupancy import (
    create_grid,
    cell_centers,
    generate_grid_samples,
    occupied_at,
    pos_to_cell,
    splat_density,
    update_bitfield,
)


# ---------------------------------------------------------------- hash enc
def test_per_level_scale_matches_reference_formula():
    # hashnerf_mlp.py:17-20: exp2(log2(2048*bound/16)/(16-1)) with bound=1
    assert per_level_scale(2048, 16, 16) == pytest.approx(
        float(np.exp2(np.log2(2048 / 16) / 15))
    )


def test_hash_encoding_shapes_and_interp():
    enc = HashEncoding(n_levels=4, n_features=2, log2_table_size=14, base_res=4, max_res=32)
    x = jnp.asarray([[0.5, 0.5, 0.5], [0.0, 0.0, 0.0], [1.0, 1.0, 1.0]])
    params = enc.init(jax.random.PRNGKey(0), x)["params"]
    out = enc.apply({"params": params}, x)
    assert out.shape == (3, 8)
    assert np.all(np.isfinite(np.asarray(out)))
    # continuity: nearby points give nearby encodings
    x2 = x + 1e-4
    out2 = enc.apply({"params": params}, x2)
    assert float(jnp.abs(out - out2).max()) < 1e-2
    # gradient flows into the table (scatter-add transpose)
    g = jax.grad(lambda p: jnp.sum(enc.apply({"params": p}, x) ** 2))(params)
    assert float(jnp.abs(g["table"]).sum()) > 0


def test_hash_encoding_batched_shapes():
    enc = HashEncoding(n_levels=2, n_features=2, log2_table_size=10, base_res=4, max_res=8)
    x = jnp.zeros((5, 7, 3))
    params = enc.init(jax.random.PRNGKey(0), x)["params"]
    assert enc.apply({"params": params}, x).shape == (5, 7, 4)


def test_vertex_custom_vjp_matches_autodiff():
    """The packed-row scatter backward (_vertex_bwd) must equal plain
    autodiff through the naive gather-trilerp forward, for both the
    table and the position gradients, on dense AND hashed levels."""
    from xrnerf_tpu.models.embedders.hashenc import (
        _vertex_cells,
        _vertex_gather,
        _corner_weights,
        _vertex_lookup,
    )

    rng = np.random.RandomState(3)
    # level res 4 (dense: 64 <= T) and res 23 (hashed: 12167 > 2048)
    res, T, F = (4, 23), 1 << 11, 2
    cfg = (res, T, F)
    L = len(res)
    table = jnp.asarray(rng.randn(L, T, F).astype(np.float32))
    x = jnp.asarray(rng.rand(257, 3).astype(np.float32))
    g = jnp.asarray(rng.randn(257, L * F).astype(np.float32))

    def naive(table, x):
        idx, t = _vertex_cells(x, cfg)
        feats = _vertex_gather(table, idx, cfg)
        w8 = _corner_weights(t)
        out = jnp.sum(feats * w8[..., None], axis=2)
        return jnp.moveaxis(out, 0, 1).reshape(x.shape[0], L * F)

    out_ref = naive(table, x)
    out = _vertex_lookup(table, x, cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref), atol=1e-5)

    gt_ref, gx_ref = jax.grad(
        lambda tb, xx: jnp.sum(naive(tb, xx) * g), argnums=(0, 1)
    )(table, x)
    gt, gx = jax.grad(
        lambda tb, xx: jnp.sum(_vertex_lookup(tb, xx, cfg) * g), argnums=(0, 1)
    )(table, x)
    np.testing.assert_allclose(np.asarray(gt), np.asarray(gt_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), atol=1e-3)


# ------------------------------------------------------------ brick layout
def test_scatter_add_rows_kernel_matches_xla():
    rng = np.random.RandomState(0)
    n, w, rows = 2048 + 37, 16, 64  # non-multiple of the tile: pad path
    idx = jnp.asarray(rng.randint(0, rows, size=(n,)).astype(np.int32))
    vals = jnp.asarray(rng.randn(n, w).astype(np.float32))
    ref = jnp.zeros((rows, w), jnp.float32).at[idx].add(vals)
    out = _pallas_scatter_add_rows(idx, vals, rows, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-6)
    # the public dispatcher (XLA path on CPU) agrees too
    out2 = scatter_add_rows(idx, vals, rows)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref), rtol=1e-6, atol=1e-6)


def _brick_enc():
    return BrickHashEncoding(
        n_levels=4, n_features=2, log2_table_size=14, base_res=4, max_res=32
    )


def test_scatter_add_rows_skip_zero_rows():
    rng = np.random.RandomState(2)
    n, w, rows = 1024, 16, 64
    idx = jnp.asarray(rng.randint(0, rows, size=(n,)).astype(np.int32))
    vals = rng.randn(n, w).astype(np.float32)
    vals[::3] = 0.0  # a third of the rows dead
    vals = jnp.asarray(vals)
    ref = jnp.zeros((rows, w), jnp.float32).at[idx].add(vals)
    out = scatter_add_rows(idx, vals, rows, skip_zero_rows=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_brick_encoding_shapes_param_budget_and_continuity_inside_cell():
    enc = _brick_enc()
    x = jnp.asarray([[0.5, 0.5, 0.5], [0.0, 0.0, 0.0], [1.0, 1.0, 1.0]])
    params = enc.init(jax.random.PRNGKey(0), x)["params"]
    # identical parameter budget to the vertex layout at the same config
    venc = HashEncoding(n_levels=4, n_features=2, log2_table_size=14, base_res=4, max_res=32)
    vparams = venc.init(jax.random.PRNGKey(0), x)["params"]
    assert params["table"].size == vparams["table"].size
    out = enc.apply({"params": params}, x)
    assert out.shape == (3, 8)
    assert np.all(np.isfinite(np.asarray(out)))
    # trilinear inside a cell: points within the same finest cell are close
    x2 = x + 1e-5
    out2 = enc.apply({"params": params}, x2)
    assert float(jnp.abs(out - out2).max()) < 1e-2
    assert enc.apply({"params": params}, jnp.zeros((5, 7, 3))).shape == (5, 7, 8)


@pytest.mark.parametrize("n_lat,blend", [(1, False), (2, False), (2, True)])
def test_brick_custom_vjp_matches_autodiff_of_reference_formulation(n_lat, blend):
    enc = BrickHashEncoding(
        n_levels=4, n_features=2, log2_table_size=14, base_res=4, max_res=32,
        n_lattices=n_lat, blend="smooth" if blend else "mean",
    )
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(33, 3).astype(np.float32))
    params = enc.init(jax.random.PRNGKey(0), x)["params"]
    table = params["table"]
    cot = jnp.asarray(rng.randn(33, 8).astype(np.float32))

    # static config mirrors the module internals
    from xrnerf_tpu.models.embedders.hashenc import (
        _level_resolutions,
        per_level_scale,
    )

    scale = per_level_scale(32, 4, 4)
    res = tuple(int(r) for r in _level_resolutions(4, scale, 4))
    cfg = (res, (1 << 11) // n_lat, 2, n_lat, blend)

    def loss_plain(tab, xx):
        return jnp.sum(_brick_impl(tab, xx, cfg) * cot)

    from xrnerf_tpu.models.embedders.hashenc import _brick_lookup

    def loss_vjp(tab, xx):
        return jnp.sum(_brick_lookup(tab, xx, cfg) * cot)

    gt_ref, gx_ref = jax.grad(loss_plain, argnums=(0, 1))(table, x)
    gt, gx = jax.grad(loss_vjp, argnums=(0, 1))(table, x)
    np.testing.assert_allclose(np.asarray(gt), np.asarray(gt_ref), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), rtol=1e-4, atol=1e-5)


def test_brick_smooth_blend_is_continuous_across_cell_faces():
    """With blend='smooth', the dual-lattice brick field is continuous
    across lattice cell faces (the mean blend jumps there)."""
    kw = dict(n_levels=1, n_features=2, log2_table_size=8, base_res=9,
              max_res=9, n_lattices=2)
    # straddle an interior face plane of lattice 0 (x = 2/8 at res 9),
    # with y/z interior to BOTH lattices' cells: near face-face edges the
    # blend stays continuous but its Lipschitz constant grows (both
    # bumps small), so the tight bound is probed away from edges
    eps = 1e-5
    y = np.full(16, 0.40, np.float32)
    z = np.linspace(0.39, 0.42, 16).astype(np.float32)
    lo = np.stack([np.full(16, 0.25 - eps, np.float32), y, z], -1)
    hi = np.stack([np.full(16, 0.25 + eps, np.float32), y, z], -1)

    jumps = {}
    for blend in ("mean", "smooth"):
        enc = BrickHashEncoding(blend=blend, **kw)
        params = enc.init(jax.random.PRNGKey(7), jnp.asarray(lo))["params"]
        # make per-cell features wildly different so face jumps are visible
        params = {"table": jax.random.normal(jax.random.PRNGKey(8),
                                             params["table"].shape)}
        a = enc.apply({"params": params}, jnp.asarray(lo))
        b = enc.apply({"params": params}, jnp.asarray(hi))
        jumps[blend] = float(jnp.max(jnp.abs(a - b)))
    assert jumps["smooth"] < 1e-3, jumps
    assert jumps["mean"] > 20 * jumps["smooth"], jumps


def test_brick_dense_level_is_injective_trilerp_at_corners():
    # one dense level (res 5 -> 64 cells <= table) — at an exact grid
    # vertex the trilerp weight collapses onto a single corner feature.
    enc = BrickHashEncoding(n_levels=1, n_features=2, log2_table_size=14, base_res=5, max_res=5)
    x = jnp.asarray([[0.25, 0.5, 0.75]])  # = vertex (1,2,3) of the 5-grid
    params = enc.init(jax.random.PRNGKey(0), x)["params"]
    out = enc.apply({"params": params}, x)
    tab = np.asarray(params["table"])  # [1, 1, Tb, 16]
    # cell = (1,2,3) clipped -> its corner (0,0,0) slot holds the feature
    ncells = 4
    cell = 1 + ncells * (2 + ncells * 3)
    np.testing.assert_allclose(
        np.asarray(out)[0], tab[0, 0, cell, 0:2], rtol=1e-5, atol=1e-7
    )


# ---------------------------------------------------------------- SH
def test_sh_encode_orthonormality():
    """Monte-Carlo check: int Y_i Y_j dOmega ~= delta_ij."""
    rng = np.random.RandomState(0)
    v = rng.randn(20000, 3)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    Y = np.asarray(sh_encode(jnp.asarray(v), 4))  # [N, 16]
    gram = 4 * np.pi * (Y.T @ Y) / v.shape[0]
    np.testing.assert_allclose(gram, np.eye(16), atol=0.15)


# ---------------------------------------------------------------- occupancy
def test_cell_roundtrip():
    idx = jnp.asarray([0, 5, 128 * 128 * 128 - 1])
    casc = jnp.zeros((3,), jnp.int32)
    pos = cell_centers(idx, casc)
    idx2, inb = pos_to_cell(pos, casc)
    np.testing.assert_array_equal(np.asarray(idx2), np.asarray(idx))
    assert np.all(np.asarray(inb))


def test_splat_and_bitfield():
    grid = create_grid(1)
    casc = jnp.zeros((4,), jnp.int32)
    cells = jnp.asarray([10, 10, 20, 30])
    dens = jnp.asarray([0.5, 0.9, 0.001, 2.0])
    grid = splat_density(grid, casc, cells, dens, decay=0.95)
    d = np.asarray(grid.density[0])
    assert d[10] == pytest.approx(0.9)  # max of duplicate splats
    assert d[30] == pytest.approx(2.0)
    grid = update_bitfield(grid, threshold=0.01)
    b = np.asarray(grid.bitfield[0])
    assert b[10] and b[30]
    # NGP thresholds at min(mean_density, 0.01); with a near-zero mean even
    # the 0.001 cell counts as occupied, while exact zeros do not.
    assert b[20]
    assert not b[40]
    # EMA decay path
    grid2 = splat_density(grid, casc[:1], jnp.asarray([10]), jnp.asarray([0.0]))
    assert np.asarray(grid2.density[0])[30] == pytest.approx(2.0 * 0.95)


def test_untrained_cells_stay_masked():
    grid = create_grid(1)
    grid = grid._replace(density=grid.density.at[0, 7].set(-1.0))
    grid = splat_density(grid, jnp.asarray([0]), jnp.asarray([7]), jnp.asarray([5.0]))
    assert float(grid.density[0, 7]) == -1.0
    grid = update_bitfield(grid)
    assert not bool(grid.bitfield[0, 7])


def test_generate_grid_samples_bias():
    grid = create_grid(1)
    grid = grid._replace(density=grid.density.at[0, 1000].set(1.0))
    pos, casc, cells = generate_grid_samples(jax.random.PRNGKey(0), grid, 64, 64, 0.5)
    assert pos.shape == (128, 3)
    # biased half must all hit the single occupied cell
    assert np.all(np.asarray(cells[64:]) == 1000)


def test_generate_grid_samples_exact_past_2e24_occupied():
    """VERDICT r2 #9: the int32-CDF inversion must stay exact when the
    occupied count exceeds 2^24 (where a float32 running count saturates;
    9 cascades x 128^3 = 18.9M cells). All-occupied grid: biased samples
    must be uniform over the FULL range, including cells past 2^24."""
    C = 9
    grid = create_grid(C, res=128)  # 18,874,368 cells > 2^24
    grid = grid._replace(density=jnp.ones_like(grid.density))
    n = 65536
    pos, casc, cells = generate_grid_samples(
        jax.random.PRNGKey(1), grid, 0, n, 0.5, res=128
    )
    flat = np.asarray(casc).astype(np.int64) * 128**3 + np.asarray(cells)
    assert flat.min() >= 0 and flat.max() < C * 128**3
    # with a saturated f32 cumsum no draw could ever land past 2^24; the
    # exact int32 CDF must put ~11.1% of draws there (2.1M/18.9M).
    frac_high = (flat > 2**24).mean()
    assert 0.08 < frac_high < 0.15, frac_high
    # roughly uniform over cascades
    counts = np.bincount(np.asarray(casc), minlength=C)
    assert counts.min() > n / C * 0.8


def test_init_aux_marks_untrained_and_update_keeps_them():
    """VERDICT r2 #4: init_aux must consume the dataset's cameras
    (mark_untrained_density_grid parity) and update_aux must never
    revive frustum-culled cells."""
    import types

    from xrnerf_tpu.models.networks.hashnerf import HashNerfNetwork

    # one camera at the +z face looking toward -z (OpenGL), narrow fov
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [0.5, 0.5, 1.5]
    ds = types.SimpleNamespace(
        poses_ngp=pose[None], i_train=np.asarray([0]), focal=800.0, H=100, W=100
    )
    net = HashNerfNetwork(
        n_levels=2, log2_table_size=12, max_res=32, grid_res=32,
        n_candidates=32, n_keep=8, grid_update_samples=1024,
    )
    rng = np.random.RandomState(0)
    batch = {
        "rays_o": jnp.asarray(rng.rand(8, 3).astype(np.float32)),
        "rays_d": jnp.asarray(rng.randn(8, 3).astype(np.float32)),
        "target": jnp.asarray(rng.rand(8, 3).astype(np.float32)),
    }
    params = net.init(jax.random.PRNGKey(0), batch, rng=None, train=False)["params"]
    grid = net.init_aux(params, ds)
    dens = np.asarray(grid.density[0])
    n_untrained = (dens == -1.0).sum()
    # narrow frustum: most of the cube is never seen, but some cells are
    assert n_untrained > 0.5 * dens.size
    assert n_untrained < dens.size
    # updates never revive untrained cells
    grid2 = net.update_aux(params, grid, jnp.asarray(16), jax.random.PRNGKey(1))
    dens2 = np.asarray(grid2.density[0])
    assert np.all(dens2[dens == -1.0] == -1.0)
    assert not np.asarray(grid2.bitfield[0])[dens == -1.0].any()


def test_march_cone_angle_schedule():
    """cone_angle > 0 must produce the NGP stepping rule
    dt = clamp(t*cone, dt_min, dt_max) on a 2-cascade grid."""
    grid = create_grid(2)
    o = jnp.asarray([[0.5, 0.5, -1.2]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    S, K = 256, 64
    m = march_rays(None, o, d, grid, n_candidates=S, n_keep=K, cone_angle=0.02)
    z = np.asarray(m.z_vals[0])
    dt = np.asarray(m.dt[0])
    live = np.asarray(m.mask[0])
    dt_min = np.sqrt(3.0) / S
    dt_max = dt_min * 2.0
    assert live.any()
    zl, dtl = z[live], dt[live]
    np.testing.assert_allclose(
        dtl, np.clip(zl * 0.02, dt_min, dt_max), rtol=1e-4
    )
    assert np.all(np.diff(zl) > 0)
    # 2-cascade box spans [-0.5, 1.5]: samples must reach the outer cascade
    pts = np.asarray(m.pts[0][live])
    assert np.abs(pts - 0.5).max() > 0.51


def test_hashnerf_two_cascade_training_step():
    """A bound>1 (2-cascade) scene must train: loss finite and grid
    update touches both cascades."""
    import optax

    from xrnerf_tpu.models.networks.hashnerf import HashNerfNetwork

    net = HashNerfNetwork(
        n_levels=4, log2_table_size=12, max_res=64, grid_res=32,
        n_cascades=2, cone_angle=0.01, n_candidates=64, n_keep=16,
        grid_update_samples=2048,
    )
    rng = np.random.RandomState(0)
    n = 64
    d = rng.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    batch = {
        "rays_o": jnp.asarray(0.5 + 1.2 * d),
        "rays_d": jnp.asarray(-d),
        "target": jnp.asarray(rng.rand(n, 3).astype(np.float32)),
    }
    params = net.init(jax.random.PRNGKey(0), batch, rng=None, train=False)["params"]
    aux = net.init_aux(params)
    tx = optax.adam(1e-2)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, aux, k):
        def lf(p):
            out = net.apply({"params": p}, batch, rng=k, train=True, aux=aux)
            return net.loss(out, batch)[0]

        loss, g = jax.value_and_grad(lf)(params)
        upd, opt2 = tx.update(g, opt)
        return optax.apply_updates(params, upd), opt2, loss

    for i in range(3):
        params, opt, loss = step(params, opt, aux, jax.random.PRNGKey(i))
        aux = net.update_aux(params, aux, jnp.asarray(i * 16), jax.random.PRNGKey(100 + i))
        assert np.isfinite(float(loss))
    assert aux.density.shape[0] == 2
    # both cascades received density updates
    assert float(jnp.abs(aux.density[0]).max()) > 0
    assert float(jnp.abs(aux.density[1]).max()) > 0


# ---------------------------------------------------------------- marching
def test_aabb_intersect():
    o = jnp.asarray([[-1.0, 0.5, 0.5], [0.5, 0.5, 0.5], [2.0, 0.5, 0.5]])
    d = jnp.asarray([[1.0, 0.0, 0.0], [1.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    tn, tf = aabb_intersect(o, d)
    # box behind the third ray -> clamped to (0, 0): empty span, no samples
    np.testing.assert_allclose(np.asarray(tn), [1.0, 0.0, 0.0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(tf), [2.0, 0.5, 0.0], atol=1e-5)


def test_march_skips_empty_space():
    grid = create_grid(1)
    # only a thin slab x in [0.5, 0.5+1/128) occupied
    occ = np.zeros((128, 128, 128), bool)
    occ[64] = True  # x index 64
    bit = jnp.asarray(occ.transpose(2, 1, 0).reshape(1, -1))  # idx = x + R(y + R z)
    grid = grid._replace(bitfield=bit)
    o = jnp.asarray([[-0.5, 0.5, 0.5]])
    d = jnp.asarray([[1.0, 0.0, 0.0]])
    m = march_rays(None, o, d, grid, n_candidates=512, n_keep=16)
    live = np.asarray(m.mask[0])
    z = np.asarray(m.z_vals[0])
    assert live.sum() >= 1
    # all live samples are inside the slab
    xs = np.asarray(m.pts[0][live][:, 0])
    assert np.all((xs >= 0.5 - 0.01) & (xs <= 0.5 + 1 / 128 + 0.01))
    # live samples sorted to the front and ordered by z
    k = int(live.sum())
    assert live[:k].all() and not live[k:].any()
    assert np.all(np.diff(z[:k]) >= -1e-6)


def test_composite_masked_matches_manual_gradient():
    """Autodiff through composite_masked must equal the reference's analytic
    gradient (calc_rgb.cu:71-144 suffix-sum formulation)."""
    rng = np.random.RandomState(0)
    n, k = 4, 8
    raw_rgb = jnp.asarray(rng.randn(n, k, 3).astype(np.float32))
    raw_sigma = jnp.asarray(rng.randn(n, k).astype(np.float32))
    z = jnp.sort(jnp.asarray(rng.rand(n, k).astype(np.float32)), axis=-1)
    dt = jnp.full((n, k), 0.05)
    mask = jnp.asarray(rng.rand(n, k) > 0.3)
    march = MarchResult(
        pts=jnp.zeros((n, k, 3)), dirs=jnp.zeros((n, 3)), z_vals=z, dt=dt, mask=mask
    )
    target = jnp.asarray(rng.rand(n, 3).astype(np.float32))

    def loss(rr, rs):
        out = composite_masked(rr, rs, march, white_bkgd=True)
        return jnp.sum((out["rgb"] - target) ** 2)

    g_rgb, g_sigma = jax.grad(loss, argnums=(0, 1))(raw_rgb, raw_sigma)

    # manual analytic gradient via the suffix trick
    rgb = jax.nn.sigmoid(raw_rgb)
    sigma = jnp.where(mask, jnp.exp(jnp.clip(raw_sigma, -15, 15)), 0.0)
    alpha = 1 - jnp.exp(-sigma * dt)
    T = jnp.concatenate(
        [jnp.ones((n, 1)), jnp.cumprod(1 - alpha[:, :-1] + 1e-10, -1)], -1
    )
    w = alpha * T
    rgb_map = jnp.sum(w[..., None] * rgb, -2) + (1 - w.sum(-1))[..., None]
    gout = 2 * (rgb_map - target)  # dL/drgb_map [n,3]
    # dL/draw_rgb = w * g * sigmoid'
    man_g_rgb = w[..., None] * gout[:, None, :] * rgb * (1 - rgb)
    np.testing.assert_allclose(np.asarray(g_rgb), np.asarray(man_g_rgb), rtol=1e-3, atol=1e-5)

    # dL/dsigma_i = dt * <g, T_i(1-a_i) c_i - suffix_i - bg> (the NGP
    # suffix trick, calc_rgb.cu:71-144): post-sample transmittance times
    # own color, minus all later contributions incl. the background.
    suffix = jnp.cumsum((w[..., None] * rgb)[:, ::-1], axis=1)[:, ::-1]
    suffix = jnp.concatenate([suffix[:, 1:], jnp.zeros((n, 1, 3))], axis=1)
    bg = (1 - w.sum(-1))[:, None, None]  # white bkgd residual transmittance
    t_post = T * (1 - alpha)
    man_g_sigma_act = dt * (
        jnp.einsum("nc,nkc->nk", gout, t_post[..., None] * rgb - suffix - bg)
    )
    man_g_sigma = man_g_sigma_act * sigma  # exp activation derivative
    np.testing.assert_allclose(
        np.asarray(g_sigma), np.asarray(man_g_sigma), rtol=1e-3, atol=1e-4
    )


# ---------------------------------------------------------------- network
def _ngp_batch(n=32, seed=0):
    rng = np.random.RandomState(seed)
    d = rng.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = 0.5 + 0.1 * rng.randn(n, 3).astype(np.float32)
    return {
        "rays_o": jnp.asarray(o),
        "rays_d": jnp.asarray(d),
        "target": jnp.asarray(rng.rand(n, 3).astype(np.float32)),
        "alpha": jnp.asarray(rng.rand(n, 1).astype(np.float32)),
    }


def _tiny_ngp(**kw):
    defaults = dict(
        n_levels=4, log2_table_size=12, base_res=4, max_res=64, hidden_dim=16,
        geo_feat_dim=7, n_candidates=64, n_keep=16, grid_update_samples=512,
        grid_res=32,
    )
    defaults.update(kw)
    return HashNerfNetwork(**defaults)


def test_hashnerf_forward_loss_grid_update():
    net = _tiny_ngp()
    batch = _ngp_batch()
    grid = net.init_aux(None)
    params = net.init(jax.random.PRNGKey(0), batch, rng=None, train=False, aux=grid)[
        "params"
    ]
    out = net.apply({"params": params}, batch, rng=None, train=False, aux=grid)
    assert out["rgb"].shape == (32, 3)
    loss, log = net.loss(out, batch)
    assert np.isfinite(float(loss))
    assert "acc_err" in log and "live_frac" in log

    grid2 = net.update_aux(params, grid, jnp.asarray(0), jax.random.PRNGKey(1))
    assert grid2.density.shape == grid.density.shape
    assert np.all(np.isfinite(np.asarray(grid2.density)))

    def lf(p):
        o = net.apply({"params": p}, batch, rng=jax.random.PRNGKey(2), train=True, aux=grid2)
        return net.loss(o, batch)[0]

    g = jax.grad(lf)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in leaves)
    assert any(float(jnp.abs(x).max()) > 0 for x in leaves)


def test_sample_budget_hook_buckets():
    """Bucketed replacement for ngp_grid_sampler.py:268-281's dynamic
    batch feedback: bucket choice tracks live_frac, moves N_rand."""
    from xrnerf_tpu.core.hooks import SampleBudgetHook

    h = SampleBudgetHook(target_samples=2**18, buckets=(1024, 2048, 4096, 8192, 16384))
    # all samples live, n_keep 64 -> 4096 rays exactly fills 2^18
    h._frac = 1.0
    assert h.pick(64) == 4096
    # 25% live -> 4x more rays fit the same budget
    h._frac = 0.25
    assert h.pick(64) == 16384
    # 60% live -> needed ~6826 -> round DOWN to 4096 (never exceed budget)
    h._frac = 0.6
    assert h.pick(64) == 4096
    # pathological tiny frac clamps to the largest bucket
    h._frac = 1e-6
    assert h.pick(64) == 16384


def test_sample_budget_hook_in_trainer(synthetic_scene, tmp_path):
    """Trainer + hook integration: N_rand moves to the bucket implied by
    the observed live_frac and training continues across the reshape."""
    from xrnerf_tpu.core.hooks import SampleBudgetHook
    from xrnerf_tpu.core.trainer import Trainer
    from xrnerf_tpu.datasets.hashnerf import HashNerfDataset

    ds = HashNerfDataset(datadir=synthetic_scene, N_rand=64, testskip=1)
    net = _tiny_ngp()
    hook = SampleBudgetHook(target_samples=2048, buckets=(32, 64, 128, 256))
    tr = Trainer(
        net, ds, optimizer={"lr": 1e-2}, work_dir=str(tmp_path), max_iters=30,
        ckpt_interval=0, log_interval=10, eval_chunk=256, hooks=[hook],
    )
    state = tr.run()
    assert int(state.step) == 30
    assert np.isfinite(tr.last_logs["loss"])
    # live_frac was observed and a bucket decision applied
    assert hook._frac is not None
    assert ds.N_rand == hook.pick(net.n_keep)


def test_hashnerf_trainer_end_to_end(synthetic_scene, tmp_path):
    from xrnerf_tpu.core.trainer import Trainer
    from xrnerf_tpu.datasets.hashnerf import HashNerfDataset

    ds = HashNerfDataset(datadir=synthetic_scene, N_rand=64, testskip=1)
    net = _tiny_ngp()
    tr = Trainer(
        net, ds, optimizer={"lr": 1e-2}, work_dir=str(tmp_path), max_iters=20,
        ckpt_interval=20, log_interval=10, eval_chunk=256,
    )
    state = tr.run()
    assert int(state.step) == 20
    assert np.isfinite(tr.last_logs["loss"])
    # aux grid checkpointed and resumable
    import glob

    ck = sorted(glob.glob(str(tmp_path / "ckpt_*.msgpack")))[-1]
    tr2 = Trainer(
        net, ds, optimizer={"lr": 1e-2}, work_dir=str(tmp_path), max_iters=22,
        ckpt_interval=0, log_interval=10, eval_chunk=256, resume_from=ck,
    )
    assert tr2.start_step == 20
    tr2.run()


def test_sample_budget_compaction_matches_full_eval():
    """With a budget covering every live sample, batch-level compaction
    (parity: compacted_coord's target_batch_size cap) must reproduce the
    uncompacted render exactly; with a tiny budget it must still produce
    finite output with overflow samples contributing ~zero density."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from xrnerf_tpu.models.networks.hashnerf import HashNerfNetwork

    rng = np.random.RandomState(0)
    n = 64
    d = rng.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    batch = {
        "rays_o": jnp.asarray(rng.rand(n, 3).astype(np.float32)),
        "rays_d": jnp.asarray(d),
        "target": jnp.asarray(rng.rand(n, 3).astype(np.float32)),
    }
    kw = dict(
        n_levels=4, log2_table_size=12, base_res=4, max_res=32,
        hidden_dim=16, geo_feat_dim=7, n_candidates=32, n_keep=8,
        grid_res=16, dtype=jnp.float32,
    )
    full = HashNerfNetwork(**kw, sample_budget=0)
    params = full.init(jax.random.PRNGKey(0), batch, rng=None, train=False)["params"]
    aux = full.init_aux(params)
    # structured partial occupancy so live < n*k and the budget branch
    # engages with full coverage
    bf = np.asarray(aux.bitfield).reshape(1, 16, 16, 16).copy()
    bf[:, 8:] = False
    aux = aux._replace(bitfield=jnp.asarray(bf.reshape(1, -1)))
    out_full = full.apply({"params": params}, batch, rng=None, train=False, aux=aux)
    n_live = int(out_full["n_live_samples"])
    assert 0 < n_live < n * 8

    # budget >= live count: identical (every live sample evaluated)
    capped = HashNerfNetwork(**kw, sample_budget=max(n_live, 1))
    out_cap = capped.apply({"params": params}, batch, rng=None, train=False, aux=aux)
    np.testing.assert_allclose(
        np.asarray(out_cap["rgb"]), np.asarray(out_full["rgb"]), atol=2e-5
    )

    tiny = HashNerfNetwork(**kw, sample_budget=32)
    out_tiny = tiny.apply({"params": params}, batch, rng=None, train=False, aux=aux)
    assert np.all(np.isfinite(np.asarray(out_tiny["rgb"])))

"""KiloNeRF tests: network assignment, MoE dispatch, multi-MLP locality,
occupancy build, distill fit, finetune render."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xrnerf_tpu.models.fields.kilonerf_field import (
    MultiNetworkMLP,
    assign_networks,
    moe_dispatch,
)
from xrnerf_tpu.models.networks.kilonerf import (
    KiloNerfNetwork,
    StudentNerfNetwork,
    build_occupancy_grid,
)


def test_assign_networks():
    dmin = jnp.asarray([-1.0, -1.0, -1.0])
    dmax = jnp.asarray([1.0, 1.0, 1.0])
    pts = jnp.asarray(
        [[-1.0, -1.0, -1.0], [0.99, 0.99, 0.99], [0.0, 0.0, 0.0], [2.0, 0.0, 0.0]]
    )
    idx, local = assign_networks(pts, dmin, dmax, (2, 2, 2))
    assert int(idx[0]) == 0
    assert int(idx[1]) == 7
    assert int(idx[3]) == -1  # out of domain
    # local coords in [-1, 1]
    assert float(jnp.abs(local[:3]).max()) <= 1.0 + 1e-5
    np.testing.assert_allclose(np.asarray(local[0]), [-1, -1, -1], atol=1e-6)


def test_moe_dispatch_capacity():
    idx = jnp.asarray([0, 0, 0, 1, 1, -1, 2, 0])
    dest, keep, order = moe_dispatch(idx, n_nets=3, capacity=2)
    k = np.asarray(keep)
    d = np.asarray(dest)
    o = np.asarray(order)
    # invalid point dropped; net 0 has 4 points, only 2 kept
    kept_nets = np.asarray(idx)[o][k]
    assert (kept_nets == 0).sum() == 2
    assert (kept_nets == 1).sum() == 2
    assert (kept_nets == 2).sum() == 1
    # destinations within each net's slots and unique
    assert len(np.unique(d[k])) == k.sum()
    assert np.all(d[k] // 2 == kept_nets)


def test_multinetwork_is_spatially_local():
    """Changing one network's weights must only affect its own points."""
    mlp = MultiNetworkMLP(n_nets=8, hidden=8, multires=2, multires_dirs=1,
                          capacity_factor=8.0)
    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.uniform(-1, 1, (32, 3)).astype(np.float32))
    dirs = jnp.asarray(rng.randn(32, 3).astype(np.float32))
    net_idx = jnp.asarray(rng.randint(0, 8, (32,)))
    params = mlp.init(jax.random.PRNGKey(0), pts, dirs, net_idx)["params"]
    rgb0, sigma0 = mlp.apply({"params": params}, pts, dirs, net_idx)
    # perturb only network 3's weights
    p2 = jax.tree_util.tree_map(lambda x: x, params)
    p2 = {**p2, "hidden_0_w": params["hidden_0_w"].at[3].add(1.0)}
    rgb1, sigma1 = mlp.apply({"params": p2}, pts, dirs, net_idx)
    mask3 = np.asarray(net_idx) == 3
    changed = np.any(np.asarray(rgb0 != rgb1), axis=-1) | np.asarray(sigma0 != sigma1)
    assert changed[mask3].any()
    assert not changed[~mask3].any()
    # empty points (idx -1) give zero density after relu(-1e3)
    idx_empty = jnp.full((32,), -1)
    _, sig_e = mlp.apply({"params": params}, pts, dirs, idx_empty)
    assert np.all(np.asarray(jax.nn.relu(sig_e)) == 0)


def test_student_distill_fits_analytic_teacher():
    from xrnerf_tpu.datasets.kilonerf import KiloNerfDistillDataset

    def teacher(pts, dirs):
        # smooth analytic field: rgb from position, density from a blob
        rgb = 0.5 + 0.5 * jnp.tanh(pts)
        sigma = 5.0 * jnp.exp(-4.0 * jnp.sum(pts**2, -1))
        return rgb, sigma

    ds = KiloNerfDistillDataset(
        resolution=(2, 2, 2), points_per_net=32, teacher_fn=teacher
    )
    net = StudentNerfNetwork(
        resolution=(2, 2, 2), hidden=16, multires=4, multires_dirs=0, capacity_factor=8.0
    )
    b0 = ds.train_batch(0)
    params = net.init(jax.random.PRNGKey(0), {k: jnp.asarray(v) for k, v in b0.items()})[
        "params"
    ]

    import optax

    tx = optax.adam(5e-3)
    opt = tx.init(params)

    @jax.jit
    def step(p, o, batch):
        def lf(p):
            out = net.apply({"params": p}, batch)
            return net.loss(out, batch)[0]

        loss, g = jax.value_and_grad(lf)(p)
        up, o = tx.update(g, o)
        return optax.apply_updates(p, up), o, loss

    losses = []
    for i in range(60):
        batch = {k: jnp.asarray(v) for k, v in ds.train_batch(i).items()}
        params, opt, loss = step(params, opt, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])


def test_gather_dispatch_matches_scatter_dispatch():
    """The inference (sort+gather) dispatch must produce identical
    outputs to the training (scatter) dispatch: same stable grouping,
    same capacity drops, same grouped matmul layout."""
    rng = np.random.RandomState(1)
    n_nets, b = 27, 513
    mlp = MultiNetworkMLP(
        n_nets=n_nets, hidden=8, multires=4, multires_dirs=2, capacity_factor=1.5
    )
    pts = jnp.asarray(rng.uniform(-1, 1, size=(b, 3)).astype(np.float32))
    d = rng.randn(b, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    dirs = jnp.asarray(d)
    idx = jnp.asarray(rng.randint(-1, n_nets, size=(b,)).astype(np.int32))
    params = mlp.init(jax.random.PRNGKey(0), pts, dirs, idx)["params"]
    rgb_s, sig_s = mlp.apply({"params": params}, pts, dirs, idx)
    rgb_g, sig_g = mlp.apply(
        {"params": params}, pts, dirs, idx, gather_dispatch=True
    )
    np.testing.assert_allclose(np.asarray(rgb_g), np.asarray(rgb_s), atol=1e-5)
    np.testing.assert_allclose(np.asarray(sig_g), np.asarray(sig_s), atol=1e-5)


def test_kilonerf_fast_path_matches_full_eval():
    """Keep-K ESS inference vs full n_samples evaluation on a scene
    whose live samples fit under the budget: renders must closely agree
    (only the dist convention differs: fixed candidate dt vs z-diffs)."""
    net_full = KiloNerfNetwork(
        resolution=(4, 4, 4), hidden=8, multires=4, multires_dirs=2,
        n_samples=64, capacity_factor=8.0, n_keep=0,
    )
    net_fast = KiloNerfNetwork(
        resolution=(4, 4, 4), hidden=8, multires=4, multires_dirs=2,
        n_samples=64, capacity_factor=8.0, n_keep=24,
    )
    rng = np.random.RandomState(0)
    n = 32
    d = rng.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    batch = {
        "rays_o": jnp.asarray(2.0 * d),
        "rays_d": jnp.asarray(-d),
        "near": jnp.full((n, 1), 1.0),
        "far": jnp.full((n, 1), 3.0),
    }
    # occupancy: a thin central slab -> few live samples per ray
    occ = np.zeros((8, 8, 8), bool)
    occ[3:5, 3:5, 3:5] = True
    occ = jnp.asarray(occ)
    params = net_full.init(
        jax.random.PRNGKey(0), batch, rng=None, train=False, aux=occ
    )["params"]
    out_full = net_full.apply({"params": params}, batch, rng=None, train=False, aux=occ)
    out_fast = net_fast.apply({"params": params}, batch, rng=None, train=False, aux=occ)
    err = float(jnp.abs(out_fast["rgb"] - out_full["rgb"]).max())
    assert err < 0.02, err
    np.testing.assert_allclose(
        np.asarray(out_fast["acc"]), np.asarray(out_full["acc"]), atol=0.02
    )


def test_build_occupancy_grid():
    def density(pts):
        return jnp.where(jnp.linalg.norm(pts, axis=-1) < 0.5, 100.0, 0.0)

    occ = build_occupancy_grid(
        density, (-1, -1, -1), (1, 1, 1), res=(8, 8, 8), subsamples=2, threshold=10.0
    )
    assert occ.shape == (8, 8, 8)
    assert occ[4, 4, 4]  # center occupied
    assert not occ[0, 0, 0]  # corner empty
    frac = occ.mean()
    assert 0.02 < frac < 0.5


def test_kilonerf_network_render_and_reg():
    net = KiloNerfNetwork(
        resolution=(4, 4, 4), hidden=8, multires=4, multires_dirs=2,
        n_samples=16, capacity_factor=4.0,
    )
    rng = np.random.RandomState(0)
    n = 8
    d = rng.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    batch = {
        "rays_o": jnp.asarray(2.0 * d),  # outside, looking inward
        "rays_d": jnp.asarray(-d),
        "near": jnp.full((n, 1), 1.0),
        "far": jnp.full((n, 1), 3.0),
        "target": jnp.asarray(rng.rand(n, 3).astype(np.float32)),
    }
    occ = jnp.ones((8, 8, 8), bool)
    params = net.init(jax.random.PRNGKey(0), batch, rng=None, train=False, aux=occ)[
        "params"
    ]
    out = net.apply({"params": params}, batch, rng=None, train=False, aux=occ)
    assert out["rgb"].shape == (n, 3)
    loss, _ = net.loss(out, batch)
    reg = net.param_loss(params)
    assert float(reg) > 0
    # occupancy fully off -> empty render (white bkgd)
    out2 = net.apply(
        {"params": params}, batch, rng=None, train=False, aux=jnp.zeros((8, 8, 8), bool)
    )
    np.testing.assert_allclose(np.asarray(out2["rgb"]), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out2["acc"]), 0.0, atol=1e-6)


def test_sphere_march_matches_dense_march_with_sufficient_budget():
    """kilonerf_sphere_march walks the same z-lattice as kilonerf_march
    and must keep the IDENTICAL first-K live set when its step budget
    covers the ray (docs/benchmark.md: the ~6x cheaper ESS for TPU)."""
    import numpy as np

    from xrnerf_tpu.models.networks.kilonerf import (
        kilonerf_march,
        kilonerf_sphere_march,
    )

    rng = np.random.RandomState(0)
    N, S, K, G = 64, 96, 16, 16
    d = rng.randn(N, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ro = jnp.asarray(rng.randn(N, 3).astype(np.float32) * 0.1)
    rd = jnp.asarray(d)
    near = jnp.full((N, 1), 0.5, jnp.float32)
    far = jnp.full((N, 1), 2.5, jnp.float32)
    occ = jnp.asarray(rng.rand(G, G, G) < 0.1)
    dmin = jnp.asarray([-1.0, -1.0, -1.0])
    dmax = jnp.asarray([1.0, 1.0, 1.0])

    zk_d, m_d, dt_d = kilonerf_march(ro, rd, near, far, occ, dmin, dmax, S, K)
    zk_s, m_s, dt_s = kilonerf_sphere_march(
        ro, rd, near, far, occ, dmin, dmax, S, K, n_steps=S
    )
    np.testing.assert_array_equal(np.asarray(m_d), np.asarray(m_s))
    np.testing.assert_allclose(
        np.asarray(zk_d), np.asarray(zk_s), rtol=0, atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(dt_d), np.asarray(dt_s))
    # and the distance transform is conservative: d>0 => cell unoccupied
    from xrnerf_tpu.models.networks.kilonerf import distance_transform_linf

    dist = distance_transform_linf(occ)
    assert not bool(jnp.any((dist > 0) & occ))
    assert bool(jnp.all(dist[occ] == 0))


def test_sphere_march_matches_dense_march_with_unnormalized_dirs():
    """get_rays-style pixel directions have norms up to ~1.12 at image
    corners; the sphere march's free-space skip is a world-space bound,
    so it must divide by the per-ray norm (round-4 fix) — otherwise
    peripheral rays overshoot occupied cells and silently lose their
    first live samples."""
    import numpy as np

    from xrnerf_tpu.models.networks.kilonerf import (
        kilonerf_march,
        kilonerf_sphere_march,
    )

    rng = np.random.RandomState(1)
    N, S, K, G = 64, 96, 16, 16
    d = rng.randn(N, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    # scale norms into [1.0, 1.4] like camera-corner ray bundles
    d *= (1.0 + 0.4 * rng.rand(N, 1)).astype(np.float32)
    ro = jnp.asarray(rng.randn(N, 3).astype(np.float32) * 0.1)
    rd = jnp.asarray(d)
    near = jnp.full((N, 1), 0.5, jnp.float32)
    far = jnp.full((N, 1), 2.0, jnp.float32)
    occ = jnp.asarray(rng.rand(G, G, G) < 0.1)
    dmin = jnp.asarray([-1.0, -1.0, -1.0])
    dmax = jnp.asarray([1.0, 1.0, 1.0])

    zk_d, m_d, _ = kilonerf_march(ro, rd, near, far, occ, dmin, dmax, S, K)
    zk_s, m_s, _ = kilonerf_sphere_march(
        ro, rd, near, far, occ, dmin, dmax, S, K, n_steps=S
    )
    np.testing.assert_array_equal(np.asarray(m_d), np.asarray(m_s))
    np.testing.assert_allclose(
        np.asarray(zk_d), np.asarray(zk_s), rtol=0, atol=1e-5
    )


def test_keep_first_k_matches_sort_compaction():
    import numpy as np

    from xrnerf_tpu.ops.compaction import keep_first_k

    rng = np.random.RandomState(0)
    live = jnp.asarray(rng.rand(32, 48) < 0.3)
    idx, mask = keep_first_k(live, 8)
    idx, mask = np.asarray(idx), np.asarray(mask)
    for n in range(32):
        pos = np.nonzero(np.asarray(live)[n])[0]
        k = min(len(pos), 8)
        assert mask[n, :k].all() and not mask[n, k:].any()
        np.testing.assert_array_equal(idx[n, :k], pos[:k])


def test_pooled_march_matches_dense_march():
    """Two-stage flat-gather ESS == dense march's first-K live set, with
    ample group budget — including unnormalized camera-style dirs."""
    import numpy as np

    from xrnerf_tpu.models.networks.kilonerf import (
        kilonerf_march,
        kilonerf_pooled_march,
    )

    rng = np.random.RandomState(2)
    N, S, K, G = 64, 96, 16, 16
    for scale_norms in (False, True):
        d = rng.randn(N, 3).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        if scale_norms:
            d *= (1.0 + 0.4 * rng.rand(N, 1)).astype(np.float32)
        ro = jnp.asarray(rng.randn(N, 3).astype(np.float32) * 0.1)
        rd = jnp.asarray(d)
        near = jnp.full((N, 1), 0.5, jnp.float32)
        far = jnp.full((N, 1), 2.0, jnp.float32)
        occ = jnp.asarray(rng.rand(G, G, G) < 0.1)
        dmin = jnp.asarray([-1.0, -1.0, -1.0])
        dmax = jnp.asarray([1.0, 1.0, 1.0])

        zk_d, m_d, dt_d = kilonerf_march(ro, rd, near, far, occ, dmin, dmax, S, K)
        # ample budget: every group kept (Kg = S/group)
        zk_p, m_p, dt_p = kilonerf_pooled_march(
            ro, rd, near, far, occ, dmin, dmax, S, K,
            group=8, n_groups_keep=S // 8,
        )
        np.testing.assert_array_equal(np.asarray(m_d), np.asarray(m_p))
        np.testing.assert_allclose(
            np.asarray(zk_d), np.asarray(zk_p), rtol=0, atol=1e-5
        )
        np.testing.assert_allclose(np.asarray(dt_d), np.asarray(dt_p))


def test_eval_budget_compaction_matches_full_eval():
    """eval_budget >= live count must reproduce the uncompacted fast
    render exactly (compacted_coord target_batch_size semantics)."""
    import numpy as np

    from xrnerf_tpu.models.networks.kilonerf import KiloNerfNetwork

    rng = np.random.RandomState(3)
    N = 32
    d = rng.randn(N, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    batch = {
        "rays_o": jnp.asarray(rng.randn(N, 3).astype(np.float32) * 0.1),
        "rays_d": jnp.asarray(d),
        "near": jnp.full((N, 1), 0.5, jnp.float32),
        "far": jnp.full((N, 1), 2.0, jnp.float32),
    }
    occ = jnp.asarray(rng.rand(8, 8, 8) < 0.2)
    kw = dict(
        resolution=(4, 4, 4), hidden=8, n_hidden_layers=1, multires=2,
        multires_dirs=2, n_samples=64, n_keep=8, march="pooled",
    )
    full = KiloNerfNetwork(**kw, eval_budget=0)
    params = full.init(jax.random.PRNGKey(0), batch, rng=None, train=False, aux=occ)[
        "params"
    ]
    out_full = full.apply({"params": params}, batch, rng=None, train=False, aux=occ)
    capped = KiloNerfNetwork(**kw, eval_budget=N * 8 - 1)
    out_cap = capped.apply({"params": params}, batch, rng=None, train=False, aux=occ)
    # budget N*8-1 engages the branch; at most one (dead, since dead
    # sort last) slot dropped when any dead slot exists
    np.testing.assert_allclose(
        np.asarray(out_cap["rgb"]), np.asarray(out_full["rgb"]), atol=2e-5
    )


def test_strip_active_is_conservative():
    """Frame-level culling must never mark a ray inactive that the dense
    march finds live samples on — for coherent camera-style strips AND
    adversarial incoherent strips (the radius is data-dependent)."""
    import numpy as np

    from xrnerf_tpu.models.networks.kilonerf import (
        distance_transform_linf,
        kilonerf_march,
        kilonerf_strip_active,
    )

    rng = np.random.RandomState(7)
    G, S, K, strip = 16, 96, 16, 8
    occ = jnp.asarray(rng.rand(G, G, G) < 0.08)
    dist = distance_transform_linf(occ)
    dmin = jnp.asarray([-1.0, -1.0, -1.0])
    dmax = jnp.asarray([1.0, 1.0, 1.0])

    for coherent in (True, False):
        N = 128
        if coherent:
            # pinhole-style bundle: shared origin, small angular steps
            base = np.array([0.1, -0.2, 1.0], np.float32)
            jit = rng.randn(N, 3).astype(np.float32) * 0.01
            d = base[None, :] + jit
            ro = np.tile(np.array([[0.0, 0.0, -2.5]], np.float32), (N, 1))
        else:
            d = rng.randn(N, 3).astype(np.float32)
            ro = rng.randn(N, 3).astype(np.float32) * 0.3
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        d *= (1.0 + 0.4 * rng.rand(N, 1)).astype(np.float32)  # unnormalized
        ro, rd = jnp.asarray(ro), jnp.asarray(d)
        near = jnp.full((N, 1), 0.5, jnp.float32)
        far = jnp.full((N, 1), 4.0, jnp.float32)

        _, m_d, _ = kilonerf_march(ro, rd, near, far, occ, dmin, dmax, S, K)
        live_ray = np.asarray(jnp.any(m_d, axis=-1))
        active = np.asarray(
            kilonerf_strip_active(
                ro, rd, near, far, dist, dmin, dmax, strip=strip, n_probes=48
            )
        )
        assert active.shape == (N,)
        # conservative: live => active (no false culls)
        assert not np.any(live_ray & ~active), (
            f"coherent={coherent}: culled a live ray"
        )
    # culling power: on a single-blob scene, strips aimed away from the
    # blob must be culled (this is the whole point of the prepass)
    occ1 = np.zeros((G, G, G), bool)
    occ1[7:9, 7:9, 7:9] = True
    dist1 = distance_transform_linf(jnp.asarray(occ1))
    N = 64
    on = np.tile(np.array([0.0, 0.0, 1.0], np.float32), (N // 2, 1))
    off = np.tile(np.array([1.0, 1.0, -0.2], np.float32), (N // 2, 1))
    d = np.concatenate([on, off]) + rng.randn(N, 3).astype(np.float32) * 0.005
    ro = jnp.asarray(np.tile(np.array([[0.0, 0.0, -2.5]], np.float32), (N, 1)))
    active = np.asarray(
        kilonerf_strip_active(
            ro, jnp.asarray(d), jnp.full((N, 1), 0.5), jnp.full((N, 1), 4.0),
            dist1, dmin, dmax, strip=strip, n_probes=48,
        )
    )
    assert np.all(active[: N // 2])  # through the blob
    assert not np.any(active[N // 2 :])  # aimed away


def test_renderer_cull_is_output_identical():
    """render_rays_chunked(active_fn=...) must reproduce the uncalled
    render exactly: culled rays are provably background."""
    import numpy as np

    from xrnerf_tpu.core.renderer import render_rays_chunked
    from xrnerf_tpu.models.networks.kilonerf import (
        KiloNerfNetwork,
        kilonerf_strip_active,
        prepare_march_aux,
    )

    rng = np.random.RandomState(11)
    G = 16
    occ = np.zeros((G, G, G), bool)
    occ[7:9, 7:9, 7:9] = True
    aux = prepare_march_aux(jnp.asarray(occ))
    N = 64
    on = np.tile(np.array([0.0, 0.0, 1.0], np.float32), (N // 2, 1))
    off = np.tile(np.array([1.0, 1.0, -0.2], np.float32), (N // 2, 1))
    d = np.concatenate([on, off]) + rng.randn(N, 3).astype(np.float32) * 0.005
    rays = {
        "rays_o": np.tile(np.array([[0.0, 0.0, -2.5]], np.float32), (N, 1)),
        "rays_d": d,
        "near": np.full((N, 1), 0.5, np.float32),
        "far": np.full((N, 1), 4.0, np.float32),
    }
    net = KiloNerfNetwork(
        resolution=(4, 4, 4), domain_min=(-1.0,) * 3, domain_max=(1.0,) * 3,
        hidden=8, n_hidden_layers=1, multires=2, multires_dirs=2,
        n_samples=64, n_keep=8, march="pooled",
        # no-overflow capacity: with the default factor the MoE drops
        # samples chunk-composition-dependently, so renders at different
        # chunk sizes are legitimately non-identical and the cross-chunk
        # identity comparison below would be ill-posed
        capacity_factor=64.0,
    )
    b0 = {k: jnp.asarray(v) for k, v in rays.items()}
    params = net.init(jax.random.PRNGKey(0), b0, rng=None, train=False, aux=aux)[
        "params"
    ]

    def apply_fn(p, b, r):
        return net.apply({"params": p}, b, rng=None, train=False, aux=aux)

    def active_fn(b):
        return kilonerf_strip_active(
            b["rays_o"], b["rays_d"], b["near"], b["far"], aux.dist,
            jnp.asarray([-1.0] * 3), jnp.asarray([1.0] * 3),
            strip=8, n_probes=48,
        )

    keys = ("rgb", "disp", "acc")  # disp included: its background fill
    # must match the uncalled empty-ray render (1/1e-10), ADVICE r4
    base = render_rays_chunked(apply_fn, params, rays, chunk=32, keys=keys)
    culled = render_rays_chunked(
        apply_fn, params, rays, chunk=32, keys=keys, active_fn=active_fn,
    )
    np.testing.assert_allclose(culled["rgb"], base["rgb"], atol=1e-6)
    np.testing.assert_allclose(culled["acc"], base["acc"], atol=1e-6)
    np.testing.assert_allclose(culled["disp"], base["disp"], rtol=1e-5)

    # chunk NOT a multiple of strip: prepass must pad internally
    culled2 = render_rays_chunked(
        apply_fn, params, rays, chunk=24, keys=keys,
        active_fn=lambda b: kilonerf_strip_active(
            b["rays_o"], b["rays_d"], b["near"], b["far"], aux.dist,
            jnp.asarray([-1.0] * 3), jnp.asarray([1.0] * 3),
            strip=16, n_probes=48,
        ),
    )
    np.testing.assert_allclose(culled2["rgb"], base["rgb"], atol=1e-6)

    # fully-culled frame: every key present, all-background, right shape
    empty = render_rays_chunked(
        apply_fn, params, rays, chunk=32, keys=keys,
        active_fn=lambda b: jnp.zeros(b["rays_o"].shape[0], bool),
    )
    assert set(empty) == set(keys)
    assert empty["rgb"].shape == base["rgb"].shape
    np.testing.assert_allclose(empty["rgb"], 1.0)
    np.testing.assert_allclose(empty["acc"], 0.0)
    np.testing.assert_allclose(empty["disp"], 1e10)

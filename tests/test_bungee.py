"""BungeeNeRF tests: progressive MLP shapes, stage-masked compositing and
loss, dataset scale codes + curriculum stage."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xrnerf_tpu.models.fields.bungee_mlp import BungeeNerfMLP
from xrnerf_tpu.models.networks.bungeenerf import BungeeNerfNetwork, _stage_composite


def test_bungee_mlp_shapes():
    mlp = BungeeNerfMLP(n_stages=3, netdepth_base=2, netwidth=32)
    x = jnp.ones((10, 24))
    v = jnp.ones((10, 11))
    params = mlp.init(jax.random.PRNGKey(0), x, v)["params"]
    rgb, sigma = mlp.apply({"params": params}, x, v)
    assert rgb.shape == (10, 3, 3)
    assert sigma.shape == (10, 3)


def test_stage_composite_masking():
    n, s, st = 2, 4, 3
    rng = np.random.RandomState(0)
    raw_rgb = jnp.asarray(rng.randn(n, s, st, 3).astype(np.float32))
    raw_sigma = jnp.asarray(rng.randn(n, s, st).astype(np.float32))
    t_vals = jnp.broadcast_to(jnp.linspace(1.0, 2.0, s + 1), (n, s + 1))
    rays_d = jnp.asarray(rng.randn(n, 3).astype(np.float32))
    m0 = jnp.asarray([1.0, 0.0, 0.0])
    m_all = jnp.ones((st,))
    r0 = _stage_composite(raw_rgb, raw_sigma, m0, t_vals, rays_d, False)
    r_all = _stage_composite(raw_rgb, raw_sigma, m_all, t_vals, rays_d, False)
    # different stage masks -> different renders
    assert not np.allclose(np.asarray(r0["rgb"]), np.asarray(r_all["rgb"]))
    # stage-0 mask ignores later-stage params entirely
    raw_rgb2 = raw_rgb.at[:, :, 1:].add(100.0)
    r0b = _stage_composite(raw_rgb2, raw_sigma, m0, t_vals, rays_d, False)
    np.testing.assert_allclose(np.asarray(r0["rgb"]), np.asarray(r0b["rgb"]), atol=1e-6)


def _bungee_batch(n=8, stage=1, seed=0):
    rng = np.random.RandomState(seed)
    d = rng.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return {
        "rays_o": jnp.asarray(rng.randn(n, 3).astype(np.float32)),
        "rays_d": jnp.asarray(d),
        "radii": jnp.full((n, 1), 1e-2),
        "near": jnp.full((n, 1), 1.0),
        "far": jnp.full((n, 1), 4.0),
        "target": jnp.asarray(rng.rand(n, 3).astype(np.float32)),
        "scale_code": jnp.asarray(rng.randint(0, 3, (n, 1)).astype(np.float32)),
        "stage": jnp.asarray(stage, jnp.int32),
    }


def test_bungee_network_forward_and_stage_loss():
    net = BungeeNerfNetwork(n_stages=3, n_samples=8, netwidth=32, max_deg_point=6)
    batch = _bungee_batch(8, stage=1)
    params = net.init(jax.random.PRNGKey(0), batch, rng=None, train=False)["params"]
    out = net.apply({"params": params}, batch, rng=None, train=False)
    assert out["rgb"].shape == (8, 3)
    loss, log = net.loss(out, batch)
    assert np.isfinite(float(loss))

    # rays with scale_code > stage contribute zero loss
    b2 = dict(batch)
    b2["scale_code"] = jnp.full((8, 1), 2.0)
    b2["stage"] = jnp.asarray(0, jnp.int32)
    out2 = net.apply({"params": params}, b2, rng=None, train=False)
    loss2, _ = net.loss(out2, b2)
    assert float(loss2) == 0.0

    def lf(p):
        o = net.apply({"params": p}, batch, rng=jax.random.PRNGKey(1), train=True)
        return net.loss(o, batch)[0]

    g = jax.grad(lf)(params)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in jax.tree_util.tree_leaves(g))


def test_bungee_dataset(synthetic_scene):
    from xrnerf_tpu.datasets.bungee import BungeeDataset

    ds = BungeeDataset(datadir=synthetic_scene, n_stages=2, iters_per_stage=10,
                       N_rand=32, testskip=1)
    b = ds.train_batch(0)
    assert b["rays_o"].shape == (32, 3)
    assert b["radii"].shape == (32, 1)
    assert b["scale_code"].shape == (32, 1)
    assert int(b["stage"]) == 0
    assert int(ds.train_batch(15)["stage"]) == 1
    assert int(ds.train_batch(1000)["stage"]) == 1  # clamped to last stage
    rays, gt = ds.eval_item(int(ds.i_val[0]))
    assert gt.shape[2] == 3 and rays["radii"].shape[0] == gt.shape[0] * gt.shape[1]


def test_bungee_google_layout(tmp_path):
    """BungeeDataset over the real multiscale-google layout: stage codes
    come from scale_split, holdout split, pooled rays with radii."""
    import json

    import imageio.v2 as imageio

    d = tmp_path / "google"
    os.makedirs(d / "images")
    rng = np.random.RandomState(0)
    n = 8
    for i in range(n):
        imageio.imwrite(
            str(d / "images" / f"{i:03d}.png"),
            rng.randint(0, 255, (16, 16, 3)).astype(np.uint8),
        )
    poses = []
    for i in range(n):
        p = np.concatenate([np.eye(3, 4), [[16], [16], [12.0]]], axis=1)
        poses.append(np.concatenate([p.reshape(-1), [0, 0]]))
    meta = {
        "poses": [p.tolist() for p in poses],
        "scene_scale": 1.0,
        "scene_origin": [0, 0, 0],
        "scale_split": [0, 4, 6],
    }
    with open(d / "poses_enu.json", "w") as fh:
        json.dump(meta, fh)

    from xrnerf_tpu.datasets.bungee import BungeeDataset

    ds = BungeeDataset(str(d), dataset_type="google", factor=2, N_rand=16,
                       holdout=4, iters_per_stage=10)
    assert ds.n_stages == 3
    np.testing.assert_array_equal(ds.scale_codes, [0, 0, 0, 0, 1, 1, 2, 2])
    b = ds.train_batch(0)
    assert b["rays_o"].shape == (16, 3)
    assert b["radii"].shape == (16, 1)
    assert int(b["stage"]) == 0
    b2 = ds.train_batch(25)
    assert int(b2["stage"]) == 2

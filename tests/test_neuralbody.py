"""NeuralBody tests: voxelize/trilinear math, embedder, camera rays,
dataset batching, network forward + short training."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xrnerf_tpu.datasets.load.synthetic import make_synthetic_zju
from xrnerf_tpu.datasets.neuralbody import (
    NeuralBodyDataset,
    aabb_near_far,
    rays_from_KRT,
)
from xrnerf_tpu.models.embedders.neuralbody import (
    SmplEmbedder,
    trilinear_sample,
    voxelize_codes,
)
from xrnerf_tpu.models.networks.neuralbody import NeuralBodyNetwork


@pytest.fixture(scope="module")
def zju_arrays():
    return make_synthetic_zju(n_frames=2, n_cams=4, H=24, W=24, n_verts=200)


def test_voxelize_codes_mean():
    verts = jnp.asarray([[0.05, 0.05, 0.05], [0.05, 0.05, 0.05], [0.95, 0.95, 0.95]])
    codes = jnp.asarray([[2.0], [4.0], [7.0]])
    vol = voxelize_codes(verts, codes, jnp.zeros(3), jnp.ones(3), (4, 4, 4))
    assert vol.shape == (4, 4, 4, 1)
    assert float(vol[0, 0, 0, 0]) == pytest.approx(3.0)  # mean of duplicates
    assert float(vol[3, 3, 3, 0]) == pytest.approx(7.0)
    assert float(jnp.abs(vol).sum()) == pytest.approx(10.0)


def test_trilinear_sample_exact_and_interp():
    vol = jnp.arange(8.0).reshape(2, 2, 2, 1)
    # corners reproduce exactly
    out = trilinear_sample(vol, jnp.asarray([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]]))
    np.testing.assert_allclose(np.asarray(out[:, 0]), [0.0, 7.0], atol=1e-6)
    # center = mean of all corners
    mid = trilinear_sample(vol, jnp.asarray([[0.5, 0.5, 0.5]]))
    assert float(mid[0, 0]) == pytest.approx(3.5)


def test_camera_rays_geometry(zju_arrays):
    K, R, T = zju_arrays["K"][0], zju_arrays["R"][0], zju_arrays["T"][0]
    o, d = rays_from_KRT(24, 24, K, R, T)
    cam_pos = -R.T @ T
    np.testing.assert_allclose(o[0], cam_pos, atol=1e-5)
    # center ray points at the scene origin
    c = d[24 * 12 + 12]
    c = c / np.linalg.norm(c)
    to_origin = -cam_pos / np.linalg.norm(cam_pos)
    assert float(c @ to_origin) > 0.98


def test_aabb_near_far():
    o = np.array([[0.0, 0.0, -5.0], [10.0, 10.0, 10.0]], np.float32)
    d = np.array([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]], np.float32)
    near, far = aabb_near_far(o, d, np.full(3, -1.0), np.ones(3), pad=0.0)
    assert near[0, 0] == pytest.approx(4.0)
    assert far[0, 0] == pytest.approx(6.0)
    assert near[1, 0] == far[1, 0]  # miss


def test_nb_dataset(zju_arrays):
    ds = NeuralBodyDataset(arrays=zju_arrays, N_rand=64, training_view=(0, 1, 2))
    b = ds.train_batch(0)
    assert b["rays_o"].shape == (64, 3)
    assert b["ctx_verts"].shape == (200, 3)
    assert b["ctx_bmin"].shape == (3,)
    assert b["target"].shape == (64, 3)
    assert b["mask"].shape == (64, 1)
    # body fraction: at least the body half hits the mask
    assert b["mask"][:32].mean() > 0.9
    rays, gt = ds.eval_item(0)
    assert gt.shape == (24, 24, 3)
    assert rays["rays_o"].shape == (24 * 24, 3)
    # test view is held out from training views
    assert ds.test_pairs[0][1] == 3


def test_smpl_embedder_shapes():
    emb = SmplEmbedder(n_verts=50, code_dim=4, grid_dims=(8, 8, 8), widths=(8, 8))
    ids = jnp.arange(50)
    verts = jnp.asarray(np.random.RandomState(0).uniform(0.2, 0.8, (50, 3)), jnp.float32)
    pts = jnp.asarray(np.random.RandomState(1).uniform(0, 1, (17, 3)), jnp.float32)
    params = emb.init(jax.random.PRNGKey(0), ids, verts, pts, jnp.zeros(3), jnp.ones(3))[
        "params"
    ]
    out = emb.apply({"params": params}, ids, verts, pts, jnp.zeros(3), jnp.ones(3))
    assert out.shape == (17, 16)
    assert np.all(np.isfinite(np.asarray(out)))


def _nb_net():
    return NeuralBodyNetwork(
        n_verts=200, code_dim=4, grid_dims=(16, 16, 16), conv_widths=(8, 8),
        num_frames=4, appearance_dim=8, hidden=32, n_samples=8,
    )


def test_nb_network_forward_and_grads(zju_arrays):
    ds = NeuralBodyDataset(arrays=zju_arrays, N_rand=32, training_view=(0, 1, 2))
    net = _nb_net()
    batch = {k: jnp.asarray(v) for k, v in ds.train_batch(0).items()}
    params = net.init(jax.random.PRNGKey(0), batch, rng=None, train=False)["params"]
    out = net.apply({"params": params}, batch, rng=None, train=False)
    assert out["rgb"].shape == (32, 3)
    loss, log = net.loss(out, batch)
    assert np.isfinite(float(loss)) and "acc_err" in log

    def lf(p):
        o = net.apply({"params": p}, batch, rng=jax.random.PRNGKey(1), train=True)
        return net.loss(o, batch)[0]

    g = jax.grad(lf)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in leaves)
    # vertex codes receive gradient through voxelize->conv->trilinear
    assert float(jnp.abs(g["embedder"]["vertex_codes"]["embedding"]).max()) > 0


def test_nb_trainer_short(zju_arrays, tmp_path):
    from xrnerf_tpu.core.trainer import Trainer

    ds = NeuralBodyDataset(arrays=zju_arrays, N_rand=32, training_view=(0, 1, 2))
    net = _nb_net()
    tr = Trainer(
        net, ds, optimizer={"lr": 5e-3}, work_dir=str(tmp_path), max_iters=10,
        ckpt_interval=0, log_interval=5, eval_chunk=192,
    )
    tr.run()
    losses = tr.last_logs
    assert np.isfinite(losses["loss"])
    # eval render produces a full image
    rays, gt = ds.eval_item(0)
    ret = tr.render_image(rays, 24, 24)
    assert ret["rgb"].shape == (24, 24, 3)

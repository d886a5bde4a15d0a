"""AniNeRF tests: LBS math (rodrigues/FK/skinning round-trip), blend-weight
MLP normalization, dataset wiring, both training phases."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xrnerf_tpu.datasets.aninerf import AniNeRFDataset
from xrnerf_tpu.datasets.load.synthetic import make_synthetic_zju
from xrnerf_tpu.models.networks.aninerf import AniNeRFNetwork, BlendWeightMLP
from xrnerf_tpu.models.networks.utils.lbs import (
    batch_rodrigues,
    closest_vertex,
    get_rigid_transformation,
    pose_to_tpose,
    sample_blend_weights,
    tpose_to_pose,
)


def test_batch_rodrigues():
    # 90 deg about z
    R = np.asarray(batch_rodrigues(jnp.asarray([[0.0, 0.0, np.pi / 2]])))[0]
    np.testing.assert_allclose(R @ np.array([1.0, 0, 0]), [0, 1, 0], atol=1e-5)
    # zero rotation = identity
    R0 = np.asarray(batch_rodrigues(jnp.zeros((1, 3))))[0]
    np.testing.assert_allclose(R0, np.eye(3), atol=1e-6)


def test_rigid_transformation_rest_pose_identity():
    joints = jnp.asarray([[0.0, 0, 0], [0.5, 0, 0], [1.0, 0, 0]])
    parents = np.asarray([0, 0, 1])
    A = np.asarray(get_rigid_transformation(jnp.zeros((3, 3)), joints, parents))
    for k in range(3):
        np.testing.assert_allclose(A[k], np.eye(4), atol=1e-6)


def test_rigid_transformation_rotation_moves_child():
    joints = jnp.asarray([[0.0, 0, 0], [1.0, 0, 0]])
    parents = np.asarray([0, 0])
    poses = jnp.asarray([[0.0, 0.0, np.pi / 2], [0.0, 0.0, 0.0]])
    A = np.asarray(get_rigid_transformation(poses, joints, parents))
    # a point at the child joint, skinned rigidly to the root, rotates
    p = np.array([1.0, 0, 0, 1.0])
    p2 = A[0] @ p
    np.testing.assert_allclose(p2[:3], [0, 1, 0], atol=1e-5)


def test_lbs_roundtrip():
    rng = np.random.RandomState(0)
    joints = jnp.asarray(rng.randn(4, 3).astype(np.float32) * 0.2)
    parents = np.asarray([0, 0, 1, 2])
    poses = jnp.asarray(0.3 * rng.randn(4, 3).astype(np.float32))
    A = get_rigid_transformation(poses, joints, parents)
    pts = jnp.asarray(rng.randn(50, 3).astype(np.float32))
    bw = jax.nn.softmax(jnp.asarray(rng.randn(50, 4).astype(np.float32)), -1)
    posed = tpose_to_pose(pts, bw, A)
    back = pose_to_tpose(posed, bw, A)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-4)


def test_closest_vertex_and_bw():
    verts = jnp.asarray([[0.0, 0, 0], [1.0, 0, 0]])
    vert_bw = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
    pts = jnp.asarray([[0.1, 0, 0], [0.9, 0, 0]])
    idx, d2 = closest_vertex(pts, verts)
    np.testing.assert_array_equal(np.asarray(idx), [0, 1])
    bw, dist = sample_blend_weights(pts, verts, vert_bw)
    np.testing.assert_allclose(np.asarray(bw), vert_bw, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dist), [0.1, 0.1], atol=1e-5)


def test_blend_weight_mlp_normalized():
    mlp = BlendWeightMLP(n_joints=4, num_frames=2, latent_dim=8, hidden=16, depth=2)
    pts = jnp.asarray(np.random.RandomState(0).randn(10, 3).astype(np.float32))
    smpl_bw = jax.nn.softmax(
        jnp.asarray(np.random.RandomState(1).randn(10, 4).astype(np.float32)), -1
    )
    params = mlp.init(jax.random.PRNGKey(0), pts, smpl_bw, jnp.asarray(0))["params"]
    bw = mlp.apply({"params": params}, pts, smpl_bw, jnp.asarray(0))
    np.testing.assert_allclose(np.asarray(bw.sum(-1)), 1.0, atol=1e-5)
    assert np.all(np.asarray(bw) >= 0)


@pytest.fixture(scope="module")
def ani_arrays():
    arr = make_synthetic_zju(n_frames=2, n_cams=3, H=20, W=20, n_verts=100)
    rng = np.random.RandomState(3)
    n_j = 2
    arr["joints"] = np.asarray([[0.0, 0, 0], [0.2, 0, 0]], np.float32)
    arr["parents"] = np.asarray([0, 0])
    w = rng.rand(100, n_j).astype(np.float32)
    arr["weights"] = w / w.sum(-1, keepdims=True)
    arr["poses"] = np.zeros((2, n_j, 3), np.float32)
    return arr


def test_aninerf_dataset(ani_arrays):
    ds = AniNeRFDataset(arrays=ani_arrays, N_rand=32, training_view=(0, 1))
    b = ds.train_batch(0)
    assert b["ctx_A"].shape == (2, 4, 4)
    assert b["ctx_bw_verts"].shape == (100, 2)
    np.testing.assert_allclose(b["ctx_A"][0], np.eye(4), atol=1e-5)  # rest pose


def _ani_net(phase="train_pose"):
    return AniNeRFNetwork(
        n_joints=2, num_frames=4, n_samples=8, hidden=32, phase=phase,
        smpl_dist_threshold=0.2,
    )


def test_aninerf_forward_and_phases(ani_arrays):
    ds = AniNeRFDataset(arrays=ani_arrays, N_rand=16, training_view=(0, 1))
    batch = {k: jnp.asarray(v) for k, v in ds.train_batch(0).items()}
    net = _ani_net()
    params = net.init(jax.random.PRNGKey(0), batch, rng=None, train=False)["params"]
    out = net.apply({"params": params}, batch, rng=None, train=False)
    assert out["rgb"].shape == (16, 3)
    out_t = net.apply({"params": params}, batch, rng=jax.random.PRNGKey(1), train=True)
    assert "bw_consistency" in out_t
    loss, log = net.loss(out_t, batch)
    assert np.isfinite(float(loss)) and "bw_consistency" in log

    # novel_pose phase: only novel_pose_bw_mlp should be trainable
    net2 = _ani_net(phase="novel_pose")
    filt = net2.trainable_filter()
    assert filt("novel_pose_bw_mlp/fc0/kernel")
    assert not filt("tpose_human/density_fc0/kernel")


def test_aninerf_trainer_novel_pose_freeze(ani_arrays, tmp_path):
    from xrnerf_tpu.core.trainer import Trainer

    ds = AniNeRFDataset(arrays=ani_arrays, N_rand=16, training_view=(0, 1))
    net = _ani_net(phase="novel_pose")
    tr = Trainer(
        net, ds, optimizer={"lr": 1e-2}, work_dir=str(tmp_path), max_iters=3,
        ckpt_interval=0, log_interval=10,
    )
    before = np.asarray(
        jax.tree_util.tree_leaves(tr.state.params["tpose_human"])[0]
    ).copy()
    before_bw = np.asarray(
        jax.tree_util.tree_leaves(tr.state.params["novel_pose_bw_mlp"])[0]
    ).copy()
    tr.run()
    after = np.asarray(jax.tree_util.tree_leaves(tr.state.params["tpose_human"])[0])
    after_bw = np.asarray(
        jax.tree_util.tree_leaves(tr.state.params["novel_pose_bw_mlp"])[0]
    )
    np.testing.assert_array_equal(before, after)  # frozen
    assert not np.array_equal(before_bw, after_bw)  # trained

"""Dataset + loader tests over the generated blender-format fixture."""

import numpy as np

from xrnerf_tpu.datasets.load.blender import load_blender_data
from xrnerf_tpu.datasets.rays import get_rays_np, intrinsics_from_hwf, ndc_rays
from xrnerf_tpu.datasets.scene import SceneDataset
from xrnerf_tpu.registry import build_dataset


def test_load_blender(synthetic_scene):
    imgs, poses, render_poses, hwf, i_split = load_blender_data(synthetic_scene)
    assert imgs.shape == (8, 24, 24, 4)
    assert poses.shape == (8, 4, 4)
    assert render_poses.shape == (40, 4, 4)
    assert len(i_split[0]) == 4 and len(i_split[1]) == 2 and len(i_split[2]) == 2
    assert imgs.dtype == np.float32 and imgs.max() <= 1.0
    # camera-to-world: rotation orthonormal
    R = poses[0, :3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)


def test_get_rays_geometry():
    H = W = 10
    K = intrinsics_from_hwf(H, W, 12.0)
    c2w = np.eye(4, dtype=np.float32)[:3]
    o, d = get_rays_np(H, W, K, c2w)
    assert o.shape == (H, W, 3) and d.shape == (H, W, 3)
    # center pixel looks along -z
    cd = d[H // 2, W // 2]
    assert cd[2] == -1.0
    # origin constant
    assert np.all(o == 0)


def test_ndc_rays_range():
    H = W = 8
    K = intrinsics_from_hwf(H, W, 10.0)
    c2w = np.eye(4, dtype=np.float32)[:3]
    o, d = get_rays_np(H, W, K, c2w)
    o = o.reshape(-1, 3) + np.array([0, 0, 5.0], np.float32)
    d = d.reshape(-1, 3)
    no, nd = ndc_rays(H, W, 10.0, 1.0, o, d)
    # at the near plane z' = -1... NDC o2 = 1 + 2*near/oz
    assert np.all(np.isfinite(no)) and np.all(np.isfinite(nd))


def test_scene_dataset_batches(synthetic_scene):
    ds = build_dataset(
        dict(
            type="SceneDataset",
            datadir=synthetic_scene,
            N_rand=64,
            testskip=1,
            white_bkgd=True,
        )
    )
    b = ds.train_batch(0)
    assert b["rays_o"].shape == (64, 3)
    assert b["rays_d"].shape == (64, 3)
    assert b["target"].shape == (64, 3)
    assert b["near"].shape == (64, 1)
    # deterministic per step
    b2 = ds.train_batch(0)
    np.testing.assert_array_equal(b["rays_o"], b2["rays_o"])
    b3 = ds.train_batch(1)
    assert not np.array_equal(b["rays_o"], b3["rays_o"])
    # hosts draw different rays
    bh = ds.train_batch(0, host_id=1, num_hosts=2)
    assert not np.array_equal(b["rays_o"], bh["rays_o"])

    rays = ds.image_rays(int(ds.i_val[0]))
    assert rays["rays_o"].shape == (24 * 24, 3)
    assert rays["target"].shape == (24 * 24, 3)


def test_scene_dataset_pooled(synthetic_scene):
    ds = SceneDataset(datadir=synthetic_scene, N_rand=32, batching=True, testskip=1)
    b = ds.train_batch(0)
    assert b["rays_o"].shape == (32, 3)
    assert b["target"].shape == (32, 3)
    # wraps without error far into training
    b_far = ds.train_batch(10_000)
    assert b_far["rays_o"].shape == (32, 3)


def test_precrop(synthetic_scene):
    ds = SceneDataset(
        datadir=synthetic_scene, N_rand=16, precrop_iters=10, precrop_frac=0.5, testskip=1
    )
    # during precrop all selected pixels lie in the center half
    b = ds.train_batch(0)
    assert b["rays_o"].shape == (16, 3)

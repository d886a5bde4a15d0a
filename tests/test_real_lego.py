"""Integration against the reference's miniature REAL lego fixture
(2 train / 2 val 800x800 renders + transforms). Skipped when the
reference checkout is absent."""

import os

import numpy as np
import pytest

LEGO = "/root/reference/test/datasets/data/nerf_synthetic/lego"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(LEGO), reason="reference lego fixture not mounted"
)


def test_load_real_lego_half_res():
    from xrnerf_tpu.datasets.load.blender import load_blender_data

    imgs, poses, render_poses, hwf, i_split = load_blender_data(
        LEGO, half_res=True, testskip=1
    )
    assert imgs.shape[1:] == (400, 400, 4)
    assert hwf[0] == 400 and hwf[1] == 400
    # blender camera_angle_x 0.6911 -> focal ~ 0.5*W/tan(0.5*a)
    assert 540 < hwf[2] < 580
    # poses are valid c2w: orthonormal rotations, cameras ~4 units out
    R = poses[0, :3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    assert 3.0 < np.linalg.norm(poses[0, :3, 3]) < 5.5


def test_scene_dataset_real_lego_batch():
    from xrnerf_tpu.datasets.scene import SceneDataset

    ds = SceneDataset(
        LEGO, dataset_type="blender", half_res=True, testskip=1,
        white_bkgd=True, N_rand=256,
    )
    b = ds.train_batch(0)
    assert b["rays_o"].shape == (256, 3)
    assert float(b["target"].max()) <= 1.0
    # white background composited: background pixels are exactly 1
    rays, gt = ds.eval_item(0)
    assert gt.shape == (400, 400, 3)
    corner = gt[:10, :10]
    np.testing.assert_allclose(corner, 1.0, atol=1e-3)

"""Loader tests for the nsvf / deepvoxels / LINEMOD / google layouts,
against tiny generated on-disk fixtures."""

import json
import os

import numpy as np
import pytest


def _write_png(path, arr):
    import imageio.v2 as imageio

    imageio.imwrite(path, arr.astype(np.uint8))


# ---------------------------------------------------------------------------
# NSVF layout
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def nsvf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("nsvf")
    os.makedirs(d / "rgb")
    os.makedirs(d / "pose")
    rng = np.random.RandomState(0)
    for split, count in ((0, 3), (1, 2), (2, 2)):
        for i in range(count):
            name = f"{split}_{i:04d}"
            _write_png(d / "rgb" / f"{name}.png", rng.randint(0, 255, (16, 16, 3)))
            # c2w with identity rotation, camera at z=+4 looking at origin
            # (NSVF convention: +z forward, so the loader flips cols 1:3)
            pose = np.eye(4)
            pose[2, 3] = 4.0
            np.savetxt(d / "pose" / f"{name}.txt", pose)
    with open(d / "intrinsics.txt", "w") as fh:
        fh.write("20.0 8.0 8.0 0\n0 0 0\n0 0 0\n")
    np.savetxt(d / "bbox.txt", np.array([[-1, -1, -1, 1, 1, 1, 0.1]]))
    return str(d)


def test_load_nsvf(nsvf_dir):
    from xrnerf_tpu.datasets.load.nsvf import load_nsvf_data

    imgs, poses, K, near, far, (bmin, bmax), bg, rposes, i_split = load_nsvf_data(
        nsvf_dir, testskip=1
    )
    assert imgs.shape == (7, 16, 16, 3)
    assert poses.shape == (7, 4, 4)
    assert K[0, 0] == 20.0 and K[0, 2] == 8.0
    np.testing.assert_array_equal(bmin, [-1, -1, -1])
    # camera at (0,0,4), box [-1,1]^3: closest dist 3, furthest sqrt(1+1+25)
    assert near == pytest.approx(3.0)
    assert far == pytest.approx(np.sqrt(27.0))
    # y/z columns flipped into OpenGL convention
    np.testing.assert_allclose(poses[0, :3, :3], np.diag([1.0, -1.0, -1.0]))
    assert [len(s) for s in i_split] == [3, 2, 2]


def test_nsvf_scene_dataset(nsvf_dir):
    from xrnerf_tpu.datasets.scene import SceneDataset

    ds = SceneDataset(nsvf_dir, dataset_type="nsvf", N_rand=16, testskip=1)
    assert ds.bbox is not None
    b = ds.train_batch(0)
    assert b["rays_o"].shape == (16, 3)
    assert float(b["near"][0, 0]) == pytest.approx(3.0)


def test_nsvf_kilonerf_dataset_bbox(nsvf_dir):
    from xrnerf_tpu.datasets.kilonerf import KiloNerfDataset

    ds = KiloNerfDataset(nsvf_dir, dataset_type="nsvf", N_rand=16, testskip=1)
    np.testing.assert_array_equal(ds.global_domain_min, [-1, -1, -1])
    np.testing.assert_array_equal(ds.global_domain_max, [1, 1, 1])


# ---------------------------------------------------------------------------
# DeepVoxels layout
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def dv_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("dv")
    rng = np.random.RandomState(1)
    for split, count in (("train", 3), ("validation", 2), ("test", 2)):
        base = d / split / "cube"
        os.makedirs(base / "rgb")
        os.makedirs(base / "pose")
        for i in range(count):
            _write_png(base / "rgb" / f"{i:04d}.png", rng.randint(0, 255, (8, 8, 3)))
            pose = np.eye(4)
            pose[2, 3] = 3.0
            with open(base / "pose" / f"{i:04d}.txt", "w") as fh:
                fh.write(" ".join(str(v) for v in pose.reshape(-1)))
        with open(base / "intrinsics.txt", "w") as fh:
            fh.write("10.0 4.0 4.0\n0 0 0\n1.0\n1.0\n8 8\n0\n")
    return str(d)


def test_load_deepvoxels(dv_dir):
    from xrnerf_tpu.datasets.load.deepvoxels import load_deepvoxels_data

    imgs, poses, rposes, hwf, (cx, cy), i_split = load_deepvoxels_data(
        dv_dir, scene="cube", testskip=1, side=8
    )
    assert imgs.shape == (7, 8, 8, 3)
    assert poses.shape == (7, 3, 4)
    assert hwf[0] == 8 and hwf[2] == pytest.approx(10.0)
    assert [len(s) for s in i_split] == [3, 2, 2]
    # y/z flip applied: diag(1,-1,-1) rotation
    np.testing.assert_allclose(poses[0, :3, :3], np.diag([1.0, -1.0, -1.0]))


def test_deepvoxels_scene_dataset(dv_dir):
    from xrnerf_tpu.datasets.scene import SceneDataset

    ds = SceneDataset(
        dv_dir + "", dataset_type="deepvoxels", N_rand=8, testskip=1, near=0, far=0
    )
    # hemi_R = 3 -> near/far = 2/4
    assert ds.near == pytest.approx(2.0)
    assert ds.far == pytest.approx(4.0)
    b = ds.train_batch(0)
    assert b["rays_o"].shape == (8, 3)


# ---------------------------------------------------------------------------
# LINEMOD layout
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def linemod_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("lm")
    rng = np.random.RandomState(2)
    K = [[15.0, 0, 8.0], [0, 15.0, 8.0], [0, 0, 1.0]]
    for s, count in (("train", 3), ("val", 2), ("test", 2)):
        frames = []
        for i in range(count):
            rel = f"{s}_{i}.png"
            _write_png(d / rel, rng.randint(0, 255, (16, 16, 3)))
            pose = np.eye(4)
            pose[2, 3] = 4.0
            frames.append(
                {
                    "file_path": os.path.join(str(d), rel),
                    "transform_matrix": pose.tolist(),
                    "intrinsic_matrix": K,
                }
            )
        meta = {"frames": frames, "near": 2.3, "far": 5.8}
        with open(d / f"transforms_{s}.json", "w") as fh:
            json.dump(meta, fh)
    return str(d)


def test_load_linemod(linemod_dir):
    from xrnerf_tpu.datasets.load.linemod import load_linemod_data

    imgs, poses, rposes, hwf, K, i_split, near, far = load_linemod_data(
        linemod_dir, testskip=1
    )
    assert imgs.shape == (7, 16, 16, 3)
    assert hwf[2] == pytest.approx(15.0)
    assert near == 2.0 and far == 6.0  # floor/ceil of 2.3/5.8
    assert rposes.shape[0] == 40


def test_linemod_scene_dataset(linemod_dir):
    from xrnerf_tpu.datasets.scene import SceneDataset

    ds = SceneDataset(linemod_dir, dataset_type="LINEMOD", N_rand=8, testskip=1)
    b = ds.train_batch(0)
    assert b["rays_o"].shape == (8, 3)
    assert float(b["near"][0, 0]) == 2.0


# ---------------------------------------------------------------------------
# Multiscale google layout
# ---------------------------------------------------------------------------
def test_load_google(tmp_path):
    from xrnerf_tpu.datasets.load.google import load_google_data

    d = tmp_path / "google"
    os.makedirs(d / "images")
    rng = np.random.RandomState(3)
    n = 4
    for i in range(n):
        _write_png(d / "images" / f"{i:03d}.png", rng.randint(0, 255, (12, 12, 3)))
    poses = []
    for i in range(n):
        p = np.concatenate([np.eye(3, 4), [[12], [12], [10.0]]], axis=1)  # [3,5]
        poses.append(np.concatenate([p.reshape(-1), [0, 0]]))
    meta = {
        "poses": [p.tolist() for p in poses],
        "scene_scale": 2.0,
        "scene_origin": [0.0, 0.0, 0.0],
        "scale_split": [0, 2],
    }
    with open(d / "poses_enu.json", "w") as fh:
        json.dump(meta, fh)

    imgs, poses, scale, origin, split = load_google_data(str(d), factor=2)
    assert imgs.shape == (4, 6, 6, 3)
    assert poses.shape == (4, 3, 5)
    assert poses[0, 0, 4] == 6 and poses[0, 2, 4] == pytest.approx(5.0)
    assert scale == 2.0 and split == [0, 2]

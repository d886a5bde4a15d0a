"""CLI entry (run_nerf.py) smoke tests over a generated config."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import run_nerf  # noqa: E402


def _write_cfg(tmp_path, scene_dir):
    cfg = tmp_path / "cfg.py"
    cfg.write_text(
        f"""
max_iters = 6
eval_interval = 0
ckpt_interval = 6
log_interval = 3
eval_chunk = 256
work_dir = r"{tmp_path}/wd_#DATANAME#"
model = dict(type="NerfNetwork", n_samples=8, n_importance=0, netdepth=2,
             netwidth=16, multires=4, multires_dirs=2)
data = dict(type="SceneDataset", datadir=r"{scene_dir}", N_rand=32, testskip=1)
optimizer = dict(type="adam", lr=1e-3)
hooks = []
"""
    )
    return str(cfg)


def test_cli_train_and_dataname(synthetic_scene, tmp_path):
    cfg = _write_cfg(tmp_path, synthetic_scene)
    tr = run_nerf.main(["--config", cfg, "--dataname", "sphere"])
    assert int(tr.state.step) == 6
    assert tr.work_dir.endswith("wd_sphere")
    assert os.path.exists(os.path.join(tr.work_dir, "ckpt_6.msgpack"))


def test_cli_test_only(synthetic_scene, tmp_path):
    cfg = _write_cfg(tmp_path, synthetic_scene)
    ck = os.path.join(str(tmp_path), "wd_sphere", "ckpt_6.msgpack")
    if not os.path.exists(ck):
        run_nerf.main(["--config", cfg, "--dataname", "sphere"])
    tr = run_nerf.main(
        ["--config", cfg, "--dataname", "sphere", "--test_only", "--load_from", ck]
    )
    assert os.path.exists(os.path.join(tr.work_dir, "test", "test_results.json"))


def test_cli_missing_config():
    with pytest.raises(FileNotFoundError):
        run_nerf.main(["--config", "/nope.py"])

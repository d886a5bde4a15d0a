"""End-to-end Trainer tests: tiny NeRF trains on the synthetic scene,
checkpoints round-trip, eval hooks run, mesh-sharded training works on the
8-device virtual CPU mesh."""

import glob
import os

import jax
import numpy as np
import pytest

from xrnerf_tpu.core.hooks import ElapsedTimeHook, OccupationHook, TestHook, ValidateHook
from xrnerf_tpu.core.trainer import Trainer, build_lr_schedule, build_optimizer
from xrnerf_tpu.datasets.scene import SceneDataset
from xrnerf_tpu.models.networks.nerf import NerfNetwork


def _tiny_setup(synthetic_scene, tmp_path, **net_kw):
    ds = SceneDataset(datadir=synthetic_scene, N_rand=64, testskip=1, white_bkgd=True)
    defaults = dict(
        n_samples=8, n_importance=0, netdepth=2, netwidth=32, multires=4, multires_dirs=2
    )
    defaults.update(net_kw)
    net = NerfNetwork(**defaults)
    return ds, net


def test_lr_schedules():
    s = build_lr_schedule({"lr": 1e-3, "lr_decay_steps": 100, "lr_decay_rate": 0.1})
    assert float(s(0)) == pytest.approx(1e-3)
    assert float(s(100)) == pytest.approx(1e-4, rel=1e-5)
    m = build_lr_schedule(
        {"lr": 1e-3, "lr_final": 1e-5, "max_steps": 100, "lr_warmup_steps": 10}
    )
    assert float(m(0)) < 1e-4  # delayed warmup
    assert float(m(100)) == pytest.approx(1e-5, rel=1e-3)


def test_build_optimizer_variants():
    for t in ["adam", "adamw", "sgd"]:
        tx = build_optimizer({"type": t, "lr": 1e-3, "grad_clip": 1.0})
        assert tx is not None
    with pytest.raises(ValueError):
        build_optimizer({"type": "nope"})


def test_trainer_runs_and_checkpoints(synthetic_scene, tmp_path):
    ds, net = _tiny_setup(synthetic_scene, tmp_path)
    tr = Trainer(
        net,
        ds,
        optimizer={"lr": 5e-3},
        work_dir=str(tmp_path),
        max_iters=12,
        ckpt_interval=10,
        log_interval=5,
        eval_interval=0,
    )
    state = tr.run()
    assert int(state.step) == 12
    assert tr.last_logs["loss"] > 0
    ckpts = glob.glob(os.path.join(str(tmp_path), "ckpt_*.msgpack"))
    assert ckpts, "no checkpoints written"

    # resume continues from saved step
    tr2 = Trainer(
        net,
        ds,
        optimizer={"lr": 5e-3},
        work_dir=str(tmp_path),
        max_iters=14,
        ckpt_interval=0,
        log_interval=5,
        resume_from=sorted(ckpts)[-1],
    )
    assert tr2.start_step == 12
    state2 = tr2.run()
    assert int(state2.step) == 14


def test_trainer_eval_hooks(synthetic_scene, tmp_path):
    ds, net = _tiny_setup(synthetic_scene, tmp_path)
    tr = Trainer(
        net,
        ds,
        optimizer={"lr": 5e-3},
        work_dir=str(tmp_path),
        max_iters=4,
        eval_interval=4,
        ckpt_interval=0,
        log_interval=2,
        eval_chunk=256,
        hooks=[ValidateHook(save_img=True, max_images=1), TestHook(save_img=False)],
    )
    tr.run()
    assert "psnr" in tr.eval_metrics
    assert os.path.exists(os.path.join(str(tmp_path), "test", "test_results.json"))
    # a side-by-side val png got written
    assert glob.glob(os.path.join(str(tmp_path), "val_4", "*.png"))


def test_trainer_kill_switch(synthetic_scene, tmp_path):
    ds, net = _tiny_setup(synthetic_scene, tmp_path)
    hook = OccupationHook()
    tr = Trainer(
        net, ds, optimizer={"lr": 1e-3}, work_dir=str(tmp_path),
        max_iters=1000, ckpt_interval=0, log_interval=1000, hooks=[hook],
    )

    class StopAt:
        def on_run_begin(self, t): ...
        def on_eval(self, t, s): ...
        def on_run_end(self, t): ...
        def after_step(self, t, step, logs):
            if step == 3:
                import shutil

                shutil.rmtree(os.path.join(t.work_dir, "delete_me_to_stop"))

    tr.hooks.append(StopAt())
    state = tr.run()
    assert int(state.step) <= 5


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multi-device")
def test_trainer_mesh_sharded(synthetic_scene, tmp_path):
    from xrnerf_tpu.parallel.mesh import make_mesh

    ds, net = _tiny_setup(synthetic_scene, tmp_path)
    mesh = make_mesh(n_model=1)
    tr = Trainer(
        net, ds, optimizer={"lr": 5e-3}, work_dir=str(tmp_path),
        max_iters=6, ckpt_interval=0, log_interval=3, mesh=mesh,
    )
    state = tr.run()
    assert int(state.step) == 6
    assert np.isfinite(tr.last_logs["loss"])


def test_ema_params(synthetic_scene, tmp_path):
    ds, net = _tiny_setup(synthetic_scene, tmp_path)
    tr = Trainer(
        net, ds, optimizer={"lr": 5e-2}, work_dir=str(tmp_path),
        max_iters=3, ckpt_interval=0, log_interval=10, ema_decay=0.9,
    )
    tr.run()
    # ema lags the raw params
    w_ema = jax.tree_util.tree_leaves(tr.ema_params)[0]
    w_raw = jax.tree_util.tree_leaves(tr.state.params)[0]
    assert not np.allclose(np.asarray(w_ema), np.asarray(w_raw))


def test_profile_hook(tmp_path, synthetic_scene):
    from xrnerf_tpu.core.hooks import ProfileHook
    from xrnerf_tpu.core.trainer import Trainer
    from xrnerf_tpu.registry import build_dataset, build_network

    ds = build_dataset(
        dict(type="SceneDataset", datadir=synthetic_scene, N_rand=32, testskip=1)
    )
    net = build_network(
        dict(type="NerfNetwork", n_samples=4, n_importance=0, netdepth=2,
             netwidth=16, multires=2, multires_dirs=2)
    )
    tr = Trainer(
        net, ds, optimizer={"lr": 1e-3}, work_dir=str(tmp_path), max_iters=5,
        ckpt_interval=0, log_interval=100,
        hooks=[ProfileHook(start_step=2, num_steps=2)],
    )
    tr.run()
    import os

    prof = os.path.join(str(tmp_path), "profile")
    assert os.path.isdir(prof) and len(os.listdir(prof)) > 0

"""CLI entry point: train/test/render any registered method from a config.

API parity with the reference's ``run_nerf.py`` + ``core/apis``
(``/root/reference/run_nerf.py:1-6``, ``xrnerf/core/apis/helper.py:20-38``):

    python run_nerf.py --config configs/nerf/nerf_blender.py --dataname lego
    python run_nerf.py --config ... --dataname lego --test_only --load_from ckpt
"""

from __future__ import annotations

import argparse
import os


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="xrnerf_tpu train/test entry")
    p.add_argument("--config", required=True, help="python config file")
    p.add_argument("--dataname", default="lego", help="scene name substituted for #DATANAME#")
    p.add_argument("--test_only", action="store_true", help="run test instead of train")
    p.add_argument("--render_only", action="store_true", help="render the spiral path only")
    p.add_argument("--load_from", default=None, help="weights-only checkpoint to load")
    p.add_argument("--resume_from", default=None, help="full checkpoint to resume")
    p.add_argument("--work_dir", default=None, help="override cfg.work_dir")
    p.add_argument("--max_iters", type=int, default=None, help="override cfg.max_iters")
    p.add_argument("--n_model_shards", type=int, default=1, help="model-axis size of the device mesh")
    return p.parse_args(argv)


def build_from_config(cfg, args):
    from xrnerf_tpu import build_dataset, build_network
    from xrnerf_tpu.core.trainer import Trainer, build_hooks
    from xrnerf_tpu.parallel.mesh import make_mesh

    dataset = build_dataset(cfg["data"])
    network = build_network(cfg["model"])

    import jax

    mesh = make_mesh(n_model=args.n_model_shards) if len(jax.devices()) > 1 else None

    work_dir = args.work_dir or cfg.get("work_dir", "./work_dir")
    trainer = Trainer(
        network,
        dataset,
        optimizer=cfg.get("optimizer", {}),
        work_dir=work_dir,
        max_iters=args.max_iters or cfg.get("max_iters", 200000),
        eval_interval=cfg.get("eval_interval", 0),
        ckpt_interval=cfg.get("ckpt_interval", 10000),
        log_interval=cfg.get("log_interval", 100),
        hooks=build_hooks(cfg.get("hooks")),
        mesh=mesh,
        seed=cfg.get("seed", 0),
        eval_chunk=cfg.get("eval_chunk", 8192),
        resume_from=args.resume_from or cfg.get("resume_from"),
        load_from=args.load_from or cfg.get("load_from"),
        ema_decay=cfg.get("ema_decay", 0.0),
    )
    return trainer


def main(argv=None):
    args = parse_args(argv)
    from xrnerf_tpu import load_config
    from xrnerf_tpu.core.hooks import SaveSpiralHook, TestHook
    from xrnerf_tpu.parallel.mesh import init_distributed

    init_distributed()
    cfg = load_config(args.config, dataname=args.dataname)
    tr = build_from_config(cfg, args)

    if args.render_only:
        SaveSpiralHook().on_eval(tr, int(tr.state.step))
    elif args.test_only:
        TestHook(save_img=True, ndown=cfg.get("ndown", 1)).on_run_end(tr)
    else:
        tr.run()
    return tr


if __name__ == "__main__":
    main()

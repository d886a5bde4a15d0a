"""KiloNeRF three-phase driver: pretrain -> occupancy -> distill -> finetune.

Replaces the reference's shell pipeline (``/root/reference/train.sh:19-30``)
plus ``BuildOccupancyTreeHook``/``DistllCycleHook`` orchestration with one
host-side python script around jitted phases (SURVEY §7.3: kd-tree-style
dynamic control flow stays host-side).

Usage:
  python tools/kilonerf_pipeline.py --pretrain_cfg configs/nerf/nerf_blender.py \
      --distill_cfg configs/kilonerf/kilonerf_distill.py \
      --finetune_cfg configs/kilonerf/kilonerf_finetune.py --dataname lego
Individual phases can be skipped with --skip_{pretrain,occupancy,distill}.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--pretrain_cfg", default="configs/nerf/nerf_blender.py")
    p.add_argument("--distill_cfg", default="configs/kilonerf/kilonerf_distill.py")
    p.add_argument("--finetune_cfg", default="configs/kilonerf/kilonerf_finetune.py")
    p.add_argument("--dataname", default="lego")
    p.add_argument("--skip_pretrain", action="store_true")
    p.add_argument("--skip_occupancy", action="store_true")
    p.add_argument("--skip_distill", action="store_true")
    p.add_argument("--skip_finetune", action="store_true")
    return p.parse_args(argv)


def load_teacher(cfg_path: str, dataname: str, ckpt_path: str):
    """Rebuild the pretrained NerfNetwork and return (teacher_fn, trainer)."""
    import jax

    from xrnerf_tpu import build_network, load_config
    from xrnerf_tpu.utils import checkpoint as ckpt
    from flax import serialization

    cfg = load_config(cfg_path, dataname=dataname)
    net = build_network(cfg["model"])
    raw = ckpt.load_raw(ckpt_path)
    raw_params = raw["state"]["params"] if "state" in raw else raw["params"]
    # build a param template from a tiny init
    import jax.numpy as jnp

    dummy = {
        "rays_o": jnp.zeros((4, 3)),
        "rays_d": jnp.ones((4, 3)),
        "near": jnp.ones((4, 1)),
        "far": 2 * jnp.ones((4, 1)),
    }
    params = net.init(jax.random.PRNGKey(0), dummy, rng=None, train=False)["params"]
    params = serialization.from_state_dict(params, raw_params)

    def teacher_fn(pts, dirs):
        return net.apply({"params": params}, pts, dirs, method=net.eval_field)

    return teacher_fn, net, params


def main(argv=None):
    args = parse_args(argv)
    from xrnerf_tpu import build_dataset, build_network, load_config
    from xrnerf_tpu.core.trainer import Trainer, build_hooks
    from xrnerf_tpu.models.networks.kilonerf import build_occupancy_grid
    from xrnerf_tpu.utils import checkpoint as ckptmod

    import run_nerf

    # -- phase 1: pretrain an ordinary NeRF --------------------------------
    pre_cfg = load_config(args.pretrain_cfg, dataname=args.dataname)
    pre_work = pre_cfg.get("work_dir", "./work_dirs/nerf/" + args.dataname)
    if not args.skip_pretrain:
        run_nerf.main(["--config", args.pretrain_cfg, "--dataname", args.dataname])
    teacher_ckpt = ckptmod.latest_path(pre_work)
    assert teacher_ckpt, f"no pretrain checkpoint in {pre_work}"

    fin_cfg = load_config(args.finetune_cfg, dataname=args.dataname)
    dmin = fin_cfg["model"]["domain_min"]
    dmax = fin_cfg["model"]["domain_max"]
    occ_path = fin_cfg["model"]["occupancy_path"]

    teacher_fn, teacher_net, teacher_params = load_teacher(
        args.pretrain_cfg, args.dataname, teacher_ckpt
    )

    # -- phase 1.5: occupancy grid (BuildOccupancyTreeHook) ----------------
    if not args.skip_occupancy:
        import jax.numpy as jnp

        def density_fn(pts):
            dirs = jnp.zeros_like(pts).at[..., 2].set(1.0)
            _, sigma = teacher_fn(pts, dirs)
            return sigma

        occ = build_occupancy_grid(density_fn, dmin, dmax, res=(256, 256, 256))
        os.makedirs(os.path.dirname(occ_path), exist_ok=True)
        np.save(occ_path, occ)
        print(f"occupancy grid: {occ.mean():.3%} occupied -> {occ_path}")

    # -- phase 2: distill --------------------------------------------------
    dis_cfg = load_config(args.distill_cfg, dataname=args.dataname)
    dis_work = dis_cfg.get("work_dir", "./work_dirs/kilonerf_distill/" + args.dataname)
    os.makedirs(dis_work, exist_ok=True)
    mode = dis_cfg.get("mode", "uniform")
    grid_npz = os.path.join(dis_work, "distill_grid.npz")
    if not args.skip_distill:
        if mode == "tree":
            # reference-parity kd-tree discovery (SaveDistillResultsHook &
            # friends) -> fitted leaves assembled onto the finetune grid
            from xrnerf_tpu.core.distill import DistillDriver

            driver = DistillDriver(
                teacher_fn,
                domain_min=dmin,
                domain_max=dmax,
                work_dir=dis_work,
                **dis_cfg.get("tree", {}),
            )
            driver.run()
            grid = driver.assemble_grid(fin_cfg["model"]["resolution"])
            np.savez(grid_npz, **grid)
            print(f"assembled distilled grid -> {grid_npz}")
        else:
            data_cfg = dict(dis_cfg["data"])
            data_cfg["teacher_fn"] = teacher_fn
            dataset = build_dataset(data_cfg)
            network = build_network(dis_cfg["model"])
            tr = Trainer(
                network,
                dataset,
                optimizer=dis_cfg.get("optimizer", {}),
                work_dir=dis_work,
                max_iters=dis_cfg.get("max_iters", 50000),
                ckpt_interval=dis_cfg.get("ckpt_interval", 10000),
                log_interval=dis_cfg.get("log_interval", 100),
                hooks=build_hooks(dis_cfg.get("hooks")),
            )
            tr.run()

    # -- phase 3: finetune -------------------------------------------------
    if not args.skip_finetune:
        if mode == "tree" and os.path.exists(grid_npz):
            # build the finetune trainer directly and seed its multi-network
            # field from the distilled kd-tree grid (KiloNerfMLP.init_mlp)
            dataset = build_dataset(fin_cfg["data"])
            network = build_network(fin_cfg["model"])
            tr = Trainer(
                network,
                dataset,
                optimizer=fin_cfg.get("optimizer", {}),
                work_dir=fin_cfg.get("work_dir", "./work_dirs/kilonerf/" + args.dataname),
                max_iters=fin_cfg.get("max_iters", 150000),
                eval_interval=fin_cfg.get("eval_interval", 0),
                ckpt_interval=fin_cfg.get("ckpt_interval", 10000),
                log_interval=fin_cfg.get("log_interval", 100),
                hooks=build_hooks(fin_cfg.get("hooks")),
                eval_chunk=fin_cfg.get("eval_chunk", 8192),
            )
            grid = dict(np.load(grid_npz))
            import jax

            params = dict(tr.state.params)
            mlp = dict(params["mlp"])
            for k, v in grid.items():
                if k in mlp:
                    assert mlp[k].shape == v.shape, (k, mlp[k].shape, v.shape)
                    mlp[k] = jax.numpy.asarray(v)
            params["mlp"] = mlp
            tr.state = tr.state.replace(params=params)
            tr.run()
        else:
            distill_ckpt = ckptmod.latest_path(dis_work)
            run_nerf.main(
                [
                    "--config", args.finetune_cfg, "--dataname", args.dataname,
                ]
                + (["--load_from", distill_ckpt] if distill_ckpt else [])
            )


if __name__ == "__main__":
    main()

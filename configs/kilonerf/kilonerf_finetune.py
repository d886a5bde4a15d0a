# KiloNeRF phase-3 finetune (parity: the reference's three-phase pipeline,
# configs/kilonerf/* + train.sh:19-30). Phase 1 (pretrain) uses
# configs/nerf/nerf_blender.py; phase 2 (distill) kilonerf_distill.py; the
# occupancy grid comes from tools/kilonerf_build_occupancy.py.

max_iters = 150000
eval_interval = 25000
ckpt_interval = 25000
log_interval = 100
eval_chunk = 8192
work_dir = "./work_dirs/kilonerf/#DATANAME#"

model = dict(
    type="KiloNerfNetwork",
    resolution=(16, 16, 16),
    domain_min=(-0.7, -0.7, -0.7),
    domain_max=(0.7, 0.7, 0.7),
    hidden=32,
    n_hidden_layers=2,
    multires=10,
    multires_dirs=4,
    n_samples=384,
    # inference ESS: two-stage pooled march (flat gathers, no scan/sort;
    # fastest measured — docs/benchmark.md KiloNeRF section). Kept
    # samples match the dense march's first-K live set whenever the
    # group budget covers them; measured parity vs the dense march on
    # the real lego grid: 52.8 dB (bench kilonerf_pooled_parity_db).
    # Alternatives: march='sphere' (scan ESS, n_march_steps budget),
    # march='dense' (test every candidate).
    march="pooled",
    # round-5 sweep on the real lego frame: G=16/Kg=4 halves the
    # stage-A probe count at the same stage-B row count — 624 ms/frame
    # at 53.2 dB dense-parity vs 666 ms / 53.4 dB for 8/8
    march_group=16,
    march_groups_keep=4,
    n_march_steps=96,
    n_keep=32,
    # MoE cap (compacted_coord target_batch_size semantics): live-first
    # samples reaching the dispatch per eval chunk. 640k/1.25 measured
    # 52.2 dB dense-parity on the real lego grid at 670 ms/frame vs
    # 760 ms for 768k/2.0 at 52.8 dB (round-5 sweep, docs/benchmark.md)
    eval_budget=640 * 1024,
    capacity_factor=1.25,
    white_bkgd=True,
    view_dep_reg=1e-6,
    occupancy_path="./work_dirs/kilonerf/#DATANAME#/occupancy.npy",
)

data = dict(
    type="KiloNerfDataset",
    datadir="data/nerf_synthetic/#DATANAME#",
    dataset_type="blender",
    white_bkgd=True,
    N_rand=1024,
    batching=False,
    near=2.0,
    far=6.0,
    global_domain_min=(-0.7, -0.7, -0.7),
    global_domain_max=(0.7, 0.7, 0.7),
)

optimizer = dict(type="adam", lr=1e-3, lr_decay_steps=500000, lr_decay_rate=0.1)

hooks = [
    dict(type="ValidateHook", save_img=True, max_images=2),
    dict(type="ElapsedTimeHook", n_images=3),
]

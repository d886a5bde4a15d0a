# Vanilla NeRF on LLFF forward-facing scenes (parity: the reference's
# configs/nerf/nerf_llff_base01.py — NDC rays, pooled ray batching,
# no view-dependence changes; raw_noise_std 1.0 for real scenes).

max_iters = 200000
eval_interval = 25000
ckpt_interval = 25000
log_interval = 100
eval_chunk = 16384
work_dir = "./work_dirs/nerf_llff/#DATANAME#"

model = dict(
    type="NerfNetwork",
    n_samples=64,
    n_importance=128,
    multires=10,
    multires_dirs=4,
    netdepth=8,
    netwidth=256,
    use_viewdirs=True,
    white_bkgd=False,
    raw_noise_std=1.0,
    perturb=True,
)

data = dict(
    type="SceneDataset",
    datadir="data/nerf_llff_data/#DATANAME#",
    dataset_type="llff",
    white_bkgd=False,
    N_rand=1024,
    batching=True,
    use_ndc=True,
)

optimizer = dict(type="adam", lr=5e-4, lr_decay_steps=250000, lr_decay_rate=0.1)

hooks = [
    dict(type="ValidateHook", save_img=True, max_images=2),
    dict(type="OccupationHook"),
]

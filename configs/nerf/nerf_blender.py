# Vanilla NeRF on nerf_synthetic (parity target: the reference's
# configs/nerf/nerf_blender_base01.py — 64+128 hierarchical samples,
# 8x256 MLP, posenc 10/4, precrop warmup, lr 5e-4 with 0.1 decay/500k).

max_iters = 200000
eval_interval = 25000
ckpt_interval = 25000
log_interval = 100
eval_chunk = 16384
work_dir = "./work_dirs/nerf/#DATANAME#"

model = dict(
    type="NerfNetwork",
    n_samples=64,
    n_importance=128,
    multires=10,
    multires_dirs=4,
    netdepth=8,
    netwidth=256,
    use_viewdirs=True,
    white_bkgd=True,
    raw_noise_std=0.0,
    perturb=True,
)

data = dict(
    type="SceneDataset",
    datadir="data/nerf_synthetic/#DATANAME#",
    dataset_type="blender",
    half_res=False,
    testskip=8,
    white_bkgd=True,
    N_rand=1024,
    batching=False,
    precrop_iters=500,
    precrop_frac=0.5,
    near=2.0,
    far=6.0,
)

optimizer = dict(type="adam", lr=5e-4, lr_decay_steps=500000, lr_decay_rate=0.1)

hooks = [
    dict(type="ValidateHook", save_img=True, max_images=2),
    dict(type="ElapsedTimeHook", n_images=3),
    dict(type="OccupationHook"),
]

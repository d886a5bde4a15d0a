# Mip-NeRF on multiscale blender (parity: the reference's
# configs/mipnerf/*: 2 levels x 128 samples, one shared MLP, IPE degrees
# 0-16, lossmult-weighted multiscale loss, log-lerp lr with warmup —
# MipLrUpdaterHook semantics, train_hooks.py:55-84).

max_iters = 1000000
eval_interval = 100000
ckpt_interval = 100000
log_interval = 100
eval_chunk = 16384
ndown = 4
work_dir = "./work_dirs/mipnerf/#DATANAME#"

model = dict(
    type="MipNerfNetwork",
    num_levels=2,
    n_samples=128,
    min_deg_point=0,
    max_deg_point=16,
    deg_view=4,
    netdepth=8,
    netwidth=256,
    white_bkgd=True,
    ray_shape="cone",
    resample_padding=0.01,
    rgb_padding=0.001,
    density_bias=-1.0,
    coarse_loss_mult=0.1,
)

data = dict(
    type="MipMultiScaleDataset",
    datadir="data/nerf_synthetic/#DATANAME#",
    n_scales=4,
    white_bkgd=True,
    N_rand=4096,
    testskip=8,
)

optimizer = dict(
    type="adam",
    lr=5e-4,
    lr_final=5e-6,
    lr_warmup_steps=2500,
    lr_delay_mult=0.01,
    grad_clip=1e-3,
)

hooks = [
    dict(type="ValidateHook", save_img=True, max_images=4),
    dict(type="TestHook", save_img=False, ndown=4),
]

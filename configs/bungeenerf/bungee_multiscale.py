# BungeeNeRF progressive multi-scale training (parity: the reference's
# configs/bungeenerf/* + BungeeNerfTrainRunner stage loop, replaced here
# by the step-driven curriculum inside BungeeDataset/BungeeNerfNetwork).

max_iters = 200000
eval_interval = 50000
ckpt_interval = 50000
log_interval = 100
eval_chunk = 8192
work_dir = "./work_dirs/bungee/#DATANAME#"

model = dict(
    type="BungeeNerfNetwork",
    n_stages=4,
    n_samples=64,
    n_resample=64,
    min_deg_point=0,
    max_deg_point=10,
    deg_view=4,
    netwidth=256,
    white_bkgd=False,
    iters_per_stage=50000,
)

data = dict(
    type="BungeeDataset",
    datadir="data/multiscale_google/#DATANAME#",
    dataset_type="google",  # real google-earth layout (poses_enu.json)
    factor=3,
    holdout=16,
    n_stages=4,
    iters_per_stage=50000,
    N_rand=1024,
)

optimizer = dict(type="adam", lr=5e-4, lr_decay_steps=500000, lr_decay_rate=0.1)

hooks = [dict(type="ValidateHook", save_img=True, max_images=2)]

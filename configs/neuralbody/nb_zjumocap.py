# NeuralBody on ZJU-MoCap (parity target: the reference's
# configs/neuralbody/nb_zjumocap_313.py — SMPL latent codes -> sparse-conv
# volume -> NB MLP, 64 samples, mask-weighted ray sampling, lr 5e-4 with
# 0.1 step decay at 500k, 60 training frames from views {0,6,12,18}).
#
# Use --dataname 313 (or 315/377/... for other subjects).

max_iters = 200000
eval_interval = 25000
ckpt_interval = 10000
log_interval = 100
eval_chunk = 4096
work_dir = "./work_dirs/neuralbody/#DATANAME#"

num_train_frame = 60

model = dict(
    type="NeuralBodyNetwork",
    num_frames=num_train_frame,
    n_samples=64,
    white_bkgd=False,
)

data = dict(
    type="NeuralBodyDataset",
    datadir="data/zju_mocap/CoreView_#DATANAME#",
    training_view=(0, 6, 12, 18),
    frame_start=0,
    frame_end=num_train_frame,
    frame_skip=1,
    N_rand=1024,
    body_frac=0.5,
    mask_dir="mask_cihp",
    vertices_dir="new_vertices",
)

optimizer = dict(type="adam", lr=5e-4, lr_decay_steps=500000, lr_decay_rate=0.1)

hooks = [
    dict(type="ValidateHook", save_img=True, max_images=2),
    dict(type="ElapsedTimeHook", n_images=2),
    dict(type="OccupationHook"),
]

# Animatable NeRF on ZJU-MoCap, phase 1 "train_pose" (parity target:
# configs/animatable_nerf/an_zjumocap_313_train_pose.py — neural blend
# weight LBS deformation to the canonical space + tpose density/color
# fields; image loss + smooth-L1 blend-weight consistency).
#
# Phase 2 ("novel_pose") is configs/aninerf/aninerf_zjumocap_novel_pose.py
# initialised with --load_from on this phase's checkpoint.

max_iters = 200000
eval_interval = 25000
ckpt_interval = 10000
log_interval = 100
eval_chunk = 4096
work_dir = "./work_dirs/aninerf/#DATANAME#_train_pose"

num_train_frame = 60

model = dict(
    type="AniNeRFNetwork",
    num_frames=num_train_frame,
    n_samples=64,
    smpl_dist_threshold=0.05,
    phase="train_pose",
    white_bkgd=False,
)

data = dict(
    type="AniNeRFDataset",
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
    dict(type="OccupationHook"),
]

# Animatable NeRF phase 2 "novel_pose" (parity target:
# configs/animatable_nerf/an_zjumocap_313_novel_pose.py): only the
# novel-pose blend-weight MLP trains (the Trainer masks every other
# subtree via AniNeRFNetwork.trainable_filter); loss is the blend-weight
# consistency alone. Start from the train_pose checkpoint with
# --load_from work_dirs/aninerf/<scene>_train_pose/ckpt_latest.

max_iters = 100000
eval_interval = 25000
ckpt_interval = 10000
log_interval = 100
eval_chunk = 4096
work_dir = "./work_dirs/aninerf/#DATANAME#_novel_pose"

num_train_frame = 60

model = dict(
    type="AniNeRFNetwork",
    num_frames=num_train_frame,
    n_samples=64,
    smpl_dist_threshold=0.05,
    phase="novel_pose",
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

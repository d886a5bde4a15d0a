# GNR on GeneBody (parity target: the reference's configs/gnr/gnr_genebody.py
# — 4 fixed source views {1,13,25,37}, 256 samples/ray inside the visual
# hull, stacked-hourglass encoder, SMPL SDF + T-pose body-shape embedding,
# attention appearance blending with SMPL-depth occlusion weighting).
#
# --dataname selects the GeneBody subject (e.g. amanda, barry, ...).

max_iters = 200000
eval_interval = 25000
ckpt_interval = 10000
log_interval = 100
eval_chunk = 1024
work_dir = "./work_dirs/gnr/#DATANAME#"

model = dict(
    type="GnrNetwork",
    num_views=4,
    n_samples=256,
    load_size=512,
    projection_mode="perspective",
    use_smpl_sdf=True,
    use_t_pose=True,
    use_smpl_depth=True,
    use_nml=True,
    use_attention=True,
    use_occlusion=True,
    use_vh=True,
    train_encoder=False,
    num_stack=4,
    num_hourglass=2,
    hourglass_dim=256,
    mlp_depth=8,
    mlp_width=256,
    skips=(2, 4, 6),
)

data = dict(
    type="GeneBodyDataset",
    datadir="data/genebody",
    subject="#DATANAME#",
    num_views=4,
    input_views=(1, 13, 25, 37),
    N_rand=1024,
    load_size=512,
    frame_start=0,
    frame_end=150,
)

optimizer = dict(type="adam", lr=5e-4, lr_decay_steps=500000, lr_decay_rate=0.1)

hooks = [
    dict(type="ValidateHook", save_img=True, max_images=1),
    dict(type="OccupationHook"),
]

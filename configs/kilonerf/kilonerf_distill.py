# KiloNeRF phase-2 distill (parity: the reference's distill configs +
# kd-tree machinery in core/hooks/save_distill_results_hook.py and
# datasets/kilonerf_node_dataset.py).
#
# Two modes, selected by ``mode``:
#   "tree"    — reference-parity kd-tree discovery (DistillDriver):
#               adaptive node splitting until per-node error < max_error,
#               saturation retraining, checkpointed tree; the fitted
#               leaves are assembled onto the finetune grid.
#   "uniform" — simplified fixed-grid distill (StudentNerfNetwork via the
#               Trainer): every finetune cell trains from the start.

mode = "tree"
work_dir = "./work_dirs/kilonerf_distill/#DATANAME#"

# --- tree mode (DistillDriver) -------------------------------------------
tree = dict(
    fixed_resolution=(4, 4, 4),
    max_num_networks=512,
    num_examples_per_network=10000,
    test_examples_per_network=2000,
    iters_per_batch=1500,
    lr=2e-3,
    saturation_lr=1e-4,
    max_error=1e-4,
    test_error_metric="quantile_se",
    tree_type="kdtree_longest",
    termination_volume=0.99,
    hidden=32,
    n_hidden_layers=2,
    multires=10,
    multires_dirs=4,
)

# --- uniform mode (Trainer over KiloNerfDistillDataset) ------------------
max_iters = 50000
ckpt_interval = 10000
log_interval = 200

model = dict(
    type="StudentNerfNetwork",
    resolution=(16, 16, 16),
    domain_min=(-0.7, -0.7, -0.7),
    domain_max=(0.7, 0.7, 0.7),
    hidden=32,
    n_hidden_layers=2,
    multires=10,
    multires_dirs=4,
)

data = dict(
    type="KiloNerfDistillDataset",
    resolution=(16, 16, 16),
    domain_min=(-0.7, -0.7, -0.7),
    domain_max=(0.7, 0.7, 0.7),
    points_per_net=8,
)

optimizer = dict(type="adam", lr=2e-3)

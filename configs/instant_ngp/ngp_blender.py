# Instant-NGP on nerf_synthetic (parity: the reference's
# configs/instant_ngp/* — hash 16x2@2^19 base 16, occupancy grid updated
# every 16 iters, Huber x5 loss, adam eps 1e-15, EMA 0.95).

max_iters = 30000
eval_interval = 10000
ckpt_interval = 10000
log_interval = 100
eval_chunk = 8192
ema_decay = 0.95
work_dir = "./work_dirs/ngp/#DATANAME#"

model = dict(
    type="HashNerfNetwork",
    n_levels=16,
    n_features=2,
    log2_table_size=19,
    base_res=16,
    max_res=2048,
    hidden_dim=64,
    geo_feat_dim=15,
    n_cascades=1,
    grid_res=128,
    n_candidates=512,
    n_keep=64,
    white_bkgd=True,
    grid_update_samples=65536,
    density_threshold=0.01,
    loss_scale=5.0,
    # bound>1 scenes: raise n_cascades and set cone_angle ~1/256 for
    # NGP's distance-proportional stepping (raymarch_shared.h calc_dt).
    cone_angle=0.0,
    # 'vertex' = tcnn-exact quality; 'brick' (+ n_lattices=2) trains ~3x
    # faster on TPU at a measured quality cost — see docs/benchmark.md.
    hash_layout="vertex",
    # batch-level live-sample compaction cap (compacted_coord's
    # target_batch_size semantics); 2x the SampleBudgetHook target so
    # overflow drops stay rare
    sample_budget=2**18,
)

data = dict(
    type="HashNerfDataset",
    datadir="data/nerf_synthetic/#DATANAME#",
    half_res=False,
    testskip=8,
    white_bkgd=True,
    N_rand=4096,
)

optimizer = dict(type="adam", lr=1e-2, eps=1e-15, beta1=0.9, beta2=0.99, lr_decay_steps=20000, lr_decay_rate=0.33)

hooks = [
    dict(type="ValidateHook", save_img=True, max_images=2),
    dict(type="ElapsedTimeHook", n_images=3),
    # bucketed static-shape replacement for the reference's dynamic
    # n_rays_per_batch feedback (ModifyBatchsizeHook +
    # ngp_grid_sampler.py:268-281, target 2^18 samples/step)
    dict(type="SampleBudgetHook", target_samples=2**18),
]

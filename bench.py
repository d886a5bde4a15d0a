"""Benchmark suite: one JSON line, primary metric + extras.

Primary: full-size vanilla-NeRF training throughput (rays/s) — the
flagship config (8x256 MLP, 64+128 samples, posenc 10/4, fused Pallas
MLPs), methodology notes below. ``extras`` adds the other headline
rows the reference's benchmark table implies (SURVEY §6 / BASELINE.md):

  lego_ttp25_s         seconds of post-compile training to reach train
                       PSNR 25 overfitting the real reference lego
                       fixture (2 views, 400x400) with the brick NGP —
                       an end-to-end optimizer+kernel wall-clock metric
  ngp_vertex_rays_s    Instant-NGP train step, tcnn-exact vertex layout
                       (real fixture rays + warmed occupancy grid)
  ngp_brick_rays_s     Instant-NGP train step, TPU-fast brick layout
  nerf_mfu_pct         measured model-FLOPs utilization of the primary
                       row vs the v5e bf16 peak (analytic FLOP floor)
  kilonerf_pooled_frame_ms  real 800x800 lego KiloNeRF inference frame,
                       two-stage pooled-gather march (the config
                       default; ref bar: 365-394 ms)
  kilonerf_pooled_parity_db PSNR between dense and pooled renders of one
                       chunk (masking-equivalence check)
  kilonerf_cull_frame_ms    pooled + conservative frame-level ray cull
  kilonerf_frame_ms    same frame, dense march (deprecated path, runs
                       last, kept for the cross-round series)
  kilonerf_sphere_frame_ms  same frame, scan sphere-trace march
  mipnerf_rays_s       Mip-NeRF train step (2 levels x 128 samples)
  gnr_rays_s           GNR train step at production shape
  neuralbody_rays_s    NeuralBody train step at production shape

The reference publishes no training-throughput numbers (SURVEY §6);
``vs_baseline`` normalizes the primary against REF_RAYS_S = 20_000
rays/s, a representative figure for the PyTorch reference's single-GPU
vanilla-NeRF loop on a datacenter GPU of its era. kilonerf_frame_ms
carries its own reference bar (393.61 ms avg, docs/en/benchmark.md).

Measurement notes:
  - K train steps are fused into ONE jitted ``lax.scan`` dispatch
    (step-fusion): on relay-attached accelerators each dispatch pays a
    large fixed round-trip, and even locally this removes host
    involvement from the inner loop. Distinct pre-staged batches feed
    each scanned step, so this measures real training, not replay.
  - completion is forced by fetching a scalar value (device_get);
    ``block_until_ready`` alone can acknowledge before remote execution
    drains on relayed PJRT transports, inflating rays/s.
  - every extra is independently guarded: a failure records the error
    string instead of killing the suite.
"""

import json
import os
import signal
import sys
import time

import numpy as np

from xrnerf_tpu.utils.compile_cache import enable_persistent_cache

# Persistent XLA compile cache: the NGP train step costs ~15 min to
# compile cold on a relay-attached chip; cached it reloads in seconds,
# which is what lets the full suite fit the driver budget (round-3
# BENCH rc=124 lesson).
enable_persistent_cache()

REF_RAYS_S = 20_000.0
KILONERF_REF_MS = 393.61  # docs/en/benchmark.md:133-136, NSVF synthetic avg
BATCH = 4096
LEGO = "/root/reference/test/datasets/data/nerf_synthetic/lego"

# Wall-clock the suite must finish inside (the driver runs bench.py
# under an external timeout; round 3 lost ALL output to it). Extras are
# skipped once their estimated cost no longer fits.
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", 1050))
_T_START = time.perf_counter()


def remaining_s() -> float:
    return BUDGET_S - (time.perf_counter() - _T_START)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _ray_batches(n_steps, batch, seed=0, near=2.0, far=6.0, o_scale=1.0):
    rng = np.random.RandomState(seed)
    d = rng.randn(n_steps, batch, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return {
        "rays_o": rng.randn(n_steps, batch, 3).astype(np.float32) * o_scale,
        "rays_d": d,
        "near": np.full((n_steps, batch, 1), near, np.float32),
        "far": np.full((n_steps, batch, 1), far, np.float32),
        "target": rng.rand(n_steps, batch, 3).astype(np.float32),
    }


def _train_throughput(net, batches, steps, calls, aux=None, warmup=2, seed=0):
    """Scan-fused training throughput; returns rays/s."""
    import jax
    import optax

    one = {k: v[0] for k, v in batches.items()}
    params = net.init(
        jax.random.PRNGKey(0), one, rng=None, train=False,
        **({"aux": aux} if aux is not None else {}),
    )["params"]
    tx = optax.adam(5e-4)
    opt_state = tx.init(params)

    @jax.jit
    def run_steps(params, opt_state, key):
        def body(carry, xs):
            params, opt_state = carry
            batch, k = xs

            def lf(p):
                kw = {"aux": aux} if aux is not None else {}
                out = net.apply({"params": p}, batch, rng=k, train=True, **kw)
                return net.loss(out, batch)[0]

            loss, g = jax.value_and_grad(lf)(params)
            upd, opt_state2 = tx.update(g, opt_state)
            return (optax.apply_updates(params, upd), opt_state2), loss

        keys = jax.random.split(key, steps)
        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), (batches, keys)
        )
        return params, opt_state, losses[-1]

    key = jax.random.PRNGKey(seed)
    for i in range(warmup):
        params, opt_state, loss = run_steps(params, opt_state, jax.random.fold_in(key, i))
    float(loss)
    t0 = time.perf_counter()
    for i in range(calls):
        params, opt_state, loss = run_steps(
            params, opt_state, jax.random.fold_in(key, 100 + i)
        )
    final_loss = float(loss)
    dt = time.perf_counter() - t0
    assert np.isfinite(final_loss)
    batch = batches["rays_o"].shape[1]
    return batch * steps * calls / dt


def bench_nerf():
    import jax.numpy as jnp

    from xrnerf_tpu.models.networks.nerf import NerfNetwork

    steps = 10
    batches = {k: jnp.asarray(v) for k, v in _ray_batches(steps, BATCH).items()}
    net = NerfNetwork(n_samples=64, n_importance=128, netdepth=8, netwidth=256, fused=True)
    return _train_throughput(net, batches, steps, calls=5)


V5E_PEAK_BF16 = 197e12  # TPU v5e (v5 lite) peak bf16 FLOP/s per chip


def nerf_train_flops_per_ray():
    """Analytic matmul FLOPs of one flagship-NeRF training ray.

    Counts every Dense in the coarse+fine MLPs (the model of
    fields/nerf_mlp.py: posenc 63/27 inputs, 8x256 trunk with a skip
    re-concat at layer 5, alpha/feature heads, 128-wide view branch),
    x3 for forward + backward (standard dL/dx + dL/dW count). Sampler,
    posenc, and compositing elementwise FLOPs are excluded — this is a
    floor, so the MFU row is conservative."""
    cp, cv, w = 63, 27, 256
    per_pt = 2 * cp * w  # pts_0
    for i in range(1, 8):
        din = cp + w if i - 1 in (4,) else w
        per_pt += 2 * din * w
    per_pt += 2 * w * 1  # alpha
    per_pt += 2 * w * w  # feature
    per_pt += 2 * (w + cv) * (w // 2)  # views_0
    per_pt += 2 * (w // 2) * 3  # rgb
    pts_per_ray = 64 + (64 + 128)  # coarse MLP + fine MLP points
    return 3 * per_pt * pts_per_ray


def nerf_mfu_pct(rays_s):
    """Measured model FLOPs utilization of the primary NeRF row against
    the v5e bf16 peak (VERDICT r4 weak point 7: the docs' MFU claim must
    be a bench output, not a hand calculation in prose)."""
    return 100.0 * rays_s * nerf_train_flops_per_ray() / V5E_PEAK_BF16


_GRID_CACHE = ".bench_lego_grid.npz"


def _warmed_lego_state(warm_iters=192, batch=BATCH):
    """(dataset, aux): real lego fixture + a trained-ish occupancy grid.

    Fixes round-3 weak point 8: the benchmarked NGP step previously saw a
    fresh all-live grid (aux=init_aux(None)), overstating march cost and
    skipping mark-untrained. Here the aux starts from
    ``init_aux(params, ds)`` (mark-untrained from the real poses) and is
    advanced ``warm_iters`` training iters with the 16-iter grid-update
    cadence — using the fast brick layout; the grid state is
    layout-independent, so both layouts' benches share it (disk-cached).
    """
    import jax
    import jax.numpy as jnp
    import optax

    from xrnerf_tpu.datasets.hashnerf import HashNerfDataset
    from xrnerf_tpu.models.networks.hashnerf import HashNerfNetwork
    from xrnerf_tpu.models.samplers.occupancy import OccupancyGrid

    ds = HashNerfDataset(LEGO, half_res=True, testskip=1, N_rand=batch)
    if os.path.exists(_GRID_CACHE):
        z = np.load(_GRID_CACHE)
        return ds, OccupancyGrid(
            density=jnp.asarray(z["density"]), bitfield=jnp.asarray(z["bitfield"])
        )
    net = HashNerfNetwork(hash_layout="brick", n_lattices=2)
    b0 = {k: jnp.asarray(v) for k, v in ds.train_batch(0).items()}
    params = net.init(jax.random.PRNGKey(0), b0, rng=None, train=False)["params"]
    aux = net.init_aux(params, ds)
    tx = optax.adam(1e-2, b2=0.99, eps=1e-15)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, aux, b, k):
        def lf(p):
            out = net.apply({"params": p}, b, rng=k, train=True, aux=aux)
            return net.loss(out, b)[0]

        loss, g = jax.value_and_grad(lf)(params)
        upd, opt2 = tx.update(g, opt)
        return optax.apply_updates(params, upd), opt2, loss

    upd_aux = jax.jit(net.update_aux)
    key = jax.random.PRNGKey(0)
    for i in range(warm_iters):
        b = {k: jnp.asarray(v) for k, v in ds.train_batch(i).items()}
        params, opt, loss = step(params, opt, aux, b, jax.random.fold_in(key, i))
        if i % 16 == 0:
            aux = upd_aux(params, aux, jnp.asarray(i), jax.random.fold_in(key, 2**30 + i))
    float(loss)
    np.savez(
        _GRID_CACHE,
        density=np.asarray(aux.density),
        bitfield=np.asarray(aux.bitfield),
    )
    return ds, aux


def bench_ngp(layout):
    import jax.numpy as jnp

    from xrnerf_tpu.models.networks.hashnerf import HashNerfNetwork

    steps = 5
    net = HashNerfNetwork(
        hash_layout=layout, n_lattices=2 if layout == "brick" else 1,
        sample_budget=1 << 17,
    )
    if os.path.isdir(LEGO):
        ds, aux = _warmed_lego_state()
        per = [ds.train_batch(1000 + i) for i in range(steps)]
        batches = {
            k: jnp.asarray(np.stack([b[k] for b in per])) for k in per[0]
        }
    else:  # synthetic fallback (fixture not mounted)
        raw = _ray_batches(steps, BATCH, near=0.1, far=1.5, o_scale=0.2)
        raw["rays_o"] = np.abs(raw["rays_o"]) % 1.0
        del raw["near"], raw["far"]
        batches = {k: jnp.asarray(v) for k, v in raw.items()}
        aux = net.init_aux(None)
    return _train_throughput(net, batches, steps, calls=3, aux=aux)


def bench_mipnerf():
    import jax.numpy as jnp

    from xrnerf_tpu.models.networks.mipnerf import MipNerfNetwork

    steps = 5
    raw = _ray_batches(steps, BATCH)
    raw["radii"] = np.full((steps, BATCH, 1), 1e-3, np.float32)
    raw["lossmult"] = np.ones((steps, BATCH, 1), np.float32)
    batches = {k: jnp.asarray(v) for k, v in raw.items()}
    net = MipNerfNetwork(num_levels=2, n_samples=128, netdepth=8, netwidth=256)
    return _train_throughput(net, batches, steps, calls=3)


_KILO_INPUT_CACHE = {}
_TTP_FINAL_GRID = {}


def _lego_kilonerf_inputs(chunk=65536):
    """Real-scene KiloNeRF frame inputs (round-3 weak point 5): the
    occupancy grid is the warmed lego NGP grid's 128^3 bitfield (trained
    on the real fixture — structured occupancy, not a random mask) and
    the rays are the fixture camera's actual 800x800 get_rays bundle
    (unnormalized pixel dirs), chunked. Domain = NGP coords [0,1]^3.

    Memoized per chunk size: four KiloNeRF rows share one build (the
    round-4 deadline was partly self-inflicted re-building these).

    Returns (occ [128^3 bool], chunks list of ray dicts, n_rays)."""
    if chunk in _KILO_INPUT_CACHE:
        return _KILO_INPUT_CACHE[chunk]
    import jax.numpy as jnp

    from xrnerf_tpu.datasets.hashnerf import HashNerfDataset

    _, aux = _warmed_lego_state()
    occ = np.asarray(aux.bitfield[0]).reshape(128, 128, 128)
    ds = HashNerfDataset(LEGO, half_res=False, testskip=1, N_rand=1024)
    rays = ds.image_rays(ds.i_train[0])
    n_rays = rays["rays_o"].shape[0]
    pad = (-n_rays) % chunk
    rays = {
        k: np.concatenate([v, np.repeat(v[-1:], pad, 0)]) if pad else v
        for k, v in rays.items()
    }
    chunks = []
    for s in range(0, n_rays + pad, chunk):
        c = {k: jnp.asarray(v[s : s + chunk]) for k, v in rays.items()}
        # blender near/far 2/6 in nerf units x the 0.33 ngp scale
        c["near"] = jnp.full((chunk, 1), 2.0 * 0.33, jnp.float32)
        c["far"] = jnp.full((chunk, 1), 6.0 * 0.33, jnp.float32)
        chunks.append(c)
    _KILO_INPUT_CACHE[chunk] = (occ, chunks, n_rays)
    return _KILO_INPUT_CACHE[chunk]


def bench_kilonerf_frame(hw=800, chunk=65536, n_samples=384, n_keep=32, res=16,
                         march="dense", cull=False, grid="warm"):
    import jax
    import jax.numpy as jnp

    from xrnerf_tpu.models.networks.kilonerf import KiloNerfNetwork

    real = os.path.isdir(LEGO)
    if real:
        occ_np, chunks, n_rays = _lego_kilonerf_inputs(chunk)
        if grid == "converged":
            # trained-to-PSNR-25 grid captured by the ttp25 row: same
            # shapes as the warm grid, so the compiled frame programs
            # are reused — grid content is data, not shape
            if "occ" not in _TTP_FINAL_GRID:
                raise RuntimeError("converged grid unavailable (ttp row skipped)")
            occ_np = _TTP_FINAL_GRID["occ"]
        occ = jnp.asarray(occ_np)
        dmin, dmax = (0.0, 0.0, 0.0), (1.0, 1.0, 1.0)
        batch0 = chunks[0]
    else:  # synthetic fallback
        rng = np.random.RandomState(0)
        d = rng.randn(chunk, 3).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        batch0 = {
            "rays_o": jnp.asarray(rng.randn(chunk, 3).astype(np.float32) * 0.1),
            "rays_d": jnp.asarray(d),
            "near": jnp.full((chunk, 1), 0.5, np.float32),
            "far": jnp.full((chunk, 1), 2.5, np.float32),
        }
        occ = jnp.asarray(rng.rand(res * 4, res * 4, res * 4) < 0.15)
        dmin, dmax = (-1.0, -1.0, -1.0), (1.0, 1.0, 1.0)
        chunks = [batch0] * ((hw * hw + chunk - 1) // chunk)

    net = KiloNerfNetwork(
        resolution=(res, res, res), domain_min=dmin, domain_max=dmax,
        hidden=32, n_hidden_layers=2,
        n_samples=n_samples, n_keep=n_keep, dtype=jnp.bfloat16,
        march=march,
        # config defaults (kilonerf_finetune.py): the round-5 sweeps
        # measured 640k/1.25 at 52.2 dB dense-parity (vs 760 ms for
        # 768k/2.0 at 52.8) and G=16/Kg=4 at 624 ms / 53.2 dB (half the
        # stage-A probes of 8/8 at the same stage-B rows)
        eval_budget=(640 * 1024) if real else 0,
        capacity_factor=1.25,
        march_group=16, march_groups_keep=4,
    )
    from xrnerf_tpu.models.networks.kilonerf import prepare_march_aux

    # distance field computed ONCE per grid (it ships with the model
    # artifact in deployment, like the reference's occupancy.pth)
    aux = jax.jit(prepare_march_aux)(occ)
    jax.block_until_ready(aux.dist)
    params = net.init(jax.random.PRNGKey(0), batch0, rng=None, train=False, aux=aux)[
        "params"
    ]

    @jax.jit
    def render_chunk(params, b):
        return net.apply({"params": params}, b, rng=None, train=False, aux=aux)["rgb"]

    if cull and real:
        # frame-level conservative ray culling (kilonerf_strip_active):
        # a cheap strip-shared distance-field prepass marks rays that
        # provably hit nothing; only chunks of active rays render, the
        # rest is background fill — the static-shape analog of the
        # reference CUDA renderer's per-ray early exit. Output-identical
        # to the uncalled frame (culled rays have no live samples).
        from xrnerf_tpu.models.networks.kilonerf import kilonerf_strip_active

        dmin_a = jnp.asarray(dmin, jnp.float32)
        dmax_a = jnp.asarray(dmax, jnp.float32)

        # full ray bundle stays resident on device; active rays are
        # gathered into dense chunks ON DEVICE (a 65k-row gather, ~ms)
        # rather than host fancy-indexing + re-upload per chunk.
        full_dev = {
            k: jnp.asarray(np.concatenate([np.asarray(c[k]) for c in chunks]))
            for k in chunks[0]
        }
        n_all = int(full_dev["rays_o"].shape[0])

        @jax.jit
        def _active_frame():
            # one whole-frame prepass call: on a relay-attached chip each
            # dispatch+sync costs ~20-30 ms, so per-chunk prepass calls
            # would eat the cull win in launch latency alone
            # strip=8 halves the strip-divergence radius (~3 cells vs
            # ~6); measured on this frame it culls at most 1 of 10
            # chunks on either grid — the lego camera fills the frame,
            # so the rows record an honest negative for frame-level
            # culling here (it pays on empty-dominated views)
            return kilonerf_strip_active(
                full_dev["rays_o"], full_dev["rays_d"], full_dev["near"],
                full_dev["far"], aux.dist, dmin_a, dmax_a,
                strip=8, n_probes=64,
            )

        @jax.jit
        def render_sel_into(params, sel, out):
            # render the selected rays and scatter them into the frame
            # ON DEVICE: pulling each chunk's rgb to host cost ~100 ms
            # of relay transfer per chunk (the round-5 first conv-cull
            # measurement: 1,638 ms where 9 x render + prepass is
            # ~650 ms of device work)
            cb = {k: v[sel] for k, v in full_dev.items()}
            rgb = net.apply(
                {"params": params}, cb, rng=None, train=False, aux=aux
            )["rgb"]
            return out.at[sel].set(rgb)

        def frame():
            act = np.asarray(_active_frame())
            idx = np.nonzero(act)[0]
            frame.n_chunks = -(-idx.size // chunk)
            if frame.n_chunks >= len(chunks):  # nothing culled: no-regret
                acc = None
                for b in chunks:
                    acc = render_chunk(params, b)
                return float(acc[0, 0])
            pad = (-idx.size) % chunk
            idxp = np.concatenate(
                [idx, np.full(pad, idx[0] if idx.size else 0, np.int64)]
            ) if pad else idx
            out = jnp.ones((n_all, 3), jnp.float32)  # white background
            for s in range(0, idxp.size, chunk):
                sel = jnp.asarray(idxp[s : s + chunk].astype(np.int32))
                out = render_sel_into(params, sel, out)
            return float(out[0, 0])

    else:

        def frame():
            acc = None
            for b in chunks:
                acc = render_chunk(params, b)
            return float(acc[0, 0])  # forces completion

    frame()  # compile + warm
    if cull and real:
        log(f"[bench] kilonerf cull: {frame.n_chunks}/{len(chunks)} chunks active")
    t0 = time.perf_counter()
    frames = 2
    for _ in range(frames):
        frame()
    return (time.perf_counter() - t0) / frames * 1e3  # ms


def bench_kilonerf_parity(chunk=65536, n_samples=384, n_keep=32, res=16):
    """PSNR between dense-march and pooled-march renders of the same
    (random-weight) KiloNeRF on the REAL lego occupancy + camera chunk —
    a masking-equivalence proxy (round-3 weak point 6: validate the fast
    march's kept samples before quoting its frame time). Random weights
    make every masking difference visible; high PSNR means the pooled
    budget loses essentially nothing on the real grid."""
    import jax
    import jax.numpy as jnp

    from xrnerf_tpu.models.networks.kilonerf import KiloNerfNetwork

    occ_np, chunks, _ = _lego_kilonerf_inputs(chunk)
    occ = jnp.asarray(occ_np)
    b = chunks[len(chunks) // 2]  # a center chunk (object-rich rows)
    kw = dict(
        resolution=(res, res, res), domain_min=(0.0, 0.0, 0.0),
        domain_max=(1.0, 1.0, 1.0), hidden=32, n_hidden_layers=2,
        n_samples=n_samples, n_keep=n_keep, dtype=jnp.bfloat16,
        eval_budget=640 * 1024,
    )
    from xrnerf_tpu.models.networks.kilonerf import prepare_march_aux

    aux = jax.jit(prepare_march_aux)(occ)
    dense = KiloNerfNetwork(**kw, march="dense")
    pooled = KiloNerfNetwork(**kw, march="pooled", capacity_factor=1.25,
                             march_group=16, march_groups_keep=4)
    params = dense.init(jax.random.PRNGKey(0), b, rng=None, train=False, aux=aux)[
        "params"
    ]
    img_d = jax.jit(
        lambda p: dense.apply({"params": p}, b, rng=None, train=False, aux=aux)["rgb"]
    )(params)
    img_p = jax.jit(
        lambda p: pooled.apply({"params": p}, b, rng=None, train=False, aux=aux)["rgb"]
    )(params)
    mse = float(jnp.mean((img_d.astype(jnp.float32) - img_p.astype(jnp.float32)) ** 2))
    return -10.0 * np.log10(max(mse, 1e-12))


def bench_gnr(n_rand=1024, steps=3):
    """GNR end-to-end train step at production shape: 4x512x512 source
    views through the stacked-hourglass encoder + per-view sampling +
    attention-blended render, 1024 rays x 256 samples (the
    configs/gnr/gnr_genebody.py geometry). Returns rays/s."""
    import jax
    import jax.numpy as jnp
    import optax

    from xrnerf_tpu.datasets.genebody import GeneBodyDataset
    from xrnerf_tpu.datasets.load.synthetic import make_synthetic_genebody
    from xrnerf_tpu.models.networks.gnr import GnrNetwork

    arrays = make_synthetic_genebody(n_frames=1, n_cams=4, H=512, W=512)
    ds = GeneBodyDataset(arrays=arrays, num_views=4, input_views=(0, 1, 2, 3), N_rand=n_rand)
    batch = {k: jnp.asarray(v) for k, v in ds.train_batch(0).items()}
    net = GnrNetwork(
        num_views=4, n_samples=256, load_size=512, num_stack=4,
        num_hourglass=2, hourglass_dim=256, mlp_depth=8, mlp_width=256,
        skips=(2, 4, 6),
    )
    params = net.init(jax.random.PRNGKey(0), batch, rng=None, train=False)["params"]
    tx = optax.adam(1e-4)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, k):
        def lf(p):
            out = net.apply({"params": p}, batch, rng=k, train=True)
            return net.loss(out, batch)[0]

        loss, g = jax.value_and_grad(lf)(params)
        upd, opt2 = tx.update(g, opt)
        return optax.apply_updates(params, upd), opt2, loss

    key = jax.random.PRNGKey(0)
    params, opt, loss = step(params, opt, key)
    float(loss)  # compile + drain
    t0 = time.perf_counter()
    for i in range(steps):
        params, opt, loss = step(params, opt, jax.random.fold_in(key, i))
    assert np.isfinite(float(loss))
    dt = time.perf_counter() - t0
    return n_rand * steps / dt


def bench_neuralbody(n_rand=1024, steps=3):
    """NeuralBody end-to-end train step at production shape (the
    configs/neuralbody/nb_zjumocap.py geometry: 6890 SMPL vertices,
    16-dim latent codes, sparse-conv volume, 64 samples, 1024 rays).
    First non-test evidence for the human-NeRF family (VERDICT r4
    item 8). Returns rays/s."""
    import jax
    import jax.numpy as jnp
    import optax

    from xrnerf_tpu.datasets.load.synthetic import make_synthetic_zju
    from xrnerf_tpu.datasets.neuralbody import NeuralBodyDataset
    from xrnerf_tpu.models.networks.neuralbody import NeuralBodyNetwork

    arrays = make_synthetic_zju(n_frames=4, n_cams=4, H=512, W=512, n_verts=6890)
    ds = NeuralBodyDataset(arrays=arrays, N_rand=n_rand, training_view=(0, 1, 2))
    batch = {k: jnp.asarray(v) for k, v in ds.train_batch(0).items()}
    net = NeuralBodyNetwork(num_frames=4, n_samples=64, white_bkgd=False)
    params = net.init(jax.random.PRNGKey(0), batch, rng=None, train=False)["params"]
    tx = optax.adam(5e-4)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, k):
        def lf(p):
            out = net.apply({"params": p}, batch, rng=k, train=True)
            return net.loss(out, batch)[0]

        loss, g = jax.value_and_grad(lf)(params)
        upd, opt2 = tx.update(g, opt)
        return optax.apply_updates(params, upd), opt2, loss

    key = jax.random.PRNGKey(0)
    params, opt, loss = step(params, opt, key)
    float(loss)  # compile + drain
    t0 = time.perf_counter()
    for i in range(steps):
        params, opt, loss = step(params, opt, jax.random.fold_in(key, i))
    assert np.isfinite(float(loss))
    dt = time.perf_counter() - t0
    return n_rand * steps / dt


def bench_lego_time_to_psnr(target_psnr=25.0, max_steps=3000, batch=8192):
    """Post-compile seconds of brick-NGP training to reach train PSNR
    ``target_psnr`` on the real 2-view lego fixture (half res)."""
    import os

    if not os.path.isdir(LEGO):
        raise RuntimeError("reference lego fixture not mounted")
    import jax
    import jax.numpy as jnp
    import optax

    from xrnerf_tpu.datasets.hashnerf import HashNerfDataset
    from xrnerf_tpu.models.networks.hashnerf import HashNerfNetwork

    ds = HashNerfDataset(LEGO, half_res=True, testskip=1, N_rand=batch)
    net = HashNerfNetwork(hash_layout="brick", n_lattices=2, sample_budget=1 << 18)
    b0 = {k: jnp.asarray(v) for k, v in ds.train_batch(0).items()}
    params = net.init(jax.random.PRNGKey(0), b0, rng=None, train=False)["params"]
    aux = net.init_aux(params, ds)
    tx = optax.adam(1e-2, b2=0.99, eps=1e-15)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, aux, batch, k):
        def lf(p):
            out = net.apply({"params": p}, batch, rng=k, train=True, aux=aux)
            loss, logs = net.loss(out, batch)
            return loss, logs["psnr"]

        (loss, psnr), g = jax.value_and_grad(lf, has_aux=True)(params)
        upd, opt2 = tx.update(g, opt)
        return optax.apply_updates(params, upd), opt2, psnr

    upd_aux = jax.jit(net.update_aux)

    key = jax.random.PRNGKey(0)
    # compile both programs before the clock starts
    params, opt, psnr = step(params, opt, aux, b0, key)
    aux = upd_aux(params, aux, jnp.asarray(0), key)
    float(psnr)

    t0 = time.perf_counter()
    for i in range(1, max_steps):
        b = {k: jnp.asarray(v) for k, v in ds.train_batch(i).items()}
        params, opt, psnr = step(params, opt, aux, b, jax.random.fold_in(key, i))
        if i % 16 == 0:
            aux = upd_aux(params, aux, jnp.asarray(i), jax.random.fold_in(key, 2**30 + i))
        # check every 10 steps: per-batch train PSNR is +-2 dB noisy, so
        # a sparse check makes the crossing time chaotic — the round-5
        # first run measured 395 s where the same seeds cross 25 dB at
        # step 150 (57 s) when sampled finely; a scalar fetch every 10
        # steps costs ~nothing against the 384 ms step
        if i % 10 == 0 and float(psnr) >= target_psnr:
            break
    dt = time.perf_counter() - t0
    if float(psnr) < target_psnr:
        raise RuntimeError(f"psnr {float(psnr):.2f} < {target_psnr} after {max_steps}")
    # keep the trained-to-PSNR-25 occupancy for the converged-grid
    # KiloNeRF cull A/B (VERDICT r4 item 6): the 192-iter warm grid is
    # too fragmented for ray culling to pay (6,602 components); this one
    # is the real consolidated article, captured for free.
    _TTP_FINAL_GRID["occ"] = np.asarray(aux.bitfield[0]).reshape(128, 128, 128)
    return dt


_STATE = {"primary": None, "extras": {}, "emitted": False}


def emit_json():
    """Print THE one JSON line (idempotent; also the SIGTERM backstop)."""
    if _STATE["emitted"]:
        return
    _STATE["emitted"] = True
    rays_s = _STATE["primary"]
    out = {
        "metric": "nerf_train_rays_per_sec",
        "value": round(rays_s, 1) if rays_s else None,
        "unit": "rays/s",
        "vs_baseline": round(rays_s / REF_RAYS_S, 3) if rays_s else None,
        "extras": _STATE["extras"],
    }
    print(json.dumps(out), flush=True)


def _on_term(signum, frame):  # pragma: no cover - driver timeout path
    log(f"[bench] signal {signum}: emitting partial results")
    emit_json()
    sys.exit(0)


def main():
    signal.signal(signal.SIGTERM, _on_term)
    signal.signal(signal.SIGINT, _on_term)
    extras = _STATE["extras"]

    def guarded(name, fn, unit, vs=None, est_s=120.0):
        """Run one extra; skip if it no longer fits the wall budget."""
        if remaining_s() < est_s:
            log(f"[bench] {name} SKIPPED (deadline: {remaining_s():.0f}s "
                f"left < est {est_s:.0f}s)")
            extras[name] = {"skipped": f"deadline ({remaining_s():.0f}s left)"}
            return
        try:
            t0 = time.perf_counter()
            v = fn()
            log(f"[bench] {name}: {v:,.1f} {unit} ({time.perf_counter()-t0:.0f}s)")
            entry = {"value": round(float(v), 2), "unit": unit}
            if vs is not None:
                entry["vs_baseline"] = round(vs(float(v)), 3)
            extras[name] = entry
        except Exception as e:  # noqa: BLE001
            log(f"[bench] {name} FAILED: {type(e).__name__}: {str(e)[:200]}")
            extras[name] = {"error": f"{type(e).__name__}: {str(e)[:200]}"}

    log(f"[bench] budget {BUDGET_S:.0f}s; vanilla NeRF primary first...")
    rays_s = bench_nerf()
    _STATE["primary"] = rays_s
    log(f"[bench] nerf: {rays_s:,.0f} rays/s ({time.perf_counter()-_T_START:.0f}s)")
    # MFU is derived from the primary row — free, always emitted
    guarded("nerf_mfu_pct", lambda: nerf_mfu_pct(rays_s), "%", est_s=0.0)

    # Ordering (VERDICT r4 weak point 1): north star first, then NGP,
    # then the DEFAULT KiloNeRF path (pooled + its parity check) —
    # these are the headline rows and must land before anything can eat
    # the budget. Deprecated/diagnostic marches (dense, sphere) run
    # LAST: no config uses them (configs/kilonerf/kilonerf_finetune.py
    # defaults march='pooled'). Estimates assume a warm compile cache.
    guarded("lego_ttp25_s", bench_lego_time_to_psnr, "s", est_s=420.0)
    guarded("ngp_brick_rays_s", lambda: bench_ngp("brick"), "rays/s", est_s=150.0)
    guarded("ngp_vertex_rays_s", lambda: bench_ngp("vertex"), "rays/s", est_s=150.0)
    guarded(
        "kilonerf_pooled_frame_ms",
        lambda: bench_kilonerf_frame(march="pooled"), "ms",
        vs=lambda v: KILONERF_REF_MS / v, est_s=120.0,
    )
    guarded("kilonerf_pooled_parity_db", bench_kilonerf_parity, "dB", est_s=80.0)
    # converged-grid A/B (same compiled programs, new grid data): the
    # payoff case for frame-level ray culling — the warm grid's 6,602
    # fragments defeat it (recorded negative, round 4), a trained-to-25dB
    # grid is the deployment case
    guarded(
        "kilonerf_pooled_conv_frame_ms",
        lambda: bench_kilonerf_frame(march="pooled", grid="converged"), "ms",
        vs=lambda v: KILONERF_REF_MS / v, est_s=30.0,
    )
    guarded(
        "kilonerf_cull_conv_frame_ms",
        lambda: bench_kilonerf_frame(march="pooled", cull=True, grid="converged"),
        "ms", vs=lambda v: KILONERF_REF_MS / v, est_s=60.0,
    )
    guarded(
        "kilonerf_cull_frame_ms",
        lambda: bench_kilonerf_frame(march="pooled", cull=True), "ms",
        vs=lambda v: KILONERF_REF_MS / v, est_s=45.0,
    )
    guarded("mipnerf_rays_s", bench_mipnerf, "rays/s", est_s=100.0)
    guarded("gnr_rays_s", bench_gnr, "rays/s", est_s=150.0)
    guarded("neuralbody_rays_s", bench_neuralbody, "rays/s", est_s=120.0)
    guarded(
        "kilonerf_sphere_frame_ms",
        lambda: bench_kilonerf_frame(march="sphere"), "ms",
        vs=lambda v: KILONERF_REF_MS / v, est_s=100.0,
    )
    guarded(
        "kilonerf_frame_ms", bench_kilonerf_frame, "ms",
        vs=lambda v: KILONERF_REF_MS / v, est_s=120.0,
    )

    emit_json()


if __name__ == "__main__":
    main()

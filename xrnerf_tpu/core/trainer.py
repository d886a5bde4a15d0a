"""Trainer: iter-based train loop with eval workflow, hooks, checkpoints.

Replaces the reference's mmcv Runner + API layer
(``/root/reference/xrnerf/core/runner/base.py``, ``core/apis/train.py:14-68``):
one Trainer covers IterBasedRunner(train) and EpochBasedRunner(val/test)
workflows via ``eval_interval`` slots and the TestHook.

TPU-first:
  - a single jitted ``train_step`` (value_and_grad + optax update) with
    donated state; under a ``jax.sharding.Mesh`` the ray batch is placed
    with ``NamedSharding(P('data'))`` and params replicated — XLA/GSPMD
    inserts the gradient all-reduce over ICI automatically (no NCCL/DDP
    analog, no explicit psum).
  - per-step RNG via ``fold_in(base, step)``: deterministic resume.
  - telemetry: rays/s and step-time are first-class (the reference had
    no profiling at all; SURVEY §5).
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state as ts
from jax.sharding import NamedSharding, PartitionSpec as P

from ..registry import HOOKS
from ..utils import checkpoint as ckpt
from ..utils.logger import get_logger
from .hooks import Hook
from .renderer import render_image as _render_image


def build_lr_schedule(cfg: Dict[str, Any]) -> optax.Schedule:
    """NeRF-style exponential decay (reference: new_lr = lr*0.1^(step/N)),
    optionally with mip-style delayed warmup (``train_hooks.py:55-84``)."""
    lr = float(cfg.get("lr", 5e-4))
    decay_steps = int(cfg.get("lr_decay_steps", 0))
    decay_rate = float(cfg.get("lr_decay_rate", 0.1))
    lr_final = cfg.get("lr_final")
    warmup = int(cfg.get("lr_warmup_steps", 0))
    max_steps = int(cfg.get("max_steps", decay_steps or 1))

    if lr_final is not None:
        # mip-NeRF log-lerp with delayed cosine warmup
        lr_final = float(lr_final)
        delay_mult = float(cfg.get("lr_delay_mult", 0.01))

        def sched(step):
            step = jnp.asarray(step, jnp.float32)
            if warmup > 0:
                delay = delay_mult + (1 - delay_mult) * jnp.sin(
                    0.5 * jnp.pi * jnp.clip(step / warmup, 0, 1)
                )
            else:
                delay = 1.0
            t = jnp.clip(step / max_steps, 0, 1)
            log_lerp = jnp.exp(np.log(lr) * (1 - t) + np.log(lr_final) * t)
            return delay * log_lerp

        return sched
    if decay_steps > 0:
        return optax.exponential_decay(lr, decay_steps, decay_rate)
    return optax.constant_schedule(lr)


def build_optimizer(cfg: Dict[str, Any]) -> optax.GradientTransformation:
    cfg = dict(cfg or {})
    opt_type = cfg.get("type", "adam").lower()
    sched = build_lr_schedule(cfg)
    clip = cfg.get("grad_clip")
    if opt_type == "adam":
        tx = optax.adam(
            sched,
            b1=float(cfg.get("beta1", 0.9)),
            b2=float(cfg.get("beta2", 0.999)),
            eps=float(cfg.get("eps", 1e-8)),
        )
    elif opt_type == "adamw":
        tx = optax.adamw(sched, weight_decay=float(cfg.get("weight_decay", 1e-2)))
    elif opt_type == "sgd":
        tx = optax.sgd(sched, momentum=float(cfg.get("momentum", 0.9)))
    else:
        raise ValueError(f"unknown optimizer {opt_type!r}")
    if clip:
        tx = optax.chain(optax.clip_by_global_norm(float(clip)), tx)
    return tx


class TrainState(ts.TrainState):
    pass


class Trainer:
    def __init__(
        self,
        network,
        dataset,
        optimizer: Dict[str, Any] | None = None,
        work_dir: str = "./work_dir",
        max_iters: int = 200000,
        eval_interval: int = 0,
        ckpt_interval: int = 10000,
        log_interval: int = 100,
        hooks: Optional[List[Hook]] = None,
        mesh: Optional[jax.sharding.Mesh] = None,
        seed: int = 0,
        eval_chunk: int = 8192,
        resume_from: Optional[str] = None,
        load_from: Optional[str] = None,
        ema_decay: float = 0.0,
    ):
        self.network = network
        self.dataset = dataset
        self.work_dir = work_dir
        self.max_iters = max_iters
        self.eval_interval = eval_interval
        self.ckpt_interval = ckpt_interval
        self.log_interval = log_interval
        self.hooks = list(hooks or [])
        self.mesh = mesh
        self.eval_chunk = eval_chunk
        self.ema_decay = ema_decay
        self.logger = get_logger(log_file=f"{work_dir}/log.txt" if work_dir else None)
        self.eval_metrics: Dict[str, float] = {}
        self._stop = False

        self.base_rng = jax.random.PRNGKey(seed)
        opt_cfg = dict(optimizer or {})
        opt_cfg.setdefault("max_steps", max_iters)
        self.tx = build_optimizer(opt_cfg)

        # --- init params from one example batch ---
        example = dataset.train_batch(0)
        init_rng, self.base_rng = jax.random.split(self.base_rng)
        variables = network.init(
            init_rng, _to_jnp(example), rng=jax.random.PRNGKey(0), train=False
        )
        params = variables["params"]

        # Phase-frozen params (e.g. AniNeRF novel_pose trains only its
        # novel-pose bw MLP): mask the optimizer so frozen subtrees get
        # zero updates (replaces the reference's requires_grad toggling).
        filt = (
            network.trainable_filter()
            if hasattr(network, "trainable_filter")
            else None
        )
        if filt is not None:
            from flax import traverse_util

            flat = traverse_util.flatten_dict(params)
            labels = traverse_util.unflatten_dict(
                {k: ("train" if filt("/".join(k)) else "freeze") for k in flat}
            )
            self.tx = optax.multi_transform(
                {"train": self.tx, "freeze": optax.set_to_zero()}, labels
            )

        self.state = TrainState.create(apply_fn=network.apply, params=params, tx=self.tx)
        # EMA must own copies: state.params buffers get donated into the
        # first train step, which would leave aliased EMA leaves deleted.
        self.ema_params = (
            jax.tree_util.tree_map(jnp.array, params) if ema_decay > 0 else None
        )
        self.start_step = 0

        # Auxiliary non-gradient state owned by the network (e.g. the NGP
        # occupancy grid): init_aux/update_aux protocol, refreshed every
        # ``network.aux_interval`` steps and checkpointed alongside params.
        self.has_aux = hasattr(network, "init_aux")
        self.aux = network.init_aux(params, dataset) if self.has_aux else None
        self.aux_interval = int(getattr(network, "aux_interval", 16) or 16)

        if resume_from:
            restored = ckpt.load(resume_from, {"state": self.state, "aux": self.aux})
            self.state, self.aux = restored["state"], restored["aux"]
            self.start_step = int(self.state.step)
            self.logger.info("resumed from %s at step %d", resume_from, self.start_step)
        elif load_from:
            raw = ckpt.load_raw(load_from)
            from flax import serialization

            raw_params = raw["state"]["params"] if "state" in raw else raw["params"]
            params = serialization.from_state_dict(self.state.params, raw_params)
            self.state = self.state.replace(params=params)
            self.logger.info("loaded weights from %s", load_from)

        # --- sharding placement ---
        if mesh is not None:
            self._batch_sharding = NamedSharding(mesh, P("data"))
            self._repl_sharding = NamedSharding(mesh, P())
            # hash-table gradient scatters run shard-local + psum
            from ..ops.pallas.scatter_rows import set_scatter_mesh

            set_scatter_mesh(mesh, "data")
            # Model-axis parameter sharding: networks may expose
            # ``param_spec(path) -> PartitionSpec | None`` (KiloNeRF shards
            # its expert grid, NGP its hash table). The spec is applied by
            # PATH SUFFIX over the whole TrainState so optimizer moments
            # (optax mirrors the params tree) land on the same shards —
            # otherwise every adam update would reshard.
            param_spec = getattr(network, "param_spec", None)
            if param_spec is not None and mesh.shape.get("model", 1) > 1:

                def _place(path, leaf):
                    keys = tuple(
                        str(getattr(p, "key", getattr(p, "name", p))) for p in path
                    )
                    spec = param_spec(keys) if hasattr(leaf, "ndim") else None
                    sh = NamedSharding(mesh, spec) if spec is not None else self._repl_sharding
                    return jax.device_put(leaf, sh)

                self.state = jax.tree_util.tree_map_with_path(_place, self.state)
            else:
                self.state = jax.device_put(self.state, self._repl_sharding)
        else:
            self._batch_sharding = None
            self._repl_sharding = None

        # --- jitted step + stable eval apply ---
        network_loss = network.loss
        has_aux = self.has_aux

        has_param_loss = hasattr(network, "param_loss")

        def _train_step(state: TrainState, batch, rng, aux):
            def loss_fn(params):
                kw = {"aux": aux} if has_aux else {}
                outputs = state.apply_fn({"params": params}, batch, rng=rng, train=True, **kw)
                loss, logs = network_loss(outputs, batch)
                if has_param_loss:
                    reg = network.param_loss(params)
                    loss = loss + reg
                    logs = {**logs, "param_reg": reg, "loss": loss}
                return loss, logs

            (loss, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
            new_state = state.apply_gradients(grads=grads)
            return new_state, logs

        self._train_step = jax.jit(_train_step, donate_argnums=(0,))
        self._aux_update = (
            jax.jit(network.update_aux, donate_argnums=(1,))
            if self.has_aux and hasattr(network, "update_aux")
            else None
        )

        if ema_decay > 0:

            def _ema_update(ema, params):
                return jax.tree_util.tree_map(
                    lambda e, p: ema_decay * e + (1 - ema_decay) * p, ema, params
                )

            self._ema_update = jax.jit(_ema_update, donate_argnums=(0,))

        if self.has_aux:

            def _eval_apply(params_and_aux, batch, rng):
                params, aux = params_and_aux
                return network.apply(
                    {"params": params}, batch, rng=None, train=False, aux=aux
                )

        else:

            def _eval_apply(params, batch, rng):
                return network.apply({"params": params}, batch, rng=None, train=False)

        self._eval_apply = _eval_apply

    # ------------------------------------------------------------------
    def request_stop(self):
        self._stop = True

    @property
    def eval_params(self):
        return self.ema_params if self.ema_params is not None else self.state.params

    def render_image(self, rays: Dict[str, np.ndarray], H: int, W: int):
        p = (self.eval_params, self.aux) if self.has_aux else self.eval_params
        return _render_image(
            self._eval_apply, p, rays, H, W, chunk=self.eval_chunk,
            mesh=self.mesh,
        )

    def _put_batch(self, batch: Dict[str, np.ndarray]):
        """Rays shard along the data axis; ``ctx_*`` keys (per-item context
        like SMPL vertices or frame ids) and scalars replicate."""
        batch = _to_jnp(batch)
        if self._batch_sharding is not None:
            batch = {
                k: jax.device_put(
                    v,
                    self._repl_sharding
                    if (k.startswith("ctx_") or v.ndim == 0)
                    else self._batch_sharding,
                )
                for k, v in batch.items()
            }
        return batch

    # ------------------------------------------------------------------
    def run(self):
        host_id = jax.process_index()
        num_hosts = jax.process_count()
        for h in self.hooks:
            h.on_run_begin(self)

        window_logs: Dict[str, list] = {}
        t_window = time.perf_counter()

        from .prefetch import BatchPrefetcher

        prefetcher = BatchPrefetcher(
            fetch=lambda s: self.dataset.train_batch(s, host_id, num_hosts),
            put=self._put_batch,
            start_step=self.start_step,
            max_steps=self.max_iters,
        )

        step = self.start_step
        while step < self.max_iters and not self._stop:
            if self._aux_update is not None and step % self.aux_interval == 0:
                # separate fold_in stream from the train-step rng (offset
                # by 2^31 keeps it in fold_in's uint32 domain)
                self.aux = self._aux_update(
                    self.state.params,
                    self.aux,
                    jnp.asarray(step),
                    jax.random.fold_in(self.base_rng, 2**31 + step),
                )
            batch = prefetcher.get(step)
            rng = jax.random.fold_in(self.base_rng, step)
            self.state, logs = self._train_step(self.state, batch, rng, self.aux)
            if self.ema_params is not None:
                self.ema_params = self._ema_update(self.ema_params, self.state.params)
            step += 1

            for k, v in logs.items():
                window_logs.setdefault(k, []).append(v)

            if step % self.log_interval == 0:
                # one host sync per window only
                vals = {k: float(np.mean(jax.device_get(v))) for k, v in window_logs.items()}
                dt = time.perf_counter() - t_window
                # N_rand may move between buckets (SampleBudgetHook)
                rays_s = self.dataset.N_rand * num_hosts * self.log_interval / dt
                self.logger.info(
                    "iter %d/%d  %s  %.0f rays/s  %.1f ms/it",
                    step,
                    self.max_iters,
                    "  ".join(f"{k} {v:.4f}" for k, v in vals.items()),
                    rays_s,
                    1000 * dt / self.log_interval,
                )
                self.last_logs = {**vals, "rays_per_sec": rays_s}
                window_logs = {}
                t_window = time.perf_counter()

            for h in self.hooks:
                h.after_step(self, step, logs)

            if self.eval_interval and step % self.eval_interval == 0:
                for h in self.hooks:
                    h.on_eval(self, step)

            if self.ckpt_interval and step % self.ckpt_interval == 0:
                ckpt.save(self.work_dir, step, {"state": self.state, "aux": self.aux})

        prefetcher.close()
        if self.ckpt_interval:
            ckpt.save(self.work_dir, step, {"state": self.state, "aux": self.aux})
        for h in self.hooks:
            h.on_run_end(self)
        return self.state


def _to_jnp(batch: Dict[str, np.ndarray]):
    return {k: jnp.asarray(v) for k, v in batch.items()}


def build_hooks(cfgs: Optional[List[Dict[str, Any]]]) -> List[Hook]:
    return [HOOKS.build(c) for c in (cfgs or [])]

"""KiloNeRF distillation driver: kd-tree node discovery + per-node
student fitting against a frozen teacher.

Parity targets in the reference (the whole phase-2 machinery):
  - ``KiloNerfNodeDataset`` (``xrnerf/datasets/kilonerf_node_dataset.py:25-100``):
    node frontier deque, resume from checkpoint, random example
    points/dirs per node domain
  - ``KiloNerfDistillTrainRunner`` + ``DistllCycleHook``
    (``core/runner/kilonerf_runner.py:11-69``,
    ``core/hooks/distill_cycle_hook.py:16-99``): rebuild dataset/model/
    optimizer per node batch, lower lr for saturated nodes
  - ``SaveDistillResultsHook`` (``core/hooks/save_distill_results_hook.py``):
    mse/mae/mape/quantile_se error metrics (:44-113), RGB-sigmoid
    saturation detection (:59-77), kd-tree splitting — random /
    longest-axis / equal-error-split (:24-41, :286-360), fitted-node
    bookkeeping + checkpoint of the whole tree (:380-415)

TPU-first: the tree walk is host python (inherently sequential, cheap);
each node batch is fitted by ONE jitted train step over a fixed-size
``[max_num_networks, E, ...]`` example tensor — node batches are padded
to a static network count so the whole discovery phase compiles exactly
once. Teacher targets are produced by a jitted frozen-teacher call.
"""

from __future__ import annotations

import os
import pickle
from collections import deque
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


@dataclass
class Node:
    """kd-tree node (utils/data_helper.py Node attribute bag)."""

    domain_min: np.ndarray
    domain_max: np.ndarray
    split_axis: int = -1
    split_threshold: float = 0.0
    leq_child: Optional["Node"] = None
    gt_child: Optional["Node"] = None
    params: Optional[Dict] = None  # fitted single-network params
    best_error: Optional[Dict] = None


def calculate_volume(dmin, dmax) -> float:
    return float(np.prod(np.asarray(dmax) - np.asarray(dmin)))


def nodes_fixed_resolution(res: Sequence[int], dmin, dmax) -> List[Node]:
    """Initial uniform grid of root nodes (kilonerf_node_dataset.py
    get_nodes_fixed_resolution)."""
    res = np.asarray(res)
    dmin = np.asarray(dmin, np.float32)
    dmax = np.asarray(dmax, np.float32)
    size = (dmax - dmin) / res
    out = []
    for i in range(res[0]):
        for j in range(res[1]):
            for k in range(res[2]):
                lo = dmin + size * np.array([i, j, k])
                out.append(Node(domain_min=lo, domain_max=lo + size))
    return out


def error_metrics(
    out: np.ndarray,  # [N, E, 4] predicted rgb+sigma (post-activation)
    tgt: np.ndarray,  # [N, E, 4]
    quantile: float = 0.99,
) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray], np.ndarray]:
    """-> (per-network errors {mse,mae,mape,quantile_se}, per-point mse,
    saturation flags). Port of calculate_error_metrics (:44-113)."""
    se = (out - tgt) ** 2
    ae = np.abs(out - tgt)
    mape = ae / (np.abs(tgt) + 0.1)

    per_net = {
        "mse": se.mean((1, 2)),
        "mae": ae.mean((1, 2)),
        "mape": mape.mean((1, 2)),
    }
    se_pp = se.mean(2)  # [N, E]
    qi = int(se_pp.shape[1] * quantile)
    per_net["quantile_se"] = np.sort(se_pp, axis=1)[:, min(qi, se_pp.shape[1] - 1)]

    tol = 1e-3
    rgb, trgb = out[..., :3], tgt[..., :3]
    close0 = (np.abs(rgb) < tol).all(-1)
    gt0 = (np.abs(trgb) < tol).all(-1)
    close1 = (np.abs(rgb - 1) < tol).all(-1)
    gt1 = (np.abs(trgb - 1) < tol).all(-1)
    saturation = (close0 & ~gt0).any(-1) | (close1 & ~gt1).any(-1)
    return per_net, se_pp, saturation


def equal_error_split_threshold(pts, errors, axis) -> float:
    """Split coordinate with half the per-point error mass on each side
    (get_equal_error_split_threshold, :24-41)."""
    order = np.argsort(pts[:, axis])
    csum = np.cumsum(errors[order])
    idx = int(np.searchsorted(csum, csum[-1] / 2.0))
    return float(pts[order][min(idx, len(order) - 1), axis])


class DistillDriver:
    """Discovery-phase driver. ``teacher_fn(pts [B,3], dirs [B,3]) ->
    (rgb [B,3], sigma [B])`` post-activation, jit-compatible."""

    def __init__(
        self,
        teacher_fn: Callable,
        domain_min: Sequence[float],
        domain_max: Sequence[float],
        work_dir: str = "",
        fixed_resolution: Optional[Sequence[int]] = None,
        max_num_networks: int = 128,
        num_examples_per_network: int = 1024,
        test_examples_per_network: int = 256,
        iters_per_batch: int = 250,
        lr: float = 2e-3,
        saturation_lr: float = 1e-4,
        max_error: float = 1e-4,
        test_error_metric: str = "quantile_se",
        tree_type: str = "kdtree_longest",
        termination_volume: float = 1.0,
        hidden: int = 32,
        n_hidden_layers: int = 2,
        multires: int = 10,
        multires_dirs: int = 4,
        seed: int = 0,
    ):
        from ..models.fields.kilonerf_field import GroupedMultiMLP

        self.teacher = jax.jit(teacher_fn)
        self.work_dir = work_dir
        self.dmin = np.asarray(domain_min, np.float32)
        self.dmax = np.asarray(domain_max, np.float32)
        self.N = int(max_num_networks)
        self.E = int(num_examples_per_network)
        self.E_test = int(test_examples_per_network)
        self.iters = int(iters_per_batch)
        self.lr, self.saturation_lr = lr, saturation_lr
        self.max_error = max_error
        self.metric = test_error_metric
        self.tree_type = tree_type
        self.termination_volume = termination_volume
        self.rng = np.random.RandomState(seed)

        self.student = GroupedMultiMLP(
            n_nets=self.N,
            hidden=hidden,
            n_hidden_layers=n_hidden_layers,
            multires=multires,
            multires_dirs=multires_dirs,
        )
        self._build_step()

        ckpt = os.path.join(work_dir, "distill_checkpoint.pkl") if work_dir else ""
        if ckpt and os.path.exists(ckpt):
            with open(ckpt, "rb") as fh:
                self.cp = pickle.load(fh)
        else:
            roots = (
                nodes_fixed_resolution(fixed_resolution, self.dmin, self.dmax)
                if fixed_resolution is not None
                else [Node(self.dmin.copy(), self.dmax.copy())]
            )
            self.cp = {
                "root_nodes": roots,
                "nodes_to_process": deque(roots),
                "saturated_nodes_to_process": deque(),
                "fitted_volume": 0.0,
                "total_volume": calculate_volume(self.dmin, self.dmax),
                "num_networks_fitted": 0,
            }

    # ------------------------------------------------------------------
    def _build_step(self):
        student = self.student

        def loss_fn(params, pts, dirs, tgt):
            rgb_raw, sigma_raw = student.apply({"params": params}, pts, dirs)
            pred = jnp.concatenate(
                [jax.nn.sigmoid(rgb_raw), jax.nn.relu(sigma_raw)[..., None]], -1
            )
            per_net = jnp.mean((pred - tgt) ** 2, axis=(1, 2))
            return jnp.sum(per_net), per_net

        @jax.jit
        def train_step(params, opt_state, lr_scale, pts, dirs, tgt):
            (loss, per_net), g = jax.value_and_grad(loss_fn, has_aux=True)(
                params, pts, dirs, tgt
            )
            upd, opt_state = self.tx.update(g, opt_state, params)
            upd = jax.tree_util.tree_map(
                # per-network lr scaling (saturated nodes retrain slower):
                # weights are [N, ...] so scale broadcasts on axis 0
                lambda u: u * lr_scale.reshape((-1,) + (1,) * (u.ndim - 1)),
                upd,
            )
            return optax.apply_updates(params, upd), opt_state, loss, per_net

        @jax.jit
        def predict(params, pts, dirs):
            rgb_raw, sigma_raw = student.apply({"params": params}, pts, dirs)
            return jnp.concatenate(
                [jax.nn.sigmoid(rgb_raw), jax.nn.relu(sigma_raw)[..., None]], -1
            )

        self.tx = optax.adam(self.lr)
        self._train_step = train_step
        self._predict = predict

    # ------------------------------------------------------------------
    def _examples(self, batch: List[Node], n: int):
        """Random points in each node's domain + unit dirs + teacher
        targets, padded to [self.N, n, ...]."""
        pts = np.zeros((self.N, n, 3), np.float32)
        for i, node in enumerate(batch):
            pts[i] = self.rng.uniform(
                node.domain_min, node.domain_max, (n, 3)
            ).astype(np.float32)
        dirs = self.rng.randn(self.N, n, 3).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        rgb, sigma = self.teacher(
            jnp.asarray(pts.reshape(-1, 3)), jnp.asarray(dirs.reshape(-1, 3))
        )
        tgt = np.concatenate(
            [np.asarray(rgb), np.asarray(sigma)[:, None]], -1
        ).reshape(self.N, n, 4)
        # node-local [-1,1] coords (global_to_local)
        local = np.zeros_like(pts)
        for i, node in enumerate(batch):
            span = np.maximum(node.domain_max - node.domain_min, 1e-9)
            local[i] = ((pts[i] - node.domain_min) / span) * 2.0 - 1.0
        return pts, local, dirs, tgt

    def _pop_batch(self) -> Tuple[List[Node], bool]:
        q = self.cp["nodes_to_process"]
        saturated = False
        if not q:
            q = self.cp["saturated_nodes_to_process"]
            saturated = True
        batch = [q.popleft() for _ in range(min(self.N, len(q)))]
        return batch, saturated

    # ------------------------------------------------------------------
    def run_cycle(self, log=print) -> bool:
        """Fit one node batch; split/accept nodes. Returns True while
        nodes remain."""
        cp = self.cp
        if not cp["nodes_to_process"] and not cp["saturated_nodes_to_process"]:
            return False
        if cp["fitted_volume"] / cp["total_volume"] >= self.termination_volume:
            return False

        batch, from_saturated = self._pop_batch()
        n_active = len(batch)
        pts, local, dirs, tgt = self._examples(batch, self.E)
        t_pts, t_local, t_dirs, t_tgt = self._examples(batch, self.E_test)

        params = self.student.init(
            jax.random.PRNGKey(self.rng.randint(2**31)),
            jnp.asarray(local),
            jnp.asarray(dirs),
        )["params"]
        opt_state = self.tx.init(params)
        lr_scale = np.ones((self.N,), np.float32)
        if from_saturated:
            lr_scale[:] = self.saturation_lr / self.lr

        best = {m: np.full((self.N,), np.inf) for m in ("mse", "mae", "mape", "quantile_se")}
        jl = jnp.asarray(local)
        jd = jnp.asarray(dirs)
        jt = jnp.asarray(tgt)
        for it in range(self.iters):
            params, opt_state, loss, per_net = self._train_step(
                params, opt_state, jnp.asarray(lr_scale), jl, jd, jt
            )
        pred = np.asarray(self._predict(params, jnp.asarray(t_local), jnp.asarray(t_dirs)))
        per_net, se_pp, saturation = error_metrics(pred, t_tgt)
        for m in best:
            best[m] = np.minimum(best[m], per_net[m])

        fitted = 0
        for i, node in enumerate(batch):
            err = best[self.metric][i]
            split_further = err > self.max_error
            if (
                cp["fitted_volume"] / cp["total_volume"] >= self.termination_volume
            ):
                split_further = False
            if split_further:
                if saturation[i] and not from_saturated:
                    cp["saturated_nodes_to_process"].append(node)
                    continue
                if self.tree_type == "kdtree_random":
                    axis = self.rng.randint(3)
                else:
                    axis = int(np.argmax(node.domain_max - node.domain_min))
                node.split_axis = axis
                if self.tree_type == "kdtree_equal_error_split":
                    node.split_threshold = equal_error_split_threshold(
                        t_pts[i], se_pp[i], axis
                    )
                else:
                    node.split_threshold = float(
                        node.domain_min[axis]
                        + (node.domain_max[axis] - node.domain_min[axis]) / 2
                    )
                leq = Node(node.domain_min.copy(), node.domain_max.copy())
                leq.domain_max[axis] = node.split_threshold
                gt = Node(node.domain_min.copy(), node.domain_max.copy())
                gt.domain_min[axis] = node.split_threshold
                node.leq_child, node.gt_child = leq, gt
                target_q = (
                    cp["saturated_nodes_to_process"]
                    if from_saturated
                    else cp["nodes_to_process"]
                )
                target_q.append(leq)
                target_q.append(gt)
            else:
                fitted += 1
                cp["fitted_volume"] += calculate_volume(
                    node.domain_min, node.domain_max
                )
                node.best_error = {m: float(best[m][i]) for m in best}
                node.params = jax.tree_util.tree_map(
                    lambda a, i=i: np.asarray(a[i]), params
                )
        cp["num_networks_fitted"] += fitted

        log(
            f"distill cycle: {fitted}/{n_active} fitted, "
            f"{int(saturation[:n_active].sum())} saturated, "
            f"volume {cp['fitted_volume'] / cp['total_volume']:.1%}, "
            f"queue {len(cp['nodes_to_process'])}"
            f"+{len(cp['saturated_nodes_to_process'])}sat"
        )
        if self.work_dir:
            with open(
                os.path.join(self.work_dir, "distill_checkpoint.pkl"), "wb"
            ) as fh:
                pickle.dump(cp, fh)
        return bool(cp["nodes_to_process"] or cp["saturated_nodes_to_process"])

    def run(self, max_cycles: int = 10000, log=print):
        c = 0
        while self.run_cycle(log=log) and c < max_cycles:
            c += 1

    # ------------------------------------------------------------------
    def lookup(self, p: np.ndarray) -> Optional[Node]:
        """Point -> fitted leaf node via the kd-tree."""
        for root in self.cp["root_nodes"]:
            if np.all(p >= root.domain_min) and np.all(p <= root.domain_max):
                node = root
                while node.leq_child is not None:
                    node = (
                        node.leq_child
                        if p[node.split_axis] <= node.split_threshold
                        else node.gt_child
                    )
                return node
        return None

    def assemble_grid(self, resolution: Sequence[int]) -> Dict[str, np.ndarray]:
        """Stack fitted per-node params onto a uniform [prod(res)]-network
        grid for the finetune field (KiloNerfMLP.init_mlp parity,
        kilonerf_mlp.py:45-128): each cell center queries the kd-tree."""
        res = np.asarray(resolution)
        cell = (self.dmax - self.dmin) / res
        leaves = None
        stacked: Dict[str, list] = {}
        for i in range(res[0]):
            for j in range(res[1]):
                for k in range(res[2]):
                    c = self.dmin + cell * (np.array([i, j, k]) + 0.5)
                    node = self.lookup(c)
                    p = node.params if node is not None and node.params else None
                    if p is None:
                        p = jax.tree_util.tree_map(np.zeros_like, self._example_params())
                    flat = {
                        "/".join(str(getattr(x, "key", x)) for x in kk): v
                        for kk, v in jax.tree_util.tree_flatten_with_path(p)[0]
                    }
                    if leaves is None:
                        leaves = sorted(flat)
                        stacked = {m: [] for m in leaves}
                    for m in leaves:
                        stacked[m].append(flat[m])
        return {m: np.stack(v) for m, v in stacked.items()}

    def _example_params(self):
        for root in self.cp["root_nodes"]:
            stack = [root]
            while stack:
                n = stack.pop()
                if n.params is not None:
                    return n.params
                if n.leq_child is not None:
                    stack += [n.leq_child, n.gt_child]
        raise RuntimeError("no fitted nodes")

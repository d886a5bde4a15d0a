"""Typed hook protocol + standard hooks for the Trainer.

Replaces the reference's mmcv Hook zoo
(``/root/reference/xrnerf/core/hooks/``): ValidateHook/TestHook/
SaveSpiralHook/CalElapsedTimeHook/OccupationHook. Hooks receive the
Trainer (read params, dataset, work_dir) at well-defined slots; they never
mutate jitted state — anything that must influence the compiled step goes
through explicit Trainer APIs instead (the reference mutated models and
dataloaders from hooks, which we deliberately avoid).
"""

from __future__ import annotations

import json
import os
import time
from typing import TYPE_CHECKING, Dict, List

import numpy as np

from ..registry import HOOKS
from ..utils.logger import get_logger
from ..utils.metrics import to8b

if TYPE_CHECKING:  # pragma: no cover
    from .trainer import Trainer


class Hook:
    def on_run_begin(self, tr: "Trainer") -> None: ...

    def after_step(self, tr: "Trainer", step: int, logs: Dict[str, float]) -> None: ...

    def on_eval(self, tr: "Trainer", step: int) -> None: ...

    def on_run_end(self, tr: "Trainer") -> None: ...


@HOOKS.register
class ValidateHook(Hook):
    """Render val images at eval slots; PSNR/SSIM; optional side-by-side pngs.

    Reference: ``validation_hooks.py:96-151``. Runs on process 0 only.
    """

    def __init__(self, save_img: bool = True, max_images: int = -1):
        self.save_img = save_img
        self.max_images = max_images

    def on_eval(self, tr: "Trainer", step: int) -> None:
        import jax

        if jax.process_index() != 0:
            return
        from ..utils.metrics import psnr as jpsnr
        from ..utils.metrics import ssim as jssim

        ds = tr.dataset
        idxs = ds.i_val if len(ds.i_val) else ds.i_test
        if self.max_images > 0:
            idxs = idxs[: self.max_images]
        psnrs, ssims = [], []
        out_dir = os.path.join(tr.work_dir, f"val_{step}")
        for n, i in enumerate(idxs):
            rays, gt = ds.eval_item(int(i))
            ret = tr.render_image(rays, gt.shape[0], gt.shape[1])
            psnrs.append(float(jpsnr(ret["rgb"], gt)))
            ssims.append(float(jssim(ret["rgb"], gt)))
            if self.save_img:
                os.makedirs(out_dir, exist_ok=True)
                import imageio.v2 as imageio

                side = np.concatenate([to8b(ret["rgb"]), to8b(gt)], axis=1)
                imageio.imwrite(os.path.join(out_dir, f"val_{n}.png"), side)
        logger = get_logger()
        logger.info(
            "[eval %d] val PSNR %.3f SSIM %.4f (%d imgs)",
            step, float(np.mean(psnrs)), float(np.mean(ssims)), len(idxs),
        )
        tr.eval_metrics = {"psnr": float(np.mean(psnrs)), "ssim": float(np.mean(ssims))}


@HOOKS.register
class TestHook(Hook):
    """Aggregate test-set metrics + json dump at run end.

    Reference: ``test_hooks.py:14-94`` (incl. per-scale accumulation for
    mip multiscale via ``idx % ndown``).
    """

    def __init__(self, save_img: bool = True, ndown: int = 1):
        self.save_img = save_img
        self.ndown = ndown

    def on_run_end(self, tr: "Trainer") -> None:
        import jax

        if jax.process_index() != 0:
            return
        from ..utils.metrics import psnr as jpsnr
        from ..utils.metrics import ssim as jssim

        ds = tr.dataset
        per_scale: Dict[int, List[float]] = {i: [] for i in range(self.ndown)}
        per_scale_ssim: Dict[int, List[float]] = {i: [] for i in range(self.ndown)}
        out_dir = os.path.join(tr.work_dir, "test")
        os.makedirs(out_dir, exist_ok=True)
        for n, i in enumerate(ds.i_test):
            rays, gt = ds.eval_item(int(i))
            ret = tr.render_image(rays, gt.shape[0], gt.shape[1])
            s = n % self.ndown
            per_scale[s].append(float(jpsnr(ret["rgb"], gt)))
            per_scale_ssim[s].append(float(jssim(ret["rgb"], gt)))
            if self.save_img:
                import imageio.v2 as imageio

                imageio.imwrite(os.path.join(out_dir, f"test_{n}.png"), to8b(ret["rgb"]))
        results = {
            "psnr": {s: float(np.mean(v)) for s, v in per_scale.items() if v},
            "ssim": {s: float(np.mean(v)) for s, v in per_scale_ssim.items() if v},
        }
        with open(os.path.join(out_dir, "test_results.json"), "w") as f:
            json.dump(results, f, indent=2)
        get_logger().info("[test] %s", results)
        tr.eval_metrics = results


@HOOKS.register
class SaveSpiralHook(Hook):
    """Render the spiral/orbit path to an mp4 (gif fallback) at eval slots.

    Reference: ``validation_hooks.py:25-92``.
    """

    def __init__(self, n_frames: int = 0, fps: int = 20):
        self.n_frames = n_frames
        self.fps = fps

    def on_eval(self, tr: "Trainer", step: int) -> None:
        import jax

        if jax.process_index() != 0:
            return
        ds = tr.dataset
        poses = ds.render_poses
        if self.n_frames > 0:
            poses = poses[: self.n_frames]
        frames = []
        for pose in poses:
            rays, hw = ds.spiral_item(np.asarray(pose))
            ret = tr.render_image(rays, hw[0], hw[1])
            frames.append(to8b(ret["rgb"]))
        out = os.path.join(tr.work_dir, f"spiral_{step}")
        import imageio.v2 as imageio

        try:
            imageio.mimwrite(out + ".mp4", frames, fps=self.fps, quality=8)
        except Exception:
            imageio.mimwrite(out + ".gif", frames, duration=1000 // self.fps)


@HOOKS.register
class OccupationHook(Hook):
    """Cooperative kill switch: stop when the marker dir disappears.

    Reference: ``train_hooks.py:27-51``.
    """

    def __init__(self, marker: str = "delete_me_to_stop"):
        self.marker = marker

    def on_run_begin(self, tr: "Trainer") -> None:
        os.makedirs(os.path.join(tr.work_dir, self.marker), exist_ok=True)

    def after_step(self, tr: "Trainer", step: int, logs) -> None:
        if not os.path.isdir(os.path.join(tr.work_dir, self.marker)):
            get_logger().info("kill-switch dir removed; stopping at step %d", step)
            tr.request_stop()


@HOOKS.register
class ElapsedTimeHook(Hook):
    """Average full-image render latency (the reference's CalElapsedTimeHook,
    ``validation_hooks.py:155-177``) — source of ms/frame benchmarks."""

    def __init__(self, n_images: int = 3):
        self.n_images = n_images

    def on_eval(self, tr: "Trainer", step: int) -> None:
        import jax

        if jax.process_index() != 0:
            return
        ds = tr.dataset
        idxs = (ds.i_test if len(ds.i_test) else ds.i_val)[: self.n_images]
        times = []
        for i in idxs:
            rays, gt = ds.eval_item(int(i))
            t0 = time.perf_counter()
            tr.render_image(rays, gt.shape[0], gt.shape[1])
            times.append((time.perf_counter() - t0) * 1000)
        if len(times) > 1:
            times = times[1:]  # drop warmup/compile
        get_logger().info("[eval %d] render %.1f ms/frame", step, float(np.mean(times)))
        tr.eval_metrics = {**getattr(tr, "eval_metrics", {}), "ms_per_frame": float(np.mean(times))}


@HOOKS.register
class ProfileHook(Hook):
    """Capture a jax.profiler trace for a step window (the reference has
    no profiling at all — SURVEY §5; here step-time/rays/s plus an XLA
    trace are first-class). View with TensorBoard or Perfetto."""

    def __init__(self, start_step: int = 50, num_steps: int = 5, logdir: str = ""):
        self.start_step = start_step
        self.num_steps = num_steps
        self.logdir = logdir
        self._active = False

    def after_step(self, tr: "Trainer", step: int, logs) -> None:
        import jax

        if step == self.start_step and not self._active:
            logdir = self.logdir or os.path.join(tr.work_dir, "profile")
            os.makedirs(logdir, exist_ok=True)
            jax.profiler.start_trace(logdir)
            self._active = True
        elif self._active and step >= self.start_step + self.num_steps:
            jax.block_until_ready(tr.state.params)
            jax.profiler.stop_trace()
            self._active = False
            get_logger().info(
                "[profile] trace for steps %d-%d written", self.start_step, step
            )

    def on_run_end(self, tr: "Trainer") -> None:
        if self._active:
            import jax

            jax.profiler.stop_trace()
            self._active = False


@HOOKS.register
class SampleBudgetHook(Hook):
    """Bucketed static-shape replacement for the reference's dynamic
    NGP batch adaptation (``ngp_grid_sampler.py:268-281``: resize
    n_rays_per_batch so live samples/step hit target_batch_size=2^18).

    Shapes must stay static under jit, so instead of continuous
    resizing the ray batch moves between a fixed set of power-of-two
    buckets based on the EMA of the network's logged ``live_frac``
    (live samples / (rays * n_keep)). Recompiles are bounded by
    len(buckets); each bucket's step stays in the jit cache.
    """

    def __init__(
        self,
        target_samples: int = 2**18,
        buckets=(1024, 2048, 4096, 8192, 16384),
        ema: float = 0.8,
    ):
        self.target = int(target_samples)
        self.buckets = tuple(sorted(int(b) for b in buckets))
        self.ema = float(ema)
        self._frac = None

    def pick(self, n_keep: int) -> int:
        """Largest bucket whose full-budget sample count stays within
        target (the reference also rounds down, :268-281)."""
        frac = max(self._frac if self._frac is not None else 1.0, 1e-3)
        needed = self.target / (frac * max(n_keep, 1))
        fitting = [b for b in self.buckets if b <= needed]
        return fitting[-1] if fitting else self.buckets[0]

    def after_step(self, tr: "Trainer", step: int, logs) -> None:
        if step % tr.log_interval != 0:
            return
        live = tr.last_logs.get("live_frac") if tr.last_logs else None
        if live is None:
            return
        self._frac = (
            live
            if self._frac is None
            else self.ema * self._frac + (1 - self.ema) * live
        )
        n_keep = int(getattr(tr.network, "n_keep", 0) or 0)
        if n_keep <= 0 or not hasattr(tr.dataset, "N_rand"):
            return
        chosen = self.pick(n_keep)
        if chosen != tr.dataset.N_rand:
            tr.logger.info(
                "SampleBudgetHook: live_frac %.3f -> N_rand %d -> %d",
                self._frac, tr.dataset.N_rand, chosen,
            )
            tr.dataset.N_rand = chosen

"""Device mesh + sharding helpers (GSPMD scale-out).

TPU-native replacement for the reference's NCCL/DDP stack
(``/root/reference/xrnerf/core/apis/train.py:28-36``,
``xrnerf/datasets/samplers/distributed_sampler.py``): one global
``jax.sharding.Mesh`` with a ``data`` axis (rays) and an optional
``model`` axis (spatially sharded KiloNeRF MLP grids / NGP hash tables).
Gradient all-reduce is inserted by XLA from sharding annotations — there
are no explicit collectives in the training code.

Multi-host: call :func:`init_distributed` once per host before mesh
creation; host-local data loading keys off ``jax.process_index()``.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def init_distributed(coordinator: Optional[str] = None, **kw) -> None:
    """Multi-host bring-up; no-op on single host setups.

    Must run before anything touches the XLA backend, so the coordinator
    check comes first — ``jax.process_count()`` itself initializes the
    backend and would poison ``jax.distributed.initialize``.
    """
    if coordinator is not None:
        jax.distributed.initialize(coordinator_address=coordinator, **kw)
    elif jax.process_count() > 1:  # env-configured (TPU pod) bring-up
        jax.distributed.initialize(**kw)


def make_mesh(
    n_model: int = 1, devices: Optional[list] = None, allow_fewer: bool = True
) -> Mesh:
    """2-D ('data','model') mesh over all devices.

    ``n_model=1`` degenerates to pure data parallelism; larger values carve
    a model axis (KiloNeRF grid shards / hash-table shards) out of the
    device set, keeping the model axis innermost so its collectives ride
    the fastest ICI links.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % n_model != 0:
        if not allow_fewer:
            raise ValueError(f"{n} devices not divisible by n_model={n_model}")
        n_model = 1
    arr = np.asarray(devices).reshape(n // n_model, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Rays sharded along the data axis (leading dim)."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def model_sharding(mesh: Mesh, axis: int = 0) -> NamedSharding:
    """Shard a parameter's ``axis`` (e.g. KiloNeRF's network dim) on model."""
    spec = [None] * (axis + 1)
    spec[axis] = MODEL_AXIS
    return NamedSharding(mesh, P(*spec))


def shard_batch(batch: Dict[str, np.ndarray], mesh: Mesh) -> Dict[str, jax.Array]:
    sh = batch_sharding(mesh)
    return {k: jax.device_put(jax.numpy.asarray(v), sh) for k, v in batch.items()}


def pad_to_multiple(batch: Dict[str, np.ndarray], multiple: int) -> Dict[str, np.ndarray]:
    """Pad leading dim so it divides the data axis (eval-time helper)."""
    n = next(iter(batch.values())).shape[0]
    pad = (-n) % multiple
    if pad == 0:
        return batch
    return {
        k: np.concatenate([v, np.repeat(v[-1:], pad, axis=0)], axis=0)
        for k, v in batch.items()
    }

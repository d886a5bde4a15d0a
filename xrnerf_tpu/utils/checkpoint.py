"""Checkpoint save/restore for pytrees (params + optimizer state + step).

Replaces mmcv's CheckpointHook/`runner.resume` pair
(``/root/reference/xrnerf/core/apis/train.py:61-64``): ``save``/``load``
round-trip a full TrainState (resume), while ``load_params`` pulls weights
only (the reference's ``load_from``). Format: flax msgpack of host numpy
arrays — no pickle, so checkpoints are portable across code revisions.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import jax
import numpy as np
from flax import serialization

_CKPT_RE = re.compile(r"^ckpt_(\d+)\.msgpack$")


def _to_host(tree: Any) -> Any:
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save(work_dir: str, step: int, state: Any, keep: int = 3) -> str:
    """Serialize ``state`` (any pytree) to ``work_dir/ckpt_{step}.msgpack``.

    Only jax process 0 writes; other hosts no-op (reference: rank-0-only io).
    """
    if jax.process_index() != 0:
        return ""
    os.makedirs(work_dir, exist_ok=True)
    path = os.path.join(work_dir, f"ckpt_{step}.msgpack")
    # to_state_dict turns struct dataclasses (TrainState, optax states)
    # into plain nested dicts that msgpack can handle.
    data = serialization.msgpack_serialize(
        serialization.to_state_dict(_to_host(state))
    )
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)
    _cleanup(work_dir, keep)
    return path


def _cleanup(work_dir: str, keep: int) -> None:
    steps = sorted(all_steps(work_dir))
    for s in steps[:-keep] if keep > 0 else []:
        try:
            os.remove(os.path.join(work_dir, f"ckpt_{s}.msgpack"))
        except OSError:
            pass


def all_steps(work_dir: str) -> list[int]:
    if not os.path.isdir(work_dir):
        return []
    out = []
    for fn in os.listdir(work_dir):
        m = _CKPT_RE.match(fn)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def latest_path(work_dir: str) -> Optional[str]:
    steps = all_steps(work_dir)
    if not steps:
        return None
    return os.path.join(work_dir, f"ckpt_{steps[-1]}.msgpack")


def load(path: str, target: Any) -> Any:
    """Restore a pytree with the same structure as ``target``."""
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    return serialization.from_state_dict(target, raw)


def load_raw(path: str) -> Any:
    """Restore as plain nested dicts (no target structure needed)."""
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())

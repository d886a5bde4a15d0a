"""Network interface shared by all methods.

The reference's abstract base (``/root/reference/xrnerf/models/networks/base.py:10-37``)
prescribes imperative ``train_step/val_step/test_step``. TPU-first, the
contract is functional instead:

  - a network is a ``flax.linen.Module`` whose ``__call__(batch, rng, train)``
    maps a ray batch dict to an output dict of maps (``rgb``, ``acc``, ...)
  - ``loss(outputs, batch) -> (loss, log_vars)`` is a pure function of those
    outputs (no params) so the trainer can build one jitted
    value_and_grad step per method
  - eval/test rendering reuses ``__call__`` under chunked vmap-free scans
    driven by the Trainer (see core/renderer.py)

``train=True`` enables stochastic parts (stratified jitter, density noise);
``train=False`` must be deterministic given params.
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp


class BaseNetwork(nn.Module):
    """Marker base class; concrete networks implement __call__ and loss."""

    def loss(
        self, outputs: Dict[str, jnp.ndarray], batch: Dict[str, jnp.ndarray]
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        raise NotImplementedError

"""Test env: force an 8-device virtual CPU mesh before jax initializes.

Multi-chip sharding paths are exercised on virtual CPU devices (real
multi-chip hardware is not available in CI); numerics tests run fine on
CPU. Set XRNERF_TEST_TPU=1 to run the suite on a real accelerator.
"""

import os

if not os.environ.get("XRNERF_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    # Remove TPU-plugin site dirs from the import path: a wedged remote
    # tunnel plugin can block at import time even under JAX_PLATFORMS=cpu.
    os.environ["PYTHONPATH"] = ":".join(
        p for p in os.environ.get("PYTHONPATH", "").split(":") if "axon" not in p
    )
    import sys as _sys

    _sys.path[:] = [p for p in _sys.path if "axon" not in p]

    # The TPU plugin may already be registered by a sitecustomize.py that
    # ran BEFORE this conftest (it imports jax with JAX_PLATFORMS from the
    # launch env). Setting os.environ above is then too late — force the
    # platform through the live config so tests never ride the tunnel.
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def synthetic_scene(tmp_path_factory):
    """Tiny generated blender-format scene shared across the session."""
    from xrnerf_tpu.datasets.load.synthetic import make_synthetic_blender

    out = tmp_path_factory.mktemp("data") / "sphere"
    make_synthetic_blender(str(out), n_train=4, n_val=2, n_test=2, H=24, W=24)
    return str(out)


@pytest.fixture()
def rng_np():
    return np.random.RandomState(0)

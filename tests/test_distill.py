"""KiloNeRF distill-phase tests: error metrics, kd-tree splitting, the
full discovery driver against an analytic teacher, and grid assembly."""

import numpy as np
import pytest

from xrnerf_tpu.core.distill import (
    DistillDriver,
    Node,
    calculate_volume,
    equal_error_split_threshold,
    error_metrics,
    nodes_fixed_resolution,
)


def test_error_metrics_and_saturation():
    N, E = 3, 32
    tgt = np.random.RandomState(0).rand(N, E, 4).astype(np.float32)
    out = tgt.copy()
    out[0] += 0.1  # uniform error on net 0
    out[2, :, :3] = 0.0  # net 2: rgb collapsed to zero -> saturated
    per_net, se_pp, sat = error_metrics(out, tgt)
    assert per_net["mse"][0] == pytest.approx(0.01 * 4 / 4, rel=1e-4)
    assert per_net["mse"][1] == pytest.approx(0.0, abs=1e-8)
    assert not sat[0] and not sat[1] and sat[2]
    assert per_net["quantile_se"].shape == (N,)


def test_equal_error_split():
    pts = np.stack([np.linspace(0, 1, 100), np.zeros(100), np.zeros(100)], -1)
    errors = np.zeros(100)
    errors[80:] = 1.0  # all error mass at x >= 0.8
    th = equal_error_split_threshold(pts, errors, 0)
    assert 0.75 < th < 1.0


def test_nodes_fixed_resolution():
    nodes = nodes_fixed_resolution((2, 2, 2), (-1, -1, -1), (1, 1, 1))
    assert len(nodes) == 8
    total = sum(calculate_volume(n.domain_min, n.domain_max) for n in nodes)
    assert total == pytest.approx(8.0)


@pytest.fixture(scope="module")
def driver(tmp_path_factory):
    import jax.numpy as jnp

    def teacher(pts, dirs):
        # smooth analytic field: easily fit by tiny MLPs
        rgb = 0.5 + 0.4 * jnp.sin(pts)
        sigma = 2.0 + jnp.sum(pts, -1)
        return rgb, jnp.maximum(sigma, 0.0)

    work = str(tmp_path_factory.mktemp("distill"))
    d = DistillDriver(
        teacher,
        domain_min=(-1, -1, -1),
        domain_max=(1, 1, 1),
        work_dir=work,
        fixed_resolution=(2, 2, 2),
        max_num_networks=8,
        num_examples_per_network=256,
        test_examples_per_network=64,
        iters_per_batch=150,
        lr=5e-3,
        max_error=5e-3,
        test_error_metric="mse",
        hidden=16,
        multires=4,
        multires_dirs=2,
    )
    d.run(max_cycles=6, log=lambda *a: None)
    return d


def test_distill_driver_fits(driver):
    cp = driver.cp
    assert cp["num_networks_fitted"] > 0
    # smooth teacher + generous threshold: a healthy share of the volume
    # fits within 6 cycles (exact fraction depends on RNG/platform)
    frac = cp["fitted_volume"] / cp["total_volume"]
    assert frac > 0.2


def test_distill_lookup_and_assemble(driver):
    node = driver.lookup(np.array([0.5, 0.5, 0.5], np.float32))
    assert node is not None
    grid = driver.assemble_grid((2, 2, 2))
    # every leaf array is stacked to [8, ...]
    for k, v in grid.items():
        assert v.shape[0] == 8, k
    assert any("hidden_0_w" in k for k in grid)


def test_distill_checkpoint_resume(driver):
    import os
    import pickle

    ck = os.path.join(driver.work_dir, "distill_checkpoint.pkl")
    assert os.path.exists(ck)
    with open(ck, "rb") as fh:
        cp = pickle.load(fh)
    assert cp["num_networks_fitted"] == driver.cp["num_networks_fitted"]

"""Mip-NeRF math + network tests: IPE limits, frustum Gaussians, PDF
inversion, end-to-end forward/loss."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xrnerf_tpu.models.embedders.mip import (
    cast_rays,
    conical_frustum_to_gaussian,
    expected_sin,
    integrated_pos_enc,
    pos_enc,
    resample_along_rays,
    sample_along_rays_mip,
    sorted_piecewise_constant_pdf,
)
from xrnerf_tpu.models.networks.mipnerf import MipNerfNetwork


def test_expected_sin_zero_var_is_sin():
    x = jnp.linspace(-3, 3, 10)
    y, yv = expected_sin(x, jnp.zeros_like(x))
    np.testing.assert_allclose(y, jnp.sin(x), atol=1e-6)
    np.testing.assert_allclose(yv, 0.5 * (1 - jnp.cos(2 * x)) - jnp.sin(x) ** 2, atol=1e-5)


def test_ipe_reduces_to_pe_at_zero_cov():
    means = jnp.asarray([[0.3, -0.2, 0.9]])
    covs = jnp.zeros((1, 3))
    enc = integrated_pos_enc((means, covs), 0, 4)
    ref = pos_enc(means, 0, 4, append_identity=False)
    np.testing.assert_allclose(enc, ref, atol=1e-6)
    # large variance kills high frequencies
    enc_big = integrated_pos_enc((means, jnp.full((1, 3), 10.0)), 0, 4)
    assert float(jnp.abs(enc_big[:, -6:]).max()) < 1e-3


def test_conical_frustum_moments():
    # For a degenerate frustum (t0==t1) mean is at t*d and vars ~ 0 on axis
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    mean, cov = conical_frustum_to_gaussian(d, jnp.asarray([[2.0]]), jnp.asarray([[2.0]]), 0.0)
    np.testing.assert_allclose(mean[0, 0], [0, 0, 2.0], atol=1e-5)
    np.testing.assert_allclose(cov[0, 0], 0.0, atol=1e-5)
    # stable vs unstable parameterizations agree for a proper frustum
    m1, c1 = conical_frustum_to_gaussian(
        d, jnp.asarray([[1.0]]), jnp.asarray([[2.0]]), 0.1, stable=True
    )
    m2, c2 = conical_frustum_to_gaussian(
        d, jnp.asarray([[1.0]]), jnp.asarray([[2.0]]), 0.1, stable=False
    )
    np.testing.assert_allclose(m1, m2, rtol=1e-4)
    np.testing.assert_allclose(c1, c2, rtol=1e-3, atol=1e-6)


def test_sorted_pdf_uniform_weights_uniform_samples():
    bins = jnp.broadcast_to(jnp.linspace(0, 1, 9), (2, 9))
    w = jnp.ones((2, 8))
    s = sorted_piecewise_constant_pdf(None, bins, w, 16, randomized=False)
    np.testing.assert_allclose(np.asarray(s[0]), np.linspace(0, 1 - 1e-7, 16) * 1.0, atol=0.04)
    # mass concentration
    w2 = jnp.zeros((2, 8)).at[:, 4].set(1.0)
    s2 = sorted_piecewise_constant_pdf(jax.random.PRNGKey(0), bins, w2, 64, randomized=True)
    assert float(np.mean((np.asarray(s2) >= 0.49) & (np.asarray(s2) <= 0.635))) > 0.9


def test_sample_and_resample_shapes():
    n, s = 4, 16
    rng = np.random.RandomState(0)
    o = jnp.asarray(rng.randn(n, 3).astype(np.float32))
    d = jnp.asarray(rng.randn(n, 3).astype(np.float32))
    radii = jnp.full((n, 1), 1e-2)
    near = jnp.full((n, 1), 2.0)
    far = jnp.full((n, 1), 6.0)
    t_vals, (means, covs) = sample_along_rays_mip(
        jax.random.PRNGKey(0), o, d, radii, s, near, far, True, False
    )
    assert t_vals.shape == (n, s + 1)
    assert means.shape == (n, s, 3) and covs.shape == (n, s, 3)
    w = jnp.ones((n, s)) * 0.1
    t2, (m2, c2) = resample_along_rays(
        jax.random.PRNGKey(1), o, d, radii, t_vals, w, True
    )
    assert t2.shape == (n, s + 1) and m2.shape == (n, s, 3)
    assert np.all(np.diff(np.asarray(t2), axis=-1) >= -1e-6)


def _mip_batch(n=8, seed=0):
    rng = np.random.RandomState(seed)
    d = rng.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return {
        "rays_o": jnp.asarray(rng.randn(n, 3).astype(np.float32)),
        "rays_d": jnp.asarray(d),
        "radii": jnp.full((n, 1), 1e-2),
        "near": jnp.full((n, 1), 2.0),
        "far": jnp.full((n, 1), 6.0),
        "target": jnp.asarray(rng.rand(n, 3).astype(np.float32)),
        "lossmult": jnp.ones((n, 1)),
    }


def test_mipnerf_network_forward_and_loss():
    net = MipNerfNetwork(
        num_levels=2, n_samples=8, netdepth=2, netwidth=32, max_deg_point=8
    )
    batch = _mip_batch(8)
    params = net.init(jax.random.PRNGKey(0), batch, rng=None, train=False)["params"]
    # single shared MLP across levels
    assert len([k for k in params if k.startswith("mlp")]) == 1
    out = net.apply({"params": params}, batch, rng=None, train=False)
    assert out["rgb"].shape == (8, 3)
    assert "level0_rgb" in out
    loss, log = net.loss(out, batch)
    assert np.isfinite(float(loss))
    assert "level0_mse" in log

    def lf(p):
        o = net.apply({"params": p}, batch, rng=jax.random.PRNGKey(1), train=True)
        return net.loss(o, batch)[0]

    g = jax.grad(lf)(params)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in jax.tree_util.tree_leaves(g))

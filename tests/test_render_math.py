"""Golden-value tests for the core rendering math: posenc, stratified,
sample_pdf, volume compositing — checked against hand-computed semantics of
the reference (nerf_render.py / hierarchical_sample.py / base embedder)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xrnerf_tpu.models.embedders.posenc import posenc, posenc_channels
from xrnerf_tpu.models.renders.volume import exclusive_cumprod, volume_render
from xrnerf_tpu.models.samplers.pdf import sample_pdf
from xrnerf_tpu.models.samplers.stratified import sample_along_rays, z_to_pts


def test_posenc_values():
    x = jnp.asarray([[0.5, -0.25, 1.0]])
    enc = posenc(x, num_freqs=3)
    assert enc.shape == (1, posenc_channels(3, 3))
    np.testing.assert_allclose(enc[0, :3], x[0], atol=1e-6)
    # first sin block = sin(2^0 * x)
    np.testing.assert_allclose(enc[0, 3:6], np.sin([0.5, -0.25, 1.0]), atol=1e-6)
    np.testing.assert_allclose(enc[0, 6:9], np.cos([0.5, -0.25, 1.0]), atol=1e-6)
    # second freq: sin(2x)
    np.testing.assert_allclose(enc[0, 9:12], np.sin([1.0, -0.5, 2.0]), atol=1e-6)


def test_stratified_bounds_and_lindisp():
    near = jnp.full((4, 1), 2.0)
    far = jnp.full((4, 1), 6.0)
    z = sample_along_rays(None, near, far, 16, perturb=False)
    assert z.shape == (4, 16)
    np.testing.assert_allclose(z[:, 0], 2.0, atol=1e-6)
    np.testing.assert_allclose(z[:, -1], 6.0, atol=1e-6)
    zp = sample_along_rays(jax.random.PRNGKey(0), near, far, 16, perturb=True)
    assert float(jnp.min(zp)) >= 2.0 - 1e-5 and float(jnp.max(zp)) <= 6.0 + 1e-5
    assert np.all(np.diff(np.asarray(zp), axis=-1) > -1e-6)
    zl = sample_along_rays(None, near, far, 3, lindisp=True, perturb=False)
    np.testing.assert_allclose(zl[:, 1], 3.0, atol=1e-5)  # harmonic midpoint


def test_z_to_pts():
    o = jnp.asarray([[1.0, 0, 0]])
    d = jnp.asarray([[0, 0, -1.0]])
    z = jnp.asarray([[1.0, 2.0]])
    pts = z_to_pts(o, d, z)
    np.testing.assert_allclose(pts[0, 1], [1.0, 0.0, -2.0], atol=1e-6)


def test_sample_pdf_concentrates_mass():
    bins = jnp.linspace(0, 1, 9)[None].repeat(2, 0)  # [2, 9]
    w = jnp.zeros((2, 8)).at[:, 3].set(1.0)  # all mass in bin 3: (0.375, 0.5)
    s = sample_pdf(jax.random.PRNGKey(1), bins, w, 64, det=False)
    s = np.asarray(s)
    frac_in = np.mean((s >= 0.370) & (s <= 0.505))
    assert frac_in > 0.95
    s_det = np.asarray(sample_pdf(None, bins, w, 16, det=True))
    assert np.all(np.diff(s_det, axis=-1) >= -1e-6)


def test_volume_render_analytic():
    # Two samples; huge density on the first -> alpha ~ 1, rgb = sigmoid(raw)
    z = jnp.asarray([[1.0, 2.0]])
    rays_d = jnp.asarray([[0.0, 0.0, 1.0]])
    raw_rgb = jnp.asarray([[[2.0, 0.0, -2.0], [0.0, 0.0, 0.0]]])
    raw_sigma = jnp.asarray([[1000.0, 0.0]])
    ret = volume_render(raw_rgb, raw_sigma, z, rays_d)
    np.testing.assert_allclose(
        ret["rgb"][0], jax.nn.sigmoid(jnp.asarray([2.0, 0.0, -2.0])), atol=1e-5
    )
    assert float(ret["acc"][0]) == pytest.approx(1.0, abs=1e-5)
    np.testing.assert_allclose(ret["depth"][0], 1.0, atol=1e-5)

    # Zero density + white bkgd -> pure white, acc 0
    ret2 = volume_render(raw_rgb, jnp.asarray([[-1e9, -1e9]]), z, rays_d, white_bkgd=True)
    np.testing.assert_allclose(ret2["rgb"][0], 1.0, atol=1e-5)
    assert float(ret2["acc"][0]) == pytest.approx(0.0, abs=1e-6)

    # moderate density: check against manual compositing
    sig = jnp.asarray([[0.5, 0.7]])
    ret3 = volume_render(raw_rgb, sig, z, rays_d)
    dists = np.asarray([1.0, 1e10])
    alpha = 1 - np.exp(-np.asarray([0.5, 0.7]) * dists)
    T = np.asarray([1.0, 1 - alpha[0] + 1e-10])
    T = np.cumprod(T)
    w = alpha * T
    rgb_manual = (w[:, None] * jax.nn.sigmoid(raw_rgb[0])).sum(0)
    np.testing.assert_allclose(ret3["rgb"][0], rgb_manual, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ret3["weights"][0]), w, rtol=1e-5)


def test_exclusive_cumprod():
    x = jnp.asarray([[2.0, 3.0, 4.0]])
    np.testing.assert_allclose(exclusive_cumprod(x)[0], [1.0, 2.0, 6.0])


def test_posenc_fast_matches_exact():
    """posenc_fast (poly sin/cos) must agree with exact posenc to well
    under bf16 resolution at the L=10 points / L=4 dirs configs."""
    import numpy as np
    from xrnerf_tpu.models.embedders.posenc import posenc, posenc_fast

    rng = np.random.RandomState(0)
    # points span the blender scene box and beyond
    x = jnp.asarray(rng.uniform(-4.0, 4.0, size=(4096, 3)).astype(np.float32))
    for L in (10, 4):
        a = posenc(x, L)
        b = posenc_fast(x, L)
        err = float(jnp.max(jnp.abs(a - b)))
        assert err < 2e-3, err  # bf16 eps is 7.8e-3

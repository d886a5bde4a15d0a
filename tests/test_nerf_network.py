"""NerfNetwork forward/loss/train tests (tiny shapes, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xrnerf_tpu.models.networks.nerf import NerfNetwork
from xrnerf_tpu.registry import NETWORKS


def _tiny_net(**kw):
    defaults = dict(
        n_samples=8,
        n_importance=8,
        netdepth=2,
        netwidth=32,
        multires=4,
        multires_dirs=2,
        white_bkgd=True,
    )
    defaults.update(kw)
    return NerfNetwork(**defaults)


def _batch(n=16, seed=0):
    rng = np.random.RandomState(seed)
    d = rng.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return {
        "rays_o": jnp.asarray(rng.randn(n, 3).astype(np.float32)),
        "rays_d": jnp.asarray(d),
        "near": jnp.full((n, 1), 2.0),
        "far": jnp.full((n, 1), 6.0),
        "target": jnp.asarray(rng.rand(n, 3).astype(np.float32)),
    }


def test_registered():
    assert "NerfNetwork" in NETWORKS


def test_forward_shapes():
    net = _tiny_net()
    batch = _batch(16)
    params = net.init(jax.random.PRNGKey(0), batch, rng=None, train=False)["params"]
    out = net.apply({"params": params}, batch, rng=None, train=False)
    assert out["rgb"].shape == (16, 3)
    assert out["coarse_rgb"].shape == (16, 3)
    assert out["disp"].shape == (16,)
    assert out["acc"].shape == (16,)
    # coarse-only variant
    net0 = _tiny_net(n_importance=0)
    p0 = net0.init(jax.random.PRNGKey(0), batch, rng=None, train=False)["params"]
    out0 = net0.apply({"params": p0}, batch, rng=None, train=False)
    assert out0["rgb"].shape == (16, 3)
    assert "mlp_fine" not in p0


def test_deterministic_eval_stochastic_train():
    net = _tiny_net(raw_noise_std=1.0)
    batch = _batch(8)
    params = net.init(jax.random.PRNGKey(0), batch, rng=None, train=False)["params"]
    o1 = net.apply({"params": params}, batch, rng=None, train=False)
    o2 = net.apply({"params": params}, batch, rng=None, train=False)
    np.testing.assert_array_equal(o1["rgb"], o2["rgb"])
    t1 = net.apply({"params": params}, batch, rng=jax.random.PRNGKey(1), train=True)
    t2 = net.apply({"params": params}, batch, rng=jax.random.PRNGKey(2), train=True)
    assert not np.array_equal(t1["rgb"], t2["rgb"])


def test_loss_and_grads_finite():
    net = _tiny_net()
    batch = _batch(8)
    params = net.init(jax.random.PRNGKey(0), batch, rng=None, train=False)["params"]

    def loss_fn(p):
        out = net.apply({"params": p}, batch, rng=jax.random.PRNGKey(3), train=True)
        loss, logs = net.loss(out, batch)
        return loss, logs

    (loss, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss))
    assert "psnr" in logs and "coarse_mse" in logs
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    assert any(float(jnp.abs(g).max()) > 0 for g in flat)


def test_overfit_single_batch_improves():
    """A few gradient steps on one batch must reduce the loss."""
    import optax

    net = _tiny_net(n_importance=0, n_samples=16)
    batch = _batch(32)
    params = net.init(jax.random.PRNGKey(0), batch, rng=None, train=False)["params"]
    tx = optax.adam(5e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(p, s, rng):
        def lf(p):
            out = net.apply({"params": p}, batch, rng=rng, train=True)
            return net.loss(out, batch)[0]

        loss, g = jax.value_and_grad(lf)(p)
        upd, s = tx.update(g, s)
        return optax.apply_updates(p, upd), s, loss

    losses = []
    for i in range(30):
        params, opt_state, loss = step(params, opt_state, jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.7, losses[::10]

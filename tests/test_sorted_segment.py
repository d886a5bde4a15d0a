"""Scatter-free dense segment reduction (ops/sorted_segment.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from xrnerf_tpu.ops.sorted_segment import dense_segment_grad


def test_dense_segment_grad_matches_scatter_add():
    rng = np.random.RandomState(0)
    n, V, F = 4096, 512, 3
    idx = jnp.asarray(rng.randint(0, V, size=n).astype(np.int32))
    vals = jnp.asarray(rng.randn(n, F).astype(np.float32))
    ref = jnp.zeros((V, F)).at[idx].add(vals)
    got = jax.jit(lambda i, v: dense_segment_grad(i, v, V))(idx, vals)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-5)


def test_dense_segment_grad_drops_flagged_rows():
    rng = np.random.RandomState(1)
    n, V, F = 1024, 64, 2
    idx = rng.randint(0, V, size=n).astype(np.int32)
    dead = rng.rand(n) < 0.5
    idx_flagged = np.where(dead, -1, idx).astype(np.int32)
    vals = rng.randn(n, F).astype(np.float32)
    ref = (
        jnp.zeros((V, F))
        .at[jnp.asarray(np.where(dead, V, idx))]
        .add(jnp.asarray(vals), mode="drop")
    )
    got = dense_segment_grad(jnp.asarray(idx_flagged), jnp.asarray(vals), V)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-5)


def test_dense_segment_grad_empty_and_full_rows():
    # every update to one row; other rows exactly zero
    n, V, F = 256, 16, 2
    idx = jnp.full((n,), 7, jnp.int32)
    vals = jnp.ones((n, F), jnp.float32)
    got = np.asarray(dense_segment_grad(idx, vals, V))
    assert np.allclose(got[7], n)
    mask = np.ones(V, bool); mask[7] = False
    assert np.all(got[mask] == 0)

"""Mesh/sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from xrnerf_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    model_sharding,
    pad_to_multiple,
    replicated,
    shard_batch,
)

needs_multi = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


@needs_multi
def test_make_mesh_shapes():
    m = make_mesh(n_model=1)
    assert m.shape == {"data": 8, "model": 1}
    m2 = make_mesh(n_model=2)
    assert m2.shape == {"data": 4, "model": 2}
    m3 = make_mesh(n_model=3)  # 8 % 3 != 0 -> degrade to pure data
    assert m3.shape == {"data": 8, "model": 1}


@needs_multi
def test_shard_batch_and_grad_allreduce():
    mesh = make_mesh(n_model=1)
    batch = {"x": np.arange(32, dtype=np.float32).reshape(16, 2)}
    sharded = shard_batch(batch, mesh)
    assert sharded["x"].sharding.spec == P("data")

    w = jax.device_put(jnp.ones((2,)), replicated(mesh))

    @jax.jit
    def loss_grad(w, x):
        return jax.grad(lambda w: jnp.mean((x @ w) ** 2))(w)

    g = loss_grad(w, sharded["x"])
    # gradient of a mean over the *global* batch: GSPMD must all-reduce
    x = batch["x"]
    expected = 2 * x.T @ (x @ np.ones(2)) / 16
    np.testing.assert_allclose(np.asarray(g), expected, rtol=1e-5)


@needs_multi
def test_model_sharding_spec():
    mesh = make_mesh(n_model=2)
    arr = jax.device_put(jnp.zeros((4, 8)), model_sharding(mesh, axis=0))
    assert arr.sharding.spec == P("model")


def test_pad_to_multiple():
    b = {"x": np.ones((10, 3))}
    p = pad_to_multiple(b, 8)
    assert p["x"].shape == (16, 3)
    assert pad_to_multiple(b, 5)["x"].shape == (10, 3)


@needs_multi
def test_graft_dryrun_multichip():
    import importlib.util, os

    spec = importlib.util.spec_from_file_location(
        "graft_entry",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "__graft_entry__.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)

    fn, (params, batch) = mod.entry()
    out = jax.jit(fn)(params, batch)
    assert out.shape == (256, 3)


def test_kilonerf_expert_parallel_sharding():
    """KiloNeRF's multi-network stacks shard their n_nets dim on the model
    axis and a full train step runs under the 2x model mesh."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from xrnerf_tpu.models.networks.kilonerf import KiloNerfNetwork
    from xrnerf_tpu.parallel.mesh import make_mesh
    from xrnerf_tpu.core.trainer import Trainer

    class _DS:
        N_rand = 32

        def train_batch(self, step, host_id=0, num_hosts=1):
            rng = np.random.RandomState(step)
            d = rng.randn(32, 3).astype(np.float32)
            d /= np.linalg.norm(d, axis=-1, keepdims=True)
            return {
                "rays_o": rng.randn(32, 3).astype(np.float32) * 0.1,
                "rays_d": d,
                "near": np.full((32, 1), 0.1, np.float32),
                "far": np.full((32, 1), 2.0, np.float32),
                "target": rng.rand(32, 3).astype(np.float32),
            }

    mesh = make_mesh(n_model=2)
    assert mesh.shape["model"] == 2
    net = KiloNerfNetwork(
        resolution=(4, 4, 4), hidden=8, n_hidden_layers=1, multires=2,
        multires_dirs=2, n_samples=8, capacity_factor=4.0,
    )
    import tempfile

    tr = Trainer(net, _DS(), optimizer={"lr": 1e-3}, work_dir=tempfile.mkdtemp(),
                 max_iters=2, ckpt_interval=0, log_interval=10, mesh=mesh)
    w = tr.state.params["mlp"]["hidden_0_w"]
    spec = w.sharding.spec
    assert spec and spec[0] == "model", spec
    # adam moments follow the same sharding (no per-step resharding)
    mu = tr.state.opt_state[0].mu["mlp"]["hidden_0_w"]
    assert mu.sharding.spec == w.sharding.spec
    tr.run()  # two steps execute without resharding errors


@needs_multi
def test_scatter_add_rows_sharded_psum_of_partials():
    """With a mesh registered, hash-table gradient scatters run
    shard-local over the data axis and psum partial tables — result must
    equal the single-device scatter, and a brick-encoding table gradient
    must be unchanged under the mesh."""
    from xrnerf_tpu.ops.pallas.scatter_rows import (
        scatter_add_rows,
        set_scatter_mesh,
    )

    mesh = make_mesh(n_model=1)
    rng = np.random.RandomState(0)
    n, w, rows = 8 * 1024, 16, 256
    idx = jnp.asarray(rng.randint(0, rows, size=(n,)).astype(np.int32))
    vals = jnp.asarray(rng.randn(n, w).astype(np.float32))
    ref = np.asarray(scatter_add_rows(idx, vals, rows))
    try:
        set_scatter_mesh(mesh, "data")
        idx_s = jax.device_put(idx, batch_sharding(mesh))
        vals_s = jax.device_put(vals, batch_sharding(mesh))
        out = jax.jit(lambda i, v: scatter_add_rows(i, v, rows))(idx_s, vals_s)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)

        # full brick-encoding gradient under the mesh
        from xrnerf_tpu.models.embedders.hashenc import BrickHashEncoding

        enc = BrickHashEncoding(
            n_levels=2, n_features=2, log2_table_size=10, base_res=4, max_res=16
        )
        x = jnp.asarray(rng.rand(64, 3).astype(np.float32))
        params = enc.init(jax.random.PRNGKey(0), x)["params"]

        def lf(p, xx):
            return jnp.sum(enc.apply({"params": p}, xx) ** 2)

        g_ref = jax.grad(lf)(params, x)
        set_scatter_mesh(mesh, "data")
        x_s = jax.device_put(x, batch_sharding(mesh))
        g_mesh = jax.jit(jax.grad(lf))(params, x_s)
        np.testing.assert_allclose(
            np.asarray(g_mesh["table"]), np.asarray(g_ref["table"]), atol=1e-4
        )
    finally:
        set_scatter_mesh(None)

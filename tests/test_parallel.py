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

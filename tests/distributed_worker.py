"""Worker for the real 2-process jax.distributed test (not a pytest file).

Each process: init_distributed -> build a 1-axis global mesh over BOTH
processes' CPU devices -> assemble a global batch from process-local
shards (the framework's host-sliced loading pattern) -> jit a gradient
whose correct value requires the cross-process psum XLA inserts ->
assert, and have rank 0 write an OK file the pytest parent checks.

Usage: python distributed_worker.py <pid> <nproc> <port> <okfile>
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# keep any wedged TPU-plugin site dirs out (mirrors tests/conftest.py)
os.environ["PYTHONPATH"] = ":".join(
    p for p in os.environ.get("PYTHONPATH", "").split(":") if "axon" not in p
)
sys.path[:] = [p for p in sys.path if "axon" not in p]
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main():
    pid, nproc, port, okfile = (
        int(sys.argv[1]),
        int(sys.argv[2]),
        sys.argv[3],
        sys.argv[4],
    )
    from xrnerf_tpu.parallel.mesh import init_distributed

    init_distributed(
        coordinator=f"127.0.0.1:{port}", num_processes=nproc, process_id=pid
    )
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.process_index() == pid

    devs = jax.devices()
    n_local = jax.local_device_count()
    assert len(devs) == nproc * n_local, (len(devs), n_local)

    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.asarray(devs), ("data",))
    sh = NamedSharding(mesh, P("data"))

    # host-sliced global batch: process p holds rows [p*B_local, (p+1)*B_local)
    per_dev = 4
    b_local = n_local * per_dev
    global_shape = (nproc * b_local,)
    x_global = np.arange(1.0, 1.0 + global_shape[0], dtype=np.float32)
    x_local = x_global[pid * b_local : (pid + 1) * b_local]
    x = jax.make_array_from_process_local_data(sh, x_local, global_shape)

    w = jnp.float32(2.0)

    @jax.jit
    def grad_w(w, x):
        return jax.grad(lambda w: jnp.sum((w * x) ** 2))(w)

    g = float(grad_w(w, x))  # = 2*w*sum(x^2), needs the cross-process psum
    expect = float(2.0 * 2.0 * np.sum(x_global**2))
    assert abs(g - expect) < 1e-3, (g, expect)

    # rank-0-only artifact (the framework's eval/ckpt convention)
    if jax.process_index() == 0:
        with open(okfile, "w") as f:
            f.write(f"ok {g}")
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()

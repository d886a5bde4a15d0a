"""Minimal brick-encoding probe on TPU: fwd and fwd+bwd timing."""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from xrnerf_tpu.models.embedders.hashenc import BrickHashEncoding, HashEncoding

N = 262144
rng = np.random.RandomState(0)
pts = jnp.asarray(rng.rand(N, 3).astype(np.float32))


def timed(fn, *a, n=5, warmup=2, label=""):
    t0 = time.perf_counter()
    for _ in range(warmup):
        out = fn(*a)
    float(out)
    print(f"{label}: warmup+compile {time.perf_counter()-t0:.1f} s", flush=True)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*a)
    float(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{label}: {dt*1e3:.2f} ms  {N/dt/1e6:.1f} Mpts/s", flush=True)


enc = BrickHashEncoding()
params = enc.init(jax.random.PRNGKey(0), pts[:128])["params"]


@jax.jit
def fwd(p):
    return jnp.sum(enc.apply({"params": p}, pts).astype(jnp.float32))


@jax.jit
def bwd(p):
    g = jax.grad(lambda q: fwd(q))(p)
    return jnp.sum(g["table"])


timed(fwd, params, label="brick fwd")
timed(bwd, params, label="brick fwd+bwd")

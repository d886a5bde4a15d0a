"""Round-4: where does the tcnn-exact vertex NGP step's second go?

Times the vertex hash-encoding pieces at the real step shape
(N=262144 pts, L=16, F=2, T=2^19) with operands computed INSIDE jit
(big traced args trip the relay's compile-request body limit):

  fwd              gather + trilerp (the encoding forward)
  fwd+bwd          full custom-VJP (table grad + position grad)
  tablegrad-sorted the scatter-free sorted-segment reduction alone
  tablegrad-xla    the same reduction as 16 plain XLA scatters
  posgrad          remat gather + trilerp-weight chain alone
  cells            hash/corner computation alone

Chained-scalar timing; only small arrays (x, g, table) cross the host.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from xrnerf_tpu.models.embedders.hashenc import (
    _corner_weights,
    _level_resolutions,
    _vertex_cells,
    _vertex_gather,
    _vertex_impl,
    _vertex_lookup,
    per_level_scale,
)
from xrnerf_tpu.ops.sorted_segment import dense_segment_grad

N = 4096 * 64
L, F = 16, 2
T = 1 << 19
ITERS = 4


def timeit(fn, *args, iters=ITERS, warmup=2):
    @jax.jit
    def jfn(x, *a):
        def body(c, _):
            return jnp.sum(fn(c * 1e-30, *a)).astype(jnp.float32) * 0.0 + c, None

        return jax.lax.scan(body, x, None, length=iters)[0]

    for _ in range(warmup):
        out = jfn(jnp.float32(1.0), *args)
    float(out)
    t0 = time.perf_counter()
    float(jfn(jnp.float32(1.0), *args))
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(N, 3).astype(np.float32))
    g = jnp.asarray(rng.randn(N, L * F).astype(np.float32) * 1e-3)
    table = jnp.asarray(rng.randn(L, T, F).astype(np.float32) * 1e-4)
    scale = per_level_scale(2048, 16, L)
    res = tuple(int(r) for r in _level_resolutions(16, scale, L))
    cfg = (res, T, F)

    def p(name, sec):
        print(f"  {name:20s} {sec*1e3:9.2f} ms", flush=True)

    p("cells", timeit(lambda c, x: _vertex_cells(x + c, cfg)[1], x))
    p("fwd", timeit(lambda c, t, x: _vertex_impl(t, x + c, cfg), table, x))

    def fwd_bwd(c, t, x, g):
        out, vjp = jax.vjp(lambda tt, xx: _vertex_lookup(tt, xx, cfg), t, x + c)
        gt, gx = vjp(g)
        return jnp.sum(gt) + jnp.sum(gx)

    p("fwd+bwd (full vjp)", timeit(fwd_bwd, table, x, g))

    def tablegrad(c, x, g, sorted_path):
        idx, t = _vertex_cells(x + c, cfg)
        w8 = _corner_weights(t)
        g3 = jnp.moveaxis(g.reshape(N, L, F), 0, 1)
        rows = (w8[..., None] * g3[:, :, None, :]).reshape(L, N * 8, F)
        idx2 = idx.reshape(L, N * 8)
        acc = jnp.float32(0)
        for l in range(L):
            V = min(res[l] ** 3, T)
            if sorted_path:
                gl = dense_segment_grad(idx2[l], rows[l], V)
            else:
                gl = jnp.zeros((V, F)).at[idx2[l]].add(rows[l], mode="drop")
            acc = acc + jnp.sum(gl)
        return acc

    p("tablegrad-sorted", timeit(lambda c, x, g: tablegrad(c, x, g, True), x, g))
    p("tablegrad-xla", timeit(lambda c, x, g: tablegrad(c, x, g, False), x, g))

    def posgrad(c, t, x, g):
        idx, tt = _vertex_cells(x + c, cfg)
        g3 = jnp.moveaxis(g.reshape(N, L, F), 0, 1)
        feats = _vertex_gather(t, idx, cfg)
        gdot = jnp.sum(feats * g3[:, :, None, :], axis=-1)
        return jnp.sum(gdot)

    p("posgrad (remat gather)", timeit(posgrad, table, x, g))


if __name__ == "__main__":
    main()

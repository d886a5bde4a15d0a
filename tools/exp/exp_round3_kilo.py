"""Round-3 experiment: KiloNeRF inference primitive costs on TPU.

The redesigned inference path is: occupancy keep-K march (batched
argsort over [N, S] candidates) -> sort-based MoE dispatch (2 sorts of
[N*K] int32 pairs + capacity gathers) -> bf16 grouped matmuls ->
composite. This measures each primitive at frame scale so K / chunk /
candidate counts can be chosen from data. Chained consumption (axon
transport acks early otherwise).
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

CHUNK = 65536
S = 384
K = 32
NK = CHUNK * K


def timed_chain(make_fn, n=3, label="", rows=None):
    try:
        fn = jax.jit(make_fn)
        c = jnp.float32(0.0)
        c, out = fn(c)
        float(c)
        t0 = time.perf_counter()
        for _ in range(n):
            c, out = fn(c)
        float(c)
        dt = (time.perf_counter() - t0) / n
        per = f"  {dt/rows*1e9:.2f} ns/row" if rows else ""
        print(f"{label}: {dt*1e3:.2f} ms{per}", flush=True)
        return dt
    except Exception as e:
        print(f"{label}: FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)
        return None


rng = np.random.RandomState(0)
occ = jnp.asarray(rng.rand(64 * 64 * 64) < 0.15)
cell = jnp.asarray(rng.randint(0, 64**3, size=(CHUNK, S)).astype(np.int32))
z = jnp.asarray(np.sort(rng.rand(CHUNK, S).astype(np.float32), axis=-1))
keys1 = jnp.asarray(rng.randint(0, 4096, size=(NK,)).astype(np.int32))


# 1. occupancy bool gather at [CHUNK, S]
def f1(c):
    live = occ[cell] & (z + c >= 0)
    return jnp.float32(jnp.sum(live)), live


timed_chain(f1, label=f"1  occ bool gather [{CHUNK},{S}] = {CHUNK*S/1e6:.0f}M", rows=CHUNK * S)


# 2. keep-K compaction: argsort of (dead, z) then take K
def f2(c):
    live = occ[cell]
    key = jnp.where(live, z + c, jnp.inf)
    order = jnp.argsort(key, axis=-1)[:, :K]
    zk = jnp.take_along_axis(z, order, axis=-1)
    return zk[123, 3] + zk[-1, -1], zk


timed_chain(f2, label=f"2  march argsort [{CHUNK},{S}] keep {K}", rows=CHUNK * S)


# 2b. cheaper compaction: cumsum-rank + one small sort? (rank = position
# among live) -> dest = rank clipped to K, needs scatter... measure the
# top_k alternative instead.
def f2b(c):
    live = occ[cell]
    key = jnp.where(live, -(z + c), -jnp.inf)
    vals, order = jax.lax.top_k(key, K)
    return vals[123, 3] + order[-1, -1].astype(jnp.float32), vals


timed_chain(f2b, label=f"2b march top_k({K}) of [{CHUNK},{S}]", rows=CHUNK * S)


# 3. dispatch sort: [NK] int32 key + iota payload
def f3(c):
    sk, sp = jax.lax.sort((keys1 + jnp.int32(c * 0), jax.lax.iota(jnp.int32, NK)), num_keys=1)
    return sk[1234].astype(jnp.float32) + sp[-1].astype(jnp.float32), sk


timed_chain(f3, label=f"3  dispatch sort {NK/1e6:.1f}M int32 pairs", rows=NK)


# 4. capacity gather: [n_nets*cap, 6] rows from [NK+1, 6]
n_nets, cap = 4096, 2 * NK // 4096
raw = jnp.asarray(rng.randn(NK + 1, 6).astype(np.float32))
src = jnp.asarray(rng.randint(0, NK + 1, size=(n_nets * cap,)).astype(np.int32))


def f4(c):
    buf = raw[src] + c
    return buf[123, 3] + buf[-1, -1], buf


timed_chain(f4, label=f"4  capacity gather {n_nets*cap/1e6:.1f}M x6", rows=n_nets * cap)


# 5. grouped bf16 matmuls: [n_nets, cap, 63] @ [n_nets, 63, 32] x ~6 layers
x0 = jnp.asarray(rng.randn(n_nets, cap, 63).astype(np.float32)).astype(jnp.bfloat16)
ws = [
    jnp.asarray(rng.randn(n_nets, 63, 32).astype(np.float32) * 0.1).astype(jnp.bfloat16),
    jnp.asarray(rng.randn(n_nets, 32, 32).astype(np.float32) * 0.1).astype(jnp.bfloat16),
    jnp.asarray(rng.randn(n_nets, 32, 36).astype(np.float32) * 0.1).astype(jnp.bfloat16),
    jnp.asarray(rng.randn(n_nets, 36, 32).astype(np.float32) * 0.1).astype(jnp.bfloat16),
    jnp.asarray(rng.randn(n_nets, 32, 4).astype(np.float32) * 0.1).astype(jnp.bfloat16),
]


def f5(c):
    h = x0 + jnp.bfloat16(c)
    for w in ws:
        h = jax.nn.relu(
            jax.lax.dot_general(
                h, w, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)
        )
    return h[123, 3, 0].astype(jnp.float32), h


timed_chain(f5, label=f"5  grouped bf16 MLP [{n_nets},{cap},...] 5 layers", rows=n_nets * cap)


# 6. f32 comparison for the same matmuls
x0f = x0.astype(jnp.float32)
wsf = [w.astype(jnp.float32) for w in ws]


def f6(c):
    h = x0f + c
    for w in wsf:
        h = jax.nn.relu(
            jax.lax.dot_general(
                h, w, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
        )
    return h[123, 3, 0], h


timed_chain(f6, label="6  grouped f32 MLP same shapes", rows=n_nets * cap)


# 7. un-dispatch second sort (key=perm, payload=dest)
perm = jnp.asarray(rng.permutation(NK).astype(np.int32))
dest = jnp.asarray(rng.randint(0, n_nets * cap, size=(NK,)).astype(np.int32))


def f7(c):
    sk, sd = jax.lax.sort((perm + jnp.int32(0 * c), dest), num_keys=1)
    return sk[99].astype(jnp.float32) + sd[-1].astype(jnp.float32), sd


timed_chain(f7, label="7  un-dispatch sort 2.1M pairs", rows=NK)


# 8. posenc cost at grouped shape [n_nets, cap, 6] -> 90
def f8(c):
    g = x0f[..., :6] + c
    freqs = 2.0 ** jnp.arange(7, dtype=jnp.float32)
    ang = g[..., None, :3] * freqs[:, None]
    enc = jnp.concatenate(
        [jnp.sin(ang).reshape(*g.shape[:-1], -1), jnp.cos(ang).reshape(*g.shape[:-1], -1)], -1
    )
    return enc[123, 3, 0], enc


timed_chain(f8, label="8  posenc at grouped shape", rows=n_nets * cap)

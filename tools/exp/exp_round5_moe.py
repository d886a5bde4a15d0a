"""Round-5: break the KiloNeRF inference MoE's 40 ms into its pieces.

At M=768k dispatch rows, n_nets=4096, capacity_factor 2.0 (cap=384,
1.57M grouped slots), the gather_dispatch path is: sort(key,iota) ->
searchsorted -> capacity gather [1.57M, 6] -> posenc+6 bmm layers ->
sort(perm,dest) -> un-dispatch gather. Times each piece standalone plus
the whole path at capacity_factor {2.0, 1.5, 1.25} and M {768k, 640k}.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from xrnerf_tpu.models.fields.kilonerf_field import MultiNetworkMLP

ITERS = 8
N_NETS = 4096


def timeit(fn, *args, iters=ITERS, warmup=2):
    @jax.jit
    def jfn(x, *a):
        def body(c, _):
            out = fn(c, *a)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return (leaf.reshape(-1)[0].astype(jnp.float32) * 1e-30 + c), None

        return jax.lax.scan(body, x, None, length=iters)[0]

    for _ in range(warmup):
        out = jfn(jnp.float32(1.0), *args)
    float(out)
    t0 = time.perf_counter()
    float(jfn(jnp.float32(1.0), *args))
    return (time.perf_counter() - t0) / iters


def pieces(M, cap):
    rng = np.random.RandomState(0)
    key_np = np.sort(rng.randint(0, N_NETS, M)).astype(np.int32)
    rng.shuffle(key_np)  # unsorted but realistic multiplicity
    key = jnp.asarray(key_np)
    raw = jnp.asarray(rng.rand(M, 6).astype(np.float32))
    iota = jnp.arange(M, dtype=jnp.int32)

    def srt(c, key):
        return jax.lax.sort((key + jnp.int32(c * 0), iota), num_keys=1)

    s1 = timeit(srt, key)

    skey, perm = jax.jit(lambda k: jax.lax.sort((k, iota), num_keys=1))(key)

    def ssorted(c, skey):
        return jnp.searchsorted(
            skey + jnp.int32(c * 0),
            jnp.arange(N_NETS + 1, dtype=jnp.int32),
            side="left",
        )

    s2 = timeit(ssorted, skey)

    first = jax.jit(
        lambda sk: jnp.searchsorted(
            sk, jnp.arange(N_NETS + 1, dtype=jnp.int32), side="left"
        )
    )(skey)

    def capg(c, perm, raw):
        pos = first[:N_NETS, None] + jnp.arange(cap)[None, :]
        valid_slot = pos < jnp.minimum(first[1:, None], first[:N_NETS, None] + cap)
        perm_pad = jnp.concatenate([perm, jnp.full((1,), M, jnp.int32)])
        src = jnp.where(valid_slot, perm_pad[jnp.clip(pos, 0, M - 1)], M)
        raw_pad = jnp.concatenate([raw + c, jnp.zeros((1, 6), raw.dtype)])
        return raw_pad[src.reshape(-1)].reshape(N_NETS, cap, 6)

    s3 = timeit(capg, perm, raw)

    mlp = MultiNetworkMLP(n_nets=N_NETS, hidden=32, n_hidden_layers=2,
                          capacity_factor=2.0, dtype=jnp.bfloat16)
    grouped = jax.jit(lambda p, r: capg(0.0, p, r))(perm, raw)
    params = mlp.init(
        jax.random.PRNGKey(0), raw[:128, :3], raw[:128, 3:], key[:128]
    )["params"]

    from xrnerf_tpu.models.embedders.posenc import posenc

    def bmm(p, name, x, relu=True):
        y = jax.lax.dot_general(
            x.astype(jnp.bfloat16), p[name + "_w"].astype(jnp.bfloat16),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) + p[name + "_b"]
        return jax.nn.relu(y) if relu else y

    def evalg(c, p, grouped_raw):
        grouped_raw = grouped_raw + c
        g = jnp.concatenate(
            [posenc(grouped_raw[..., :3], 10), posenc(grouped_raw[..., 3:], 4)],
            -1,
        )
        h = g[..., :63]
        for i in range(2):
            h = bmm(p, f"hidden_{i}", h)
        sigma = bmm(p, "sigma", h, relu=False)[..., 0]
        feat = bmm(p, "feature", h, relu=False)
        hd = jax.nn.relu(jnp.concatenate([feat, g[..., 63:]], axis=-1))
        hd = bmm(p, "color_hidden", hd)
        rgb = bmm(p, "rgb", hd, relu=False)
        return rgb, sigma

    s4 = timeit(evalg, params, grouped)

    # posenc alone
    s4b = timeit(
        lambda c, gr: jnp.concatenate(
            [posenc(gr[..., :3] + c, 10), posenc(gr[..., 3:], 4)], -1
        ),
        grouped,
    )
    print(f"    posenc alone: {s4b*1e3:5.2f} ms", flush=True)

    print(f"  M={M//1024}k cap={cap}: sort {s1*1e3:5.2f}  searchsorted "
          f"{s2*1e3:5.2f}  cap-gather {s3*1e3:5.2f}  eval {s4*1e3:5.2f} ms",
          flush=True)

    # is the 6-wide (24 B, unaligned) row the problem? try 8-wide f32
    # (32 B) and 8-wide bf16 (16 B)
    for (W, dt_) in ((8, jnp.float32), (8, jnp.bfloat16), (4, jnp.float32)):
        rawW = jnp.zeros((M, W), dt_)

        def capgW(c, perm, rawW):
            pos = first[:N_NETS, None] + jnp.arange(cap)[None, :]
            valid_slot = pos < jnp.minimum(
                first[1:, None], first[:N_NETS, None] + cap
            )
            perm_pad = jnp.concatenate([perm, jnp.full((1,), M, jnp.int32)])
            src = jnp.where(valid_slot, perm_pad[jnp.clip(pos, 0, M - 1)], M)
            raw_pad = jnp.concatenate(
                [rawW + dt_(c), jnp.zeros((1, W), rawW.dtype)]
            )
            return raw_pad[src.reshape(-1)].reshape(N_NETS, cap, W)

        s = timeit(capgW, perm, rawW)
        print(f"    cap-gather [{W}x{dt_.__name__}]: {s*1e3:5.2f} ms",
              flush=True)

    # plain unstructured gather at the same shape (no valid_slot/where)
    idxp = jnp.asarray(
        np.random.RandomState(1).randint(0, M, N_NETS * cap).astype(np.int32)
    )
    raw8 = jnp.zeros((M, 8), jnp.float32)
    s = timeit(lambda c, i, r: jnp.take(r + c, i, axis=0), idxp, raw8)
    print(f"    plain [1.57M]x[8 f32] from {M//1024}k: {s*1e3:5.2f} ms",
          flush=True)


def whole(M, cf):
    rng = np.random.RandomState(0)
    key = jnp.asarray(rng.randint(0, N_NETS, M).astype(np.int32))
    local = jnp.asarray(rng.rand(M, 3).astype(np.float32))
    dirs = jnp.asarray(rng.randn(M, 3).astype(np.float32))
    mlp = MultiNetworkMLP(n_nets=N_NETS, hidden=32, n_hidden_layers=2,
                          capacity_factor=cf, dtype=jnp.bfloat16)
    params = mlp.init(jax.random.PRNGKey(0), local[:128], dirs[:128], key[:128])[
        "params"
    ]

    def full(c, params):
        return mlp.apply(
            {"params": params}, local + c, dirs, key, gather_dispatch=True
        )[0]

    s = timeit(full, params)
    print(f"  M={M//1024}k cf={cf}: whole gather_dispatch {s*1e3:6.2f} ms",
          flush=True)


def main():
    pieces(768 * 1024, 384)
    for cf in (2.0, 1.5, 1.25):
        whole(768 * 1024, cf)
    whole(640 * 1024, 2.0)
    whole(640 * 1024, 1.5)


if __name__ == "__main__":
    main()

"""Round-4: algorithmic row reduction for the vertex hash-table gradient.

The tcnn-exact vertex layout scatters 8 corner rows per (point, level):
33.5M width-F rows per Instant-NGP step. Round 3 established (honest,
chained-scalar timing) that TPU scatter-add is row-count bound at
~80 ns/row and the Pallas VMEM RMW kernel is no faster — so the fix is
fewer rows, not faster kernels (VERDICT r3 item 4).

Key structural fact: the number of DISTINCT destination rows per level
is min(N*8, V_level) where V_level = min(res^3, T) — 6.07M total across
16 levels vs 33.5M update rows (5.5x), and dead samples (zero grad)
shrink it further. This experiment measures, at the real shapes
(N=262144 pts, L=16, F=2, T=2^19):

  micro rates        sort (2/3-col int32), gather (F/16 lanes), random
                     vs sorted scatter-add, cumsum, associative_scan
  packed             shipped path: per-level [N8,16] scatter into [T/8,16]
  plain              per-level [N8,F] scatter into [T,F]
  sorted_scatter     sort idx (payload carried), scatter with
                     indices_are_sorted=True
  dedup_scatter      sort + segment-collapse (cumsum + boundary flags)
                     + compact to U=min(N8,V) rows + unique/sorted scatter
  scatter_free       sort + cumsum + merge-trick searchsorted
                     (2nd sort) + boundary-difference gathers — NO
                     scatter anywhere

Timing: ops chained through a data dependency inside lax.scan, scalar
fetched at the end (docs/benchmark.md round-3 measurement caveat).
"""

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from xrnerf_tpu.models.embedders.hashenc import (
    _level_resolutions,
    _vertex_cells,
    per_level_scale,
)

N = 4096 * 64  # points per step
L, F = 16, 2
T = 1 << 19
ITERS = 8


def timeit(fn, *args, iters=ITERS, warmup=2):
    """Chained-iteration timing: fn must accept (x, *args) where x is a
    scalar perturbation, and return an array; iterations chain through it.

    Operands are explicit jit args (NOT closures): closed-over arrays
    embed as HLO constants, and a 400 MB constant blob trips the remote
    compile relay's HTTP 413 body limit."""

    @partial(jax.jit, static_argnums=())
    def jfn(x, *a):
        def body(c, _):
            return jnp.sum(fn(c * 1e-30, *a)) * 0.0 + c, None

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
    scale = per_level_scale(2048, 16, L)
    res = tuple(int(r) for r in _level_resolutions(16, scale, L))
    cfg = (res, T, F)
    idx, t = jax.jit(lambda x: _vertex_cells(x, cfg))(x)  # [L,N,8]
    idx = jax.block_until_ready(idx)
    caps = [min(N * 8, min(r**3, T)) for r in res]
    print(f"res={res}")
    print(f"dedup caps per level: {caps}  (sum {sum(caps):,} vs rows {L*N*8:,})")

    N8 = N * 8
    idx2 = idx.reshape(L, N8)  # int32
    vals = jnp.asarray(rng.randn(L, N8, F).astype(np.float32))
    vals16 = jnp.asarray(rng.randn(N8, 16).astype(np.float32))
    lvl_fine = L - 1  # hashed level, near-uniform over T

    # ---------------- micro rates (fine level) ----------------
    i1 = idx2[lvl_fine]
    v1 = vals[lvl_fine]

    def rate(name, sec, rows):
        print(f"  {name:34s} {sec*1e3:8.2f} ms  {sec/rows*1e9:7.2f} ns/row")

    sec = timeit(lambda p, i: jax.lax.sort((i + jnp.int32(p * 0), jnp.arange(N8, dtype=jnp.int32)), num_keys=1)[0].astype(jnp.float32), i1)
    rate("sort 2-col int32", sec, N8)
    sec = timeit(
        lambda p, i, v: jax.lax.sort(
            (i + jnp.int32(p * 0), v[:, 0] + p, v[:, 1]), num_keys=1
        )[1],
        i1, v1,
    )
    rate("sort 3-col (payload f32x2)", sec, N8)
    sec = timeit(lambda p, v, g: v[g] + p, v1, i1 % N8)
    rate(f"gather {F}-lane f32 [{N8}]", sec, N8)
    sec = timeit(lambda p, v, g: v[g % N8] + p, vals16, i1)
    rate("gather 16-lane f32", sec, N8)
    sec = timeit(
        lambda p, i, v: jnp.zeros((T, F), jnp.float32).at[i].add(v + p, mode="drop"),
        i1, v1,
    )
    rate("scatter-add random (plain)", sec, N8)
    si = jax.block_until_ready(jnp.sort(i1))
    sec = timeit(
        lambda p, i, v: jnp.zeros((T, F), jnp.float32)
        .at[i]
        .add(v + p, mode="drop", indices_are_sorted=True),
        si, v1,
    )
    rate("scatter-add sorted-hint", sec, N8)
    sec = timeit(lambda p, v: jnp.cumsum(v + p, axis=0), v1)
    rate("cumsum [N8,F]", sec, N8)

    # ---------------- full-table-grad variants ----------------
    def packed(p, idx2, vals):
        lane = jnp.arange(8 * F, dtype=jnp.int32)
        out = []
        for l in range(L):
            il, gl = idx2[l], vals[l] + p
            vl = jnp.take(gl, lane % F, axis=-1)
            vl = jnp.where((lane[None, :] // F) == (il & 7)[:, None], vl, 0.0)
            out.append(
                jnp.zeros((T // 8, 8 * F), jnp.float32)
                .at[il >> 3]
                .add(vl, mode="drop")
                .reshape(T, F)
            )
        return jnp.stack(out)

    def plain(p, idx2, vals):
        return jnp.stack(
            [
                jnp.zeros((T, F), jnp.float32).at[idx2[l]].add(vals[l] + p, mode="drop")
                for l in range(L)
            ]
        )

    def sorted_scatter(p, idx2, vals):
        out = []
        for l in range(L):
            si, v0, v1_ = jax.lax.sort(
                (idx2[l], vals[l][:, 0] + p, vals[l][:, 1]), num_keys=1
            )
            out.append(
                jnp.zeros((T, F), jnp.float32)
                .at[si]
                .add(jnp.stack([v0, v1_], -1), mode="drop", indices_are_sorted=True)
            )
        return jnp.stack(out)

    def dedup_scatter(p, idx2, vals):
        """Sort, collapse each segment to its last row via cumsum
        difference, compact boundary rows to the front (2nd sort), scatter
        only U=min(rows, V_level) unique sorted rows."""
        out = []
        iota = jnp.arange(N8, dtype=jnp.int32)
        for l in range(L):
            U = caps[l]
            si, v0, v1_ = jax.lax.sort(
                (idx2[l], vals[l][:, 0] + p, vals[l][:, 1]), num_keys=1
            )
            sv = jnp.stack([v0, v1_], -1)
            cs = jnp.cumsum(sv, axis=0)  # inclusive
            is_last = jnp.concatenate([si[1:] != si[:-1], jnp.ones((1,), bool)])
            # segment total at last rows = cs[i] - cs[prev_last(i)];
            # prev_last via exclusive cummax of flagged iota
            flagged = jnp.where(is_last, iota, -1)
            prev_last = jnp.concatenate(
                [jnp.full((1,), -1, jnp.int32), jax.lax.cummax(flagged)[:-1]]
            )
            cs_prev = jnp.where(
                (prev_last >= 0)[:, None], cs[jnp.maximum(prev_last, 0)], 0.0
            )
            totals = cs - cs_prev  # valid at last rows
            # compact last rows to the front, keep first U
            order = jnp.argsort(jnp.where(is_last, si, T), stable=True)[:U]
            ui = jnp.where(is_last[order], si[order], T)  # T = dropped
            ut = totals[order]
            out.append(
                jnp.zeros((T, F), jnp.float32)
                .at[ui]
                .add(ut, mode="drop", indices_are_sorted=True, unique_indices=True)
            )
        return jnp.stack(out)

    def scatter_free(p, idx2, vals):
        """Dense grad with no scatter at all: boundary differences of the
        sorted cumsum, boundaries via the merge-trick searchsorted."""
        out = []
        for l in range(L):
            V = min(res[l] ** 3, T)
            si, v0, v1_ = jax.lax.sort(
                (idx2[l], vals[l][:, 0] + p, vals[l][:, 1]), num_keys=1
            )
            sv = jnp.stack([v0, v1_], -1)
            cs = jnp.concatenate([jnp.zeros((1, F)), jnp.cumsum(sv, axis=0)])
            q = jnp.arange(V + 1, dtype=jnp.int32)
            # merged sort of (2*key+1) and (2*query): pos(query r) = H[r]+r
            comb = jnp.concatenate([si * 2 + 1, q * 2])
            tag = jnp.concatenate(
                [jnp.full((N8,), N8 + V + 1, jnp.int32), jnp.arange(V + 1, dtype=jnp.int32)]
            )
            _, stag = jax.lax.sort((comb, tag), num_keys=1)
            pos_sorted, qid = jax.lax.sort(
                (stag, jnp.arange(N8 + V + 1, dtype=jnp.int32)), num_keys=1
            )
            # first V+1 entries are queries in order; H[r] = pos - r
            H = qid[: V + 1] - q
            g = cs[H[1:]] - cs[H[:-1]]  # [V, F]
            out.append(
                jnp.concatenate([g, jnp.zeros((T - V, F))]) if V < T else g
            )
        return jnp.stack(out)

    rows = L * N8
    ref = jax.block_until_ready(jax.jit(plain)(jnp.float32(0), idx2, vals))
    for name, fn in [
        ("packed (shipped)", packed),
        ("plain", plain),
        ("sorted_scatter", sorted_scatter),
        ("dedup_scatter", dedup_scatter),
        ("scatter_free", scatter_free),
    ]:
        try:
            got = jax.jit(fn)(jnp.float32(0), idx2, vals)
            err = float(jnp.max(jnp.abs(ref - got)))
            sec = timeit(fn, idx2, vals, iters=3, warmup=1)
            print(
                f"{name:22s} {sec*1e3:9.1f} ms/step "
                f"{sec/rows*1e9:7.2f} ns/row  max_err={err:.2e}",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            print(f"{name:22s} FAILED: {type(e).__name__}: {str(e)[:150]}", flush=True)


if __name__ == "__main__":
    main()

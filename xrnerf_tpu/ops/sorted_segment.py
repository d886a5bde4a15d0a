"""Scatter-free dense segment reduction (hash-table gradients).

TPU scatter-add is row-count bound at ~42 ns/row while sorts, gathers
and cumsums all run at ~2-3 ns/row (measured, chained-scalar timing:
``tools/exp/exp_round4_scatter.py``). The transpose of a table gather —
``out[idx[i]] += vals[i]`` over a dense [V, F] table — therefore should
not be a scatter at all:

  1. sort update rows by destination (carry a permutation, gather rows),
  2. inclusive cumsum over the sorted rows,
  3. per-destination prefix boundaries H[r] = #(idx < r) via a
     merge-trick searchsorted (the queries are ``arange(V+1)``, so their
     insertion positions fall out of one more 2-column sort),
  4. the dense result is a boundary-difference GATHER:
     ``out[r] = cs[H[r+1]] - cs[H[r]]``.

Every step is a sort/gather/cumsum — no scatter anywhere, and the output
is directly the dense table needed by the optimizer. This replaces the
atomicAdd semantics of tiny-cuda-nn's hash-encoding backward
(``/root/reference/xrnerf/models/mlps/hashnerf_mlp.py:36-45``) with the
only primitive mix TPUs are actually fast at.

Numerical note: segment totals come from differences of one f32 prefix
sum, so each total carries O(eps * |prefix|) cancellation error instead
of pure pairwise-sum error — bounded by ~1e-7 * sum|vals| here, far
inside training tolerance (tcnn itself accumulates this gradient in
fp16 on GPU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dense_segment_grad(idx: jnp.ndarray, vals: jnp.ndarray, num_rows: int) -> jnp.ndarray:
    """Dense ``[num_rows, F]`` result of ``out[idx[i]] += vals[i]``.

    idx: [N] int32 in [0, num_rows); rows with idx outside the range are
    dropped (callers flag dead rows with -1 or num_rows). vals: [N, F].
    """
    n = idx.shape[0]
    f = vals.shape[1]
    V = num_rows
    # out-of-range rows (dead samples) sort past every query and fall out
    # of the H[V] boundary
    key = jnp.where((idx >= 0) & (idx < V), idx, V)
    if f <= 4:
        # carry the value lanes through the sort: one (1+f)-operand sort
        # costs ~3.4 ns/row vs 2-col sort + payload gather at ~5 ns/row
        ops = jax.lax.sort(
            (key,) + tuple(vals[:, j] for j in range(f)), num_keys=1
        )
        si = ops[0]
        sv = jnp.stack(ops[1:], axis=-1)
    else:
        iota = jnp.arange(n, dtype=jnp.int32)
        si, perm = jax.lax.sort((key, iota), num_keys=1)
        sv = jnp.take(vals, perm, axis=0)
    cs = jnp.concatenate(
        [jnp.zeros((1, f), vals.dtype), jnp.cumsum(sv, axis=0)]
    )  # [N+1, F] inclusive prefix with leading zero

    # H[r] = #(keys < r) for r in [0, V]: merge keys (2k+1) and queries
    # (2r); with stable sorts, query r's merged position p(r) satisfies
    # H[r] = p(r) - r. A second sort by tag recovers p(r) in r-order.
    q = jnp.arange(V + 1, dtype=jnp.int32)
    comb = jnp.concatenate([si * 2 + 1, q * 2])
    tag = jnp.concatenate([jnp.full((n,), n + V + 2, jnp.int32), q])
    _, stag = jax.lax.sort((comb, tag), num_keys=1)
    _, qpos = jax.lax.sort(
        (stag, jnp.arange(n + V + 1, dtype=jnp.int32)), num_keys=1
    )
    H = qpos[: V + 1] - q  # [V+1]
    return cs[H[1:]] - cs[H[:-1]]  # [V, F]

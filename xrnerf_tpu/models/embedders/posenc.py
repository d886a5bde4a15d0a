"""Classic NeRF positional encoding — pure functions.

Parity target: the reference's ``BaseEmbedder``
(``/root/reference/xrnerf/models/embedders/base.py:8-77``): sin/cos at
octave frequencies 2^0..2^(L-1), input included, applied to points with
multires=10 and viewdirs with multires_dirs=4.

TPU note: built as one fused elementwise expression over a [..., D]
array — XLA fuses the scale+sin/cos into the consuming matmul's producer
fusion, so no Pallas kernel is needed for this op.
"""

from __future__ import annotations

import jax.numpy as jnp


def posenc(x: jnp.ndarray, num_freqs: int, include_input: bool = True) -> jnp.ndarray:
    """[..., D] -> [..., D*(include + 2*num_freqs)] with freq bands 2^i.

    Ordering matches the reference: [x, sin(2^0 x), cos(2^0 x), ...,
    sin(2^{L-1} x), cos(2^{L-1} x)] interleaved per frequency.
    """
    if num_freqs == 0:
        return x
    freqs = 2.0 ** jnp.arange(num_freqs, dtype=x.dtype)  # [L]
    xb = x[..., None, :] * freqs[:, None]  # [..., L, D]
    sin = jnp.sin(xb)
    cos = jnp.cos(xb)
    enc = jnp.stack([sin, cos], axis=-2)  # [..., L, 2, D]
    enc = enc.reshape(*x.shape[:-1], -1)  # [..., L*2*D]
    if include_input:
        enc = jnp.concatenate([x, enc], axis=-1)
    return enc


def posenc_channels(in_dim: int, num_freqs: int, include_input: bool = True) -> int:
    return in_dim * ((1 if include_input else 0) + 2 * num_freqs)

"""Conditioner MLP for coupling layers.

Behavioral parity with the reference's ``SingleTrafo`` (vmc_fluids/net.py:44-62):
tanh hidden layers, a bounded ``alpha * tanh`` output head, hidden kernels
initialized U[-1, 1] and the output kernel U[-scale, scale] with
scale = 1e-5 (net.py:39-48) -- the near-identity initialization the TDVP
dynamics' stability depends on (SURVEY.md section 7, hard part (e)).

Pure-functional: ``init`` builds a param dict, ``apply`` evaluates. Written
single-sample; callers vmap over the batch so XLA fuses the per-sample
matvecs into MXU matmuls.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def uniform_kernel(key, shape, scale, dtype):
    """U[-scale, scale], matching net.py:39-41 (uniform_init)."""
    return jax.random.uniform(
        key, shape, dtype=dtype, minval=-scale, maxval=scale
    )


def init(
    key,
    in_dim: int,
    hidden: Sequence[int],
    out_dim: int,
    out_scale: float = 1e-5,
    dtype=jnp.float32,
):
    """Returns {'w': [W0, W1, ...], 'b': [b0, b1, ...]} with len(hidden)+1 layers."""
    dims = [in_dim, *hidden, out_dim]
    n_layers = len(dims) - 1
    keys = jax.random.split(key, n_layers)
    ws, bs = [], []
    for i in range(n_layers):
        scale = out_scale if i == n_layers - 1 else 1.0
        ws.append(uniform_kernel(keys[i], (dims[i], dims[i + 1]), scale, dtype))
        bs.append(jnp.zeros((dims[i + 1],), dtype=dtype))
    return {"w": ws, "b": bs}


def apply(params, x, alpha: float = 10.0):
    """x: (..., in_dim) -> (..., out_dim); bounded output alpha*tanh(.)"""
    ws, bs = params["w"], params["b"]
    for w, b in zip(ws[:-1], bs[:-1]):
        x = jnp.tanh(x @ w + b)
    return alpha * jnp.tanh(x @ ws[-1] + bs[-1])

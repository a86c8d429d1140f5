"""Fused multi-weight Gram accumulation as a Pallas TPU kernel.

The TDVP statistics stage needs up to three (P, P) second moments of the
same centered per-sample gradient matrix O (N, P):

    S    = E[        O^T O ]   (the Gram / quantum geometric tensor)
    A    = E[ Ebar^2 O^T O ]   (per-mode SNR second moment)
    SExp = E[ logp^2 O^T O ]   (adaptive-stepper metric)

XLA computes these as three separate matmuls -- three full passes over O
(the step's largest array, N*P*4 bytes). This kernel computes all of them
in ONE pass: a blocked MXU outer-product reduction over the sample axis
with the centering (O - mean) and the per-sample weights fused into the
tile loads (the north star's "Gram matrix via on-chip outer-product
reduction", BASELINE.json).

Layout: grid (i, j, n) over (P/T, P/T) output tiles with the sample-axis
reduction as the minor grid dimension, so each (K, T, T) accumulator tile
stays resident in VMEM across the n-loop while the Pallas pipeline
double-buffers the O-tile DMAs behind the MXU.

Measured reality check (BENCHMARKS.md): at the d=32 north-star shape
(N=16384, P=9264, K=3) this kernel runs 225 ms vs 185 ms for XLA's three
separate HIGH-precision matmuls -- the contraction is MXU-compute-bound on
a v5e, so fusing the O reads buys nothing and XLA's matmul tiling wins.
The kernel is kept (correct, tested, ~f32-accurate via an in-kernel 3-pass
bf16 split) for memory-bound regimes and as the base for a future fused
backward+Gram kernel; the TDVP core deliberately uses the XLA matmuls.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_DN = (((0,), (0,)), ((), ()))


def _split_bf16(x):
    """x ~ hi + lo with bf16 components (used for the manual 3-pass
    f32-accurate contraction: Mosaic only lowers DEFAULT/HIGHEST dot
    precisions, and HIGHEST costs 6 passes)."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot_t(a, b, precision):
    """a^T b with the requested effective precision."""
    if precision == "high":
        a_hi, a_lo = _split_bf16(a)
        b_hi, b_lo = _split_bf16(b)
        dot = lambda x, y: jax.lax.dot_general(
            x, y, dimension_numbers=_DN,
            preferred_element_type=jnp.float32)
        return dot(a_hi, b_hi) + dot(a_hi, b_lo) + dot(a_lo, b_hi)
    prec = (jax.lax.Precision.HIGHEST if precision == "highest"
            else jax.lax.Precision.DEFAULT)
    return jax.lax.dot_general(a, b, dimension_numbers=_DN,
                               preferred_element_type=jnp.float32,
                               precision=prec)


def _gram_kernel(w_ref, mi_ref, mj_ref, a_ref, b_ref, out_ref, *,
                 n_weights, precision):
    """out[k] += (w_k * (A - m_i))^T (B - m_j) for one sample chunk.

    a_ref/b_ref: (C, T) chunks of O's i/j column blocks; w_ref: (K, C)
    per-sample weights; mi_ref/mj_ref: (1, T) column means of the i/j
    blocks; out_ref: (K, T, T) accumulator tile (zeroed at n == 0).
    """
    n = pl.program_id(2)

    @pl.when(n == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    a = a_ref[...] - mi_ref[...]
    b = b_ref[...] - mj_ref[...]
    for k in range(n_weights):
        wa = a * w_ref[k:k + 1, :].T
        out_ref[k] += _dot_t(wa, b, precision)


@functools.partial(
    jax.jit,
    static_argnames=("tile", "chunk", "precision", "interpret"),
)
def multi_weight_gram(
    O,
    weights,
    mean=None,
    tile: int = 256,
    chunk: int = 512,
    precision: str = "high",
    interpret: bool = False,
):
    """G[k] = (1/N) sum_n weights[k, n] (O[n] - mean) (O[n] - mean)^T.

    O: (N, P); weights: (K, N); mean: (P,) or None (computed here).
    ``precision``: "high" (manual 3-pass bf16 split, ~f32 accurate),
    "highest" (6-pass), or "default" (1-pass bf16).
    Returns (K, P, P). Requires chunk | N and tile | P (TDVP budgets are
    rounded; pad P externally if needed).
    """
    N, P = O.shape
    K = weights.shape[0]
    if N % chunk or P % tile:
        raise ValueError(f"N={N} % chunk={chunk} or P={P} % tile={tile} != 0")
    if mean is None:
        mean = jnp.mean(O, axis=0)
    mean_row = mean[None, :].astype(jnp.float32)

    grid = (P // tile, P // tile, N // chunk)
    kernel = functools.partial(_gram_kernel, n_weights=K,
                               precision=precision)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((K, chunk), lambda i, j, n: (0, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i, j, n: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i, j, n: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, tile), lambda i, j, n: (n, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, tile), lambda i, j, n: (n, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((K, tile, tile), lambda i, j, n: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K, P, P), jnp.float32),
        interpret=interpret,
    )(weights.astype(jnp.float32), mean_row, mean_row,
      O.astype(jnp.float32), O.astype(jnp.float32))
    return out / N


def multi_weight_gram_padded(O, weights, mean=None, tile: int = 256,
                             chunk: int = 512, precision: str = "high",
                             interpret: bool = False):
    """multi_weight_gram with automatic zero-padding of the parameter axis
    to the tile size (padded Gram rows/cols are exactly zero and sliced
    away)."""
    N, P = O.shape
    pad = (-P) % tile
    if pad:
        O = jnp.pad(O, ((0, 0), (0, pad)))
        if mean is not None:
            mean = jnp.pad(mean, (0, pad))
    G = multi_weight_gram(O, weights, mean=mean, tile=tile, chunk=chunk,
                          precision=precision, interpret=interpret)
    return G[:, :P, :P] if pad else G

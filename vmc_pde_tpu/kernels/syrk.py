"""Symmetric rank-k (syrk) Gram contraction as a Pallas TPU kernel.

The TDVP step's dominant FLOP term is the Gram matrix S = O^T O (and its
per-sample-weighted siblings O^T diag(w) O) for the centered score matrix
O of shape (N, P) -- the reference accumulates the same quantity as a mean
of per-sample outer products (vmc_fluids/mpi_wrapper.py:21-25, 248-274).
XLA computes it as a general matmul: every one of the (P/T)^2 output tiles
is formed, although the result is symmetric. This kernel exploits the
symmetry: it visits only the nb(nb+1)/2 lower-triangle output tiles --
HALF the MXU work and half the HBM tile traffic of the full product -- and
mirrors the triangle into the full (P, P) matrix with one elementwise
select afterwards.

Precision: f32-grade via the explicit 3-pass bf16 split (hi + lo operand
decomposition, the same algorithm XLA uses for Precision.HIGH). The split
is precomputed OUTSIDE the kernel as four bf16 operand arrays, so the
in-kernel work is exactly three MXU passes per tile pair and the total
operand bytes DMA'd equal the f32 ones.

Layout: grid (t, k) where t indexes the lower-triangle tile list (block
row/col ids delivered through scalar prefetch) and k is the sample-axis
reduction, minor so each (T, T) f32 accumulator tile stays resident in
VMEM across the whole reduction while the pipeline double-buffers the
operand DMAs behind the MXU.

Measured on the d=32 north-star shape (N=16384, P=9264, BENCHMARKS.md):
the syrk Gram takes 38 ms vs ~50 ms for XLA's HIGH full matmul (the
theoretical triangle ceiling incl. tile padding is ~27 ms; the kernel runs
at ~73% of it), taking the fused TDVP RHS from 80.3 to 73.7 ms at an
identical solver residual -- and a slightly LOWER absolute Gram error than
XLA HIGH (2.8e-6 vs 1.1e-5 max relative at that shape), because the
mirrored triangle is built from one consistent set of tile contractions.

Used automatically by the TDVP core on a single-device TPU mesh on the
direct (non-chunked) stats path (solver/tdvp.py, gram_backend="auto");
multi-device meshes keep the XLA matmul, which XLA SPMD-partitions over
dp/tp with ICI collectives, and the chunked streaming path keeps XLA too
(a per-chunk kernel call would pay the (P, P) mirror every scan step).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_DN = (((0,), (0,)), ((), ()))  # contract the (leading) sample axis


def _split_bf16(x):
    """x ~ hi + lo with bf16 components: the operand decomposition behind
    the 3-pass f32-grade MXU contraction.

    The optimization_barrier is load-bearing: under
    ``--xla_allow_excess_precision`` (set by some TPU runtimes, including
    this machine's) XLA may fold ``f32(bf16(x))`` back to ``x``, making
    ``lo`` identically zero and silently degrading the contraction to
    1-pass bf16 (measured: residual 6e-5 instead of 3e-6 at the d=32
    bench shape). The barrier pins ``hi`` to its rounded bf16 value."""
    hi = jax.lax.optimization_barrier(x.astype(jnp.bfloat16))
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _syrk_kernel(rows_ref, cols_ref, ahi_ref, alo_ref, bhi_ref, blo_ref,
                 out_ref):
    """out[t] += A_t^T B_t for one sample chunk of one triangle tile:
    three bf16 passes (hi*hi + hi*lo + lo*hi) accumulated in f32."""
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    def dot(a, b):
        return jax.lax.dot_general(a, b, dimension_numbers=_DN,
                                   preferred_element_type=jnp.float32)

    out_ref[...] += dot(ahi_ref[...], bhi_ref[...])
    out_ref[...] += dot(ahi_ref[...], blo_ref[...])
    out_ref[...] += dot(alo_ref[...], bhi_ref[...])


def _pad_axis(x, axis, to):
    pad = to - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit,
                   static_argnames=("tile", "chunk", "interpret"))
def _syrk_impl(left, right, tile, chunk, interpret):
    """right=None means right == left (the unweighted S = O^T O): the hi/lo
    split is then shared, halving the split work and HBM footprint."""
    N, P = left.shape
    Pp = -(-P // tile) * tile
    Np = -(-N // chunk) * chunk
    nb = Pp // tile

    # zero-padding contributes exactly zero to the accumulation
    left = _pad_axis(_pad_axis(left, 1, Pp), 0, Np)
    ahi, alo = _split_bf16(left)
    if right is None:
        bhi, blo = ahi, alo
    else:
        right = _pad_axis(_pad_axis(right, 1, Pp), 0, Np)
        bhi, blo = _split_bf16(right)

    rows, cols = np.tril_indices(nb)
    rows = jnp.asarray(rows, jnp.int32)
    cols = jnp.asarray(cols, jnp.int32)
    ntri = int(rows.size)

    def row_map(t, k, rr, cc):
        return (k, rr[t])

    def col_map(t, k, rr, cc):
        return (k, cc[t])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(ntri, Np // chunk),
        in_specs=[
            pl.BlockSpec((chunk, tile), row_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, tile), row_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, tile), col_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, tile), col_map, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile, tile), lambda t, k, rr, cc: (rr[t], cc[t]),
            memory_space=pltpu.VMEM,
        ),
    )
    W = pl.pallas_call(
        _syrk_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Pp, Pp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * Np * tile * tile * ntri,
            bytes_accessed=4 * ntri * Np * tile * 2 + Pp * Pp * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(rows, cols, ahi, alo, bhi, blo)

    # Mirror the valid lower-triangle tiles over the (garbage) upper ones.
    # jnp.where (select) is NaN-safe for the uninitialized upper blocks.
    ri = jax.lax.broadcasted_iota(jnp.int32, (Pp, Pp), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (Pp, Pp), 1)
    S = jnp.where((ri // tile) >= (ci // tile), W, W.T)
    return S[:P, :P] if Pp != P else S


def syrk(O, w=None, tile: int = 512, chunk: int = 1024,
         interpret: bool | None = None):
    """S = O^T diag(w) O (UNNORMALIZED sum over samples), f32.

    O: (N, P); w: per-sample weights (N,) or None. The result is symmetric
    by construction for any real w, so only the lower-triangle tiles are
    computed (half the MXU passes of a full matmul) and mirrored.

    Numerics match jnp.matmul(..., precision=HIGH): the same 3-pass bf16
    operand-split contraction with f32 accumulation. Inputs are cast to
    f32 (this kernel is the f32 compute path's backend; the f64/CPU path
    keeps the XLA matmul).

    ``interpret=None`` auto-selects interpreter mode off-TPU so the same
    code path is CI-testable on the virtual CPU mesh.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    N, P = O.shape
    O = O.astype(jnp.float32)
    if w is None:
        left, right = O, None
    else:
        left, right = O * w.astype(jnp.float32)[:, None], O
    tile = min(tile, -(-P // 128) * 128)
    chunk = min(chunk, -(-N // 16) * 16)
    return _syrk_impl(left, right, tile, chunk, interpret)

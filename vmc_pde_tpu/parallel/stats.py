"""Global sample statistics, TPU-native.

Replaces the reference's mpi_wrapper.py global_mean / global_variance /
global_covariance (mpi_wrapper.py:129-274). The reference pattern is
"psum over the local pmap axis -> host transfer -> MPI.Allreduce -> device
put"; here every statistic is an ordinary jnp reduction over a sample axis
that is sharded over the mesh, so XLA lowers it to on-fabric collectives
inside the enclosing jit. Under `shard_map` the same functions work with an
explicit axis name.

Conventions (matching the reference semantics):
- ``mean``/``variance`` reduce over leading sample axis (axis 0).
- ``second_moment_matrix(X) = E[X^T X]`` -- what mpi_wrapper.global_covariance
  actually computes (mpi_wrapper.py:21-25, 248-274): mean of per-sample outer
  products, *without* mean subtraction. The TDVP core feeds it pre-centered
  data, making it a covariance.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# On TPU, f32 matmuls lower to MXU bf16 passes; DEFAULT precision is a
# single pass (~bf16 mantissa), which is far too coarse for a Gram matrix
# whose eigenvalue spectrum spans many orders of magnitude. HIGHEST forces
# the 6-pass f32-equivalent contraction; HIGH (3-pass) halves the Gram cost
# at ~2x the rounding noise.
GRAM_PRECISION = jax.lax.Precision.HIGHEST

PRECISIONS = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
    # "f64": cast the (already f32-rounded) per-sample gradients to f64 and
    # contract in true float64 (emulated on TPU, ~an order of magnitude
    # slower and 2x the operand HBM). The statistics S, F then agree to f64
    # rounding and -- with an f64 solve -- the solver residual reaches the
    # reference's 1e-12 grade ON DEVICE even though the compute path is
    # f32 (the residual measures S/F/solve consistency, which all derive
    # from the same f32 O). BASELINE.md "matched solver tolerances" item.
    "f64": jax.lax.Precision.HIGHEST,
}

# operand dtype override per gram_precision mode (None = keep compute dtype)
GRAM_OPERAND_DTYPE = {"f64": jnp.float64}


def mean(data, axis=0):
    """E[X] over the (sharded) sample axis. (mpi_wrapper.py:166-193)"""
    return jnp.mean(data, axis=axis)


def variance(data, axis=0):
    """E[|X - E X|^2] over the sample axis (biased, like the reference:
    mpi_wrapper.py:196-245)."""
    m = jnp.mean(data, axis=axis, keepdims=True)
    d = data - m
    return jnp.mean(jnp.real(jnp.conj(d) * d), axis=axis)


def second_moment_matrix(data, preferred_dtype=jnp.float32,
                         precision=None):
    """E[X^T X] for data of shape (N, P): the Gram accumulation.

    This is the single large contraction of the TDVP step; on TPU it is an
    MXU matmul contracting the sample axis. When the sample axis is sharded
    over ``dp`` (and optionally P over ``tp``), XLA emits a reduce-scatter /
    all-reduce over ICI -- the TPU-native replacement for the reference's
    host Allreduce of the N_params^2 message (mpi_wrapper.py:150-163)."""
    n = data.shape[0]
    return jnp.matmul(
        data.T.conj(), data, preferred_element_type=preferred_dtype,
        precision=precision or GRAM_PRECISION,
    ) / n


def weighted_second_moment_matrix(data, w, preferred_dtype=jnp.float32,
                                  precision=None):
    """E[w_i X_i X_i^T] with per-sample weights w of shape (N,)."""
    n = data.shape[0]
    wd = data * w[:, None]
    return jnp.matmul(
        data.T.conj(), wd, preferred_element_type=preferred_dtype,
        precision=precision or GRAM_PRECISION,
    ) / n


def _split_bf16(x):
    """Exact f32 = hi + lo bf16 operand decomposition (the HIGH-precision
    emulation's split). The optimization_barrier pins the split under
    --xla_allow_excess_precision, which otherwise folds lo to zero
    (kernels/syrk.py:54-65)."""
    hi = jax.lax.optimization_barrier(x.astype(jnp.bfloat16))
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def sym2_gram_sum(data, w=None):
    """UNNORMALIZED symmetric Gram X^T diag(w) X (shape (N, P) -> (P, P),
    ``w`` None or any-signed) in TWO bf16 MXU passes instead of XLA
    HIGH's three.

    HIGH emulates the f32 matmul A@B as Ah@Bh + Ah@Bl + Al@Bh (hi/lo bf16
    splits, lo@lo dropped). For the symmetric Gram the operands coincide,
    so the third pass is the transpose of the second:

        X^T X ~= H^T H + H^T L + (H^T L)^T,

    i.e. the same three terms HIGH sums, from only two MXU passes -- a
    1.5x FLOP reduction on the dominant contraction of the TDVP step at
    identical numerics class (same dropped term, same per-pass rounding).
    Weights fold in as X <- sqrt(|w|) X with the SIGN applied to one
    side's hi-split only: with S = diag(sign w), Hs = S H is exact in
    bf16 (a sign flip touches no mantissa bits), and

        X^T diag(w) X ~= Hs^T H + Hs^T L + (Hs^T L)^T

    since (Hs^T L)^T = L^T S H -- the operand symmetry survives signed
    weights (used by the chunked path's sum_EOO moment, whose weight is
    the centered Eloc). f32 data only. Sharding-transparent: both matmuls
    are ordinary dot_generals, so the dp-sharded sample contraction still
    lowers to on-fabric collectives under the enclosing jit."""
    x = data.astype(jnp.float32)
    if w is not None:
        wf = w.astype(jnp.float32)
        x = x * jnp.sqrt(jnp.abs(wf))[:, None]
    hi, lo = _split_bf16(x)
    hs = hi if w is None else hi * jnp.sign(wf)[:, None]
    m1 = jnp.matmul(hs.T, hi, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT)
    m2 = jnp.matmul(hs.T, lo, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT)
    return m1 + m2 + m2.T


def covariance_matrix(data, preferred_dtype=jnp.float32):
    """True covariance E[(X-m)^T (X-m)] in one pass (centering fused)."""
    m = jnp.mean(data, axis=0, keepdims=True)
    return second_moment_matrix(data - m, preferred_dtype=preferred_dtype)

"""Randomized quasi-Monte Carlo (scrambled Sobol) latent sampling.

No reference counterpart (vmc_fluids/sampler.py:25-34 draws iid
pseudo-random latents): this is a pure accuracy-per-sample upgrade for the
exact-latent paths. Every statistics batch in the TDVP step -- force, Gram,
and the per-step observables -- is an integral over the latent base
distribution estimated from N draws; replacing the iid draws with a
low-discrepancy point set cuts the estimator error from the Monte-Carlo
O(N^-1/2) toward the QMC O(N^-1 log^d N) for the smooth integrands this
framework produces (log-density, scores, moments through a smooth flow).
Measured on the dim-8 Gauss headline it removes most of the
observable-estimator noise at the reference's own 10^4-sample budget
(BENCHMARKS.md).

Design (TPU-native):

- Sobol points are generated IN-JIT from the (30, dim) uint32
  direction-number table: point i is the XOR of direction numbers selected
  by the bits of gray(i) = i ^ (i >> 1). The generator is 30 unrolled
  masked-XOR passes over an (n, dim) uint32 array -- elementwise in the
  sample axis, so it shards over ``dp`` with zero communication and costs
  ~one HBM pass of the latent batch. No host-side table of points, nothing
  baked into the executable beyond the tiny direction table.
- Randomization is a per-call Matousek linear-matrix scramble of the
  direction table plus a random digital shift (both derived from the
  call's PRNG key): each call draws an independent random (t, s)-net --
  unbiased, fresh across steps/stages, equidistribution preserved. The
  LMS matters for time evolution: a shift-only randomization reuses ONE
  fixed net's internal structure every step, letting structured estimator
  errors persist across the trajectory; the scramble re-randomizes that
  structure per call (same construction scipy's Sobol(scramble=True)
  uses; Matousek 1998, J. Complexity).
- Uniforms map to Gaussians through the inverse CDF (jax.scipy.special
  ndtri) with a mirror trick: the integer grid is reflected exactly in
  uint32 (v = 2^30-1-bits), and the half with the SMALLER uniform is
  inverted so both tails reach |z| ~ 6.4 sigma at full f32 accuracy
  (naively, 1-u in f32 quantizes the upper tail to ~5.4 sigma).
- The direction numbers come from scipy's Sobol tables (Joe & Kuo 2008
  data, scipy.stats.qmc.Sobol) -- scipy is a hard dependency of this image;
  the extraction is guarded with a clear error if the private layout ever
  changes, and unit tests pin the generated points bit-exactly against
  scipy's public API.

Sequence-prefix note: any prefix of a Sobol sequence is low-discrepancy
(it is a (t, s)-sequence), so arbitrary sample budgets work; powers of two
are the sweet spot. The TDVP budgets are whatever the sampler rounding
produces -- no power-of-two requirement is imposed.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

_BITS = 30  # scipy's Sobol tables carry 30-bit direction numbers
_MASK = np.uint32((1 << _BITS) - 1)


@lru_cache(maxsize=None)
def direction_numbers(dim: int) -> np.ndarray:
    """(30, dim) uint32 Sobol direction-number table (host constant).

    Extracted from scipy's Joe-Kuo tables; validated bit-exactly against
    scipy.stats.qmc.Sobol points in tests/test_sampling.py."""
    if dim < 1:
        raise ValueError("dim must be >= 1")
    try:
        from scipy.stats import qmc as _scipy_qmc

        sv = np.asarray(_scipy_qmc.Sobol(d=dim, scramble=False)._sv)
    except (ImportError, AttributeError) as e:  # pragma: no cover
        raise RuntimeError(
            "QMC sampling needs scipy's Sobol direction numbers "
            "(scipy.stats.qmc.Sobol._sv); scipy is missing or its internal "
            "layout changed -- use the default pseudo-random sampling"
        ) from e
    if sv.shape != (dim, _BITS):  # pragma: no cover
        raise RuntimeError(
            f"unexpected scipy Sobol table shape {sv.shape}; expected "
            f"({dim}, {_BITS})"
        )
    return np.ascontiguousarray(sv.T.astype(np.uint32))


def sobol_bits(dim: int, n: int):
    """First n Sobol points as (n, dim) uint32 in [0, 2^30). In-jit:
    30 unrolled masked XORs, elementwise in the sample axis."""
    V = jnp.asarray(direction_numbers(dim))  # (30, dim), tiny constant
    i = jnp.arange(n, dtype=jnp.uint32)
    gray = i ^ (i >> 1)
    acc = jnp.zeros((n, dim), dtype=jnp.uint32)
    for k in range(_BITS):
        bit = ((gray >> k) & 1).astype(jnp.uint32)[:, None]  # (n, 1)
        acc = acc ^ (bit * V[k][None, :])
    return acc


def _lms_directions(key, dim: int):
    """Matousek linear-matrix-scrambled direction numbers: per dimension a
    random unit-diagonal lower-triangular GF(2) matrix M maps digit vectors
    a -> M a, which commutes with the Sobol XOR construction -- so it is
    applied ONCE to the (30, dim) direction table instead of per point
    (the same construction scipy's Sobol(scramble=True) uses). Digit b
    (most significant first) lives at bit 29-b of the uint32 word; column
    c of M is the word with bit 29-c set (unit diagonal) and random bits
    strictly below it (rows b > c)."""
    V = jnp.asarray(direction_numbers(dim))  # (30, dim)
    rnd = jax.random.bits(key, (_BITS, dim), dtype=jnp.uint32)
    out = jnp.zeros_like(V)
    for c in range(_BITS):
        col_mask = np.uint32((1 << (_BITS - 1 - c)) - 1)  # rows b > c
        mcol = (rnd[c] & col_mask) | np.uint32(1 << (_BITS - 1 - c))
        digit_c = (V >> (_BITS - 1 - c)) & 1  # (30, dim)
        out = out ^ (digit_c * mcol[None, :])
    return out


def scrambled_bits(key, dim: int, n: int):
    """Scrambled Sobol points: Matousek linear matrix scramble of the
    direction numbers + a random digital shift, both derived from ``key``.
    Each call with a fresh key draws an independent, unbiased random net --
    not merely a shifted copy of one fixed net (a shift-only randomization
    leaves the net's internal structure identical across calls, which lets
    structured estimator errors persist across time steps; the LMS
    re-randomizes that structure per call)."""
    k_lms, k_shift = jax.random.split(key)
    V = _lms_directions(k_lms, dim)
    shift = jax.random.bits(k_shift, (dim,), dtype=jnp.uint32) & _MASK
    i = jnp.arange(n, dtype=jnp.uint32)
    gray = i ^ (i >> 1)
    acc = jnp.zeros((n, dim), dtype=jnp.uint32)
    for k in range(_BITS):
        bit = ((gray >> k) & 1).astype(jnp.uint32)[:, None]
        acc = acc ^ (bit * V[k][None, :])
    return acc ^ shift[None, :]


def _mirrored_ndtri(bits, dtype):
    """Standard normals from 30-bit uniforms via the inverse CDF, with the
    exact-integer mirror so both tails keep full small-u accuracy:
    z = ndtri(u) for u <= 1/2, z = -ndtri(1 - u) otherwise, where 1 - u is
    computed on the uint grid (2^30-1-bits) before the float conversion."""
    from jax.scipy.special import ndtri

    upper = bits >> (_BITS - 1) == 1  # u >= 1/2
    small = jnp.where(upper, _MASK - bits, bits)  # min(bits, mirror)
    u = (small.astype(dtype) + dtype(0.5)) * dtype(2.0**-_BITS)
    z = ndtri(u)  # <= 0 (u <= 1/2)
    return jnp.where(upper, -z, z)


def normal(key, n: int, dim: int, dtype=jnp.float32):
    """(n, dim) standard-normal RQMC draws (scrambled-Sobol + inverse CDF).
    Drop-in for jax.random.normal(key, (n, dim), dtype) with the same key
    semantics: a fresh key gives an independent randomization."""
    dtype = jnp.dtype(dtype).type
    return _mirrored_ndtri(scrambled_bits(key, dim, n), dtype)


def uniform(key, n: int, dim: int, dtype=jnp.float32):
    """(n, dim) RQMC uniforms on (0, 1), centered on the 2^-30 grid."""
    dtype = jnp.dtype(dtype).type
    bits = scrambled_bits(key, dim, n)
    return (bits.astype(dtype) + dtype(0.5)) * dtype(2.0**-_BITS)


def chi2(key, nu, n: int, dtype=jnp.float32, newton_iters: int = 25):
    """(n,) RQMC chi-square(nu) draws from a fresh 1-D net (see
    chi2_from_bits for the inversion)."""
    return chi2_from_bits(scrambled_bits(key, 1, n)[:, 0], nu,
                          dtype=dtype, newton_iters=newton_iters)


def chi2_from_bits(bits, nu, dtype=jnp.float32, newton_iters: int = 25):
    """chi-square(nu) draws from 30-bit uniforms by inverting the
    regularized lower incomplete gamma function P(nu/2, x) = u with Newton
    iterations from a Wilson-Hilferty initial guess (chi2 = 2x). ``nu`` may
    be a traced scalar (the Student-t degrees of freedom are learnable).
    Newton on a smooth monotone CDF from the WH guess converges in a
    handful of steps; 25 fixed iterations leave roundoff-level residuals
    over the whole nu in [1, 100] x u in (2^-30, 1-2^-30) range
    (tests/test_sampling.py). Taking ``bits`` (rather than a key) lets the
    Student-t sampler use one JOINT (dim+1)-dimensional net for directions
    and radius."""
    from jax.scipy.special import gammainc, gammaln, ndtri

    dtype = jnp.dtype(dtype).type
    # f64 inversion when enabled: the CDF curvature near u -> 1 amplifies
    # f32 rounding; cast back at the end.
    idt = jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32
    u = (bits.astype(idt) + idt(0.5)) * idt(2.0**-_BITS)
    k = (jnp.asarray(nu, idt) / 2.0) * jnp.ones((), idt)
    # Initial guess, two regimes:
    # - Wilson-Hilferty chi2_q ~= nu (1 - 2/(9 nu) + z sqrt(2/(9 nu)))^3 --
    #   excellent for moderate u, useless in the left tail at small nu
    #   (it can go negative);
    # - left-tail asymptotic P(k, x) ~= x^k / (k Gamma(k)) inverted:
    #   log x = (log u + log k + gammaln(k)) / k.
    nu_i = 2.0 * k
    z = ndtri(u)
    wh = 0.5 * nu_i * (1.0 - 2.0 / (9.0 * nu_i)
                       + z * jnp.sqrt(2.0 / (9.0 * nu_i))) ** 3
    log_x_tail = (jnp.log(u) + jnp.log(k) + gammaln(k)) / k
    log_x0 = jnp.where(wh > 0.05 * k, jnp.log(jnp.maximum(wh, 1e-30)),
                       log_x_tail)

    # Newton in LOG space (y = log x): multiplicative steps survive the
    # left tail where x spans many decades below 1 --
    # dF/dy = pdf(x) x = exp(k log x - x - gammaln(k)).
    def body(_, y):
        x = jnp.exp(y)
        f = gammainc(k, x) - u
        log_dfdy = k * y - x - gammaln(k)
        step = f * jnp.exp(-log_dfdy)
        return y - jnp.clip(step, -3.0, 3.0)

    y = jax.lax.fori_loop(0, newton_iters, body, log_x0)
    return (2.0 * jnp.exp(y)).astype(dtype)

"""Latent base distributions: multivariate Gaussian and Student-t with a
learnable Cholesky-parametrized covariance, mean, and (Student-t) learnable
degrees of freedom.

Parity with the reference's latent pdfs (vmc_fluids/net.py:10-36) and the
covariance construction (util.py:21-26): the covariance is S = L @ L.T where
L is upper-triangular with strictly-upper entries from the packed parameter
vector and diag(L) = exp(L_diag).

TPU-native deltas vs the reference:
- log-densities use a triangular solve against L instead of materializing
  inv(S) and det(S) (net.py:19-20 computes jnp.linalg.inv + det per sample);
  log det S = 2 * sum(L_diag) is free.
- sampling draws z = mu + L @ eps directly from the stored factor instead of
  re-factorizing S inside jax.random.multivariate_normal (sampler.py:25-26).
- the Student-t chi^2 draw is a keyed, device-resident jax.random.chisquare
  (fixes quirk Q4: sampler.py:32 used the unseeded NumPy global RNG).
- the Student-t log-density includes the -1/2 log det S normalization term
  that the reference omits (net.py:35-36, quirk Q8 in our survey); the term
  is constant in x so it does not alter the TDVP dynamics (centered
  gradients), but it is required for the integral/entropy diagnostics to be
  meaningful once S deviates from the identity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.special import gammaln

NAMES = ("Gauss", "Student_t", "cos_dist", "double_well")
EXACT_NAMES = ("Gauss", "Student_t")  # closed-form samplers exist

# Normalization of the 2D cosine bump f(x) = (1 + cos(pi * min(1, 4|x|)))/2:
# Z = pi/32 - 1/(8 pi) (compact support |x| <= 1/4). The reference declares
# this latent in its mode table (main.py:33 "cos_dist") but its network only
# implements Gauss/Student_t (net.py:197-199) -- the fluidpaper mode would
# KeyError as shipped (quirk Q9). Here it is a first-class, normalized
# latent density so the advection workload runs end to end.
_COS_BUMP_LOG_Z_2D = float(np.log(np.pi / 32.0 - 1.0 / (8.0 * np.pi)))


def n_extra_params(name: str) -> int:
    """Number of extra scalar distribution parameters (net.py:197-198)."""
    return {"Gauss": 0, "Student_t": 1, "cos_dist": 0, "double_well": 0}[name]


def init_params(dim: int, name: str, dtype=jnp.float32):
    """Zero-initialized latent parameters (net.py:201-204): S = I, mu = 0,
    nu_raw = 0 (=> nu = 2 for Student-t)."""
    return {
        "L": jnp.zeros(((dim * dim - dim) // 2,), dtype=dtype),
        "L_diag": jnp.zeros((dim,), dtype=dtype),
        "mu": jnp.zeros((dim,), dtype=dtype),
        "dist_params": jnp.zeros((n_extra_params(name),), dtype=dtype),
    }


def chol_factor(latent_params, dim: int):
    """Upper-triangular factor L with S = L @ L.T (util.py:21-26)."""
    L = jnp.zeros((dim, dim), dtype=latent_params["L_diag"].dtype)
    iu = np.triu_indices(dim, k=1)
    L = L.at[iu].set(latent_params["L"])
    return L + jnp.diag(jnp.exp(latent_params["L_diag"]))


def cov_matrix(latent_params, dim: int):
    L = chol_factor(latent_params, dim)
    return L @ L.T


def log_det_cov(latent_params):
    return 2.0 * jnp.sum(latent_params["L_diag"])


def nu_value(latent_params):
    """Student-t degrees of freedom nu = exp(theta) + 1 (net.py:32)."""
    return jnp.exp(latent_params["dist_params"][0]) + 1.0


def _mahalanobis_sq(latent_params, dim, x):
    """x^T S^{-1} x via triangular solve (x already mean-shifted)."""
    L = chol_factor(latent_params, dim)
    y = jax.scipy.linalg.solve_triangular(L, x, lower=False)
    return jnp.sum(y * y)


def gauss_log_prob(latent_params, dim: int, x):
    """log N(x; mu, S) for a single x of shape (dim,) (net.py:10-20)."""
    xc = x - latent_params["mu"]
    quad = _mahalanobis_sq(latent_params, dim, xc)
    return -0.5 * (
        dim * jnp.log(2.0 * jnp.pi) + log_det_cov(latent_params) + quad
    )


def student_t_log_prob(latent_params, dim: int, x):
    """log t_nu(x; mu, S) for a single x (net.py:23-36 + Q8 normalization)."""
    nu = nu_value(latent_params)
    xc = x - latent_params["mu"]
    quad = _mahalanobis_sq(latent_params, dim, xc)
    return (
        gammaln((nu + dim) / 2.0)
        - gammaln(nu / 2.0)
        - 0.5 * dim * jnp.log(nu * jnp.pi)
        - 0.5 * log_det_cov(latent_params)
        - 0.5 * (nu + dim) * jnp.log1p(quad / nu)
    )


def cos_bump_log_prob(latent_params, dim: int, x):
    """Normalized cosine bump (sampler.py:20-22 shape + proper log Z).
    The Cholesky/mean latent parameters are unused (the bump is fixed; the
    flow learns all deformation). 2D only, like the reference workload."""
    if dim != 2:
        raise ValueError("cos_dist latent is defined for dim=2")
    r = jnp.minimum(1.0, 4.0 * jnp.sqrt(jnp.sum(x * x)))
    return jnp.log(0.5 * (1.0 + jnp.cos(jnp.pi * r))) - _COS_BUMP_LOG_Z_2D


# Double-well Boltzmann latent (no reference counterpart; BASELINE.json
# config 3 "anharmonic/double-well Fokker-Planck with Metropolis sampling").
# Phase-space [x, p] layout, a thermal state of the double-well Hamiltonian
# at the QUENCH temperature T0:
#     p(z) \propto exp(-( DW_V2/2 x^2 + DW_LAM x^4 + p^2/2 ) / DW_T0)
# The x-marginal normalization has no closed form -- exactly why this latent
# needs the Metropolis sampler -- so log Zx is computed once by quadrature
# (eager, f64). Constants match the `doubleWell` preset's bath potential
# (v2=-4, lam=1: wells at x=+-1, barrier 1) with T0 = 3 x the bath T=0.5,
# so the workload is a temperature quench toward the sharper bimodal
# stationary state.
DW_V2, DW_LAM, DW_T0 = -4.0, 1.0, 1.5


def dw_x_quadrature():
    """(xs, unnormalized pdf) of the latent's x-marginal on the dense
    quadrature grid -- the single source for both the normalization below
    and the oracle's inverse-CDF initializer (oracle/sde.py)."""
    xs = np.linspace(-8.0, 8.0, 400001)
    v = 0.5 * DW_V2 * xs**2 + DW_LAM * xs**4
    return xs, np.exp(-v / DW_T0)


def _dw_log_zx():
    xs, pdf = dw_x_quadrature()
    return float(np.log(np.trapezoid(pdf, xs)))


_DW_LOG_Z = _dw_log_zx() + 0.5 * float(np.log(2.0 * np.pi * DW_T0))


def double_well_log_prob(latent_params, dim: int, x):
    """Normalized double-well Boltzmann density for a single z = [x, p].
    The Cholesky/mean latent parameters are unused (the distribution is
    fixed; the flow learns all deformation), like the cosine bump. 2D
    phase space only."""
    if dim != 2:
        raise ValueError("double_well latent is defined for dim=2 ([x, p])")
    q, p = x[0], x[1]
    h = 0.5 * DW_V2 * q**2 + DW_LAM * q**4 + 0.5 * p**2
    return -h / DW_T0 - _DW_LOG_Z


def student_t_tempered_sample(key, latent_params, dim: int, n: int,
                              gamma, dtype=jnp.float32, qmc: bool = False):
    """Tail-tempered importance proposal for Student-t TDVP statistics
    (no reference counterpart; targets the heavy-tail MC bias isolated in
    BENCHMARKS.md's Student-t ablation): draw z from the HEAVIER-tailed
    t_{nu_q}(mu, S) with nu_q = max(gamma * nu, 1.05) (gamma < 1) and
    return (z, log_w), log_w = log t_nu(z) - log t_{nu_q}(z).

    Because the proposal dominates the target's tails, the weights are
    bounded above, so self-normalized IS is stable -- and the tail region
    that carries the score-matrix bias is oversampled with down-weighted
    draws instead of being a rare catastrophic event."""
    nu = nu_value(latent_params)
    nu_q = jnp.maximum(jnp.asarray(gamma, nu.dtype) * nu, 1.05)
    q_params = dict(latent_params)
    q_params["dist_params"] = jnp.log(nu_q - 1.0).reshape(1).astype(
        latent_params["dist_params"].dtype)
    z = sample("Student_t", key, q_params, dim, n, dtype, qmc=qmc)
    log_w = jax.vmap(
        lambda v: student_t_log_prob(latent_params, dim, v)
        - student_t_log_prob(q_params, dim, v)
    )(z)
    return z, log_w


def log_prob(name: str, latent_params, dim: int, x):
    if name == "Gauss":
        return gauss_log_prob(latent_params, dim, x)
    if name == "Student_t":
        return student_t_log_prob(latent_params, dim, x)
    if name == "cos_dist":
        return cos_bump_log_prob(latent_params, dim, x)
    if name == "double_well":
        return double_well_log_prob(latent_params, dim, x)
    raise ValueError(f"unknown latent distribution {name!r}")


def sample(name: str, key, latent_params, dim: int, n: int, dtype=jnp.float32,
           qmc: bool = False):
    """Draw n latent samples, shape (n, dim). Keyed and device-resident.

    Gauss:      z = mu + L eps                      (sampler.py:25-26)
    Student_t:  z = mu + L eps * sqrt(nu / chi2_nu) (sampler.py:29-34, keyed)

    ``qmc=True`` draws eps (and the Student-t chi^2) from a randomized
    scrambled-Sobol net instead of iid pseudo-randoms (sampling/qmc.py):
    same key semantics (a fresh key gives an independent randomization),
    markedly lower estimator error for the smooth latent-expectation
    integrands of the TDVP statistics. No reference counterpart.
    """
    if name not in EXACT_NAMES:
        raise ValueError(f"no closed-form sampler for latent {name!r}")
    k_eps, k_chi = jax.random.split(key)
    L = chol_factor(latent_params, dim).astype(dtype)
    if qmc:
        from ..sampling import qmc as _qmc

        # one (dim + 1)-dimensional net: the chi^2 mixing variable is the
        # extra QMC coordinate, so radius and directions equidistribute
        # JOINTLY for Student-t (two independent nets would not)
        if name == "Student_t":
            bits = _qmc.scrambled_bits(k_eps, dim + 1, n)
            eps = _qmc._mirrored_ndtri(bits[:, :dim],
                                       jnp.dtype(dtype).type)
        else:
            eps = _qmc.normal(k_eps, n, dim, dtype=dtype)
    else:
        eps = jax.random.normal(k_eps, (n, dim), dtype=dtype)
    z = eps @ L.T
    if name == "Student_t":
        nu = nu_value(latent_params).astype(dtype)
        if qmc:
            u = _qmc.chi2_from_bits(bits[:, dim], nu, dtype=dtype)
        else:
            u = jax.random.chisquare(k_chi, nu, shape=(n,), dtype=dtype)
        z = z * jnp.sqrt(nu / u)[:, None]
    return z + latent_params["mu"].astype(dtype)

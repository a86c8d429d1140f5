"""Exact-dynamics oracle: particle/SDE integration of the same PDEs, used as
ground truth for validating the variational solver.

Parity with vmc_fluids/exact_dyn.py: RK4-discretized update with per-stage
noise whose variance is scaled by the stage weight (exact_dyn.py:55-82) for

- pure diffusion            dx = D * sqrt(2/dt) N(0,1)     (exact_dyn.py:65-67)
- phase-space Fokker-Planck dx = v_H + noise+damping on momenta
                                                           (exact_dyn.py:55-62)
- deterministic advection

TPU-native deltas: the full time loop runs inside one jit via lax.scan
(the reference jits only a single RK4 step), keys are threaded, and
observables (means / covariance / ball-counting integrals) are computed
on-device per step.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.evolution import velocity_field_hamiltonian, velocity_field_mlpaper


def drift_diffusion(coord, t, dt, key, D=1.0, **_):
    """Pure-diffusion 'velocity' with discretized noise (exact_dyn.py:65-67)."""
    return D * jnp.sqrt(2.0 / dt) * jax.random.normal(key, coord.shape,
                                                      dtype=coord.dtype)


def drift_phase_space(coord, t, dt, key, m=1.0, omega=1.0, lam=0.0,
                      gamma=1.0, T=10.0, v2=1.0, coupled=False,
                      onsite=0.0, **_):
    """Hamiltonian advection + momentum noise + damping (exact_dyn.py:55-62).
    ``v2`` < 0 with ``lam`` > 0: the double-well potential (config 3);
    ``coupled``: the interacting chain potential sum (x_i - x_{i-1})^2
    (config 4); ``T`` may be a per-site tuple (length dim // 2) for the
    heat-transport setting (ops.evolution.FokkerPlanck per-site baths)."""
    mask = jnp.zeros_like(coord).at[1::2].set(1.0)
    v_adv = velocity_field_hamiltonian(coord, t, m=m, omega=omega, lam=lam,
                                       v2=v2, coupled=coupled,
                                       onsite=onsite)
    Tv = jnp.asarray(T, dtype=coord.dtype)
    if Tv.ndim > 0:
        Tv = jnp.repeat(Tv, 2)  # per-site -> per-coordinate (x_i, p_i)
    v_diff = jnp.sqrt(2.0 * m * gamma * Tv / dt) * jax.random.normal(
        key, coord.shape, dtype=coord.dtype
    )
    v_damp = -gamma * coord
    return v_adv + (v_diff + v_damp) * mask


def drift_advection_paper(coord, t, dt, key, T=5.0, **_):
    return velocity_field_mlpaper(coord, t, T)


DRIFTS = {
    "diffusion": drift_diffusion,
    "phase_space": drift_phase_space,
    "advection_paper": drift_advection_paper,
}


def mcmc_init_cloud(key, n: int, offset, bound: float = 0.25,
                    n_chains: int = 256, burn_in: int = 200,
                    dtype=jnp.float64):
    """MCMC-initialized particle cloud from the paper's cosine-bump density
    -- the fluidpaper oracle's initial condition (exact_dyn.py:89-96).
    Metropolis with uniform-in-ball independence proposals; ``burn_in``
    sweeps are discarded before collecting ceil(n / n_chains) sweeps."""
    from functools import partial

    from ..sampling.sampler import (cos_dist_log_prob, metropolis_chain,
                                    radial_proposal)

    off = jnp.asarray(offset, dtype=dtype)
    info = {"offset": off, "bound": bound}
    k_init, k_run = jax.random.split(key)
    init = radial_proposal(k_init, n_chains, off.shape[0], info).astype(dtype)
    n_steps = -(-n // n_chains) + burn_in
    samples, _, _ = metropolis_chain(
        k_run, init, partial(cos_dist_log_prob, offset=off),
        radial_proposal, n_steps, info,
    )
    return samples[burn_in * n_chains:][:n]


def double_well_init_cloud(key, n: int, dtype=jnp.float64):
    """Exact particle cloud from the double-well Boltzmann latent
    (models/latent.py double_well_log_prob, quench temperature DW_T0):
    x by inverse-CDF on a dense quadrature grid (the marginal has no
    closed form), p ~ N(0, DW_T0). Independent of the model's Metropolis
    chains, so oracle-vs-model comparisons share no sampling machinery."""
    from ..models.latent import DW_T0, dw_x_quadrature

    xs, pdf = dw_x_quadrature()
    cdf = np.cumsum(pdf)
    cdf /= cdf[-1]
    k_u, k_p = jax.random.split(key)
    u = np.asarray(jax.random.uniform(k_u, (n,), dtype=jnp.float64))
    x = np.interp(u, cdf, xs)
    p = np.sqrt(DW_T0) * np.asarray(
        jax.random.normal(k_p, (n,), dtype=jnp.float64))
    return jnp.asarray(np.stack([x, p], axis=1), dtype=dtype)


def rk4_sde_step(coord, t, dt, key, drift: Callable, params: dict):
    """One RK4 step with stage-weighted noise (exact_dyn.py:70-76): stage k_i
    with Butcher weight w_i draws noise with dt_eff = w_i * dt."""
    keys = jax.random.split(key, 4)
    f = partial(drift, **params)
    k1 = f(coord, t, dt / 6.0, keys[0])
    k2 = f(coord + dt * 0.5 * k1, t + 0.5 * dt, dt / 3.0, keys[1])
    k3 = f(coord + dt * 0.5 * k2, t + 0.5 * dt, dt / 3.0, keys[2])
    k4 = f(coord + dt * k3, t + dt, dt / 6.0, keys[3])
    return coord + dt * (k1 + 2.0 * k2 + 2.0 * k3 + k4) / 6.0


def evolve(
    coords,
    t0: float,
    dt: float,
    n_steps: int,
    drift_name: str = "diffusion",
    params: Optional[dict] = None,
    key=None,
    integral_T: float = 10.0,
    record_every: int = 1,
):
    """Integrate the particle cloud and record observables each step. Whole
    loop is one jitted lax.scan. Returns (final coords, infos dict of arrays)."""
    params = dict(params or {})
    key = key if key is not None else jax.random.PRNGKey(0)
    drift = DRIFTS[drift_name]
    lims = jnp.sqrt(integral_T) * jnp.array([1.0, 0.5, 0.1])

    def observables(c):
        mean = jnp.mean(c, axis=0)
        cc = c - mean
        covar = (cc.T @ cc) / c.shape[0]
        r = jnp.linalg.norm(c, axis=-1)
        ints = jnp.stack([jnp.mean((r < l).astype(c.dtype)) for l in lims])
        return mean, covar, ints

    def step(carry, i):
        c, k = carry
        k, ku = jax.random.split(k)
        t = t0 + i * dt
        mean, covar, ints = observables(c)
        keys = jax.random.split(ku, c.shape[0])
        c = jax.vmap(
            lambda ci, ki: rk4_sde_step(ci, t, dt, ki, drift, params)
        )(c, keys)
        return (c, k), (t, mean, covar, ints)

    @jax.jit
    def scan_all(c, k):
        return jax.lax.scan(step, (c, k), jnp.arange(n_steps))

    (coords, _), (ts, means, covars, ints) = scan_all(coords, key)
    infos = {
        "times": ts,
        "x1": means,
        "covar": covars,
        "integral_1sigma": ints[:, 0],
        "integral_0.5sigma": ints[:, 1],
        "integral_0.1sigma": ints[:, 2],
    }
    return coords, infos

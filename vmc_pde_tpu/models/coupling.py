"""Affine coupling blocks (RealNVP family) with exact inverses and
log-Jacobians.

Parity with the reference's ``SingleBlock`` (vmc_fluids/net.py:65-153), all
four variants plus the optional learned global affine:

- ``additive``    (net.py jac_eq_1):      v = u + s(.)           log|J| = 0
- ``affine``      (net.py different_add): v = u * exp(s) + t(.)  log|J| = sum s
- ``scale``       (net.py no_add, the reference default net.py:71):
                                          v = u * exp(s)         log|J| = sum s
- ``scale_shift`` (net.py else-branch):   v = u * exp(s) + s     log|J| = sum s

Each block splits coordinates into two static half-partitions (ind_up /
ind_down), transforms ind_up conditioned on ind_down, then ind_down
conditioned on the new ind_up. The partitions are compile-time constants
(python tuples), so the gathers/scatters lower to cheap static ops on TPU.

Functional API: ``init`` -> params dict; ``forward``/``inverse`` operate on a
single (dim,) sample and are vmapped by callers.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import mlp

VARIANTS = ("additive", "affine", "scale", "scale_shift")


@dataclasses.dataclass(frozen=True)
class BlockSpec:
    """Static (hashable) block description."""

    ind_up: Tuple[int, ...]
    ind_down: Tuple[int, ...]
    hidden: Tuple[int, ...] = (3,)
    variant: str = "scale"
    global_affine: bool = False
    alpha: float = 10.0
    out_scale: float = 1e-5

    def __post_init__(self):
        if self.variant not in VARIANTS:
            raise ValueError(f"unknown coupling variant {self.variant!r}")
        if set(self.ind_up) & set(self.ind_down):
            raise ValueError("ind_up and ind_down overlap")

    @property
    def dim(self) -> int:
        return len(self.ind_up) + len(self.ind_down)

    @property
    def inverse_perm(self) -> Tuple[int, ...]:
        """Static permutation with concat(v_up, v_down)[inverse_perm][i] ==
        the value belonging at coordinate i. Lets the recombination be a
        gather with compile-time indices instead of two scatters (gathers
        vectorize better on TPU and avoid an XLA SPMD scatter-padding issue
        observed when the parameter axis is sharded)."""
        order = list(self.ind_up) + list(self.ind_down)
        inv = [0] * len(order)
        for pos, coord in enumerate(order):
            inv[coord] = pos
        return tuple(inv)


def init(key, spec: BlockSpec, dtype=jnp.float32):
    n_up, n_down = len(spec.ind_up), len(spec.ind_down)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    # s1 conditions on the (already transformed) up-half and drives the
    # down-half; s2 conditions on the down-half and drives the up-half
    # (net.py:75-76).
    params = {
        "s1": mlp.init(k1, n_up, spec.hidden, n_down, spec.out_scale, dtype),
        "s2": mlp.init(k2, n_down, spec.hidden, n_up, spec.out_scale, dtype),
    }
    if spec.variant == "affine":
        params["t1"] = mlp.init(k3, n_up, spec.hidden, n_down, spec.out_scale, dtype)
        params["t2"] = mlp.init(k4, n_down, spec.hidden, n_up, spec.out_scale, dtype)
    if spec.global_affine:
        params["g_scale"] = jnp.ones((1,), dtype=dtype)
        params["g_offset"] = jnp.zeros((spec.dim,), dtype=dtype)
    return params


def _couple_fwd(u, s, t, variant):
    """One half-update in the forward direction; returns (v, logjac_terms)."""
    if variant == "additive":
        return u + s, jnp.zeros_like(s)
    if variant == "affine":
        return u * jnp.exp(s) + t, s
    if variant == "scale":
        return u * jnp.exp(s), s
    return u * jnp.exp(s) + s, s  # scale_shift


def _couple_inv(v, s, t, variant):
    if variant == "additive":
        return v - s, jnp.zeros_like(s)
    if variant == "affine":
        return (v - t) * jnp.exp(-s), s
    if variant == "scale":
        return v * jnp.exp(-s), s
    return (v - s) * jnp.exp(-s), s  # scale_shift


def forward(params, spec: BlockSpec, x):
    """Real -> latent half-step. x: (dim,) -> (y, log|det J|)."""
    up = np.asarray(spec.ind_up)
    down = np.asarray(spec.ind_down)
    u1, u2 = x[up], x[down]

    s2 = mlp.apply(params["s2"], u2, spec.alpha)
    t2 = mlp.apply(params["t2"], u2, spec.alpha) if spec.variant == "affine" else None
    v1, lj1 = _couple_fwd(u1, s2, t2, spec.variant)

    s1 = mlp.apply(params["s1"], v1, spec.alpha)
    t1 = mlp.apply(params["t1"], v1, spec.alpha) if spec.variant == "affine" else None
    v2, lj2 = _couple_fwd(u2, s1, t1, spec.variant)

    y = jnp.concatenate([v1, v2])[np.asarray(spec.inverse_perm)]
    log_jac = jnp.sum(lj1) + jnp.sum(lj2)

    if spec.global_affine:
        y = params["g_scale"] * y + params["g_offset"]
        log_jac = log_jac + spec.dim * jnp.log(params["g_scale"][0])
    return y, log_jac


def inverse(params, spec: BlockSpec, y):
    """Latent -> real half-step. Exact inverse of ``forward``; the returned
    log-Jacobian is the negative of the forward one (net.py:120-153)."""
    log_jac = jnp.zeros((), dtype=y.dtype)
    if spec.global_affine:
        y = (y - params["g_offset"]) / params["g_scale"]
        log_jac = log_jac - spec.dim * jnp.log(params["g_scale"][0])

    up = np.asarray(spec.ind_up)
    down = np.asarray(spec.ind_down)
    v1, v2 = y[up], y[down]

    s1 = mlp.apply(params["s1"], v1, spec.alpha)
    t1 = mlp.apply(params["t1"], v1, spec.alpha) if spec.variant == "affine" else None
    u2, lj2 = _couple_inv(v2, s1, t1, spec.variant)

    s2 = mlp.apply(params["s2"], u2, spec.alpha)
    t2 = mlp.apply(params["t2"], u2, spec.alpha) if spec.variant == "affine" else None
    u1, lj1 = _couple_inv(v1, s2, t2, spec.variant)

    x = jnp.concatenate([u1, u2])[np.asarray(spec.inverse_perm)]
    return x, log_jac - (jnp.sum(lj1) + jnp.sum(lj2))

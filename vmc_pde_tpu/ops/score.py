"""Differential operators on the flow's log-density: per-sample value,
coordinate score, parameter score (the TDVP O_k vector), and coordinate
Hessian blocks.

This is the hot path of the whole framework (SURVEY.md section 3.1): per
sample we need

    logp(x), grad_x logp, grad_theta logp (flattened, the O_k row),
    and a Hessian block of logp w.r.t. selected coordinates.

Replaces var_state.py:29-34's pmap(vmap(...)) closures. TPU-native deltas:

- everything is a single-sample pure function vmapped by the caller, so XLA
  batches the per-sample matvecs into MXU matmuls inside ONE jit;
- parameter gradients are taken w.r.t. the *flat* parameter vector via
  jax.flatten_util.ravel_pytree, producing the (N, P) O-matrix directly in
  matmul-ready layout (no per-leaf pytree materialization + concat);
- Hessians are computed forward-over-reverse (jacfwd of grad) and can be
  restricted to a static coordinate subset: the Fokker-Planck equation only
  needs the momentum-momentum block (evolutionEq.py:113-114), which halves
  the tangent count vs the reference's full jacrev(jacfwd) Hessian
  (var_state.py:32).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.flatten_util import ravel_pytree


def flat_param_view(params):
    """(flat_vector, unravel_fn) for a parameter pytree."""
    return ravel_pytree(params)


def make_flat_log_prob(flow, unravel):
    """log p as a function of the FLAT parameter vector (single sample)."""

    def log_prob_flat(theta, x):
        return flow.log_prob(unravel(theta), x)

    return log_prob_flat


def value_score_and_param_grad(log_prob_flat, theta, x):
    """(logp, grad_x logp, grad_theta logp) for one sample, one backward pass
    (var_state.py:31)."""
    logp, (g_theta, g_x) = jax.value_and_grad(log_prob_flat, argnums=(0, 1))(
        theta, x
    )
    return logp, g_x, g_theta


def hessian_block(log_prob_flat, theta, x, idx: Optional[Tuple[int, ...]]):
    """Hessian of logp w.r.t. the coordinates in ``idx`` (static), shape
    (len(idx), len(idx)). ``idx=None`` means all coordinates (full Hessian,
    var_state.py:32 equivalent but forward-over-reverse)."""
    if idx is None:
        return jax.jacfwd(jax.grad(log_prob_flat, argnums=1), argnums=1)(
            theta, x
        )
    ind = np.asarray(idx)

    def grad_sub(x_sub):
        x_full = x.at[ind].set(x_sub)
        return jax.grad(log_prob_flat, argnums=1)(theta, x_full)[ind]

    return jax.jacfwd(grad_sub)(x[ind])


def quad_trace(log_prob_flat, theta, x, dirs):
    """Sum of Hessian quadratic forms sum_j v_j^T H v_j for one sample,
    where H = d^2/dx^2 log p and ``dirs`` is a static (k, d) direction
    matrix. This is everything the trace-only equations need (Laplacians:
    dirs = basis vectors; anisotropic tr(H D): dirs = Cholesky columns of
    D), computed FORWARD-over-FORWARD:

        v^T H v = d^2/dt^2 log p(x + t v)  =  jvp(jvp(f, v), v).

    Per direction this costs ~4 primal passes with no backward graph at
    all, vs ~6+ for the jvp-of-grad ``hessian_block`` path -- and, unlike
    reverse mode, it stores no cotangent activations, so XLA streams it.
    At the d=32 north-star shape the (n, k, k) block path was the
    super-linear memory-bound stage (BENCHMARKS.md round-3 addendum)."""

    def f(xv):
        return log_prob_flat(theta, xv)

    def one(v):
        def inner(y):
            return jax.jvp(f, (y,), (v,))[1]

        return jax.jvp(inner, (x,), (v,))[1]

    return jnp.sum(jax.vmap(one)(dirs))


def batched_eval(flow):
    """vmapped log p: (params, (N, d)) -> (N,)."""
    return jax.vmap(flow.log_prob, in_axes=(None, 0))


def batched_push(flow):
    """vmapped latent->real push-forward: (params, (N, d)) -> ((N, d), (N,))."""
    return jax.vmap(flow.push, in_axes=(None, 0))

"""Variational state: owns the flow definition, its parameters, and the
sampler, and exposes the batched evaluation API.

Parity with the reference ``VarState`` (vmc_fluids/var_state.py): callable
modes "eval" / "costfun" / "eval_coordgrads" (var_state.py:36-64), ``hessian``
(:66-67), ``sample`` (:76-79), grid ``integrate`` (:88-91), and the flat
parameter get/set contract (:94-108).

TPU-native deltas:
- batches are (N, dim) arrays sharded over the mesh's ``dp`` axis -- no
  explicit device axis in user-visible shapes (the reference exposes
  (devices, batch, dim));
- parameters have a float64 "master" flat view used by the time integrator,
  while the compute pytree is float32 (Precision policy);
- RNG keys are threaded: ``sample`` takes an optional key and otherwise
  advances an internal key functionally (fixes quirks Q4/Q6).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import score
from ..parallel.mesh import ParallelCtx
from ..utils.dtypes import Precision
from .flow import Flow


class VarState:
    def __init__(
        self,
        flow: Flow,
        params,
        sampler=None,
        ctx: Optional[ParallelCtx] = None,
        precision: Optional[Precision] = None,
        sample_key: int = 0,
    ):
        self.flow = flow
        self.ctx = ctx if ctx is not None else ParallelCtx.single_device()
        self.precision = precision if precision is not None else Precision.f32_only()
        self.sampler = sampler
        self.dim = flow.dim
        self._key = jax.random.PRNGKey(sample_key)

        # Flat parameter view (var_state.py:25-27, 94-108 contract).
        flat, self._unravel = score.flat_param_view(params)
        self.params = params
        self.numParameters = int(flat.size)
        self._log_prob_flat = score.make_flat_log_prob(flow, self._unravel)

        # Jitted batched closures (var_state.py:29-34 equivalents, one jit each;
        # the fused TDVP step in solver/tdvp.py bypasses these entirely).
        self._eval_jit = jax.jit(score.batched_eval(flow))
        self._push_jit = jax.jit(score.batched_push(flow))
        self._costfun_jit = jax.jit(
            jax.vmap(
                jax.value_and_grad(
                    lambda p, x: -flow.log_prob(p, x), argnums=0
                ),
                in_axes=(None, 0),
            )
        )
        self._coordgrads_jit = jax.jit(
            jax.vmap(
                partial(score.value_score_and_param_grad, self._log_prob_flat),
                in_axes=(None, 0),
            )
        )
        self._hessian_jit = jax.jit(
            jax.vmap(
                partial(score.hessian_block, self._log_prob_flat, idx=None),
                in_axes=(None, 0),
            )
        )

    # ------------------------------------------------------------------
    def next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    @property
    def theta(self):
        """Flat compute-dtype parameter vector."""
        return score.flat_param_view(self.params)[0]

    def get_parameters(self):
        """Flat master-dtype parameter vector (var_state.py:103-104)."""
        return self.theta.astype(self.precision.master)

    def set_parameters(self, theta_flat):
        """Install a flat parameter vector (var_state.py:94-101)."""
        self.params = self.unravel(theta_flat)

    def unravel(self, theta_flat):
        """Flat vector -> compute-dtype pytree."""
        tree = self._unravel(jnp.asarray(theta_flat, dtype=self.precision.compute))
        return tree

    # ------------------------------------------------------------------
    def __call__(self, coords, mode: str = "eval", avg: bool = False):
        coords = jnp.asarray(coords, dtype=self.precision.compute)
        if mode == "eval":
            value = self._eval_jit(self.params, coords)
            return jnp.mean(value) if avg else value
        if mode == "costfun":
            value, grad = self._costfun_jit(self.params, coords)
            if avg:
                return jnp.mean(value), jax.tree_util.tree_map(
                    lambda g: jnp.mean(g, axis=0), grad
                )
            return value, grad
        if mode == "eval_coordgrads":
            theta = self.theta
            value, coord_grads, param_grads = self._coordgrads_jit(theta, coords)
            return value, coord_grads, param_grads
        raise ValueError(f"unknown mode {mode!r}")

    def hessian(self, coords):
        """Full coordinate Hessian of logp at each sample: (N, d, d)
        (var_state.py:66-67)."""
        coords = jnp.asarray(coords, dtype=self.precision.compute)
        return self._hessian_jit(self.theta, coords)

    def log_prob(self, coords):
        return self.__call__(coords, mode="eval")

    # ------------------------------------------------------------------
    def sample(self, numSamples: int, key=None):
        """Draw samples from the model density: latent draw + inverse-flow
        push-forward (var_state.py:76-79). Returns (configs (N, d), logp (N,))."""
        if self.sampler is None:
            raise ValueError("VarState has no sampler")
        key = key if key is not None else self.next_key()
        z, _ = self.sampler.sample(key, self.flow, self.params, numSamples)
        return self._push_jit(self.params, z)

    def integrate(self, grid):
        """Riemann-sum normalization check on a dense grid
        (var_state.py:88-91)."""
        coords = jnp.asarray(grid.coords, dtype=self.precision.compute)
        logp = self._eval_jit(self.params, coords)
        return jnp.sum(grid.bin_area * jnp.exp(logp))


def make_var_state(
    seed: int,
    dim: int,
    depth: int = 4,
    sampler=None,
    ctx: Optional[ParallelCtx] = None,
    precision: Optional[Precision] = None,
    **flow_kwargs,
) -> VarState:
    """Convenience constructor mirroring main.py:69-73's wiring."""
    from .flow import build_flow

    precision = precision if precision is not None else Precision.f32_only()
    flow, params = build_flow(
        seed, dim, depth=depth, dtype=precision.compute, **flow_kwargs
    )
    return VarState(flow, params, sampler=sampler, ctx=ctx, precision=precision)

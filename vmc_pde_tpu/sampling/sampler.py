"""Latent-space samplers: exact (Gauss / Student-t) and Metropolis MCMC for
non-analytic latent distributions (e.g. the fluid paper's cosine bump,
vmc_fluids/sampler.py:20-22).

Parity with the reference ``Sampler`` (sampler.py:48-111) with the quirks
fixed (SURVEY.md section 4):

- Q1: the MCMC path referenced an undefined ``self.latent_space_prob`` and
  was dead code; here the latent log-density is an explicit, injectable
  callable and the Metropolis path works.
- Q3: the exact path shares the same budget-rounding logic as the MCMC path
  (``ParallelCtx.shard_samples``), so sample-count bookkeeping is correct on
  any mesh.
- Q4: the Student-t chi^2 draw is keyed and device-resident (latent.py).
- RNG is threaded functionally: every public entry point takes an explicit
  PRNG key; a convenience stateful wrapper mirrors the reference API.

The Metropolis chain loop is a ``jax.lax.scan`` over update steps with all
chains advancing in parallel (sampler.py:88-111); chains are laid out along
the leading axis and shard over the ``dp`` mesh axis.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import latent as latent_mod
from ..parallel.mesh import ParallelCtx


def cos_dist_log_prob(x, offset):
    """The ML-fluid paper's compactly-supported cosine bump
    (sampler.py:20-22): log[ (1 + cos(pi * min(1, 4|x - offset|))) / 2 ]."""
    r = jnp.minimum(1.0, 4.0 * jnp.sqrt(jnp.sum((x - offset) ** 2)))
    return jnp.log(0.5 * (1.0 + jnp.cos(jnp.pi * r)))


def radial_proposal(key, n_chains, dim, mcmc_info):
    """Uniform-in-disk independence proposal (sampler.py:37-45). The
    reference version is 2D-only; this generalizes to uniform-in-ball for
    any dim (identical in 2D)."""
    k_r, k_dir = jax.random.split(key)
    u = jax.random.uniform(k_r, shape=(n_chains, 1))
    r = u ** (1.0 / dim) * mcmc_info["bound"]
    d = jax.random.normal(k_dir, shape=(n_chains, dim))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return r * d + jnp.asarray(mcmc_info["offset"])


@dataclasses.dataclass
class MCSampleInfo:
    """Acceptance bookkeeping (sampler.py:98-100). Counts may be lazy
    device scalars (the fused path avoids per-dispatch host syncs); they
    are only concretized when ``acceptance_rate`` is read."""

    num_proposed: int
    num_accepted: int

    @property
    def acceptance_rate(self):
        return float(self.num_accepted) / max(float(self.num_proposed), 1.0)


def metropolis_chain(
    key,
    init_states,
    log_prob: Callable,
    proposer: Callable,
    n_steps: int,
    mcmc_info,
    rw_scale=None,
    constrain=None,
    chain_major: bool = False,
):
    """Run all chains for n_steps Metropolis updates; returns samples of
    shape (n_steps * n_chains, dim), the final states, and acceptance counts.

    ``rw_scale=None`` (the reference mode): INDEPENDENCE proposals from
    ``proposer`` -- uniform on a ball covering the target's support, so the
    MH ratio reduces to p(new)/p(old) (sampler.py:95). ``rw_scale``: Gaussian
    RANDOM-WALK proposals x' = x + rw_scale * N(0, I) -- symmetric, so the
    ratio is the same p(new)/p(old); use for latents with unbounded support
    where no covering ball exists (beyond the reference). lax.scan keeps the
    whole loop on-device.

    ``constrain`` (optional): sharding annotation applied to the chain-state
    carry each sweep -- with chains sharded over the ``dp`` mesh axis every
    per-sweep op (proposal draw, target eval, accept) partitions over
    devices with zero communication (the RNG is partitionable threefry; the
    only collective is the final psum of acceptance counts). This is the
    mesh-sharded replacement for the reference's pmap'd chain loop
    (vmc_fluids/sampler.py:82). ``chain_major=True`` returns samples grouped
    by chain (chain c's sweeps contiguous) instead of the reference's
    sweep-major order: a chain-sharded (steps, chains) stack then reshapes
    to a sample axis that is STILL contiguously dp-sharded, avoiding the
    all-to-all a sweep-major merge would need. Sample statistics are
    order-invariant, so either layout feeds TDVP identically.
    """
    n_chains, dim = init_states.shape
    if constrain is not None:
        init_states = constrain(init_states)

    def step(carry, _):
        states, key, n_acc = carry
        key, k_prop, k_acc = jax.random.split(key, 3)
        if rw_scale is None:
            # proposers draw in the default dtype; pin to the chain dtype so
            # the scan carry stays type-stable (f32 chains under global x64)
            proposals = proposer(k_prop, n_chains, dim, mcmc_info).astype(
                states.dtype
            )
        else:
            proposals = states + jnp.asarray(
                rw_scale, states.dtype
            ) * jax.random.normal(k_prop, states.shape, dtype=states.dtype)
        log_ratio = jax.vmap(log_prob)(proposals) - jax.vmap(log_prob)(states)
        accept = jax.random.uniform(k_acc, (n_chains,)) < jnp.exp(log_ratio)
        new_states = jnp.where(accept[:, None], proposals, states)
        if constrain is not None:
            new_states = constrain(new_states)
        n_acc = n_acc + jnp.sum(accept).astype(n_acc.dtype)
        return (new_states, key, n_acc), new_states

    (final_states, _, n_accepted), samples = jax.lax.scan(
        step, (init_states, key, jnp.zeros((), jnp.int32)), None, length=n_steps
    )
    if chain_major:
        samples = jnp.swapaxes(samples, 0, 1)
    samples = samples.reshape(n_steps * n_chains, dim)
    return samples, final_states, n_accepted


@dataclasses.dataclass
class Sampler:
    """Latent-space sampler over a device mesh.

    ``name`` selects the path: "Gauss"/"Student_t" sample exactly from the
    learnable latent distribution; anything else runs Metropolis against
    ``latent_log_prob`` (default: the cosine bump when name == "cos_dist").
    """

    dim: int
    ctx: ParallelCtx
    name: str = "Gauss"
    n_chains: int = 30
    mcmc_info: Optional[dict] = None
    latent_log_prob: Optional[Callable] = None
    proposer: Callable = radial_proposal
    burn_in: int = 0
    dtype: jnp.dtype = jnp.float32
    # TPU-resident Pallas Metropolis kernel (kernels/metropolis.py).
    # None = auto: used on TPU backends when a lane-major kernel target is
    # available (built-in for "cos_dist") and n_chains % 128 == 0.
    use_pallas: Optional[bool] = None
    kernel_log_prob: Optional[Callable] = None  # lane-major (dim, C) target
    # Gaussian random-walk proposal mode (beyond the reference, whose
    # uniform-ball independence proposal requires a compact covering
    # support): "rw" proposes x' = x + scale * N(0, I). ``rw_adapt`` tunes
    # the scale between sample() calls toward the d-dimensional optimal
    # acceptance 0.234 (Robbins-Monro on log scale); the chain itself stays
    # a valid MH kernel at fixed scale within each call. Multi-host note:
    # the acceptance count is a GLOBAL psum inside the jitted chain, so
    # every process sees the same count and adapts to the same scale --
    # no cross-process divergence.
    proposal_mode: str = "independence"   # "independence" | "rw"
    rw_scale: float = 0.5
    rw_adapt: bool = True
    rw_target_accept: float = 0.234

    def __post_init__(self):
        self.exact = self.name in latent_mod.EXACT_NAMES
        if not self.exact and self.n_chains % self.ctx.dp_size:
            # round the chain count up to a multiple of the dp axis so the
            # chain-state array shards evenly (same spirit as the
            # reference's distribute_sampling LCM rounding,
            # mpi_wrapper.py:68-110; budgets only ever grow)
            d = self.ctx.dp_size
            self.n_chains = -(-self.n_chains // d) * d
        if self.mcmc_info is None:
            self.mcmc_info = {"offset": jnp.zeros(self.dim), "bound": 0.25}
        if not self.exact and self.latent_log_prob is None:
            if self.name == "cos_dist":
                off = jnp.asarray(self.mcmc_info["offset"])
                self.latent_log_prob = partial(cos_dist_log_prob, offset=off)
            elif self.name == "double_well":
                # same target the flow's latent log-density evaluates
                # (models/latent.py double_well_log_prob); shifted by the
                # chain offset like the cosine bump
                off = jnp.asarray(self.mcmc_info["offset"])
                self.latent_log_prob = lambda x: latent_mod.double_well_log_prob(
                    None, self.dim, x - off)
            else:
                raise ValueError(
                    f"non-exact latent {self.name!r} needs latent_log_prob"
                )
        if not self.exact and self.kernel_log_prob is None and \
                self.name == "cos_dist":
            from ..kernels.metropolis import cos_bump_log_prob
            self.kernel_log_prob = cos_bump_log_prob
        if self.proposal_mode not in ("independence", "rw"):
            raise ValueError(f"unknown proposal_mode {self.proposal_mode!r}")
        if self.use_pallas is None:
            on_tpu = jax.default_backend() == "tpu"
            self.use_pallas = (
                not self.exact
                and on_tpu
                and self.kernel_log_prob is not None
                # dp-sharded: each device's chain shard rides full VPU lanes
                and self.n_chains % (128 * self.ctx.dp_size) == 0
                and self.proposal_mode == "independence"
            )
        elif self.use_pallas and self.proposal_mode != "independence":
            raise ValueError("the Pallas Metropolis kernel implements the "
                             "independence proposal only")
        self._states = None
        self._mcmc_jit = None
        self._rw_adapt_t = 0
        self.last_info: Optional[MCSampleInfo] = None

    # ------------------------------------------------------------------
    def rounded_budget(self, n: int) -> int:
        mult = 1 if self.exact else self.n_chains
        return self.ctx.shard_samples(n, multiple_of=mult)

    def sample(self, key, flow, params, n: int):
        """Draw >= n latent samples (rounded to the mesh/chain layout);
        returns (samples, n_total). Samples are sharded over ``dp``."""
        n_total = self.rounded_budget(n)
        if self.exact:
            z = flow.latent_sample(key, params, n_total, dtype=self.dtype)
        else:
            z = self._sample_mcmc(key, n_total)
        return jax.device_put(
            z, self.ctx.sharding(self.ctx.samples_spec)
        ), n_total

    # ------------------------------------------------------------------
    # Fused / mesh-sharded chain API: the chain loop as a pure function the
    # TDVP programs trace INTO their own jit, with the chain state threaded
    # through dispatches. Chains shard over the dp mesh axis; every sweep op
    # partitions with zero communication (metropolis_chain docstring). The
    # reference's counterpart is the pmap'd scan at vmc_fluids/sampler.py:82,
    # which ran per-device chains but re-dispatched per sample() call.
    # ------------------------------------------------------------------
    @property
    def supports_fused(self) -> bool:
        """True when the chain can be traced into the TDVP step program:
        every non-exact latent (the lax.scan chain loop is jnp-traceable).
        The fused path always uses the scan chain -- eliminating per-stage
        dispatches beats the standalone Pallas kernel's in-kernel win; the
        kernel (kernels/metropolis.py) still serves standalone sample()
        calls on TPU. Both paths share self._states, so mixing them keeps
        one consistent chain."""
        return not self.exact

    def make_chain_fn(self):
        """Pure (key, states, rw_scale, n_steps static) -> (samples, states,
        n_accepted), chain-major samples, dp-sharded chain state."""
        ctx = self.ctx
        spec = ctx.samples_spec

        def chain_fn(key, states, rw_scale, n_steps: int):
            return metropolis_chain(
                key,
                states,
                log_prob=self.latent_log_prob,
                proposer=self.proposer,
                n_steps=n_steps,
                mcmc_info=self.mcmc_info,
                rw_scale=rw_scale,
                constrain=lambda s: ctx.constrain(s, spec),
                chain_major=True,
            )

        return chain_fn

    def ensure_chain_state(self, key):
        """Host-side: initialize the chain-state array (plus burn-in sweeps)
        on first use; returns the current (n_chains, dim) state."""
        if self._states is None:
            k_init, k_burn = jax.random.split(key)
            self._states = jax.device_put(
                self._init_states(k_init),
                self.ctx.sharding(self.ctx.samples_spec),
            )
            if self.burn_in:
                fn = jax.jit(self.make_chain_fn(),
                             static_argnames=("n_steps",))
                _, self._states, _ = fn(k_burn, self._states,
                                        self.fused_rw_scale(),
                                        n_steps=self.burn_in)
        return self._states

    def fused_rw_scale(self):
        """Traced proposal scale for the fused path (None = independence)."""
        if self.proposal_mode != "rw":
            return None
        return jnp.asarray(self.rw_scale, self.dtype)

    def note_fused_acceptance(self, new_states, n_accepted, n_proposed):
        """Absorb a fused dispatch's chain outputs: store the carried state,
        update the acceptance bookkeeping (counts may stay lazy device
        scalars -- no sync), and (rw mode) apply the same Robbins-Monro
        scale adaptation as the per-call path."""
        self._states = new_states
        self.last_info = MCSampleInfo(
            num_proposed=n_proposed, num_accepted=n_accepted
        )
        if self.proposal_mode == "rw" and self.rw_adapt:
            err = self.last_info.acceptance_rate - self.rw_target_accept
            self._rw_adapt_t += 1
            gain = 2.0 / self._rw_adapt_t**0.7
            self.rw_scale = float(
                self.rw_scale * np.exp(np.clip(gain * err, -0.5, 0.5))
            )

    # ------------------------------------------------------------------
    def _init_states(self, key):
        states = self.proposer(key, self.n_chains, self.dim, self.mcmc_info)
        return states.astype(self.dtype)

    def _sample_mcmc(self, key, n_total: int):
        k_init, k_run = jax.random.split(key)
        if self._states is None:
            self._states = self._init_states(k_init)
        n_steps = n_total // self.n_chains + self.burn_in
        if self.use_pallas:
            return self._sample_mcmc_pallas(k_run, n_total, n_steps)
        if self._mcmc_jit is None:
            ctx = self.ctx
            spec = ctx.samples_spec
            self._mcmc_jit = jax.jit(
                partial(
                    metropolis_chain,
                    log_prob=self.latent_log_prob,
                    proposer=self.proposer,
                    mcmc_info=self.mcmc_info,
                    # chains shard over dp even in the standalone path
                    # (sweep-major sample order kept: burn-in trimming
                    # below slices leading sweeps)
                    constrain=lambda s: ctx.constrain(s, spec),
                ),
                static_argnames=("n_steps",),
            )
        # traced scalar (adaptation must not recompile); None = independence
        rw = jnp.asarray(self.rw_scale, self.dtype) \
            if self.proposal_mode == "rw" else None
        samples, self._states, n_acc = self._mcmc_jit(
            k_run, self._states, n_steps=n_steps, rw_scale=rw
        )
        if self.burn_in:
            samples = samples[self.burn_in * self.n_chains:]
        self.last_info = MCSampleInfo(
            num_proposed=n_steps * self.n_chains, num_accepted=int(n_acc)
        )
        if rw is not None and self.rw_adapt:
            # Robbins-Monro log-scale update toward the target acceptance:
            # the gain decays as t^-0.7 (summable-squares, non-summable), so
            # the scale CONVERGES instead of oscillating around the target
            # forever; clipped so one noisy call cannot blow the scale
            # up/down
            err = self.last_info.acceptance_rate - self.rw_target_accept
            self._rw_adapt_t += 1
            gain = 2.0 / self._rw_adapt_t**0.7
            self.rw_scale = float(
                self.rw_scale * np.exp(np.clip(gain * err, -0.5, 0.5))
            )
        return samples

    def _sample_mcmc_pallas(self, key, n_total: int, n_steps: int):
        """TPU-resident path: the whole chain ensemble runs inside one
        Pallas kernel with the hardware PRNG (kernels/metropolis.py);
        on multi-device meshes the chains shard over dp (shard_map, one
        kernel instance per device with a disjoint PRNG stream)."""
        from ..kernels.metropolis import (SWEEPS_PER_BLOCK,
                                          metropolis_chain_pallas_sharded)

        # the kernel rounds the sweep count up to whole blocks; account for
        # the actually-proposed sweeps so acceptance_rate stays in [0, 1]
        n_steps_actual = -(-n_steps // SWEEPS_PER_BLOCK) * SWEEPS_PER_BLOCK
        seed = int(jax.random.randint(key, (), 0, 2**31 - 1))
        samples, self._states, n_acc = metropolis_chain_pallas_sharded(
            self.ctx,
            seed,
            self._states,
            self.kernel_log_prob,
            n_steps,
            float(self.mcmc_info["bound"]),
            np.asarray(self.mcmc_info["offset"]),
        )
        if self.burn_in:
            samples = samples[self.burn_in * self.n_chains:]
        # the kernel may round sweep counts up; trim to the exact budget
        if samples.shape[0] > n_total:
            samples = samples[:n_total]
        self.last_info = MCSampleInfo(
            num_proposed=n_steps_actual * self.n_chains,
            num_accepted=int(n_acc),
        )
        return samples.astype(self.dtype)

"""The invertible-flow density model ("INN with probability"): a stack of
coupling blocks over a learnable latent base distribution.

Parity with the reference's ``INN`` / ``INNwProb`` (vmc_fluids/net.py:156-217)
and the network init in var_state.py:110-124 (random half/half coordinate
partition per block, depth blocks).

The model represents log p(x) = log p_latent(f(x) - offset) + log|det df/dx|
where f is the block stack (real -> latent). Sampling pushes latent draws
through the inverse stack and returns (x, log p(x)) by change of variables
(net.py:209-217).

Static model description (``Flow``) is a frozen dataclass of python constants;
parameters live in a plain nested dict pytree. All evaluation functions are
single-sample and pure; callers vmap/jit.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import coupling, latent


@dataclasses.dataclass(frozen=True)
class Flow:
    """Static (hashable) flow description."""

    dim: int
    blocks: Tuple[coupling.BlockSpec, ...]
    latent_name: str = "Gauss"
    offset: Tuple[float, ...] = None  # latent offset (net.py:192, main.py mode_dict)
    # Randomized-QMC (scrambled Sobol) exact-latent sampling: every
    # latent_sample call -- TDVP batches, observables, the standalone
    # sampler -- draws from a digitally-shifted low-discrepancy net
    # instead of iid pseudo-randoms (sampling/qmc.py). Same key
    # semantics; substantially lower estimator noise per sample. No
    # reference counterpart.
    qmc: bool = False

    def __post_init__(self):
        if self.offset is None:
            object.__setattr__(self, "offset", (0.0,) * self.dim)
        if len(self.offset) != self.dim:
            raise ValueError("offset length != dim")
        if self.latent_name not in latent.NAMES:
            raise ValueError(f"unknown latent {self.latent_name!r}")

    # ------------------------------------------------------------------
    @property
    def offset_array(self):
        return np.asarray(self.offset)

    def init(self, key, dtype=jnp.float32):
        keys = jax.random.split(key, len(self.blocks))
        return {
            "latent": latent.init_params(self.dim, self.latent_name, dtype),
            "blocks": [
                coupling.init(k, spec, dtype)
                for k, spec in zip(keys, self.blocks)
            ],
        }

    # -- coordinate transform (INN, net.py:156-182) ---------------------
    def forward(self, params, x):
        """Real -> latent. x: (dim,) -> (z, log|det J|)."""
        log_jac = jnp.zeros((), dtype=x.dtype)
        for p, spec in zip(params["blocks"], self.blocks):
            x, lj = coupling.forward(p, spec, x)
            log_jac = log_jac + lj
        return x, log_jac

    def inverse(self, params, z):
        """Latent -> real, blocks in reverse order (net.py:177-180)."""
        log_jac = jnp.zeros((), dtype=z.dtype)
        for p, spec in zip(params["blocks"][::-1], self.blocks[::-1]):
            z, lj = coupling.inverse(p, spec, z)
            log_jac = log_jac + lj
        return z, log_jac

    # -- density (INNwProb, net.py:185-217) ------------------------------
    def log_prob(self, params, x):
        """log p(x) for a single x of shape (dim,) ("evaluate" mode,
        net.py:210-213)."""
        z, log_jac = self.forward(params, x)
        off = jnp.asarray(self.offset_array, dtype=x.dtype)
        lp = latent.log_prob(self.latent_name, params["latent"], self.dim, z - off)
        return lp + log_jac

    def push(self, params, z):
        """Latent sample -> (x_real, log p(x_real)) ("sample" mode,
        net.py:214-217). z includes the offset shift already."""
        off = jnp.asarray(self.offset_array, dtype=z.dtype)
        lp_latent = latent.log_prob(
            self.latent_name, params["latent"], self.dim, z - off
        )
        x, log_jac_inv = self.inverse(params, z)
        # log_jac_inv = -log_jac_fwd(x), so lp_latent - log_jac_inv = log p(x).
        return x, lp_latent - log_jac_inv

    def latent_sample(self, key, params, n: int, dtype=None):
        """Draw n latent-space samples (offset applied, sampler.py:86)."""
        dtype = dtype or params["latent"]["mu"].dtype
        z = latent.sample(
            self.latent_name, key, params["latent"], self.dim, n, dtype,
            qmc=self.qmc,
        )
        return z + jnp.asarray(self.offset_array, dtype=dtype)

    def latent_sample_tempered(self, key, params, n: int, gamma,
                               dtype=None):
        """(z, log_w) from the tail-tempered Student-t importance proposal
        (latent.student_t_tempered_sample); the offset shifts both target
        and proposal identically so the weights are unaffected."""
        if self.latent_name != "Student_t":
            raise ValueError("tempered sampling is a Student_t feature")
        dtype = dtype or params["latent"]["mu"].dtype
        z, log_w = latent.student_t_tempered_sample(
            key, params["latent"], self.dim, n, gamma, dtype, qmc=self.qmc
        )
        return z + jnp.asarray(self.offset_array, dtype=dtype), log_w


def random_partitions(key, dim: int, depth: int):
    """Random half/half coordinate partition per block (var_state.py:110-119).

    Computed eagerly with the JAX PRNG at model-build time; the results are
    baked into the static BlockSpecs (compile-time constants on TPU)."""
    ups, downs = [], []
    for _ in range(depth):
        key, use = jax.random.split(key)
        up = np.asarray(
            jax.random.choice(use, dim, shape=(dim // 2,), replace=False)
        )
        down = np.setdiff1d(np.arange(dim), up)
        ups.append(tuple(int(i) for i in up))
        downs.append(tuple(int(i) for i in np.sort(down)))
    return ups, downs, key


def build_flow(
    seed: int,
    dim: int,
    depth: int = 4,
    hidden: Tuple[int, ...] = None,
    variant: str = "scale",
    global_affine: bool = False,
    latent_name: str = "Gauss",
    offset=None,
    alpha: float = 10.0,
    out_scale: float = 1e-5,
    dtype=jnp.float32,
    qmc: bool = False,
):
    """Construct (Flow, params) the way the reference driver does
    (main.py:73: depth 4, hidden (dim//2,), seeded partition + init)."""
    hidden = tuple(hidden) if hidden is not None else (max(dim // 2, 1),)
    key = jax.random.PRNGKey(seed)
    ups, downs, key = random_partitions(key, dim, depth)
    blocks = tuple(
        coupling.BlockSpec(
            ind_up=u,
            ind_down=d,
            hidden=hidden,
            variant=variant,
            global_affine=global_affine,
            alpha=alpha,
            out_scale=out_scale,
        )
        for u, d in zip(ups, downs)
    )
    offset = tuple(float(o) for o in (offset if offset is not None else np.zeros(dim)))
    flow = Flow(dim=dim, blocks=blocks, latent_name=latent_name,
                offset=offset, qmc=qmc)
    params = flow.init(key, dtype=dtype)
    return flow, params

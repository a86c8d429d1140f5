"""SanityFlow: a one-parameter invertible 'network' with the same interface
as Flow, for isolating the TDVP/sampler stack from model complexity.

Parity with the reference's SanityINN test double (vmc_fluids/net.py:220-235,
swappable at var_state.py:120-122): forward multiplies by a learnable scale
with log|J| = dim * log(scale); here extended with the latent machinery so it
is a drop-in Flow replacement (log_prob/push/latent_sample all work).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp

from . import latent
from .flow import Flow


@dataclasses.dataclass(frozen=True)
class SanityFlow(Flow):
    """dim-dimensional pure-scaling flow: z = s * x."""

    def __init__(self, dim: int, latent_name: str = "Gauss", offset=None):
        blocks = ()
        object.__setattr__(self, "dim", dim)
        object.__setattr__(self, "blocks", blocks)
        object.__setattr__(self, "latent_name", latent_name)
        object.__setattr__(
            self, "offset",
            tuple(offset) if offset is not None else (0.0,) * dim)

    def init(self, key, dtype=jnp.float32):
        return {
            "latent": latent.init_params(self.dim, self.latent_name, dtype),
            "scale": jnp.ones((1,), dtype=dtype),
        }

    def forward(self, params, x):
        s = params["scale"][0]
        return s * x, self.dim * jnp.log(s)

    def inverse(self, params, z):
        s = params["scale"][0]
        return z / s, -self.dim * jnp.log(s)

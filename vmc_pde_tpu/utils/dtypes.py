"""Precision policy for the TPU-native VMC-PDE framework.

The reference implementation (vmc_fluids/main.py:2, global_defs.py:6-8) runs
everything in float64, which TPUs only emulate slowly. The TPU-native policy is
mixed precision:

- ``compute``: network evaluation, sampling, per-sample gradients, Gram/force
  accumulation. float32 by default (MXU native); bfloat16 optional for the
  network forward pass.
- ``solve``:   the tiny (N_params x N_params) eigensolve and the regularized
  pseudo-inverse. float64 by default (emulated on TPU but negligible cost for
  a few-thousand-square matrix; the reference relies on tolerances 1e-11/1e-14
  that only make sense in f64 -- tdvp.py:24,82-85).
- ``master``:  the time-integrator's master copy of the parameters. float64,
  because dt ramps from 1e-7 (main.py:108) and f32 accumulation of
  ``theta += dt * k`` would under-resolve the update.

Enabling x64 is required for the f64 members; the library never relies on
x64 *defaults* -- every array is created with an explicit dtype, so enabling
x64 does not slow down the f32 compute path.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


def enable_x64() -> None:
    """Enable 64-bit types (needed for the solve/master dtypes)."""
    jax.config.update("jax_enable_x64", True)


def x64_enabled() -> bool:
    return bool(jax.config.read("jax_enable_x64"))


@dataclasses.dataclass(frozen=True)
class Precision:
    """Dtype policy threaded through the framework."""

    compute: jnp.dtype = jnp.float32
    solve: jnp.dtype = jnp.float64
    master: jnp.dtype = jnp.float64

    def __post_init__(self):
        object.__setattr__(self, "compute", jnp.dtype(self.compute))
        object.__setattr__(self, "solve", jnp.dtype(self.solve))
        object.__setattr__(self, "master", jnp.dtype(self.master))

    @classmethod
    def tpu_default(cls) -> "Precision":
        """f32 compute and on-device solve, f64 master parameters.

        The device eigensolve runs in f32: with f32 statistics the
        f64-emulated TPU eigh adds no information (tolerances are floored at
        f32 eps anyway) and the emulation path has been observed to return
        NaN eigenvectors for specific well-formed inputs. Use
        ``solve_on_device=False`` (host numpy f64, the reference's own
        default, tdvp.py:60-64) or an f64 compute policy when reference-
        matched 1e-11/1e-14 tolerances are required."""
        enable_x64()
        return cls(compute=jnp.float32, solve=jnp.float32, master=jnp.float64)

    @classmethod
    def tpu_f64stats(cls) -> "Precision":
        """f32 compute with an f64 solve: pair with gram_precision="f64"
        (and optionally solve_on_device=False for the host eigh) to reach
        reference-grade 1e-12 solver residuals on TPU while sampling and
        differentiating at MXU-native f32 (stats.PRECISIONS "f64")."""
        enable_x64()
        return cls(compute=jnp.float32, solve=jnp.float64,
                   master=jnp.float64)

    @classmethod
    def f32_only(cls) -> "Precision":
        """Pure-f32 policy; works without x64 (fastest fused path)."""
        return cls(compute=jnp.float32, solve=jnp.float32, master=jnp.float32)

    @classmethod
    def f64_everywhere(cls) -> "Precision":
        """Full f64, matching the reference bit-for-bit semantics (CPU tests)."""
        enable_x64()
        return cls(compute=jnp.float64, solve=jnp.float64, master=jnp.float64)


def resolve(precision: "Precision | str | None") -> Precision:
    if precision is None:
        return Precision.tpu_default()
    if isinstance(precision, Precision):
        return precision
    table = {
        "tpu": Precision.tpu_default,
        "tpu_f64stats": Precision.tpu_f64stats,
        "f32": Precision.f32_only,
        "f64": Precision.f64_everywhere,
    }
    return table[precision]()

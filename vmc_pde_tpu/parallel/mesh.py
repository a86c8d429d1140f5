"""Device mesh and sharding layer: the TPU-native replacement for the
reference's MPI + pmap runtime (vmc_fluids/global_defs.py, mpi_wrapper.py).

The reference parallelizes Monte-Carlo samples in two nested tiers: jax.pmap
over local devices (global_defs.py:24) and MPI ranks with a host Allreduce per
statistic (mpi_wrapper.py:129-163). Here the whole program is one jitted,
mesh-sharded computation: samples are sharded over the ``dp`` mesh axis and
XLA inserts ICI/DCN collectives for every reduction -- no host staging, no
wrapper library. An optional second axis ``tp`` shards the parameter dimension
of the O(N_samples x N_params) per-sample-gradient matrix and the
O(N_params^2) Gram accumulation (the only 2D-parallel opportunity in this
workload; see SURVEY.md section 2).
"""

from __future__ import annotations

import dataclasses
from functools import cached_property

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SAMPLE_AXIS = "dp"
PARAM_AXIS = "tp"


def distributed_init(**kwargs) -> None:
    """Initialize multi-host JAX (replaces MPI rank discovery,
    mpi_wrapper.py:9-11). No-op on a single host."""
    try:
        jax.distributed.initialize(**kwargs)
    except (ValueError, RuntimeError):
        # Already initialized or single-process environment.
        pass


def is_coordinator() -> bool:
    """Replacement for the reference's ``mpi_wrapper.rank == 0`` gating
    (main.py:131)."""
    return jax.process_index() == 0


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Declarative mesh spec. ``dp`` shards Monte-Carlo samples, ``tp``
    (optional, >1) shards the parameter dimension of the Gram accumulation."""

    dp: int = -1  # -1: all remaining devices
    tp: int = 1

    def build(self, devices=None) -> Mesh:
        devices = list(devices if devices is not None else jax.devices())
        n = len(devices)
        dp = self.dp if self.dp > 0 else max(1, n // self.tp)
        if dp * self.tp > n:
            raise ValueError(
                f"mesh {dp}x{self.tp} needs {dp * self.tp} devices, have {n}"
            )
        dev = np.asarray(devices[: dp * self.tp]).reshape(dp, self.tp)
        return Mesh(dev, (SAMPLE_AXIS, PARAM_AXIS))


@dataclasses.dataclass(frozen=True)
class ParallelCtx:
    """Sharding context threaded through samplers/TDVP. Holds the mesh plus
    the PartitionSpecs for the recurring array roles."""

    mesh: Mesh

    @classmethod
    def create(cls, dp: int = -1, tp: int = 1, devices=None) -> "ParallelCtx":
        return cls(mesh=MeshConfig(dp=dp, tp=tp).build(devices))

    @classmethod
    def single_device(cls, device=None) -> "ParallelCtx":
        dev = device if device is not None else jax.devices()[0]
        return cls(mesh=Mesh(np.asarray([dev]).reshape(1, 1), (SAMPLE_AXIS, PARAM_AXIS)))

    @cached_property
    def dp_size(self) -> int:
        return self.mesh.shape[SAMPLE_AXIS]

    @cached_property
    def tp_size(self) -> int:
        return self.mesh.shape[PARAM_AXIS]

    # -- PartitionSpecs for the recurring array roles --------------------
    @property
    def samples_spec(self) -> P:
        """(N, dim) sample batches: sharded over dp."""
        return P(SAMPLE_AXIS)

    @property
    def per_sample_spec(self) -> P:
        """(N,) per-sample scalars (Eloc, logp)."""
        return P(SAMPLE_AXIS)

    @property
    def osample_spec(self) -> P:
        """(N, P) per-sample parameter-gradient matrix O: sharded over the
        sample axis only. The parameter axis is deliberately NOT sharded
        here: the tp parallelism enters at the Gram RESULT (gram_spec), so
        the N-contraction lowers to a reduce-scatter. Constraining the
        autodiff output's parameter axis additionally triggers an XLA SPMD
        miscompile for non-divisible axes (see tests/test_parallel.py) and
        buys nothing -- the large axis is N."""
        return P(SAMPLE_AXIS, None)

    @property
    def gram_spec(self) -> P:
        """(P, P) Gram matrix: row-sharded over tp (replicated if tp==1)."""
        return P(PARAM_AXIS if self.tp_size > 1 else None, None)

    @property
    def replicated_spec(self) -> P:
        return P()

    def sharding(self, spec: P) -> NamedSharding:
        return NamedSharding(self.mesh, spec)

    def constrain(self, x, spec: P):
        """with_sharding_constraint shortcut (annotation inside jit)."""
        return jax.lax.with_sharding_constraint(x, self.sharding(spec))

    def shard_samples(self, n: int, multiple_of: int = 1) -> int:
        """TPU-native ``distribute_sampling`` (mpi_wrapper.py:68-110): round a
        global sample budget UP so it divides evenly over the dp axis times any
        chain/layout multiple. Returns the *global* rounded count; the mesh
        sharding machinery handles per-device placement. Unlike the reference,
        the exact-sampling path and the MCMC path share one code path, fixing
        quirk Q3 (SURVEY.md section 4: incorrect multi-process normalization)."""
        block = int(np.lcm(self.dp_size, max(multiple_of, 1)))
        return ((int(n) + block - 1) // block) * block


def default_ctx() -> ParallelCtx:
    """All available devices on the dp axis."""
    return ParallelCtx.create()


def broadcast_from_coordinator(tree):
    """Replacement for the reference's MPI broadcast
    (mpi_wrapper.bcast_unknown_size, mpi_wrapper.py:277-306): make every
    process see the coordinator's value. No-op on a single process."""
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils

    return multihost_utils.broadcast_one_to_all(tree)


def sync_global_devices(name: str = "barrier") -> None:
    """Cross-process barrier (replaces implicit MPI synchronization)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)

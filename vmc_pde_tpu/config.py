"""Declarative experiment configuration.

Replaces the reference's hard-coded ``mode_dict`` (vmc_fluids/main.py:33-41)
plus its manual cross-file tuning checklist (main.py:43-58): every knob that
checklist says to "set manually before starting a run" (coupling variant,
timestep/ramp, block count, latent family and its nu, sample budgets) is a
field here, and the six reference workloads ship as presets.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np


@dataclasses.dataclass
class RunConfig:
    # problem
    name: str = "mwe"
    dim: int = 2
    offset: Tuple[float, ...] = (0.0, 0.0)
    # registry name (ops/evolution.py make_equation) or a user-supplied
    # ops.evolution.Equation INSTANCE for custom physics
    # (examples/custom_equation.py); equation_params apply to names only
    equation: str = "diffusion"
    equation_params: dict = dataclasses.field(default_factory=dict)

    # model (main.py:73: depth 4, hidden (dim//2,))
    depth: int = 4
    hidden: Optional[Tuple[int, ...]] = None
    variant: str = "scale"          # coupling variant (checklist main.py:46-48)
    global_affine: bool = False
    latent_name: str = "Gauss"
    alpha: float = 10.0
    init_scale: float = 1e-5
    seed: int = 1
    # Randomized-QMC (scrambled Sobol) exact-latent sampling: lower
    # estimator noise at the same sample budget (sampling/qmc.py). Exact
    # Gauss/Student_t latents only; MCMC workloads ignore it.
    qmc: bool = False

    # sampling (main.py:69,117-118)
    sample_seed: int = 1
    n_chains: int = 30
    mcmc_bound: float = 0.25
    # MCMC proposal: "independence" (uniform ball covering the support,
    # the reference's) or "rw" (Gaussian random walk with acceptance-
    # adapted scale -- for unbounded latent targets; sampler.py)
    proposal_mode: str = "independence"
    rw_scale: float = 0.5
    n_samples_tdvp: int = 10000
    n_samples_obs: int = 10000

    # TDVP solver (tdvp.py:20-26 + the TPU-native solver strategy knobs;
    # see TDVPConfig for semantics)
    use_snr: bool = False
    snr_tol: float = 2.0
    svd_tol: float = 1e-11
    # > 0: winsorize Eloc at this many robust (MAD) sigmas -- heavy-tail
    # MC-bias control (solver/tdvp.py _maybe_clip_eloc); ~30 leaves
    # Gaussian-grade statistics untouched
    eloc_clip: float = 0.0
    # < 1: tail-tempered importance sampling of the TDVP statistics batch
    # (Student_t latent; TDVPConfig.is_gamma)
    is_gamma: float = 1.0
    diagonal_shift: float = 0.0
    solve_on_device: bool = True
    solver_method: str = "auto"     # auto | eigh | cholesky | cg | minsr
    eigh_max_params: int = 2048     # "auto" switches eigh->cholesky here
    gram_precision: str = "high"    # highest | high | default | f64 |
                                    # f64acc (MXU passes / f64 statistics)
    gram_backend: str = "auto"      # auto | xla | syrk | sym2 | tri2
    gram_cross: str = "auto"        # auto | bf16 | int8 (split cross pass;
                                    # auto = int8 on TPU, single-device
                                    # and shard_map-stats dp meshes)
    # Mesh statistics partitioning: auto | gspmd | shard_map
    # (TDVPConfig.stats_partitioning -- "auto" runs the stats block under
    # shard_map on multi-device meshes: per-shard fast Gram stack, ONE
    # psum of the assembled moments per RHS; dp x tp meshes flatten into
    # the sample axis (round 5). gspmd remains the IS/clip edge-mode path
    # and the tp memory-scaling layout at P > 16384)
    stats_partitioning: str = "auto"
    hessian_mode: str = "auto"      # auto | trace | block (TDVPConfig)
    # Per-sample pipeline backend: auto | xla | pallas (TDVPConfig;
    # kernels/persample.py -- "auto" fuses the per-sample stage into the
    # feature-major Pallas kernel on single-device TPU f32 configs with
    # P >= 2048)
    per_sample_backend: str = "auto"
    per_sample_tile: int = 256
    cg_maxiter: int = 250
    cg_tol: float = 1e-7
    auto_tol_floor: bool = True  # floor svd_tol at 64*eps(compute dtype)
    chunk_size: int = 0
    integrals: bool = False

    # time integration (main.py:108-113)
    stepper: str = "fixed_heun"     # fixed_heun | fixed_euler | fixed_rk3 | adaptive_heun | adaptive_rk23
    dt0: float = 1e-7
    max_step: float = 1e-2
    increase_fac: float = 1.3
    tol: float = 1e-2               # adaptive stepper tolerance
    t_end: float = 5.0
    # Land the final step EXACTLY on t_end (clamp its dt). The reference's
    # loop `while t < t_end + dt` (main.py:159) overshoots t_end by up to a
    # full dt (quirk Q11) -- any final-state comparison against an analytic
    # solution at t_end then carries a spurious O(dt) error that dominates
    # Heun's O(dt^2) (measured: L2 = ||dp/dt|| * dt on the mwe workload).
    # Default False = reference-compatible trajectories.
    exact_t_end: bool = False
    # >1 batches that many steps into ONE device dispatch, amortizing host
    # dispatch latency. Fixed Heun/RK3: lax.scan over precomputed (t, dt)
    # (TDVP.heun_multi). Adaptive Heun/RK23: the attempt retry loop and dt
    # controller run ON DEVICE (lax.while_loop inside a masked lax.scan,
    # TDVP.adaptive_multi) -- steps past t_end are masked out in-program.
    # RNG/physics/recorded infos identical to per-step integration (MCMC
    # workloads included: the chain state threads through the scan carry).
    # Auto-disabled when a per-step host action applies (verbose logging,
    # 2-D grid plotting, profiler window, callbacks).
    steps_per_dispatch: int = 1

    # runtime
    precision: str = "tpu"          # tpu | f32 | f64 (utils/dtypes.py)
    mesh_dp: int = -1
    mesh_tp: int = 1

    # diagnostics / io
    grid_bound: float = 10.0
    sym_grid: bool = True
    grid_points: int = 200
    plot_every: float = 1.0
    workdir: Optional[str] = None
    # Directory for the AOT executable cache (utils/aot.py): fused stepper
    # executables persist to disk and fresh processes LOAD them (~1 s)
    # instead of recompiling (1-12 min on this image's remote-compile
    # tunnel). Content-addressed keys: any config/shape change recompiles.
    aot_dir: Optional[str] = None
    # True: ALSO stream per-step metrics through the native C++ async
    # recorder (vmc_pde_tpu/native/recorder.cpp) into <workdir>/metrics.bin
    # -- the step loop never waits on file IO (a background thread drains a
    # bounded
    # queue), and the binary log converts losslessly to the infos schema
    # (utils.recorder.log_to_infos). Costs one device->host transfer per
    # step (per batch under steps_per_dispatch). Requires workdir.
    async_recorder: bool = False
    checkpoint_every: int = 0       # steps; 0 = off
    resume: bool = False            # resume from workdir's latest checkpoint
    # Start the evolution from stored parameters instead of the random
    # init: a pretrain orbax checkpoint directory (pretrain/train.py
    # workdir/pretrain_ckpt) or an evolution npz checkpoint
    # (utils/checkpoint.py). Closes the reference's commented-out
    # pretrain -> evolve handoff (vmc_fluids/main.py:120-125). The flow
    # architecture must match the one that produced the checkpoint.
    init_params: Optional[str] = None
    profile_dir: Optional[str] = None  # capture a jax.profiler trace here
    profile_steps: Tuple[int, int] = (5, 8)  # [start, end) steps to trace
    nan_check_every: int = 10       # non-verbose NaN-abort sync cadence
    verbose: bool = True

    def hidden_resolved(self) -> Tuple[int, ...]:
        return tuple(self.hidden) if self.hidden else (max(self.dim // 2, 1),)


def _preset(**kw) -> RunConfig:
    return RunConfig(**kw)


# The six reference workloads (main.py:33-41) with the per-workload manual
# settings from the checklist (main.py:43-58) made explicit.
PRESETS = {
    "mwe": _preset(
        name="mwe", dim=2, offset=(0.0, 0.0), latent_name="Gauss",
        equation="diffusion", variant="scale",
        dt0=1e-7, max_step=1e-2, grid_bound=10.0,
    ),
    "fluidpaper": _preset(
        name="fluidpaper", dim=2, offset=(0.25, 0.25), latent_name="cos_dist",
        equation="advection_paper", variant="affine",
        dt0=1e-4, max_step=1e-3, grid_bound=1.0, sym_grid=False,
        mcmc_bound=0.25,
    ),
    "harmonicOsc": _preset(
        name="harmonicOsc", dim=2, offset=(1.0, 1.0), latent_name="Gauss",
        equation="advection_hamiltonian", variant="affine",
        dt0=1e-4, max_step=1e-2, grid_bound=8.0,
    ),
    "harmonicOsc_diff": _preset(
        name="harmonicOsc_diff", dim=6, offset=(1.0, 0.0, 0.0, 1.0, 0.0, 0.0),
        latent_name="Gauss", equation="advection_hamiltonian_wDiss",
        variant="affine", dt0=1e-4, max_step=1e-2, grid_bound=8.0,
    ),
    # BASELINE.json config 3: anharmonic/double-well Fokker-Planck with
    # Metropolis sampling and the SVD-regularized TDVP solve. A temperature
    # quench: the initial density is the double-well Boltzmann latent at
    # T0 = 1.5 (models/latent.py double_well_log_prob -- no closed-form
    # normalization, so it NEEDS the Metropolis sampler, rw proposals),
    # evolving under the same potential V(x) = -2 x^2 + x^4 (wells at
    # x = +-1, barrier 1) coupled to a colder bath T = 0.5: both marginals
    # sharpen toward the bimodal exp(-H/T) stationary state.
    "doubleWell": _preset(
        name="doubleWell", dim=2, offset=(0.0, 0.0),
        latent_name="double_well",
        equation="advection_hamiltonian_wDiss", variant="affine",
        equation_params={"v2": -4.0, "lam": 1.0, "T": 0.5},
        proposal_mode="rw", rw_scale=0.8,
        dt0=1e-4, max_step=2e-3, grid_bound=4.0, mcmc_bound=2.5,
    ),
    # BASELINE.json config 4: high-dimensional (d=32) INTERACTING OU
    # Fokker-Planck, large-batch sampling -- the throughput north-star
    # shape (bench.py). 16 (q, p) pairs, nearest-neighbour coupled chain
    # potential sum_i (x_i - x_{i-1})^2, momentum damping/diffusion toward
    # a T=10 bath. Production operating point:
    #   vmc-pde fokkerPlanck32 --samples 524288 --chunk-size 65536 \
    #       --steps-per-dispatch 8 --aot-dir .aot_cache
    "fokkerPlanck32": _preset(
        name="fokkerPlanck32", dim=32, offset=(0.0,) * 32,
        latent_name="Gauss", equation="advection_hamiltonian_wDiss",
        equation_params={"T": 10.0, "coupled": True},
        variant="affine", n_samples_tdvp=16384, n_samples_obs=16384,
        dt0=2e-3, max_step=2e-3, t_end=1.0, grid_bound=10.0,
    ),
    "diffusion": _preset(
        name="diffusion", dim=8, offset=(0.0,) * 8, latent_name="Student_t",
        equation="diffusion", variant="scale",
        dt0=1e-7, max_step=1e-2, grid_bound=10.0,
    ),
    "diffusion_anisotropic": _preset(
        name="diffusion_anisotropic", dim=12, offset=(0.0,) * 12,
        latent_name="Gauss", equation="diffusion_anisotropic",
        variant="scale", dt0=1e-7, max_step=1e-2, grid_bound=10.0,
    ),
}


def preset(name: str, **overrides) -> RunConfig:
    cfg = dataclasses.replace(PRESETS[name], **overrides)
    return cfg


def latent_for_sampler(cfg: RunConfig) -> str:
    """The flow's latent family. All workload latents (including the
    fluidpaper cosine bump, which the reference's net did not actually
    implement -- net.py:197-199, quirk Q9) are first-class here."""
    return cfg.latent_name

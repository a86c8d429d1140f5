"""TDVP (time-dependent variational principle / stochastic reconfiguration)
core: assembles and solves S dtheta = F from Monte-Carlo estimates.

Parity with vmc_fluids/tdvp.py:20-164 -- centered force/Gram assembly
(tdvp.py:36-52), eigenbasis transform + per-mode SNR (tdvp.py:57-71), hard
eigenvalue cutoff |ev/ev_max| > 1e-14 plus soft sixth-power regularizers on
svdTol (and optionally snrTol) (tdvp.py:82-91), solver residual and
integrated TDVP error diagnostics (tdvp.py:93-94), and the per-step
observables (tdvp.py:143-162).

TPU-native architecture (SURVEY.md section 7), the big delta vs the
reference:

- ONE jitted, mesh-sharded program per right-hand-side evaluation: latent
  sampling -> inverse-flow push-forward -> per-sample (logp, score, Hessian
  block, O_k row) -> Gram/force contraction -> regularized eigensolve ->
  parameter update. The reference crosses host<->device dozens of times per
  step (pmap closures, host eigh, MPI Allreduce); here the only host traffic
  is the O(1) update vector and diagnostics.
- The Gram matrix S = E[O^T O] and all second moments are MXU matmuls
  contracting the sharded sample axis; XLA emits the ICI collectives
  (replacing mpi_wrapper.global_covariance's host Allreduce).
- Per-sample parameter gradients are taken w.r.t. the flat parameter vector,
  yielding the (N, P) O-matrix directly in matmul layout.
- A chunked accumulation mode (``chunk_size``) streams samples through a
  lax.scan so the O-matrix never fully materializes in HBM -- required for
  N_samples x N_params beyond HBM capacity. It accumulates weighted second
  moments shifted by a pilot mean estimate to avoid catastrophic
  cancellation in f32.
- The eigensolve runs in ``Precision.solve`` dtype (f64 by default) either
  on device inside the fused program or on host (numpy), matching the
  reference's default host path (tdvp.py:57-64).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..kernels import persample
from ..kernels import quant8
from ..kernels.syrk import syrk as _syrk
from ..models.state import VarState
from ..ops import score
from ..ops.evolution import Equation
from ..parallel import stats
from ..utils.dtypes import Precision


@dataclasses.dataclass(frozen=True)
class TDVPConfig:
    """Solver knobs (tdvp.py:20-26 defaults)."""

    use_snr: bool = False
    snr_tol: float = 2.0
    svd_tol: float = 1e-11
    diagonal_shift: float = 0.0
    eig_cutoff: float = 1e-14
    # > 0: winsorize Eloc at this many robust (MAD) standard deviations --
    # heavy-tail MC-bias control (see _maybe_clip_eloc). Direct-stats
    # paths only (the streaming path has no global median).
    eloc_clip: float = 0.0
    # < 1: tail-tempered importance sampling of the TDVP batch (Student_t
    # exact latent only): draw from t_{gamma*nu} and weight the
    # force/Gram/SNR statistics by the bounded ratio t_nu/t_{gamma*nu}
    # (self-normalized; latent.student_t_tempered_sample). Observables
    # always resample from the TARGET. Direct-stats eigh/cholesky paths.
    is_gamma: float = 1.0
    # Linear-solver strategy. "eigh" is the reference's spectral
    # pseudo-inverse with per-mode regularization (tdvp.py:57-91); its cost
    # is a dense O(P^3) eigendecomposition that dominates the whole step
    # beyond a few thousand parameters (P=9264: seconds on a v5e, vs ~100 ms
    # for everything else combined). "cholesky" solves the Tikhonov system
    # (S + svd_tol * lambda_max * I) du = F with a power-iteration
    # lambda_max estimate -- the same soft small-mode suppression without
    # the spectrum (so no per-mode ev/snr diagnostics). "cg" goes fully
    # MATRIX-FREE: Jacobi-preconditioned conjugate gradients on the same
    # Tikhonov system using only O-matvecs S v = Obar^T (Obar v)/N -- the
    # O(N P^2) Gram and the O(P^2) matrix never materialize (requires the
    # direct stats path, chunk_size = 0). "minsr" solves in the N x N
    # KERNEL space T = Obar Obar^T instead (eig(S) = eig(T)/N on the
    # nonzero modes): the reference's per-mode regularizers apply verbatim
    # and the full spectrum + SNR stay observable at O(N^2 P + N^3) -- the
    # direct-solve scaling path for P >> N (see _solve_minsr). "auto"
    # picks eigh up to ``eigh_max_params`` and cholesky beyond.
    solver_method: str = "auto"
    eigh_max_params: int = 2048
    cg_maxiter: int = 250
    cg_tol: float = 1e-7
    # MXU pass count for the Gram contractions: "highest" (6-pass f32
    # equivalent), "high" (3-pass, ~2x faster at identical measured residual
    # -- 3-pass rounding sits far below the f32 tolerance floor), "default"
    # (1-pass bf16: too coarse for the spectral solve).
    gram_precision: str = "high"
    # Gram contraction backend. "sym2" exploits the operand symmetry of
    # S = O^T O under the hi/lo bf16 split: HIGH's third pass is the
    # transpose of its second, so two MXU passes reproduce all three
    # HIGH terms (parallel/stats.sym2_gram_sum; 1.5x FLOP cut at the
    # same numerics class, chunk-safe, SPMD-partitionable). "tri2"
    # additionally computes only the block-lower-triangle of the
    # symmetric first term and mirrors once after accumulation
    # (stats.tri2_gram_sum_raw): 1.5 + 0.5/K effective passes; runs on a
    # single device or -- through the shard_map stats path
    # (stats_partitioning) -- per shard on a dp mesh with one psum of
    # the assembled matrix. "syrk" computes only the lower-triangle
    # tiles with a single-device Pallas kernel (kernels/syrk.py). "xla"
    # is the plain matmul. "auto" picks, on TPU with f32
    # "high"-precision stats, tri2 at P >= 4096 wherever its collective
    # cost is flat (single device or shard_map stats) and sym2 otherwise
    # (both win on every measured shape, direct and chunked; sym2 also
    # shards under plain GSPMD); xla elsewhere. The same flag gates
    # minSR's symmetric kernel-space contractions (stats.sym2_outer_sum
    # for T's diagonal/direct assembly).
    gram_backend: str = "auto"
    # MXU engine for the split backends' CROSS pass (the unsymmetric
    # hi^T lo term of sym2/tri2 -- the one full pass tri2 cannot
    # triangle-block). "bf16": the standard DEFAULT-precision pass.
    # "int8": per-column-quantized int8 x int8 -> int32 (2x the bf16 MXU
    # rate on TPU); per-column scales factor exactly out of the
    # contraction, and the quantization error (~2^-15 of the Gram scale)
    # sits below the lo@lo term the split class already drops
    # (stats._cross_sum; scripts/bench_int8.py accuracy measurement).
    # Chunked paths only in effect: exact int32 accumulation bounds the
    # contraction length at 131,072 samples PER DEVICE, beyond which the
    # request falls back to bf16 per-call. "auto" engages int8 on TPU
    # split configs on a single device (d=32 headline: +25% RHS
    # throughput at unchanged residual, results/bench_int8cross_r3h.txt)
    # and on dp meshes through the shard_map stats path (per-shard
    # quantization scales, de-scaled before the psum -- no amax
    # collective); it stays bf16 on GSPMD meshes/CPU.
    gram_cross: str = "auto"
    # tri2 panel width override (0 = stats.tri2_bounds' measured default,
    # 512-aligned merged-remainder panels). The panel count K = P //
    # target_block trades MXU M-dim efficiency against strip count; the
    # partitioning/collective structure is K-independent (strips
    # accumulate locally, one psum of the assembled moments), so
    # compile-budget-sensitive configurations (the virtual-CPU-mesh
    # multichip dryrun: each strip is a separately compiled dot on the
    # single-core CPU backend) can pick a coarse K without changing the
    # program class being validated.
    tri2_target_block: int = 0
    # Spectral observability on the large-P (cholesky) path: the reference
    # records the FULL eigenvalue spectrum and per-mode SNR every step
    # (tdvp.py:57-71, main.py:186-187), which the O(P^3) eigh makes
    # unaffordable at P ~ 10^4. Instead, the top-k eigenvalues/Ritz vectors
    # come from randomized subspace iteration (O(P^2 k) MXU matmuls), the
    # bulk is summarized by trace(S) - sum(top-k), and per-mode SNR is
    # Ritz-projected. 0 disables.
    spectrum_topk: int = 64
    # Floor svd_tol/eig_cutoff at multiples of the compute dtype's epsilon:
    # the reference tolerances assume f64 statistics; with an f32 compute
    # path, Gram eigenvalue noise sits at ~eps * ev_max and must be cut.
    auto_tol_floor: bool = True
    # Per-sample Hessian strategy. "trace": when the equation consumes the
    # Hessian only through quadratic-form sums (all diffusion operators and
    # Fokker-Planck -- hessian_trace_dirs), compute that scalar forward-
    # over-forward (score.quad_trace; no backward graph, ~2x fewer FLOPs
    # and streaming memory) instead of materializing the (k, k) block per
    # sample. "block": always the jvp-of-grad block (reference-shaped,
    # var_state.py:32). "auto" = trace whenever the equation allows it.
    hessian_mode: str = "auto"
    # Statistics partitioning on multi-device meshes. "gspmd": the whole
    # stats block is ordinary sharded jit -- XLA inserts one all-reduce
    # per sample-contracting dot_general (sym2: 2 per Gram; tri2 would be
    # K+1, which is why round-3 gated it off meshes). "shard_map": the
    # stats block runs as a per-device manual program -- every Gram
    # backend (tri2 included) accumulates raw LOCAL products, the
    # triangle strips are assembled per device, and ONE psum of the
    # finished (P, P) moments crosses the fabric per statistics
    # evaluation (per RHS, not per chunk: the chunked scan accumulates
    # locally). The int8 cross pass quantizes each shard with its own
    # per-column scales and de-scales BEFORE the psum, so it needs no
    # amax collective at all -- the two round-3 objections to tri2/int8
    # on meshes dissolve rather than get paid. On dp x tp meshes
    # (round-5) the whole mesh flattens into the sample axis: dp * tp
    # shards of n / (dp * tp) samples each, one psum over both axes --
    # which also removes GSPMD's tp-fold replication of the per-sample
    # gradient stage (see _stats_sharded). "auto" picks shard_map on any
    # multi-device mesh for the stats-based solvers (eigh/cholesky)
    # outside the IS/clip edge modes -- those keep gspmd: eloc_clip
    # needs a global median (an order statistic the local program can't
    # see) and is_gamma needs globally normalized IS weights; both are
    # direct-path-only low-N modes where the collective layout is a
    # minor cost (sharded==single equivalence for them is pinned by
    # tests/test_parallel.py). On tp > 1 meshes 'auto' additionally
    # requires P <= 16384: past that, GSPMD's tp-row-sharded Gram is
    # the memory-scaling layout the tp axis exists for (see the gate
    # comment in __init__).
    stats_partitioning: str = "auto"
    # Per-sample pipeline backend. "xla": vmapped value_and_grad +
    # quad_trace fused by XLA (the measured default). "pallas": the fused
    # per-sample Pallas kernel (kernels/persample.py) -- forward flow,
    # parameter/coordinate backward, and Hessian trace on a VMEM-resident
    # sample tile, writing only the (tile, P) O block to HBM. Gauss or
    # Student-t latents, trace-mode Hessians (persample.supports); on
    # multi-device meshes the kernel runs per device (inside the
    # shard_map stats path, or shard_mapped over dp for the GSPMD call
    # sites); sample budgets must divide dp_size * per_sample_tile.
    # "auto" engages the kernel on TPU f32 configs with
    # 2048 <= P <= 32768, single-device AND meshes (round 4).
    per_sample_backend: str = "auto"
    per_sample_tile: int = 256  # lane-axis tile; must be a multiple of 128
    compute_snr: bool = True      # record per-mode SNR diagnostics
    compute_sexp: bool = False    # DENSE (P, P) SExp for the adaptive norm
    # Adaptive-stepper S-metric source. "none": whatever compute_sexp says.
    # "dense": the reference's (P, P) SExp matrix (= compute_sexp=True).
    # "matfree": never form SExp -- evaluate the quadratic v^T SExp v
    # directly as E[logp^2 (Obar v)^2] with Obar v a single jvp (forward)
    # pass over the last stage's samples (see TDVP._sexp_quad): O(N P) per
    # adaptive attempt instead of an O(N P^2) Gram per stage, and the ONLY
    # option at large P where (P, P) is unaffordable (the round-3 item
    # lifting the driver's adaptive+cg/minsr rejection). "auto": dense for
    # the eigh solver (reference parity), matfree otherwise.
    sexp_mode: str = "none"
    solve_on_device: bool = True  # False = host numpy f64 eigh (tdvp.py:60-64)
    chunk_size: int = 0           # >0: stream samples in chunks of this size
    observables: bool = True
    integrals: bool = False       # MC sphere integrals (tdvp.py:153-162)
    integral_T: float = 10.0      # variance scale in the integral check


def _soft_cutoff(x, tol):
    """The reference's sixth-power soft regularizer 1/(1 + (tol/x)^6)
    (tdvp.py:85), evaluated as a log-space sigmoid: sigmoid(6 (log x -
    log tol)). Analytically identical, but finite for x in [0, inf] where
    the naive pow NaNs on the TPU's emulated f64 near underflow."""
    return jax.nn.sigmoid(6.0 * (jnp.log(x) - np.log(tol)))


def _solve_regularized(S, F, cfg: TDVPConfig, n_samples: int, A=None,
                       eigh_fn=jnp.linalg.eigh):
    """Eigendecompose S and apply the reference's regularized pseudo-inverse
    (tdvp.py:57-91). A = E[Ebar^2 Obar^T Obar] feeds the per-mode SNR.
    Returns (update, ev, snr, VtF)."""
    ev, V = eigh_fn(S)
    _HI = jax.lax.Precision.HIGHEST if not isinstance(S, np.ndarray) else None
    def _mm(a, b):
        if _HI is None:
            return a @ b
        return jnp.matmul(a, b, precision=_HI)

    VtF = _mm(V.T, F)

    ratio = jnp.abs(ev / ev[-1])
    inv_ev = jnp.where(ratio > cfg.eig_cutoff, 1.0 / ev, 0.0)
    soft_cutoff = _soft_cutoff  # see module-level docstring
    regularizer = soft_cutoff(ratio, cfg.svd_tol)

    snr = None
    if A is not None:
        AV = _mm(A, V)
        # rho_var >= 0 up to fp noise (variance of rotated EO data); floor
        # at the dtype's tiny so exact-zero null modes give snr = 0 rather
        # than 0/0 = NaN.
        rho_var = jnp.maximum(jnp.abs(jnp.sum(V * AV, axis=0) - VtF**2),
                              jnp.finfo(VtF.dtype).tiny)
        snr = jnp.sqrt(jnp.abs(n_samples * VtF**2 / rho_var))
        if cfg.use_snr:
            regularizer = regularizer * soft_cutoff(snr, cfg.snr_tol)

    update = _mm(V, inv_ev * regularizer * VtF)
    return update, ev, snr, VtF


def _lambda_max(S, n_iter: int = 12,
                precision=jax.lax.Precision.HIGHEST):
    """Largest eigenvalue via power iteration (O(n_iter * P^2)). The matvecs
    carry explicit precision: lambda_max scales the Tikhonov shift, and the
    TPU f32 matmul default (1-pass bf16) is too coarse for that role."""
    v = jnp.ones((S.shape[0],), dtype=S.dtype) / math.sqrt(S.shape[0])

    def body(_, v):
        w = jnp.matmul(S, v, precision=precision)
        return w / jnp.linalg.norm(w)

    v = jax.lax.fori_loop(0, n_iter, body, v)
    return v @ jnp.matmul(S, v, precision=precision)


def _randomized_topk_eigh(S, k: int, key, n_iter: int = 2,
                          precision=jax.lax.Precision.HIGHEST):
    """Top-k eigenpairs of symmetric PSD S by randomized subspace iteration
    (Halko-Martinsson-Tropp): Y = (S)^(n_iter+1) Omega with QR
    re-orthonormalization, then a k_eff x k_eff Rayleigh-Ritz eigh. All the
    heavy work is O(P^2 k_eff) MXU matmuls -- the TPU-friendly replacement
    for the reference's full O(P^3) spectrum at large P.

    Returns (ev (k,), V (P, k)) in ascending order of ev."""
    P = S.shape[0]
    k_eff = min(k + 8, P)  # oversampling for subspace capture

    def mm(a, b):
        return jnp.matmul(a, b, precision=precision)

    Om = jax.random.normal(key, (P, k_eff), dtype=S.dtype)
    Y = mm(S, Om)
    for _ in range(n_iter):
        Q, _ = jnp.linalg.qr(Y)
        Y = mm(S, Q)
    Q, _ = jnp.linalg.qr(Y)
    B = mm(Q.T, mm(S, Q))
    ev, U = jnp.linalg.eigh(0.5 * (B + B.T))
    V = mm(Q, U)
    return ev[-k:], V[:, -k:]


def _solve_cholesky(S, F, cfg: TDVPConfig, lam_max=None):
    """Tikhonov-regularized direct solve for large parameter counts:
    (S + svd_tol * lambda_max * I) du = F. Matches the eigh path's
    suppression of modes below svd_tol * lambda_max (a soft spectral filter
    ev/(ev + lam) instead of the sixth-power sigmoid) at O(P^3/3) Cholesky
    cost with no eigendecomposition. Returns (update, lambda_max)."""
    if lam_max is None:
        lam_max = _lambda_max(S)
    lam = cfg.svd_tol * lam_max
    A = S + lam * jnp.eye(S.shape[0], dtype=S.dtype)
    L = jnp.linalg.cholesky(A)
    update = jax.scipy.linalg.cho_solve((L, True), F)
    return update, lam_max


def _solve_cg(O_c, e_c, cfg: TDVPConfig, precision):
    """Matrix-free Tikhonov solve: (Obar^T Obar / N + lam I) u = F with
    Jacobi preconditioning. Every operation is an (N, P) matvec -- the Gram
    matrix is never formed. Returns (update, F, lam_max, matvec)."""
    n = O_c.shape[0]
    diag_s = jnp.mean(O_c * O_c, axis=0)

    def sv(v):
        out = jnp.matmul(
            jnp.matmul(O_c, v, precision=precision), O_c,
            precision=precision,
        ) / n  # (O_c v)^T O_c == O_c^T (O_c v), one row-vector matmul each
        if cfg.diagonal_shift > 1e-10:
            # diagonal shift S += shift * diag(S) (tdvp.py:50-51), matvec form
            out = out + cfg.diagonal_shift * diag_s * v
        return out

    F = jnp.matmul(e_c, O_c, precision=precision) / n

    # power iteration for lambda_max (matvec-only)
    v0 = jnp.ones_like(F) / math.sqrt(F.shape[0])

    def body(_, v):
        w = sv(v)
        return w / jnp.linalg.norm(w)

    v = jax.lax.fori_loop(0, 12, body, v0)
    lam_max = v @ sv(v)
    lam = cfg.svd_tol * lam_max

    def mv(u):
        return sv(u) + lam * u

    diag = diag_s + lam  # Jacobi preconditioner
    if cfg.diagonal_shift > 1e-10:
        diag = diag + cfg.diagonal_shift * diag_s
    minv = lambda r: r / diag
    update, _ = jax.scipy.sparse.linalg.cg(
        mv, F, tol=cfg.cg_tol, maxiter=cfg.cg_maxiter, M=minv
    )
    return update, F, lam_max, sv


def _minsr_kernel_solve(T, e_c, cfg: TDVPConfig, sdt):
    """Kernel-space (minSR) spectral solve for the P >> N regime: the
    nonzero spectrum of S = Obar^T Obar / N coincides with eig(T)/N for the
    N x N kernel T = Obar Obar^T, and the minimum-norm solution of S u = F
    is u = Obar^T W diag(reg_i / mu_i) W^T e_c with T = W diag(mu) W^T.
    (The kernel trick of Chen & Heyl's minSR and Rende et al.'s linear-alg
    formulation, applied to the TDVP flow; no reference counterpart --
    vmc_fluids/tdvp.py only ever forms the P x P Gram.)

    The reference's per-mode regularizers (hard eig_cutoff + sixth-power
    svd_tol sigmoid, optionally SNR, tdvp.py:82-91) apply verbatim to
    ev = mu / N, so unlike the Cholesky large-P path the FULL nonzero
    spectrum and per-mode SNR stay observable -- at O(N^2 P + N^3) instead
    of O(N P^2 + P^3) cost and O(N^2) solver memory.

    Per-mode SNR without any P x P matrix: the parameter-space eigenvector
    is V_i = Obar^T W_i / sqrt(mu_i), so Obar V_i = sqrt(mu_i) W_i and
    V_i^T A V_i = (mu_i / N) sum_n e_n^2 W_{n,i}^2 -- elementwise in the
    kernel eigenbasis.

    The solver residual and TDVP error are ALSO pure kernel-space forms
    (u = Obar^T alpha): S u - F = Obar^T (T alpha - e_c) / n, so
    ||S u - F||^2 = q(T alpha - e_c) / n^2 and ||F||^2 = q(e_c) / n^2 with
    the quadratic q(v) = v^T T v; u^T S u = ||T alpha||^2 / n and
    F . u = e_c^T T alpha / n. No P-dimensional vector is ever needed for
    the diagnostics -- the enabler of the streaming path, where the (N, P)
    O matrix never materializes.

    ``T``: raw N x N kernel (any float dtype; symmetrized here).
    Returns (alpha (N,) sdt, ev, snr, residual, tdvp_quad) where
    tdvp_quad = u^T S u - 2 F . u (caller divides by E[Eloc^2])."""
    n = e_c.shape[0]
    T_s = 0.5 * (T + T.T).astype(sdt)
    mu, W = jnp.linalg.eigh(T_s)
    ev = mu / n
    e_s = e_c.astype(sdt)
    _HI = jax.lax.Precision.HIGHEST
    Wte = jnp.matmul(W.T, e_s, precision=_HI)

    ratio = jnp.abs(ev / ev[-1])
    inv_mu = jnp.where(ratio > cfg.eig_cutoff, 1.0 / mu, 0.0)
    soft_cutoff = _soft_cutoff
    regularizer = soft_cutoff(ratio, cfg.svd_tol)

    snr = None
    if cfg.compute_snr or cfg.use_snr:
        VtF = jnp.sqrt(jnp.maximum(mu, 0.0)) * Wte / n
        rho_var = jnp.maximum(
            jnp.abs((mu / n) * jnp.matmul(e_s**2, W**2, precision=_HI)
                    - VtF**2),
            jnp.finfo(VtF.dtype).tiny,
        )
        snr = jnp.sqrt(jnp.abs(n * VtF**2 / rho_var))
        if cfg.use_snr:
            regularizer = regularizer * soft_cutoff(snr, cfg.snr_tol)

    alpha = jnp.matmul(W, inv_mu * regularizer * Wte, precision=_HI)

    Ta = jnp.matmul(T_s, alpha, precision=_HI)
    tiny = jnp.finfo(sdt).tiny

    def q(v):
        return jnp.maximum(
            jnp.dot(v, jnp.matmul(T_s, v, precision=_HI), precision=_HI),
            0.0)

    residual = jnp.sqrt(q(Ta - e_s) / jnp.maximum(q(e_s), tiny))
    u_S_u = jnp.dot(Ta, Ta, precision=_HI) / n
    F_u = jnp.dot(e_s, Ta, precision=_HI) / n
    tdvp_quad = u_S_u - 2.0 * F_u
    return alpha, ev, snr, residual, tdvp_quad


def _solve_minsr(O_c, e_c, cfg: TDVPConfig, precision, sdt,
                 use_sym2=False):
    """Direct (materialized-O) minSR: form T on the MXU, solve in kernel
    space, push alpha back through O (update = Obar^T alpha). Returns
    (update, ev, snr, residual, tdvp_quad); see _minsr_kernel_solve.
    ``use_sym2``: assemble the symmetric T in two bf16 passes
    (stats.sym2_outer_sum) instead of HIGH's three -- the caller gates
    this to the f32/'high' TPU operating point."""
    if use_sym2:
        T = stats.sym2_outer_sum(O_c)
    else:
        T = jnp.matmul(O_c, O_c.T, precision=precision)
    alpha, ev, snr, residual, tdvp_quad = _minsr_kernel_solve(
        T, e_c, cfg, sdt)
    update = jnp.matmul(alpha.astype(O_c.dtype), O_c,
                        precision=precision).astype(sdt)
    return update, ev, snr, residual, tdvp_quad


def _ball_volume(dim: int, radius: float) -> float:
    return math.pi ** (dim / 2) / math.gamma(dim / 2 + 1) * radius**dim


class TDVP:
    """Fused TDVP right-hand side over a device mesh.

    ``rhs(theta_master, t, key)`` returns (dtheta_master, aux); steppers
    integrate it in time. Exposes the reference's diagnostics after each call
    (``ev``, ``snr``, ``solverResidual``, ``tdvp_error``, ``SExp``).
    """

    def __init__(
        self,
        state: VarState,
        equation: Equation,
        cfg: TDVPConfig = TDVPConfig(),
        n_samples: int = 10000,
        n_samples_obs: Optional[int] = None,
        precision: Optional[Precision] = None,
    ):
        self.state = state
        self.flow = state.flow
        self.equation = equation
        self.cfg = cfg
        self.ctx = state.ctx
        self.precision = precision or state.precision
        self.sampler = state.sampler

        self.n_samples = self.sampler.rounded_budget(n_samples)
        self.n_samples_obs = (
            self.sampler.rounded_budget(n_samples_obs)
            if n_samples_obs is not None
            else self.n_samples
        )
        if 0 < cfg.chunk_size < self.n_samples:
            # The streaming path scans whole chunks; round the budget up to
            # a multiple of lcm(chunk, sampler block) so any chunk_size is a
            # valid configuration (budgets only ever grow, like the
            # reference's distribute_sampling LCM rounding).
            block = self.sampler.rounded_budget(1)
            step = math.lcm(block, cfg.chunk_size)
            self.n_samples = -(-self.n_samples // step) * step

        if cfg.auto_tol_floor:
            # the floor tracks the dtype the STATISTICS are contracted in:
            # gram_precision="f64" restores the reference's raw 1e-11/1e-14
            # tolerances even on an f32 compute path. "f64acc" contracts
            # each chunk in f32 but accumulates exactly, so its noise
            # floor improves on f32 by ~sqrt(n_chunks) (the cross-chunk
            # partial-sum rounding is gone).
            stat_dt = stats.GRAM_OPERAND_DTYPE.get(
                cfg.gram_precision, self.precision.compute)
            eps = float(jnp.finfo(stat_dt).eps)
            if (cfg.gram_precision == "f64acc"
                    and 0 < cfg.chunk_size < self.n_samples):
                eps /= math.sqrt(self.n_samples / cfg.chunk_size)
            cfg = dataclasses.replace(
                cfg,
                svd_tol=max(cfg.svd_tol, 64.0 * eps),
                eig_cutoff=max(cfg.eig_cutoff, 8.0 * eps),
            )
            self.cfg = cfg

        flat, unravel = score.flat_param_view(state.params)
        self.n_params = int(flat.size)

        if cfg.solver_method == "auto":
            method = "eigh" if self.n_params <= cfg.eigh_max_params \
                else "cholesky"
        else:
            method = cfg.solver_method
        if method not in ("eigh", "cholesky", "cg", "minsr"):
            raise ValueError(f"unknown solver_method {method!r}")
        if cfg.eloc_clip < 0:
            # jnp.clip with min > max would silently collapse every Eloc
            # to one constant and freeze the dynamics
            raise ValueError("eloc_clip must be >= 0 (robust sigmas)")
        if cfg.eloc_clip and 0 < cfg.chunk_size:
            raise ValueError("eloc_clip needs the direct stats path "
                             "(global median); use chunk_size=0")
        if cfg.is_gamma != 1.0:
            if not (0.0 < cfg.is_gamma < 1.0):
                raise ValueError("is_gamma must be in (0, 1] (proposal must "
                                 "dominate the target's tails)")
            if not (self.sampler.exact
                    and self.flow.latent_name == "Student_t"):
                raise ValueError("is_gamma tempering needs the exact "
                                 "Student_t latent")
            if cfg.chunk_size or method in ("cg", "minsr"):
                raise ValueError("is_gamma tempering runs on the direct "
                                 "eigh/cholesky statistics path")
        if method == "cg" and cfg.chunk_size:
            raise ValueError("solver_method='cg' works on the materialized "
                             "O matrix; use chunk_size=0")
        if method in ("cg", "minsr") and not cfg.solve_on_device:
            raise ValueError(f"solver_method={method!r} runs on device only")
        self.solver_method = method
        if cfg.sexp_mode not in ("none", "auto", "dense", "matfree"):
            raise ValueError(f"unknown sexp_mode {cfg.sexp_mode!r}")
        self._sexp_matfree = cfg.sexp_mode == "matfree" or (
            cfg.sexp_mode == "auto" and method != "eigh")
        if cfg.sexp_mode == "dense" or (
                cfg.sexp_mode == "auto" and method == "eigh"):
            cfg = dataclasses.replace(cfg, compute_sexp=True)
            self.cfg = cfg
        if method == "cg" and (cfg.compute_snr or cfg.use_snr
                               or cfg.compute_sexp):
            # matrix-free: no S, no spectrum, no SExp matrix
            import warnings

            if cfg.compute_sexp:
                warnings.warn(
                    "solver_method='cg' cannot provide the SExp matrix; an "
                    "adaptive stepper's S-metric error norm will silently "
                    "degrade to the plain 2-norm. Use solver_method="
                    "'cholesky' (or 'eigh') with adaptive_heun.",
                    stacklevel=2,
                )
            if cfg.use_snr:
                warnings.warn(
                    "solver_method='cg' is matrix-free (no spectral basis), "
                    "so use_snr cannot gate modes and is DISABLED. Use "
                    "'eigh' (P <= eigh_max_params), 'cholesky' with "
                    "spectrum_topk > 0 (Ritz-projected gating), or 'minsr' "
                    "(kernel-basis gating) for SNR regularization.",
                    stacklevel=2,
                )
            cfg = dataclasses.replace(cfg, compute_snr=False, use_snr=False,
                                      compute_sexp=False)
            self.cfg = cfg
        elif method == "minsr" and cfg.compute_sexp:
            # the spectrum and per-mode SNR survive in the kernel basis,
            # but the (P, P) SExp matrix would defeat the point of minSR
            raise ValueError(
                "solver_method='minsr' cannot provide the SExp matrix for "
                "the adaptive stepper's S-metric; use 'cholesky' or 'eigh' "
                "with adaptive_heun"
            )
        if method == "minsr" and cfg.diagonal_shift > 1e-10:
            # shift * diag(S) is a parameter-space regularizer with no
            # kernel-space representation; refusing beats silently
            # producing different dynamics than every other solver_method
            raise ValueError(
                "solver_method='minsr' does not support diagonal_shift "
                "(no N x N kernel-space representation of shift * diag(S))"
            )
        elif method == "cholesky":
            # Per-mode SNR survives via the randomized top-k Ritz basis
            # (spectrum_topk), and use_snr now gates THROUGH it (round-4
            # item 8): the Tikhonov update's Ritz-subspace components get
            # the reference's sixth-power SNR soft-cutoff (tdvp.py:88-91)
            # while the orthogonal complement passes through -- low-SNR
            # directions outside the top-k are already suppressed by the
            # Tikhonov filter ev/(ev + svd_tol * lam_max), since SNR ~
            # sqrt(N) |VtF| / rho and small-ev modes carry the noisiest
            # force components. use_snr therefore REQUIRES the Ritz basis.
            if cfg.use_snr and (cfg.spectrum_topk <= 0
                                or not cfg.solve_on_device):
                raise ValueError(
                    "use_snr on solver_method='cholesky' gates modes in "
                    "the randomized Ritz subspace, which exists on the "
                    "on-device solve only; set spectrum_topk > 0 and "
                    "solve_on_device=True (or use solver_method='eigh'/"
                    "'minsr' for full-spectrum SNR gating)"
                )
            keep_snr = ((cfg.compute_snr or cfg.use_snr)
                        and cfg.spectrum_topk > 0)
            if cfg.compute_snr != keep_snr:
                cfg = dataclasses.replace(cfg, compute_snr=keep_snr)
                self.cfg = cfg
        if cfg.stats_partitioning not in ("auto", "gspmd", "shard_map"):
            raise ValueError(
                f"unknown stats_partitioning {cfg.stats_partitioning!r}")
        # shard_map stats (TDVPConfig.stats_partitioning): per-device local
        # moment accumulation with ONE psum of the assembled (P, P) moments
        # per statistics evaluation. Eligibility: a multi-device mesh, a
        # stats-based solver (cg/minsr are gram-free and already lower
        # well), no global-median clip, no IS weights (both need global
        # order statistics / normalization the local program can't see),
        # and sample budgets/chunks that split evenly over ALL mesh
        # devices. On dp x tp meshes (round-5 tp parity) the path
        # flattens the whole mesh into the sample axis: each of the
        # dp * tp devices runs the local fast-Gram stack (tri2 + int8 +
        # split kernel) on n / (dp * tp) samples. That strictly beats the
        # GSPMD layout on per-sample FLOPs -- GSPMD keeps samples
        # dp-sharded, so the per-sample gradient stage is REPLICATED
        # across tp and only the Gram dot_general splits its output rows
        # over tp -- while per-device Gram MACs are identical
        # (n/(dp tp) * P^2 here vs n/dp * P^2/tp there) and the
        # cross-device traffic stays ONE fused psum of the assembled
        # moments (GSPMD pays one collective per sample-contracting
        # dot_general: 2 for sym2, +2 with SNR on).
        smap_ok = (
            self.ctx.mesh.size > 1
            and method in ("eigh", "cholesky")
            and cfg.eloc_clip == 0.0
            and cfg.is_gamma == 1.0
            and (cfg.chunk_size == 0
                 or cfg.chunk_size % self.ctx.mesh.size == 0)
            and self.n_samples % self.ctx.mesh.size == 0
        )
        if cfg.stats_partitioning == "shard_map" and not smap_ok:
            raise ValueError(
                "stats_partitioning='shard_map' needs a multi-device "
                "mesh, solver_method eigh/cholesky, no "
                "eloc_clip/is_gamma, and n_samples/chunk_size divisible "
                "by the mesh size "
                f"(mesh dp={self.ctx.dp_size} tp={self.ctx.tp_size}, "
                f"method={method!r}, n_samples={self.n_samples}, "
                f"chunk_size={cfg.chunk_size})"
            )
        # 'auto' on tp > 1 meshes keeps GSPMD once P is large enough that
        # the per-device ASSEMBLED moments stop being comfortably
        # HBM-resident: tp's design role is the P^2-breaking regime
        # (SCALING.md "Mesh axes"), where GSPMD's tp-row-sharded Gram
        # (P/tp, P) is the point -- the flat-sample shard_map path
        # assembles full (P, P) matrices per device (1 GB per moment at
        # P=16384 f32, x3 with SNR on), so it must not silently replace
        # the memory-scaling layout. Explicit 'shard_map' overrides.
        self._stats_shardmap = smap_ok and (
            cfg.stats_partitioning == "shard_map"
            or (cfg.stats_partitioning == "auto"
                and (self.ctx.tp_size == 1 or self.n_params <= 16384)))
        if cfg.gram_precision not in stats.PRECISIONS:
            raise ValueError(f"unknown gram_precision "
                             f"{cfg.gram_precision!r}")
        if ((stats.GRAM_OPERAND_DTYPE.get(cfg.gram_precision) is not None
             or stats.GRAM_ACC_DTYPE.get(cfg.gram_precision) is not None)
                and not jax.config.read("jax_enable_x64")):
            # without x64, astype(float64) silently demotes to f32 and the
            # "f64 statistics/accumulation" promise would be a no-op
            raise ValueError(f"gram_precision={cfg.gram_precision!r} needs "
                             "x64 enabled (use a Precision preset that "
                             "calls enable_x64, e.g. 'tpu_f64stats')")
        if cfg.gram_precision == "f64acc":
            # the mode IS the chunked accumulation; direct contraction has
            # no cross-chunk carry to upgrade
            if not (0 < cfg.chunk_size < self.n_samples):
                raise ValueError(
                    "gram_precision='f64acc' upgrades the CHUNKED "
                    "accumulation carry to f64; set 0 < chunk_size < "
                    f"n_samples (chunk_size={cfg.chunk_size}, "
                    f"n_samples={self.n_samples})")
            if method not in ("eigh", "cholesky"):
                raise ValueError(
                    "gram_precision='f64acc' serves the Gram-based "
                    "eigh/cholesky statistics path")
        if cfg.gram_backend not in ("auto", "xla", "syrk", "sym2", "tri2"):
            raise ValueError(f"unknown gram_backend {cfg.gram_backend!r}")
        # sym2: the 2-pass symmetric-Gram split (stats.sym2_gram_sum) --
        # pure XLA dot_generals, so it works on any mesh and inside the
        # chunked scan (all weighted moments included, signed sum_EOO
        # too), but it IS the f32 "high"-numerics operating point.
        self._use_sym2 = (
            cfg.gram_backend == "sym2"
            and self.precision.compute == jnp.float32
            and cfg.gram_precision in ("high", "f64acc")
        )
        if cfg.gram_backend == "sym2" and not self._use_sym2:
            raise ValueError(
                "gram_backend='sym2' implements f32 statistics at "
                "gram_precision='high' numerics; use 'auto'/'xla' with "
                "this precision configuration"
            )
        # tri2: triangle-blocked sym2 (stats.tri2_gram_sum_raw) -- computes
        # only the lower block-triangle of the symmetric H^T H term and
        # mirrors once after accumulation: (1.5 + 0.5/K) MXU passes vs
        # sym2's 2 at the same numerics class. Single-device or shard_map
        # stats: under GSPMD on a mesh its K+1 split dot_generals would
        # each all-reduce separately (~1.5x the Gram's collective bytes vs
        # sym2's one assembled matrix -- HLO-measured in
        # tests/test_parallel.py::test_shardmap_single_big_allreduce);
        # under shard_map stats the strips accumulate locally and ONE psum
        # of the assembled (P, P) crosses the fabric, so tri2 runs on dp
        # meshes at single-device collective cost.
        self._use_tri2 = (
            cfg.gram_backend == "tri2"
            and self.precision.compute == jnp.float32
            and cfg.gram_precision in ("high", "f64acc")
        )
        if cfg.gram_backend == "tri2":
            if not self._use_tri2:
                raise ValueError(
                    "gram_backend='tri2' implements f32 statistics at "
                    "gram_precision='high' numerics; use 'auto'/'xla' "
                    "with this precision configuration"
                )
            if self.ctx.mesh.size > 1 and not self._stats_shardmap:
                raise ValueError(
                    "gram_backend='tri2' on a multi-device mesh needs the "
                    "shard_map stats path (its K+1 split dot_generals "
                    "would each all-reduce separately under GSPMD); this "
                    "configuration is ineligible for it -- use "
                    "gram_backend='auto'/'sym2'"
                )
        if cfg.gram_backend == "auto":
            # sym2 wins everywhere measured at the f32/HIGH operating
            # point it serves: d=32 headline (N=131k chunked) 406.7 vs
            # XLA's 472.7 ms/RHS; direct N=16,384 70.8 vs the triangle
            # syrk kernel's 76.2 and XLA's 82.9 ms (syrk computes only
            # half the MACs but runs at 73% of its ceiling; sym2's two
            # full passes ride XLA's ~88%-efficient matmul). And unlike
            # syrk it SPMD-partitions (pure dot_generals) and composes
            # with the chunked scan, so auto uses it on ANY mesh/chunk
            # config. On CPU "high" lowers to a true f32 matmul -- one
            # pass, more accurate -- so the split stays TPU-only. syrk
            # remains as an explicit single-device backend.
            self._use_sym2 = (
                jax.default_backend() == "tpu"
                and cfg.gram_precision in ("high", "f64acc")
                and self.precision.compute == jnp.float32
            )
            self._use_syrk = False
            # Large P: upgrade to the triangle-blocked split (tri2) --
            # same numerics class, (1.5 + 0.5/K) MXU passes instead of
            # sym2's 2 -- on a single device OR on a dp mesh through the
            # shard_map stats path (local strips, one psum; the round-3
            # single-device-only gate is gone). Gated at P >= 4096: below
            # that the Gram is a minor cost and the K extra dot_generals
            # just add compile/dispatch surface. (Measured at the d=32
            # headline shape: see BENCHMARKS.md Gram-backend table.)
            if (self._use_sym2
                    and (self.ctx.mesh.size == 1 or self._stats_shardmap)
                    and self.n_params >= 4096):
                self._use_sym2 = False
                self._use_tri2 = True
        else:
            self._use_syrk = cfg.gram_backend == "syrk"
            if self._use_syrk and self.ctx.mesh.size > 1:
                # the Pallas kernel has no SPMD partitioning: on a sharded
                # mesh XLA would gather/replicate the (N, P) operand onto
                # every device (or fail), exactly what 'auto' avoids
                raise ValueError(
                    "gram_backend='syrk' is a single-device kernel; use "
                    "gram_backend='auto'/'xla' on multi-device meshes"
                )
            if self._use_syrk and (
                    self.precision.compute != jnp.float32
                    or cfg.gram_precision not in ("high", "f64acc")):
                # the kernel casts operands to f32 and implements exactly
                # the 3-pass (HIGH) split; forcing it under an f64 compute
                # policy or gram_precision='highest' would silently degrade
                # the statistics below what the config promises
                raise ValueError(
                    "gram_backend='syrk' implements f32 statistics at "
                    "gram_precision='high' numerics; use gram_backend="
                    "'auto'/'xla' with this precision configuration"
                )

        if cfg.gram_cross not in ("auto", "bf16", "int8"):
            raise ValueError(f"unknown gram_cross {cfg.gram_cross!r}")
        if cfg.tri2_target_block < 0:
            raise ValueError("tri2_target_block must be >= 0 "
                             "(0 = measured default)")
        # int8 cross pass: only the sym2/tri2 split backends HAVE a cross
        # term; the request is meaningless (and would silently do nothing)
        # on xla/syrk configurations. "auto" engages it on single-device
        # TPU (d=32 headline: 750.5 vs 935.9 ms/RHS, +25%, residual
        # unchanged at 7.5e-6; results/bench_int8cross_r3h.txt) AND on dp
        # meshes through the shard_map stats path, where each device
        # quantizes its own shard with its own per-column scales and
        # de-scales to f32 BEFORE the single psum -- no amax collective
        # exists to pay (the round-3 mesh objection). GSPMD meshes keep
        # bf16 on auto (explicit 'int8' still works there, with the amax
        # max-collective).
        self._cross_int8 = cfg.gram_cross == "int8" or (
            cfg.gram_cross == "auto"
            and (self._use_sym2 or self._use_tri2)
            and (self.ctx.mesh.size == 1 or self._stats_shardmap)
            and jax.default_backend() == "tpu"
            # below this the Gram is a minor RHS cost and the per-call
            # quantize passes are pure overhead (same floor reasoning as
            # the tri2 P >= 4096 gate)
            and self.n_params >= 2048
        )
        if self._cross_int8 and not (self._use_sym2 or self._use_tri2):
            raise ValueError(
                "gram_cross='int8' accelerates the sym2/tri2 split "
                "backends' cross pass; this configuration resolved to "
                "gram_backend "
                f"{'syrk' if self._use_syrk else 'xla'!s}, which has no "
                "cross term (use gram_backend='auto'/'sym2'/'tri2')"
            )

        self._unravel = unravel
        self._log_prob_flat = score.make_flat_log_prob(self.flow, unravel)
        self._hess_idx = equation.hessian_coords(self.flow.dim)
        if cfg.hessian_mode not in ("auto", "trace", "block"):
            raise ValueError(f"unknown hessian_mode {cfg.hessian_mode!r}")
        self._hess_dirs = None
        if cfg.hessian_mode in ("auto", "trace"):
            dirs = equation.hessian_trace_dirs(self.flow.dim)
            if dirs is not None:
                self._hess_dirs = np.asarray(dirs)
            elif cfg.hessian_mode == "trace" and self._hess_idx is not None:
                raise ValueError(
                    f"equation {equation.name!r} needs the full Hessian "
                    "block; hessian_mode='trace' is not available"
                )
        elif (self._hess_idx is None
              and equation.hessian_trace_dirs(self.flow.dim) is not None):
            # a trace-only equation (hessian_coords -> None, trace_dirs
            # set, as in examples/custom_equation.py) has no block to
            # build; without this check eloc would later crash on
            # hess=None with an opaque TypeError
            raise ValueError(
                f"equation {equation.name!r} declares only "
                "hessian_trace_dirs (no hessian_coords block), so "
                "hessian_mode='block' cannot serve it; use "
                "hessian_mode='auto' or 'trace'"
            )

        # Fused per-sample Pallas kernel (kernels/persample.py).
        if cfg.per_sample_backend not in ("auto", "xla", "pallas"):
            raise ValueError(
                f"unknown per_sample_backend {cfg.per_sample_backend!r}")
        self._ps_pallas = None
        self._ps_tile = cfg.per_sample_tile
        # budgets must divide this for the kernel to engage at call time
        # (multi-device: every dp shard runs whole tiles)
        self._ps_round = cfg.per_sample_tile * self.ctx.dp_size
        use_pallas = cfg.per_sample_backend == "pallas"
        if use_pallas:
            if not persample.supports(self.flow, self._hess_dirs,
                                      self._hess_idx):
                raise ValueError(
                    "per_sample_backend='pallas' supports Gauss/Student_t "
                    "latents with trace-mode (or no) Hessians; use "
                    "'auto'/'xla'")
        elif cfg.per_sample_backend == "auto":
            # The kernel wins on the flagship-class regime it was tuned
            # for (d=32, P=9264, f32: 6.9 vs XLA's 8.4 ms per stage at
            # N=16,384; scripts/bench_persample.py). Small models are
            # left on XLA: re-measured WITH the jet quad at the d8
            # reference shape (P=684, N=16,384): XLA 3.03 vs kernel
            # 3.49 ms/stage, full RHS 1.00x (results/
            # bench_persample_d8_r4.txt) -- sliver shapes are cheap on
            # XLA anyway and each (flow, tile) config costs a one-off
            # Mosaic compile. Multi-
            # device meshes engage too (round-4): per-device programs run
            # inside the shard_map stats path, and the shard_mapped
            # wrapper serves the GSPMD paths; ragged budgets fall back to
            # XLA at call time either way.
            use_pallas = (
                jax.default_backend() == "tpu"
                and self.precision.compute == jnp.float32
                # lower bound: sliver shapes below this are cheap on XLA
                # and each config costs a one-off Mosaic compile; upper
                # bound: the double-buffered (P, tile) O block must fit
                # the ~100 MB VMEM budget (large-P minSR regimes stay XLA)
                and 2048 <= self.n_params <= 32768
                and persample.supports(self.flow, self._hess_dirs,
                                       self._hess_idx)
            )
        # _ps_local: the per-device program -- THE kernel on a single
        # device, and the one the shard_map stats path calls per shard on
        # a mesh. _ps_pallas: what the GSPMD call sites use (the
        # shard_mapped wrapper on meshes).
        self._ps_local = None
        if use_pallas:
            self._ps_local = persample.make_per_sample_pallas(
                self.flow, unravel, self.n_params, self._hess_dirs,
                tile=cfg.per_sample_tile,
                interpret=jax.default_backend() != "tpu",
                template=state.params,
            )
            if self.ctx.mesh.size > 1:
                # shard_map the kernel over the dp axis (tp replicas
                # recompute their shard, like the vmapped-AD pipeline
                # under GSPMD); downstream Gram sees the same shardings
                self._ps_pallas = persample.make_per_sample_sharded(
                    self.flow, unravel, self.n_params, self._hess_dirs,
                    self.ctx, tile=cfg.per_sample_tile,
                    interpret=jax.default_backend() != "tpu",
                    template=state.params,
                )
            else:
                self._ps_pallas = self._ps_local
        # Split-emitting kernel variant for the chunked sym2/tri2 Gram
        # paths: writes the bf16 hi/lo operand split of the pilot-shifted
        # O directly (same HBM bytes), so each chunk's Gram skips one
        # (chunk, P) f32 read + bf16-pair write (kernels/persample.py
        # emit_split; consumed by _chunked_stats' pair branch). The
        # (P, tile) bf16 output blocks carry no P-alignment constraint:
        # P is a full (non-tiled) block dimension, verified by an odd-P
        # (P=62) compile+run on real TPU (sub-lo-residual-grade match).
        # Always a per-device program: on meshes it is reachable only
        # from inside the shard_map stats path.
        self._ps_split = None
        if (self._ps_local is not None
                and (self.ctx.mesh.size == 1 or self._stats_shardmap)
                and (self._use_sym2 or self._use_tri2)):
            self._ps_split = persample.make_per_sample_pallas(
                self.flow, unravel, self.n_params, self._hess_dirs,
                tile=cfg.per_sample_tile,
                interpret=jax.default_backend() != "tpu",
                template=state.params, emit_split=True,
            )

        # Fused MCMC sampling: the Metropolis chain loop traces INTO the
        # TDVP step programs with the chain state threaded through
        # dispatches (dp-sharded chains, sampler.make_chain_fn). MCMC
        # workloads then get the same fused heun_pair/attempt/multi-step
        # dispatch as exact-latent ones. The reference re-dispatched a
        # pmap'd scan per sample() call (vmc_fluids/sampler.py:79-86).
        self._mcmc_fused = (not self.sampler.exact
                            and self.sampler.supports_fused)
        self._chain_fn = (self.sampler.make_chain_fn()
                          if self._mcmc_fused else None)

        # Matrix-free S-metric context of the latest rhs() call.
        self._sexp_ctx = None
        self._sexp_quad_jit = None

        # AOT-cached executables (warm_aot): tag -> compiled; when present
        # the stepper wrappers call them directly (no jit dispatch, and --
        # via utils/aot.py -- no per-process compile).
        self._aot = {}

        # Diagnostics of the latest call (tdvp.py attribute contract).
        self.ev = None
        self.snr = None
        self.solverResidual = None
        self.tdvp_error = None
        self.SExp = None
        self.ElocMean = None
        self.ElocVar = None

        self._fused = jax.jit(self._rhs_impl,
                              static_argnames=("n", "n_obs", "with_obs"))
        # Fused stepper stages (exact-latent path): a whole Heun pair /
        # adaptive attempt in ONE jit with dt as a traced scalar -- one
        # dispatch + one host sync per step/attempt instead of 2/5
        # (reference: stepper.py calls f per stage with host round-trips).
        self._fused_pair = jax.jit(self._heun_pair_impl,
                                   static_argnames=("n", "n_obs"))
        self._fused_attempt = jax.jit(self._heun_attempt_impl,
                                      static_argnames=("n", "n_obs"))
        self._fused_multi = jax.jit(self._heun_multi_impl,
                                    static_argnames=("n", "n_obs", "kind"))
        self._fused_rk3 = jax.jit(self._rk3_triple_impl,
                                  static_argnames=("n", "n_obs"))
        self._fused_rk23 = jax.jit(self._rk23_attempt_impl,
                                   static_argnames=("n", "n_obs"))
        self._fused_amulti = jax.jit(
            self._adaptive_multi_impl,
            static_argnames=("n", "n_obs", "kind", "exact"))

    # ------------------------------------------------------------------
    # Per-sample physics: logp, score, O-row, Hessian block, Eloc.
    # ------------------------------------------------------------------
    def _per_sample_batch(self, theta_c, x, t, local=False):
        """x: (n, d) -> (logp (n,), Eloc (n,), O (n, P)).

        ``local=True``: x is one device's shard inside the shard_map stats
        path -- use the per-device kernel and the per-device tile round."""
        ps = self._ps_local if local else self._ps_pallas
        rnd = self._ps_tile if local else self._ps_round
        if ps is not None and x.shape[0] % rnd == 0:
            # ragged batches (budgets not divisible by the kernel tile,
            # e.g. odd obs budgets or chunk tails) fall through to XLA
            logp, g, quad, O = ps(theta_c, x)
            hess = quad if self._hess_dirs is not None else None
            return logp, self.equation.eloc(x, g, hess, t), O
        f = self._log_prob_flat
        logp, g, O = jax.vmap(
            partial(score.value_score_and_param_grad, f), in_axes=(None, 0)
        )(theta_c, x)
        hess = None
        if self._hess_dirs is not None:
            dirs = jnp.asarray(self._hess_dirs, dtype=x.dtype)
            hess = jax.vmap(
                partial(score.quad_trace, f, dirs=dirs), in_axes=(None, 0)
            )(theta_c, x)
        elif self._hess_idx is not None:
            hess = jax.vmap(
                partial(score.hessian_block, f, idx=tuple(self._hess_idx)),
                in_axes=(None, 0),
            )(theta_c, x)
        eloc = self.equation.eloc(x, g, hess, t)
        return logp, eloc, O

    def _per_sample_batch_split(self, theta_c, x, t, shift):
        """Split-emitting kernel path: (logp (n,), Eloc (n,),
        (O_hi, O_lo), colsum (P,), omax (P,)) with the pair the bf16
        hi/lo split of (O - shift), colsum its in-kernel column sums,
        and omax the in-kernel column max |O - shift| (the int8 cross
        quantization scale bounds derive from it) -- see the _ps_split
        build in __init__."""
        logp, g, quad, pair, colsum, omax = self._ps_split(theta_c, x,
                                                           shift)
        hess = quad if self._hess_dirs is not None else None
        return (logp, self.equation.eloc(x, g, hess, t), pair, colsum,
                omax)

    # ------------------------------------------------------------------
    # Statistics assembly (tdvp.py:36-52 + SNR second moment).
    # ------------------------------------------------------------------
    def _maybe_clip_eloc(self, eloc):
        """Robust heavy-tail control (cfg.eloc_clip > 0): winsorize Eloc at
        eloc_clip robust standard deviations (1.4826 * MAD) around the
        median. The reference carries the same idea as commented-out code
        (tdvp.py:123, a hard +-100 gradient clip); the MAD form is
        scale-free. Heavy-tailed workloads (Student-t nu=2: Eloc variance
        infinite) otherwise pay an O(1/N)-decaying MC bias in the
        force/Gram (BENCHMARKS.md Student-t section). Off by default --
        clipping trades a small controlled bias for that variance."""
        c = self.cfg.eloc_clip
        if not c:
            return eloc
        med = jnp.median(eloc)
        scale = 1.4826 * jnp.median(jnp.abs(eloc - med))
        return med + jnp.clip(eloc - med, -c * scale, c * scale)

    def _direct_stats(self, theta_c, t, x, log_w=None, axis=None,
                      n_global=None):
        """Direct path: materialize O once, center, contract on the MXU.

        ``log_w``: optional per-sample log importance weights (x drawn from
        a proposal, cfg.is_gamma): every statistic becomes its self-
        normalized IS estimator -- weighted means/centering and a weighted
        Gram (the gram(w) machinery the SNR/SExp moments already use).

        ``axis``/``n_global``: shard_map mode -- x is one device's shard,
        means come from small psums, the Gram/force moments accumulate
        locally and cross the fabric in ONE final psum (the round-4
        mesh-parity path; log_w excluded by the eligibility gate)."""
        cfg = self.cfg
        local = axis is not None
        n = n_global if local else x.shape[0]
        logp, eloc, O = self._per_sample_batch(theta_c, x, t, local=local)
        eloc = self._maybe_clip_eloc(eloc)
        if not local:
            O = self.ctx.constrain(O, self.ctx.osample_spec)

        def gmean(a, axis_=0):
            if not local:
                return stats.mean(a, axis=axis_)
            return jax.lax.psum(jnp.sum(a, axis=axis_), axis) / n

        w = None
        if log_w is not None:
            w = jnp.exp(log_w - jnp.max(log_w))
            w = w / gmean(w)  # mean-normalized: /n estimators hold

        def wmean(a, axis_=0):
            if w is None:
                return gmean(a, axis_=axis_)
            ww = w if a.ndim == 1 else w[:, None]
            return gmean(ww * a, axis_=axis_)

        eloc_mean = wmean(eloc)
        eloc_abs_mean = wmean(jnp.abs(eloc))
        e_c = eloc - eloc_mean
        eloc_var = wmean(e_c**2)
        o_mean = wmean(O, axis_=0)
        O_c = O - o_mean

        cdt = self.precision.compute
        mp = stats.PRECISIONS[cfg.gram_precision]
        gdt = stats.GRAM_OPERAND_DTYPE.get(cfg.gram_precision)
        if gdt is not None:
            # f64-grade statistics on an f32 compute path (stats.PRECISIONS
            # "f64" docstring): contract the Gram/force in true float64
            O_c = O_c.astype(gdt)
            e_c = e_c.astype(gdt)
            logp = logp.astype(gdt)
            if w is not None:
                w = w.astype(gdt)
            cdt = gdt

        # IS mode: every second moment carries the weight factor
        def wtimes(a):
            return a if w is None else w * a

        F0 = jnp.matmul(wtimes(e_c), O_c, precision=mp) / n
        # every direct-path Gram weight is nonnegative (IS weights, e_c^2,
        # logp^2), so sym2's sqrt(w) folding applies throughout
        if self._use_tri2:
            bounds = (stats.tri2_bounds(self.n_params,
                                        cfg.tri2_target_block)
                      if cfg.tri2_target_block
                      else stats.tri2_bounds(self.n_params))
            gram = lambda gw=None: stats.tri2_gram_finalize(
                stats.tri2_gram_sum_raw(O_c, gw, bounds,
                                        cross_int8=self._cross_int8),
                bounds).astype(cdt) / n
        elif self._use_sym2:
            gram = lambda gw=None: stats.sym2_gram_sum(
                O_c, gw, cross_int8=self._cross_int8).astype(cdt) / n
        elif self._use_syrk:
            gram = lambda gw=None: _syrk(O_c, w=gw).astype(cdt) / n
        elif local:
            # explicit-/n form: the stats.*_matrix helpers normalize by
            # the LOCAL shape, which is wrong for a shard
            gram = lambda gw=None: jnp.matmul(
                O_c.T, O_c if gw is None else O_c * gw[:, None],
                preferred_element_type=cdt, precision=mp) / n
        else:
            gram = lambda gw=None: stats.weighted_second_moment_matrix(
                O_c, gw, cdt, precision=mp)
        if (w is None and not local
                and not (self._use_syrk or self._use_sym2
                         or self._use_tri2)):
            S0 = stats.second_moment_matrix(O_c, preferred_dtype=cdt,
                                            precision=mp)
        else:
            S0 = gram(w)
        if not local:
            S0 = self.ctx.constrain(S0, self.ctx.gram_spec)

        A = None
        if cfg.compute_snr or cfg.use_snr:
            A = gram(wtimes(e_c**2))
        SExp = None
        if cfg.compute_sexp:
            SExp = gram(wtimes(logp**2))

        if local:
            # ONE fused psum of every (P,)/(P, P)-scale moment: the whole
            # cross-device traffic of the statistics evaluation
            F0, S0, A, SExp = jax.lax.psum((F0, S0, A, SExp), axis)

        return dict(
            logp=logp,
            eloc=eloc,
            eloc_mean=eloc_mean,
            eloc_abs_mean=eloc_abs_mean,
            eloc_var=eloc_var,
            eloc_sq_mean=wmean(eloc**2),
            F0=F0,
            S0=S0,
            A=A,
            SExp=SExp,
        )

    def _chunked_stats(self, theta_c, t, x, axis=None, n_global=None):
        """Streaming path: lax.scan over sample chunks; O never materializes
        beyond one chunk. Accumulates pilot-shifted weighted second moments
        so f32 accumulation stays well conditioned.

        ``axis``/``n_global``: shard_map mode -- x is one device's shard,
        each device scans its LOCAL chunks (chunk_size / dp rows each,
        same per-device work as the single-device scan at the global
        chunk), the pilot shift is pmean'd so every device un-shifts
        identically, and the accumulated moments cross the fabric in ONE
        psum of the ASSEMBLED (P, P) matrices after the scan -- per RHS,
        not per chunk (the round-4 mesh-parity path)."""
        cfg = self.cfg
        local = axis is not None
        n_loc, d = x.shape
        n = n_global if local else n_loc
        # local mode: the shard_map path flattens the WHOLE mesh (dp and,
        # at tp > 1, tp too) into the sample axis, so each device scans
        # chunks of chunk_size / mesh.size rows
        c = cfg.chunk_size // self.ctx.mesh.size if local \
            else cfg.chunk_size
        if n_loc % c:
            raise ValueError(
                f"sample budget {n_loc} is not a multiple of chunk size "
                f"{c} (TDVP.__init__ rounds its own budgets; a hand-built "
                "call must do the same)"
            )
        n_chunks = n_loc // c
        P = self.n_params
        cdt = self.precision.compute
        mp = stats.PRECISIONS[cfg.gram_precision]
        gdt = stats.GRAM_OPERAND_DTYPE.get(cfg.gram_precision)
        if stats.GRAM_ACC_DTYPE.get(cfg.gram_precision) is not None:
            # f64 ACCUMULATORS. Under "f64" the chunk operands also cast
            # to f64 (gdt); under "f64acc" they stay f32 -- each chunk's
            # contraction is the ordinary f32/HIGH (or split-backend)
            # MXU program and only the carry addition promotes, so no
            # f64 matmul emulation is ever emitted (the d=32 toolchain
            # blocker documented at stats.PRECISIONS["f64"]).
            cdt = stats.GRAM_ACC_DTYPE[cfg.gram_precision]
        # dtype the per-chunk CONTRACTIONS produce (accumulation above
        # happens at cdt via the carry add's type promotion)
        con_dt = gdt if gdt is not None else self.precision.compute

        # Split-kernel fast path: the Pallas kernel emits the shifted bf16
        # hi/lo pair directly, so every chunk's Gram skips the f32 O read
        # + split write (see _ps_split). The f64-stats mode needs the f32
        # O (cast to f64), so it stays on the plain path. _ps_split is a
        # per-device program: usable single-device or per shard inside
        # the shard_map stats path (local chunks round to the bare tile).
        ps_round = self._ps_tile if local else self._ps_round
        use_pair = (self._ps_split is not None and gdt is None
                    and c % ps_round == 0
                    and (local or self.ctx.mesh.size == 1))
        # Fused quantize+force Pallas kernel (kernels/quant8.py): on the
        # int8 cross path each chunk otherwise makes three separate
        # near-HBM-peak XLA passes over the bf16 pair (quantize hi,
        # quantize lo, force pair_vecmat); the kernel folds the force
        # partials into the quantize pass so each operand is read once.
        # The c-guard mirrors _cross_sum's int32-accumulation fallback
        # (chunks longer than _INT8_CROSS_N_MAX contract >= 2^31 worth of
        # 127^2 products): there the int8 request silently degrades to
        # bf16, so the fused-quantize path must disengage the same way.
        use_q8 = (use_pair and self._cross_int8 and quant8.supported(P, c)
                  and c <= stats._INT8_CROSS_N_MAX)
        q8_interp = jax.default_backend() != "tpu"

        # Pilot estimates from the first chunk: shift constants only --
        # exactness does not depend on them. On the plain path the pilot
        # batch is reused as the first accumulated chunk below (no
        # recompute); the pair path pilots on a small slice instead (its
        # scan must run EVERY chunk through the shifted split kernel).
        c_pilot = min(c, 8 * ps_round) if use_pair else c
        logp0, eloc0, O0 = self._per_sample_batch(theta_c, x[:c_pilot], t,
                                                  local=local)
        c_O = jax.lax.stop_gradient(jnp.mean(O0, axis=0))
        c_E = jax.lax.stop_gradient(jnp.mean(eloc0))
        if local:
            # every device must shift by the SAME constants or the psummed
            # raw moments could not be un-shifted; one small (P,) pmean
            c_O = jax.lax.pmean(c_O, axis)
            c_E = jax.lax.pmean(c_E, axis)

        want_A = cfg.compute_snr or cfg.use_snr

        def _matmul_gram_sum(Os, w=None):
            return jnp.matmul(
                Os.T, Os if w is None else Os * w[:, None],
                preferred_element_type=con_dt, precision=mp)

        # tri2 accumulates RAW triangle parts {"t", "m2"} across chunks and
        # mirrors once after the scan (gram_fin); the other backends carry
        # the assembled (P, P) matrix and gram_fin is the identity.
        if self._use_tri2:
            bounds = (stats.tri2_bounds(P, cfg.tri2_target_block)
                      if cfg.tri2_target_block
                      else stats.tri2_bounds(P))
            gram_sum = lambda Os, w=None, signed=False: \
                stats.tri2_gram_sum_raw(Os, w, bounds,
                                        cross_int8=self._cross_int8)
            # unpadded strip pytree (stats._tri2_from_split): the scan
            # carry adds K small triangle blocks per chunk, not a padded
            # (P, P) matrix
            gram_zero = lambda: dict(
                t=tuple(jnp.zeros((bounds[i + 1] - bounds[i],
                                   bounds[i + 1]), cdt)
                        for i in range(len(bounds) - 1)),
                m2=jnp.zeros((P, P), cdt))
            gram_fin = partial(stats.tri2_gram_finalize, bounds=bounds)
        elif self._use_syrk:
            # triangle kernel: unnormalized chunk sums Os^T diag(w) Os
            gram_sum = lambda Os, w=None, signed=False: _syrk(
                Os, w=w).astype(cdt)
        elif self._use_sym2:
            # 2-pass split: weights (any sign) fold in as sqrt(|w|)*Os
            # with the sign applied to the hi-split (exact in bf16), so
            # even the signed sum_EOO moment rides the 2-pass form
            gram_sum = lambda Os, w=None, signed=False: \
                stats.sym2_gram_sum(
                    Os, w, cross_int8=self._cross_int8).astype(cdt)
        else:
            gram_sum = lambda Os, w=None, signed=False: _matmul_gram_sum(
                Os, w)
        if not self._use_tri2:
            gram_zero = lambda: jnp.zeros((P, P), cdt)
            gram_fin = lambda m: m
        gadd = partial(jax.tree.map, jnp.add)

        def chunk_fn(carry, xc, batch=None):
            logp, eloc, O = (batch if batch is not None
                             else self._per_sample_batch(theta_c, xc, t,
                                                         local=local))
            Os = O - c_O  # shifted
            es = eloc - c_E
            if gdt is not None:
                Os = Os.astype(gdt)
                es = es.astype(gdt)
                logp = logp.astype(gdt)
                eloc = eloc.astype(gdt)
            upd = dict(
                sum_O=carry["sum_O"] + jnp.sum(Os, axis=0),
                sum_E=carry["sum_E"] + jnp.sum(es),
                sum_absE=carry["sum_absE"] + jnp.sum(jnp.abs(eloc)),
                sum_E2=carry["sum_E2"] + jnp.sum(es**2),
                sum_rawE2=carry["sum_rawE2"] + jnp.sum(eloc**2),
                sum_EO=carry["sum_EO"]
                + jnp.matmul(es, Os, precision=mp),
                sum_OO=gadd(carry["sum_OO"], gram_sum(Os)),
                sum_logp=carry["sum_logp"] + jnp.sum(logp),
            )
            if want_A:
                w = es**2
                upd["sum_E2O"] = carry["sum_E2O"] + jnp.matmul(
                    w, Os, precision=mp)
                upd["sum_E2OO"] = gadd(carry["sum_E2OO"], gram_sum(Os, w))
                upd["sum_EOO"] = gadd(carry["sum_EOO"], gram_sum(
                    Os, es, signed=True))
            if cfg.compute_sexp:
                w = logp**2
                upd["sum_l2"] = carry["sum_l2"] + jnp.sum(w)
                upd["sum_l2O"] = carry["sum_l2O"] + jnp.matmul(
                    w, Os, precision=mp)
                upd["sum_l2OO"] = gadd(carry["sum_l2OO"], gram_sum(Os, w))
            return upd, (logp, eloc)

        def chunk_fn_pair(carry, xc):
            # Same moments as chunk_fn from the pre-split (hi, lo) pair:
            # unweighted Gram and all matvecs consume the pair directly
            # (stats.pair_vecmat reproduces the 3-pass HIGH matvec from
            # two DEFAULT passes); weighted Gram moments reconstruct the
            # f32 operand (their sqrt(w) scaling must precede the split;
            # XLA CSEs the reconstruction across the 2-3 uses).
            logp, eloc, pair, colsum, omax = self._per_sample_batch_split(
                theta_c, xc, t, c_O)
            es = eloc - c_E
            # int8 cross quantization scale bounds from the kernel's
            # column max |O - shift|: max|hi| <= omax (1 + 2^-8) (monotone
            # bf16 rounding), max|lo| <= omax 2^-8 (split residual is at
            # most half a bf16 ulp). Bounds only coarsen the quantization
            # by <= 2x on the lo side -- far inside the int8 error class.
            amax_hi = omax * np.float32(1.0 + 2.0**-8)
            amax_lo = omax * np.float32(2.0**-8)
            m2 = None
            sum_EO_part = None
            if use_q8:
                # fused quantize+force: one Pallas read per operand
                # produces the q8 cross operands AND pair_vecmat(es)'s
                # three HIGH-equivalent terms; .T below cancels the
                # kernel-output transpose (the pallas_call consumes the
                # physical (P, n) layout, no copy)
                inv_hi = jnp.where(amax_hi > 0, 127.0 / amax_hi, 0.0)
                inv_lo = jnp.where(amax_lo > 0, 127.0 / amax_lo, 0.0)
                es_hi, es_lo = stats._split_bf16(es.astype(jnp.float32))
                q8_hi, f_hi = quant8.quant_force(
                    pair[0].T, inv_hi, jnp.stack([es_hi, es_lo], axis=1),
                    interpret=q8_interp)
                q8_lo, f_lo = quant8.quant_force(
                    pair[1].T, inv_lo, es_hi[:, None], interpret=q8_interp)
                m2 = stats.cross_from_q8(
                    q8_hi, q8_lo,
                    jnp.where(amax_hi > 0, amax_hi / 127.0, 1.0),
                    jnp.where(amax_lo > 0, amax_lo / 127.0, 1.0))
                sum_EO_part = f_hi[:, 0] + f_hi[:, 1] + f_lo[:, 0]
            amax = (amax_hi, amax_lo) if self._cross_int8 else None
            if self._use_tri2:
                g0 = lambda: stats.tri2_gram_sum_raw_pair(
                    pair, bounds, cross_int8=self._cross_int8, amax=amax,
                    m2=m2)
            else:
                g0 = lambda: stats.sym2_gram_sum_pair(
                    pair, cross_int8=self._cross_int8, amax=amax, m2=m2)

            def g_w(w, signed=False):
                return gram_sum(stats.pair_to_f32(pair), w, signed)

            upd = dict(
                sum_O=carry["sum_O"] + colsum,
                sum_E=carry["sum_E"] + jnp.sum(es),
                sum_absE=carry["sum_absE"] + jnp.sum(jnp.abs(eloc)),
                sum_E2=carry["sum_E2"] + jnp.sum(es**2),
                sum_rawE2=carry["sum_rawE2"] + jnp.sum(eloc**2),
                sum_EO=carry["sum_EO"] + (
                    sum_EO_part if sum_EO_part is not None
                    else stats.pair_vecmat(es, pair)),
                sum_OO=gadd(carry["sum_OO"], g0()),
                sum_logp=carry["sum_logp"] + jnp.sum(logp),
            )
            if want_A:
                w = es**2
                upd["sum_E2O"] = (carry["sum_E2O"]
                                  + stats.pair_vecmat(w, pair))
                upd["sum_E2OO"] = gadd(carry["sum_E2OO"], g_w(w))
                upd["sum_EOO"] = gadd(carry["sum_EOO"],
                                      g_w(es, signed=True))
            if cfg.compute_sexp:
                w = logp**2
                upd["sum_l2"] = carry["sum_l2"] + jnp.sum(w)
                upd["sum_l2O"] = (carry["sum_l2O"]
                                  + stats.pair_vecmat(w, pair))
                upd["sum_l2OO"] = gadd(carry["sum_l2OO"], g_w(w))
            return upd, (logp, eloc)

        zero = dict(
            sum_O=jnp.zeros((P,), cdt),
            sum_E=jnp.zeros((), cdt),
            sum_absE=jnp.zeros((), cdt),
            sum_E2=jnp.zeros((), cdt),
            sum_rawE2=jnp.zeros((), cdt),
            sum_EO=jnp.zeros((P,), cdt),
            sum_OO=gram_zero(),
            sum_logp=jnp.zeros((), cdt),
        )
        if want_A:
            zero["sum_E2O"] = jnp.zeros((P,), cdt)
            zero["sum_E2OO"] = gram_zero()
            zero["sum_EOO"] = gram_zero()
        if cfg.compute_sexp:
            zero["sum_l2"] = jnp.zeros((), cdt)
            zero["sum_l2O"] = jnp.zeros((P,), cdt)
            zero["sum_l2OO"] = gram_zero()

        if use_pair:
            # every chunk (incl. chunk 0) through the shifted split kernel
            acc, (logp_s, eloc_s) = jax.lax.scan(
                chunk_fn_pair, zero, x.reshape(n_chunks, c, d))
            logp = logp_s.reshape(n_loc)
            eloc = eloc_s.reshape(n_loc)
        else:
            # chunk 0 reuses the pilot batch; the scan handles the rest
            acc0, (logp_first, eloc_first) = chunk_fn(
                zero, None, batch=(logp0, eloc0, O0))
            acc, (logp_rest, eloc_rest) = jax.lax.scan(
                chunk_fn, acc0, x[c:].reshape(n_chunks - 1, c, d)
            )
            logp = jnp.concatenate(
                [logp_first[None], logp_rest]).reshape(n_loc)
            eloc = jnp.concatenate(
                [eloc_first[None], eloc_rest]).reshape(n_loc)

        if local:
            # Assemble the triangle strips into full (P, P) matrices PER
            # DEVICE (gram_fin commutes with summation), then ONE fused
            # psum of every accumulated moment -- the statistics
            # evaluation's entire cross-device traffic, independent of the
            # chunk count. (GSPMD would have emitted one all-reduce per
            # sample-contracting dot_general per chunk.)
            acc = dict(acc)
            for k in ("sum_OO", "sum_E2OO", "sum_EOO", "sum_l2OO"):
                if k in acc:
                    acc[k] = gram_fin(acc[k])
            acc = jax.lax.psum(acc, axis)
            gram_fin = lambda m: m

        # Un-shift. With y = O - c_O, f = E - c_E:
        #   m_y = E[y],  S0 = E[y^T y] - m_y^T m_y  (shift cancels exactly)
        #   F0 = E[(f - m_f)(y - m_y)] = E[f y] - m_f m_y
        m_y = acc["sum_O"] / n
        m_f = acc["sum_E"] / n
        sum_OO = gram_fin(acc["sum_OO"])
        S0 = sum_OO / n - jnp.outer(m_y, m_y)
        F0 = acc["sum_EO"] / n - m_f * m_y
        eloc_mean = m_f + c_E
        eloc_var = acc["sum_E2"] / n - m_f**2

        A = None
        if want_A:
            # A = E[fbar^2 ybar^T ybar], fbar = f - m_f, ybar = y - m_y.
            # Exact expansion of the weight fbar^2 = f^2 - 2 m_f f + m_f^2
            # against the accumulated raw moments (all pilot-shifted, so the
            # f32 sums stay well conditioned):
            Efyy = gram_fin(acc["sum_EOO"]) / n
            Ef2yy = gram_fin(acc["sum_E2OO"]) / n
            Efy = acc["sum_EO"] / n
            Ef2y = acc["sum_E2O"] / n
            Eyy = sum_OO / n
            M2 = Ef2yy - 2.0 * m_f * Efyy + m_f**2 * Eyy
            v2 = Ef2y - 2.0 * m_f * Efy + m_f**2 * m_y
            s2 = acc["sum_E2"] / n - m_f**2
            A = (
                M2
                - jnp.outer(v2, m_y)
                - jnp.outer(m_y, v2)
                + s2 * jnp.outer(m_y, m_y)
            )
        SExp = None
        if cfg.compute_sexp:
            El2yy = gram_fin(acc["sum_l2OO"]) / n
            El2y = acc["sum_l2O"] / n
            El2 = acc["sum_l2"] / n
            SExp = (
                El2yy
                - jnp.outer(El2y, m_y)
                - jnp.outer(m_y, El2y)
                + El2 * jnp.outer(m_y, m_y)
            )

        return dict(
            logp=logp,
            eloc=eloc,
            eloc_mean=eloc_mean,
            eloc_abs_mean=acc["sum_absE"] / n,
            eloc_var=eloc_var,
            eloc_sq_mean=acc["sum_rawE2"] / n,
            F0=F0,
            S0=S0,
            A=A,
            SExp=SExp,
        )

    def _stats_sharded(self, theta_c, t, x, n):
        """shard_map wrapper around the stats block (the round-4
        mesh-parity path, TDVPConfig.stats_partitioning): each device runs
        the per-device program (_direct_stats / _chunked_stats in local
        mode -- per-sample Pallas kernels, tri2 triangle strips, int8
        cross quantization with per-shard scales, chunked scan) on its
        own sample shard, and the finished moments cross the fabric in
        ONE psum (plus two small mean/pilot psums). This is what lets the
        single-device fast Gram stack (tri2 + int8 + split kernel) run
        unchanged per shard on a dp mesh -- the TPU-native analogue of
        mpi_wrapper.global_covariance's reduce-locally-then-Allreduce
        (vmc_fluids/mpi_wrapper.py:248-274), minus the host staging.

        dp x tp meshes (round-5 tp parity): the samples shard over BOTH
        axes -- the mesh is flattened into one sample axis of dp * tp
        devices and the psum reduces over both. Compared to the GSPMD
        reduce-scatter-into-tp-rows layout this removes the tp-fold
        replication of the per-sample gradient stage (GSPMD shards only
        the Gram dot_general's output rows over tp), keeps per-device
        Gram MACs identical, and fuses ALL Gram-scale moments (S0 and,
        with SNR on, the two A moments) into the same single collective.
        The solve then runs replicated from the psummed (P, P) -- at
        P ~ 1e4 it is < 2% of the RHS, so the tp-sharded solve input
        layout the reduce-scatter variant would preserve buys nothing."""
        from ..parallel.mesh import PARAM_AXIS, SAMPLE_AXIS

        cfg = self.cfg
        chunked = bool(cfg.chunk_size and cfg.chunk_size < n)
        # both names always exist on the mesh (tp=1 axes psum trivially),
        # so one spec serves every mesh shape
        axes = (SAMPLE_AXIS, PARAM_AXIS)

        def inner(th, t_, x_loc):
            if chunked:
                return self._chunked_stats(th, t_, x_loc,
                                           axis=axes, n_global=n)
            return self._direct_stats(th, t_, x_loc,
                                      axis=axes, n_global=n)

        from jax.sharding import PartitionSpec as PS

        dp, rep = PS(axes), PS()
        want_A = cfg.compute_snr or cfg.use_snr
        out_specs = dict(
            logp=dp, eloc=dp,
            eloc_mean=rep, eloc_abs_mean=rep, eloc_var=rep,
            eloc_sq_mean=rep, F0=rep, S0=rep,
            A=rep if want_A else None,
            SExp=rep if cfg.compute_sexp else None,
        )
        return jax.shard_map(
            inner, mesh=self.ctx.mesh, in_specs=(rep, rep, dp),
            out_specs=out_specs, check_vma=False,
        )(theta_c, jnp.asarray(t), x)

    # ------------------------------------------------------------------
    # Observables (tdvp.py:143-162).
    # ------------------------------------------------------------------
    def _observables(self, x, logp, key, aux):
        d = x.shape[-1]
        mean = jnp.mean(x, axis=0)
        xc = x - mean
        aux["x1"] = mean
        # covar is the primary quantity validated against the SDE oracle;
        # carry explicit precision per the project matmul invariant.
        aux["covar"] = jnp.matmul(
            xc.T, xc, precision=stats.PRECISIONS[self.cfg.gram_precision]
        ) / x.shape[0]
        aux["entropy"] = -jnp.mean(logp)
        for m in (3, 4, 5, 6):
            aux[f"x{m}"] = jnp.mean(xc**m, axis=0)

        if self.cfg.integrals:
            # Uniform-in-ball MC integral of p over spheres of radius
            # {1, 0.5, 0.1} * sqrt(T) (tdvp.py:153-162), with fresh keys
            # (fixes quirk Q6: the reference reused psi.sampler.key).
            n_int = self.n_samples_obs
            k_dir, k_r = jax.random.split(key)
            dirs = jax.random.normal(k_dir, (n_int, d), dtype=x.dtype)
            dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
            radii = (
                jax.random.uniform(k_r, (n_int,), dtype=x.dtype) ** (1.0 / d)
            )
            unit_ball = dirs * radii[:, None]
            for label, lim in (("1", 1.0), ("0.5", 0.5), ("0.1", 0.1)):
                r = lim * math.sqrt(self.cfg.integral_T)
                vol = _ball_volume(d, r)
                pts = r * unit_ball
                logp_pts = jax.vmap(self.flow.log_prob, in_axes=(None, 0))(
                    aux["_params"], pts
                )
                # key matches the reference infos schema (tdvp.py:162)
                aux[f"integral_{label}sigma"] = (
                    jnp.mean(jnp.exp(logp_pts)) * vol
                )
        return aux

    # ------------------------------------------------------------------
    # Fused right-hand side.
    # ------------------------------------------------------------------
    def _rhs_impl(self, theta_c, t, key, z_ext, z_obs_ext, chain_state,
                  rw_scale, n: int, n_obs: int, with_obs: bool = True):
        """``with_obs=False`` skips the observables block: only the FIRST
        integrator stage's observables are ever recorded (Q10 pairing), so
        predictor/half-step stages skip the n_obs-sample entropy/moment
        pass entirely -- one wasted obs pass per fixed-Heun step and four
        per adaptive attempt otherwise.

        ``chain_state`` (fused-MCMC mode): (n_chains, dim) Metropolis chain
        ensemble carried across dispatches; the in-jit chain draw replaces
        the latent_sample. The advanced state comes back in
        aux["_chain_state"] with acceptance counts in aux["mcmc_*"].
        ``rw_scale``: traced random-walk proposal scale (None =
        independence proposals)."""
        cfg = self.cfg
        params = self._unravel(theta_c)
        k_sample, k_obs, k_int, k_spec = jax.random.split(key, 4)

        # SAMPLE: latent draw + inverse-flow push-forward (in-jit for exact
        # latents and fused-MCMC chains; externally-supplied otherwise).
        mcmc = None
        log_w = None
        if z_ext is None:
            if chain_state is not None:
                sweeps = n // self.sampler.n_chains
                z, new_state, acc = self._chain_fn(
                    k_sample, chain_state, rw_scale, sweeps)
                mcmc = dict(state=new_state, rw=rw_scale, acc=acc,
                            prop=sweeps * self.sampler.n_chains)
            elif cfg.is_gamma != 1.0:
                # tail-tempered importance proposal (cfg.is_gamma comment)
                z, log_w = self.flow.latent_sample_tempered(
                    k_sample, params, n, cfg.is_gamma, dtype=theta_c.dtype)
            else:
                z = self.flow.latent_sample(k_sample, params, n,
                                            dtype=theta_c.dtype)
        else:
            z = z_ext
        z = self.ctx.constrain(z, self.ctx.samples_spec)
        x, _ = jax.vmap(self.flow.push, in_axes=(None, 0))(params, z)
        x = jax.lax.stop_gradient(x)
        x = self.ctx.constrain(x, self.ctx.samples_spec)

        # Gram-free paths: the (P, P) matrix never materializes.
        if self.solver_method == "cg":
            return self._rhs_cg(theta_c, t, x, params, k_obs, k_int,
                                z_obs_ext, n, n_obs, with_obs, mcmc=mcmc)
        if self.solver_method == "minsr":
            return self._rhs_minsr(theta_c, t, x, params, k_obs, k_int,
                                   z_obs_ext, n, n_obs, with_obs, mcmc=mcmc)

        # STATS: Eloc, force, Gram (+SNR/SExp second moments).
        if self._stats_shardmap:
            st = self._stats_sharded(theta_c, t, x, n)
        elif cfg.chunk_size and cfg.chunk_size < n:
            st = self._chunked_stats(theta_c, t, x)
        else:
            st = self._direct_stats(theta_c, t, x, log_w=log_w)

        S0, F0 = st["S0"], st["F0"]
        S = S0
        if cfg.diagonal_shift > 1e-10:
            S = S + jnp.diag(cfg.diagonal_shift * jnp.diag(S))

        sdt = self.precision.solve
        aux = {}
        if cfg.solve_on_device:
            if self.solver_method == "eigh":
                update, ev, snr, _ = _solve_regularized(
                    S.astype(sdt), F0.astype(sdt), cfg, n,
                    A=None if st["A"] is None else st["A"].astype(sdt),
                )
                aux["ev"] = ev
                aux["snr"] = snr if snr is not None else jnp.zeros_like(ev)
            else:
                lam_max = None
                if cfg.spectrum_topk > 0:
                    # Approximate spectral observability (reference records
                    # the full ev/snr per step, tdvp.py:57-71): top-k
                    # eigenpairs + trace-based bulk summary + Ritz-projected
                    # per-mode SNR.
                    k = min(cfg.spectrum_topk, S.shape[0])
                    ev_k, V_k = _randomized_topk_eigh(
                        S.astype(sdt), k, k_spec
                    )
                    lam_max = ev_k[-1]
                    tr = jnp.trace(S.astype(sdt))
                    aux["ev_topk"] = ev_k
                    aux["spectrum_trace"] = tr
                    aux["spectrum_tail_mass"] = tr - jnp.sum(ev_k)
                    if st["A"] is not None:
                        VtF = jnp.matmul(
                            V_k.T, F0.astype(sdt),
                            precision=jax.lax.Precision.HIGHEST,
                        )
                        AV = jnp.matmul(
                            st["A"].astype(sdt), V_k,
                            precision=jax.lax.Precision.HIGHEST,
                        )
                        rho_var = jnp.maximum(
                            jnp.abs(jnp.sum(V_k * AV, axis=0) - VtF**2),
                            jnp.finfo(VtF.dtype).tiny,
                        )
                        aux["snr_topk"] = jnp.sqrt(
                            jnp.abs(n * VtF**2 / rho_var)
                        )
                update, lam_max = _solve_cholesky(
                    S.astype(sdt), F0.astype(sdt), cfg, lam_max=lam_max
                )
                aux["lambda_max"] = lam_max
                if cfg.use_snr and "snr_topk" in aux:
                    # Ritz-projected SNR gating (round-4 item 8): apply
                    # the reference's per-mode soft-cutoff within the
                    # top-k subspace, pass-through on the complement:
                    # u <- u + V_k diag(g - 1) V_k^T u.
                    _HI = jax.lax.Precision.HIGHEST
                    g = _soft_cutoff(aux["snr_topk"], cfg.snr_tol)
                    Vtu = jnp.matmul(V_k.T, update, precision=_HI)
                    update = update + jnp.matmul(
                        V_k, (g - 1.0) * Vtu, precision=_HI)
            residual = jnp.linalg.norm(
                S.astype(sdt) @ update - F0.astype(sdt)
            ) / jnp.linalg.norm(F0.astype(sdt))
            tdvp_error = 1.0 + (
                update @ S0.astype(sdt) @ update
                - 2.0 * F0.astype(sdt) @ update
            ) / st["eloc_sq_mean"].astype(sdt)
            aux.update(update=update, solver_res=residual,
                       tdvp_error=tdvp_error)
        else:
            aux.update(S=S, S0=S0, F0=F0, A=st["A"],
                       eloc_sq_mean=st["eloc_sq_mean"])

        aux["eloc_mean"] = st["eloc_mean"]
        aux["eloc_abs_mean"] = st["eloc_abs_mean"]
        aux["eloc_var"] = st["eloc_var"]
        aux["max_grad"] = jnp.max(st["eloc"])
        if st["SExp"] is not None:
            aux["SExp"] = st["SExp"]
        if self._sexp_matfree:
            aux["_x"], aux["_logp"] = x, st["logp"]
            # IS tempering: sexp_norm must see the same self-normalized
            # weights the dense SExp carries (gram(w * logp^2)); zeros
            # reduce to the unweighted estimator exactly (w = exp(0) = 1)
            aux["_logw"] = (log_w if log_w is not None
                            else jnp.zeros_like(st["logp"]))

        # OBSERVABLES on the (possibly larger) observable budget
        # (tdvp.py:130-134: resample only when n_obs > n). IS mode always
        # resamples: the TDVP batch is proposal-distributed.
        aux = self._obs_tail(aux, x, st["logp"], params, k_obs, k_int,
                             z_obs_ext, n, n_obs, with_obs, mcmc=mcmc,
                             force_resample=log_w is not None)
        self._mcmc_finish(aux, mcmc)
        aux["nan"] = jnp.any(
            jnp.isnan(aux["update"] if "update" in aux else F0)
        )
        return aux

    @staticmethod
    def _mcmc_finish(aux, mcmc):
        """Attach the advanced chain state + acceptance counts to aux
        (popped host-side by the dispatch wrappers; counts are recorded)."""
        if mcmc is not None:
            aux["_chain_state"] = mcmc["state"]
            aux["mcmc_accepted"] = jnp.asarray(mcmc["acc"], jnp.int32)
            aux["mcmc_proposed"] = jnp.asarray(mcmc["prop"], jnp.int32)

    def _rhs_cg(self, theta_c, t, x, params, k_obs, k_int, z_obs_ext,
                n, n_obs, with_obs: bool = True, mcmc=None):
        """Matrix-free RHS: per-sample batch -> Jacobi-preconditioned CG on
        the Tikhonov normal equations, never forming S. O(N P) memory and
        O(iters * N P) flops instead of O(N P^2) -- the scaling path for
        very large parameter counts."""
        cfg = self.cfg
        logp, eloc, O = self._per_sample_batch(theta_c, x, t)
        eloc = self._maybe_clip_eloc(eloc)
        O = self.ctx.constrain(O, self.ctx.osample_spec)
        eloc_mean = stats.mean(eloc)
        e_c = eloc - eloc_mean
        O_c = O - stats.mean(O, axis=0)

        mp = stats.PRECISIONS[cfg.gram_precision]
        gdt = stats.GRAM_OPERAND_DTYPE.get(cfg.gram_precision)
        if gdt is not None:
            O_c = O_c.astype(gdt)
            e_c = e_c.astype(gdt)
        update, F0, lam_max, sv = _solve_cg(O_c, e_c, cfg, mp)

        # residual and TDVP error via matvecs (S0 u = sv(u)). The residual
        # is measured against the UNREGULARIZED S, matching the eigh and
        # Cholesky paths (and the reference, tdvp.py:94) -- including the
        # Tikhonov term would make solver_res ~cg_tol by construction and
        # incomparable across solver_method values.
        s_u = sv(update)
        residual = jnp.linalg.norm(s_u - F0) / jnp.linalg.norm(F0)
        eloc_sq_mean = stats.mean(eloc**2)
        tdvp_error = 1.0 + (update @ s_u - 2.0 * F0 @ update) / eloc_sq_mean

        aux = dict(
            update=update, solver_res=residual, tdvp_error=tdvp_error,
            lambda_max=lam_max, eloc_mean=eloc_mean,
            eloc_abs_mean=stats.mean(jnp.abs(eloc)),
            eloc_var=stats.variance(eloc), max_grad=jnp.max(eloc),
        )
        if self._sexp_matfree:
            aux["_x"], aux["_logp"] = x, logp
            # cg/minsr reject is_gamma (validation above): unweighted
            aux["_logw"] = jnp.zeros_like(logp)

        aux = self._obs_tail(aux, x, logp, params, k_obs, k_int,
                             z_obs_ext, n, n_obs, with_obs, mcmc=mcmc)
        self._mcmc_finish(aux, mcmc)
        aux["nan"] = jnp.any(jnp.isnan(update))
        return aux

    def _obs_tail(self, aux, x, logp, params, k_obs, k_int, z_obs_ext,
                  n, n_obs, with_obs: bool = True, mcmc=None,
                  force_resample: bool = False):
        """Shared observables block (tdvp.py:130-134: resample only when
        n_obs > n, or always under IS tempering). In fused-MCMC mode the
        extra observable budget CONTINUES the Metropolis chain (the
        reference draws a fresh sample() call, tdvp.py:130-134 -- also a
        chain continuation, since its sampler carries chain state across
        calls)."""
        cfg = self.cfg
        if cfg.observables and with_obs:
            if n_obs > n or force_resample:
                if z_obs_ext is None:
                    if mcmc is not None:
                        sweeps = n_obs // self.sampler.n_chains
                        z_o, new_state, acc = self._chain_fn(
                            k_obs, mcmc["state"], mcmc["rw"], sweeps)
                        mcmc["state"] = new_state
                        mcmc["acc"] = mcmc["acc"] + acc
                        mcmc["prop"] += sweeps * self.sampler.n_chains
                    else:
                        z_o = self.flow.latent_sample(
                            k_obs, params, n_obs, dtype=x.dtype)
                else:
                    z_o = z_obs_ext
                z_o = self.ctx.constrain(z_o, self.ctx.samples_spec)
                x_o, logp_o = jax.vmap(self.flow.push, in_axes=(None, 0))(
                    params, z_o)
            else:
                x_o, logp_o = x, logp
            aux["_params"] = params
            aux = self._observables(x_o, logp_o, k_int, aux)
            del aux["_params"]
        return aux

    def _rhs_minsr(self, theta_c, t, x, params, k_obs, k_int, z_obs_ext,
                   n, n_obs, with_obs: bool = True, mcmc=None):
        """Kernel-space RHS (solver_method='minsr'): per-sample batch ->
        N x N kernel eigensolve -> minimum-norm update. The (P, P) Gram
        never materializes -- the scaling path for P >> N with FULL
        spectral observability (see _solve_minsr)."""
        cfg = self.cfg
        mp = stats.PRECISIONS[cfg.gram_precision]
        sdt = self.precision.solve

        if cfg.chunk_size and cfg.chunk_size < n:
            logp, eloc, update, ev, snr, residual, tdvp_quad = \
                self._minsr_chunked(theta_c, t, x)
            eloc_mean = stats.mean(eloc)
        else:
            logp, eloc, O = self._per_sample_batch(theta_c, x, t)
            eloc = self._maybe_clip_eloc(eloc)
            O = self.ctx.constrain(O, self.ctx.osample_spec)
            eloc_mean = stats.mean(eloc)
            e_c = eloc - eloc_mean
            O_c = O - stats.mean(O, axis=0)
            gdt = stats.GRAM_OPERAND_DTYPE.get(cfg.gram_precision)
            if gdt is not None:
                O_c = O_c.astype(gdt)
                e_c = e_c.astype(gdt)
            update, ev, snr, residual, tdvp_quad = _solve_minsr(
                O_c, e_c, cfg, mp, sdt,
                use_sym2=self._use_sym2 or self._use_tri2)

        # residual and TDVP error come from the kernel-space identities
        # (see _minsr_kernel_solve docstring), equivalent to the other
        # paths' forms against the unregularized S (tdvp.py:93-94)
        eloc_sq_mean = stats.mean(eloc**2).astype(sdt)
        tdvp_error = 1.0 + tdvp_quad / eloc_sq_mean

        aux = dict(
            update=update, solver_res=residual, tdvp_error=tdvp_error,
            ev=ev, snr=snr if snr is not None else jnp.zeros_like(ev),
            eloc_mean=eloc_mean,
            eloc_abs_mean=stats.mean(jnp.abs(eloc)),
            eloc_var=stats.variance(eloc), max_grad=jnp.max(eloc),
        )
        if self._sexp_matfree:
            aux["_x"], aux["_logp"] = x, logp
            # cg/minsr reject is_gamma (validation above): unweighted
            aux["_logw"] = jnp.zeros_like(logp)
        aux = self._obs_tail(aux, x, logp, params, k_obs, k_int,
                             z_obs_ext, n, n_obs, with_obs, mcmc=mcmc)
        self._mcmc_finish(aux, mcmc)
        aux["nan"] = jnp.any(jnp.isnan(update))
        return aux

    def _minsr_chunked(self, theta_c, t, x):
        """Streaming minSR: the (N, P) O matrix never materializes beyond
        two (chunk, P) blocks -- the beyond-HBM path for huge parameter
        counts (N x P at N=16k, P=272k is 17 GB in f32; two 4k chunks are
        4.5 GB). Three passes over sample chunks:

          1. means: accumulate the parameter-gradient mean (one P-vector)
             plus the per-sample (logp, Eloc) scalars;
          2. kernel assembly: T[i, j] = G_i G_j^T for chunk pairs j <= i
             with G_k = O_k - mean(O) recomputed per pair. The price of
             never storing O is ~(n_chunks + 1)/2 x the gradient work
             (n_chunks (n_chunks + 3) / 2 + n_chunks chunk-gradient
             evaluations incl. passes 1+3, vs n_chunks materialized) --
             pick the LARGEST chunk that fits so the factor stays ~2;
          3. update: u = Obar^T alpha accumulated as sum_i G_i^T alpha_i.

        All solver diagnostics are kernel-space (_minsr_kernel_solve), so
        no P-sized array other than mean(O) and the final update exists.
        Returns (logp, eloc, update, ev, snr, residual, tdvp_quad)."""
        cfg = self.cfg
        n, d = x.shape
        c = cfg.chunk_size
        if n % c:
            raise ValueError(
                f"sample budget {n} is not a multiple of chunk_size {c}"
            )
        n_chunks = n // c
        P = self.n_params
        cdt = self.precision.compute
        mp = stats.PRECISIONS[cfg.gram_precision]
        gdt = stats.GRAM_OPERAND_DTYPE.get(cfg.gram_precision)
        if gdt is not None:
            cdt = gdt  # f64 accumulators; chunk operands promote via o_mean
        sdt = self.precision.solve
        xs = x.reshape(n_chunks, c, d)

        # pass 1: gradient mean + per-sample scalars
        def mean_chunk(carry, xc):
            logp, eloc, O = self._per_sample_batch(theta_c, xc, t)
            return carry + jnp.sum(O, axis=0).astype(cdt), (logp, eloc)

        sum_O, (logps, elocs) = jax.lax.scan(
            mean_chunk, jnp.zeros((P,), cdt), xs)
        o_mean = sum_O / n
        logp = logps.reshape(n)
        eloc = elocs.reshape(n)
        e_c = eloc - stats.mean(eloc)

        def centered_grads(xc):
            _, _, O = self._per_sample_batch(theta_c, xc, t)
            return O - o_mean

        def chunk_at(i):
            return jax.lax.dynamic_index_in_dim(xs, i, 0, keepdims=False)

        # pass 2: pairwise kernel blocks (G_i pinned across the inner loop).
        # Diagonal blocks are symmetric -> 2-pass split at the f32/'high'
        # operating point; off-diagonal blocks have no symmetry to exploit
        # (all three hi/lo cross terms differ), so they stay 3-pass HIGH.
        use_s2 = self._use_sym2 or self._use_tri2

        def outer(i, T):
            G_i = centered_grads(chunk_at(i))
            blk = (stats.sym2_outer_sum(G_i) if use_s2
                   else jnp.matmul(G_i, G_i.T, precision=mp)).astype(cdt)
            T = jax.lax.dynamic_update_slice(T, blk, (i * c, i * c))

            def inner(j, T):
                G_j = centered_grads(chunk_at(j))
                blk = jnp.matmul(G_i, G_j.T, precision=mp).astype(cdt)
                T = jax.lax.dynamic_update_slice(T, blk, (i * c, j * c))
                T = jax.lax.dynamic_update_slice(T, blk.T, (j * c, i * c))
                return T

            return jax.lax.fori_loop(0, i, inner, T)

        T = jax.lax.fori_loop(0, n_chunks, outer, jnp.zeros((n, n), cdt))

        alpha, ev, snr, residual, tdvp_quad = _minsr_kernel_solve(
            T, e_c, cfg, sdt)

        # pass 3: u = sum_i G_i^T alpha_i
        a_cs = alpha.astype(cdt).reshape(n_chunks, c)

        def upd_chunk(carry, inp):
            xc, ac = inp
            G = centered_grads(xc)
            return carry + jnp.matmul(ac, G, precision=mp).astype(cdt), None

        u, _ = jax.lax.scan(upd_chunk, jnp.zeros((P,), cdt), (xs, a_cs))
        return logp, eloc, u.astype(sdt), ev, snr, residual, tdvp_quad

    # ------------------------------------------------------------------
    def rhs(self, theta, t, key, intStep: int = 0):
        """Host-facing RHS: theta in master dtype -> (dtheta master, aux).
        ``intStep`` decorrelates RNG across the integrator's internal stages
        (stepper.py's f(..., intStep=k) contract)."""
        key = jax.random.fold_in(key, intStep)
        theta_c = jnp.asarray(theta, dtype=self.precision.compute)

        # Only the FIRST stage of each integrator step records observables
        # (Q10 pairing): fixed steppers call with intStep 0/1, the adaptive
        # one with 5 * attempt + stage -- stage 0 <=> intStep % 5 == 0.
        with_obs = intStep % 5 == 0

        z_ext = z_obs_ext = cs = rw = None
        if not self.sampler.exact:
            if self._mcmc_fused:
                cs, rw = self._fused_mcmc_inputs(key)
            else:
                params = self._unravel(theta_c)
                k_s, k_o, key = jax.random.split(key, 3)
                z_ext, _ = self.sampler.sample(
                    k_s, self.flow, params, self.n_samples
                )
                if with_obs and self.n_samples_obs > self.n_samples:
                    z_obs_ext, _ = self.sampler.sample(
                        k_o, self.flow, params, self.n_samples_obs
                    )

        aux = self._fused(
            theta_c, t, key, z_ext, z_obs_ext, cs, rw,
            n=self.n_samples, n_obs=self.n_samples_obs, with_obs=with_obs,
        )
        aux = self._absorb_mcmc(aux)
        if self._sexp_matfree:
            # keep this stage's (theta, samples) for sexp_norm: after the
            # integrator's final stage call this IS the last stage, matching
            # the dense path's f.SExp semantics (stepper.py:71)
            aux = dict(aux)
            self._sexp_ctx = (theta_c, aux.pop("_x"), aux.pop("_logp"),
                              aux.pop("_logw"))

        if not self.cfg.solve_on_device:
            aux = dict(aux)
            aux.update(self._host_solve(aux))
            aux["nan"] = bool(np.any(np.isnan(np.asarray(aux["update"]))))

        # Reference diagnostic attribute contract (tdvp.py:127, main.py:186-189).
        # On the large-P path the (approximate) top-k spectrum stands in.
        self.ev = aux.get("ev", aux.get("ev_topk"))
        self.snr = aux.get("snr", aux.get("snr_topk"))
        self.solverResidual = aux["solver_res"]
        self.tdvp_error = aux["tdvp_error"]
        self.ElocMean = aux["eloc_mean"]
        self.ElocVar = aux["eloc_var"]
        if "SExp" in aux:
            self.SExp = aux["SExp"]

        update = jnp.asarray(aux["update"], dtype=self.precision.master)
        return update, aux

    # ------------------------------------------------------------------
    # Fused integrator stages (exact-latent sampling only): the stage
    # arithmetic runs in compute dtype, matching the per-call path where
    # master-f64 stage vectors are cast to compute before evaluation; the
    # returned INCREMENT dy is added to the master-f64 parameters on host,
    # so integration accuracy is unchanged (steppers.py contract).
    # ------------------------------------------------------------------
    def _stage(self, th, t, key, i, n, n_obs, with_obs=True,
               chain_state=None, rw_scale=None):
        # fold_in(key, intStep) matches rhs()'s per-call key derivation
        # exactly, so fused and per-call integration are RNG-identical
        aux = self._rhs_impl(th, t, jax.random.fold_in(key, i),
                             None, None, chain_state, rw_scale,
                             n, n_obs, with_obs)
        return aux["update"].astype(th.dtype), aux

    @staticmethod
    def _chain_handoff(aux, into=None):
        """Pop a stage's chain state/counts; fold counts into ``into``."""
        cs = aux.pop("_chain_state", None)
        if cs is not None and into is not None:
            into["mcmc_accepted"] = (into["mcmc_accepted"]
                                     + aux["mcmc_accepted"])
            into["mcmc_proposed"] = (into["mcmc_proposed"]
                                     + aux["mcmc_proposed"])
        return cs

    def _heun_pair_impl(self, theta_c, t, dt, key, chain_state, rw_scale,
                        n: int, n_obs: int):
        """Fixed-Heun pair: dy = dt/2 (k0 + k1) (stepper.py:133-139).

        The returned aux is the FIRST stage's -- observables at the state at
        time t, matching the driver's time pairing and the adaptive path's
        convention (fixed quirk Q10; see FixedStepper.step).  The NaN flag is
        OR-ed across both stages. In fused-MCMC mode the chain state threads
        stage 0 -> stage 1 and the final state/summed counts ride aux."""
        k0, aux = self._stage(theta_c, t, key, 0, n, n_obs,
                              chain_state=chain_state, rw_scale=rw_scale)
        aux = dict(aux)
        # the matfree S-metric stash is an adaptive-path concern; don't
        # return (or scan-stack) the (N, d) sample arrays from fixed steps
        aux.pop("_x", None)
        aux.pop("_logp", None)
        aux.pop("_logw", None)
        cs = self._chain_handoff(aux)
        # the predictor stage's observables are never recorded (Q10):
        # skip its n_obs entropy/moment pass entirely
        k1, aux1 = self._stage(theta_c + dt * k0, t + dt, key, 1, n, n_obs,
                               with_obs=False, chain_state=cs,
                               rw_scale=rw_scale)
        aux["nan"] = aux["nan"] | aux1["nan"]
        cs = self._chain_handoff(aux1, into=aux)
        if cs is not None:
            aux["_chain_state"] = cs
        return 0.5 * dt * (k0 + k1), aux

    def _rk3_triple_impl(self, theta_c, t, dt, key, chain_state, rw_scale,
                         n: int, n_obs: int):
        """Fixed SSPRK3 (Shu-Osher) triple: three stages, one dispatch.

        y1 = y + dt k0;  y2 = y + dt/4 (k0 + k1);  dy = dt/6 (k0 + k1 + 4 k2)
        with k1 = f(y1, t + dt), k2 = f(y2, t + dt/2). Third-order and
        strong-stability-preserving -- no reference counterpart (the
        reference tops out at Heun, stepper.py). Same conventions as
        _heun_pair_impl: stage-0 aux/observables (Q10 pairing), NaN OR-ed
        across stages, chain state threaded stage to stage."""
        k0, aux = self._stage(theta_c, t, key, 0, n, n_obs,
                              chain_state=chain_state, rw_scale=rw_scale)
        aux = dict(aux)
        aux.pop("_x", None)
        aux.pop("_logp", None)
        aux.pop("_logw", None)
        cs = self._chain_handoff(aux)
        k1, a1 = self._stage(theta_c + dt * k0, t + dt, key, 1, n, n_obs,
                             with_obs=False, chain_state=cs,
                             rw_scale=rw_scale)
        cs = self._chain_handoff(a1, into=aux)
        k2, a2 = self._stage(theta_c + 0.25 * dt * (k0 + k1), t + 0.5 * dt,
                             key, 2, n, n_obs, with_obs=False,
                             chain_state=cs, rw_scale=rw_scale)
        aux["nan"] = aux["nan"] | a1["nan"] | a2["nan"]
        cs = self._chain_handoff(a2, into=aux)
        if cs is not None:
            aux["_chain_state"] = cs
        return dt / 6.0 * (k0 + k1 + 4.0 * k2), aux

    def _heun_attempt_impl(self, theta_c, t, dt, key, off, chain_state,
                           rw_scale, n: int, n_obs: int):
        """One embedded-adaptive-Heun attempt (stepper.py:6-91): full step
        vs two half steps, error in the S-metric of the LAST stage's SExp
        (main.py:24-26 / stepper.py:71 semantics). ``off`` = 5 * attempt,
        the per-call intStep base. Returns (dy1, err, aux)."""
        k0, aux0 = self._stage(theta_c, t, key, off + 0, n, n_obs,
                               chain_state=chain_state, rw_scale=rw_scale)
        aux0 = dict(aux0)
        cs = self._chain_handoff(aux0)
        y1 = theta_c + dt * k0
        # only the first stage's observables are recorded (Q10): the four
        # predictor/half-step stages skip their n_obs passes
        k1, a1 = self._stage(y1, t + dt, key, off + 1, n, n_obs,
                             with_obs=False, chain_state=cs,
                             rw_scale=rw_scale)
        cs = self._chain_handoff(a1, into=aux0)
        dy0 = 0.5 * dt * (k0 + k1)

        yh = theta_c + 0.5 * dt * k0
        k10, a2 = self._stage(yh, t + 0.5 * dt, key, off + 2, n, n_obs,
                              with_obs=False, chain_state=cs,
                              rw_scale=rw_scale)
        cs = self._chain_handoff(a2, into=aux0)
        dy1 = 0.25 * dt * (k0 + k10)
        y2 = theta_c + dy1
        k01, a3 = self._stage(y2, t + 0.5 * dt, key, off + 3, n, n_obs,
                              with_obs=False, chain_state=cs,
                              rw_scale=rw_scale)
        cs = self._chain_handoff(a3, into=aux0)
        y3 = y2 + 0.5 * dt * k01
        k11, aux_last = self._stage(y3, t + dt, key, off + 4, n, n_obs,
                                    with_obs=False, chain_state=cs,
                                    rw_scale=rw_scale)
        cs = self._chain_handoff(aux_last, into=aux0)
        if cs is not None:
            aux0["_chain_state"] = cs
        dy1 = dy1 + 0.25 * dt * (k01 + k11)

        # Per-call parity: the recorded info is the FIRST stage's (the state
        # at t -- AdaptiveHeun's `k0, info = f(y0, t, ...)`), while the
        # S-metric uses the LAST stage's SExp (the reference reads f.SExp
        # after all calls, stepper.py:71). NaN flags from ALL stages are
        # OR-ed in so a final-step late-stage NaN still aborts the run.
        aux0["nan"] = (aux0["nan"] | a1["nan"] | a2["nan"] | a3["nan"]
                       | aux_last["nan"])
        aux0.pop("_x", None)
        aux0.pop("_logp", None)
        aux0.pop("_logw", None)
        diff = dy1 - dy0
        sexp = aux_last.get("SExp")
        if sexp is not None:
            sdt = self.precision.solve
            d = diff.astype(sdt)
            err = d @ jnp.matmul(sexp.astype(sdt), d,
                                 precision=jax.lax.Precision.HIGHEST)
        elif self._sexp_matfree:
            # matrix-free S-metric on the LAST stage's samples at its own
            # parameter point y3 -- same semantics as the dense SExp
            err = self._sexp_quad(y3, aux_last["_x"], aux_last["_logp"],
                                  aux_last["_logw"], diff)
        else:
            err = jnp.linalg.norm(diff)
        return dy1, err, aux0

    def _rk23_attempt_impl(self, theta_c, t, dt, key, off, chain_state,
                           rw_scale, n: int, n_obs: int):
        """One embedded Bogacki-Shampine 3(2) attempt (steppers.AdaptiveRK23;
        no reference counterpart): 4 stages, third-order accepted solution,
        second-order embedded error. Same conventions as
        _heun_attempt_impl: stage-0 aux (Q10), per-stage RNG off + i, NaN
        OR-fold, S-metric error from the LAST stage (dense SExp or
        matrix-free at its parameter point). Returns (dy3, err, aux)."""
        k0, aux0 = self._stage(theta_c, t, key, off + 0, n, n_obs,
                               chain_state=chain_state, rw_scale=rw_scale)
        aux0 = dict(aux0)
        cs = self._chain_handoff(aux0)
        k1, a1 = self._stage(theta_c + 0.5 * dt * k0, t + 0.5 * dt, key,
                             off + 1, n, n_obs, with_obs=False,
                             chain_state=cs, rw_scale=rw_scale)
        cs = self._chain_handoff(a1, into=aux0)
        k2, a2 = self._stage(theta_c + 0.75 * dt * k1, t + 0.75 * dt, key,
                             off + 2, n, n_obs, with_obs=False,
                             chain_state=cs, rw_scale=rw_scale)
        cs = self._chain_handoff(a2, into=aux0)
        dy3 = dt * (2.0 / 9.0 * k0 + 1.0 / 3.0 * k1 + 4.0 / 9.0 * k2)
        y3 = theta_c + dy3
        k3, aux_last = self._stage(y3, t + dt, key, off + 3, n, n_obs,
                                   with_obs=False, chain_state=cs,
                                   rw_scale=rw_scale)
        cs = self._chain_handoff(aux_last, into=aux0)
        if cs is not None:
            aux0["_chain_state"] = cs
        dy2 = dt * (7.0 / 24.0 * k0 + 0.25 * k1 + 1.0 / 3.0 * k2
                    + 0.125 * k3)

        aux0["nan"] = (aux0["nan"] | a1["nan"] | a2["nan"]
                       | aux_last["nan"])
        aux0.pop("_x", None)
        aux0.pop("_logp", None)
        aux0.pop("_logw", None)
        diff = dy3 - dy2
        sexp = aux_last.get("SExp")
        if sexp is not None:
            sdt = self.precision.solve
            d = diff.astype(sdt)
            err = d @ jnp.matmul(sexp.astype(sdt), d,
                                 precision=jax.lax.Precision.HIGHEST)
        elif self._sexp_matfree:
            err = self._sexp_quad(y3, aux_last["_x"], aux_last["_logp"],
                                  aux_last["_logw"], diff)
        else:
            err = jnp.linalg.norm(diff)
        return dy3, err, aux0

    def _heun_multi_impl(self, theta_m, ts, dts, keys, chain_state, rw_scale,
                         n: int, n_obs: int, kind: str = "heun"):
        """K fixed steps in ONE dispatch: a lax.scan over (t, dt, key)
        triples carrying the master-precision parameter vector. ``kind``
        selects the per-step program: "heun" (the reference's fixed
        stepper) or "rk3" (the SSPRK3 triple).

        The host loop dispatches one program per K steps instead of one per
        step, amortizing dispatch latency (this image's remote TPU tunnel:
        ~0.1 s/call) K-fold. Physics, RNG stream, and info/time pairing are
        identical to the per-step path: the caller passes the exact
        ``jax.random.split`` sequence the host loop would draw, stage
        arithmetic stays in compute dtype (ts/dts are cast by the caller),
        and the master-precision accumulate matches steppers.py. Per-step
        aux comes back stacked along a leading K axis; ``dist_params`` is
        added post-step (the driver records it after set_parameters)."""
        compute = self.precision.compute
        step_impl = (self._rk3_triple_impl if kind == "rk3"
                     else self._heun_pair_impl)

        def body(carry, inp):
            theta, cs = carry
            t, dt, k = inp
            dy, aux = step_impl(theta.astype(compute), t, dt, k,
                                cs, rw_scale, n, n_obs)
            cs = aux.pop("_chain_state", cs)
            theta = theta + jnp.asarray(dy, dtype=theta.dtype)
            aux = dict(aux)
            aux["dist_params"] = self._unravel(
                theta.astype(compute))["latent"]["dist_params"]
            return (theta, cs), aux

        (theta_f, cs_f), auxs = jax.lax.scan(
            body, (theta_m, chain_state), (ts, dts, keys))
        return theta_f, cs_f, auxs

    def _adaptive_multi_impl(self, theta_m, t0, dt_sugg0, dt_prev0, keys,
                             chain_state, rw_scale, t_end, t_eps, tol,
                             max_step, n: int, n_obs: int,
                             kind: str = "heun", exact: bool = False):
        """Up to K adaptive steps in ONE dispatch: a lax.scan over per-step
        keys whose body runs the embedded attempt (heun:
        _heun_attempt_impl, rk23: _rk23_attempt_impl) inside a
        lax.while_loop with the dt controller ON DEVICE -- accept/reject
        never round-trips to the host. The reference re-dispatches every
        RHS stage of every attempt from its host loop (stepper.py:54-79);
        the fused attempt cut that to one dispatch per attempt; this cuts
        it to one per K steps.

        Semantics are the per-step AdaptiveHeun/AdaptiveRK23 contract:
        fe = tol / err (inf at err <= 0, so a NaN error accepts the step
        and surfaces through the aux NaN flag -- identical to the host
        loop's NaN comparison semantics), dt scale clamp
        [0.2, 2] * 0.9 * fe^(1/3), maxStep cap, the UNCAPPED dt suggestion
        carried between steps while ``exact`` clamps each attempt at
        t_end - t (driver exact_t_end), per-attempt RNG off = 5 * attempt,
        stage-0 observables/aux of the ACCEPTED attempt (Q10), MCMC chain
        state advancing through rejected attempts with acceptance counts
        summed over all attempts. Controller/time arithmetic runs in
        master precision on device, matching the host loop's Python f64.

        The number of steps to t_end is data-dependent (dt is chosen
        on-device), so slots run under a mask: slot i is active while the
        driver's loop condition holds (t < t_end - t_eps when exact, the
        reference's ``t < t_end + dt_prev`` overshoot otherwise, quirk
        Q11); inactive slots pass the carry through and emit zero rows.
        The driver records the first n_done = active.sum() rows.

        Returns (theta_f, t_f, dt_sugg_f, dt_prev_f, chain_state_f, outs)
        with outs = {"aux": stacked per-step aux (SExp dropped --
        never scan-stack K (P, P) metric matrices; dist_params of the
        post-step parameters added), "t_at": step start times,
        "dt_used", "attempts", "active"}.
        """
        compute = self.precision.compute
        master = self.precision.master
        attempt_impl = (self._rk23_attempt_impl if kind == "rk23"
                        else self._heun_attempt_impl)

        def strong(x):
            # while_loop/cond carries must have stable avals: strip weak
            # types that Python-scalar arithmetic leaves on traced values
            return jax.lax.convert_element_type(x, x.dtype)

        # Abstract template of one attempt's outputs -> strong-typed zeros
        # for the while_loop / masked-slot carries (traces no extra
        # attempt program).
        dy_s, _, aux_s = jax.eval_shape(
            partial(attempt_impl, n=n, n_obs=n_obs),
            jnp.zeros((self.n_params,), compute), jnp.zeros((), compute),
            jnp.zeros((), compute), keys[0], jnp.zeros((), jnp.int32),
            chain_state, rw_scale)
        aux_zeros = {
            k: jax.tree.map(lambda v: jnp.zeros(v.shape, v.dtype), v)
            for k, v in aux_s.items() if k != "_chain_state"
        }
        has_mcmc = "mcmc_accepted" in aux_zeros
        dp_s = jax.eval_shape(
            lambda th: self._unravel(th)["latent"]["dist_params"],
            jnp.zeros((self.n_params,), compute))

        def step_body(carry, key):
            theta, t, dt_sugg, dt_prev, cs = carry
            if exact:
                active = t < t_end - t_eps
            else:
                active = t < t_end + dt_prev

            def take(op):
                theta, t, dt_sugg, dt_prev, cs = op
                cap = t_end - t
                dt0 = jnp.minimum(dt_sugg, cap) if exact else dt_sugg

                def a_body(c):
                    dt = c["dt"]
                    dy, err, aux = attempt_impl(
                        theta.astype(compute), t.astype(compute),
                        dt.astype(compute), key, 5 * c["attempt"],
                        c["cs"], rw_scale, n=n, n_obs=n_obs)
                    aux = dict(aux)
                    cs2 = aux.pop("_chain_state", c["cs"])
                    dy, aux = jax.tree.map(strong, (dy, aux))
                    errm = err.astype(master)
                    fe = jnp.where(errm > 0.0,
                                   jnp.asarray(tol, master) / errm,
                                   jnp.inf)
                    scale = jnp.clip(0.9 * fe ** (1.0 / 3.0), 0.2, 2.0)
                    dt_free = jnp.minimum(dt * scale, max_step)
                    dt_next = (jnp.minimum(dt_free, cap) if exact
                               else dt_free)
                    acc = c["acc"]
                    if has_mcmc:
                        acc = (acc[0] + aux["mcmc_accepted"],
                               acc[1] + aux["mcmc_proposed"])
                    return dict(dt=strong(dt_next), fe=strong(fe),
                                attempt=c["attempt"] + 1, dy=dy, aux=aux,
                                cs=cs2, dt_free=strong(dt_free),
                                real_dt=strong(dt), acc=acc)

                acc0 = None
                if has_mcmc:
                    acc0 = (jnp.zeros(aux_s["mcmc_accepted"].shape,
                                      aux_s["mcmc_accepted"].dtype),
                            jnp.zeros(aux_s["mcmc_proposed"].shape,
                                      aux_s["mcmc_proposed"].dtype))
                c0 = dict(dt=strong(dt0), fe=jnp.zeros((), master),
                          attempt=jnp.zeros((), jnp.int32),
                          dy=jnp.zeros(dy_s.shape, dy_s.dtype),
                          aux=aux_zeros, cs=cs, dt_free=strong(dt0),
                          real_dt=strong(dt0), acc=acc0)
                c = jax.lax.while_loop(lambda c: c["fe"] < 1.0, a_body,
                                       c0)
                theta2 = theta + c["dy"].astype(master)
                aux = dict(c["aux"])
                aux.pop("SExp", None)
                if has_mcmc:
                    aux["mcmc_accepted"], aux["mcmc_proposed"] = c["acc"]
                aux["dist_params"] = strong(self._unravel(
                    theta2.astype(compute))["latent"]["dist_params"])
                out = dict(aux=aux, t_at=t, dt_used=c["real_dt"],
                           attempts=c["attempt"],
                           active=jnp.ones((), jnp.bool_))
                return (theta2, strong(t + c["real_dt"]), c["dt_free"],
                        c["real_dt"], c["cs"]), out

            def skip(op):
                theta, t, dt_sugg, dt_prev, cs = op
                aux = dict(aux_zeros)
                aux.pop("SExp", None)
                aux["dist_params"] = jnp.zeros(dp_s.shape, dp_s.dtype)
                out = dict(aux=aux, t_at=t,
                           dt_used=jnp.zeros((), master),
                           attempts=jnp.zeros((), jnp.int32),
                           active=jnp.zeros((), jnp.bool_))
                return op, out

            return jax.lax.cond(active, take, skip,
                                (theta, t, dt_sugg, dt_prev, cs))

        init = (theta_m, jnp.asarray(t0, master),
                jnp.asarray(dt_sugg0, master),
                jnp.asarray(dt_prev0, master), chain_state)
        (theta_f, t_f, dt_sugg_f, dt_prev_f, cs_f), outs = jax.lax.scan(
            step_body, init, keys)
        return theta_f, t_f, dt_sugg_f, dt_prev_f, cs_f, outs

    def _fused_mcmc_inputs(self, key):
        """(chain_state, rw_scale) for a fused dispatch (None, None when the
        sampler is exact / not fused)."""
        if not self._mcmc_fused:
            return None, None
        cs = self.sampler.ensure_chain_state(jax.random.fold_in(key, 997))
        return cs, self.sampler.fused_rw_scale()

    def _absorb_mcmc(self, aux, chain_state=None):
        """Host-side tail of a fused dispatch: hand the advanced chain state
        + acceptance counts back to the sampler (Robbins-Monro rw
        adaptation happens there, BETWEEN dispatches -- within one program
        the proposal scale is a constant, keeping each dispatch a valid
        fixed-kernel MH chain)."""
        cs = aux.pop("_chain_state", None) if isinstance(aux, dict) else None
        if cs is None:
            cs = chain_state
        if cs is not None:
            # counts stay device arrays (stacked from heun_multi: summed
            # lazily) -- no host sync here; MCSampleInfo converts on read
            acc = aux["mcmc_accepted"]
            prop = aux["mcmc_proposed"]
            if getattr(acc, "ndim", 0):
                acc, prop = acc.sum(), prop.sum()
            self.sampler.note_fused_acceptance(cs, acc, prop)
        return aux

    def heun_multi(self, theta, ts, dts, keys, kind: str = "heun"):
        """Run ``len(ts)`` fixed steps in one dispatch (requires
        ``fused_steps_available``). ``kind``: "heun" | "rk3" (the per-step
        program inside the scan). ``keys``: (K,) stacked per-step keys --
        the same split sequence the per-step loop draws. Returns
        (theta_final master-precision, stacked aux)."""
        theta_m = jnp.asarray(theta, dtype=self.precision.master)
        # compute-dtype t/dt keeps the traced stage arithmetic identical to
        # the per-step path, where python-float t/dt enter as WEAK types and
        # never promote the f32 stages
        ts = jnp.asarray(ts, dtype=self.precision.compute)
        dts = jnp.asarray(dts, dtype=self.precision.compute)
        cs, rw = self._fused_mcmc_inputs(keys[0])
        fn = self._aot.get(("multi", kind, int(ts.shape[0])))
        if fn is not None:
            try:
                theta_f, cs_f, auxs = fn(theta_m, ts, dts, keys, cs, rw)
            except (TypeError, ValueError):
                fn = None
        if fn is None:
            theta_f, cs_f, auxs = self._fused_multi(
                theta_m, ts, dts, keys, cs, rw,
                n=self.n_samples, n_obs=self.n_samples_obs, kind=kind,
            )
        auxs = self._absorb_mcmc(auxs, chain_state=cs_f)
        # deliberately NOT updating the per-call diagnostic attributes
        # (ev/snr/solverResidual/...): slicing the last row of ~15 stacked
        # arrays enqueues that many device ops per batch, which on
        # high-dispatch-latency hosts re-creates the per-step overhead this
        # path exists to amortize. The driver's batched branch reads the
        # stacked aux directly; the attribute contract applies to rhs()/
        # heun_pair/heun_attempt (the per-step paths).
        return theta_f, auxs

    def adaptive_multi(self, theta, t, dt_sugg, dt_prev, keys, t_end,
                       t_eps, tol, max_step, kind: str = "heun",
                       exact: bool = False):
        """Run up to ``len(keys)`` adaptive steps in one dispatch with the
        attempt retry loop and dt controller on device (requires
        ``fused_steps_available``). ``dt_sugg`` is the stepper's carried
        (uncapped) dt suggestion, ``dt_prev`` the last accepted step's
        dt_used (the reference's loop-condition dt, quirk Q11). Returns
        (theta_f master, t_f, dt_sugg_f, dt_prev_f, outs); see
        _adaptive_multi_impl for the outs schema and masking contract.
        Like heun_multi, the per-call diagnostic attributes (ev/snr/...)
        are deliberately not updated -- the driver's batched branch reads
        the stacked aux directly."""
        theta_m = jnp.asarray(theta, dtype=self.precision.master)
        cs, rw = self._fused_mcmc_inputs(keys[0])
        args = (theta_m, float(t), float(dt_sugg), float(dt_prev), keys,
                cs, rw, float(t_end), float(t_eps), float(tol),
                float(max_step))
        fn = self._aot.get(("amulti", kind, int(keys.shape[0]), exact))
        if fn is not None:
            try:
                res = fn(*args)
            except (TypeError, ValueError):
                fn = None
        if fn is None:
            res = self._fused_amulti(
                *args, n=self.n_samples, n_obs=self.n_samples_obs,
                kind=kind, exact=exact)
        theta_f, t_f, dt_sugg_f, dt_prev_f, cs_f, outs = res
        outs = dict(outs)
        outs["aux"] = self._absorb_mcmc(dict(outs["aux"]),
                                        chain_state=cs_f)
        return theta_f, t_f, dt_sugg_f, dt_prev_f, outs

    def _finish_fused(self, dy, aux):
        """Shared host-side tail of the fused stepper stages."""
        self.ev = aux.get("ev", aux.get("ev_topk"))
        self.snr = aux.get("snr", aux.get("snr_topk"))
        self.solverResidual = aux["solver_res"]
        self.tdvp_error = aux["tdvp_error"]
        self.ElocMean = aux["eloc_mean"]
        self.ElocVar = aux["eloc_var"]
        if "SExp" in aux:
            self.SExp = aux["SExp"]
        return jnp.asarray(dy, dtype=self.precision.master), aux

    @property
    def fused_steps_available(self) -> bool:
        """The fused pair/attempt sample AND solve in-jit, so they need an
        in-jit sampling path (exact latent OR a fused Metropolis chain with
        its state threaded through dispatches) and the on-device solve; the
        host f64 eigensolve path returns stats instead of an in-jit
        update."""
        return ((self.sampler.exact or self._mcmc_fused)
                and self.cfg.solve_on_device)

    def warm_aot(self, cache_dir, kind: str = "pair", K: int = 1,
                 t: float = 0.0, dt: float = 1e-3, key=None,
                 verbose: bool = False, t_end: float = 1.0,
                 tol: float = 1e-8, max_step: float = 1.0,
                 exact: bool = False):
        """Pre-load (or compile and persist) a fused stepper executable
        from the AOT cache (utils/aot.py): subsequent heun_pair /
        heun_attempt / heun_multi calls run it directly, skipping
        per-process XLA compilation entirely (on this image's remote
        tunnel, 1-12 minutes per big program). ``kind``: "pair" |
        "attempt" | "multi" (with K steps per dispatch). ``t``/``dt``/
        ``key`` only fix the traced avals (weak scalars), not values."""
        from ..utils import aot

        if not self.fused_steps_available:
            raise ValueError("warm_aot needs fused_steps_available "
                             "(in-jit sampling + on-device solve)")
        key = jax.random.PRNGKey(0) if key is None else key
        theta_c = jnp.zeros((self.n_params,), self.precision.compute)
        cs, rw = self._fused_mcmc_inputs(key)
        kw = dict(n=self.n_samples, n_obs=self.n_samples_obs)
        devs = list(self.ctx.mesh.devices.flatten())
        if kind == "pair":
            args = (theta_c, float(t), float(dt), key, cs, rw)
            self._aot["pair"] = aot.load_or_compile(
                self._fused_pair, args, kw, cache_dir, "heun_pair",
                devices=devs, verbose=verbose)
        elif kind == "rk3":
            args = (theta_c, float(t), float(dt), key, cs, rw)
            self._aot["rk3"] = aot.load_or_compile(
                self._fused_rk3, args, kw, cache_dir, "rk3_triple",
                devices=devs, verbose=verbose)
        elif kind == "attempt":
            args = (theta_c, float(t), float(dt), key, 0, cs, rw)
            self._aot["attempt"] = aot.load_or_compile(
                self._fused_attempt, args, kw, cache_dir, "heun_attempt",
                devices=devs, verbose=verbose)
        elif kind == "rk23":
            args = (theta_c, float(t), float(dt), key, 0, cs, rw)
            self._aot["rk23"] = aot.load_or_compile(
                self._fused_rk23, args, kw, cache_dir, "rk23_attempt",
                devices=devs, verbose=verbose)
        elif kind in ("multi", "multi_rk3"):
            step_kind = "rk3" if kind == "multi_rk3" else "heun"
            theta_m = jnp.zeros((self.n_params,), self.precision.master)
            ts = jnp.zeros((K,), self.precision.compute)
            dts = jnp.full((K,), float(dt), self.precision.compute)
            keys = jnp.stack([jax.random.fold_in(key, i) for i in range(K)])
            args = (theta_m, ts, dts, keys, cs, rw)
            self._aot["multi", step_kind, K] = aot.load_or_compile(
                self._fused_multi, args, dict(kw, kind=step_kind),
                cache_dir, f"{step_kind}_multi_k{K}",
                devices=devs, verbose=verbose)
        elif kind in ("amulti", "amulti_rk23"):
            # adaptive multi-step: the scalar operands (t/dt/t_end/tol/...)
            # are weak f64 avals, so their VALUES don't affect the compiled
            # program; ``exact`` is static and must match the run.
            step_kind = "rk23" if kind == "amulti_rk23" else "heun"
            theta_m = jnp.zeros((self.n_params,), self.precision.master)
            keys = jnp.stack([jax.random.fold_in(key, i) for i in range(K)])
            args = (theta_m, float(t), float(dt), float(dt), keys, cs, rw,
                    float(t_end), 1e-12, float(tol), float(max_step))
            self._aot["amulti", step_kind, K, exact] = aot.load_or_compile(
                self._fused_amulti, args,
                dict(kw, kind=step_kind, exact=exact), cache_dir,
                f"{step_kind}_amulti_k{K}{'_exact' if exact else ''}",
                devices=devs, verbose=verbose)
        else:
            raise ValueError(f"unknown warm_aot kind {kind!r}")

    def heun_pair(self, theta, t, dt, key):
        """(dy, aux) for a whole fixed-Heun step in one dispatch."""
        theta_c = jnp.asarray(theta, dtype=self.precision.compute)
        cs, rw = self._fused_mcmc_inputs(key)
        fn = self._aot.get("pair")
        if fn is not None:
            try:
                dy, aux = fn(theta_c, float(t), float(dt), key, cs, rw)
            except (TypeError, ValueError):  # aval drift: fall back to jit
                fn = None
        if fn is None:
            dy, aux = self._fused_pair(
                theta_c, t, dt, key, cs, rw,
                n=self.n_samples, n_obs=self.n_samples_obs)
        aux = self._absorb_mcmc(aux)
        return self._finish_fused(dy, aux)

    def rk3_triple(self, theta, t, dt, key):
        """(dy, aux) for a whole fixed-SSPRK3 step in one dispatch (same
        pair_fn contract as heun_pair; steppers.FixedStepper mode='RK3')."""
        theta_c = jnp.asarray(theta, dtype=self.precision.compute)
        cs, rw = self._fused_mcmc_inputs(key)
        fn = self._aot.get("rk3")
        if fn is not None:
            try:
                dy, aux = fn(theta_c, float(t), float(dt), key, cs, rw)
            except (TypeError, ValueError):
                fn = None
        if fn is None:
            dy, aux = self._fused_rk3(
                theta_c, t, dt, key, cs, rw,
                n=self.n_samples, n_obs=self.n_samples_obs)
        aux = self._absorb_mcmc(aux)
        return self._finish_fused(dy, aux)

    def heun_attempt(self, theta, t, dt, key, attempt: int = 0):
        """(dy1, err, aux) for a whole adaptive attempt in one dispatch.
        ``attempt`` decorrelates the RNG across retries (the per-call path's
        intStep = 5 * attempt + stage contract)."""
        theta_c = jnp.asarray(theta, dtype=self.precision.compute)
        cs, rw = self._fused_mcmc_inputs(key)
        fn = self._aot.get("attempt")
        if fn is not None:
            try:
                dy1, err, aux = fn(theta_c, float(t), float(dt), key,
                                   5 * attempt, cs, rw)
            except (TypeError, ValueError):
                fn = None
        if fn is None:
            dy1, err, aux = self._fused_attempt(
                theta_c, t, dt, key, 5 * attempt, cs, rw,
                n=self.n_samples, n_obs=self.n_samples_obs,
            )
        aux = self._absorb_mcmc(aux)
        dy1, aux = self._finish_fused(dy1, aux)
        return dy1, err, aux

    def rk23_attempt(self, theta, t, dt, key, attempt: int = 0):
        """(dy3, err, aux) for a whole Bogacki-Shampine 3(2) attempt in one
        dispatch (steppers.AdaptiveRK23 attempt_fn contract)."""
        theta_c = jnp.asarray(theta, dtype=self.precision.compute)
        cs, rw = self._fused_mcmc_inputs(key)
        fn = self._aot.get("rk23")
        if fn is not None:
            try:
                dy3, err, aux = fn(theta_c, float(t), float(dt), key,
                                   5 * attempt, cs, rw)
            except (TypeError, ValueError):
                fn = None
        if fn is None:
            dy3, err, aux = self._fused_rk23(
                theta_c, t, dt, key, 5 * attempt, cs, rw,
                n=self.n_samples, n_obs=self.n_samples_obs,
            )
        aux = self._absorb_mcmc(aux)
        dy3, aux = self._finish_fused(dy3, aux)
        return dy3, err, aux

    def _host_solve(self, aux):
        """Host f64 solve (the reference's default path, tdvp.py:60-64)."""
        S = np.asarray(aux.pop("S"), dtype=np.float64)
        S0 = np.asarray(aux.pop("S0"), dtype=np.float64)
        F0 = np.asarray(aux.pop("F0"), dtype=np.float64)
        A = aux.pop("A")
        A = None if A is None else np.asarray(A, dtype=np.float64)
        e2 = float(aux.pop("eloc_sq_mean"))
        out = {}
        if self.solver_method == "eigh":
            update, ev, snr, _ = _solve_regularized(
                S, F0, self.cfg, self.n_samples, A=A, eigh_fn=np.linalg.eigh
            )
            out["ev"] = ev
            out["snr"] = snr if snr is not None else np.zeros_like(ev)
        else:
            lam_max = float(np.linalg.norm(S, 2)) if S.shape[0] <= 512 else \
                float(_lambda_max(jnp.asarray(S)))
            lam = self.cfg.svd_tol * lam_max
            update = np.linalg.solve(S + lam * np.eye(S.shape[0]), F0)
            out["lambda_max"] = lam_max
        residual = np.linalg.norm(S @ update - F0) / np.linalg.norm(F0)
        tdvp_error = 1.0 + (update @ S0 @ update - 2.0 * F0 @ update) / e2
        out.update(update=update, solver_res=residual,
                   tdvp_error=tdvp_error)
        return out

    # Stepper norm (main.py:24-26): v S v in the SExp metric.
    def s_metric_norm(self, v, S):
        v = jnp.asarray(v, dtype=self.precision.solve)
        return v @ jnp.asarray(S, dtype=self.precision.solve) @ v

    # ------------------------------------------------------------------
    # Matrix-free S-metric (sexp_mode="matfree"/"auto"): v^T SExp v without
    # the (P, P) SExp. SExp = E[logp^2 ybar ybar^T] with ybar = O - E[O]
    # (the weighted Gram the dense path forms, _direct_stats), so
    #   v^T SExp v = E[ logp_n^2 (a_n - E[a])^2 ],  a_n = O_n . v,
    # and a = d/d eps logp(theta + eps v, x) -- ONE jvp (forward) pass over
    # the batch: O(N P) per evaluation vs the dense path's O(N P^2) Gram
    # per stage. This unlocks adaptive stepping for the large-P solver
    # strategies (cholesky/cg/minsr) the driver previously rejected.
    # ------------------------------------------------------------------
    def _sexp_quad(self, theta_c, x, logp, log_w, v):
        f = self._log_prob_flat

        def batch_logp(th):
            return jax.vmap(f, in_axes=(None, 0))(th, x)

        _, a = jax.jvp(batch_logp, (theta_c,),
                       (jnp.asarray(v, theta_c.dtype),))
        sdt = self.precision.solve
        a = a.astype(sdt)
        # self-normalized IS weights, matching the dense SExp =
        # gram(w * logp^2) with w-weighted centering (_direct_stats);
        # log_w == 0 gives w == 1 exactly (the unweighted estimator)
        w = jnp.exp(log_w.astype(sdt) - jnp.max(log_w.astype(sdt)))
        w = w / jnp.mean(w)
        a = a - jnp.mean(w * a)
        return jnp.mean(w * logp.astype(sdt) ** 2 * a**2)

    def sexp_norm(self, v):
        """Host-facing matrix-free S-metric against the LAST rhs() call's
        stage (its theta and samples): the per-call AdaptiveHeun contract's
        stand-in for f.SExp when no dense SExp exists (driver wires
        normFunction to this when S is None)."""
        if self._sexp_ctx is None:
            raise RuntimeError("sexp_norm needs a prior rhs() call with "
                               "sexp_mode matfree")
        theta_c, x, logp, log_w = self._sexp_ctx
        if self._sexp_quad_jit is None:
            self._sexp_quad_jit = jax.jit(self._sexp_quad)
        return self._sexp_quad_jit(theta_c, x, logp, log_w,
                                   jnp.asarray(v, theta_c.dtype))

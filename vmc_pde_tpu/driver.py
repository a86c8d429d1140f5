"""Experiment driver: wires sampler -> state -> TDVP -> stepper and runs the
time evolution, recording the reference-compatible infos schema.

Parity with vmc_fluids/main.py:69-211 (wiring, time loop, per-step logging,
periodic 2D normalization check, HDF5 dump) with the reference's
manual-checklist knobs handled by RunConfig presets and real parameter
checkpointing added (atomic npz of {theta, t, step, dt} --
utils/checkpoint.py; the reference only persisted diagnostics, SURVEY.md
section 5.4). ``init_params`` starts the evolution from a pretrained flow
(the reference's commented-out pretrain->evolve handoff, main.py:120-125).
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from .config import RunConfig, latent_for_sampler
from .models.flow import build_flow
from .models.state import VarState
from .ops.evolution import Equation, make_equation
from .parallel.mesh import ParallelCtx, is_coordinator
from .sampling.sampler import Sampler
from .solver.steppers import AdaptiveHeun, AdaptiveRK23, FixedStepper
from .solver.tdvp import TDVP, TDVPConfig
from .utils import dtypes
from .utils.grid import Grid
from .utils.infos import InfoRecorder, store_infos
from .utils.timings import Timings


def build_problem(cfg: RunConfig):
    """Construct (state, tdvp, stepper, equation, grid) from a RunConfig."""
    precision = dtypes.resolve(cfg.precision)
    ctx = ParallelCtx.create(dp=cfg.mesh_dp, tp=cfg.mesh_tp)

    sampler = Sampler(
        dim=cfg.dim,
        ctx=ctx,
        name=cfg.latent_name,
        n_chains=cfg.n_chains,
        mcmc_info={"offset": np.asarray(cfg.offset), "bound": cfg.mcmc_bound},
        proposal_mode=cfg.proposal_mode,
        rw_scale=cfg.rw_scale,
        dtype=precision.compute,
    )

    flow, params = build_flow(
        cfg.seed,
        cfg.dim,
        depth=cfg.depth,
        hidden=cfg.hidden_resolved(),
        variant=cfg.variant,
        global_affine=cfg.global_affine,
        latent_name=latent_for_sampler(cfg),
        offset=cfg.offset,
        alpha=cfg.alpha,
        out_scale=cfg.init_scale,
        dtype=precision.compute,
        qmc=cfg.qmc and latent_for_sampler(cfg) in ("Gauss", "Student_t"),
    )
    state = VarState(
        flow, params, sampler=sampler, ctx=ctx, precision=precision,
        sample_key=cfg.sample_seed,
    )

    # cfg.equation: registry name (the reference's evolutionEq.py:54-77
    # name->RHS mapping) or a user-supplied Equation instance -- custom
    # physics plugs into the full driver (fused steppers, checkpointing,
    # diagnostics) without forking it. See examples/custom_equation.py.
    if isinstance(cfg.equation, Equation):
        if cfg.equation_params:
            raise ValueError(
                "RunConfig.equation is an Equation INSTANCE, so "
                f"equation_params {sorted(cfg.equation_params)} would be "
                "silently ignored -- construct the instance with those "
                "parameters instead (equation_params applies to registry "
                "names only)"
            )
        equation = cfg.equation
    else:
        equation = make_equation(cfg.equation, cfg.dim, **cfg.equation_params)

    tdvp_cfg = TDVPConfig(
        use_snr=cfg.use_snr,
        snr_tol=cfg.snr_tol,
        svd_tol=cfg.svd_tol,
        eloc_clip=cfg.eloc_clip,
        is_gamma=cfg.is_gamma,
        diagonal_shift=cfg.diagonal_shift,
        solver_method=cfg.solver_method,
        eigh_max_params=cfg.eigh_max_params,
        gram_precision=cfg.gram_precision,
        gram_backend=cfg.gram_backend,
        gram_cross=cfg.gram_cross,
        stats_partitioning=cfg.stats_partitioning,
        per_sample_backend=cfg.per_sample_backend,
        per_sample_tile=cfg.per_sample_tile,
        hessian_mode=cfg.hessian_mode,
        cg_maxiter=cfg.cg_maxiter,
        cg_tol=cfg.cg_tol,
        auto_tol_floor=cfg.auto_tol_floor,
        # adaptive stepping needs an S-metric: dense (P, P) SExp for the
        # eigh solver (reference parity), matrix-free v^T SExp v for the
        # large-P strategies (cholesky/cg/minsr) -- see TDVPConfig.sexp_mode
        sexp_mode=("auto" if cfg.stepper.startswith("adaptive") else "none"),
        solve_on_device=cfg.solve_on_device,
        chunk_size=cfg.chunk_size,
        integrals=cfg.integrals,
    )
    tdvp = TDVP(
        state, equation, tdvp_cfg,
        n_samples=cfg.n_samples_tdvp, n_samples_obs=cfg.n_samples_obs,
        precision=precision,
    )

    if (cfg.solve_on_device and precision.solve == jnp.float64
            and jax.default_backend() == "tpu" and is_coordinator()):
        # The f64-emulated on-device eigh has produced NaN eigenvectors
        # (utils/dtypes.py tpu_default docstring) and, with QMC latents,
        # reproducible TPU-worker kernel faults on this image. Warn rather
        # than reject: the plain tpu_f64stats+gram-f64 combination has run
        # clean, and host behavior may differ across jaxlib versions.
        print("WARNING: on-device f64 solve on TPU uses the emulated-f64 "
              "eigh, which has been observed to return NaN eigenvectors "
              "and (rarely) fault the TPU worker; prefer --host-solve "
              "(solve_on_device=False) with f64 solve dtypes.")

    # Exact-latent workloads integrate with fused stepper stages: the whole
    # Heun pair / adaptive attempt is one dispatch with dt traced (the MCMC
    # path keeps per-stage dispatch -- its chain state lives on the host).
    fused = tdvp.fused_steps_available
    if cfg.stepper == "adaptive_heun":
        stepper = AdaptiveHeun(timeStep=cfg.dt0, tol=cfg.tol,
                               maxStep=cfg.max_step,
                               attempt_fn=tdvp.heun_attempt if fused else None)
    elif cfg.stepper == "adaptive_rk23":
        stepper = AdaptiveRK23(timeStep=cfg.dt0, tol=cfg.tol,
                               maxStep=cfg.max_step,
                               attempt_fn=tdvp.rk23_attempt if fused else None)
    elif cfg.stepper == "fixed_euler":
        stepper = FixedStepper(timeStep=cfg.dt0, maxStep=cfg.max_step,
                               increase_fac=cfg.increase_fac, mode="Euler")
    elif cfg.stepper == "fixed_rk3":
        stepper = FixedStepper(timeStep=cfg.dt0, maxStep=cfg.max_step,
                               increase_fac=cfg.increase_fac, mode="RK3",
                               pair_fn=tdvp.rk3_triple if fused else None)
    else:
        stepper = FixedStepper(timeStep=cfg.dt0, maxStep=cfg.max_step,
                               increase_fac=cfg.increase_fac, mode="Heun",
                               pair_fn=tdvp.heun_pair if fused else None)

    grid = None
    if cfg.dim == 2:
        grid = Grid(np.ones(2) * cfg.grid_bound, cfg.grid_points, sym=cfg.sym_grid)

    return state, tdvp, stepper, equation, grid


def load_init_params(path: str, state) -> jnp.ndarray:
    """Flat master-precision parameter vector from a stored checkpoint:
    a pretrain orbax directory ({params, opt_state, epoch} as written by
    pretrain.train) or an evolution npz checkpoint ({theta, ...},
    utils/checkpoint.py). The reference sketches this handoff but never
    wires it (vmc_fluids/main.py:120-125, commented out)."""
    if os.path.isdir(path):
        import optax

        from .ops.score import flat_param_view
        from .utils.checkpoint import load_pytree

        # template with the adam state STRUCTURE (lr never affects it)
        template = dict(params=state.params,
                        opt_state=optax.adam(1e-3).init(state.params),
                        epoch=0)
        tree = load_pytree(path, template)
        flat, _ = flat_param_view(tree["params"])
        # through host numpy: orbax restores committed single-device
        # arrays, which a multi-device mesh program would reject
        return jnp.asarray(np.asarray(flat), dtype=state.precision.master)
    with np.load(path) as z:
        if "theta" not in z:
            raise ValueError(
                f"init_params npz {path!r} has no 'theta' array "
                f"(found {sorted(z.files)}); expected an evolution "
                "checkpoint (utils/checkpoint.py) or a pretrain orbax "
                "directory"
            )
        theta = np.asarray(z["theta"])
    if theta.shape != (state.numParameters,):
        raise ValueError(
            f"init_params {path!r} holds {theta.shape} parameters; this "
            f"flow has ({state.numParameters},) -- the architectures "
            "must match"
        )
    return jnp.asarray(theta, dtype=state.precision.master)


def s_metric_norm(v, S):
    """Adaptive-stepper error metric (main.py:24-26)."""
    if S is None:
        return float(jnp.linalg.norm(v))
    v = jnp.asarray(v, dtype=jnp.asarray(S).dtype)
    return float(v @ S @ v)


def run(cfg: RunConfig, max_steps: int = 10**9, callbacks=()):
    """Run the time evolution; returns (state, InfoRecorder)."""
    from .utils.cache import enable_compilation_cache
    enable_compilation_cache()
    state, tdvp, stepper, equation, grid = build_problem(cfg)
    timings = Timings()
    rec = InfoRecorder()

    wdir = cfg.workdir
    if wdir and is_coordinator():
        os.makedirs(wdir, exist_ok=True)

    # Native async metrics sink (config flag; SURVEY section 5.5): records
    # mirror the InfoRecorder stream into <workdir>/metrics.bin via the C++
    # background writer -- no file IO on the step loop.
    arec = None
    if cfg.async_recorder:
        if not wdir:
            raise ValueError("async_recorder needs a workdir")
        if is_coordinator():
            from .utils.recorder import AsyncRecorder

            arec = AsyncRecorder(os.path.join(wdir, "metrics.bin"))
            if not arec.available:
                arec = None

    def arec_record(step, t_at, info_host):
        arec.record("times", step, t_at)
        arec.record_dict(step, {k: v for k, v in info_host.items()
                                if not isinstance(v, dict)
                                and k not in rec.SKIP_KEYS})

    # NaN aborts are checked at flush points rather than per RHS call: a
    # per-call bool() would force a device->host sync and serialize the
    # pipeline (the reference exits on NaN inside the step, tdvp.py:136-141;
    # we fail at most ``nan_check_every`` steps later with the same
    # diagnostics). An intermediate-stage NaN propagates into the final
    # stage's update, so checking the step's final info flag covers every
    # stage.
    pending_nan = []

    def norm_fn(v, S):
        # adaptive S-metric: dense v S v when an SExp matrix exists, the
        # matrix-free quadratic against the last stage's samples otherwise
        # (large-P solvers -- TDVP.sexp_norm), plain 2-norm as last resort
        if S is None and getattr(tdvp, "_sexp_matfree", False):
            return float(tdvp.sexp_norm(v))
        return s_metric_norm(v, S)

    def f(theta, t, key, intStep=0):
        with timings.section("tdvp_rhs"):
            update, aux = tdvp.rhs(theta, t, key, intStep=intStep)
            if cfg.verbose:
                jax.block_until_ready(update)
        # AdaptiveHeun reads the S-metric off the rhs callable
        # (stepper.py:71 contract: normFunction(dy1 - dy0, f.SExp))
        f.SExp = tdvp.SExp
        return update, aux

    def check_nan():
        for flag, t_at in pending_nan:
            if bool(flag):
                raise FloatingPointError(
                    f"NaN encountered in TDVP update at t={t_at}"
                )
        pending_nan.clear()

    if cfg.aot_dir and tdvp.fused_steps_available:
        # load-or-compile the stepper executables this run will use from
        # the AOT cache -- fresh processes skip XLA compilation entirely
        with timings.section("aot_warm"):
            if isinstance(stepper, AdaptiveHeun):  # covers AdaptiveRK23
                rk23 = isinstance(stepper, AdaptiveRK23)
                tdvp.warm_aot(cfg.aot_dir,
                              kind="rk23" if rk23 else "attempt",
                              dt=stepper.dt, verbose=cfg.verbose)
                if cfg.steps_per_dispatch > 1:
                    tdvp.warm_aot(
                        cfg.aot_dir,
                        kind="amulti_rk23" if rk23 else "amulti",
                        K=cfg.steps_per_dispatch, dt=stepper.dt,
                        t_end=cfg.t_end, tol=stepper.tolerance,
                        max_step=stepper.maxStep, exact=cfg.exact_t_end,
                        verbose=cfg.verbose)
            elif (stepper.mode in ("Heun", "RK3")
                  and stepper.pair_fn is not None):
                rk3 = stepper.mode == "RK3"
                tdvp.warm_aot(cfg.aot_dir, kind="rk3" if rk3 else "pair",
                              dt=stepper.dt, verbose=cfg.verbose)
                if cfg.steps_per_dispatch > 1:
                    tdvp.warm_aot(cfg.aot_dir,
                                  kind="multi_rk3" if rk3 else "multi",
                                  K=cfg.steps_per_dispatch, dt=stepper.dt,
                                  verbose=cfg.verbose)

    theta = state.get_parameters()
    if cfg.init_params:
        # pretrain -> evolve handoff (main.py:120-125); --resume below
        # still wins when a later evolution checkpoint exists
        theta = load_init_params(cfg.init_params, state)
        state.set_parameters(theta)
        if cfg.verbose:
            print(f"initialized parameters from {cfg.init_params}")
    t = 0.0
    dt = stepper.dt
    n_step = 0
    key = jax.random.PRNGKey(cfg.sample_seed + 7)
    plotted = set()

    if cfg.resume and wdir:
        from .utils.checkpoint import latest_checkpoint

        ck = latest_checkpoint(wdir)
        if ck is not None:
            theta = jnp.asarray(ck["theta"], dtype=state.precision.master)
            state.set_parameters(theta)
            t, n_step, stepper.dt = ck["t"], ck["step"], ck["dt"]
            key = jax.random.fold_in(key, n_step)
            if cfg.verbose:
                print(f"resumed from step {n_step}, t={t:.4f}")

    if grid is not None and cfg.verbose:
        print("Initial grid integral:", float(state.integrate(grid)))

    # Multi-step dispatch (TDVP.heun_multi): batch steps_per_dispatch
    # fixed-Heun steps into one lax.scan program. Only full batches run
    # batched (two compiled shapes: K and 1); any per-step host action --
    # verbose logging, 2-D grid plotting, profiler window, callbacks,
    # checkpoint boundaries -- falls back to per-step dispatch. MCMC
    # workloads batch too: the Metropolis chain state threads through the
    # scan carry (TDVP._heun_multi_impl).
    multi_ok = (
        cfg.steps_per_dispatch > 1
        and isinstance(stepper, FixedStepper)
        and stepper.mode in ("Heun", "RK3")
        and stepper.pair_fn is not None
        and not cfg.verbose
        and not callbacks
        and grid is None
        and not cfg.profile_dir
    )

    # Adaptive multi-step dispatch (TDVP.adaptive_multi): batch
    # steps_per_dispatch adaptive steps into one program with the attempt
    # retry loop (lax.while_loop) and the dt controller ON DEVICE. Unlike
    # the fixed path the step count to t_end is data-dependent, so the
    # program masks slots past t_end and reports n_done; the driver
    # records only the active rows. Same per-step host-action fallbacks
    # as the fixed path.
    adapt_multi_ok = (
        cfg.steps_per_dispatch > 1
        and isinstance(stepper, AdaptiveHeun)  # covers AdaptiveRK23
        and stepper.attempt_fn is not None
        and not cfg.verbose
        and not callbacks
        and grid is None
        and not cfg.profile_dir
    )
    adapt_kind = "rk23" if isinstance(stepper, AdaptiveRK23) else "heun"

    # exact_t_end: stop at t_end (clamping the final dt) instead of the
    # reference's `while t < t_end + dt` overshoot (main.py:159, quirk Q11)
    t_eps = 1e-12 * max(1.0, abs(cfg.t_end))

    def more_steps(t, dt):
        if cfg.exact_t_end:
            return t < cfg.t_end - t_eps
        return t < cfg.t_end + dt

    def plan_batch(t, dt, n_step, steps_done):
        """(K, ts, dts) for the next batch: the deterministic ramp
        dt <- min(dt * increase_fac, max_step) simulated K steps ahead,
        mirroring the loop condition so t_end is never overshot."""
        K = cfg.steps_per_dispatch
        if steps_done + K > max_steps:
            return 1, (), ()
        if cfg.checkpoint_every and wdir and any(
                (n_step + i) % cfg.checkpoint_every == 0 for i in range(K)):
            return 1, (), ()
        ts_l, dts_l = [], []
        t_sim, dt_sim = t, dt
        for _ in range(K):
            if not more_steps(t_sim, dt_sim):
                return 1, (), ()
            dt_sim = min(dt_sim * stepper.increase_fac, stepper.maxStep)
            if cfg.exact_t_end:
                dt_sim = min(dt_sim, cfg.t_end - t_sim)
            ts_l.append(t_sim)
            dts_l.append(dt_sim)
            t_sim += dt_sim
        return K, ts_l, dts_l

    steps_done = 0
    profiling = False
    while more_steps(t, dt) and steps_done < max_steps:
        if multi_ok:
            K, ts_l, dts_l = plan_batch(t, dt, n_step, steps_done)
            if K > 1:
                step_keys = []
                for _ in range(K):
                    key, sk = jax.random.split(key)
                    step_keys.append(sk)
                with timings.section("step"):
                    theta, auxs = tdvp.heun_multi(
                        theta, ts_l, dts_l, jnp.stack(step_keys),
                        kind="rk3" if stepper.mode == "RK3" else "heun")
                # state sync deferred to loop exit: set_parameters unravels
                # the flat vector into ~dozens of leaf slices, each a device
                # op -- per-batch that re-creates the dispatch overhead this
                # path amortizes (dist_params comes from the stacked aux)
                pending_nan.append((auxs["nan"].any(), t))
                rec.append_block("times", np.asarray(ts_l))
                rec.append_dict_block({k: v for k, v in auxs.items()
                                       if not isinstance(v, dict)})
                if arec is not None:
                    # one device->host transfer per BATCH, then K records
                    host = {k: np.asarray(v) for k, v in auxs.items()
                            if not isinstance(v, dict)
                            and not k.startswith("_")}
                    for i in range(K):
                        arec_record(n_step + i, ts_l[i],
                                    {k: v[i] for k, v in host.items()})
                t = ts_l[-1] + dts_l[-1]
                dt = stepper.dt = dts_l[-1]
                cadence = max(cfg.nan_check_every, 1)
                if (n_step + K) // cadence != n_step // cadence:
                    check_nan()
                n_step += K
                steps_done += K
                continue
        if adapt_multi_ok:
            K = cfg.steps_per_dispatch
            if steps_done + K > max_steps or (
                    cfg.checkpoint_every and wdir and any(
                        (n_step + i) % cfg.checkpoint_every == 0
                        for i in range(K))):
                K = 1  # per-step fallback at budget/checkpoint boundaries
            if K > 1:
                step_keys = []
                for _ in range(K):
                    key, sk = jax.random.split(key)
                    step_keys.append(sk)
                with timings.section("step"):
                    theta, t_f, dt_sugg_f, dt_prev_f, outs = \
                        tdvp.adaptive_multi(
                            theta, t, stepper.dt, dt,
                            jnp.stack(step_keys), cfg.t_end, t_eps,
                            stepper.tolerance, stepper.maxStep,
                            kind=adapt_kind, exact=cfg.exact_t_end)
                # ONE host sync per batch: how many slots ran (the rest hit
                # t_end inside the program and emitted masked zero rows)
                n_done = int(np.asarray(outs["active"]).sum())
                auxs = outs["aux"]
                if n_done < K:  # slice off masked zero rows (final batch)
                    auxs = {k: v[:n_done] for k, v in auxs.items()}
                    outs["t_at"] = outs["t_at"][:n_done]
                pending_nan.append((auxs["nan"].any(), t))
                rec.append_block("times", outs["t_at"])
                rec.append_dict_block({k: v for k, v in auxs.items()
                                       if not isinstance(v, dict)})
                if arec is not None:
                    host = {k: np.asarray(v) for k, v in auxs.items()
                            if not isinstance(v, dict)
                            and not k.startswith("_")}
                    t_ats = np.asarray(outs["t_at"])
                    for i in range(n_done):
                        arec_record(n_step + i, float(t_ats[i]),
                                    {k: v[i] for k, v in host.items()})
                t = float(t_f)
                dt = float(dt_prev_f)
                stepper.dt = float(dt_sugg_f)
                cadence = max(cfg.nan_check_every, 1)
                if (n_step + n_done) // cadence != n_step // cadence:
                    check_nan()
                n_step += n_done
                steps_done += n_done
                continue
        if cfg.profile_dir:
            # jax.profiler trace over a step window (SURVEY.md section 5.1:
            # the reference has wall-clock sections only, no profiler)
            if steps_done == cfg.profile_steps[0] and not profiling:
                jax.profiler.start_trace(cfg.profile_dir)
                profiling = True
            elif steps_done == cfg.profile_steps[1] and profiling:
                jax.profiler.stop_trace()
                profiling = False
        t0 = time.perf_counter()
        key, step_key = jax.random.split(key)
        with timings.section("step"):
            res = stepper.step(t, f, theta, step_key,
                               normFunction=norm_fn,
                               dt_cap=(cfg.t_end - t if cfg.exact_t_end
                                       else None))
        theta, dt, info = res.y, res.dt_used, res.info
        pending_nan.append((info["nan"], t))
        state.set_parameters(theta)

        rec.append("times", t)
        rec.append_dict({k: v for k, v in info.items()
                         if not isinstance(v, dict)})
        rec.append("dist_params", state.params["latent"]["dist_params"])
        if arec is not None:
            arec_record(n_step, t, info)
            arec.record("dist_params", n_step,
                        state.params["latent"]["dist_params"])

        if cfg.verbose:
            check_nan()
            print(f"t = {t:.4f}, dt = {dt:e}  "
                  f"[{time.perf_counter() - t0:.3f}s]")
            print(f"\t > Solver Residual = {float(info['solver_res']):.3e}")
            print(f"\t > TDVP Error = {float(info['tdvp_error']):.3e}")
            print(f"\t > Entropy = {float(info['entropy']):.6f}")
        elif n_step % max(cfg.nan_check_every, 1) == 0:
            check_nan()

        n = round(t / cfg.plot_every)
        if (grid is not None and abs(t - n * cfg.plot_every) < dt
                and n not in plotted):
            plotted.add(n)
            integral = float(state.integrate(grid))
            rec.append("grid_integral_t", t)
            rec.append("grid_integral", integral)
            if cfg.verbose:
                print("Grid integral:", integral)
            if wdir and is_coordinator():
                # periodic 2D density snapshot (main.py:198-201 parity)
                from .viz.plots import plot_density

                fig = plot_density(state, grid, proj=False)
                fig.savefig(os.path.join(wdir, f"t_{t:.3f}.pdf"))
                import matplotlib.pyplot as plt

                plt.close(fig)

        if (cfg.checkpoint_every and n_step % cfg.checkpoint_every == 0
                and wdir and is_coordinator()):
            # coordinator-only: in a multi-host run every process sees the
            # same theta and would race on the same paths
            from .utils.checkpoint import save_checkpoint
            # theta is the solution at t + dt (the step just completed)
            save_checkpoint(wdir, n_step + 1, t + dt, theta, stepper.dt)

        for cb in callbacks:
            cb(n_step, t, state, info)

        t += dt
        n_step += 1
        steps_done += 1

    if profiling:
        jax.profiler.stop_trace()
    state.set_parameters(theta)  # sync after batched steps (no-op otherwise)
    if arec is not None:
        arec.close()  # flush + join the writer thread (abort paths close
        # via AsyncRecorder.__del__)
    check_nan()
    rec.flush()
    if wdir and is_coordinator():
        store_infos(wdir, rec)
    return state, rec


def main(argv=None):
    import argparse

    from .config import PRESETS, preset

    p = argparse.ArgumentParser(description="TPU-native VMC-PDE solver")
    p.add_argument("mode", choices=sorted(PRESETS), nargs="?", default="mwe")
    p.add_argument("--t-end", type=float, default=None)
    p.add_argument("--samples", type=int, default=None)
    p.add_argument("--workdir", type=str, default=None)
    p.add_argument("--precision", type=str, default=None)
    p.add_argument("--max-steps", type=int, default=10**9)
    p.add_argument("--resume", action="store_true",
                   help="resume from the workdir's latest checkpoint")
    p.add_argument("--checkpoint-every", type=int, default=0)
    p.add_argument("--init-params", type=str, default=None,
                   help="start the evolution from stored parameters: a "
                        "pretrain orbax checkpoint dir (pretrain/train.py) "
                        "or an evolution npz checkpoint; the flow "
                        "architecture must match")
    p.add_argument("--async-recorder", action="store_true",
                   help="also stream per-step metrics through the native "
                        "C++ async recorder into <workdir>/metrics.bin")
    p.add_argument("--aot-dir", type=str, default=None,
                   help="AOT executable cache directory: fused stepper "
                        "executables persist here and fresh processes "
                        "load them (~1 s) instead of recompiling")
    p.add_argument("--solver", type=str, default=None,
                   choices=["auto", "eigh", "cholesky", "cg", "minsr"],
                   help="linear-solver strategy (TDVPConfig.solver_method)")
    p.add_argument("--gram-precision", type=str, default=None,
                   choices=["highest", "high", "default", "f64", "f64acc"],
                   help="MXU pass count for Gram/statistics matmuls "
                        "('f64': true-float64 contraction of the f32 "
                        "gradients -- reference-grade residuals on TPU; "
                        "pair with --precision tpu_f64stats)")
    p.add_argument("--gram-backend", type=str, default=None,
                   choices=["auto", "xla", "syrk", "sym2", "tri2"],
                   help="Gram contraction backend (syrk = triangle-only "
                        "Pallas kernel, kernels/syrk.py; sym2 = 2-pass "
                        "symmetric hi/lo split, any mesh, chunk-safe; "
                        "tri2 = triangle-blocked sym2, single-device, "
                        "~1.56 passes)")
    p.add_argument("--gram-cross", type=str, default=None,
                   choices=["auto", "bf16", "int8"],
                   help="MXU engine for the sym2/tri2 cross pass (int8 = "
                        "per-column-quantized int8 matmul at 2x the bf16 "
                        "rate; error below the split's dropped lo@lo term)")
    p.add_argument("--stats-partitioning", type=str, default=None,
                   choices=["auto", "gspmd", "shard_map"],
                   help="mesh statistics partitioning ('auto' = shard_map "
                        "on dp-only meshes: per-shard fast Gram stack, "
                        "one psum of the assembled moments per RHS)")
    p.add_argument("--per-sample-backend", type=str, default=None,
                   choices=["auto", "xla", "pallas"],
                   help="per-sample pipeline backend (pallas = fused "
                        "forward+backward+Hessian-trace TPU kernel, "
                        "kernels/persample.py)")
    p.add_argument("--hessian-mode", type=str, default=None,
                   choices=["auto", "trace", "block"],
                   help="per-sample Hessian strategy: forward-over-forward "
                        "trace (score.quad_trace) vs the (k, k) block")
    p.add_argument("--chunk-size", type=int, default=None,
                   help=">0: stream samples through the stats in chunks")
    p.add_argument("--host-solve", action="store_true",
                   help="solve the regularized system on host in numpy f64 "
                        "(the reference's default path, tdvp.py:60-64)")
    p.add_argument("--is-gamma", type=float, default=None,
                   help="<1: tail-tempered importance sampling of the TDVP "
                        "statistics (Student_t latent; TDVPConfig.is_gamma)")
    p.add_argument("--qmc", action="store_true",
                   help="randomized-QMC (scrambled Sobol) exact-latent "
                        "sampling: lower estimator noise at the same "
                        "sample budget (sampling/qmc.py)")
    p.add_argument("--stepper", type=str, default=None,
                   choices=["fixed_heun", "fixed_euler", "fixed_rk3", "adaptive_heun", "adaptive_rk23"])
    p.add_argument("--exact-t-end", action="store_true",
                   help="clamp the final dt to land exactly on t_end "
                        "(the reference loop overshoots by up to one dt, "
                        "quirk Q11)")
    p.add_argument("--steps-per-dispatch", type=int, default=None,
                   help=">1: batch that many steps into one device "
                        "dispatch (fixed steppers: lax.scan; adaptive "
                        "steppers: on-device attempt/dt-controller loop; "
                        "disables per-step verbose logging)")
    p.add_argument("--mesh-dp", type=int, default=None,
                   help="sample-parallel mesh size (-1 = all devices)")
    p.add_argument("--mesh-tp", type=int, default=None,
                   help="parameter-parallel mesh size for the Gram result")
    p.add_argument("--profile-dir", type=str, default=None,
                   help="capture a jax.profiler trace into this directory")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--distributed", action="store_true",
                   help="multi-host run: initialize jax.distributed before "
                        "building the mesh (replaces the reference's MPI "
                        "rank discovery, mpi_wrapper.py:9-11)")
    p.add_argument("--coordinator", type=str, default=None,
                   help="coordinator address host:port (with --distributed; "
                        "omit to auto-detect from the cluster environment)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    args = p.parse_args(argv)

    if args.distributed:
        from .parallel.mesh import distributed_init

        kw = {}
        if args.coordinator is not None:
            kw["coordinator_address"] = args.coordinator
        if args.num_processes is not None:
            kw["num_processes"] = args.num_processes
        if args.process_id is not None:
            kw["process_id"] = args.process_id
        distributed_init(**kw)

    overrides = {}
    if args.t_end is not None:
        overrides["t_end"] = args.t_end
    if args.samples is not None:
        overrides["n_samples_tdvp"] = args.samples
        overrides["n_samples_obs"] = args.samples
    if args.workdir is not None:
        overrides["workdir"] = args.workdir
    if args.precision is not None:
        overrides["precision"] = args.precision
    if args.resume:
        overrides["resume"] = True
    if args.checkpoint_every:
        overrides["checkpoint_every"] = args.checkpoint_every
    if args.init_params is not None:
        overrides["init_params"] = args.init_params
    if args.async_recorder:
        overrides["async_recorder"] = True
    if args.aot_dir is not None:
        overrides["aot_dir"] = args.aot_dir
    if args.solver is not None:
        overrides["solver_method"] = args.solver
    if args.gram_precision is not None:
        overrides["gram_precision"] = args.gram_precision
    if args.gram_backend is not None:
        overrides["gram_backend"] = args.gram_backend
    if args.gram_cross is not None:
        overrides["gram_cross"] = args.gram_cross
    if args.stats_partitioning is not None:
        overrides["stats_partitioning"] = args.stats_partitioning
    if args.per_sample_backend is not None:
        overrides["per_sample_backend"] = args.per_sample_backend
    if args.hessian_mode is not None:
        overrides["hessian_mode"] = args.hessian_mode
    if args.chunk_size is not None:
        overrides["chunk_size"] = args.chunk_size
    if args.host_solve:
        overrides["solve_on_device"] = False
    if args.is_gamma is not None:
        overrides["is_gamma"] = args.is_gamma
    if args.qmc:
        overrides["qmc"] = True
    if args.stepper is not None:
        overrides["stepper"] = args.stepper
    if args.exact_t_end:
        overrides["exact_t_end"] = True
    if args.steps_per_dispatch is not None:
        overrides["steps_per_dispatch"] = args.steps_per_dispatch
        if args.steps_per_dispatch > 1:
            overrides["verbose"] = False
    if args.mesh_dp is not None:
        overrides["mesh_dp"] = args.mesh_dp
    if args.mesh_tp is not None:
        overrides["mesh_tp"] = args.mesh_tp
    if args.profile_dir is not None:
        overrides["profile_dir"] = args.profile_dir
    if args.seed is not None:
        overrides["seed"] = args.seed
        overrides["sample_seed"] = args.seed

    cfg = preset(args.mode, **overrides)
    run(cfg, max_steps=args.max_steps)


if __name__ == "__main__":
    main()

"""SDE oracle validation and the end-to-end 'mwe' workload: 2D Gaussian
diffusion evolved by the full TDVP pipeline, checked against closed forms
(covariance 1 + 2Dt, entropy d/2 log(2 pi e (1+2Dt)) -- visualization.py:188)
and against the SDE oracle. This is the reference's Colab MWE (SURVEY.md
section 7, minimum end-to-end slice)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vmc_pde_tpu.config import preset
from vmc_pde_tpu.driver import build_problem, run
from vmc_pde_tpu.oracle import sde
from vmc_pde_tpu.viz.plots import gauss_diffusion_entropy


def test_oracle_diffusion_covariance_growth():
    """Pure diffusion: Cov(t) = (1 + 2 D t) I."""
    n, dim = 20000, 2
    coords = jax.random.normal(jax.random.PRNGKey(0), (n, dim))
    coords, infos = sde.evolve(
        coords, 0.0, 1e-2, 100, drift_name="diffusion", params={"D": 1.0},
        key=jax.random.PRNGKey(1),
    )
    t_final = float(infos["times"][-1]) + 1e-2
    cov = np.cov(np.asarray(coords).T, ddof=0)
    np.testing.assert_allclose(cov, (1 + 2 * t_final) * np.eye(dim),
                               atol=0.12)


def test_oracle_phase_space_stationary_variance():
    """Damped harmonic phase space reaches Var ~ T (temperature) in both
    coordinates at long times (exact_dyn.py's 'Wiener' baseline behavior)."""
    n, dim, T = 20000, 2, 4.0
    coords = jax.random.normal(jax.random.PRNGKey(0), (n, dim))
    coords, infos = sde.evolve(
        coords, 0.0, 1e-2, 1500, drift_name="phase_space",
        params={"m": 1.0, "omega": 1.0, "gamma": 1.0, "T": T, "lam": 0.0},
        key=jax.random.PRNGKey(1),
    )
    var = np.var(np.asarray(coords), axis=0)
    np.testing.assert_allclose(var, [T, T], rtol=0.12)


@pytest.mark.slow
def test_e2e_mwe_short():
    """Short 'mwe' run: after ~40 steps with dt ramping 1e-3 -> 1e-2, the
    model covariance must track 1 + 2t and entropy the analytic curve."""
    cfg = preset(
        "mwe",
        n_samples_tdvp=4096,
        n_samples_obs=4096,
        dt0=1e-3,
        t_end=0.30,
        precision="f64",
        verbose=False,
        grid_points=100,
    )
    state, rec = run(cfg)
    infos = rec.as_arrays()
    t = infos["times"] + np.diff(infos["times"], append=infos["times"][-1]).mean()
    # covariance diagonal tracks 1 + 2 t
    cov = infos["covar"][-1]
    t_final = infos["times"][-1]
    np.testing.assert_allclose(
        np.diag(cov), (1 + 2 * t_final) * np.ones(2), rtol=0.08
    )
    # entropy tracks the analytic Gaussian-diffusion curve
    S_exact = gauss_diffusion_entropy(infos["times"], dim=2)
    err = np.abs(infos["entropy"] - S_exact)
    assert err.max() < 0.06, err.max()
    # solver residual stays tiny (reference: median 2.9e-12, BASELINE.md)
    assert np.median(infos["solver_res"]) < 1e-8
    # grid normalization stays ~1 (main.py:193-196)
    if "grid_integral" in infos:
        np.testing.assert_allclose(infos["grid_integral"], 1.0, atol=0.03)


def test_build_problem_all_presets():
    """Every preset wires up (no run)."""
    from vmc_pde_tpu.config import PRESETS

    for name in PRESETS:
        cfg = preset(name, n_samples_tdvp=64, n_samples_obs=64,
                     precision="f64", verbose=False)
        state, tdvp, stepper, eq, grid = build_problem(cfg)
        assert state.numParameters > 0


def test_fokker_planck32_preset_wiring():
    """BASELINE config 4 as a first-class workload: the fokkerPlanck32
    preset builds the d=32 interacting (coupled-chain) OU Fokker-Planck
    at the bench.py north-star shape, and one RHS evaluates finite at a
    reduced width."""
    from vmc_pde_tpu.config import preset

    cfg = preset("fokkerPlanck32")
    assert cfg.dim == 32 and cfg.equation == "advection_hamiltonian_wDiss"
    state, tdvp, stepper, eq, grid = build_problem(cfg)
    assert eq.coupled and eq.T == 10.0
    assert state.numParameters == 9264  # the headline P (bench.py shape)

    # runnable slice: same preset, narrow net + tiny batch on CPU f64
    cfg = preset("fokkerPlanck32", depth=1, hidden=(4,),
                 n_samples_tdvp=256, n_samples_obs=256,
                 precision="f64", verbose=False)
    state, tdvp, stepper, eq, grid = build_problem(cfg)
    theta = jnp.asarray(state.get_parameters(), tdvp.precision.compute)
    u, aux = tdvp.rhs(theta, 0.0, jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(u)).all()
    assert float(aux["solver_res"]) < 1e-6


def test_checkpoint_roundtrip(tmp_path):
    from vmc_pde_tpu.utils.checkpoint import (latest_checkpoint,
                                              load_checkpoint,
                                              save_checkpoint)

    theta = np.linspace(0, 1, 37)
    p = save_checkpoint(str(tmp_path), 5, 0.25, theta, 1e-3)
    ck = load_checkpoint(p)
    assert ck["step"] == 5 and ck["t"] == 0.25 and ck["dt"] == 1e-3
    np.testing.assert_array_equal(ck["theta"], theta)
    assert latest_checkpoint(str(tmp_path))["step"] == 5


def test_infos_hdf5_roundtrip(tmp_path):
    from vmc_pde_tpu.utils.infos import InfoRecorder, load_infos, store_infos

    rec = InfoRecorder()
    for i in range(3):
        rec.append("times", 0.1 * i)
        rec.append("entropy", 1.0 + i)
        rec.append("ev", np.linspace(0, 1, 5))
    path = store_infos(str(tmp_path), rec)
    back = load_infos(path)
    np.testing.assert_allclose(back["times"], [0.0, 0.1, 0.2])
    assert back["ev"].shape == (3, 5)


def test_pretrain_decreases_loss(ctx1):
    from vmc_pde_tpu.models.flow import build_flow
    from vmc_pde_tpu.models.state import VarState
    from vmc_pde_tpu.pretrain.train import gen_data, train
    from vmc_pde_tpu.utils.dtypes import Precision

    prec = Precision.f64_everywhere()
    fl, params = build_flow(0, dim=2, depth=2, dtype=jnp.float64)
    st = VarState(fl, params, ctx=ctx1, precision=prec)
    data, target = gen_data((2000, 2), mode="standard_normal", std=1.4)
    losses = train(st, data, batchsize=200, epochs=8, lr=3e-3)
    assert losses[-1] < losses[0]


def test_pretrain_periodic_grid_check(tmp_path, ctx1):
    """Reference train.py:52-58 parity: every check_every epochs the grid
    integral is recorded (and plots saved when workdir is set)."""
    import os

    from vmc_pde_tpu.models.flow import build_flow
    from vmc_pde_tpu.models.state import VarState
    from vmc_pde_tpu.pretrain.train import gen_data, train
    from vmc_pde_tpu.utils.dtypes import Precision
    from vmc_pde_tpu.utils.grid import Grid

    prec = Precision.f64_everywhere()
    fl, params = build_flow(0, dim=2, depth=2, dtype=jnp.float64)
    st = VarState(fl, params, ctx=ctx1, precision=prec)
    data, target = gen_data((1000, 2), mode="standard_normal")
    grid = Grid(np.ones(2) * 8.0, 60)

    def target_np(coords):
        return np.asarray(target(jnp.asarray(coords)))

    train(st, data, batchsize=200, epochs=4, lr=3e-3,
          grid=grid, check_every=2, workdir=str(tmp_path),
          target_fun=target_np)
    checks = st.pretrain_grid_integrals
    assert [e for e, _ in checks] == [2, 4]
    # a freshly-initialized near-identity flow is ~normalized already
    for _, integral in checks:
        assert abs(integral - 1.0) < 0.2
    assert os.path.exists(tmp_path / "fit_epoch2.pdf")
    assert os.path.exists(tmp_path / "fit_diff_epoch4.pdf")


def test_driver_checkpoint_resume(tmp_path):
    """A checkpointed run resumes from where it stopped (params, t, dt)."""
    from vmc_pde_tpu.utils.checkpoint import latest_checkpoint

    cfg = preset(
        "mwe", n_samples_tdvp=256, n_samples_obs=256, dt0=1e-3,
        t_end=1.0, precision="f64", verbose=False, grid_points=50,
        workdir=str(tmp_path), checkpoint_every=2,
    )
    state1, rec1 = run(cfg, max_steps=6)
    ck = latest_checkpoint(str(tmp_path))
    assert ck is not None and ck["step"] >= 4

    import dataclasses

    cfg2 = dataclasses.replace(cfg, resume=True)
    state2, rec2 = run(cfg2, max_steps=3)
    infos2 = rec2.as_arrays()
    # resumed run starts at the checkpointed time, not t=0
    assert infos2["times"][0] >= ck["t"] - 1e-12


@pytest.mark.slow
def test_e2e_harmonic_oscillator_rotation():
    """Liouville transport under the harmonic flow: the distribution mean
    follows the classical trajectory x(t) = cos(t) x0 + sin(t) p0,
    p(t) = -sin(t) x0 + cos(t) p0 (here (x0,p0) = (1,1))."""
    cfg = preset(
        "harmonicOsc",
        n_samples_tdvp=4096,
        n_samples_obs=4096,
        dt0=1e-3,
        t_end=0.25,
        precision="f64",
        verbose=False,
        grid_points=60,
    )
    state, rec = run(cfg)
    infos = rec.as_arrays()
    t = infos["times"][-1]
    mean = infos["x1"][-1]
    expected = np.array([np.cos(t) + np.sin(t), np.cos(t) - np.sin(t)])
    np.testing.assert_allclose(mean, expected, atol=0.06)
    # volume-preserving flow: entropy is conserved
    assert abs(infos["entropy"][-1] - infos["entropy"][0]) < 0.05


@pytest.mark.slow
def test_e2e_adaptive_stepper_mwe():
    """AdaptiveHeun with the S-metric norm (main.py:24-26) drives the mwe
    workload: dt adapts and the physics stays on the analytic curve."""
    cfg = preset(
        "mwe", n_samples_tdvp=2048, n_samples_obs=2048,
        stepper="adaptive_heun", dt0=1e-4, tol=1e-2, max_step=5e-2,
        t_end=0.15, precision="f64", verbose=False, grid_points=50,
    )
    state, rec = run(cfg, max_steps=60)
    infos = rec.as_arrays()
    t_final = infos["times"][-1]
    assert t_final > 0.05  # dt grew beyond the initial 1e-4
    S_exact = gauss_diffusion_entropy(infos["times"], dim=2)
    assert np.abs(infos["entropy"] - S_exact).max() < 0.08


def test_driver_cli_solver_flags(tmp_path, capsys):
    """`driver <mode> --solver cg` and friends are reachable from the CLI
    (round-1 verdict: the cholesky/cg machinery was library-only)."""
    from vmc_pde_tpu.driver import main

    main(["mwe", "--samples", "512", "--max-steps", "3", "--t-end", "1.0",
          "--precision", "f64", "--solver", "cg", "--gram-precision",
          "highest", "--workdir", str(tmp_path), "--seed", "3"])
    out = capsys.readouterr().out
    assert "Solver Residual" in out
    import h5py

    with h5py.File(tmp_path / "infos.hdf5") as f:
        assert "solver_res" in f and "lambda_max" in f
        assert "SExp" not in f


def test_adaptive_stepper_large_p_solvers():
    """Round-3 item: adaptive stepping works with the SExp-free solver
    strategies via the matrix-free S-metric (TDVP._sexp_quad). The driver's
    old adaptive+cg/minsr rejection is lifted; dt must actually adapt and
    the physics stay on the analytic entropy curve."""
    from vmc_pde_tpu.config import preset
    from vmc_pde_tpu.driver import build_problem, run

    for solver in ("cg", "minsr"):
        cfg = preset(
            "mwe", stepper="adaptive_heun", solver_method=solver,
            n_samples_tdvp=1024, n_samples_obs=1024, dt0=1e-4, tol=1e-2,
            max_step=5e-2, t_end=0.1, precision="f64", verbose=False,
            grid_points=40,
        )
        _, tdvp, stepper, _, _ = build_problem(cfg)
        assert tdvp._sexp_matfree and not tdvp.cfg.compute_sexp
        state, rec = run(cfg, max_steps=40)
        infos = rec.as_arrays()
        assert infos["times"][-1] > 0.03, solver  # dt grew past 1e-4
        S_exact = gauss_diffusion_entropy(infos["times"], dim=2)
        assert np.abs(infos["entropy"] - S_exact).max() < 0.08, solver


def test_pretrain_checkpoint_resume(tmp_path, ctx1):
    """Pretraining persists {params, opt_state, epoch} via orbax and a
    resumed run continues from the checkpointed epoch with identical
    shuffling (epoch-indexed keys)."""
    import jax

    from vmc_pde_tpu.models.state import make_var_state
    from vmc_pde_tpu.pretrain.train import gen_data, train
    from vmc_pde_tpu.utils.dtypes import Precision

    prec = Precision.f64_everywhere()
    data, _ = gen_data((2000, 2))
    data = data.astype(prec.compute)

    def fresh():
        return make_var_state(1, 2, depth=2, ctx=ctx1, precision=prec)

    # one uninterrupted 6-epoch run
    s_full = fresh()
    losses_full = train(s_full, data, epochs=6, batchsize=200)

    # 3 epochs + checkpoint, then resume to 6
    s_a = fresh()
    train(s_a, data, epochs=3, batchsize=200,
          workdir=str(tmp_path), checkpoint_every=1)
    s_b = fresh()
    losses_b = train(s_b, data, epochs=6, batchsize=200,
                     workdir=str(tmp_path), checkpoint_every=1, resume=True)
    assert len(losses_b) == 3  # epochs 3..5 only
    np.testing.assert_allclose(losses_b[-1], losses_full[-1], rtol=1e-8)
    fa, _ = jax.flatten_util.ravel_pytree(s_full.params)
    fb, _ = jax.flatten_util.ravel_pytree(s_b.params)
    np.testing.assert_allclose(np.asarray(fb), np.asarray(fa), rtol=1e-10)


def test_radial_grid_oracle_gaussian_entropy():
    """The deterministic radial finite-volume diffusion oracle
    (oracle/radial.py -- the grid-based validation mode of
    paper_plot_diffusion.py:13-29, whose solver the reference does not
    ship) must track the analytic Gaussian entropy d/2 log(2 pi e (1+2t))
    and conserve mass on a shell-conservative scheme."""
    import math
    from functools import partial

    from vmc_pde_tpu.oracle import radial

    out = radial.evolve_radial(partial(radial.gauss_radial, d=8), d=8,
                               r_max=30.0, n_r=1200, t_end=0.5, n_record=10)
    t, S, m, v = out["times"], out["entropy"], out["mass"], out["var"]
    S_ref = 4 * np.log(2 * math.pi * math.e * (1 + 2 * t))
    assert np.abs(S - S_ref).max() < 5e-3
    assert np.abs(m - m[0]).max() < 1e-10           # conservative scheme
    np.testing.assert_allclose(v, 1 + 2 * t, atol=2e-3)


def test_radial_grid_oracle_student_t_init():
    """Graded grid (uniform core + geometric tail): the heavy-tailed
    nu=2 Student-t entropy needs domains of hundreds of units
    (-f log f ~ r^{-3} log r in d=8); the t=0 grid entropy must match the
    digamma closed form."""
    from functools import partial

    from vmc_pde_tpu.oracle import radial

    faces = radial.radial_faces(1000.0, dr0=0.04, r_core=10.0, growth=1.03)
    out = radial.evolve_radial(
        partial(radial.student_t_radial, nu=2.0, d=8), d=8,
        t_end=1e-4, n_record=1, faces=faces)
    np.testing.assert_allclose(out["entropy"][0],
                               radial.student_t_entropy(2.0, 8), atol=5e-3)
    np.testing.assert_allclose(out["mass"][0], 1.0, atol=1e-3)


@pytest.mark.slow
def test_e2e_anisotropic_covariance_flow():
    """diffusion_anisotropic through the JITTED solver (regression: the
    random SPD D was drawn with jax.random inside eloc and np.asarray'd,
    which crashes under any trace -- no CI path ever stepped this
    equation before). The Gaussian stays Gaussian with the closed form
    Sigma(t) = I + 2 D t (full matrix)."""
    from vmc_pde_tpu.config import preset
    from vmc_pde_tpu.driver import run
    from vmc_pde_tpu.ops.evolution import DiffusionAnisotropic

    cfg = preset("diffusion_anisotropic", n_samples_tdvp=4096,
                 n_samples_obs=4096, dt0=1e-3, max_step=1e-3, t_end=0.03,
                 precision="f64", verbose=False, steps_per_dispatch=8)
    state, rec = run(cfg, max_steps=30)
    infos = rec.as_arrays()
    D = np.asarray(DiffusionAnisotropic(dim=12, seed=0).D_matrix)
    t = infos["times"][-1]
    exact = np.eye(12) + 2.0 * D * t
    cov = np.asarray(infos["covar"][-1])
    err = np.abs(cov - exact).max() / np.abs(exact).max()
    assert err < 0.08, err
    assert np.median(infos["solver_res"]) < 1e-6


def test_adaptive_host_solve_matfree_norm():
    """The per-call adaptive path with the HOST eigensolve exercises the
    driver's norm_fn fallback: no attempt_fn (host solve disables fusion),
    no dense SExp (matfree), so the S-metric comes from TDVP.sexp_norm."""
    from vmc_pde_tpu.config import preset
    from vmc_pde_tpu.driver import build_problem, run

    cfg = preset(
        "mwe", stepper="adaptive_heun", solver_method="cholesky",
        solve_on_device=False, n_samples_tdvp=512, n_samples_obs=512,
        dt0=1e-4, tol=1e-2, max_step=2e-2, t_end=0.02, precision="f64",
        verbose=False, grid_points=30,
    )
    _, tdvp, stepper, _, _ = build_problem(cfg)
    assert stepper.attempt_fn is None  # host solve -> per-call path
    assert tdvp._sexp_matfree
    state, rec = run(cfg, max_steps=15)
    infos = rec.as_arrays()
    assert np.isfinite(infos["entropy"]).all()
    assert infos["times"][-1] > 5e-4  # dt accepted and grew


def test_exact_t_end_lands_on_t_end():
    """exact_t_end=True clamps the final dt so the state IS at t_end.

    The reference's loop `while t < t_end + dt` (main.py:159) overshoots
    t_end by up to a full dt (quirk Q11): with dt=4e-3 and t_end=0.019 it
    integrates to t=0.024.  The clamped run must stop the step sequence at
    0.016 + 3e-3 = 0.019 and its second moment must match 1 + 2*t_end
    (closed form) rather than 1 + 2*(t_end + overshoot)."""
    from vmc_pde_tpu.utils.grid import Grid

    kw = dict(n_samples_tdvp=512, n_samples_obs=512, dt0=4e-3, max_step=4e-3,
              t_end=0.019, precision="f64", verbose=False, grid_points=30)
    cfg_ref = preset("mwe", **kw)
    cfg_exact = preset("mwe", exact_t_end=True, **kw)

    state_r, rec_r = run(cfg_ref)
    state_e, rec_e = run(cfg_exact)
    times_r = rec_r.as_arrays()["times"]
    times_e = rec_e.as_arrays()["times"]
    # reference semantics: steps START at 0, 4e-3, ..., 0.020 (final state
    # at 0.024); exact: last step starts at 0.016 with dt clamped to 3e-3
    assert times_r[-1] >= 0.019  # overshoot: a step STARTING past t_end
    np.testing.assert_allclose(times_e[-1], 0.016, atol=1e-12)
    assert times_e.shape[0] == 5

    # quadrature second moment of the final density: Var = 1 + 2 t
    grid = Grid(np.ones(2) * 8.0, 161, sym=True)
    coords = jnp.asarray(grid.coords, state_e.precision.compute)
    p = np.exp(np.asarray(state_e(coords, "eval")))
    var = float(np.sum(np.sum(grid.coords**2, axis=1) * p)
                * grid.bin_area) / 2.0
    np.testing.assert_allclose(var, 1.0 + 2 * 0.019, atol=2e-4)
    # and the un-clamped run sits at 1 + 2 * (its actual final time)
    p_r = np.exp(np.asarray(state_r(coords, "eval")))
    var_r = float(np.sum(np.sum(grid.coords**2, axis=1) * p_r)
                  * grid.bin_area) / 2.0
    assert var_r > 1.0 + 2 * 0.022  # visibly past t_end


def test_exact_t_end_batched_matches_perstep():
    """steps_per_dispatch > 1 with exact_t_end: the batch planner clamps
    the simulated ramp exactly like the per-step path (bit-identical).
    dim=4 (no 2-D grid) so the batched branch actually engages."""
    from vmc_pde_tpu.config import RunConfig

    def _cfg(**kw):
        base = dict(
            name="exact_t_end_test", dim=4, offset=(0.0,) * 4,
            latent_name="Gauss", equation="diffusion", variant="scale",
            dt0=2e-3, max_step=2e-3, increase_fac=1.3, t_end=0.011,
            n_samples_tdvp=256, n_samples_obs=256, seed=3, sample_seed=3,
            precision="f64", exact_t_end=True, workdir=None, verbose=False,
        )
        base.update(kw)
        return RunConfig(**base)

    s1, r1 = run(_cfg(steps_per_dispatch=1))
    s2, r2 = run(_cfg(steps_per_dispatch=3))
    a1, a2 = r1.as_arrays(), r2.as_arrays()
    # 6 steps: 5 * 2e-3 + clamped 1e-3 == 0.011 exactly
    np.testing.assert_allclose(a1["times"][-1], 0.010, atol=1e-12)
    np.testing.assert_array_equal(a1["times"], a2["times"])
    # same ramp plan and RNG stream; trajectories agree to float-codegen
    # noise (XLA compiles the scan body and the standalone pair program
    # with different fusions at some shapes -- observed ~1e-14 relative
    # on this config, unrelated to the exact_t_end clamp)
    np.testing.assert_allclose(a1["entropy"], a2["entropy"], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(s1.get_parameters()),
                               np.asarray(s2.get_parameters()),
                               rtol=1e-6, atol=1e-8)


@pytest.mark.slow
def test_northstar_l2_small():
    """North-star #1 (BASELINE.md): L2 density error vs the closed form
    N(0, (1+2t) I) <= 1e-5 -- held even at a small budget (N=1024, 10 Heun
    steps) because the error floor is the 1e-5-scale init representation
    error, not MC noise (results/northstar_l2.txt; the full reference-
    condition run measures 1.12e-6)."""
    from vmc_pde_tpu.utils.grid import Grid

    t_end = 0.06
    cfg = preset(
        "mwe", n_samples_tdvp=1024, n_samples_obs=1024, dt0=6e-3,
        max_step=6e-3, t_end=t_end, precision="f64", exact_t_end=True,
        verbose=False, grid_points=30,
    )
    state, _ = run(cfg)
    grid = Grid(np.ones(2) * 10.0, 201, sym=True)
    coords = jnp.asarray(grid.coords, state.precision.compute)
    p = np.exp(np.asarray(state(coords, "eval")))
    s2 = 1.0 + 2.0 * t_end
    q = np.sum(grid.coords**2, axis=1) / s2
    p_exact = np.exp(-0.5 * q) / (2.0 * np.pi * s2)
    l2 = float(np.sqrt(np.sum((p - p_exact) ** 2) * grid.bin_area))
    assert l2 <= 1e-5, l2


def test_exact_t_end_adaptive():
    """exact_t_end with the adaptive stepper: the attempted dt is capped
    by the remaining time, so the run lands ON t_end (the second moment
    matches 1 + 2 t_end, not 1 + 2 (t_end + overshoot))."""
    from vmc_pde_tpu.utils.grid import Grid

    t_end = 0.03
    cfg = preset(
        "mwe", stepper="adaptive_heun", n_samples_tdvp=512,
        n_samples_obs=512, dt0=2e-3, tol=1e-2, max_step=8e-3, t_end=t_end,
        precision="f64", exact_t_end=True, verbose=False, grid_points=30,
    )
    state, rec = run(cfg)
    times = rec.as_arrays()["times"]
    assert times[-1] < t_end  # every step STARTS before t_end
    grid = Grid(np.ones(2) * 8.0, 161, sym=True)
    coords = jnp.asarray(grid.coords, state.precision.compute)
    p = np.exp(np.asarray(state(coords, "eval")))
    var = float(np.sum(np.sum(grid.coords**2, axis=1) * p)
                * grid.bin_area) / 2.0
    np.testing.assert_allclose(var, 1.0 + 2 * t_end, atol=3e-4)


@pytest.mark.slow
def test_e2e_ou_fokker_planck_adaptive_2d():
    """BASELINE config 2: 2-D phase-space OU Fokker-Planck (harmonic
    drift) with the ADAPTIVE Heun stepper. The SDE is linear, so the true
    mean/covariance obey closed ODEs (dm/dt = A m, the Lyapunov equation
    dC/dt = A C + C A^T + B with A = [[0,1],[-1,-gamma]],
    B = diag(0, 2 gamma T)); RK4-integrate them in numpy as ground truth
    and compare the recorded observables at the final recorded time."""
    cfg = preset(
        "harmonicOsc_diff", dim=2, offset=(1.0, 1.0),
        stepper="adaptive_heun", n_samples_tdvp=8192, n_samples_obs=8192,
        dt0=1e-4, tol=1e-2, max_step=5e-3, t_end=0.25,
        precision="f64", verbose=False, grid_points=40,
    )
    state, rec = run(cfg)
    infos = rec.as_arrays()
    t_rec = float(infos["times"][-1])

    gamma, T = 1.0, 10.0
    A = np.array([[0.0, 1.0], [-1.0, -gamma]])
    B = np.diag([0.0, 2.0 * gamma * T])
    m = np.array([1.0, 1.0])
    C = np.eye(2)

    def rhs(m, C):
        return A @ m, A @ C + C @ A.T + B

    n, h = 2000, t_rec / 2000
    for _ in range(n):
        k1m, k1C = rhs(m, C)
        k2m, k2C = rhs(m + h / 2 * k1m, C + h / 2 * k1C)
        k3m, k3C = rhs(m + h / 2 * k2m, C + h / 2 * k2C)
        k4m, k4C = rhs(m + h * k3m, C + h * k3C)
        m = m + h / 6 * (k1m + 2 * k2m + 2 * k3m + k4m)
        C = C + h / 6 * (k1C + 2 * k2C + 2 * k3C + k4C)

    np.testing.assert_allclose(np.asarray(infos["x1"][-1]), m, atol=0.06)
    np.testing.assert_allclose(np.asarray(infos["covar"][-1]), C,
                               rtol=0.08, atol=0.08)
    # adaptive: dt actually grew from dt0 toward max_step
    dts = np.diff(infos["times"])
    assert dts[-1] > 10 * 1e-4, dts[-5:]


@pytest.mark.slow
def test_e2e_coupled_fokker_planck_interacting():
    """BASELINE config 4's 'interacting': the coupled chain potential
    sum_i (x_i - x_{i-1})^2 (coupled=True) on a 4-D phase space, validated
    against the SDE oracle. Coupling is the discriminator: the x1-x2
    cross-covariance develops away from 0, which the uncoupled equation
    cannot produce."""
    dt, n_steps = 2e-3, 150
    cfg = preset(
        "harmonicOsc_diff", dim=4, offset=(1.0, 0.0, -1.0, 0.0),
        equation_params={"coupled": True, "T": 5.0},
        n_samples_tdvp=8192, n_samples_obs=8192,
        dt0=dt, max_step=dt, t_end=dt * n_steps,
        precision="f64", verbose=False,
    )
    state, rec = run(cfg, max_steps=n_steps)
    infos = rec.as_arrays()

    key = jax.random.PRNGKey(11)
    cloud = jax.random.normal(key, (40000, 4), dtype=jnp.float64) \
        + jnp.asarray([1.0, 0.0, -1.0, 0.0])
    _, oinfos = sde.evolve(
        cloud, 0.0, dt, n_steps + 1, drift_name="phase_space",
        params={"m": 1.0, "omega": 1.0, "gamma": 1.0, "T": 5.0,
                "coupled": True},
        key=jax.random.PRNGKey(12),
    )
    o_cov = np.asarray(oinfos["covar"])
    o_x1 = np.asarray(oinfos["x1"])
    m_cov = np.asarray(infos["covar"])
    m_x1 = np.asarray(infos["x1"])

    i = n_steps - 1
    np.testing.assert_allclose(m_x1[i], o_x1[i], atol=0.06)
    np.testing.assert_allclose(np.diag(m_cov[i]), np.diag(o_cov[i]),
                               rtol=0.10)
    # the coupling discriminator: x1-x2 cross-covariance (indices 0, 2)
    # reaches ~0.149 at t=0.3 (the uncoupled equation keeps it at 0,
    # MC-noise ~0.011 at this budget)
    assert abs(o_cov[i][0, 2]) > 0.10, o_cov[i][0, 2]
    np.testing.assert_allclose(m_cov[i][0, 2], o_cov[i][0, 2], atol=0.05)


@pytest.mark.slow
def test_e2e_rk3_third_order_density_error():
    """stepper='fixed_rk3' on the full TDVP pipeline: with the identity
    init (init_scale=0 -- no representation floor) and exact_t_end (no
    Q11 overshoot), the L2 density error vs the closed form converges at
    THIRD order (measured 2.85e-8 / 3.53e-9 / 4.39e-10 at dt = 16/8/4
    e-3, ratios 8.07/8.03; results/northstar_l2.txt methodology) -- and
    at dt=1.6e-2 already matches fixed-Heun at dt=2e-3: ~5x fewer RHS
    evaluations at equal accuracy."""
    from vmc_pde_tpu.utils.grid import Grid

    t_end = 0.08
    grid = Grid(np.ones(2) * 10.0, 201, sym=True)
    s2 = 1.0 + 2.0 * t_end
    q = np.sum(grid.coords**2, axis=1) / s2
    p_exact = np.exp(-0.5 * q) / (2.0 * np.pi * s2)

    errs = []
    for dt in (1.6e-2, 8e-3):
        cfg = preset(
            "mwe", stepper="fixed_rk3", n_samples_tdvp=2000,
            n_samples_obs=2000, dt0=dt, max_step=dt, t_end=t_end,
            init_scale=0.0, exact_t_end=True, precision="f64",
            verbose=False, grid_points=30,
        )
        state, _ = run(cfg)
        coords = jnp.asarray(grid.coords, state.precision.compute)
        p = np.exp(np.asarray(state(coords, "eval")))
        errs.append(float(np.sqrt(np.sum((p - p_exact) ** 2)
                                  * grid.bin_area)))
    order = np.log2(errs[0] / errs[1])
    assert 2.6 < order < 3.4, (errs, order)
    assert errs[0] < 5e-8, errs  # 16x-coarser dt than the Heun run needs


@pytest.mark.slow
def test_e2e_adaptive_rk23_mwe():
    """adaptive_rk23 on the full pipeline: tracks the closed form AND, at
    the same tolerance, integrates with no more steps than adaptive_heun
    (third-order accepted solution => larger accepted dt)."""
    import dataclasses

    base = preset(
        "mwe", stepper="adaptive_rk23", n_samples_tdvp=2048,
        n_samples_obs=2048, dt0=1e-4, tol=1e-3, max_step=2e-2,
        t_end=0.06, precision="f64", verbose=False, grid_points=40,
    )
    state, rec = run(base)
    infos = rec.as_arrays()
    t_final = float(infos["times"][-1])
    np.testing.assert_allclose(
        np.diag(infos["covar"][-1]), (1 + 2 * t_final) * np.ones(2),
        rtol=0.08)
    assert np.isfinite(infos["entropy"]).all()

    _, rec_h = run(dataclasses.replace(base, stepper="adaptive_heun"))
    n_rk23 = len(infos["times"])
    n_heun = len(rec_h.as_arrays()["times"])
    assert n_rk23 <= n_heun, (n_rk23, n_heun)


def test_e2e_qmc_reduces_observable_noise():
    """RunConfig.qmc drives the full driver loop (sampling/qmc.py): the
    dynamics stay on the analytic diffusion curve AND the per-step entropy
    estimator noise drops well below the iid-MC run's at the identical
    budget/seed/trajectory length. (No reference counterpart -- the
    reference samples iid pseudo-randoms, vmc_fluids/sampler.py:25-26.)"""
    import math

    kw = dict(n_samples_tdvp=1024, n_samples_obs=1024, dt0=4e-3,
              max_step=4e-3, t_end=0.12, precision="f64",
              exact_t_end=True, verbose=False, grid_points=30)
    errs = {}
    for qmc_on in (False, True):
        cfg = preset("mwe", qmc=qmc_on, **kw)
        state, rec = run(cfg)
        infos = rec.as_arrays()
        t = np.asarray(infos["times"])
        S = np.asarray(infos["entropy"])
        analytic = (np.log(2 * np.pi * np.e) + np.log1p(2.0 * t))
        errs[qmc_on] = np.abs(S - analytic)
    # both runs track the closed form; the QMC estimator errors are far
    # inside the MC ones at the same 1024-sample budget
    assert errs[False].max() < 0.2
    assert errs[True].max() < 0.02
    assert errs[True].max() < 0.5 * errs[False].max()


def test_custom_equation_instance():
    """RunConfig.equation accepts a user-defined Equation INSTANCE
    (examples/custom_equation.py): the moving-trap OU plugs into the full
    driver and tracks its closed-form trap-lag mean and contracting
    covariance (driver.build_problem custom-physics branch)."""
    import dataclasses

    from vmc_pde_tpu.ops.evolution import Equation

    gamma, D, a = 1.0, 0.5, 2.0

    @dataclasses.dataclass(frozen=True)
    class MovingTrap(Equation):
        name: str = "moving_trap"

        def hessian_trace_dirs(self, dim):
            return np.eye(dim)

        def eloc(self, x, g, hess, t):
            d = x.shape[-1]
            mu = jnp.zeros((d,), x.dtype).at[0].set(a * t)
            return (gamma * d + jnp.sum(gamma * (x - mu) * g, axis=-1)
                    + D * (jnp.sum(g**2, axis=-1) + hess))

    t_end = 0.1
    cfg = preset(
        "mwe", equation=MovingTrap(), variant="affine", qmc=True,
        n_samples_tdvp=1024, n_samples_obs=1024, dt0=5e-3, max_step=5e-3,
        t_end=t_end, exact_t_end=True, precision="f64", verbose=False,
    )
    state, rec = run(cfg)
    infos = rec.as_arrays()
    t = np.asarray(infos["times"])
    mean0 = np.asarray(infos["x1"])[:, 0]
    var = np.diagonal(np.asarray(infos["covar"]), axis1=1, axis2=2)
    mean0_exact = a * t - (a / gamma) * (1 - np.exp(-gamma * t))
    var_exact = D / gamma + (1 - D / gamma) * np.exp(-2 * gamma * t)
    # QMC observables: far below the plain-MC 5-SE bands at this budget
    assert np.abs(mean0 - mean0_exact).max() < 5e-3
    assert np.abs(var - var_exact[:, None]).max() < 2e-2
    assert np.median(np.asarray(infos["solver_res"])) < 1e-10


def test_driver_init_params_from_pretrain(tmp_path):
    """Pretrain -> evolve handoff (the reference sketches it commented out,
    vmc_fluids/main.py:120-125): pretrain a flow on synthetic data, persist
    the orbax checkpoint, and start the evolution from it via
    RunConfig.init_params / --init-params."""
    import dataclasses

    from vmc_pde_tpu.driver import load_init_params
    from vmc_pde_tpu.pretrain.train import gen_data, train
    from vmc_pde_tpu.utils.checkpoint import save_checkpoint

    cfg = preset(
        "mwe", n_samples_tdvp=256, n_samples_obs=256, dt0=1e-3,
        t_end=1.0, precision="f64", verbose=False, grid_points=50,
    )
    state, *_ = build_problem(cfg)
    data, _ = gen_data((1000, 2), mode="standard_normal", std=1.3)
    train(state, np.asarray(data, dtype=np.float64), batchsize=200,
          epochs=3, workdir=str(tmp_path), checkpoint_every=2)
    theta_pre = np.asarray(state.get_parameters())
    ckpt = str(tmp_path / "pretrain_ckpt")

    # orbax-dir route: the loaded vector IS the pretrained one
    th0 = np.asarray(load_init_params(ckpt, state))
    np.testing.assert_allclose(th0, theta_pre, rtol=0, atol=1e-12)

    # the run starts FROM it (max_steps=0 leaves parameters untouched)
    cfg2 = dataclasses.replace(cfg, init_params=ckpt)
    state2, _ = run(cfg2, max_steps=0)
    np.testing.assert_allclose(np.asarray(state2.get_parameters()),
                               theta_pre, rtol=0, atol=1e-12)

    # ... and evolves from it without blowing up
    state3, rec3 = run(cfg2, max_steps=2)
    infos = rec3.as_arrays()
    assert len(infos["times"]) == 2
    assert np.isfinite(np.asarray(infos["entropy"])).all()

    # npz evolution-checkpoint route
    save_checkpoint(str(tmp_path), 7, 0.5, theta_pre, 1e-3)
    th_npz = np.asarray(load_init_params(
        str(tmp_path / "ckpt_latest.npz"), state))
    np.testing.assert_allclose(th_npz, theta_pre, rtol=0, atol=0)

    # mismatched architecture fails loudly
    cfg_big = preset("diffusion")
    state_big, *_ = build_problem(
        dataclasses.replace(cfg_big, precision="f64"))
    with pytest.raises(ValueError, match="must match"):
        load_init_params(str(tmp_path / "ckpt_latest.npz"), state_big)


def test_build_problem_rejects_params_with_equation_instance():
    """An Equation INSTANCE plus non-empty equation_params is a config
    contradiction (the params would be silently dropped) -- rejected."""
    import dataclasses

    from vmc_pde_tpu.ops.evolution import make_equation

    eq = make_equation("diffusion", 2)
    cfg = preset("mwe")
    cfg = dataclasses.replace(cfg, equation=eq,
                              equation_params={"D": 2.0})
    with pytest.raises(ValueError, match="equation_params"):
        build_problem(cfg)


def test_sde_oracle_heat_chain_vs_lyapunov():
    """Per-site-temperature SDE oracle (heat-transport chain) against the
    exact covariance flow: dS/dt = A S + S A^T + D integrated with the
    same drift matrix. Validates the vector-T noise wiring in
    oracle/sde.py (and transitively the NESS the paper figure pins)."""
    scipy_int = pytest.importorskip("scipy.integrate")
    import os
    import sys

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts"))
    from make_paper_figures import HEAT_CHAIN, ness_state

    p = dict(HEAT_CHAIN)
    n, t_end, dt = 60000, 1.0, 1e-2
    cloud = np.asarray(jax.random.normal(jax.random.PRNGKey(3), (n, 6),
                                         dtype=jnp.float64))
    _, infos = sde.evolve(cloud, 0.0, dt, int(t_end / dt) + 1,
                          drift_name="phase_space", params=p,
                          key=jax.random.PRNGKey(4))
    t = np.asarray(infos["times"])
    cov = np.asarray(infos["covar"])

    # exact S(t) via the same Lyapunov machinery the figure uses, started
    # from S(0) = I
    import scipy.linalg

    S_ness, _ = ness_state()
    # reuse ness_state's A, D by solving the ODE directly
    Ts = p["T"]
    K = np.zeros((3, 3))
    for i in range(3):
        K[i, i] = 2.0 + p["onsite"]
        K[i, (i - 1) % 3] -= 1.0
        K[i, (i + 1) % 3] -= 1.0
    A = np.zeros((6, 6))
    D = np.zeros((6, 6))
    for i in range(3):
        A[2 * i, 2 * i + 1] = 1.0
        for j in range(3):
            A[2 * i + 1, 2 * j] = -K[i, j]
        A[2 * i + 1, 2 * i + 1] = -p["gamma"]
        D[2 * i + 1, 2 * i + 1] = 2.0 * p["gamma"] * Ts[i]

    def rhs(_, y):
        S = y.reshape(6, 6)
        return (A @ S + S @ A.T + D).ravel()

    sol = scipy_int.solve_ivp(rhs, (0, t[-1]), np.eye(6).ravel(),
                              t_eval=t, rtol=1e-9)
    S_exact = sol.y.reshape(6, 6, -1)
    d_mc = np.stack([cov[:, i, i] for i in range(6)], 0)
    d_ex = np.stack([S_exact[i, i, :] for i in range(6)], 0)
    # 60k particles: MC noise ~ sqrt(2/n) * S ~ 0.6% of scale
    np.testing.assert_allclose(d_mc, d_ex, rtol=0.06, atol=0.05)


def test_minimal_demo_script(tmp_path, monkeypatch, capsys):
    """examples/minimal_demo.py (the notebook-parity MWE,
    vmc_pde_MinimalDemo.ipynb counterpart) end to end at a tiny budget:
    runs, reports a sane entropy error, and writes figures + infos.hdf5."""
    import os
    import sys

    demo_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples")
    sys.path.insert(0, demo_dir)
    try:
        import minimal_demo
    finally:
        sys.path.remove(demo_dir)
    outdir = str(tmp_path / "demo")
    monkeypatch.setattr(sys, "argv", [
        "minimal_demo.py", "--t-end", "0.02", "--samples", "256",
        "--outdir", outdir, "--precision", "f64"])
    minimal_demo.main()
    out = capsys.readouterr().out
    assert "entropy error vs analytic" in out
    assert os.path.exists(os.path.join(outdir, "infos.hdf5"))
    import glob

    assert len(glob.glob(os.path.join(outdir, "*.pdf"))) >= 3

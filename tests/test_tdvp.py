"""TDVP core tests: solver correctness on an analytically tractable case,
direct vs chunked statistics, device vs host eigensolve, SNR plumbing.

Analytic oracle: Gaussian diffusion. For p_theta = N(0, Sigma(theta)) under
dp/dt = D lap p, the exact parameter flow gives dSigma/dt = 2 D I, so the
TDVP update applied to the model must change the model covariance at rate
~2D. This pins down the entire sample -> Eloc -> Gram/force -> solve chain.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vmc_pde_tpu.models import flow, latent
from vmc_pde_tpu.models.state import VarState
from vmc_pde_tpu.ops import evolution
from vmc_pde_tpu.sampling.sampler import Sampler
from vmc_pde_tpu.solver.tdvp import TDVP, TDVPConfig
from vmc_pde_tpu.utils.dtypes import Precision


def make_problem(ctx, dim=2, n=4096, latent_name="Gauss", out_scale=1e-5,
                 cfg=TDVPConfig(), D=1.0, prec=None):
    prec = prec or Precision.f64_everywhere()
    fl, params = flow.build_flow(1, dim=dim, depth=4, out_scale=out_scale,
                                 latent_name=latent_name, dtype=prec.compute)
    s = Sampler(dim=dim, ctx=ctx, name=latent_name, dtype=prec.compute)
    st = VarState(fl, params, sampler=s, ctx=ctx, precision=prec)
    eq = evolution.Diffusion(D=D)
    tdvp = TDVP(st, eq, cfg, n_samples=n, n_samples_obs=n, precision=prec)
    return st, tdvp


def model_covariance(state, n=200_000):
    x, _ = state.sample(n, key=jax.random.PRNGKey(99))
    x = np.asarray(x)
    return np.cov(x.T, ddof=0)


def test_update_drives_covariance_at_2D(ctx1):
    """d/dt Sigma_model along the TDVP update == 2 D I (the exact diffusion
    flow), validating the full chain end to end."""
    D = 1.0
    st, tdvp = make_problem(ctx1, dim=2, n=16384, D=D)
    theta = st.get_parameters()
    update, aux = tdvp.rhs(theta, t=0.0, key=jax.random.PRNGKey(0))
    assert not bool(aux["nan"])
    assert float(aux["solver_res"]) < 1e-6

    eps = 1e-4
    st.set_parameters(theta + eps * update)
    cov1 = model_covariance(st)
    st.set_parameters(theta)
    cov0 = model_covariance(st)
    dcov_dt = (cov1 - cov0) / eps
    np.testing.assert_allclose(dcov_dt, 2 * D * np.eye(2), atol=0.25)


def test_eloc_stats_analytic(ctx1):
    """At init (identity flow, N(0,I) latent): Eloc = |x|^2 - d with mean 0
    and variance 2d."""
    dim = 4
    st, tdvp = make_problem(ctx1, dim=dim, n=65536, out_scale=0.0)
    _, aux = tdvp.rhs(st.get_parameters(), 0.0, jax.random.PRNGKey(1))
    assert abs(float(aux["eloc_mean"])) < 0.15
    np.testing.assert_allclose(float(aux["eloc_var"]), 2 * dim, rtol=0.1)
    # entropy of N(0, I_4)
    np.testing.assert_allclose(
        float(aux["entropy"]), dim / 2 * np.log(2 * np.pi * np.e), rtol=0.02
    )


def test_chunked_matches_direct(ctx1):
    """Streaming accumulation must reproduce the direct Gram/force (and the
    derived update) on identical samples."""
    cfg_direct = TDVPConfig(compute_snr=True, compute_sexp=True)
    cfg_chunked = TDVPConfig(compute_snr=True, compute_sexp=True,
                             chunk_size=512)
    st, t_direct = make_problem(ctx1, dim=2, n=2048, cfg=cfg_direct)
    _, t_chunked = make_problem(ctx1, dim=2, n=2048, cfg=cfg_chunked)

    key = jax.random.PRNGKey(3)
    theta = st.get_parameters()
    u1, a1 = t_direct.rhs(theta, 0.0, key)
    u2, a2 = t_chunked.rhs(theta, 0.0, key)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u2),
                               rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(np.asarray(a1["ev"]), np.asarray(a2["ev"]),
                               rtol=1e-6, atol=1e-12)
    # Per-mode SNR is only well-defined for resolved eigenmodes; noise modes
    # (|ev/ev_max| < ~eps) have freely-rotating eigenvectors.
    ev = np.asarray(a1["ev"])
    mask = np.abs(ev / ev[-1]) > 1e-8
    np.testing.assert_allclose(np.asarray(a1["snr"])[mask],
                               np.asarray(a2["snr"])[mask],
                               rtol=1e-3)
    np.testing.assert_allclose(np.asarray(a1["SExp"]),
                               np.asarray(a2["SExp"]),
                               rtol=1e-6, atol=1e-10)


def test_hessian_trace_mode_matches_block(ctx1):
    """hessian_mode='auto' (forward-over-forward quad_trace) must reproduce
    the block-Hessian RHS on identical samples."""
    st, t_trace = make_problem(ctx1, dim=2, n=2048,
                               cfg=TDVPConfig(hessian_mode="auto"))
    _, t_block = make_problem(ctx1, dim=2, n=2048,
                              cfg=TDVPConfig(hessian_mode="block"))
    assert t_trace._hess_dirs is not None
    assert t_block._hess_dirs is None
    key = jax.random.PRNGKey(11)
    theta = st.get_parameters()
    u1, a1 = t_trace.rhs(theta, 0.0, key)
    u2, a2 = t_block.rhs(theta, 0.0, key)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u2),
                               rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(float(a1["eloc_var"]), float(a2["eloc_var"]),
                               rtol=1e-9)


def test_host_solve_matches_device(ctx1):
    cfg_dev = TDVPConfig(solve_on_device=True)
    cfg_host = TDVPConfig(solve_on_device=False)
    st, t_dev = make_problem(ctx1, dim=2, n=2048, cfg=cfg_dev)
    _, t_host = make_problem(ctx1, dim=2, n=2048, cfg=cfg_host)
    key = jax.random.PRNGKey(4)
    theta = st.get_parameters()
    u1, a1 = t_dev.rhs(theta, 0.0, key)
    u2, a2 = t_host.rhs(theta, 0.0, key)
    # jnp.linalg.eigh and np.linalg.eigh may resolve noise eigenmodes
    # differently; the physical update must agree.
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u2),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(float(a1["solver_res"]),
                               float(a2["solver_res"]), atol=1e-8)


def test_snr_regularization_reduces_update_norm(ctx1):
    cfg_plain = TDVPConfig(use_snr=False)
    cfg_snr = TDVPConfig(use_snr=True, snr_tol=4.0)
    st, t_plain = make_problem(ctx1, dim=2, n=1024, cfg=cfg_plain)
    _, t_snr = make_problem(ctx1, dim=2, n=1024, cfg=cfg_snr)
    key = jax.random.PRNGKey(5)
    theta = st.get_parameters()
    u1, _ = t_plain.rhs(theta, 0.0, key)
    u2, _ = t_snr.rhs(theta, 0.0, key)
    assert float(jnp.linalg.norm(u2)) <= float(jnp.linalg.norm(u1)) + 1e-12


def test_observable_budget_resampling(ctx1):
    """n_obs > n_tdvp draws a separate observable batch (tdvp.py:130-134)."""
    prec = Precision.f64_everywhere()
    fl, params = flow.build_flow(1, dim=2, depth=2, dtype=prec.compute)
    s = Sampler(dim=2, ctx=ctx1, name="Gauss", dtype=prec.compute)
    st = VarState(fl, params, sampler=s, ctx=ctx1, precision=prec)
    tdvp = TDVP(st, evolution.Diffusion(), TDVPConfig(integrals=True),
                n_samples=512, n_samples_obs=4096, precision=prec)
    _, aux = tdvp.rhs(st.get_parameters(), 0.0, jax.random.PRNGKey(6))
    # 2D standard normal: P(|x| < r) = 1 - exp(-r^2/2); integral keys exist
    assert "integral_1sigma" in aux and "integral_0.1sigma" in aux
    r = np.sqrt(10.0)
    expected = 1 - np.exp(-(r**2) / 2)
    np.testing.assert_allclose(float(aux["integral_1sigma"]), expected,
                               rtol=0.1)


def test_cholesky_solver_matches_eigh_physics(ctx1):
    """The large-P Tikhonov/Cholesky path must produce the same physical
    update as the spectral pseudo-inverse (they differ only in how noise
    modes are filtered)."""
    from vmc_pde_tpu.solver.tdvp import TDVPConfig

    cfg_e = TDVPConfig(solver_method="eigh")
    cfg_c = TDVPConfig(solver_method="cholesky")
    st, t_e = make_problem(ctx1, dim=2, n=8192, cfg=cfg_e)
    _, t_c = make_problem(ctx1, dim=2, n=8192, cfg=cfg_c)
    assert t_c.solver_method == "cholesky"
    key = jax.random.PRNGKey(21)
    theta = st.get_parameters()
    u_e, a_e = t_e.rhs(theta, 0.0, key)
    u_c, a_c = t_c.rhs(theta, 0.0, key)
    assert "lambda_max" in a_c and "ev" not in a_c
    # dominant update directions agree
    cos = float(u_e @ u_c / (jnp.linalg.norm(u_e) * jnp.linalg.norm(u_c)))
    assert cos > 0.99, cos
    # the Tikhonov residual is bounded by the regularization scale
    assert float(a_c["solver_res"]) < 1e-3

    # and it must drive the covariance at the same (exact) rate
    eps = 1e-4
    st.set_parameters(theta + eps * u_c)
    cov1 = model_covariance(st)
    st.set_parameters(theta)
    cov0 = model_covariance(st)
    np.testing.assert_allclose((cov1 - cov0) / eps, 2 * np.eye(2), atol=0.3)


def test_solver_method_auto_threshold(ctx1):
    from vmc_pde_tpu.solver.tdvp import TDVPConfig

    st, tdvp = make_problem(ctx1, dim=2, n=256,
                            cfg=TDVPConfig(eigh_max_params=10))
    assert tdvp.solver_method == "cholesky"
    st2, tdvp2 = make_problem(ctx1, dim=2, n=256, cfg=TDVPConfig())
    assert tdvp2.solver_method == "eigh"


def test_nan_flag(ctx1):
    st, tdvp = make_problem(ctx1, dim=2, n=256)
    theta = st.get_parameters()
    bad = jnp.asarray(theta).at[0].set(jnp.nan)
    _, aux = tdvp.rhs(bad, 0.0, jax.random.PRNGKey(7))
    assert bool(aux["nan"])


def test_cg_solver_matches_cholesky(ctx1):
    """Matrix-free CG must agree with the dense Tikhonov solve (at a
    tolerance where the system's condition number ~1/svd_tol is within
    CG's iteration budget -- the f32-regime setting CG is built for)."""
    from vmc_pde_tpu.solver.tdvp import TDVPConfig

    cfg_c = TDVPConfig(solver_method="cholesky", svd_tol=1e-5)
    cfg_g = TDVPConfig(solver_method="cg", svd_tol=1e-5, cg_maxiter=600,
                       cg_tol=1e-10)
    st, t_c = make_problem(ctx1, dim=2, n=4096, cfg=cfg_c)
    _, t_g = make_problem(ctx1, dim=2, n=4096, cfg=cfg_g)
    key = jax.random.PRNGKey(31)
    theta = st.get_parameters()
    u_c, a_c = t_c.rhs(theta, 0.0, key)
    u_g, a_g = t_g.rhs(theta, 0.0, key)
    cos = float(u_c @ u_g / (jnp.linalg.norm(u_c) * jnp.linalg.norm(u_g)))
    assert cos > 0.999, cos
    np.testing.assert_allclose(float(jnp.linalg.norm(u_g - u_c))
                               / float(jnp.linalg.norm(u_c)), 0.0, atol=2e-2)
    assert float(a_g["solver_res"]) < 1e-3
    # cholesky's lambda_max comes from randomized subspace iteration, cg's
    # from 12 matvec power iterations; both only scale the Tikhonov shift,
    # so percent-level agreement is all the physics needs
    np.testing.assert_allclose(float(a_g["lambda_max"]),
                               float(a_c["lambda_max"]), rtol=3e-2)


def test_cg_solver_config_validation(ctx1):
    from vmc_pde_tpu.solver.tdvp import TDVPConfig

    with pytest.raises(ValueError):
        make_problem(ctx1, dim=2, n=1024,
                     cfg=TDVPConfig(solver_method="cg", chunk_size=512))
    with pytest.raises(ValueError):
        make_problem(ctx1, dim=2, n=1024,
                     cfg=TDVPConfig(solver_method="cg",
                                    solve_on_device=False))


def test_chunk_budget_autorounding(ctx8):
    """A chunk_size that does not divide the requested budget rounds the
    budget UP to whole chunks (x the mesh block) instead of crashing at
    trace time."""
    cfg = TDVPConfig(chunk_size=384)
    st, tdvp = make_problem(ctx8, dim=2, n=1000, cfg=cfg)
    assert tdvp.n_samples % 384 == 0
    assert tdvp.n_samples % 8 == 0  # still mesh-aligned
    assert tdvp.n_samples >= 1000
    u, aux = tdvp.rhs(st.get_parameters(), 0.0, jax.random.PRNGKey(11))
    assert not bool(aux["nan"])
    assert float(aux["solver_res"]) < 1e-6


def test_cg_residual_semantics_match_cholesky(ctx1):
    """solver_res means ||S u - F|| / ||F|| (unregularized S) for EVERY
    solver_method: with matched svd_tol the cg and cholesky updates agree,
    so their residual diagnostics must too (round-1 advisor finding)."""
    from vmc_pde_tpu.solver.tdvp import TDVPConfig

    cfg_c = TDVPConfig(solver_method="cholesky", svd_tol=1e-5)
    cfg_g = TDVPConfig(solver_method="cg", svd_tol=1e-5, cg_maxiter=600,
                       cg_tol=1e-10)
    st, t_c = make_problem(ctx1, dim=2, n=4096, cfg=cfg_c)
    _, t_g = make_problem(ctx1, dim=2, n=4096, cfg=cfg_g)
    key = jax.random.PRNGKey(41)
    theta = st.get_parameters()
    _, a_c = t_c.rhs(theta, 0.0, key)
    _, a_g = t_g.rhs(theta, 0.0, key)
    res_c, res_g = float(a_c["solver_res"]), float(a_g["solver_res"])
    # same definition on (nearly) the same update: the values agree and are
    # NOT ~cg_tol (the old regularized-system residual was ~1e-10 here)
    np.testing.assert_allclose(res_g, res_c, rtol=0.25)
    assert res_g > 10 * cfg_g.cg_tol


def test_cg_sexp_warns(ctx1):
    """Requesting the SExp stepper metric with the matrix-free solver warns
    that the adaptive S-metric norm degrades (round-1 advisor finding)."""
    import warnings

    from vmc_pde_tpu.solver.tdvp import TDVPConfig

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        make_problem(ctx1, dim=2, n=512,
                     cfg=TDVPConfig(solver_method="cg", compute_sexp=True))
    assert any("SExp" in str(x.message) for x in w)


def test_cholesky_spectrum_topk_matches_eigh(ctx1):
    """Large-P spectral observability: the randomized top-k eigenvalues and
    Ritz-projected per-mode SNR recorded on the cholesky path must match the
    exact eigh spectrum at small P (round-1 verdict item 3)."""
    k = 16
    cfg_e = TDVPConfig(solver_method="eigh", compute_snr=True)
    cfg_c = TDVPConfig(solver_method="cholesky", compute_snr=True,
                       spectrum_topk=k)
    st, t_e = make_problem(ctx1, dim=2, n=4096, cfg=cfg_e)
    _, t_c = make_problem(ctx1, dim=2, n=4096, cfg=cfg_c)
    assert t_c.cfg.compute_snr  # survives the cholesky config rewrite
    key = jax.random.PRNGKey(51)
    theta = st.get_parameters()
    _, a_e = t_e.rhs(theta, 0.0, key)
    _, a_c = t_c.rhs(theta, 0.0, key)

    ev_full = np.asarray(a_e["ev"])
    ev_topk = np.asarray(a_c["ev_topk"])
    assert ev_topk.shape == (k,)
    np.testing.assert_allclose(ev_topk[-8:], ev_full[-8:], rtol=1e-5)
    np.testing.assert_allclose(ev_topk, ev_full[-k:], rtol=1e-2)
    # trace is exact; tail mass = what the top-k misses
    np.testing.assert_allclose(float(a_c["spectrum_trace"]), ev_full.sum(),
                               rtol=1e-10)
    tail = float(a_c["spectrum_tail_mass"])
    np.testing.assert_allclose(tail, ev_full[:-k].sum(), rtol=1e-2,
                               atol=1e-12 * ev_full[-1])
    # Ritz SNR matches the exact per-mode SNR on well-separated top modes
    snr_exact = np.asarray(a_e["snr"])[-4:]
    snr_topk = np.asarray(a_c["snr_topk"])[-4:]
    np.testing.assert_allclose(snr_topk, snr_exact, rtol=5e-2)
    # the TDVP diagnostic attribute contract is populated on the large-P path
    assert t_c.ev is not None and t_c.snr is not None


def test_fused_stepper_stages_match_percall(ctx1):
    """The one-dispatch Heun pair / adaptive attempt (dt traced) must
    reproduce the per-call stepper exactly: same RNG per stage (intStep
    contract), same accepted dt, same parameters."""
    from vmc_pde_tpu.driver import s_metric_norm
    from vmc_pde_tpu.solver.steppers import AdaptiveHeun, FixedStepper

    cfg = TDVPConfig(compute_sexp=True)
    st, tdvp = make_problem(ctx1, dim=2, n=2048, cfg=cfg)
    assert tdvp.fused_steps_available
    theta = st.get_parameters()
    key = jax.random.PRNGKey(77)

    def f(y, t, k, intStep=0):
        u, aux = tdvp.rhs(y, t, k, intStep=intStep)
        f.SExp = tdvp.SExp
        return u, aux

    s_plain = FixedStepper(timeStep=1e-4, maxStep=1e-3)
    s_fused = FixedStepper(timeStep=1e-4, maxStep=1e-3,
                           pair_fn=tdvp.heun_pair)
    r1 = s_plain.step(0.0, f, theta, key)
    r2 = s_fused.step(0.0, f, theta, key)
    assert r1.dt_used == r2.dt_used
    # not bit-identical: the fused program compiles to different HLO
    # (reassociated reductions); agreement to fp-noise is the contract
    np.testing.assert_allclose(np.asarray(r2.y), np.asarray(r1.y),
                               rtol=1e-6, atol=1e-12)
    # residuals sit at the f64 noise floor (~1e-14); same order is enough
    np.testing.assert_allclose(float(r2.info["solver_res"]),
                               float(r1.info["solver_res"]), rtol=0.2)

    a_plain = AdaptiveHeun(timeStep=1e-4, tol=1e-5, maxStep=1e-3)
    a_fused = AdaptiveHeun(timeStep=1e-4, tol=1e-5, maxStep=1e-3,
                           attempt_fn=tdvp.heun_attempt)
    r1 = a_plain.step(0.0, f, theta, key, normFunction=s_metric_norm)
    r2 = a_fused.step(0.0, f, theta, key, normFunction=s_metric_norm)
    assert r1.dt_used == r2.dt_used
    np.testing.assert_allclose(a_fused.dt, a_plain.dt, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(r2.y), np.asarray(r1.y),
                               rtol=1e-6, atol=1e-12)
    # recorded info is the FIRST stage's (state at t), per-call parity
    np.testing.assert_allclose(float(r2.info["entropy"]),
                               float(r1.info["entropy"]), rtol=1e-8)


def test_fused_steps_gated_by_solver_location(ctx1):
    """Fused stepper stages need the in-jit update: host-solve configs must
    not advertise them (their aux carries stats, not an update)."""
    st, t_dev = make_problem(ctx1, dim=2, n=512,
                             cfg=TDVPConfig(solve_on_device=True))
    assert t_dev.fused_steps_available
    _, t_host = make_problem(ctx1, dim=2, n=512,
                             cfg=TDVPConfig(solve_on_device=False))
    assert not t_host.fused_steps_available


def test_gram_backend_syrk_matches_xla(ctx1):
    """The triangle (syrk) Gram backend must reproduce the XLA-matmul
    statistics -- S0, the SNR second moment A, and SExp -- on identical
    samples, on both the direct and the chunked accumulation paths.
    (On CPU the kernel runs in interpret mode; precision differences are
    the 3-pass bf16 split's, ~1e-6 relative.)"""
    from vmc_pde_tpu.utils.dtypes import resolve

    prec = resolve("tpu")  # f32 compute: the regime the kernel serves
    kw = dict(compute_snr=True, compute_sexp=True, gram_precision="high")
    for chunk in (0, 512):
        cfg_x = TDVPConfig(gram_backend="xla", chunk_size=chunk, **kw)
        cfg_s = TDVPConfig(gram_backend="syrk", chunk_size=chunk, **kw)
        st, t_x = make_problem(ctx1, dim=2, n=2048, cfg=cfg_x, prec=prec)
        _, t_s = make_problem(ctx1, dim=2, n=2048, cfg=cfg_s, prec=prec)
        assert t_s._use_syrk and not t_x._use_syrk

        theta_c = jnp.asarray(st.get_parameters(), prec.compute)
        params = t_x._unravel(theta_c)
        z = st.flow.latent_sample(jax.random.PRNGKey(5), params, 2048,
                                  dtype=prec.compute)
        x, _ = jax.vmap(st.flow.push, in_axes=(None, 0))(params, z)

        stats_fn = "_chunked_stats" if chunk else "_direct_stats"
        s_x = getattr(t_x, stats_fn)(theta_c, 0.0, x)
        s_s = getattr(t_s, stats_fn)(theta_c, 0.0, x)
        for key in ("S0", "A", "SExp"):
            a, b = np.asarray(s_x[key]), np.asarray(s_s[key])
            np.testing.assert_allclose(
                b, a, atol=5e-5 * np.abs(a).max(),
                err_msg=f"{key} (chunk={chunk})")
        np.testing.assert_allclose(np.asarray(s_s["F0"]),
                                   np.asarray(s_x["F0"]), rtol=1e-5,
                                   atol=1e-8)


def test_gram_backend_sym2_matches_xla(ctx1):
    """The 2-pass symmetric-split Gram backend must reproduce the XLA
    HIGH statistics -- S0, A, SExp, and (unchanged) F0 -- on identical
    samples, on both the direct and the chunked paths. sym2 sums the same
    three hi/lo terms HIGH does from two MXU passes, so agreement is at
    the split's own numerics class (~1e-6 relative); on CPU HIGH lowers
    to a true-f32 matmul, making this a cross-numerics check at a loose
    tolerance."""
    from vmc_pde_tpu.utils.dtypes import resolve

    prec = resolve("tpu")
    kw = dict(compute_snr=True, compute_sexp=True, gram_precision="high")
    for chunk in (0, 512):
        cfg_x = TDVPConfig(gram_backend="xla", chunk_size=chunk, **kw)
        cfg_s = TDVPConfig(gram_backend="sym2", chunk_size=chunk, **kw)
        st, t_x = make_problem(ctx1, dim=2, n=2048, cfg=cfg_x, prec=prec)
        _, t_s = make_problem(ctx1, dim=2, n=2048, cfg=cfg_s, prec=prec)
        assert t_s._use_sym2 and not t_x._use_sym2

        theta_c = jnp.asarray(st.get_parameters(), prec.compute)
        params = t_x._unravel(theta_c)
        z = st.flow.latent_sample(jax.random.PRNGKey(5), params, 2048,
                                  dtype=prec.compute)
        x, _ = jax.vmap(st.flow.push, in_axes=(None, 0))(params, z)

        stats_fn = "_chunked_stats" if chunk else "_direct_stats"
        s_x = getattr(t_x, stats_fn)(theta_c, 0.0, x)
        s_s = getattr(t_s, stats_fn)(theta_c, 0.0, x)
        for key in ("S0", "A", "SExp"):
            a, b = np.asarray(s_x[key]), np.asarray(s_s[key])
            np.testing.assert_allclose(
                b, a, atol=5e-5 * np.abs(a).max(),
                err_msg=f"{key} (chunk={chunk})")
        np.testing.assert_allclose(np.asarray(s_s["F0"]),
                                   np.asarray(s_x["F0"]), rtol=1e-5,
                                   atol=1e-8)


def test_sym2_gram_sum_identity():
    """Unit check of the 2-pass split: X^T diag(w) X from H^T H + H^T L +
    (H^T L)^T must agree with the f64 Gram to bf16-split-class error,
    unweighted, with nonnegative weights, and with SIGNED weights (the
    sign rides the hi-split exactly; sum_EOO's weight is the centered
    Eloc), and be symmetric to ulp level (H^T H is not bit-symmetric
    under XLA:CPU's blocked reduction; neither is the 3-pass baseline,
    so sym2 is held to the same bar)."""
    from vmc_pde_tpu.parallel import stats as pstats

    rng = np.random.default_rng(7)
    X = rng.standard_normal((512, 33)).astype(np.float32)
    w = rng.random(512).astype(np.float32) + 0.1
    ws = rng.standard_normal(512).astype(np.float32)  # signed, some ~0
    ws[:7] = 0.0
    for ww in (None, w, ws):
        ref = X.astype(np.float64).T @ (
            X if ww is None else X * ww[:, None]).astype(np.float64)
        got = np.asarray(pstats.sym2_gram_sum(jnp.asarray(X),
                                              None if ww is None
                                              else jnp.asarray(ww)))
        np.testing.assert_allclose(got, ref, atol=2e-3 * np.abs(ref).max())
        np.testing.assert_allclose(got, got.T,
                                   atol=1e-5 * np.abs(got).max())


def test_gram_backend_tri2_matches_xla(ctx1):
    """The triangle-blocked 2-pass Gram backend must reproduce the XLA
    HIGH statistics -- S0, A, SExp, and (unchanged) F0 -- on identical
    samples, on both the direct and the chunked paths. tri2 computes the
    block-lower-triangle of the symmetric hi-term and mirrors ONCE after
    accumulation, so chunked agreement also exercises the raw {t, m2}
    carry pytree through lax.scan."""
    from vmc_pde_tpu.utils.dtypes import resolve

    prec = resolve("tpu")
    kw = dict(compute_snr=True, compute_sexp=True, gram_precision="high")
    for chunk in (0, 512):
        cfg_x = TDVPConfig(gram_backend="xla", chunk_size=chunk, **kw)
        cfg_t = TDVPConfig(gram_backend="tri2", chunk_size=chunk, **kw)
        st, t_x = make_problem(ctx1, dim=2, n=2048, cfg=cfg_x, prec=prec)
        _, t_t = make_problem(ctx1, dim=2, n=2048, cfg=cfg_t, prec=prec)
        assert t_t._use_tri2 and not t_x._use_tri2

        theta_c = jnp.asarray(st.get_parameters(), prec.compute)
        params = t_x._unravel(theta_c)
        z = st.flow.latent_sample(jax.random.PRNGKey(5), params, 2048,
                                  dtype=prec.compute)
        x, _ = jax.vmap(st.flow.push, in_axes=(None, 0))(params, z)

        stats_fn = "_chunked_stats" if chunk else "_direct_stats"
        s_x = getattr(t_x, stats_fn)(theta_c, 0.0, x)
        s_t = getattr(t_t, stats_fn)(theta_c, 0.0, x)
        for key in ("S0", "A", "SExp"):
            a, b = np.asarray(s_x[key]), np.asarray(s_t[key])
            np.testing.assert_allclose(
                b, a, atol=5e-5 * np.abs(a).max(),
                err_msg=f"{key} (chunk={chunk})")
        np.testing.assert_allclose(np.asarray(s_t["F0"]),
                                   np.asarray(s_x["F0"]), rtol=1e-5,
                                   atol=1e-8)


def test_tri2_gram_identity():
    """Unit check of the triangle-blocked split against the f64 Gram and
    against sym2 (same numerics class: identical three hi/lo terms),
    unweighted / nonnegative / SIGNED weights, at a ragged panel split
    (P not a multiple of K), plus exact symmetry of the mirrored result."""
    from vmc_pde_tpu.parallel import stats as pstats

    rng = np.random.default_rng(7)
    for P in (33, 700):
        X = rng.standard_normal((512, P)).astype(np.float32)
        w = (rng.random(512) + 0.1).astype(np.float32)
        ws = rng.standard_normal(512).astype(np.float32)
        ws[:7] = 0.0
        bounds = pstats.tri2_bounds(P, target_block=max(16, P // 3))
        assert bounds[0] == 0 and bounds[-1] == P
        for ww in (None, w, ws):
            ref = X.astype(np.float64).T @ (
                X if ww is None else X * ww[:, None]).astype(np.float64)
            jw = None if ww is None else jnp.asarray(ww)
            raw = pstats.tri2_gram_sum_raw(jnp.asarray(X), jw, bounds)
            got = np.asarray(pstats.tri2_gram_finalize(raw, bounds))
            np.testing.assert_allclose(got, ref,
                                       atol=2e-3 * np.abs(ref).max())
            s2 = np.asarray(pstats.sym2_gram_sum(jnp.asarray(X), jw))
            np.testing.assert_allclose(got, s2,
                                       atol=2e-5 * np.abs(ref).max())
            np.testing.assert_allclose(got, got.T,
                                       atol=1e-5 * np.abs(got).max())


def test_int8_cross_identity():
    """Unit check of the int8 cross pass: sym2/tri2 with cross_int8=True
    must agree with the f64 Gram at the split's own numerics class (the
    int8 quantization error of the ~2^-8-scale cross term sits below the
    dropped lo@lo term), for unweighted / nonnegative / SIGNED weights,
    with exact symmetry of the assembled result."""
    from vmc_pde_tpu.parallel import stats as pstats

    rng = np.random.default_rng(3)
    P = 131
    X = rng.standard_normal((512, P)).astype(np.float32)
    X *= np.exp(np.linspace(-3, 3, P))[None, :].astype(np.float32)
    w = (rng.random(512) + 0.1).astype(np.float32)
    ws = rng.standard_normal(512).astype(np.float32)
    ws[:5] = 0.0
    bounds = pstats.tri2_bounds(P, target_block=40)
    for ww in (None, w, ws):
        ref = X.astype(np.float64).T @ (
            X if ww is None else X * ww[:, None]).astype(np.float64)
        jw = None if ww is None else jnp.asarray(ww)
        tol = 2e-3 * np.abs(ref).max()
        got_s = np.asarray(pstats.sym2_gram_sum(jnp.asarray(X), jw,
                                                cross_int8=True))
        np.testing.assert_allclose(got_s, ref, atol=tol)
        np.testing.assert_allclose(got_s, got_s.T,
                                   atol=1e-5 * np.abs(got_s).max())
        got_t = np.asarray(pstats.tri2_gram_finalize(
            pstats.tri2_gram_sum_raw(jnp.asarray(X), jw, bounds,
                                     cross_int8=True), bounds))
        np.testing.assert_allclose(got_t, ref, atol=tol)
        # the int8 cross error must stay in the class of the term the
        # split already drops: compare against the bf16-cross result,
        # normalized by the split OPERAND's column norms (the ref diag
        # is near-zero under signed weights and is the wrong scale)
        got_b = np.asarray(pstats.sym2_gram_sum(jnp.asarray(X), jw))
        Xw = X if ww is None else X * np.sqrt(np.abs(ww))[:, None]
        cn = np.linalg.norm(Xw, axis=0)
        scale = np.maximum(np.outer(cn, cn), 1e-30)
        assert np.max(np.abs(got_s - got_b) / scale) < 3e-5


def test_int8_cross_fallback_and_dispatch():
    """The int8 request must actually lower to an int8 dot_general at
    in-bound contraction lengths and fall back to the bf16 pass beyond
    the exact-int32-accumulation bound (N > 131,072)."""
    from vmc_pde_tpu.parallel import stats as pstats

    a = jnp.ones((64, 8), jnp.bfloat16)
    b = jnp.ones((64, 8), jnp.bfloat16)
    jx8 = str(jax.make_jaxpr(
        lambda x, y: pstats._cross_sum(x, y, int8=True))(a, b))
    assert "int8" in jx8
    jxb = str(jax.make_jaxpr(
        lambda x, y: pstats._cross_sum(x, y, int8=False))(a, b))
    assert "int8" not in jxb
    # beyond the bound: trace-time fallback, no int8 in the program
    big = jax.ShapeDtypeStruct((pstats._INT8_CROSS_N_MAX + 1, 4),
                               jnp.bfloat16)
    jbig = str(jax.make_jaxpr(
        lambda x, y: pstats._cross_sum(x, y, int8=True))(big, big))
    assert "int8" not in jbig
    # numeric spot check of the in-bounds path: lossless when the column
    # amax is exactly 127 (scale = 1, integer values quantize exactly)
    av = jnp.asarray(np.arange(-127, 129, 4)[:, None] * np.ones((1, 8)),
                     jnp.bfloat16)
    got = pstats._cross_sum(av, av, int8=True)
    ref = np.asarray(av, np.float64).T @ np.asarray(av, np.float64)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-6)


def test_gram_cross_int8_matches_bf16(ctx1):
    """TDVP statistics with gram_cross='int8' must reproduce the bf16
    split statistics -- S0, A, SExp, F0 -- on identical samples, direct
    and chunked, including the solve downstream (the residual bar is the
    same class as the sym2-vs-xla test). Also pins the config validation:
    int8 on a no-cross backend is rejected."""
    from vmc_pde_tpu.utils.dtypes import resolve

    prec = resolve("tpu")
    kw = dict(compute_snr=True, compute_sexp=True, gram_precision="high")
    for chunk in (0, 512):
        cfg_b = TDVPConfig(gram_backend="sym2", chunk_size=chunk, **kw)
        cfg_i = TDVPConfig(gram_backend="sym2", gram_cross="int8",
                           chunk_size=chunk, **kw)
        st, t_b = make_problem(ctx1, dim=2, n=2048, cfg=cfg_b, prec=prec)
        _, t_i = make_problem(ctx1, dim=2, n=2048, cfg=cfg_i, prec=prec)
        assert t_i._cross_int8 and not t_b._cross_int8

        theta_c = jnp.asarray(st.get_parameters(), prec.compute)
        params = t_b._unravel(theta_c)
        z = st.flow.latent_sample(jax.random.PRNGKey(5), params, 2048,
                                  dtype=prec.compute)
        x, _ = jax.vmap(st.flow.push, in_axes=(None, 0))(params, z)

        stats_fn = "_chunked_stats" if chunk else "_direct_stats"
        s_b = getattr(t_b, stats_fn)(theta_c, 0.0, x)
        s_i = getattr(t_i, stats_fn)(theta_c, 0.0, x)
        for key in ("S0", "A", "SExp"):
            a, b = np.asarray(s_b[key]), np.asarray(s_i[key])
            np.testing.assert_allclose(
                b, a, atol=5e-5 * np.abs(a).max(),
                err_msg=f"{key} (chunk={chunk})")
        np.testing.assert_allclose(np.asarray(s_i["F0"]),
                                   np.asarray(s_b["F0"]), rtol=1e-5,
                                   atol=1e-8)

    with pytest.raises(ValueError, match="gram_cross"):
        make_problem(ctx1, dim=2, n=512,
                     cfg=TDVPConfig(gram_backend="xla", gram_cross="int8",
                                    gram_precision="high"), prec=prec)


def test_sym2_outer_sum_identity():
    """Kernel-space orientation of the 2-pass split (minSR's T = G G^T):
    agreement with the f64 outer Gram at the bf16-split class, exact
    symmetry bar as sym2_gram_sum."""
    from vmc_pde_tpu.parallel import stats as pstats

    rng = np.random.default_rng(11)
    X = rng.standard_normal((130, 517)).astype(np.float32)
    ref = X.astype(np.float64) @ X.astype(np.float64).T
    got = np.asarray(pstats.sym2_outer_sum(jnp.asarray(X)))
    np.testing.assert_allclose(got, ref, atol=2e-3 * np.abs(ref).max())
    np.testing.assert_allclose(got, got.T, atol=1e-5 * np.abs(got).max())


def test_minsr_sym2_kernel_matches_high(ctx1):
    """minSR's 2-pass kernel assembly (engaged via gram_backend='sym2' at
    the f32/'high' point) must reproduce the 3-pass HIGH solve: same
    update, spectrum, and residual to split-class tolerance, on both the
    direct and the chunked (pairwise-block) paths."""
    from vmc_pde_tpu.utils.dtypes import resolve

    prec = resolve("tpu")
    for chunk in (0, 16):
        cfg_x = TDVPConfig(solver_method="minsr", gram_backend="xla",
                           chunk_size=chunk, gram_precision="high")
        cfg_s = TDVPConfig(solver_method="minsr", gram_backend="sym2",
                           chunk_size=chunk, gram_precision="high")
        st, t_x = make_problem(ctx1, dim=4, n=64, cfg=cfg_x, prec=prec)
        _, t_s = make_problem(ctx1, dim=4, n=64, cfg=cfg_s, prec=prec)
        assert t_s._use_sym2 and not t_x._use_sym2

        theta = st.get_parameters()
        u_x, aux_x = t_x.rhs(theta, 0.0, jax.random.PRNGKey(3))
        u_s, aux_s = t_s.rhs(theta, 0.0, jax.random.PRNGKey(3))
        scale = np.abs(np.asarray(u_x)).max()
        np.testing.assert_allclose(np.asarray(u_s), np.asarray(u_x),
                                   atol=5e-4 * scale,
                                   err_msg=f"update (chunk={chunk})")
        np.testing.assert_allclose(
            np.asarray(aux_s["ev"]), np.asarray(aux_x["ev"]),
            atol=5e-5 * np.abs(np.asarray(aux_x["ev"])).max(),
            err_msg=f"spectrum (chunk={chunk})")


def test_tri2_target_block_override(ctx1):
    """Round 5: tri2_bounds emits MXU-aligned panels with the remainder
    merged into the last one, and TDVPConfig.tri2_target_block overrides
    the width (the multichip dryrun's compile-budget knob). Identical
    statistics at any K."""
    from vmc_pde_tpu.parallel import stats as pstats
    from vmc_pde_tpu.utils.dtypes import resolve

    assert pstats.tri2_bounds(9264) == tuple(
        [i * 512 for i in range(18)] + [9264])
    assert pstats.tri2_bounds(9264, 4096) == (0, 4096, 9264)
    assert pstats.tri2_bounds(100) == (0, 100)

    with pytest.raises(ValueError, match="tri2_target_block"):
        make_problem(ctx1, cfg=TDVPConfig(tri2_target_block=-1))

    # K-independence of the statistics: coarse override == default
    prec = resolve("tpu")
    st, t_def = make_problem(ctx1, dim=4, n=512,
                             cfg=TDVPConfig(gram_backend="tri2",
                                            gram_precision="high"),
                             prec=prec)
    _, t_k2 = make_problem(ctx1, dim=4, n=512,
                           cfg=TDVPConfig(gram_backend="tri2",
                                          gram_precision="high",
                                          tri2_target_block=40),
                           prec=prec)
    theta_c = jnp.asarray(st.get_parameters(), prec.compute)
    params = t_def._unravel(theta_c)
    z = st.flow.latent_sample(jax.random.PRNGKey(3), params, 512,
                              dtype=prec.compute)
    x, _ = jax.vmap(st.flow.push, in_axes=(None, 0))(params, z)
    s_def = t_def._direct_stats(theta_c, 0.0, x)
    s_k2 = t_k2._direct_stats(theta_c, 0.0, x)
    a, b = np.asarray(s_def["S0"]), np.asarray(s_k2["S0"])
    # same hi/lo split numerics, different panel partition: agreement to
    # f32 sum-order noise
    np.testing.assert_allclose(b, a, atol=1e-6 * max(np.abs(a).max(), 1.0))


def test_gram_backend_tri2_rejects_other_numerics(ctx1):
    """tri2 IS the f32 'high' operating point, like sym2."""
    with pytest.raises(ValueError, match="tri2"):
        make_problem(ctx1, cfg=TDVPConfig(gram_backend="tri2",
                                          gram_precision="highest"))


def test_gram_backend_tri2_mesh_needs_shardmap(ctx8, ctx42):
    """Rounds 4-5: explicit tri2 on a multi-device mesh rides the
    shard_map stats path (local strips, one psum) -- accepted on dp-only
    AND (round 5) dp x tp meshes, where the mesh flattens into the
    sample axis. On configs ineligible for it
    (stats_partitioning='gspmd'), the K+1 split dot_generals would each
    all-reduce separately under GSPMD, so the explicit override must
    still fail loudly."""
    from vmc_pde_tpu.utils.dtypes import resolve

    for ctx in (ctx8, ctx42):
        _, t = make_problem(ctx, cfg=TDVPConfig(gram_backend="tri2",
                                                gram_precision="high"),
                            prec=resolve("tpu"))
        assert t._use_tri2 and t._stats_shardmap

    for ctx in (ctx8, ctx42):
        cfg = TDVPConfig(gram_backend="tri2", gram_precision="high",
                         stats_partitioning="gspmd")
        with pytest.raises(ValueError, match="shard_map"):
            make_problem(ctx, cfg=cfg, prec=resolve("tpu"))


def test_gram_backend_sym2_rejects_other_numerics(ctx1):
    """sym2 IS the f32 'high' operating point; explicit overrides at other
    precision configurations must fail loudly rather than silently change
    the statistics class."""
    with pytest.raises(ValueError, match="sym2"):
        make_problem(ctx1, cfg=TDVPConfig(gram_backend="sym2",
                                          gram_precision="highest"))


def test_gram_backend_validation(ctx1):
    with pytest.raises(ValueError, match="gram_backend"):
        make_problem(ctx1, cfg=TDVPConfig(gram_backend="nope"))


def test_gram_backend_auto_is_xla_off_tpu(ctx1):
    """'auto' must pick the plain matmul off-TPU: syrk is a single-device
    TPU kernel, and sym2's 2-pass bf16 split only beats a backend whose
    f32 matmul is bf16-emulated (on CPU 'high' is one true-f32 pass --
    faster AND more accurate than the split)."""
    st, tdvp = make_problem(ctx1, cfg=TDVPConfig(gram_backend="auto"))
    assert not tdvp._use_syrk
    assert not tdvp._use_sym2


def test_minsr_matches_eigh_underdetermined(ctx1):
    """P >> N regime (the one minSR exists for): the kernel-space solve must
    reproduce the spectral pseudo-inverse's minimum-norm update -- both cut
    the same null space and filter the same nonzero modes -- and expose the
    full nonzero spectrum ev = mu/N."""
    cfg_e = TDVPConfig(solver_method="eigh")
    cfg_m = TDVPConfig(solver_method="minsr")
    st, t_e = make_problem(ctx1, dim=4, n=64, cfg=cfg_e)
    _, t_m = make_problem(ctx1, dim=4, n=64, cfg=cfg_m)
    assert t_m.n_params > t_m.n_samples  # underdetermined, rank <= N-1
    key = jax.random.PRNGKey(11)
    theta = st.get_parameters()
    u_e, a_e = t_e.rhs(theta, 0.0, key)
    u_m, a_m = t_m.rhs(theta, 0.0, key)
    cos = float(u_e @ u_m / (jnp.linalg.norm(u_e) * jnp.linalg.norm(u_m)))
    assert cos > 0.9999, cos
    np.testing.assert_allclose(
        float(jnp.linalg.norm(u_m - u_e)) / float(jnp.linalg.norm(u_e)),
        0.0, atol=1e-3)
    # spectra agree on the nonzero modes: eigh's top-N of the (P, P) Gram
    # == kernel mu/N
    ev_e = np.sort(np.asarray(a_e["ev"]))[-8:]
    ev_m = np.sort(np.asarray(a_m["ev"]))[-8:]
    np.testing.assert_allclose(ev_m, ev_e, rtol=1e-8)
    assert a_m["ev"].shape[0] == t_m.n_samples
    # per-mode SNR agrees on the dominant modes (kernel-basis identity)
    snr_e = np.asarray(a_e["snr"])[np.argsort(np.asarray(a_e["ev"]))][-4:]
    snr_m = np.asarray(a_m["snr"])[np.argsort(np.asarray(a_m["ev"]))][-4:]
    np.testing.assert_allclose(snr_m, snr_e, rtol=1e-5)


def test_minsr_matches_eigh_overdetermined_physics(ctx1):
    """N > P still works (T has N - P null modes, filtered like noise
    modes) and drives the exact diffusion covariance flow."""
    cfg_m = TDVPConfig(solver_method="minsr")
    st, t_m = make_problem(ctx1, dim=2, n=4096, cfg=cfg_m)
    theta = st.get_parameters()
    u_m, a_m = t_m.rhs(theta, 0.0, jax.random.PRNGKey(12))
    assert not bool(a_m["nan"])
    assert float(a_m["solver_res"]) < 1e-6
    eps = 1e-4
    st.set_parameters(theta + eps * u_m)
    cov1 = model_covariance(st)
    st.set_parameters(theta)
    cov0 = model_covariance(st)
    np.testing.assert_allclose((cov1 - cov0) / eps, 2 * np.eye(2), atol=0.3)


def test_minsr_config_validation(ctx1):
    with pytest.raises(ValueError):
        make_problem(ctx1, dim=2, n=1024,
                     cfg=TDVPConfig(solver_method="minsr",
                                    solve_on_device=False))
    with pytest.raises(ValueError, match="SExp"):
        make_problem(ctx1, dim=2, n=1024,
                     cfg=TDVPConfig(solver_method="minsr",
                                    compute_sexp=True))


def test_minsr_chunked_matches_direct(ctx1):
    """Streaming minSR (round-3 item: T assembled in sample-chunk pairs, the
    (N, P) O matrix never materializes) must reproduce the direct path on
    identical samples. The regularized kernel inverse amplifies last-bit
    differences in T by up to ~1/svd_tol on threshold modes, hence the
    looser update tolerance; the spectrum itself matches tightly."""
    cfg_d = TDVPConfig(solver_method="minsr")
    cfg_c = TDVPConfig(solver_method="minsr", chunk_size=512)
    st, td = make_problem(ctx1, dim=4, n=2048, cfg=cfg_d)
    _, tc = make_problem(ctx1, dim=4, n=2048, cfg=cfg_c)
    key = jax.random.PRNGKey(3)
    theta = st.get_parameters()
    u1, a1 = td.rhs(theta, 0.0, key)
    u2, a2 = tc.rhs(theta, 0.0, key)
    np.testing.assert_allclose(np.asarray(u2), np.asarray(u1),
                               rtol=2e-4, atol=1e-7)
    np.testing.assert_allclose(np.asarray(a2["ev"]), np.asarray(a1["ev"]),
                               rtol=1e-7, atol=1e-12)
    np.testing.assert_allclose(float(a2["entropy"]), float(a1["entropy"]),
                               rtol=1e-10)
    assert float(a1["solver_res"]) < 1e-8
    assert float(a2["solver_res"]) < 1e-8
    np.testing.assert_allclose(float(a2["tdvp_error"]),
                               float(a1["tdvp_error"]), rtol=1e-4,
                               atol=1e-8)


def test_minsr_chunked_sharded(ctx8):
    """Streaming minSR composes with the dp mesh."""
    cfg = TDVPConfig(solver_method="minsr", chunk_size=512)
    st, tc = make_problem(ctx8, dim=2, n=2048, cfg=cfg)
    u, aux = tc.rhs(st.get_parameters(), 0.0, jax.random.PRNGKey(12))
    assert not bool(aux["nan"])
    assert float(aux["solver_res"]) < 1e-8


def test_minsr_sharded_matches_single_device(ctx8, ctx1):
    """minSR under the 8-way dp mesh: the O (N, P) matrix is sample-sharded,
    the N x N kernel T = O O^T contracts the UNSHARDED param axis (XLA
    inserts the collectives), and the result must equal the single-device
    solve on the same exact-latent sample stream."""
    cfg = TDVPConfig(solver_method="minsr")
    st1, t1 = make_problem(ctx1, dim=2, n=2048, cfg=cfg)
    st8, t8 = make_problem(ctx8, dim=2, n=2048, cfg=cfg)
    theta = st1.get_parameters()
    key = jax.random.PRNGKey(17)
    u1, a1 = t1.rhs(theta, 0.0, key)
    u8, a8 = t8.rhs(theta, 0.0, key)
    np.testing.assert_allclose(np.asarray(u8), np.asarray(u1),
                               rtol=1e-7, atol=1e-10)
    # both residuals sit at the f64 noise floor; same order is the contract
    assert float(a8["solver_res"]) < 1e-12 and float(a1["solver_res"]) < 1e-12
    np.testing.assert_allclose(np.asarray(a8["ev"])[-8:],
                               np.asarray(a1["ev"])[-8:], rtol=1e-9)


def test_minsr_rejects_diagonal_shift(ctx1):
    with pytest.raises(ValueError, match="diagonal_shift"):
        make_problem(ctx1, dim=2, n=1024,
                     cfg=TDVPConfig(solver_method="minsr",
                                    diagonal_shift=0.01))


def test_forced_syrk_rejects_non_f32_high(ctx1):
    """gram_backend='syrk' implements exactly the f32/HIGH 3-pass split;
    forcing it under f64 compute or gram_precision='highest' must raise
    instead of silently degrading statistics."""
    with pytest.raises(ValueError, match="syrk"):
        make_problem(ctx1, dim=2, n=512,
                     cfg=TDVPConfig(gram_backend="syrk"))  # prec f64 default
    from vmc_pde_tpu.utils.dtypes import resolve

    with pytest.raises(ValueError, match="syrk"):
        make_problem(ctx1, dim=2, n=512, prec=resolve("tpu"),
                     cfg=TDVPConfig(gram_backend="syrk",
                                    gram_precision="highest"))


def test_adaptive_attempt_nan_flag_covers_all_stages(ctx1):
    """A NaN born in a LATER stage of an adaptive attempt must surface in
    the recorded (first-stage) info's nan flag -- otherwise a final-step
    divergence is never detected (driver aborts via this flag only)."""
    cfg = TDVPConfig(compute_sexp=True)
    st, tdvp = make_problem(ctx1, dim=2, n=512, cfg=cfg)
    theta = jnp.asarray(st.get_parameters())
    # huge dt drives the predictor stages to NaN while stage 0 stays clean
    dy1, err, aux = tdvp.heun_attempt(theta, 0.0, 1e12,
                                      jax.random.PRNGKey(3))
    assert bool(aux["nan"]) or np.isfinite(float(err))


def test_eloc_clip_tames_outlier(ctx1):
    """Winsorized Eloc (eloc_clip, the robust form of the reference's
    commented-out clip at tdvp.py:123) must bound the influence of a tail
    event: with heavy-tailed Student-t samples the clipped force stays
    within a factor of the unclipped MEDIAN-regime force, and the clip is
    a no-op for well-behaved (Gaussian) statistics."""
    cfg0 = TDVPConfig()
    cfgc = TDVPConfig(eloc_clip=30.0)
    st, t0 = make_problem(ctx1, dim=4, n=2048, latent_name="Student_t",
                          cfg=cfg0)
    _, tc = make_problem(ctx1, dim=4, n=2048, latent_name="Student_t",
                         cfg=cfgc)
    theta = st.get_parameters()
    key = jax.random.PRNGKey(9)
    u0, a0 = t0.rhs(theta, 0.0, key)
    uc, ac = tc.rhs(theta, 0.0, key)
    # clipping bounds the heavy-tail influence: |Eloc| diagnostics shrink
    assert float(ac["eloc_var"]) <= float(a0["eloc_var"]) + 1e-12
    assert float(ac["max_grad"]) <= float(a0["max_grad"]) + 1e-12
    assert np.isfinite(np.asarray(uc)).all()
    # Gauss: exactly a no-op at 30 robust sigmas
    stg, tg0 = make_problem(ctx1, dim=4, n=2048, cfg=cfg0)
    _, tgc = make_problem(ctx1, dim=4, n=2048, cfg=cfgc)
    th = stg.get_parameters()
    ug0, _ = tg0.rhs(th, 0.0, jax.random.PRNGKey(10))
    ugc, _ = tgc.rhs(th, 0.0, jax.random.PRNGKey(10))
    np.testing.assert_allclose(np.asarray(ugc), np.asarray(ug0),
                               rtol=1e-3, atol=1e-9)


def test_eloc_clip_rejects_chunked(ctx1):
    with pytest.raises(ValueError, match="eloc_clip"):
        make_problem(ctx1, dim=2, n=1024,
                     cfg=TDVPConfig(eloc_clip=5.0, chunk_size=256))


def test_sexp_matfree_matches_dense(ctx1):
    """The matrix-free S-metric quadratic (one jvp pass, TDVP._sexp_quad)
    must equal v^T SExp v against the dense (P, P) SExp on identical
    samples -- the validation VERDICT item 3 asks for before trusting it at
    P where the dense matrix cannot be formed."""
    cfg_d = TDVPConfig(sexp_mode="dense")
    cfg_m = TDVPConfig(sexp_mode="matfree")
    st, td = make_problem(ctx1, dim=3, n=2048, cfg=cfg_d)
    _, tm = make_problem(ctx1, dim=3, n=2048, cfg=cfg_m)
    theta = st.get_parameters()
    key = jax.random.PRNGKey(5)
    _, a_d = td.rhs(theta, 0.0, key)
    _, a_m = tm.rhs(theta, 0.0, key)  # same key -> identical exact draws
    S = np.asarray(a_d["SExp"], dtype=np.float64)
    rng = np.random.default_rng(0)
    for _ in range(3):
        v = rng.normal(size=S.shape[0]) * 1e-3
        dense = float(v @ S @ v)
        mf = float(tm.sexp_norm(v))
        np.testing.assert_allclose(mf, dense, rtol=1e-8)
    # the matfree rhs must NOT have formed a (P, P) SExp
    assert "SExp" not in a_m and not tm.cfg.compute_sexp


def test_sexp_matfree_weighted_matches_dense(ctx1):
    """Under IS tempering (is_gamma < 1) the matrix-free S-metric must
    reproduce v^T SExp v of the dense SELF-NORMALIZED WEIGHTED SExp
    (gram(w * logp^2) with w-centered O) on identical tempered draws --
    the round-3 review fix: _sexp_quad previously dropped the weights,
    biasing the adaptive error norm toward the tail-tempered proposal."""
    cfg_d = TDVPConfig(sexp_mode="dense", is_gamma=0.6)
    cfg_m = TDVPConfig(sexp_mode="matfree", is_gamma=0.6)
    st, td = make_problem(ctx1, dim=3, n=2048, latent_name="Student_t",
                          cfg=cfg_d)
    _, tm = make_problem(ctx1, dim=3, n=2048, latent_name="Student_t",
                         cfg=cfg_m)
    theta = st.get_parameters()
    key = jax.random.PRNGKey(7)
    _, a_d = td.rhs(theta, 0.0, key)
    _, a_m = tm.rhs(theta, 0.0, key)  # same key -> identical tempered draws
    S = np.asarray(a_d["SExp"], dtype=np.float64)
    rng = np.random.default_rng(1)
    for _ in range(3):
        v = rng.normal(size=S.shape[0]) * 1e-3
        dense = float(v @ S @ v)
        mf = float(tm.sexp_norm(v))
        np.testing.assert_allclose(mf, dense, rtol=1e-8)
    assert "SExp" not in a_m


def test_is_tempering_weights_and_stats(ctx1):
    """Tail-tempered IS (cfg.is_gamma, round-3 Student-t item): (a) the
    latent-level importance weights are bounded and reproduce target
    expectations; (b) uniform weights (log_w = 0) leave _direct_stats
    EXACTLY unchanged; (c) invalid configurations are rejected."""
    from vmc_pde_tpu.models import latent as latent_mod

    dim = 4
    lp = latent_mod.init_params(dim, "Student_t", dtype=jnp.float64)
    key = jax.random.PRNGKey(0)
    zt = latent_mod.sample("Student_t", key, lp, dim, 200_000, jnp.float64)
    zq, log_w = latent_mod.student_t_tempered_sample(
        key, lp, dim, 200_000, 0.6, jnp.float64)
    w = np.exp(np.asarray(log_w) - np.asarray(log_w).max())
    w = w / w.mean()
    assert w.max() < 2.0  # bounded: proposal dominates the tails
    ess = 1.0 / np.mean(w**2)
    assert ess > 0.8  # mild tempering keeps the effective sample size high
    f = lambda z: np.tanh(np.sum(np.asarray(z) ** 2, axis=1))
    np.testing.assert_allclose((w * f(zq)).mean(), f(zt).mean(), rtol=5e-3)

    # (b) uniform-weight plumbing identity
    cfg = TDVPConfig(compute_snr=True, compute_sexp=True)
    st, td = make_problem(ctx1, dim=2, n=1024, cfg=cfg)
    theta_c = jnp.asarray(st.get_parameters(), jnp.float64)
    x, _ = st.sample(1024, key=jax.random.PRNGKey(1))
    s_plain = td._direct_stats(theta_c, 0.0, x)
    s_w = td._direct_stats(theta_c, 0.0, x, log_w=jnp.zeros(x.shape[0]))
    for k in ("F0", "S0", "A", "SExp", "eloc_mean", "eloc_var"):
        np.testing.assert_allclose(np.asarray(s_w[k]),
                                   np.asarray(s_plain[k]),
                                   rtol=1e-12, atol=1e-14, err_msg=k)

    # (c) rejections
    with pytest.raises(ValueError, match="Student_t"):
        make_problem(ctx1, dim=2, n=256, cfg=TDVPConfig(is_gamma=0.6))
    with pytest.raises(ValueError, match="direct"):
        make_problem(ctx1, dim=2, n=256, latent_name="Student_t",
                     cfg=TDVPConfig(is_gamma=0.6, solver_method="minsr"))
    with pytest.raises(ValueError, match="is_gamma"):
        make_problem(ctx1, dim=2, n=256, latent_name="Student_t",
                     cfg=TDVPConfig(is_gamma=1.7))


def test_is_tempering_rhs_finite(ctx1):
    """A tempered Student-t diffusion RHS runs end to end: finite update,
    solver residual at the usual floor, observables from the TARGET."""
    cfg = TDVPConfig(is_gamma=0.7)
    st, td = make_problem(ctx1, dim=4, n=8192, latent_name="Student_t",
                          cfg=cfg)
    u, aux = td.rhs(st.get_parameters(), 0.0, jax.random.PRNGKey(3))
    assert not bool(aux["nan"])
    assert np.isfinite(np.asarray(u)).all()
    assert float(aux["solver_res"]) < 1e-5
    # entropy of the standard d=4 Student-t(nu=2): finite, near the
    # value the untempered estimator reports
    st2, td2 = make_problem(ctx1, dim=4, n=8192, latent_name="Student_t",
                            cfg=TDVPConfig())
    _, aux2 = td2.rhs(st2.get_parameters(), 0.0, jax.random.PRNGKey(3))
    np.testing.assert_allclose(float(aux["entropy"]),
                               float(aux2["entropy"]), atol=0.2)


def test_aot_executable_cache_roundtrip(tmp_path, ctx1, monkeypatch):
    """warm_aot persists the compiled fused-pair executable; a FRESH TDVP
    (new process semantics) loads it from disk and produces identical
    results (utils/aot.py -- the per-process recompile killer, measured
    548 s -> 31 s on TPU). XLA:CPU AOT deserialization is flaky
    (aot.SUPPORTED_BACKENDS docstring), so CI exercises the cache
    plumbing with FAKE serializers; the real round-trip is a TPU artifact
    (BENCHMARKS.md)."""
    import os

    from jax.experimental import serialize_executable as se
    from vmc_pde_tpu.utils import aot

    calls = {"ser": 0, "deser": 0}
    store = {}

    def fake_serialize(compiled):
        calls["ser"] += 1
        store["obj"] = compiled
        return b"payload-bytes", None, None

    def fake_deserialize(payload, in_tree, out_tree, backend=None,
                         execution_devices=None):
        calls["deser"] += 1
        assert payload == b"payload-bytes"
        assert execution_devices is not None and len(execution_devices) == 1
        return store["obj"]

    monkeypatch.setattr(se, "serialize", fake_serialize)
    monkeypatch.setattr(se, "deserialize_and_load", fake_deserialize)
    monkeypatch.setattr(aot, "SUPPORTED_BACKENDS", ("tpu", "cpu"))

    cfg = TDVPConfig()
    st, td = make_problem(ctx1, dim=2, n=512, cfg=cfg)
    td.warm_aot(str(tmp_path), kind="pair", verbose=False)
    assert "pair" in td._aot and calls == {"ser": 1, "deser": 0}
    files = [f for f in os.listdir(tmp_path) if f.endswith(".aotx")]
    assert len(files) == 1 and files[0].startswith("heun_pair-")

    theta = st.get_parameters()
    key = jax.random.PRNGKey(4)
    dy1, aux1 = td.heun_pair(theta, 0.0, 1e-3, key)

    # fresh problem: warm_aot must LOAD (no new serialize) and match
    st2, td2 = make_problem(ctx1, dim=2, n=512, cfg=cfg)
    td2.warm_aot(str(tmp_path), kind="pair")
    assert calls == {"ser": 1, "deser": 1}
    assert len([f for f in os.listdir(tmp_path)
                if f.endswith(".aotx")]) == 1
    dy2, aux2 = td2.heun_pair(theta, 0.0, 1e-3, key)
    np.testing.assert_array_equal(np.asarray(dy1), np.asarray(dy2))
    np.testing.assert_array_equal(np.asarray(aux1["update"]),
                                  np.asarray(aux2["update"]))

    # jit path agrees with the AOT-dispatched path (same trace)
    st3, td3 = make_problem(ctx1, dim=2, n=512, cfg=cfg)
    dy3, _ = td3.heun_pair(theta, 0.0, 1e-3, key)
    np.testing.assert_array_equal(np.asarray(dy1), np.asarray(dy3))

    # corrupt entry falls back to compilation transparently
    p = tmp_path / files[0]
    p.write_bytes(b"garbage")
    st4, td4 = make_problem(ctx1, dim=2, n=512, cfg=cfg)
    td4.warm_aot(str(tmp_path), kind="pair")
    assert calls["ser"] == 2  # recompiled + rewrote the entry
    dy4, _ = td4.heun_pair(theta, 0.0, 1e-3, key)
    np.testing.assert_array_equal(np.asarray(dy1), np.asarray(dy4))


def test_aot_multi_and_driver_wiring(tmp_path, ctx1):
    """aot_dir wiring: the driver warms pair+multi executables; on a CPU
    backend the disk cache no-ops (SUPPORTED_BACKENDS gating) but the
    pre-compiled executables are still used, and repeat runs match."""
    import os

    from vmc_pde_tpu.config import preset
    from vmc_pde_tpu.driver import run

    cfg = preset("diffusion", dim=2, offset=(0.0, 0.0), latent_name="Gauss",
                 n_samples_tdvp=256, n_samples_obs=256, t_end=0.005,
                 precision="f64", verbose=False, steps_per_dispatch=2,
                 aot_dir=str(tmp_path), grid_points=20)
    # dim==2 builds a grid, which disables multi dispatch -- drop it
    cfg = __import__("dataclasses").replace(cfg, dim=3, offset=(0.0,) * 3)
    state, rec = run(cfg, max_steps=4)
    # cpu backend: gated -- no cache entries written, run still fine
    assert [f for f in os.listdir(tmp_path) if f.endswith(".aotx")] == []
    infos = rec.as_arrays()
    assert np.isfinite(infos["entropy"]).all()

    state2, rec2 = run(cfg, max_steps=4)
    np.testing.assert_allclose(np.asarray(rec2.as_arrays()["entropy"]),
                               np.asarray(infos["entropy"]), rtol=1e-12)


def test_aot_adaptive_multi_roundtrip(tmp_path, ctx1, monkeypatch):
    """warm_aot kind='amulti': the on-device adaptive multi-step program
    serializes/loads through the AOT cache (fake serializers, as in the
    pair round-trip test) and the AOT-dispatched call matches the jit
    path bit-for-bit."""
    import os

    from jax.experimental import serialize_executable as se
    from vmc_pde_tpu.utils import aot

    calls = {"ser": 0, "deser": 0}
    store = {}

    def fake_serialize(compiled):
        calls["ser"] += 1
        store["obj"] = compiled
        return b"amulti-bytes", None, None

    def fake_deserialize(payload, in_tree, out_tree, backend=None,
                         execution_devices=None):
        calls["deser"] += 1
        return store["obj"]

    monkeypatch.setattr(se, "serialize", fake_serialize)
    monkeypatch.setattr(se, "deserialize_and_load", fake_deserialize)
    monkeypatch.setattr(aot, "SUPPORTED_BACKENDS", ("tpu", "cpu"))

    st, td = make_problem(ctx1, dim=2, n=512, cfg=TDVPConfig())
    td.warm_aot(str(tmp_path), kind="amulti", K=3, tol=1e-6,
                max_step=5e-3, t_end=0.05)
    assert ("amulti", "heun", 3, False) in td._aot
    assert calls == {"ser": 1, "deser": 0}
    files = [f for f in os.listdir(tmp_path) if f.endswith(".aotx")]
    assert len(files) == 1 and files[0].startswith("heun_amulti_k3-")

    theta = st.get_parameters()
    keys = jnp.stack([jax.random.PRNGKey(40 + i) for i in range(3)])
    res1 = td.adaptive_multi(theta, 0.0, 1e-3, 1e-3, keys, 0.05, 1e-12,
                             1e-6, 5e-3)

    # fresh problem: loads the entry, same results; jit path agrees
    st2, td2 = make_problem(ctx1, dim=2, n=512, cfg=TDVPConfig())
    td2.warm_aot(str(tmp_path), kind="amulti", K=3, tol=1e-6,
                 max_step=5e-3, t_end=0.05)
    assert calls == {"ser": 1, "deser": 1}
    res2 = td2.adaptive_multi(theta, 0.0, 1e-3, 1e-3, keys, 0.05, 1e-12,
                              1e-6, 5e-3)
    st3, td3 = make_problem(ctx1, dim=2, n=512, cfg=TDVPConfig())
    res3 = td3.adaptive_multi(theta, 0.0, 1e-3, 1e-3, keys, 0.05, 1e-12,
                              1e-6, 5e-3)
    for other in (res2, res3):
        np.testing.assert_array_equal(np.asarray(res1[0]),
                                      np.asarray(other[0]))
        assert float(res1[1]) == float(other[1])  # t_f
        np.testing.assert_array_equal(
            np.asarray(res1[4]["aux"]["entropy"]),
            np.asarray(other[4]["aux"]["entropy"]))
    assert bool(np.asarray(res1[4]["active"]).all())


def test_is_tempering_sharded(ctx8, ctx1):
    """Tail-tempered IS composes with the dp mesh: identical key ->
    identical proposal draws and weights, so the sharded weighted
    statistics match single-device up to reduction reordering."""
    cfg = TDVPConfig(is_gamma=0.7)
    st1, t1 = make_problem(ctx1, dim=3, n=2048, latent_name="Student_t",
                           cfg=cfg)
    st8, t8 = make_problem(ctx8, dim=3, n=2048, latent_name="Student_t",
                           cfg=cfg)
    theta = st1.get_parameters()
    key = jax.random.PRNGKey(9)
    u1, a1 = t1.rhs(theta, 0.0, key)
    u8, a8 = t8.rhs(theta, 0.0, key)
    # identical draws (entropy bit-close); the update tolerates more: the
    # heavy-tailed weighted Gram's near-cutoff modes amplify collective
    # reduction reordering by ~1/svd_tol
    np.testing.assert_allclose(float(a8["entropy"]), float(a1["entropy"]),
                               rtol=1e-10)
    a, b = np.asarray(u1), np.asarray(u8)
    np.testing.assert_allclose(b, a, rtol=5e-3, atol=1e-5)
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert cos > 0.999999, cos


def test_gram_f64_requires_x64(ctx1, monkeypatch):
    """gram_precision='f64' without x64 would silently demote to f32."""
    import jax as _jax

    real_read = _jax.config.read

    def fake_read(name):
        if name == "jax_enable_x64":
            return False
        return real_read(name)

    monkeypatch.setattr(_jax.config, "read", fake_read)
    with pytest.raises(ValueError, match="x64"):
        make_problem(ctx1, dim=2, n=256,
                     cfg=TDVPConfig(gram_precision="f64"))


def test_rk3_triple_fused_matches_plain(ctx1):
    """The fused SSPRK3 triple (one dispatch) agrees with three per-call
    rhs() stages through FixedStepper mode='RK3' (same RNG fold_in
    sequence; fp-noise-level program differences only)."""
    from vmc_pde_tpu.solver.steppers import FixedStepper

    st, tdvp = make_problem(ctx1, dim=2, n=2048)
    assert tdvp.fused_steps_available
    theta = st.get_parameters()
    key = jax.random.PRNGKey(78)

    def f(y, t, k, intStep=0):
        u, aux = tdvp.rhs(y, t, k, intStep=intStep)
        return u, aux

    s_plain = FixedStepper(timeStep=1e-4, maxStep=1e-3, mode="RK3")
    s_fused = FixedStepper(timeStep=1e-4, maxStep=1e-3, mode="RK3",
                           pair_fn=tdvp.rk3_triple)
    r1 = s_plain.step(0.0, f, theta, key)
    r2 = s_fused.step(0.0, f, theta, key)
    assert r1.dt_used == r2.dt_used
    np.testing.assert_allclose(np.asarray(r2.y), np.asarray(r1.y),
                               rtol=1e-6, atol=1e-12)


def test_rk23_attempt_fused_matches_plain(ctx1):
    """The fused Bogacki-Shampine attempt (one dispatch, in-jit S-metric
    error) agrees with four per-call rhs() stages through AdaptiveRK23."""
    from vmc_pde_tpu.driver import s_metric_norm
    from vmc_pde_tpu.solver.steppers import AdaptiveRK23

    cfg = TDVPConfig(compute_sexp=True)
    st, tdvp = make_problem(ctx1, dim=2, n=2048, cfg=cfg)
    theta = st.get_parameters()
    key = jax.random.PRNGKey(79)

    def f(y, t, k, intStep=0):
        u, aux = tdvp.rhs(y, t, k, intStep=intStep)
        f.SExp = tdvp.SExp
        return u, aux

    a_plain = AdaptiveRK23(timeStep=1e-4, tol=1e-5, maxStep=1e-3)
    a_fused = AdaptiveRK23(timeStep=1e-4, tol=1e-5, maxStep=1e-3,
                           attempt_fn=tdvp.rk23_attempt)
    r1 = a_plain.step(0.0, f, theta, key, normFunction=s_metric_norm)
    r2 = a_fused.step(0.0, f, theta, key, normFunction=s_metric_norm)
    assert r1.dt_used == r2.dt_used
    np.testing.assert_allclose(a_fused.dt, a_plain.dt, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(r2.y), np.asarray(r1.y),
                               rtol=1e-6, atol=1e-12)


def test_cholesky_use_snr_ritz_gating(ctx1):
    """use_snr on the cholesky path (round-4 item 8: previously silently
    disabled): with spectrum_topk covering the full spectrum at small P,
    the Ritz-gated Tikhonov update must track the eigh path's SNR-gated
    update, and gating with a high snr_tol must actually suppress the
    low-SNR components (shrink the update toward the high-SNR subspace)."""
    snr_tol = 10.0
    cfg_e = TDVPConfig(solver_method="eigh", use_snr=True, snr_tol=snr_tol)
    cfg_c = TDVPConfig(solver_method="cholesky", use_snr=True,
                       snr_tol=snr_tol, spectrum_topk=256)
    cfg_c0 = TDVPConfig(solver_method="cholesky", compute_snr=True,
                        spectrum_topk=256)
    st, t_e = make_problem(ctx1, dim=2, n=4096, cfg=cfg_e)
    _, t_c = make_problem(ctx1, dim=2, n=4096, cfg=cfg_c)
    _, t_c0 = make_problem(ctx1, dim=2, n=4096, cfg=cfg_c0)
    assert t_c.cfg.use_snr and t_c.cfg.compute_snr  # no silent disable

    key = jax.random.PRNGKey(33)
    theta = st.get_parameters()
    u_e, _ = t_e.rhs(theta, 0.0, key)
    u_c, a_c = t_c.rhs(theta, 0.0, key)
    u_c0, _ = t_c0.rhs(theta, 0.0, key)

    # gating engaged and suppressed something
    n_gated = int(np.sum(np.asarray(a_c["snr_topk"]) < snr_tol))
    assert n_gated > 0
    assert float(jnp.linalg.norm(u_c)) < float(jnp.linalg.norm(u_c0))

    # SNR-gated cholesky tracks SNR-gated eigh (base filters differ at
    # svd_tol-class modes, hence the cosine bar, as in
    # test_cholesky_solver_matches_eigh_physics)
    cos = float(u_e @ u_c / (jnp.linalg.norm(u_e) * jnp.linalg.norm(u_c)))
    assert cos > 0.99, cos
    # ... and is closer to it than the ungated Tikhonov update is
    d_gated = float(jnp.linalg.norm(u_c - u_e))
    d_ungated = float(jnp.linalg.norm(u_c0 - u_e))
    assert d_gated < d_ungated

    # host-solve + use_snr on cholesky has no Ritz basis: refused loudly
    with pytest.raises(ValueError, match="Ritz"):
        make_problem(ctx1, dim=2, n=256, cfg=TDVPConfig(
            solver_method="cholesky", use_snr=True,
            solve_on_device=False))
    with pytest.raises(ValueError, match="Ritz"):
        make_problem(ctx1, dim=2, n=256, cfg=TDVPConfig(
            solver_method="cholesky", use_snr=True, spectrum_topk=0))


def test_gram_precision_f64acc(ctx1):
    """'f64acc': f32 per-chunk contraction, exact f64 cross-chunk
    accumulation (no f64 matmul emulation -- the d=32 TPU toolchain
    blocker documented at stats.PRECISIONS). The accumulated statistics
    must sit strictly between plain f32 'high' and true-f64 'f64':
    much closer to f64 than 'high' is, at identical per-chunk numerics."""
    import jax

    from vmc_pde_tpu.utils.dtypes import resolve

    prec = resolve("tpu")  # f32 compute, x64 on
    n, chunk = 8192, 256

    def build(gp):
        return make_problem(ctx1, dim=4, n=n,
                            cfg=TDVPConfig(gram_precision=gp,
                                           chunk_size=chunk), prec=prec)

    st, t_acc = build("f64acc")
    _, t_hi = build("high")
    _, t_f64 = build("f64")
    assert t_acc.cfg.svd_tol < t_hi.cfg.svd_tol  # tighter auto floor

    theta_c = jnp.asarray(st.get_parameters(), prec.compute)
    params = t_acc._unravel(theta_c)
    z = st.flow.latent_sample(jax.random.PRNGKey(3), params, n,
                              dtype=prec.compute)
    x, _ = jax.vmap(st.flow.push, in_axes=(None, 0))(params, z)

    s_acc = t_acc._chunked_stats(theta_c, 0.0, x)
    s_hi = t_hi._chunked_stats(theta_c, 0.0, x)
    s_f64 = t_f64._chunked_stats(theta_c, 0.0, x)
    assert s_acc["S0"].dtype == jnp.float64

    ref = np.asarray(s_f64["S0"], dtype=np.float64)
    err_acc = np.abs(np.asarray(s_acc["S0"]) - ref).max()
    err_hi = np.abs(np.asarray(s_hi["S0"], dtype=np.float64) - ref).max()
    scale = np.abs(ref).max()
    # exact accumulation kills the cross-chunk rounding: >= 4x closer to
    # the true-f64 statistics than the f32-accumulated path at 32 chunks
    assert err_acc < err_hi / 4, (err_acc, err_hi)
    assert err_acc < 1e-6 * scale

    # full rhs runs and solves from the f64 statistics
    u, aux = t_acc.rhs(st.get_parameters(), 0.0, jax.random.PRNGKey(5))
    assert not bool(aux["nan"])
    assert float(aux["solver_res"]) < 1e-5

    # direct path has no carry to upgrade: rejected loudly
    with pytest.raises(ValueError, match="chunk"):
        make_problem(ctx1, dim=4, n=512,
                     cfg=TDVPConfig(gram_precision="f64acc"), prec=prec)

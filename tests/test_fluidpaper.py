"""The fluidpaper workload (cosine-bump latent + Metropolis sampling +
advection), which is dead code in the reference (quirk Q1/Q9), runs end to
end here; plus the SanityFlow test double."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vmc_pde_tpu.config import preset
from vmc_pde_tpu.driver import build_problem, run
from vmc_pde_tpu.models.sanity import SanityFlow
from vmc_pde_tpu.utils.grid import Grid


def test_cos_dist_latent_normalized():
    """The normalized bump integrates to 1 on a grid."""
    from vmc_pde_tpu.models import latent

    g = Grid(np.ones(2) * 0.5, 200)
    lp = latent.init_params(2, "cos_dist", dtype=jnp.float64)
    vals = jax.vmap(
        lambda x: latent.cos_bump_log_prob(lp, 2, x)
    )(jnp.asarray(g.coords))
    integral = float(jnp.sum(g.bin_area * jnp.exp(vals)))
    assert abs(integral - 1.0) < 1e-3, integral


def test_fluidpaper_advection_short_run():
    """Advection conserves mass: grid integral of the density stays ~1 and
    entropy stays finite over a short evolution."""
    cfg = preset(
        "fluidpaper",
        n_samples_tdvp=3000,
        n_samples_obs=3000,
        n_chains=100,
        dt0=1e-3,
        max_step=1e-3,
        t_end=0.02,
        precision="f64",
        verbose=False,
        grid_points=100,
    )
    state, rec = run(cfg, max_steps=15)
    infos = rec.as_arrays()
    assert np.isfinite(infos["entropy"]).all()
    assert np.isfinite(infos["solver_res"]).all()
    # normalization on the [0,1]^2 box (sym_grid=False, bound 1)
    g = Grid(np.ones(2) * 1.0, 150, sym=False)
    integral = float(state.integrate(g))
    assert abs(integral - 1.0) < 0.05, integral


def test_sanity_flow_roundtrip_and_density():
    fl = SanityFlow(dim=3)
    params = fl.init(jax.random.PRNGKey(0), dtype=jnp.float64)
    params["scale"] = jnp.array([2.0])
    x = jnp.array([1.0, -0.5, 0.25])
    z, lj = fl.forward(params, x)
    np.testing.assert_allclose(np.asarray(z), 2.0 * np.asarray(x))
    np.testing.assert_allclose(float(lj), 3 * np.log(2.0))
    x2, lj_inv = fl.inverse(params, z)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-14)
    np.testing.assert_allclose(float(lj + lj_inv), 0.0, atol=1e-14)
    # log p via change of variables: N(z; 0, I) + dim log s
    expected = (
        -1.5 * np.log(2 * np.pi) - 0.5 * float(z @ z) + 3 * np.log(2.0)
    )
    np.testing.assert_allclose(float(fl.log_prob(params, x)), expected,
                               rtol=1e-12)


def test_fluidpaper_model_vs_oracle_trajectory():
    """Quantitative advection validation (exact_dyn.py:89-96 parity): the
    INN/TDVP solution must track a deterministic RK4 particle cloud
    MCMC-initialized from the same cosine-bump density -- means within MC
    noise and covariance diagonal within 10% while both change by ~25%
    over the window."""
    from vmc_pde_tpu.driver import run
    from vmc_pde_tpu.oracle import sde

    dt, n_steps = 1e-3, 50
    cfg = preset(
        "fluidpaper",
        n_samples_tdvp=3000,
        n_samples_obs=3000,
        n_chains=100,
        dt0=dt,
        max_step=dt,
        t_end=dt * n_steps,
        precision="f64",
        verbose=False,
        grid_points=100,
    )
    state, rec = run(cfg, max_steps=n_steps)
    infos = rec.as_arrays()

    cloud = sde.mcmc_init_cloud(jax.random.PRNGKey(3), 20000, (0.25, 0.25))
    _, oinfos = sde.evolve(
        cloud, 0.0, dt, n_steps + 1, drift_name="advection_paper",
        params={"T": 5.0}, key=jax.random.PRNGKey(4),
    )
    o_x1 = np.asarray(oinfos["x1"])
    o_cov = np.asarray(oinfos["covar"])

    # model record i holds observables of the state at t_i (first-stage
    # info -- the Q10 pairing fix, steppers.py), matching oracle index i.
    # Tolerances reflect the model's MCMC observable noise at this budget:
    # 100 chains x 30 samples each are autocorrelated ACROSS records too
    # (the same chains evolve step to step), so ~5e-3 per-component swings
    # persist for many steps; per-index agreement is ~1e-2 and the
    # window-averaged mean offset is the sharper statistic.
    m_x1 = np.asarray(infos["x1"])
    m_cov = np.asarray(infos["covar"])
    for i in (10, 30, n_steps - 1):
        np.testing.assert_allclose(m_x1[i], o_x1[i], atol=1.5e-2)
        np.testing.assert_allclose(np.diag(m_cov[i]), np.diag(o_cov[i]),
                                   rtol=0.10)
    window_bias = np.abs((m_x1 - o_x1[:len(m_x1)]).mean(axis=0))
    assert window_bias.max() < 1.2e-2, window_bias
    # the window is discriminating: the cloud actually moved and deformed
    assert np.linalg.norm(o_x1[-1] - o_x1[0]) > 0.025
    assert abs(o_cov[-1][1, 1] / o_cov[0][1, 1] - 1) > 0.15


def test_fluidpaper_fused_mcmc_multi_matches_per_step():
    """The Metropolis chain now traces INTO the fused stepper programs with
    its state threaded through dispatches (round-3 item: the reference pmaps
    chains but re-dispatches per call, vmc_fluids/sampler.py:79-86). With
    identical keys, K batched steps (heun_multi) must be RNG-IDENTICAL to K
    per-step fused pairs."""
    def make():
        cfg = preset(
            "fluidpaper", n_samples_tdvp=640, n_samples_obs=640,
            n_chains=64, dt0=1e-3, max_step=1e-3, precision="f64",
            verbose=False,
        )
        from vmc_pde_tpu.driver import build_problem

        state, tdvp, stepper, eq, grid = build_problem(cfg)
        return state, tdvp

    state, tdvp = make()
    assert tdvp._mcmc_fused and tdvp.fused_steps_available

    theta0 = state.get_parameters()
    keys = [jax.random.PRNGKey(100 + i) for i in range(3)]
    ts = [0.0, 1e-3, 2e-3]

    # per-step fused pairs
    theta = theta0
    accs, entropies = [], []
    for t, k in zip(ts, keys):
        dy, aux = tdvp.heun_pair(theta, t, 1e-3, k)
        theta = theta + dy
        accs.append(tdvp.sampler.last_info.acceptance_rate)
        entropies.append(float(aux["entropy"]))
    assert all(0.05 < a < 0.95 for a in accs), accs

    # one batched dispatch, fresh problem (fresh chain state)
    state2, tdvp2 = make()
    theta_m, auxs = tdvp2.heun_multi(theta0, ts, [1e-3] * 3,
                                     jnp.stack(keys))
    # identical chain stream: per-step observables reproduce to reduction-
    # reordering noise; theta to the same tolerance as the exact-latent
    # multistep contract (test_multistep.py -- the regularized solve
    # amplifies last-bit reduction reordering between the two programs)
    ent_m = np.asarray(auxs["entropy"])
    # step 0 starts from identical (theta, chain state, key): bit-identical
    # samples, so entropy matches to reduction-reordering noise; later steps
    # inherit the regularized solve's amplification of that noise
    np.testing.assert_allclose(ent_m[0], entropies[0], rtol=1e-12)
    np.testing.assert_allclose(ent_m, np.asarray(entropies), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(theta_m), np.asarray(theta),
                               rtol=2e-3, atol=1e-6)
    # acceptance counts recorded per step
    assert (np.asarray(auxs["mcmc_proposed"]) > 0).all()


def test_fluidpaper_fused_mcmc_dp4tp2():
    """Fused MCMC on the 2-D (dp x tp) mesh: chains shard over dp while the
    Gram result shards over tp."""
    from vmc_pde_tpu.models.state import VarState
    from vmc_pde_tpu.ops.evolution import make_equation
    from vmc_pde_tpu.parallel.mesh import ParallelCtx
    from vmc_pde_tpu.sampling.sampler import Sampler
    from vmc_pde_tpu.solver.tdvp import TDVP, TDVPConfig
    from vmc_pde_tpu.utils.dtypes import Precision
    from vmc_pde_tpu.models.flow import build_flow

    ctx = ParallelCtx.create(dp=4, tp=2)
    prec = Precision.f64_everywhere()
    fl, params = build_flow(0, dim=2, variant="affine",
                            latent_name="cos_dist", offset=(0.25, 0.25),
                            dtype=jnp.float64)
    s = Sampler(dim=2, ctx=ctx, name="cos_dist", n_chains=64,
                mcmc_info={"offset": np.array([0.25, 0.25]),
                           "bound": 0.25}, dtype=jnp.float64)
    st = VarState(fl, params, sampler=s, ctx=ctx, precision=prec)
    eq = make_equation("advection_paper", 2)
    td = TDVP(st, eq, TDVPConfig(), n_samples=1024, precision=prec)
    assert td._mcmc_fused
    dy, aux = td.heun_pair(st.get_parameters(), 0.0, 1e-3,
                           jax.random.PRNGKey(0))
    assert not bool(aux["nan"])
    assert 0.05 < td.sampler.last_info.acceptance_rate < 0.95
    assert np.isfinite(np.asarray(dy)).all()


def test_double_well_model_vs_oracle():
    """BASELINE.json config 3: anharmonic double-well Fokker-Planck
    (V(x) = -2 x^2 + x^4, bath T=0.5) with Metropolis sampling and the
    SVD-regularized TDVP solve. A temperature quench: the initial density
    is the bimodal double-well Boltzmann at T0=1.5 (the double_well
    latent, MCMC-sampled with rw proposals); coupled to the colder bath
    the momentum variance cools toward T -- validated against the jitted
    RK4 SDE oracle initialized from the same density by exact
    inverse-CDF sampling (no shared machinery)."""
    from vmc_pde_tpu.driver import run
    from vmc_pde_tpu.oracle import sde

    dt, n_steps = 2e-3, 100
    cfg = preset(
        "doubleWell",
        n_samples_tdvp=3200,
        n_samples_obs=3200,
        n_chains=400,
        dt0=dt,
        max_step=dt,
        t_end=dt * n_steps,
        precision="f64",
        verbose=False,
        grid_points=60,
    )
    state, rec = run(cfg, max_steps=n_steps)
    infos = rec.as_arrays()

    cloud = sde.double_well_init_cloud(jax.random.PRNGKey(3), 40000)
    _, oinfos = sde.evolve(
        cloud, 0.0, dt, n_steps + 1, drift_name="phase_space",
        params={"m": 1.0, "omega": 1.0, "gamma": 1.0, "T": 0.5,
                "lam": 1.0, "v2": -4.0},
        key=jax.random.PRNGKey(4),
    )
    o_x1 = np.asarray(oinfos["x1"])
    o_cov = np.asarray(oinfos["covar"])
    m_x1 = np.asarray(infos["x1"])
    m_cov = np.asarray(infos["covar"])

    # skip the first records: the persistent rw chains burn in across the
    # first TDVP steps. Per-index MEANS swing ~0.08 at this budget (400
    # autocorrelated chains on a bimodal target), so the mean check is
    # window-averaged (signed noise cancels across records; both are ~0 by
    # the double well's symmetry); covariances are checked per index.
    for i in (20, 60, n_steps - 1):
        np.testing.assert_allclose(np.diag(m_cov[i]), np.diag(o_cov[i]),
                                   rtol=0.15)
    bias = np.abs((m_x1[20:] - o_x1[20:n_steps]).mean(axis=0))
    assert bias.max() < 3e-2, bias
    # the window is discriminating: momentum variance cools toward the bath
    assert o_cov[-1][1, 1] / o_cov[0][1, 1] < 0.85
    # and the model stays normalized on the grid
    from vmc_pde_tpu.utils.grid import Grid

    g = Grid(np.ones(2) * 4.0, 150, sym=True)
    integral = float(state.integrate(g))
    assert abs(integral - 1.0) < 0.05, integral


def test_double_well_latent_normalized():
    """The quadrature-normalized double-well Boltzmann latent integrates
    to 1 on a grid (its x-marginal log Z has no closed form)."""
    from vmc_pde_tpu.models import latent

    g = Grid(np.ones(2) * 6.0, 400, sym=True)
    vals = jax.vmap(
        lambda x: latent.double_well_log_prob(None, 2, x)
    )(jnp.asarray(g.coords))
    integral = float(jnp.sum(g.bin_area * jnp.exp(vals)))
    assert abs(integral - 1.0) < 1e-3, integral
    # bimodal: the x-marginal has a local MINIMUM at 0 and maxima near +-1
    xs = jnp.stack([jnp.array([0.0, 0.0]), jnp.array([1.0, 0.0])])
    lp = jax.vmap(lambda x: latent.double_well_log_prob(None, 2, x))(xs)
    assert float(lp[1]) - float(lp[0]) > 0.5  # exp(1/1.5) barrier ratio

"""Sampler tests: exact latent paths, the repaired Metropolis path (quirk Q1),
and mesh-aware budget rounding (quirk Q3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vmc_pde_tpu.models import flow
from vmc_pde_tpu.sampling.sampler import Sampler, cos_dist_log_prob


def test_budget_rounding(ctx8):
    s = Sampler(dim=2, ctx=ctx8, name="Gauss", dtype=jnp.float64)
    assert s.rounded_budget(1000) == 1000  # 8 | 1000
    assert s.rounded_budget(1001) == 1008
    m = Sampler(dim=2, ctx=ctx8, name="cos_dist", n_chains=30,
                mcmc_info={"offset": np.zeros(2), "bound": 0.25},
                dtype=jnp.float64)
    # chain counts round up to a dp multiple so the chain-state array
    # shards evenly (30 -> 32 on dp8)
    assert m.n_chains == 32
    b = m.rounded_budget(1000)
    assert b % np.lcm(8, m.n_chains) == 0 and b >= 1000


def test_exact_gauss_offset(ctx1):
    fl, params = flow.build_flow(0, dim=2, offset=(1.0, -2.0),
                                 dtype=jnp.float64)
    s = Sampler(dim=2, ctx=ctx1, name="Gauss", dtype=jnp.float64)
    z, n = s.sample(jax.random.PRNGKey(0), fl, params, 100_000)
    assert n == 100_000
    # latent init is N(0, I); offset shifts the mean (sampler.py:86)
    np.testing.assert_allclose(
        np.mean(np.asarray(z), axis=0), [1.0, -2.0], atol=0.02
    )
    np.testing.assert_allclose(
        np.cov(np.asarray(z).T, ddof=0), np.eye(2), atol=0.02
    )


def test_metropolis_cos_dist(ctx1):
    """The Metropolis path samples the paper's cosine bump: compare empirical
    radial CDF against the analytic density (fixes quirk Q1 -- this path was
    dead code in the reference)."""
    offset = np.array([0.25, 0.25])
    s = Sampler(dim=2, ctx=ctx1, name="cos_dist", n_chains=64,
                mcmc_info={"offset": offset, "bound": 0.25},
                burn_in=200, dtype=jnp.float64)
    fl, params = flow.build_flow(0, dim=2, dtype=jnp.float64)
    z, n = s.sample(jax.random.PRNGKey(2), fl, params, 200_000)
    z = np.asarray(z)
    assert s.last_info.acceptance_rate > 0.05
    r = np.linalg.norm(z - offset, axis=-1)
    assert r.max() <= 0.25 + 1e-9
    # analytic radial pdf ~ r (1 + cos(4 pi r)); check mean radius
    rr = np.linspace(0, 0.25, 2001)
    pdf = rr * (1 + np.cos(4 * np.pi * rr))
    mean_r = np.trapezoid(rr * pdf, rr) / np.trapezoid(pdf, rr)
    np.testing.assert_allclose(r.mean(), mean_r, rtol=0.03)


def test_cos_dist_log_prob_matches_reference_formula():
    x = jnp.array([0.3, 0.35])
    off = jnp.array([0.25, 0.25])
    r = min(1.0, 4.0 * float(jnp.linalg.norm(x - off)))
    expected = np.log(0.5 * (1 + np.cos(np.pi * r)))
    np.testing.assert_allclose(
        float(cos_dist_log_prob(x, off)), expected, rtol=1e-12
    )


def test_student_t_sampler_through_state(ctx1):
    """End-to-end: Student-t latent draw + push through near-identity flow."""
    from vmc_pde_tpu.models.state import VarState
    from vmc_pde_tpu.utils.dtypes import Precision

    prec = Precision.f64_everywhere()
    fl, params = flow.build_flow(0, dim=4, latent_name="Student_t",
                                 dtype=jnp.float64)
    s = Sampler(dim=4, ctx=ctx1, name="Student_t", dtype=jnp.float64)
    st = VarState(fl, params, sampler=s, ctx=ctx1, precision=prec)
    x, logp = st.sample(50_000)
    x = np.asarray(x)
    # nu = 2 at init => heavy tails, finite mean 0
    assert x.shape == (50_000, 4)
    np.testing.assert_allclose(np.mean(x, axis=0), np.zeros(4), atol=0.25)
    # logp should match direct evaluation
    lp2 = np.asarray(st(x[:100]))
    np.testing.assert_allclose(np.asarray(logp)[:100], lp2, atol=1e-9)


def test_metropolis_f32_states_under_x64(ctx1):
    """f32 chains must survive the scan carry when global x64 is on (the
    TPU driver config: compute f32, x64 enabled for master params)."""
    from functools import partial

    import jax.numpy as jnp

    from vmc_pde_tpu.sampling.sampler import (cos_dist_log_prob,
                                              metropolis_chain,
                                              radial_proposal)

    off = jnp.zeros(2)
    init = jnp.zeros((16, 2), dtype=jnp.float32)
    samples, final, n_acc = metropolis_chain(
        jax.random.PRNGKey(0), init,
        partial(cos_dist_log_prob, offset=off), radial_proposal,
        8, {"offset": off, "bound": 0.25})
    assert final.dtype == jnp.float32
    assert samples.shape == (8 * 16, 2)


def test_random_walk_proposal_samples_unbounded_target(ctx1):
    """proposal_mode='rw' (beyond the reference): Gaussian random-walk MH
    against an UNBOUNDED standard-normal latent -- where the uniform-ball
    independence proposal cannot cover the support -- must reproduce the
    target's moments, and the between-call adaptation must drive the
    acceptance rate toward the 0.234 target."""
    s = Sampler(
        dim=3, ctx=ctx1, name="custom_normal", n_chains=64,
        latent_log_prob=lambda x: -0.5 * jnp.sum(x**2),
        proposal_mode="rw", rw_scale=5.0,  # deliberately mis-tuned
        burn_in=50, dtype=jnp.float64,
    )
    rates = []
    for i in range(6):
        z, n = s.sample(jax.random.PRNGKey(i), flow=None, params=None,
                        n=12800)
        rates.append(s.last_info.acceptance_rate)
    # adaptation moved the scale down from 5.0 and the rate toward target
    assert s.rw_scale < 5.0
    assert 0.1 < rates[-1] < 0.45, rates
    z = np.asarray(z)
    np.testing.assert_allclose(z.mean(axis=0), np.zeros(3), atol=0.08)
    np.testing.assert_allclose(np.cov(z.T, ddof=0), np.eye(3), atol=0.12)


def test_rw_pallas_conflict_rejected(ctx1):
    with pytest.raises(ValueError, match="independence"):
        Sampler(dim=2, ctx=ctx1, name="cos_dist", n_chains=128,
                proposal_mode="rw", use_pallas=True)


def test_mcmc_chains_sharded_match_single_device(ctx1, ctx8):
    """Mesh-parallel MCMC (the reference pmaps its chains,
    vmc_fluids/sampler.py:82): the dp8-sharded chain ensemble must
    reproduce single-device statistics, and the chain-state carry must be
    dp-sharded."""
    offset = np.array([0.25, 0.25])
    kw = dict(dim=2, name="cos_dist", n_chains=64,
              mcmc_info={"offset": offset, "bound": 0.25},
              burn_in=100, dtype=jnp.float64)
    s1 = Sampler(ctx=ctx1, **kw)
    s8 = Sampler(ctx=ctx8, **kw)

    key = jax.random.PRNGKey(5)
    z1, _ = s1.sample(key, flow=None, params=None, n=100_000)
    z8, _ = s8.sample(key, flow=None, params=None, n=100_000)

    # identical key + partitionable threefry -> identical draws regardless
    # of the mesh; the sharded run IS the single-device run
    np.testing.assert_allclose(np.asarray(z8), np.asarray(z1), atol=1e-12)

    # statistics are those of the bump
    r = np.linalg.norm(np.asarray(z8) - offset, axis=-1)
    rr = np.linspace(0, 0.25, 2001)
    pdf = rr * (1 + np.cos(4 * np.pi * rr))
    mean_r = np.trapezoid(rr * pdf, rr) / np.trapezoid(pdf, rr)
    np.testing.assert_allclose(r.mean(), mean_r, rtol=0.03)

    # the chain state produced by the fused-chain API is dp-sharded
    cs = s8.ensure_chain_state(jax.random.PRNGKey(7))
    fn = jax.jit(s8.make_chain_fn(), static_argnames=("n_steps",))
    zz, cs2, acc = fn(jax.random.PRNGKey(8), cs, None, n_steps=16)
    assert not cs2.sharding.is_fully_replicated
    assert zz.shape == (16 * 64, 2)
    assert 0 < int(acc) <= 16 * 64


# ---------------------------------------------------------------------------
# Randomized-QMC (scrambled Sobol) latent sampling (sampling/qmc.py).
# ---------------------------------------------------------------------------

def test_qmc_sobol_bits_match_scipy():
    """The in-jit Gray-code generator reproduces scipy's Sobol points
    bit-exactly (same Joe-Kuo direction numbers, same ordering)."""
    from scipy.stats import qmc as sqmc

    from vmc_pde_tpu.sampling import qmc

    d, n = 16, 512
    ref = sqmc.Sobol(d=d, scramble=False).random(n)
    bits = np.asarray(jax.jit(qmc.sobol_bits, static_argnums=(0, 1))(d, n))
    assert np.array_equal(bits / 2.0**30, ref)


def test_qmc_scramble_key_semantics():
    from vmc_pde_tpu.sampling import qmc

    b1 = np.asarray(qmc.scrambled_bits(jax.random.PRNGKey(0), 4, 64))
    b1b = np.asarray(qmc.scrambled_bits(jax.random.PRNGKey(0), 4, 64))
    b2 = np.asarray(qmc.scrambled_bits(jax.random.PRNGKey(1), 4, 64))
    assert np.array_equal(b1, b1b)        # same key -> same randomization
    assert not np.array_equal(b1, b2)     # fresh key -> fresh shift
    assert int(b1.max()) < 2**30
    # a digital shift preserves the net's column balance: every dyadic
    # half [0, 2^29) / [2^29, 2^30) gets exactly half the points
    top = (b1 >> 29) & 1
    np.testing.assert_array_equal(top.sum(axis=0), 32)
    # the LMS + shift preserves the (0, m, 1)-net property of every 1-D
    # projection: the first 2^m points occupy each dyadic cell of width
    # 2^-m exactly once, at every level j <= m. This holds iff the
    # scramble matrices are invertible (unit lower-triangular in GF(2)),
    # so it pins the _lms_directions construction.
    for seed in range(4):
        b = np.asarray(qmc.scrambled_bits(jax.random.PRNGKey(seed), 6, 64))
        for j in (1, 2, 3, 6):
            cells = b >> (30 - j)                       # (64, 6) in [0, 2^j)
            for dim_col in cells.T:
                counts = np.bincount(dim_col, minlength=2**j)
                np.testing.assert_array_equal(counts, 64 // 2**j)


def test_qmc_normal_variance_reduction():
    """RQMC beats MC by a wide margin on a smooth latent expectation
    (d=8, n=2048, 16 randomizations each). Measured ratio ~20-30x; the
    assertion keeps 3x margin."""
    from vmc_pde_tpu.sampling import qmc

    d, n = 8, 2048

    def stat(z):
        return float(np.mean(np.exp(-0.5 * np.sum(z**2, axis=1) / d)
                             * (1.0 + np.sum(z, axis=1) / d)))

    qs = [stat(np.asarray(qmc.normal(jax.random.PRNGKey(100 + s), n, d,
                                     dtype=jnp.float64)))
          for s in range(16)]
    ms = [stat(np.asarray(jax.random.normal(jax.random.PRNGKey(200 + s),
                                            (n, d), dtype=jnp.float64)))
          for s in range(16)]
    assert np.std(qs) < np.std(ms) / 3.0


def test_qmc_chi2_quantiles():
    """The Newton gammainc inversion hits scipy's chi2 quantiles to 1e-6
    relative across the learnable-nu range, including both 30-bit tail
    extremes, and the draws equidistribute (KS at the 1/n floor)."""
    from scipy.stats import chi2 as schi2

    from vmc_pde_tpu.sampling import qmc

    bits = jnp.asarray(
        np.array([0, 1, 2**29, 2**30 - 2, 2**30 - 1], np.uint32))
    for nu in (1.05, 2.0, 8.0, 50.0):
        q = np.asarray(qmc.chi2_from_bits(bits, nu, dtype=jnp.float64))
        u = (np.asarray(bits).astype(np.float64) + 0.5) * 2.0**-30
        exact = schi2.ppf(u, nu)
        np.testing.assert_allclose(q, exact, rtol=1e-6)
        w = np.asarray(qmc.chi2(jax.random.PRNGKey(3), nu, 4000,
                                dtype=jnp.float64))
        cdf = np.sort(schi2.cdf(w, nu))
        ks = np.abs(cdf - (np.arange(4000) + 0.5) / 4000).max()
        assert ks < 2e-3


def test_qmc_gauss_latent_matches_target_tightly(ctx1):
    """latent.sample(qmc=True) draws from the correct N(mu, S) -- and the
    sample moments sit far inside the MC noise band at the same budget."""
    from vmc_pde_tpu.models import latent

    dim, n = 4, 4096
    rng = np.random.default_rng(0)
    lp = {
        "L": jnp.asarray(0.3 * rng.standard_normal(dim * (dim - 1) // 2)),
        "L_diag": jnp.asarray(0.2 * rng.standard_normal(dim)),
        "mu": jnp.asarray([0.5, -1.0, 0.0, 2.0]),
        "dist_params": jnp.zeros((0,)),
    }
    S = np.asarray(latent.cov_matrix(lp, dim))
    z = np.asarray(latent.sample("Gauss", jax.random.PRNGKey(0), lp, dim, n,
                                 dtype=jnp.float64, qmc=True))
    mu_err = np.abs(z.mean(0) - np.asarray(lp["mu"])).max()
    cov_err = np.abs(np.cov(z.T, ddof=0) - S).max()
    # MC noise at n=4096 is ~ sqrt(2) * S_max / sqrt(n) ~ 0.04 for these
    # scales; RQMC lands ~10x tighter
    assert mu_err < 5e-3
    assert cov_err < 8e-3


def test_qmc_student_t_latent(ctx1):
    """Student-t QMC: the (dim+1)-dimensional joint net (directions +
    chi^2 radius) reproduces the t_nu covariance S * nu / (nu - 2)."""
    from vmc_pde_tpu.models import latent

    dim, n = 4, 8192
    nu = 6.0
    lp = latent.init_params(dim, "Student_t", dtype=jnp.float64)
    lp = dict(lp)
    lp["dist_params"] = jnp.asarray([np.log(nu - 1.0)])
    z = np.asarray(latent.sample("Student_t", jax.random.PRNGKey(1), lp,
                                 dim, n, dtype=jnp.float64, qmc=True))
    assert np.isfinite(z).all()
    cov = np.cov(z.T, ddof=0)
    np.testing.assert_allclose(cov, np.eye(dim) * nu / (nu - 2.0), atol=0.2)
    # heavy tails actually present: kurtosis of each marginal > Gaussian's
    k4 = (z**4).mean(axis=0) / (z**2).mean(axis=0) ** 2
    assert (k4 > 4.0).all()


def test_qmc_sharded_identical_to_single_device(ctx1, ctx8):
    """The Sobol generator is elementwise in the sample index, so the
    dp8-sharded draw IS the single-device draw (same key, same bits)."""
    fl, params = flow.build_flow(0, dim=4, latent_name="Gauss",
                                 dtype=jnp.float64, qmc=True)
    s1 = Sampler(dim=4, ctx=ctx1, name="Gauss", dtype=jnp.float64)
    s8 = Sampler(dim=4, ctx=ctx8, name="Gauss", dtype=jnp.float64)
    key = jax.random.PRNGKey(5)
    z1, _ = s1.sample(key, fl, params, 4096)
    z8, _ = s8.sample(key, fl, params, 4096)
    assert not z8.sharding.is_fully_replicated
    np.testing.assert_array_equal(np.asarray(z8), np.asarray(z1))


def test_qmc_flow_flag_threads_through(ctx1):
    """Flow(qmc=True) changes the draw; tempered Student-t sampling
    inherits the flag and stays weight-consistent."""
    fl_mc, params = flow.build_flow(0, dim=2, latent_name="Student_t",
                                    dtype=jnp.float64)
    fl_q = flow.build_flow(0, dim=2, latent_name="Student_t",
                           dtype=jnp.float64, qmc=True)[0]
    key = jax.random.PRNGKey(2)
    z_mc = fl_mc.latent_sample(key, params, 256, dtype=jnp.float64)
    z_q = fl_q.latent_sample(key, params, 256, dtype=jnp.float64)
    assert not np.allclose(np.asarray(z_mc), np.asarray(z_q))
    z, log_w = fl_q.latent_sample_tempered(key, params, 256, 0.6,
                                           dtype=jnp.float64)
    assert np.isfinite(np.asarray(log_w)).all()
    # bounded IS weights (proposal dominates the target's tails)
    assert np.asarray(log_w).max() < 2.0

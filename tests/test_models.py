"""Model-layer property tests: coupling invertibility, log-Jacobian
correctness vs autodiff, latent distribution normalization and moments.
Mirrors the reference's behavioral contract (SURVEY.md section 4): flow
invertibility round-trips and normalization."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats

from vmc_pde_tpu.models import coupling, flow, latent, mlp


def _spec(variant, global_affine=False, dim=4):
    return coupling.BlockSpec(
        ind_up=(0, 2),
        ind_down=(1, 3),
        hidden=(3,),
        variant=variant,
        global_affine=global_affine,
        out_scale=0.3,  # large enough to make the transform non-trivial
    )


@pytest.mark.parametrize("variant", coupling.VARIANTS)
@pytest.mark.parametrize("global_affine", [False, True])
def test_coupling_roundtrip_and_logjac(variant, global_affine):
    spec = _spec(variant, global_affine)
    params = coupling.init(jax.random.PRNGKey(0), spec, dtype=jnp.float64)
    if global_affine:
        params["g_scale"] = jnp.array([1.7])
        params["g_offset"] = jnp.linspace(-0.2, 0.4, spec.dim)
    x = jnp.array([0.3, -1.2, 0.7, 2.1])

    y, lj = coupling.forward(params, spec, x)
    x2, lj_inv = coupling.inverse(params, spec, y)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-12)
    np.testing.assert_allclose(float(lj + lj_inv), 0.0, atol=1e-12)

    # log|det J| against autodiff of the full Jacobian
    J = jax.jacfwd(lambda v: coupling.forward(params, spec, v)[0])(x)
    _, logdet = jnp.linalg.slogdet(J)
    np.testing.assert_allclose(float(lj), float(logdet), atol=1e-10)


def test_flow_stack_roundtrip():
    fl, params = flow.build_flow(3, dim=6, depth=4, out_scale=0.1,
                                 dtype=jnp.float64)
    x = jnp.array([0.5, -0.3, 1.1, 0.0, -2.0, 0.7])
    z, lj = fl.forward(params, x)
    x2, lj_inv = fl.inverse(params, z)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-10)
    np.testing.assert_allclose(float(lj + lj_inv), 0.0, atol=1e-10)

    # push consistency: log p from push == log p from evaluate
    x3, logp_push = fl.push(params, z)
    np.testing.assert_allclose(np.asarray(x3), np.asarray(x), atol=1e-10)
    np.testing.assert_allclose(
        float(logp_push), float(fl.log_prob(params, x)), atol=1e-10
    )


def test_gauss_log_prob_matches_scipy():
    dim = 3
    lp = latent.init_params(dim, "Gauss", dtype=jnp.float64)
    lp["L"] = jnp.array([0.3, -0.2, 0.5])
    lp["L_diag"] = jnp.array([0.1, -0.3, 0.2])
    lp["mu"] = jnp.array([1.0, -1.0, 0.5])
    S = np.asarray(latent.cov_matrix(lp, dim))
    x = jnp.array([0.2, 0.4, -0.7])
    ref = scipy.stats.multivariate_normal(np.asarray(lp["mu"]), S).logpdf(
        np.asarray(x)
    )
    np.testing.assert_allclose(
        float(latent.gauss_log_prob(lp, dim, x)), ref, rtol=1e-10
    )


def test_student_t_log_prob_matches_scipy():
    dim = 2
    lp = latent.init_params(dim, "Student_t", dtype=jnp.float64)
    lp["L"] = jnp.array([0.4])
    lp["L_diag"] = jnp.array([0.2, -0.1])
    lp["mu"] = jnp.array([0.3, -0.6])
    lp["dist_params"] = jnp.array([0.7])  # nu = e^0.7 + 1
    nu = float(np.exp(0.7) + 1)
    S = np.asarray(latent.cov_matrix(lp, dim))
    x = jnp.array([1.2, 0.1])
    ref = scipy.stats.multivariate_t(
        np.asarray(lp["mu"]), S, df=nu
    ).logpdf(np.asarray(x))
    np.testing.assert_allclose(
        float(latent.student_t_log_prob(lp, dim, x)), ref, rtol=1e-10
    )


@pytest.mark.parametrize("name", ["Gauss", "Student_t"])
def test_latent_sampling_moments(name):
    dim = 3
    lp = latent.init_params(dim, name, dtype=jnp.float64)
    lp["L"] = jnp.array([0.5, 0.0, -0.3])
    lp["L_diag"] = jnp.array([0.0, 0.2, -0.2])
    lp["mu"] = jnp.array([1.0, 0.0, -2.0])
    if name == "Student_t":
        lp["dist_params"] = jnp.array([np.log(9.0)])  # nu = 10
    n = 400_000
    z = latent.sample(name, jax.random.PRNGKey(1), lp, dim, n,
                      dtype=jnp.float64)
    S = np.asarray(latent.cov_matrix(lp, dim))
    if name == "Student_t":
        nu = 10.0
        S = S * nu / (nu - 2.0)
    emp_mean = np.mean(np.asarray(z), axis=0)
    emp_cov = np.cov(np.asarray(z).T, ddof=0)
    np.testing.assert_allclose(emp_mean, np.asarray(lp["mu"]), atol=0.03)
    np.testing.assert_allclose(emp_cov, S, atol=0.08)


def test_flow_density_normalized_2d():
    """Grid quadrature of exp(log p) over a box ~ 1 (main.py:100-105)."""
    from vmc_pde_tpu.utils.grid import Grid

    fl, params = flow.build_flow(1, dim=2, depth=4, out_scale=0.05,
                                 dtype=jnp.float64)
    g = Grid(np.ones(2) * 10.0, 150)
    logp = jax.vmap(fl.log_prob, in_axes=(None, 0))(
        params, jnp.asarray(g.coords)
    )
    integral = float(jnp.sum(g.bin_area * jnp.exp(logp)))
    assert abs(integral - 1.0) < 2e-2


def test_mlp_init_distribution():
    """Hidden kernels U[-1,1], output kernel U[-scale,scale], biases zero
    (net.py:39-48 semantics)."""
    p = mlp.init(jax.random.PRNGKey(0), 8, (16,), 4, out_scale=1e-5,
                 dtype=jnp.float64)
    assert float(jnp.max(jnp.abs(p["w"][0]))) <= 1.0
    assert float(jnp.max(jnp.abs(p["w"][-1]))) <= 1e-5
    assert float(jnp.max(jnp.abs(p["b"][0]))) == 0.0

"""Score machinery and evolution-equation tests against analytic formulas.

An exactly-identity flow (out_scale=0 -> all coupling outputs are 0) over a
standard-normal latent gives log p(x) = -d/2 log(2 pi) - |x|^2/2, for which
every operator's Eloc has a closed form -- the same oracle idea as the
reference's SanityINN (net.py:220-235)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from functools import partial

from vmc_pde_tpu.models import flow
from vmc_pde_tpu.ops import evolution, score


def identity_flow(dim, latent="Gauss"):
    return flow.build_flow(0, dim=dim, depth=4, out_scale=0.0,
                           latent_name=latent, dtype=jnp.float64)


def nontrivial_flow(dim):
    return flow.build_flow(0, dim=dim, depth=3, out_scale=0.2,
                           dtype=jnp.float64)


def test_score_identity_flow():
    dim = 4
    fl, params = identity_flow(dim)
    theta, unravel = score.flat_param_view(params)
    f = score.make_flat_log_prob(fl, unravel)
    x = jnp.array([0.5, -1.0, 2.0, 0.0])
    logp, g, O = score.value_score_and_param_grad(f, theta, x)
    np.testing.assert_allclose(
        float(logp), -dim / 2 * np.log(2 * np.pi) - 0.5 * float(x @ x),
        rtol=1e-12,
    )
    np.testing.assert_allclose(np.asarray(g), -np.asarray(x), atol=1e-12)
    assert O.shape == (theta.size,)


def test_hessian_block_matches_full():
    dim = 6
    fl, params = nontrivial_flow(dim)
    theta, unravel = score.flat_param_view(params)
    f = score.make_flat_log_prob(fl, unravel)
    x = jnp.array([0.5, -1.0, 2.0, 0.0, 0.3, -0.7])
    H_full = score.hessian_block(f, theta, x, None)
    idx = (1, 3, 5)
    H_sub = score.hessian_block(f, theta, x, idx)
    np.testing.assert_allclose(
        np.asarray(H_sub),
        np.asarray(H_full)[np.ix_(idx, idx)],
        atol=1e-10,
    )
    # symmetry of the full Hessian
    np.testing.assert_allclose(
        np.asarray(H_full), np.asarray(H_full).T, atol=1e-9
    )


def test_quad_trace_matches_block_all_equations():
    """The forward-over-forward trace path (hessian_trace_dirs +
    score.quad_trace) reproduces the block-Hessian Eloc exactly for every
    Hessian-consuming operator."""
    dim = 6
    fl, params = nontrivial_flow(dim)
    theta, unravel = score.flat_param_view(params)
    f = score.make_flat_log_prob(fl, unravel)
    x = jax.random.normal(jax.random.PRNGKey(2), (9, dim), dtype=jnp.float64)
    _, g, _ = jax.vmap(
        partial(score.value_score_and_param_grad, f), in_axes=(None, 0)
    )(theta, x)
    eqs = [
        evolution.Diffusion(D=0.7),
        evolution.DiffusionDrift(D=0.7, mu=1.3),
        evolution.DiffusionAnisotropic(dim=dim, seed=3),
        evolution.FokkerPlanck(T=4.0),
    ]
    for eq in eqs:
        hb = jax.vmap(
            partial(score.hessian_block, f, idx=tuple(eq.hessian_coords(dim))),
            in_axes=(None, 0),
        )(theta, x)
        e_block = eq.eloc(x, g, hb, 0.1)
        dirs = jnp.asarray(eq.hessian_trace_dirs(dim), dtype=x.dtype)
        ht = jax.vmap(
            partial(score.quad_trace, f, dirs=dirs), in_axes=(None, 0)
        )(theta, x)
        assert ht.shape == (x.shape[0],)
        e_trace = eq.eloc(x, g, ht, 0.1)
        np.testing.assert_allclose(
            np.asarray(e_trace), np.asarray(e_block), atol=1e-9,
            err_msg=eq.name,
        )
    # advection operators need no Hessian and advertise no trace dirs
    assert evolution.AdvectionPaper().hessian_trace_dirs(dim) is None


def _eloc(eq, fl, params, x, t=0.0):
    theta, unravel = score.flat_param_view(params)
    f = score.make_flat_log_prob(fl, unravel)
    logp, g, O = jax.vmap(
        partial(score.value_score_and_param_grad, f), in_axes=(None, 0)
    )(theta, x)
    idx = eq.hessian_coords(x.shape[-1])
    hess = None
    if idx is not None:
        hess = jax.vmap(
            partial(score.hessian_block, f, idx=tuple(idx)), in_axes=(None, 0)
        )(theta, x)
    return eq.eloc(x, g, hess, t)


def test_diffusion_eloc_analytic():
    """Standard normal: Eloc = D(|x|^2 - d)."""
    dim, D = 4, 1.3
    fl, params = identity_flow(dim)
    x = jnp.array([[0.5, -1.0, 2.0, 0.0], [1.0, 1.0, 1.0, 1.0]])
    eloc = _eloc(evolution.Diffusion(D=D), fl, params, x)
    expected = D * (np.sum(np.asarray(x) ** 2, axis=-1) - dim)
    np.testing.assert_allclose(np.asarray(eloc), expected, rtol=1e-10)


def test_diffusion_drift_eloc_analytic():
    """Adds mu * sum(-x)."""
    dim, D, mu = 4, 1.0, 4.0
    fl, params = identity_flow(dim)
    x = jnp.array([[0.5, -1.0, 2.0, 0.0]])
    eloc = _eloc(evolution.DiffusionDrift(D=D, mu=mu), fl, params, x)
    xa = np.asarray(x)
    expected = D * (np.sum(xa**2, -1) - dim) + mu * np.sum(-xa, -1)
    np.testing.assert_allclose(np.asarray(eloc), expected, rtol=1e-10)


def test_anisotropic_eloc_analytic():
    """g D g + tr(H D) with g = -x, H = -I: x D x - tr D."""
    dim = 4
    fl, params = identity_flow(dim)
    eq = evolution.DiffusionAnisotropic(dim=dim, seed=0)
    Dm = eq.D_matrix
    x = jnp.array([[0.5, -1.0, 2.0, 0.0]])
    eloc = _eloc(eq, fl, params, x)
    xa = np.asarray(x)[0]
    expected = xa @ Dm @ xa - np.trace(Dm)
    np.testing.assert_allclose(np.asarray(eloc)[0], expected, rtol=1e-8)


def test_advection_paper_velocity_spot():
    """Spot value matches the reference formula (evolutionEq.py:23-27)."""
    v = evolution.velocity_field_mlpaper(jnp.array([0.3, 0.7]), t=0.5, T=5.0)
    c = np.cos(np.pi * 0.5 / 5.0)
    expected = np.array([
        -np.sin(np.pi * 0.3) ** 2 * np.sin(2 * np.pi * 0.7) * c,
        np.sin(np.pi * 0.7) ** 2 * np.sin(2 * np.pi * 0.3) * c,
    ])
    np.testing.assert_allclose(np.asarray(v), expected, rtol=1e-12)


def test_hamiltonian_velocity_spot():
    """evolutionEq.py:122-125's __main__ check: v([3,3]) for harmonic H."""
    v = evolution.velocity_field_hamiltonian(jnp.array([3.0, 3.0]), t=0.0)
    np.testing.assert_allclose(np.asarray(v), [3.0, -3.0], rtol=1e-12)


def test_fokker_planck_eloc_analytic():
    """[x,p] standard normal; v=(p,-x): adv = -(-x p - p(-x)) = 0... compute
    full closed form instead: g=-c, H_pp=-I_p.
    adv  = -g.v = x p + p (-x) ... evaluate numerically against formula."""
    dim = 2
    fl, params = identity_flow(dim)
    eq = evolution.FokkerPlanck(m=1.0, omega=1.0, T=10.0, gamma=1.0, lam=0.0)
    x = jnp.array([[1.5, -0.5], [0.0, 2.0]])
    eloc = _eloc(eq, fl, params, x)
    xa = np.asarray(x)
    q, p = xa[:, 0], xa[:, 1]
    g = -xa
    adv = -(g[:, 0] * p + g[:, 1] * (-q))
    diff = 1.0 * 1.0 * 10.0 * (p**2 - 1.0)
    damp = 1.0 * p * (-p)
    np.testing.assert_allclose(np.asarray(eloc), adv + diff + damp,
                               rtol=1e-10)


def test_make_equation_registry():
    for name in ["diffusion", "diffusion_drift", "diffusion_anisotropic",
                 "advection_paper", "advection_hamiltonian",
                 "advection_hamiltonian_wDiss"]:
        eq = evolution.make_equation(name, dim=4)
        assert eq.name == name
    with pytest.raises(ValueError):
        evolution.make_equation("nope", dim=2)


def test_double_well_eloc_analytic():
    """Anharmonic/double-well FP (v2 < 0, lam > 0; BASELINE.json config 3):
    the standard-normal identity-flow closed form with the quartic force.
    V(x) = v2/2 x^2 + lam x^4 => dp/dt drift -V'(x) = -v2 x - 4 lam x^3."""
    dim = 2
    fl, params = identity_flow(dim)
    v2, lam, T, gamma = -4.0, 1.0, 0.5, 1.0
    eq = evolution.FokkerPlanck(m=1.0, omega=1.0, T=T, gamma=gamma,
                                lam=lam, v2=v2)
    x = jnp.array([[1.5, -0.5], [0.0, 2.0], [-1.0, 0.3]])
    eloc = _eloc(eq, fl, params, x)
    xa = np.asarray(x)
    q, p = xa[:, 0], xa[:, 1]
    g = -xa  # grad logp of the standard normal
    v_q = p                          # dH/dp
    v_p = -(v2 * q + 4 * lam * q**3)  # -dH/dq
    adv = -(g[:, 0] * v_q + g[:, 1] * v_p)
    diff = gamma * T * (p**2 - 1.0)   # m gamma T (g_p^2 + H_pp)
    damp = gamma * p * (-p)
    np.testing.assert_allclose(np.asarray(eloc), adv + diff + damp,
                               rtol=1e-10)


def test_double_well_velocity_minima_are_fixed_points():
    """v = J grad H vanishes at the well bottoms (x = +-1, p = 0) for
    V(x) = -2 x^2 + x^4."""
    for xw in (1.0, -1.0):
        v = evolution.velocity_field_hamiltonian(
            jnp.array([xw, 0.0]), t=0.0, v2=-4.0, lam=1.0)
        np.testing.assert_allclose(np.asarray(v), [0.0, 0.0], atol=1e-12)


def test_fokker_planck_per_site_temperatures():
    """Per-site bath temperatures (heat-transport chain; beyond the
    reference, whose shipped code only supports a scalar T,
    evolutionEq.py:75,113): the closed form on the identity flow, the
    uniform-tuple == scalar identity, and trace-path == block-path
    equality with non-uniform T (the sqrt(T)-scaled trace directions)."""
    dim = 6
    fl, params = identity_flow(dim)
    Ts = (10.0, 5.0, 2.5)
    eq = evolution.FokkerPlanck(T=Ts, coupled=True)
    assert isinstance(evolution.FokkerPlanck(T=[1.0, 2.0, 3.0]).T, tuple)

    x = jnp.asarray(np.random.default_rng(3).normal(size=(7, dim)))
    eloc = _eloc(eq, fl, params, x)
    # identity flow: g = -x, H = -I. diff_i = gamma T_i (p_i^2 - 1)
    xa = np.asarray(x)
    p = xa[:, 1::2]
    diff = np.sum(np.asarray(Ts) * (p**2 - 1.0), axis=-1)
    damp = -np.sum(p * p, axis=-1)
    # advection: coupled-chain velocity; compute from the equation itself
    theta, unravel = score.flat_param_view(params)
    f = score.make_flat_log_prob(fl, unravel)
    _, g, _ = jax.vmap(partial(score.value_score_and_param_grad, f),
                       in_axes=(None, 0))(theta, x)
    adv = -np.sum(np.asarray(g) * np.asarray(eq.velocity(x, 0.0)), axis=-1)
    np.testing.assert_allclose(np.asarray(eloc), adv + diff + damp,
                               rtol=1e-10)

    # uniform tuple == scalar
    e_tup = _eloc(evolution.FokkerPlanck(T=(4.0,) * 3), fl, params, x)
    e_sc = _eloc(evolution.FokkerPlanck(T=4.0), fl, params, x)
    np.testing.assert_allclose(np.asarray(e_tup), np.asarray(e_sc),
                               rtol=1e-12)

    # trace path == block path with NON-uniform T (nontrivial flow)
    fl2, params2 = nontrivial_flow(dim)
    theta2, unravel2 = score.flat_param_view(params2)
    f2 = score.make_flat_log_prob(fl2, unravel2)
    x2 = jax.random.normal(jax.random.PRNGKey(5), (9, dim),
                           dtype=jnp.float64)
    _, g2, _ = jax.vmap(partial(score.value_score_and_param_grad, f2),
                        in_axes=(None, 0))(theta2, x2)
    hb = jax.vmap(
        partial(score.hessian_block, f2, idx=tuple(eq.hessian_coords(dim))),
        in_axes=(None, 0))(theta2, x2)
    dirs = jnp.asarray(eq.hessian_trace_dirs(dim), dtype=x2.dtype)
    ht = jax.vmap(partial(score.quad_trace, f2, dirs=dirs),
                  in_axes=(None, 0))(theta2, x2)
    np.testing.assert_allclose(
        np.asarray(eq.eloc(x2, g2, ht, 0.0)),
        np.asarray(eq.eloc(x2, g2, hb, 0.0)), atol=1e-9)

    # wrong tuple length fails loudly
    with pytest.raises(ValueError, match="pairs"):
        _eloc(evolution.FokkerPlanck(T=(1.0, 2.0)), fl, params, x)

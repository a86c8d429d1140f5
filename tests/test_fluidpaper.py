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

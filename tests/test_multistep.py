"""Multi-step dispatch (TDVP.heun_multi / RunConfig.steps_per_dispatch):
batching K fixed-Heun steps into one lax.scan program must reproduce the
per-step path exactly -- same RNG stream, same recorded infos schema, same
trajectory -- because it is the same computation with host dispatch
amortized (driver.plan_batch + solver/tdvp.py)."""

import numpy as np
import pytest

from vmc_pde_tpu.config import RunConfig
from vmc_pde_tpu.driver import run


def _cfg(**kw):
    base = dict(
        name="multistep_test",
        dim=4,
        offset=(0.0,) * 4,
        latent_name="Gauss",
        equation="diffusion",
        variant="scale",
        dt0=1e-3,
        max_step=1e-2,
        increase_fac=1.3,
        t_end=0.08,
        n_samples_tdvp=512,
        n_samples_obs=512,
        seed=3,
        sample_seed=3,
        precision="f64",
        workdir=None,
        verbose=False,
    )
    base.update(kw)
    return RunConfig(**base)


@pytest.mark.slow
def test_multistep_matches_per_step():
    state1, rec1 = run(_cfg(steps_per_dispatch=1))
    state4, rec4 = run(_cfg(steps_per_dispatch=4))
    a1, a4 = rec1.as_arrays(), rec4.as_arrays()

    # same step count and identical recorded times (ramp plan mirrors the
    # host loop exactly, never overshooting t_end)
    assert a1["times"].shape == a4["times"].shape
    np.testing.assert_array_equal(a1["times"], a4["times"])

    # same infos schema (dist_params included in the batched path)
    assert set(a1) == set(a4)
    # Not bit-identical: XLA compiles the scan body and the standalone pair
    # separately, so reduction orders differ at ~1 ulp, and the svd_tol-
    # thresholded solve amplifies that into ~1e-8 parameter divergence over
    # the run. Same RNG stream, same physics; tolerances reflect only that
    # compilation-context noise.
    for k in ("entropy", "solver_res", "tdvp_error", "covar", "x1"):
        np.testing.assert_allclose(a1[k], a4[k], rtol=1e-5, atol=1e-8,
                                   err_msg=k)

    th1 = np.asarray(state1.get_parameters())
    th4 = np.asarray(state4.get_parameters())
    np.testing.assert_allclose(th1, th4, rtol=2e-3, atol=1e-6)


@pytest.mark.slow
def test_multistep_checkpoint_boundaries(tmp_path):
    """Checkpoint cadence must be preserved: batches never swallow a
    boundary step (plan_batch falls back to per-step there)."""
    w1, w4 = str(tmp_path / "s1"), str(tmp_path / "s4")
    run(_cfg(steps_per_dispatch=1, workdir=w1, checkpoint_every=5))
    run(_cfg(steps_per_dispatch=4, workdir=w4, checkpoint_every=5))
    import os

    c1 = sorted(f for f in os.listdir(w1) if f.startswith("ckpt_"))
    c4 = sorted(f for f in os.listdir(w4) if f.startswith("ckpt_"))
    assert c1 == c4 and len(c1) > 1


@pytest.mark.slow
def test_multistep_euler_falls_back_to_per_step():
    """fixed_euler cannot batch (the scan is Heun-pair-shaped): with
    steps_per_dispatch set, the driver must silently fall back to per-step
    dispatch and produce the identical trajectory."""
    s1, r1 = run(_cfg(stepper="fixed_euler", steps_per_dispatch=1))
    s2, r2 = run(_cfg(stepper="fixed_euler", steps_per_dispatch=4))
    a1, a2 = r1.as_arrays(), r2.as_arrays()
    np.testing.assert_array_equal(a1["times"], a2["times"])
    np.testing.assert_array_equal(np.asarray(s1.get_parameters()),
                                  np.asarray(s2.get_parameters()))


def _acfg(**kw):
    base = dict(stepper="adaptive_heun", tol=1e-7, dt0=1e-3,
                max_step=5e-3, t_end=0.04)
    base.update(kw)
    return _cfg(**base)


@pytest.mark.slow
def test_adaptive_multistep_matches_per_step():
    """steps_per_dispatch with an adaptive stepper: the attempt retry loop
    and dt controller run ON DEVICE (TDVP.adaptive_multi, lax.while_loop
    inside a masked lax.scan). Same RNG stream and f64 controller
    arithmetic as the host loop -> identical step sequence."""
    s1, r1 = run(_acfg(steps_per_dispatch=1))
    s4, r4 = run(_acfg(steps_per_dispatch=4))
    a1, a4 = r1.as_arrays(), r4.as_arrays()

    # identical accept/reject sequence -> same step count; times agree to
    # f64 controller arithmetic (host Python floats vs on-device f64 pow/
    # min -- same ops, ulp-level agreement)
    assert a1["times"].shape == a4["times"].shape
    np.testing.assert_allclose(a1["times"], a4["times"], rtol=1e-12)
    assert set(a1) == set(a4)
    for k in ("entropy", "solver_res", "tdvp_error", "covar", "x1"):
        np.testing.assert_allclose(a1[k], a4[k], rtol=1e-5, atol=1e-8,
                                   err_msg=k)
    np.testing.assert_allclose(np.asarray(s1.get_parameters()),
                               np.asarray(s4.get_parameters()),
                               rtol=2e-3, atol=1e-6)


@pytest.mark.slow
def test_adaptive_multistep_rk23_matches_per_step():
    s1, r1 = run(_acfg(stepper="adaptive_rk23", steps_per_dispatch=1))
    s3, r3 = run(_acfg(stepper="adaptive_rk23", steps_per_dispatch=3))
    a1, a3 = r1.as_arrays(), r3.as_arrays()
    assert a1["times"].shape == a3["times"].shape
    np.testing.assert_allclose(a1["times"], a3["times"], rtol=1e-12)
    np.testing.assert_allclose(a1["entropy"], a3["entropy"], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s1.get_parameters()),
                               np.asarray(s3.get_parameters()),
                               rtol=2e-3, atol=1e-6)


@pytest.mark.slow
def test_adaptive_multistep_exact_t_end():
    """exact_t_end with batched adaptive steps: the ON-DEVICE dt cap clamps
    each attempt at t_end - t; the final batch lands exactly on t_end with
    its tail slots masked out (n_done < K)."""
    s1, r1 = run(_acfg(steps_per_dispatch=1, exact_t_end=True))
    s4, r4 = run(_acfg(steps_per_dispatch=4, exact_t_end=True))
    a1, a4 = r1.as_arrays(), r4.as_arrays()
    assert a1["times"].shape == a4["times"].shape
    np.testing.assert_allclose(a1["times"], a4["times"], rtol=1e-12)
    # landed exactly: the last step starts before t_end and there is no
    # overshoot row (per-step exact_t_end contract, quirk Q11 fixed)
    assert a4["times"][-1] < 0.04
    np.testing.assert_allclose(np.asarray(s1.get_parameters()),
                               np.asarray(s4.get_parameters()),
                               rtol=2e-3, atol=1e-6)


@pytest.mark.slow
def test_adaptive_multistep_dp4tp2():
    """Batched adaptive stepping on the 2-D (dp x tp) mesh: the while_loop/
    cond program composes with the sample-axis dp sharding and the Gram
    result's tp sharding; trajectory matches the dp8 default-mesh run to
    the cross-mesh tolerance class."""
    s1, r1 = run(_acfg(steps_per_dispatch=1, mesh_dp=4, mesh_tp=2))
    s3, r3 = run(_acfg(steps_per_dispatch=3, mesh_dp=4, mesh_tp=2))
    a1, a3 = r1.as_arrays(), r3.as_arrays()
    assert a1["times"].shape == a3["times"].shape
    np.testing.assert_allclose(a1["times"], a3["times"], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(s1.get_parameters()),
                               np.asarray(s3.get_parameters()),
                               rtol=2e-3, atol=1e-6)


@pytest.mark.slow
def test_adaptive_multistep_mcmc_matches_per_step():
    """Fused-MCMC workload (fluidpaper preset) under batched adaptive
    stepping: the Metropolis chain state threads through attempts and
    steps inside ONE program; trajectory matches the per-step fused
    attempt path (same chain stream; fused-MCMC multistep tolerance
    class)."""
    from vmc_pde_tpu.config import preset

    def _mcfg(k):
        return preset("fluidpaper", n_samples_tdvp=640, n_samples_obs=640,
                      n_chains=64, dt0=1e-3, max_step=2e-3, tol=1e-6,
                      stepper="adaptive_heun", t_end=6e-3,
                      precision="f64", verbose=False,
                      steps_per_dispatch=k)

    s1, r1 = run(_mcfg(1))
    s3, r3 = run(_mcfg(3))
    a1, a3 = r1.as_arrays(), r3.as_arrays()
    assert a1["times"].shape == a3["times"].shape
    np.testing.assert_allclose(a1["times"], a3["times"], rtol=1e-9)
    np.testing.assert_allclose(a1["entropy"], a3["entropy"], rtol=1e-5)
    assert (a3["mcmc_proposed"] > 0).all()
    np.testing.assert_allclose(np.asarray(s1.get_parameters()),
                               np.asarray(s3.get_parameters()),
                               rtol=2e-3, atol=1e-6)


@pytest.mark.slow
def test_multistep_rk3_matches_per_step():
    """steps_per_dispatch with stepper='fixed_rk3': the scan body runs the
    SSPRK3 triple; trajectory and recorded infos match the per-step path
    (same RNG stream; float-codegen-noise tolerance, see
    test_oracle_and_e2e.py exact_t_end batched test)."""
    s1, r1 = run(_cfg(stepper="fixed_rk3", steps_per_dispatch=1))
    s4, r4 = run(_cfg(stepper="fixed_rk3", steps_per_dispatch=4))
    a1, a4 = r1.as_arrays(), r4.as_arrays()
    np.testing.assert_array_equal(a1["times"], a4["times"])
    np.testing.assert_allclose(a1["entropy"], a4["entropy"], rtol=1e-10)
    # the regularized solve amplifies last-bit reduction-reordering noise
    # between the scan-body and standalone programs across ~10 steps
    # (same tolerance class as the fused-MCMC multistep contract)
    np.testing.assert_allclose(np.asarray(s1.get_parameters()),
                               np.asarray(s4.get_parameters()),
                               rtol=1e-3, atol=1e-7)

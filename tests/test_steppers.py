"""Stepper tests on known ODEs: convergence order, dt ramp, adaptive accept/
reject behavior (stepper.py semantics)."""

import jax.numpy as jnp
import numpy as np

from vmc_pde_tpu.solver.steppers import AdaptiveHeun, FixedStepper


def make_linear_rhs(lam=-1.0):
    """dy/dt = lam * y; also exposes .SExp for the adaptive norm."""

    def f(y, t, key, intStep=0):
        return lam * y, {"solver_res": 0.0}

    f.SExp = jnp.eye(1)
    return f


def test_fixed_heun_second_order():
    errs = []
    for dt in (0.1, 0.05):
        stepper = FixedStepper(timeStep=dt, maxStep=dt, increase_fac=1.0,
                               mode="Heun")
        y = jnp.array([1.0])
        t = 0.0
        f = make_linear_rhs()
        while t < 1.0 - 1e-12:
            res = stepper.step(t, f, y, key=None)
            y, t = res.y, t + res.dt_used
        errs.append(abs(float(y[0]) - np.exp(-1.0)))
    # halving dt should reduce the error ~4x (2nd order)
    assert errs[1] < errs[0] / 3.0


def test_fixed_euler_first_order():
    errs = []
    for dt in (0.1, 0.05):
        stepper = FixedStepper(timeStep=dt, maxStep=dt, increase_fac=1.0,
                               mode="Euler")
        y = jnp.array([1.0])
        t = 0.0
        f = make_linear_rhs()
        while t < 1.0 - 1e-12:
            res = stepper.step(t, f, y, key=None)
            y, t = res.y, t + res.dt_used
        errs.append(abs(float(y[0]) - np.exp(-1.0)))
    assert errs[1] < errs[0] / 1.7


def test_dt_ramp():
    """dt <- min(dt * increase_fac, maxStep) (stepper.py:131)."""
    stepper = FixedStepper(timeStep=1e-7, maxStep=1e-2, increase_fac=1.3)
    f = make_linear_rhs()
    y = jnp.array([1.0])
    dts = []
    for _ in range(50):
        res = stepper.step(0.0, f, y, key=None)
        dts.append(res.dt_used)
    np.testing.assert_allclose(dts[0], 1.3e-7, rtol=1e-12)
    assert dts[-1] == 1e-2
    assert all(b >= a for a, b in zip(dts, dts[1:]))


def test_fixed_heun_info_is_pre_step_state():
    """Observables must come from the FIRST stage (the state at time t), so
    the driver's ``times``/``info`` pairing is exact -- the reference's
    FixedStepper returns the predictor stage's info against the pre-step time
    (stepper.py:133-139 + main.py:163), a one-step observable skew fixed as
    quirk Q10.  The NaN flag, however, folds in the second stage so
    divergence is caught immediately."""
    calls = []

    def f(y, t, key, intStep=0):
        calls.append(intStep)
        return -y, {"stage": intStep, "obs": float(y[0]),
                    "nan": jnp.isnan(y[0]) | (intStep == 1)}

    stepper = FixedStepper(timeStep=0.1, maxStep=0.1, increase_fac=1.0,
                           mode="Heun")
    y = jnp.array([2.0])
    res = stepper.step(0.0, f, y, key=None)
    assert calls == [0, 1]
    assert res.info["stage"] == 0
    assert res.info["obs"] == 2.0  # the pre-step state, not the predictor
    assert bool(res.info["nan"])  # stage-1 NaN flag is OR-ed in


def test_adaptive_heun_converges_and_adapts():
    def norm_fn(v, S):
        return float(jnp.linalg.norm(v))

    stepper = AdaptiveHeun(timeStep=0.5, tol=1e-6, maxStep=1.0)
    f = make_linear_rhs(lam=-2.0)
    y = jnp.array([1.0])
    t = 0.0
    while t < 1.0 - 1e-9:
        res = stepper.step(t, f, y, key=None, normFunction=norm_fn)
        y, t = res.y, t + res.dt_used
    # adaptive result should be accurate to much better than the tolerance scale
    assert abs(float(y[0]) - np.exp(-2.0 * t)) < 1e-4
    # initial dt=0.5 must have been rejected/shrunk at least once
    assert stepper.dt != 0.5


def test_dt_cap_clamps_step_but_not_ramp_state():
    """dt_cap (the driver's exact_t_end landing) clamps THIS step only:
    both steppers persist the UNCAPPED dt suggestion, so a tiny final
    clamped step cannot leak into checkpoints / resumed runs."""
    f = make_linear_rhs()

    st = FixedStepper(timeStep=1e-2, maxStep=1e-2, increase_fac=1.3,
                      mode="Heun")
    res = st.step(0.0, f, jnp.array([1.0]), key=None, dt_cap=1e-3)
    assert res.dt_used == 1e-3          # the step itself is clamped
    assert st.dt == 1e-2                # the ramp state is not

    ad = AdaptiveHeun(timeStep=1e-2, tol=1e-3, maxStep=5e-2)
    res = ad.step(0.0, f, jnp.array([1.0]), key=None, dt_cap=1e-3)
    assert res.dt_used <= 1e-3 + 1e-15  # attempted dt capped
    assert ad.dt > 1e-3                 # persisted suggestion is uncapped


def test_fixed_rk3_third_order():
    """SSPRK3 converges at third order on the linear ODE."""
    errs = []
    for dt in (0.1, 0.05):
        stepper = FixedStepper(timeStep=dt, maxStep=dt, increase_fac=1.0,
                               mode="RK3")
        y = jnp.array([1.0])
        t = 0.0
        f = make_linear_rhs()
        while t < 1.0 - 1e-12:
            res = stepper.step(t, f, y, key=None)
            y, t = res.y, t + res.dt_used
        errs.append(abs(float(y[0]) - np.exp(-t)))
    order = np.log2(errs[0] / errs[1])
    assert 2.7 < order < 3.3, (errs, order)


def test_adaptive_rk23_third_order_and_cheaper():
    """Bogacki-Shampine 3(2): the accepted solution integrates the linear
    ODE more accurately than AdaptiveHeun AT THE SAME tolerance while
    using fewer RHS evaluations (4 per attempt vs 5, larger accepted
    steps)."""
    from vmc_pde_tpu.solver.steppers import AdaptiveRK23

    def run_one(cls):
        calls = [0]

        def f(y, t, key, intStep=0):
            calls[0] += 1
            return -y, {"solver_res": 0.0}

        f.SExp = jnp.eye(1)
        st = cls(timeStep=1e-3, tol=1e-10, maxStep=0.5)
        y, t = jnp.array([1.0]), 0.0
        while t < 1.0 - 1e-12:
            res = st.step(t, f, y, key=None,
                          normFunction=lambda v, S: float(abs(v[0])))
            y, t = res.y, t + res.dt_used
        return abs(float(y[0]) - np.exp(-t)), calls[0]

    err_h, calls_h = run_one(AdaptiveHeun)
    err_r, calls_r = run_one(AdaptiveRK23)
    assert err_r < 5e-7 and err_h < 5e-7, (err_r, err_h)
    assert calls_r < calls_h, (calls_r, calls_h)

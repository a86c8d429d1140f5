"""Time integrators for the TDVP parameter flow.

Parity with vmc_fluids/stepper.py: ``AdaptiveHeun`` (embedded 2nd-order Heun,
full step vs two half steps, error measured in the S-metric, dt-scale clamp
[0.2, 2] * 0.9 * fe^(1/3), maxStep cap -- stepper.py:6-91) and
``FixedStepper`` (Heun or Euler with geometric dt ramp
dt <- min(dt * increase_fac, maxStep) -- stepper.py:94-145).

Beyond the reference (which tops out at second order): ``FixedStepper``
mode="RK3" (Shu-Osher SSPRK3, fused triple via TDVP.rk3_triple) and
``AdaptiveRK23`` (embedded Bogacki-Shampine 3(2), 4 RHS evals per attempt
vs AdaptiveHeun's 5) -- measured ~5x fewer RHS evaluations at equal L2 on
the north-star harness (BENCHMARKS.md "Third-order stepper").

The right-hand side ``f`` is the TDVP.rhs callable: f(theta, t, key, intStep)
-> (dtheta, aux). Integration arithmetic happens on the master-precision flat
parameter vector (f64): the reference gets this for free from global x64
(main.py:2); with an f32 compute path it is essential because dt ramps from
1e-7 (main.py:108). RNG keys are threaded explicitly and decorrelated per
internal stage via intStep (fixing the reference's implicit reliance on a
mutable sampler key).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass
class StepResult:
    y: jnp.ndarray
    dt_used: float
    info: dict


class FixedStepper:
    """Heun or Euler with a geometric dt ramp (stepper.py:94-145).

    ``pair_fn`` (optional, e.g. ``TDVP.heun_pair``): evaluates the whole
    Heun pair in one fused dispatch with dt as a traced scalar --
    (dy, info) = pair_fn(y, t, dt, key) -- instead of two f() calls with a
    host round-trip between them. Integration arithmetic stays in master
    precision: only the increment crosses back.
    """

    def __init__(self, timeStep=1e-3, maxStep=1e-2, increase_fac=1.3,
                 mode="Heun", pair_fn=None):
        self.dt = float(timeStep)
        self.maxStep = float(maxStep)
        self.increase_fac = float(increase_fac)
        if mode not in ("Heun", "Euler", "RK3"):
            raise ValueError(f"unknown mode {mode!r}")
        self.mode = mode
        self.pair_fn = pair_fn

    def step(self, t, f, y, key, normFunction=None, dt_cap=None):
        # dt_cap clamps THIS step only (driver's exact_t_end landing);
        # self.dt keeps the undamped ramp value.
        self.dt = min(self.dt * self.increase_fac, self.maxStep)
        dt = self.dt if dt_cap is None else min(self.dt, float(dt_cap))
        if self.mode == "Heun":
            if self.pair_fn is not None:
                dy, info = self.pair_fn(y, t, dt, key)
                return StepResult(y + dy, dt, info)
            # Observables come from the FIRST stage -- the state at time t --
            # so the driver's `rec.append("times", t)` pairing is exact.  The
            # reference's FixedStepper returns the SECOND stage's info (the
            # predictor state at t + dt, stepper.py:133-139) while main.py:163
            # records it against the pre-step t: a one-step observable skew of
            # +dS/dt * dt (~0.07 entropy error early in the dim-8 diffusion
            # run).  Its AdaptiveHeun (stepper.py:54) -- which produced the
            # shipped paper data -- uses the first stage; we make both
            # steppers consistent with that convention (fixed quirk Q10).
            # Only the NaN flag is folded in from the second stage so
            # divergence detection is not delayed by a step.
            k0, info = f(y, t, key, intStep=0)
            k1, info1 = f(y + dt * k0, t + dt, key, intStep=1)
            if "nan" in info and "nan" in info1:
                info = dict(info)
                info["nan"] = info["nan"] | info1["nan"]
            return StepResult(y + 0.5 * dt * (k0 + k1), dt, info)
        if self.mode == "RK3":
            # SSPRK3 (Shu-Osher): third order, strong-stability-preserving.
            # No reference counterpart (stepper.py tops out at Heun); same
            # stage-0 observable convention (Q10).
            if self.pair_fn is not None:  # TDVP.rk3_triple, fused dispatch
                dy, info = self.pair_fn(y, t, dt, key)
                return StepResult(y + dy, dt, info)
            k0, info = f(y, t, key, intStep=0)
            k1, i1 = f(y + dt * k0, t + dt, key, intStep=1)
            k2, i2 = f(y + 0.25 * dt * (k0 + k1), t + 0.5 * dt, key,
                       intStep=2)
            if "nan" in info:
                info = dict(info)
                for i_s in (i1, i2):
                    if "nan" in i_s:
                        info["nan"] = info["nan"] | i_s["nan"]
            return StepResult(y + dt / 6.0 * (k0 + k1 + 4.0 * k2), dt, info)
        k0, info = f(y, t, key, intStep=0)
        return StepResult(y + dt * k0, dt, info)


class AdaptiveHeun:
    """Embedded adaptive Heun (stepper.py:6-91).

    The integration error is ||dy1 - dy0|| in the ``normFunction`` metric; the
    reference passes norm_fun(v, S) = v S v with S = f.SExp (main.py:24-26,
    stepper.py:71). ``f`` must expose ``.SExp`` after a call (TDVP does when
    TDVPConfig.compute_sexp is set).

    ``attempt_fn`` (optional, e.g. ``TDVP.heun_attempt``): evaluates a whole
    embedded attempt -- all 5 RHS stages plus the S-metric error -- in one
    fused dispatch with dt as a traced scalar: (dy1, err, info) =
    attempt_fn(y, t, dt, key, attempt). One host sync per attempt (the
    accept/reject decision, O(1) data) instead of 5 + a (P, P)-matrix norm.
    """

    def __init__(self, timeStep=1e-3, tol=1e-8, maxStep=1.0,
                 attempt_fn=None):
        self.dt = float(timeStep)
        self.tolerance = float(tol)
        self.maxStep = float(maxStep)
        self.attempt_fn = attempt_fn

    def _attempt_plain(self, f, y0, t, dt, key, off):
        """One per-call embedded attempt: full Heun step vs two half
        steps. Returns (dy_accept, diff, stage-0 info with NaN folded)."""
        k0, info = f(y0, t, key, intStep=off + 0)
        y1 = y0 + dt * k0
        k1, i1 = f(y1, t + dt, key, intStep=off + 1)
        dy0 = 0.5 * dt * (k0 + k1)

        # two half steps
        yh = y0 + 0.5 * dt * k0
        k10, i2 = f(yh, t + 0.5 * dt, key, intStep=off + 2)
        dy1 = 0.25 * dt * (k0 + k10)
        y2 = y0 + dy1
        k01, i3 = f(y2, t + 0.5 * dt, key, intStep=off + 3)
        y3 = y2 + 0.5 * dt * k01
        k11, i4 = f(y3, t + dt, key, intStep=off + 4)
        dy1 = dy1 + 0.25 * dt * (k01 + k11)
        # fold every stage's NaN flag into the recorded info (the
        # driver's abort check reads only this step's info; a NaN
        # born in a later stage of the FINAL step would otherwise
        # never surface -- same contract as FixedStepper/Q10)
        if "nan" in info:
            info = dict(info)
            for i_s in (i1, i2, i3, i4):
                if "nan" in i_s:
                    info["nan"] = info["nan"] | i_s["nan"]
        return dy1, dy1 - dy0, info

    def step(self, t, f, y, key, normFunction=None, dt_cap=None):
        if normFunction is None:
            normFunction = lambda v, S: jnp.linalg.norm(v)

        fe = 0.5
        dt = self.dt if dt_cap is None else min(self.dt, float(dt_cap))
        y0 = y
        attempt = 0
        while fe < 1.0:
            if self.attempt_fn is not None:
                dy1, err, info = self.attempt_fn(y0, t, dt, key,
                                                 attempt=attempt)
                err = float(err)
            else:
                dy1, diff, info = self._attempt_plain(f, y0, t, dt, key,
                                                      5 * attempt)
                err = float(normFunction(diff, getattr(f, "SExp", None)))

            # err == 0 (fully-regularized / stationary update) accepts the
            # step and grows dt, matching the reference's inf from jnp
            # division (stepper.py:72)
            fe = self.tolerance / err if err > 0.0 else float("inf")

            scale = max(0.2, min(2.0, 0.9 * fe ** (1.0 / 3.0)))
            real_dt = dt
            dt_free = min(dt * scale, self.maxStep)
            dt = dt_free if dt_cap is None else min(dt_free,
                                                    float(dt_cap))
            attempt += 1

        # persist the UNCAPPED suggestion: dt_cap clamps this step only
        # (a final exact_t_end step must not leak a tiny dt into
        # checkpoints / resumed runs -- same contract as FixedStepper)
        self.dt = dt_free
        return StepResult(y0 + dy1, real_dt, info)


class AdaptiveRK23(AdaptiveHeun):
    """Embedded Bogacki-Shampine 3(2) adaptive stepper -- beyond the
    reference's AdaptiveHeun (stepper.py tops out at second order).

    4 RHS evaluations per attempt (vs AdaptiveHeun's 5) and the ACCEPTED
    solution is third-order, so at equal tolerance it takes larger steps
    at lower per-attempt cost. Same controller (S-metric error, clamp
    [0.2, 2] * 0.9 * fe^(1/3), maxStep cap) and conventions (stage-0
    observables, per-stage RNG via intStep = 5 * attempt + stage, NaN
    fold). ``attempt_fn`` = TDVP.rk23_attempt for the fused one-dispatch
    path."""

    def _attempt_plain(self, f, y0, t, dt, key, off):
        k0, info = f(y0, t, key, intStep=off + 0)
        k1, i1 = f(y0 + 0.5 * dt * k0, t + 0.5 * dt, key, intStep=off + 1)
        k2, i2 = f(y0 + 0.75 * dt * k1, t + 0.75 * dt, key,
                   intStep=off + 2)
        dy3 = dt * (2.0 / 9.0 * k0 + 1.0 / 3.0 * k1 + 4.0 / 9.0 * k2)
        k3, i3 = f(y0 + dy3, t + dt, key, intStep=off + 3)
        dy2 = dt * (7.0 / 24.0 * k0 + 0.25 * k1 + 1.0 / 3.0 * k2
                    + 0.125 * k3)
        if "nan" in info:
            info = dict(info)
            for i_s in (i1, i2, i3):
                if "nan" in i_s:
                    info["nan"] = info["nan"] | i_s["nan"]
        return dy3, dy3 - dy2, info

"""Custom PDE in ~30 lines: plug a user-defined evolution equation into
the full driver (fused steppers, diagnostics, checkpointing) without
touching the framework.

The reference hard-wires its physics into a name registry
(vmc_fluids/evolutionEq.py:54-77); here any `ops.evolution.Equation`
subclass can be passed directly as `RunConfig.equation`. The subclass
declares (a) which coordinate-Hessian information it needs -- this one
consumes it only through the Laplacian, so `hessian_trace_dirs` lets the
solver compute the scalar quadratic form forward-over-forward instead of
materializing the (d, d) block -- and (b) the batched local estimator
Eloc = d log p / dt at the samples.

Physics: a "moving optical trap" -- an Ornstein-Uhlenbeck density whose
trap center slides along coordinate 0 at speed ``a``:

    dp/dt = div( p * gamma * (x - mu(t) e0) ) + D lap p,   mu(t) = a t

so  Eloc = gamma*d + gamma*(x - mu(t) e0) . grad log p
         + D (|grad log p|^2 + lap log p).

Everything is analytically solvable from p0 = N(0, I):

    mean_0(t) = a t - (a / gamma) (1 - e^{-gamma t})   (lags the trap)
    var_i(t)  = D/gamma + (1 - D/gamma) e^{-2 gamma t}  (every coordinate)

Run (CPU, ~1 min):  JAX_PLATFORMS=cpu python examples/custom_equation.py
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def make_moving_trap(gamma=1.0, D=0.5, a=2.0):
    import jax.numpy as jnp

    from vmc_pde_tpu.ops.evolution import Equation

    @dataclasses.dataclass(frozen=True)
    class MovingTrap(Equation):
        name: str = "moving_trap"

        def hessian_trace_dirs(self, dim):
            return np.eye(dim)  # Laplacian only: d forward-over-forward dirs

        def eloc(self, x, g, hess, t):
            lap = hess  # 1-D because hessian_trace_dirs is set
            d = x.shape[-1]
            mu = jnp.zeros((d,), x.dtype).at[0].set(a * t)
            drift = gamma * (x - mu)
            return (gamma * d + jnp.sum(drift * g, axis=-1)
                    + D * (jnp.sum(g**2, axis=-1) + lap))

    return MovingTrap()


def main():
    import jax

    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from vmc_pde_tpu.config import preset
    from vmc_pde_tpu.driver import run

    gamma, D, a = 1.0, 0.5, 2.0
    t_end = 0.4
    n = 4096
    cfg = preset(
        "mwe",  # reuse the tuned 2-D knobs; swap in the custom physics
        equation=make_moving_trap(gamma, D, a),
        variant="affine",
        qmc=True,  # scrambled-Sobol latent draws: lower-variance forces
        dt0=2e-3, max_step=2e-3, t_end=t_end, exact_t_end=True,
        n_samples_tdvp=n, n_samples_obs=n,
        precision="f64" if jax.default_backend() == "cpu" else "tpu",
        workdir="output/custom_equation", verbose=False,
    )
    state, rec = run(cfg)
    infos = rec.as_arrays()

    # --- noise-free judge: model density on a grid vs the exact Gaussian
    # solution at the final recorded time (the density family is closed
    # under this PDE, so any gap is solver + representation error)
    t = np.asarray(infos["times"])
    tf = float(t[-1])
    m_exact = np.array([a * tf - (a / gamma) * (1 - np.exp(-gamma * tf)), 0.0])
    v_exact = D / gamma + (1.0 - D / gamma) * np.exp(-2.0 * gamma * tf)
    import jax.numpy as jnp
    g1 = np.linspace(-4.0, 4.0, 161)
    X, Y = np.meshgrid(g1 + m_exact[0], g1, indexing="ij")
    coords = jnp.asarray(np.stack([X.ravel(), Y.ravel()], 1),
                         state.precision.compute)
    p_model = np.exp(np.asarray(state(coords, "eval"), dtype=np.float64))
    r2 = (X - m_exact[0]) ** 2 + Y**2
    p_exact = np.exp(-r2 / (2 * v_exact)).ravel() / (2 * np.pi * v_exact)
    da = (g1[1] - g1[0]) ** 2
    l2 = np.sqrt(np.sum((p_model - p_exact) ** 2) * da)

    # --- MC moment trajectories vs closed forms, judged against their own
    # sampling noise (var estimator SE ~ sqrt(2/n), mean SE ~ sqrt(v/n))
    mean0 = np.asarray(infos["x1"])[:, 0]
    var = np.diagonal(np.asarray(infos["covar"]), axis1=1, axis2=2)
    mean0_exact = a * t - (a / gamma) * (1.0 - np.exp(-gamma * t))
    var_exact = D / gamma + (1.0 - D / gamma) * np.exp(-2.0 * gamma * t)
    err_mean = np.abs(mean0 - mean0_exact).max()
    err_var = np.abs(var - var_exact[:, None]).max()

    print(f"steps: {len(t)}, t_end reached: {tf:.3f}")
    print(f"density L2 vs exact solution at t_end: {l2:.2e}")
    print(f"trap-lag mean_0(t): max abs err {err_mean:.2e} "
          f"(signal {np.abs(mean0_exact).max():.3f}, "
          f"5 SE = {5 * np.sqrt(1.0 / n):.3f})")
    print(f"covariance diag:    max abs err {err_var:.2e} "
          f"(contracts 1.00 -> {var_exact[-1]:.3f}, "
          f"5 SE = {5 * np.sqrt(2.0 / n):.3f})")
    ok = (l2 < 1e-3
          and err_mean < 5 * np.sqrt(1.0 / n)
          and err_var < 5 * np.sqrt(2.0 / n))
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

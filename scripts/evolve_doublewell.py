"""Double-well Fokker-Planck quench artifact (BASELINE.json config 3).

Evolves the `doubleWell` preset -- the bimodal double-well Boltzmann
latent at quench temperature T0=1.5, Metropolis-sampled (rw proposals),
SVD-regularized TDVP -- under V(x) = -2 x^2 + x^4 coupled to a colder
bath T=0.5, and validates the whole trajectory against the independent
jitted RK4 SDE oracle started from the same density by exact inverse-CDF
sampling (oracle/sde.py double_well_init_cloud).

Physics over the window: the momentum variance cools along the OU
relaxation T0 e^{-2 gamma t} + T (1 - e^{-2 gamma t}); the position
marginal sharpens toward the bimodal exp(-V/T). At t_end=2 the thermal
quench is ~98% equilibrated.

Run (repo root, CPU f64, ~4 min):
    JAX_PLATFORMS=cpu python scripts/evolve_doublewell.py
        [--t-end 2.0] [--dt 2e-3] [--samples 3200] [--chains 400]
        [--out results/doublewell_quench.npz]

FINDINGS: see BENCHMARKS.md "Double-well quench".
"""

import argparse
import json
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t-end", type=float, default=2.0)
    ap.add_argument("--dt", type=float, default=2e-3)
    ap.add_argument("--samples", type=int, default=3200)
    ap.add_argument("--chains", type=int, default=400)
    ap.add_argument("--oracle-n", type=int, default=100000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", type=str, default="results/doublewell_quench.npz")
    ap.add_argument("--tpu", action="store_true")
    args = ap.parse_args()

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from vmc_pde_tpu import driver
    from vmc_pde_tpu.config import preset
    from vmc_pde_tpu.oracle import sde
    from vmc_pde_tpu.utils.grid import Grid

    n_steps = int(round(args.t_end / args.dt))
    cfg = preset(
        "doubleWell",
        n_samples_tdvp=args.samples,
        n_samples_obs=args.samples,
        n_chains=args.chains,
        dt0=args.dt,
        max_step=args.dt,
        t_end=args.t_end,
        exact_t_end=True,
        seed=args.seed,
        precision="tpu" if args.tpu else "f64",
        verbose=False,
        grid_points=60,
    )
    state, rec = driver.run(cfg)
    infos = rec.as_arrays()

    cloud = sde.double_well_init_cloud(jax.random.PRNGKey(3), args.oracle_n)
    _, oinfos = sde.evolve(
        cloud, 0.0, args.dt, n_steps + 1, drift_name="phase_space",
        params={"m": 1.0, "omega": 1.0, "gamma": 1.0, "T": 0.5,
                "lam": 1.0, "v2": -4.0},
        key=jax.random.PRNGKey(4),
    )

    m_cov = np.asarray(infos["covar"])
    o_cov = np.asarray(oinfos["covar"])[: len(m_cov)]
    m_x1 = np.asarray(infos["x1"])
    o_x1 = np.asarray(oinfos["x1"])[: len(m_x1)]

    # final x-marginal of the model on a grid vs the bath Boltzmann
    g1 = np.linspace(-3.0, 3.0, 601)
    T = 0.5
    v = -2.0 * g1**2 + g1**4
    p_stat = np.exp(-v / T)
    p_stat /= np.trapezoid(p_stat, g1)
    # model x-marginal: integrate p(x, p) over p by quadrature
    ps = np.linspace(-4.0, 4.0, 201)
    X, P = np.meshgrid(g1, ps, indexing="ij")
    coords = jnp.asarray(
        np.stack([X.ravel(), P.ravel()], axis=1), state.precision.compute)
    logp = np.asarray(state(coords, "eval")).reshape(len(g1), len(ps))
    p_x = np.trapezoid(np.exp(logp), ps, axis=1)

    skip = max(10, len(m_cov) // 20)
    cov_rel = np.abs(np.diagonal(m_cov, axis1=1, axis2=2)
                     - np.diagonal(o_cov, axis1=1, axis2=2)) / np.abs(
        np.diagonal(o_cov, axis1=1, axis2=2))
    mean_bias = np.abs((m_x1[skip:] - o_x1[skip:]).mean(axis=0))
    grid = Grid(np.ones(2) * 4.0, 200, sym=True)
    out = {
        "t_end": args.t_end,
        "dt": args.dt,
        "samples": args.samples,
        "chains": args.chains,
        "steps": len(m_cov),
        "cov_rel_err_mean": float(cov_rel[skip:].mean()),
        "cov_rel_err_max": float(cov_rel[skip:].max()),
        "mean_bias_max": float(mean_bias.max()),
        "varp_start": float(o_cov[0][1, 1]),
        "varp_end_oracle": float(o_cov[-1][1, 1]),
        "varp_end_model": float(m_cov[-1][1, 1]),
        "x_marginal_l1_vs_stationary": float(
            np.trapezoid(np.abs(p_x - p_stat), g1)),
        "mass": float(state.integrate(grid)),
    }
    print(json.dumps(out))

    np.savez(
        args.out,
        times=np.asarray(infos["times"]),
        m_cov=m_cov, o_cov=o_cov, m_x1=m_x1, o_x1=o_x1,
        x_grid=g1, p_x=p_x, p_stationary=p_stat,
        meta=json.dumps(out),
    )


if __name__ == "__main__":
    main()

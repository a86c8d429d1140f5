"""Time-evolution artifact for the d=32 Fokker-Planck NORTH-STAR workload
(the shape all throughput benches use): the bench measures RHS throughput;
this actually evolves the density and validates it against the SDE
particle oracle (oracle/sde.py, the exact_dyn.py replacement).

The d=32 phase space is 16 (q, p) pairs under harmonic advection +
momentum damping/diffusion toward temperature T; the INN covariance
diagonal must track the oracle cloud's within MC tolerance while both
relax toward the T-thermal state.

Usage:
  python scripts/evolve_d32_fp.py [--n 16384] [--steps 48] [--k 8]
  python scripts/evolve_d32_fp.py --quick     # CPU smoke
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16384)
    ap.add_argument("--steps", type=int, default=48)
    ap.add_argument("--k", type=int, default=8,
                    help="steps per fused dispatch")
    ap.add_argument("--dt", type=float, default=2e-3)
    ap.add_argument("--chunk", type=int, default=0,
                    help="streaming Gram chunk size (0 = direct; the "
                         "headline operating point is --n 524288 "
                         "--chunk 65536, which engages the tri2 + "
                         "split-kernel pair path)")
    ap.add_argument("--temperature", type=float, default=10.0)
    ap.add_argument("--precision", type=str, default="tpu")
    ap.add_argument("--qmc", action="store_true",
                    help="randomized-QMC latent sampling (sampling/qmc.py)")
    ap.add_argument("--aot-dir", type=str, default=None)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args(argv)
    if args.quick:
        args.n, args.steps, args.k = 1024, 8, 4
        args.precision = "f64"

    import jax

    if args.precision == "f64":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from vmc_pde_tpu.config import RunConfig
    from vmc_pde_tpu.driver import run
    from vmc_pde_tpu.oracle import sde
    from vmc_pde_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    dim = 32
    T = args.temperature
    cfg = RunConfig(
        name="d32_fp", dim=dim, offset=(0.0,) * dim,
        equation="advection_hamiltonian_wDiss",
        equation_params={"T": T},
        variant="affine", latent_name="Gauss",
        dt0=args.dt, max_step=args.dt, t_end=args.dt * (args.steps + 1),
        n_samples_tdvp=args.n, n_samples_obs=args.n,
        chunk_size=args.chunk,
        precision=args.precision, verbose=False, qmc=args.qmc,
        steps_per_dispatch=args.k, aot_dir=args.aot_dir,
    )
    t0 = time.time()
    state, rec = run(cfg, max_steps=args.steps)
    wall = time.time() - t0
    infos = rec.as_arrays()
    m_cov = np.asarray(infos["covar"])
    m_t = np.asarray(infos["times"])

    # SDE oracle: same initial N(0, I) cloud, same operator
    cloud = jax.random.normal(jax.random.PRNGKey(5), (max(args.n, 20000), dim),
                              dtype=jnp.float64)
    _, oinfos = sde.evolve(
        cloud, 0.0, args.dt, args.steps + 1, drift_name="phase_space",
        params={"m": 1.0, "omega": 1.0, "gamma": 1.0, "T": T, "lam": 0.0},
        key=jax.random.PRNGKey(6),
    )
    o_cov = np.asarray(oinfos["covar"])

    # compare covariance diagonals at matching record indices (both record
    # the state at t_i, Q10 pairing)
    n_rec = min(len(m_t), len(o_cov))
    md = np.diagonal(m_cov[:n_rec], axis1=1, axis2=2)
    od = np.diagonal(o_cov[:n_rec], axis1=1, axis2=2)
    rel = np.abs(md - od) / np.maximum(np.abs(od), 1e-9)
    # momentum coordinates (odd indices) heat toward T; discriminate
    p_growth = md[-1, 1::2].mean() / md[0, 1::2].mean()

    # EXACT judge: the system is a linear (OU) SDE -- per (q, p) pair
    # A = [[0, 1], [-1, -gamma]], B = diag(0, 2 gamma T), C(0) = I -- so
    # the true covariance obeys the Lyapunov ODE dC/dt = A C + C A^T + B
    # with no sampling noise. RK4 at h = t/4000 is exact to ~1e-13;
    # unlike the oracle-cloud comparison above this isolates the
    # INN+TDVP error from the judge's own MC scatter.
    A2 = np.array([[0.0, 1.0], [-1.0, -1.0]])
    B2 = np.diag([0.0, 2.0 * T])
    exact_diag = np.empty((n_rec, 2))
    for r in range(n_rec):
        C = np.eye(2)
        n_sub = 4000
        h = m_t[r] / n_sub if m_t[r] > 0 else 0.0
        for _ in range(n_sub if h else 0):
            k1 = A2 @ C + C @ A2.T + B2
            C2 = C + h / 2 * k1
            k2 = A2 @ C2 + C2 @ A2.T + B2
            C3 = C + h / 2 * k2
            k3 = A2 @ C3 + C3 @ A2.T + B2
            C4 = C + h * k3
            k4 = A2 @ C4 + C4 @ A2.T + B2
            C = C + h / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
        exact_diag[r] = np.diag(C)
    ed = np.tile(exact_diag, (1, dim // 2))           # (n_rec, 32) q,p,...
    rel_exact = np.abs(md - ed) / np.maximum(np.abs(ed), 1e-9)

    summary = dict(
        steps=int(len(m_t)), wall_s=round(wall, 1),
        residual_median=float(np.median(infos["solver_res"])),
        cov_diag_rel_err_max=float(rel.max()),
        cov_diag_rel_err_mean=float(rel.mean()),
        cov_diag_exact_rel_err_max=float(rel_exact.max()),
        cov_diag_exact_rel_err_mean=float(rel_exact.mean()),
        momentum_var_growth=float(p_growth),
        entropy_finite=bool(np.isfinite(infos["entropy"]).all()),
    )
    print(json.dumps(summary))
    if args.out:
        np.savez(args.out, times=m_t, covar=m_cov, oracle_covar=o_cov,
                 entropy=infos["entropy"], residual=infos["solver_res"])


if __name__ == "__main__":
    main()

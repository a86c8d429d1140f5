"""Validate a diffusion_anisotropic run against the closed form.

For p0 = N(0, I) under dp/dt = div(D grad p) with constant SPD D, the
exact solution stays Gaussian with Sigma(t) = I + 2 D t (matrix form).
Reads the run's infos.hdf5 and reports the worst relative error of the
recorded covariance against I + 2 D t over the trajectory.

Usage: python scripts/check_aniso.py /tmp/aniso_run [--dim 12] [--seed 0]
"""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir")
    ap.add_argument("--dim", type=int, default=12)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")
    # x64 must match the run: the D draw's VALUES depend on the default
    # dtype (f32 vs f64 jax.random.normal differ), and every driver
    # precision preset enables x64
    jax.config.update("jax_enable_x64", True)

    from vmc_pde_tpu.ops.evolution import DiffusionAnisotropic
    from vmc_pde_tpu.utils.infos import load_infos

    D = np.asarray(DiffusionAnisotropic(dim=args.dim, seed=args.seed).D_matrix)
    infos = load_infos(f"{args.workdir}/infos.hdf5")
    t = np.asarray(infos["times"])
    cov = np.asarray(infos["covar"])
    eye = np.eye(args.dim)

    worst = 0.0
    for i in range(len(t)):
        exact = eye + 2.0 * D * t[i]
        err = np.abs(cov[i] - exact).max() / np.abs(exact).max()
        worst = max(worst, float(err))
    final = eye + 2.0 * D * t[-1]
    print(f"steps: {len(t)}, t_final: {t[-1]:.4f}")
    print(f"D eigenvalues: {np.linalg.eigvalsh(D).round(3)}")
    print(f"worst max-rel covar error over trajectory: {worst:.4f}")
    print(f"final covar diag (model):  {np.diag(cov[-1]).round(3)}")
    print(f"final covar diag (exact):  {np.diag(final).round(3)}")
    med_res = float(np.median(np.asarray(infos["solver_res"])))
    print(f"solver residual median: {med_res:.3e}")


if __name__ == "__main__":
    main()

"""Compare a harmonicOsc_diff (6-D phase-space Fokker-Planck) run against
the independent SDE particle oracle — the reference's 'Wiener' validation
methodology (exact_dyn.py), post-Q10 record pairing (model record i is the
state at t_i).

Usage: python scripts/check_fp6.py /tmp/fp6_run [--particles 60000]
"""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir")
    ap.add_argument("--particles", type=int, default=60000)
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from vmc_pde_tpu.oracle import sde
    from vmc_pde_tpu.utils.infos import load_infos

    infos = load_infos(f"{args.workdir}/infos.hdf5")
    t = np.asarray(infos["times"])
    m_x1 = np.asarray(infos["x1"])
    m_cov = np.asarray(infos["covar"])

    # oracle: same initial Gaussian cloud (mean = preset offset, unit covar)
    offset = np.array([1.0, 0.0, 0.0, 1.0, 0.0, 0.0])
    key = jax.random.PRNGKey(11)
    cloud = offset + np.asarray(
        jax.random.normal(key, (args.particles, 6), dtype=np.float64))
    dt = 1e-2
    n_steps = int(round(t[-1] / dt)) + 1
    _, o = sde.evolve(
        cloud, 0.0, dt, n_steps, drift_name="phase_space",
        params={"m": 1.0, "omega": 1.0, "gamma": 1.0, "T": 10.0, "lam": 0.0},
        key=jax.random.PRNGKey(12),
    )
    ot, ox1, ocov = np.asarray(o["times"]), np.asarray(o["x1"]), \
        np.asarray(o["covar"])

    # compare at the last model record (state at t[-1])
    j = np.argmin(np.abs(ot - t[-1]))
    print(f"model t_final {t[-1]:.3f} vs oracle t {ot[j]:.3f}")
    print("means  (model): ", m_x1[-1].round(3))
    print("means  (oracle):", ox1[j].round(3))
    print("covdiag (model): ", np.diag(m_cov[-1]).round(3))
    print("covdiag (oracle):", np.diag(ocov[j]).round(3))
    dm = np.abs(m_x1[-1] - ox1[j]).max()
    dc = np.abs(np.diag(m_cov[-1]) / np.diag(ocov[j]) - 1).max()
    print(f"max |mean diff| {dm:.4f};  max rel covdiag diff {dc:.4f}")


if __name__ == "__main__":
    main()

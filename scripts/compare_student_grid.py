"""Compare dim-8 Student-t INN runs against the exact grid solution.

Recomputes the radial-grid reference (oracle/radial.py, ~2 s on CPU) and
prints the entropy lag of every INN curve given on the command line, plus
the reference paper's own INN data for context (BENCHMARKS.md 'Grid-based
exact solution').

Usage:
  python scripts/compare_student_grid.py results/curve_tpu_student_s1.npz ...
"""

from __future__ import annotations

import sys
from functools import partial

import numpy as np


def main(argv=None):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from vmc_pde_tpu.oracle import radial

    faces = radial.radial_faces(1500.0, dr0=0.02, r_core=12.0, growth=1.02)
    grid = radial.evolve_radial(
        partial(radial.student_t_radial, nu=2.0, d=8), d=8,
        t_end=5.0, n_record=250, faces=faces)
    print(f"grid: entropy {grid['entropy'][0]:.4f} -> "
          f"{grid['entropy'][-1]:.4f}, mass drift "
          f"{np.abs(grid['mass'] - grid['mass'][0]).max():.2e}")

    curves = list(argv if argv is not None else sys.argv[1:])
    ref_h5 = ("/root/reference/vmc_fluids/paper_plot/data_diffusion/"
              "dim8_StudentT_nu2_NsamplesTDVP10000_NsamplesObs10000/"
              "infos.hdf5")
    for path in curves:
        d = np.load(path)
        t, S = np.asarray(d["times"]), np.asarray(d["entropy"])
        _report(path, t, S, grid)
    try:
        import h5py

        with h5py.File(ref_h5, "r") as f:
            _report("reference paper INN", f["times"][:], f["entropy"][:],
                    grid)
    except OSError:
        pass


def _report(name, t, S, grid):
    Sg = np.interp(t, grid["times"], grid["entropy"])
    lag = S - Sg
    idx = {tt: np.argmin(np.abs(t - tt)) for tt in (1.0, 2.0, 5.0)}
    print(f"{name}: lag t=1 {lag[idx[1.0]]:+.4f}  t=2 {lag[idx[2.0]]:+.4f}  "
          f"t=5 {lag[idx[5.0]]:+.4f}  max|lag| (t>0.5) "
          f"{np.abs(lag[t > 0.5]).max():.4f}")


if __name__ == "__main__":
    main()

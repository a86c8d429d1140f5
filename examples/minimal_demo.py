"""Minimal end-to-end demo: 2D Gaussian diffusion ("mwe" workload).

The TPU-native analogue of the reference's Colab notebook
(vmc_pde_MinimalDemo.ipynb): run the variational solver on the simplest
workload, compare the entropy trajectory against the analytic closed form
S(t) = log(2 pi e (1 + 2t)) per dimension, and the covariance growth against
Cov(t) = (1 + 2t) I. Runs anywhere JAX runs (CPU in ~1 minute, TPU).

    python examples/minimal_demo.py [--t-end 0.3] [--samples 4096]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--t-end", type=float, default=0.3)
    p.add_argument("--samples", type=int, default=4096)
    p.add_argument("--outdir", type=str, default="output/minimal_demo")
    p.add_argument("--precision", type=str, default=None,
                   help="tpu|f32|f64 (default: f64 on CPU, tpu otherwise)")
    args = p.parse_args()

    import jax

    # honor JAX_PLATFORMS=cpu BEFORE the first backend query: this image's
    # sitecustomize force-selects the TPU backend over the env var, and a
    # default_backend() probe hangs outright when the remote TPU tunnel is
    # down (CLAUDE.md gotcha)
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    precision = args.precision or (
        "f64" if jax.default_backend() == "cpu" else "tpu"
    )

    import numpy as np

    from vmc_pde_tpu.config import preset
    from vmc_pde_tpu.driver import run
    from vmc_pde_tpu.viz.paper import entropy_error_stats
    from vmc_pde_tpu.viz.plots import make_final_plots

    cfg = preset(
        "mwe",
        n_samples_tdvp=args.samples,
        n_samples_obs=args.samples,
        dt0=1e-3,
        t_end=args.t_end,
        precision=precision,
        workdir=args.outdir,
        verbose=True,
    )
    state, rec = run(cfg)
    infos = rec.as_arrays()

    stats = entropy_error_stats(infos, dim=2)
    t_final = infos["times"][-1]
    cov = infos["covar"][-1]
    print("\n=== results ===")
    print(f"steps: {len(infos['times'])}, final t: {t_final:.3f}")
    print(f"entropy error vs analytic: max {stats['max']:.3e}, "
          f"final {stats['final']:.3e}")
    print(f"covariance diagonal at t={t_final:.2f}: {np.diag(cov)} "
          f"(exact: {1 + 2 * t_final:.3f})")
    print(f"median solver residual: "
          f"{float(np.median(infos['solver_res'])):.2e}")

    os.makedirs(args.outdir, exist_ok=True)
    figs = make_final_plots(args.outdir, infos, dim=2)
    print(f"wrote {len(figs)} figures + infos.hdf5 to {args.outdir}/")


if __name__ == "__main__":
    main()

"""North-star metric #1 (BASELINE.md): L2 density error vs the exact
dynamics on 2-D diffusion.

The mwe workload (2-D isotropic diffusion, D=1, ~N(0, I) initial density)
has the closed-form solution p(x, t) = N(0, (1+2t) I) -- the analytic
family the reference overlays in its plots (visualization.py:162,188).
This script evolves the mwe preset at reference conditions (f64
statistics, 10^4 TDVP samples, fixed Heun with the reference dt ramp,
main.py:108-118) and reports the density-space error on a dense
quadrature grid:

    L2     = sqrt( sum_g (p_model(x_g) - p_exact(x_g))^2 * bin_area )
    L2_rel = L2 / ||p_exact||_2

Target (BASELINE.json): L2 <= 1e-5.

Run (repo root, CPU, ~2 min):
    JAX_PLATFORMS=cpu python scripts/northstar_l2.py
        [--t-end 1.0] [--samples 10000] [--grid-n 501] [--bound 10.0]

FINDINGS: see results/northstar_l2.txt
"""

import argparse
import json
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t-end", type=float, default=1.0)
    ap.add_argument("--samples", type=int, default=10000)
    ap.add_argument("--grid-n", type=int, default=501)
    ap.add_argument("--bound", type=float, default=10.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--max-step", type=float, default=None,
                    help="override the preset max dt")
    ap.add_argument("--dt0", type=float, default=None,
                    help="override the ramp start (set equal to --max-step "
                         "to disable the geometric ramp)")
    ap.add_argument("--init-scale", type=float, default=None,
                    help="flow output-layer init scale; 0 = EXACTLY the "
                         "identity flow at t=0 (removes the ~6e-6 "
                         "representation floor of the reference's 1e-5 "
                         "random init; the remaining error is Heun's "
                         "clean O(dt^2))")
    ap.add_argument("--gram-f64", action="store_true",
                    help="f64-grade statistics (gram_precision='f64' + "
                         "host eigh) -- removes the f32 per-step bias "
                         "floor on TPU")
    ap.add_argument("--aot-dir", type=str, default=None)
    ap.add_argument("--steps-per-dispatch", type=int, default=10)
    ap.add_argument("--tpu", action="store_true",
                    help="run on the TPU (default: force the cpu backend "
                         "BEFORE any backend query -- this image's "
                         "sitecustomize overrides JAX_PLATFORMS=cpu and a "
                         "default_backend() probe would hang on a dead "
                         "tunnel)")
    args = ap.parse_args()

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from vmc_pde_tpu import driver
    from vmc_pde_tpu.config import preset
    from vmc_pde_tpu.utils.grid import Grid

    over = {}
    if args.max_step is not None:
        over["max_step"] = args.max_step
    if args.dt0 is not None:
        over["dt0"] = args.dt0
    if args.init_scale is not None:
        over["init_scale"] = args.init_scale
    if args.gram_f64:
        over.update(gram_precision="f64", solve_on_device=False,
                    precision="tpu_f64stats" if args.tpu else "f64")
    if args.aot_dir:
        over["aot_dir"] = args.aot_dir
    cfg = preset(
        "mwe",
        t_end=args.t_end,
        exact_t_end=True,  # land ON t_end: the reference loop overshoots
        # by up to dt (quirk Q11), an O(dt) error vs p_exact(t_end) that
        # dominates Heun's O(dt^2) (measured L2 = ||dp/dt||_2 * dt)
        n_samples_tdvp=args.samples,
        n_samples_obs=args.samples,
        precision="tpu" if args.tpu else "f64",
        seed=args.seed,
        steps_per_dispatch=args.steps_per_dispatch,
        plot_every=10**9,
        verbose=False,
        **over,
    )
    state, rec = driver.run(cfg)

    grid = Grid((args.bound,) * 2, args.grid_n, sym=True)
    coords = jnp.asarray(grid.coords, state.precision.compute)
    logp = np.asarray(state(coords, "eval"))
    p_model = np.exp(logp)

    s2 = 1.0 + 2.0 * args.t_end  # dSigma/dt = 2 D I, D = 1
    q = np.sum(grid.coords**2, axis=1) / s2
    p_exact = np.exp(-0.5 * q) / (2.0 * np.pi * s2)

    dl2 = float(np.sqrt(np.sum((p_model - p_exact) ** 2) * grid.bin_area))
    nl2 = float(np.sqrt(np.sum(p_exact**2) * grid.bin_area))
    out = {
        "t_end": args.t_end,
        "samples": args.samples,
        "grid_n": args.grid_n,
        "bound": args.bound,
        "L2": dl2,
        "L2_rel": dl2 / nl2,
        "Linf": float(np.max(np.abs(p_model - p_exact))),
        "mass": float(np.sum(p_model) * grid.bin_area),
        "target": 1e-5,
        "pass": dl2 <= 1e-5,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

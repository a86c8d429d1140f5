"""Dim-8 Gauss diffusion accuracy study: entropy error vs the analytic
closed form, per seed and per solver configuration.

The reference's headline accuracy artifact is the dim-8 Gaussian diffusion
run (paper_plot/data_diffusion/dim8_Gauss_*/infos.hdf5): entropy
S(t) = d/2 log(2 pi e (1 + 2 D t)) (visualization.py:188), max transient
error 0.057 over t in [0, 5]. Round 1 measured 0.118 on the TPU f32 path
vs 0.088 in f64 -- this script separates the f32-statistics contribution
from plain MC/seed noise by sweeping seeds and solver knobs on the same
hardware (ROADMAP.md item 1 / round-1 verdict item 10).

Usage:
  python scripts/accuracy_d8.py --seed 1 [--use-snr] [--svd-tol X]
      [--gram-precision high] [--precision tpu] [--samples 10000]
      [--t-end 5.0] [--json-out FILE]

Prints one JSON line with {seed, steps, entropy_err_max/mean/final,
residual_median, config}.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import math
import sys

import numpy as np


def analytic_entropy(d, t, D=1.0):
    return d / 2.0 * math.log(2.0 * math.pi * math.e) \
        + d / 2.0 * np.log1p(2.0 * D * np.asarray(t))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=1,
                    help="sets BOTH the init seed and the sampling stream")
    ap.add_argument("--latent", type=str, default="Gauss",
                    choices=["Gauss", "Student_t"],
                    help="Student_t reproduces the reference's "
                         "dim8_StudentT_nu2 run (no closed-form entropy; "
                         "compare the dumped curve against the shipped "
                         "paper HDF5)")
    ap.add_argument("--samples", type=int, default=10000)
    ap.add_argument("--depth", type=int, default=4,
                    help="coupling-block depth (reference checklist: 4); "
                         "deeper flows shrink the Student-t ansatz lag")
    ap.add_argument("--samples-obs", type=int, default=None,
                    help="observable budget (default = --samples); raising "
                         "it shrinks the entropy ESTIMATOR noise without "
                         "changing the dynamics")
    ap.add_argument("--t-end", type=float, default=5.0)
    ap.add_argument("--precision", type=str, default="tpu")
    ap.add_argument("--gram-precision", type=str, default="high")
    ap.add_argument("--gram-backend", type=str, default="auto")
    ap.add_argument("--use-snr", action="store_true")
    ap.add_argument("--eloc-clip", type=float, default=0.0,
                    help=">0: winsorize Eloc at this many robust sigmas")
    ap.add_argument("--is-gamma", type=float, default=1.0,
                    help="<1: tail-tempered importance sampling of the "
                         "TDVP statistics (Student_t only; "
                         "TDVPConfig.is_gamma)")
    ap.add_argument("--qmc", action="store_true",
                    help="randomized-QMC (scrambled Sobol) latent sampling "
                         "(sampling/qmc.py): lower estimator noise at the "
                         "same budget")
    ap.add_argument("--snr-tol", type=float, default=2.0)
    ap.add_argument("--svd-tol", type=float, default=1e-11)
    ap.add_argument("--no-tol-floor", action="store_true")
    ap.add_argument("--solver", type=str, default="auto")
    ap.add_argument("--increase-fac", type=float, default=1.3,
                    help="dt ramp factor; the reference's 517-step dim-8 "
                         "runs imply ~2.0 (17 ramp steps + 500 cruise)")
    ap.add_argument("--dt0", type=float, default=1e-7)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (this image's axon "
                         "sitecustomize overrides JAX_PLATFORMS=cpu, so "
                         "the config update must happen in-process)")
    ap.add_argument("--json-out", type=str, default=None)
    ap.add_argument("--dump-curve", type=str, default=None,
                    help="write times/entropy/err arrays to this .npz")
    ap.add_argument("--solve-on-host", action="store_true",
                    help="host numpy f64 eigensolve (reference default)")
    ap.add_argument("--steps-per-dispatch", type=int, default=1,
                    help=">1: batch fixed-Heun steps into one device "
                         "dispatch (TDVP.heun_multi)")
    ap.add_argument("--aot-dir", type=str, default=None,
                    help="AOT executable cache (fresh processes skip the "
                         "remote compile)")
    ap.add_argument("--twice", action="store_true",
                    help="run the evolution twice in one process and report "
                         "both walls: the second is the compile-free steady "
                         "state (the scan program's remote compile does not "
                         "persist in the cache on this image)")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from vmc_pde_tpu.config import RunConfig
    from vmc_pde_tpu.driver import run

    cfg = RunConfig(
        name=f"d8{args.latent.lower()}_seed{args.seed}",
        dim=8, offset=(0.0,) * 8, latent_name=args.latent,
        equation="diffusion", variant="scale", depth=args.depth,
        dt0=args.dt0, max_step=1e-2, t_end=args.t_end,
        increase_fac=args.increase_fac,
        n_samples_tdvp=args.samples,
        n_samples_obs=args.samples_obs or args.samples,
        seed=args.seed, sample_seed=args.seed, precision=args.precision,
        gram_precision=args.gram_precision,
        gram_backend=args.gram_backend,
        use_snr=args.use_snr, snr_tol=args.snr_tol, svd_tol=args.svd_tol,
        eloc_clip=args.eloc_clip, is_gamma=args.is_gamma, qmc=args.qmc,
        auto_tol_floor=not args.no_tol_floor,
        solver_method=args.solver,
        solve_on_device=not args.solve_on_host,
        steps_per_dispatch=args.steps_per_dispatch,
        aot_dir=args.aot_dir,
        workdir=None, verbose=False,
    )
    import time

    t_wall = -time.perf_counter()
    state, rec = run(cfg)
    t_wall += time.perf_counter()
    t_wall2 = None
    if args.twice:
        # vary the RNG stream: the tunnel memoizes identical
        # (program, input) executions (CLAUDE.md), so replaying the same
        # seeds would measure cache replay, not execution
        cfg2 = dataclasses.replace(cfg, sample_seed=args.seed + 1000)
        t_wall2 = -time.perf_counter()
        state, rec = run(cfg2)
        t_wall2 += time.perf_counter()
    infos = rec.as_arrays()
    t = np.asarray(infos["times"])
    S = np.asarray(infos["entropy"])
    if args.latent == "Gauss":
        err = np.abs(S - analytic_entropy(8, t))
    else:
        err = np.full_like(S, np.nan)  # no closed form for Student-t
    res = np.asarray(infos["solver_res"])
    out = {
        "seed": args.seed,
        "steps": int(t.size),
        "t_final": float(t[-1]),
        "entropy_err_max": round(float(err.max()), 5),
        "entropy_err_mean": round(float(err.mean()), 5),
        "entropy_err_final": round(float(err[-1]), 5),
        "t_at_max_err": round(float(t[np.argmax(err)]), 4),
        "residual_median": float(np.median(res)),
        "wall_s": round(t_wall, 1),
        "wall_s_warm": None if t_wall2 is None else round(t_wall2, 1),
        "steps_per_dispatch": args.steps_per_dispatch,
        "config": {
            "precision": args.precision,
            "gram_precision": args.gram_precision,
            "use_snr": args.use_snr,
            "svd_tol": args.svd_tol,
            "auto_tol_floor": not args.no_tol_floor,
            "samples": args.samples,
            "samples_obs": args.samples_obs or args.samples,
            "increase_fac": args.increase_fac,
            "dt0": args.dt0,
            "latent": args.latent,
            "depth": args.depth,
            "eloc_clip": args.eloc_clip,
            "is_gamma": args.is_gamma,
            "qmc": args.qmc,
            "solver": args.solver,
            "solve_on_host": args.solve_on_host,
        },
    }
    if args.dump_curve:
        extra = {}
        if "dist_params" in infos:
            extra["dist_params"] = np.asarray(infos["dist_params"])
        np.savez(args.dump_curve, times=t, entropy=S, err=err, res=res,
                 **extra)
    line = json.dumps(out)
    print(line, flush=True)
    if args.json_out:
        with open(args.json_out, "a") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()

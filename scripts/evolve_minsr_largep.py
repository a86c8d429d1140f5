"""Time-evolution accuracy at large parameter count on the minSR path
(round-3 item 2: minSR was RHS-benchmarked only; this is the evolution
study).

Workload: d-dimensional Gaussian diffusion with a DEEP affine flow --
parameter counts far beyond the dense-Gram regime -- integrated with the
fixed-Heun ramp to t_end under solver_method='minsr'. Accuracy metric: the
analytic entropy S(t) = d/2 log(2 pi e (1 + 2 D t)) of the exact solution
(visualization.py:188 closed form), plus the covariance diagonal 1 + 2t.

Optionally re-runs the first steps with the STREAMING (chunk_size) minSR
assembly to confirm chunked == direct along an actual trajectory.

Usage:
  python scripts/evolve_minsr_largep.py --depth 16 --hidden 64 --n 4096
  python scripts/evolve_minsr_largep.py --quick          # smoke shapes
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(args, chunk=0):
    import jax.numpy as jnp

    from vmc_pde_tpu.models import flow as flow_mod
    from vmc_pde_tpu.models.state import VarState
    from vmc_pde_tpu.ops import evolution
    from vmc_pde_tpu.parallel.mesh import ParallelCtx
    from vmc_pde_tpu.sampling.sampler import Sampler
    from vmc_pde_tpu.solver.steppers import FixedStepper
    from vmc_pde_tpu.solver.tdvp import TDVP, TDVPConfig
    from vmc_pde_tpu.utils.dtypes import resolve

    prec = resolve(args.precision)
    ctx = ParallelCtx.single_device()
    fl, params = flow_mod.build_flow(
        1, dim=args.dim, depth=args.depth, hidden=(args.hidden,),
        variant="scale", latent_name="Gauss", dtype=prec.compute)
    s = Sampler(dim=args.dim, ctx=ctx, name="Gauss", dtype=prec.compute)
    st = VarState(fl, params, sampler=s, ctx=ctx, precision=prec)
    cfg = TDVPConfig(solver_method="minsr", chunk_size=chunk,
                     compute_snr=False)
    tdvp = TDVP(st, evolution.Diffusion(D=1.0), cfg, n_samples=args.n,
                precision=prec)
    stepper = FixedStepper(timeStep=args.dt0, maxStep=args.max_step,
                           pair_fn=tdvp.heun_pair)
    return st, tdvp, stepper


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=8)
    ap.add_argument("--depth", type=int, default=16)
    ap.add_argument("--hidden", type=int, default=64)
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--t-end", type=float, default=1.0)
    ap.add_argument("--dt0", type=float, default=1e-6)
    ap.add_argument("--max-step", type=float, default=1e-2)
    ap.add_argument("--precision", type=str, default="tpu")
    ap.add_argument("--chunk", type=int, default=0,
                    help="also verify the streaming assembly for this many "
                         "leading steps at this chunk size (0 = skip)")
    ap.add_argument("--chunk-steps", type=int, default=3)
    ap.add_argument("--steps-per-dispatch", type=int, default=1,
                    help=">1: batch the main evolution into K-step fused "
                         "dispatches (TDVP.heun_multi) -- essential when "
                         "per-dispatch tunnel latency dominates")
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args(argv)
    if args.quick:
        args.depth, args.hidden, args.n = 4, 16, 1024
        args.t_end = 0.02
        args.precision = "f64"

    import jax

    if args.precision in ("f64",):
        # CPU smoke mode -- this image's axon sitecustomize force-selects
        # the TPU backend over JAX_PLATFORMS, so override in-process
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from vmc_pde_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    st, tdvp, stepper = build(args)
    print(f"P = {tdvp.n_params}, N = {tdvp.n_samples}, "
          f"solver = {tdvp.solver_method}, backend = {jax.default_backend()}")

    theta = st.get_parameters()
    key = jax.random.PRNGKey(7)
    t, n_step = 0.0, 0
    ts, ents, covd, res = [], [], [], []
    K = max(args.steps_per_dispatch, 1)
    t_wall = time.time()
    while t < args.t_end:
        if K > 1:
            # simulate the deterministic dt ramp K steps ahead (the
            # driver's plan_batch logic) and run one fused dispatch
            ts_l, dts_l = [], []
            t_sim, dt_sim = t, stepper.dt
            for _ in range(K):
                if not (t_sim < args.t_end):
                    break
                dt_sim = min(dt_sim * stepper.increase_fac, stepper.maxStep)
                ts_l.append(t_sim)
                dts_l.append(dt_sim)
                t_sim += dt_sim
            if len(ts_l) == K:
                keys = []
                for _ in ts_l:
                    key, sk = jax.random.split(key)
                    keys.append(sk)
                theta, auxs = tdvp.heun_multi(theta, ts_l, dts_l,
                                              jnp.stack(keys))
                ts.extend(ts_l)
                ents.extend(np.asarray(auxs["entropy"]).tolist())
                covd.extend(np.mean(np.diagonal(
                    np.asarray(auxs["covar"]), axis1=1, axis2=2),
                    axis=1).tolist())
                res.extend(np.asarray(auxs["solver_res"]).tolist())
                t = t_sim
                stepper.dt = dts_l[-1]
                n_step += K
                continue
        key, sk = jax.random.split(key)
        r = stepper.step(t, None, theta, sk)
        theta, dt, info = r.y, r.dt_used, r.info
        ts.append(t)
        ents.append(float(info["entropy"]))
        covd.append(float(np.mean(np.diag(np.asarray(info["covar"])))))
        res.append(float(info["solver_res"]))
        t += dt
        n_step += 1
    wall = time.time() - t_wall

    ts = np.asarray(ts)
    ents = np.asarray(ents)
    d = args.dim
    S_exact = d / 2 * np.log(2 * math.pi * math.e * (1 + 2 * ts))
    err = np.abs(ents - S_exact)
    cov_exact = 1 + 2 * np.asarray(ts)
    cov_err = np.abs(np.asarray(covd) - cov_exact)
    summary = dict(
        P=tdvp.n_params, N=tdvp.n_samples, steps=n_step,
        t_end=float(ts[-1]), wall_s=round(wall, 2),
        entropy_err_final=float(err[-1]), entropy_err_max=float(err.max()),
        entropy_err_mean=float(err.mean()),
        cov_diag_err_max=float(cov_err.max()),
        residual_median=float(np.median(res)),
    )
    print(json.dumps(summary))

    if args.chunk:
        # replay the first steps with the SAME keys through the streaming
        # assembly vs a FRESH direct problem; identical samples -> near-
        # identical trajectory (kernel-inverse noise amplification only)
        st2, _, stepper2 = build(args, chunk=args.chunk)
        st3, _, stepper3 = build(args, chunk=0)
        theta2, theta3 = st2.get_parameters(), st3.get_parameters()
        key2 = jax.random.PRNGKey(7)
        t2 = 0.0
        diffs = []
        for i in range(args.chunk_steps):
            key2, sk2 = jax.random.split(key2)
            r2 = stepper2.step(t2, None, theta2, sk2)
            r3 = stepper3.step(t2, None, theta3, sk2)
            theta2, theta3 = r2.y, r3.y
            t2 += r2.dt_used
            diffs.append(float(jnp.max(jnp.abs(theta2 - theta3))))
        print(json.dumps(dict(chunk=args.chunk,
                              chunked_vs_direct_max_dtheta=diffs)))

    if args.out:
        np.savez(args.out, times=ts, entropy=ents, covdiag=covd,
                 residual=res, **summary)


if __name__ == "__main__":
    main()

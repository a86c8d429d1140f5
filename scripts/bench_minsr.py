"""Measure the minSR kernel-space solver against Cholesky in its design
regime (P >> N) on real TPU hardware.

Builds a deep d=32 flow (defaults: depth 8, hidden 32 -> P = 34,864;
--depth 16 --hidden 128 -> P = 271,920), samples N=1024 (the published
BENCHMARKS.md numbers), and times one fused TDVP RHS per solver with the
BENCHMARKS.md device-only methodology (K reps chained in one jit is not
possible across solver objects, so each RHS is timed as dispatch+block
after a warmup call; at these solve costs the tunnel's ~0.1 s dispatch
is negligible).

Usage: python scripts/bench_minsr.py [--depth 8] [--hidden 32] [--n 1024]
       python scripts/bench_minsr.py --depth 16 --hidden 128 --methods minsr
"""

from __future__ import annotations

import argparse
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--depth", type=int, default=8)
    ap.add_argument("--hidden", type=int, default=32)
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--dim", type=int, default=32)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--methods", type=str, default="minsr,cholesky")
    args = ap.parse_args(argv)

    import jax

    from vmc_pde_tpu.models import flow as flow_mod
    from vmc_pde_tpu.models.state import VarState
    from vmc_pde_tpu.ops import evolution
    from vmc_pde_tpu.parallel.mesh import ParallelCtx
    from vmc_pde_tpu.sampling.sampler import Sampler
    from vmc_pde_tpu.solver.tdvp import TDVP, TDVPConfig
    from vmc_pde_tpu.utils.cache import enable_compilation_cache
    from vmc_pde_tpu.utils.dtypes import resolve

    enable_compilation_cache()
    prec = resolve("tpu")
    ctx = ParallelCtx.single_device()
    fl, params = flow_mod.build_flow(
        1, dim=args.dim, depth=args.depth, hidden=(args.hidden,),
        variant="affine", latent_name="Gauss", dtype=prec.compute)
    s = Sampler(dim=args.dim, ctx=ctx, name="Gauss", dtype=prec.compute)
    st = VarState(fl, params, sampler=s, ctx=ctx, precision=prec)
    eq = evolution.Diffusion(D=1.0)

    results = {}
    ap2 = args.methods.split(",")
    for method in ap2:
        tdvp = TDVP(st, eq, TDVPConfig(solver_method=method),
                    n_samples=args.n, n_samples_obs=args.n, precision=prec)
        print(f"{method}: P={tdvp.n_params} N={tdvp.n_samples}", flush=True)
        theta = st.get_parameters()
        key = jax.random.PRNGKey(5)
        u, aux = tdvp.rhs(theta, 0.0, key)  # compile + warm
        jax.block_until_ready(u)
        times = []
        for r in range(args.reps):
            k = jax.random.fold_in(key, r + 1)  # vary inputs (memoization)
            t0 = time.perf_counter()
            u, aux = tdvp.rhs(theta, 0.0, k)
            jax.block_until_ready(u)
            times.append(time.perf_counter() - t0)
        best = min(times)
        res = float(aux["solver_res"])
        print(f"{method}: best {best*1e3:.1f} ms/RHS  residual {res:.2e}",
              flush=True)
        results[method] = best

    if "minsr" in results and "cholesky" in results:
        print(f"minsr speedup over cholesky at P>>N: "
              f"{results['cholesky'] / results['minsr']:.2f}x")


if __name__ == "__main__":
    main()

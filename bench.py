"""Benchmark: d=32 Fokker-Planck TDVP right-hand-side throughput on the
current accelerator (the BASELINE.json north-star workload: "High-dimensional
(d=32) interacting OU Fokker-Planck, large-batch sampling").

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "samples/s/chip", "vs_baseline": R}

``value``      -- samples/sec of the fused one-jit TDVP RHS (sample ->
                  push-forward -> per-sample grads + momentum-block Hessian ->
                  Gram/force -> regularized eigensolve -> update).
``vs_baseline``-- speedup vs a reference-architecture emulation ON THE SAME
                  CHIP: separate jit dispatches per stage (eval/grads,
                  Hessian, push) with host-staged statistics and host numpy
                  eigensolve, mirroring vmc_pde's pmap-closure + MPI + host
                  eigh structure (SURVEY.md section 3.1). The reference
                  publishes no speed numbers (BASELINE.md), so same-hardware
                  architecture-for-architecture is the honest comparison.

Run: python bench.py [--dim 32] [--samples 16384] [--iters 5] [--quick]
"""

import argparse
import json
import sys
import time
from functools import partial


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build(dim, depth, n_samples, precision_name="tpu", chunk=0,
          solver="auto", gram_precision="highest"):
    import jax.numpy as jnp

    from vmc_pde_tpu.models.flow import build_flow
    from vmc_pde_tpu.models.state import VarState
    from vmc_pde_tpu.ops.evolution import FokkerPlanck
    from vmc_pde_tpu.parallel.mesh import ParallelCtx
    from vmc_pde_tpu.sampling.sampler import Sampler
    from vmc_pde_tpu.solver.tdvp import TDVP, TDVPConfig
    from vmc_pde_tpu.utils.dtypes import resolve

    prec = resolve(precision_name)
    ctx = ParallelCtx.create()
    flow, params = build_flow(1, dim=dim, depth=depth, variant="affine",
                              latent_name="Gauss", dtype=prec.compute)
    sampler = Sampler(dim=dim, ctx=ctx, name="Gauss", dtype=prec.compute)
    state = VarState(flow, params, sampler=sampler, ctx=ctx, precision=prec)
    eq = FokkerPlanck()
    tdvp = TDVP(state, eq,
                TDVPConfig(compute_snr=False, observables=False,
                           chunk_size=chunk, solver_method=solver,
                           gram_precision=gram_precision),
                n_samples=n_samples, n_samples_obs=n_samples, precision=prec)
    return state, tdvp


def bench_fused(state, tdvp, iters):
    import jax

    theta = state.get_parameters()
    key = jax.random.PRNGKey(0)
    # warmup/compile
    t0 = time.perf_counter()
    u, aux = tdvp.rhs(theta, 0.0, key, intStep=0)
    jax.block_until_ready(u)
    log(f"fused compile+first run: {time.perf_counter() - t0:.1f}s, "
        f"residual {float(aux['solver_res']):.2e}")
    import jax.numpy as jnp

    t0 = time.perf_counter()
    for i in range(iters):
        u, _ = tdvp.rhs(theta, 0.0, key, intStep=i + 1)
        float(jnp.sum(u))  # force materialization (block_until_ready has
        # been observed to return early through the remote-device path)
    return (time.perf_counter() - t0) / iters


def bench_reference_style(state, tdvp, iters):
    """Reference-architecture emulation: per-stage jit dispatch with host
    round-trips between every stage and host numpy f64 eigensolve
    (tdvp.py:57-64, mpi_wrapper.py:150-163 pattern)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vmc_pde_tpu.ops import score
    from vmc_pde_tpu.solver.tdvp import _solve_regularized

    flow = state.flow
    theta_c = jnp.asarray(state.get_parameters(), state.precision.compute)
    n = tdvp.n_samples
    idx = tuple(tdvp._hess_idx)
    f = tdvp._log_prob_flat

    sample_j = jax.jit(lambda p, k: flow.latent_sample(k, p, n,
                                                       dtype=theta_c.dtype))
    push_j = jax.jit(jax.vmap(flow.push, in_axes=(None, 0)))
    grads_j = jax.jit(jax.vmap(
        partial(score.value_score_and_param_grad, f), in_axes=(None, 0)))
    hess_j = jax.jit(jax.vmap(
        partial(score.hessian_block, f, idx=idx), in_axes=(None, 0)))
    eo_j = jax.jit(lambda e, o: (e - e.mean())[:, None] * (o - o.mean(0)))
    cov_j = jax.jit(lambda d: d.T @ d)
    mean_j = jax.jit(lambda d: d.mean(0))

    key = jax.random.PRNGKey(0)
    params = tdvp._unravel(theta_c)

    def one_step(k):
        # stage 1: sample (device) -> host sync (reference pulls samples
        # through pmap result handles between stages)
        z = sample_j(params, k)
        z.block_until_ready()
        x, _ = push_j(params, z)
        x.block_until_ready()
        # stage 2: grads
        logp, g, O = grads_j(theta_c, x)
        O.block_until_ready()
        # stage 3: hessian
        H = hess_j(theta_c, x)
        H.block_until_ready()
        eloc = tdvp.equation.eloc(x, g, H, 0.0)
        # stage 4: stats with host Allreduce staging (device->host->device)
        EO = eo_j(eloc, O)
        S_local = np.asarray(cov_j(O - mean_j(O)))  # host staging
        S = S_local / n
        F = np.asarray(mean_j(EO))
        # stage 5: host f64 eigensolve (reference default)
        u, ev, snr, _ = _solve_regularized(
            S.astype(np.float64), F.astype(np.float64), tdvp.cfg, n,
            eigh_fn=np.linalg.eigh)
        return u

    t0 = time.perf_counter()
    u = one_step(key)
    log(f"reference-style compile+first run: {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    for i in range(iters):
        u = one_step(jax.random.fold_in(key, i))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=32)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--samples", type=int, default=16384)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--chunk", type=int, default=2048,
                    help="streaming Gram chunk size (0 = direct)")
    ap.add_argument("--gram-precision", type=str, default="high",
                    choices=["highest", "high", "default"])
    ap.add_argument("--solver", type=str, default="auto",
                    choices=["auto", "eigh", "cholesky", "cg"])
    ap.add_argument("--quick", action="store_true",
                    help="small shapes for smoke testing")
    ap.add_argument("--no-baseline", action="store_true")
    args = ap.parse_args()

    if args.quick:
        args.dim, args.samples, args.iters = 8, 2048, 2
        args.chunk = 0
    if args.samples < 1 or args.dim < 2 or args.dim % 2:
        ap.error("--samples must be >= 1 and --dim an even integer >= 2")

    import jax

    from vmc_pde_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    n_chips = len(jax.devices())
    log(f"devices: {jax.devices()} (n={n_chips})")

    state, tdvp = build(args.dim, args.depth, args.samples,
                        chunk=args.chunk, solver=args.solver,
                        gram_precision=args.gram_precision)
    log(f"solver={tdvp.solver_method} chunk={args.chunk}")
    log(f"dim={args.dim} n_params={state.numParameters} "
        f"n_samples={tdvp.n_samples}")

    dt_fused = bench_fused(state, tdvp, args.iters)
    sps = tdvp.n_samples / dt_fused / n_chips
    log(f"fused: {dt_fused * 1e3:.2f} ms/rhs -> {sps:,.0f} samples/s/chip")

    vs = 1.0
    if not args.no_baseline:
        # one timed iteration: the baseline's host f64 eigensolve alone is
        # minutes at large P (that cost is the point of the comparison)
        dt_ref = bench_reference_style(state, tdvp, 1)
        sps_ref = tdvp.n_samples / dt_ref / n_chips
        vs = dt_ref / dt_fused
        log(f"reference-style: {dt_ref * 1e3:.2f} ms/rhs -> "
            f"{sps_ref:,.0f} samples/s/chip; speedup {vs:.2f}x")

    print(json.dumps({
        "metric": f"tdvp_rhs_samples_per_sec_d{args.dim}_fokker_planck",
        "value": round(sps, 1),
        "unit": "samples/s/chip",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()

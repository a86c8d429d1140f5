"""TPU benchmark: fused per-sample Pallas kernel vs the XLA per-sample
pipeline, at the flagship d=32 Fokker-Planck shape.

Measures (a) the isolated per-sample stage (sample batch -> logp, Eloc, O)
and (b) the full TDVP RHS, for per_sample_backend='xla' vs 'pallas'.
Inputs vary per rep (fresh fold_in key -> fresh samples) because the
remote-execution tunnel memoizes identical (program, input) pairs
(CLAUDE.md gotchas; same methodology as scripts/bench_syrk.py).

Run (repo root): timeout 900 python scripts/bench_persample.py
    [--dim 32] [--depth 4] [--samples 16384] [--tile 256] [--rhs]

FINDINGS (2026-08-17, single v5p chip through the axon tunnel):
  see results/bench_persample.txt
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build(dim, depth, n_samples, backend, tile):
    from vmc_pde_tpu.models.flow import build_flow
    from vmc_pde_tpu.models.state import VarState
    from vmc_pde_tpu.ops.evolution import FokkerPlanck
    from vmc_pde_tpu.parallel.mesh import ParallelCtx
    from vmc_pde_tpu.sampling.sampler import Sampler
    from vmc_pde_tpu.solver.tdvp import TDVP, TDVPConfig
    from vmc_pde_tpu.utils.dtypes import resolve

    prec = resolve("tpu")
    ctx = ParallelCtx.create()
    flow, params = build_flow(1, dim=dim, depth=depth, variant="affine",
                              latent_name="Gauss", dtype=prec.compute)
    sampler = Sampler(dim=dim, ctx=ctx, name="Gauss", dtype=prec.compute)
    state = VarState(flow, params, sampler=sampler, ctx=ctx, precision=prec)
    tdvp = TDVP(state, FokkerPlanck(),
                TDVPConfig(compute_snr=False, observables=False,
                           per_sample_backend=backend,
                           per_sample_tile=tile),
                n_samples=n_samples, n_samples_obs=n_samples, precision=prec)
    return state, tdvp


def time_per_sample_stage(state, tdvp, K=10, label=""):
    """Device time of the per-sample stage alone: fresh x each rep, all
    outputs reduced into the carry."""
    import jax
    import jax.numpy as jnp

    theta = jnp.asarray(state.get_parameters(), tdvp.precision.compute)
    n, d = tdvp.n_samples, state.dim
    key = jax.random.PRNGKey(0)

    def body(i, acc):
        x = jax.random.normal(jax.random.fold_in(key, i), (n, d),
                              dtype=theta.dtype)
        logp, eloc, O = tdvp._per_sample_batch(theta, x, 0.0)
        return (acc + jnp.sum(logp) + jnp.sum(eloc)
                + jnp.sum(O).astype(jnp.float32))

    @jax.jit
    def loop():
        return jax.lax.fori_loop(0, K, body, jnp.float32(0))

    t0 = time.perf_counter()
    jax.block_until_ready(loop())
    log(f"{label}: compile+first ({K} reps): "
        f"{time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    jax.block_until_ready(loop())
    dt = (time.perf_counter() - t0) / K
    log(f"{label}: {dt * 1e3:.2f} ms/per-sample-stage "
        f"({n / dt / 1e3:.0f}k samples/s)")
    return dt


def time_rhs(state, tdvp, K=10, label=""):
    import jax
    import jax.numpy as jnp

    theta = jnp.asarray(state.get_parameters(), tdvp.precision.compute)
    key = jax.random.PRNGKey(0)
    n, n_obs = tdvp.n_samples, tdvp.n_samples_obs

    def body(i, carry):
        th, acc = carry
        aux = tdvp._rhs_impl(th, 0.0, jax.random.fold_in(key, i),
                             None, None, None, None, n, n_obs)
        s = sum(jnp.sum(v).astype(jnp.float32)
                for v in jax.tree.leaves(aux))
        return th + 0.0 * aux["update"].astype(th.dtype), acc + s

    @jax.jit
    def loop(th):
        return jax.lax.fori_loop(0, K, body, (th, jnp.float32(0)))

    t0 = time.perf_counter()
    jax.block_until_ready(loop(theta))
    log(f"{label}: compile+first ({K} RHS): {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    jax.block_until_ready(loop(theta))
    dt = (time.perf_counter() - t0) / K
    log(f"{label}: {dt * 1e3:.1f} ms/rhs ({n / dt / 1e3:.0f}k samples/s)")
    return dt


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=32)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--samples", type=int, default=16384)
    ap.add_argument("--tile", type=int, default=256)
    ap.add_argument("--rhs", action="store_true",
                    help="also time the full RHS for both backends")
    ap.add_argument("--backend", choices=["both", "xla", "pallas"],
                    default="both")
    ap.add_argument("--probe-noquad", action="store_true",
                    help="also time the raw pallas kernel without the "
                         "Hessian quad (isolates the jvp^2 share)")
    args = ap.parse_args(argv)

    import jax
    log(f"backend: {jax.default_backend()}, devices: {jax.devices()}")

    results = {}
    for backend in (["xla", "pallas"] if args.backend == "both"
                    else [args.backend]):
        state, tdvp = build(args.dim, args.depth, args.samples,
                            backend, args.tile)
        log(f"--- {backend}: dim={args.dim} P={state.numParameters} "
            f"N={tdvp.n_samples} tile={args.tile}")
        results[backend] = time_per_sample_stage(
            state, tdvp, label=f"per-sample[{backend}]")
        if args.rhs:
            results[f"{backend}_rhs"] = time_rhs(
                state, tdvp, label=f"rhs[{backend}]")

    if args.probe_noquad:
        import jax
        import jax.numpy as jnp

        from vmc_pde_tpu.kernels import persample
        from vmc_pde_tpu.ops import score

        state, tdvp = build(args.dim, args.depth, args.samples,
                            "xla", args.tile)
        theta0 = jnp.asarray(state.get_parameters(),
                             tdvp.precision.compute)
        n, d = tdvp.n_samples, state.dim
        key = jax.random.PRNGKey(0)
        for tag, dirs in (("noquad", None),
                          ("quad", tdvp._hess_dirs)):
            run = persample.make_per_sample_pallas(
                state.flow, tdvp._unravel, state.numParameters, dirs,
                tile=args.tile, template=state.params)

            def body(i, acc, run=run):
                x = jax.random.normal(jax.random.fold_in(key, i), (n, d),
                                      dtype=theta0.dtype)
                logp, g, quad, O = run(theta0, x)
                s = jnp.sum(logp) + jnp.sum(g) + jnp.sum(O)
                if quad is not None:
                    s = s + jnp.sum(quad)
                return acc + s.astype(jnp.float32)

            loop = jax.jit(lambda: jax.lax.fori_loop(
                0, 10, body, jnp.float32(0)))
            t0 = time.perf_counter()
            jax.block_until_ready(loop())
            log(f"probe[{tag}]: compile+first {time.perf_counter()-t0:.1f}s")
            t0 = time.perf_counter()
            jax.block_until_ready(loop())
            dt = (time.perf_counter() - t0) / 10
            log(f"probe[{tag}]: {dt*1e3:.2f} ms")

    if "xla" in results and "pallas" in results:
        log(f"speedup (per-sample stage): "
            f"{results['xla'] / results['pallas']:.2f}x")
    if "xla_rhs" in results and "pallas_rhs" in results:
        log(f"speedup (full RHS): "
            f"{results['xla_rhs'] / results['pallas_rhs']:.2f}x")


if __name__ == "__main__":
    main()

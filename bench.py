"""Benchmark: d=32 Fokker-Planck TDVP right-hand-side throughput on the
current accelerator (the BASELINE.json north-star workload: "High-dimensional
(d=32) interacting OU Fokker-Planck, large-batch sampling").

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "samples/s/chip", "vs_baseline": R}

``value`` -- samples/sec of the fused one-jit TDVP RHS (sample ->
  push-forward -> per-sample grads + momentum-block Hessian -> Gram/force ->
  randomized top-k spectrum -> Tikhonov/Cholesky solve -> update +
  diagnostics), measured as pure device time: K=10 RHS evaluations run
  inside ONE jitted fori_loop with every aux output folded into the carry
  (no DCE), timed around a single block_until_ready. Per-call host dispatch
  is excluded by construction -- on this machine dispatch crosses a remote
  TPU tunnel (~100 ms/call, 10^3x a real host's dispatch), which round-1
  numbers wrongly charged to the device.

``vs_baseline`` -- matched-shape, matched-solver comparison at the
  REFERENCE'S OWN run shape (dim-8 diffusion flow, P≈700, N=10^4, spectral
  eigh solve; vmc_fluids/main.py:108-118): fused one-jit RHS vs a faithful
  reference-architecture emulation on the same chip (per-stage jit dispatch
  with host staging between stages + host f64 eigensolve -- the reference's
  pmap+MPI+numpy structure, SURVEY.md section 3.1). The reference publishes
  no speed numbers (BASELINE.md), so same-hardware architecture-for-
  architecture at its own shape is the honest comparison; the d=32
  emulation ratio (~2000x) mostly measures the host eigh's O(P^3) blowup
  and is reported to stderr only.

Run: python bench.py [--dim 32] [--samples 16384] [--quick] [--stages]
"""

import argparse
import json
import os
import sys
import time
from functools import partial


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build(dim, depth, n_samples, precision_name="tpu", chunk=0,
          solver="auto", gram_precision="high", gram_backend="auto",
          gram_cross="auto"):
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
                           gram_precision=gram_precision,
                           gram_backend=gram_backend,
                           gram_cross=gram_cross),
                n_samples=n_samples, n_samples_obs=n_samples, precision=prec)
    return state, tdvp


def device_time_per_rhs(state, tdvp, K=10, label="fused", aot_dir=None):
    """Pure device time of one fused RHS: K iterations inside one jitted
    fori_loop, chained through the parameter vector, every aux leaf summed
    into the carry so nothing is dead-code-eliminated. The final
    iteration's solver residual rides the carry out as the correctness
    diagnostic (no separate single-RHS program to compile).

    ``aot_dir``: persist/load the compiled loop executable via the AOT
    cache (utils/aot.py) so fresh processes skip the minutes-long remote
    TPU compile; no-ops on non-TPU backends."""
    import jax
    import jax.numpy as jnp

    from vmc_pde_tpu.utils import aot

    theta = jnp.asarray(state.get_parameters(), tdvp.precision.compute)
    key = jax.random.PRNGKey(0)
    n, n_obs = tdvp.n_samples, tdvp.n_samples_obs

    def body(i, carry):
        th, acc, _ = carry
        aux = tdvp._rhs_impl(th, 0.0, jax.random.fold_in(key, i),
                             None, None, None, None, n, n_obs)
        s = sum(jnp.sum(v).astype(jnp.float32)
                for v in jax.tree.leaves(aux))
        return (th + 0.0 * aux["update"].astype(th.dtype), acc + s,
                aux["solver_res"].astype(jnp.float32))

    @jax.jit
    def loop(th):
        return jax.lax.fori_loop(
            0, K, body, (th, jnp.float32(0), jnp.float32(0)))

    t0 = time.perf_counter()
    run = aot.load_or_compile(loop, (theta,), cache_dir=aot_dir,
                              tag=f"bench_loop_{label.replace(' ', '_')}",
                              verbose=bool(aot_dir))
    out = jax.block_until_ready(run(theta))
    log(f"{label}: compile+first ({K} RHS): {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    out = jax.block_until_ready(run(theta))
    dt = (time.perf_counter() - t0) / K

    residual = float(out[2])
    log(f"{label}: {dt * 1e3:.1f} ms/rhs (device), residual "
        f"{residual:.2e}")
    return dt, residual


def mfu_report(dt, n, P, dim, gram_passes=3, peak_bf16_tflops=197.0):
    """Absolute accounting: useful f32-equivalent FLOPs per RHS vs the MXU
    pass-adjusted ceiling."""
    gram = 2.0 * n * P * P                 # O^T O contraction
    force = 2.0 * n * P                    # e @ O
    chol = P**3 / 3.0                      # Tikhonov factor + solve
    spec = 5 * 2.0 * P * P * 72            # randomized subspace matmuls
    total = gram + force + chol + spec
    eff = total / dt / 1e12
    # 3-pass (f32-grade) matmul ceiling on a bf16 MXU
    ceiling = peak_bf16_tflops / gram_passes
    log(f"roofline: {total / 1e12:.2f} TFLOP/rhs (gram {gram/1e12:.2f}, "
        f"cholesky {chol/1e12:.2f}) -> {eff:.1f} TFLOP/s f32-equiv "
        f"= {100 * eff / ceiling:.0f}% of the {gram_passes:.3g}-pass MXU "
        f"ceiling ({ceiling:.0f} TFLOP/s)")
    return eff


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
    idx = tuple(tdvp._hess_idx) if tdvp._hess_idx is not None else None
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


def stage_breakdown(state, tdvp, K=10):
    """Per-stage device times via incremental loop-jits."""
    import jax
    import jax.numpy as jnp

    from vmc_pde_tpu.ops import score

    theta = jnp.asarray(state.get_parameters(), tdvp.precision.compute)
    key = jax.random.PRNGKey(0)
    n = tdvp.n_samples
    flow = state.flow
    f = tdvp._log_prob_flat
    idx = tuple(tdvp._hess_idx) if tdvp._hess_idx is not None else None

    def timeit(name, fn):
        @jax.jit
        def loop(th):
            def body(i, acc):
                out = fn(th, jax.random.fold_in(key, i))
                return acc + sum(jnp.sum(v).astype(jnp.float32)
                                 for v in jax.tree.leaves(out))
            return jax.lax.fori_loop(0, K, body, jnp.float32(0))

        jax.block_until_ready(loop(theta))
        t0 = time.perf_counter()
        jax.block_until_ready(loop(theta))
        dt = (time.perf_counter() - t0) / K
        log(f"  {name:30s} {dt * 1e3:7.1f} ms")
        return dt

    def sample_push(th, k):
        params = tdvp._unravel(th)
        z = flow.latent_sample(k, params, n, dtype=th.dtype)
        x, _ = jax.vmap(flow.push, in_axes=(None, 0))(params, z)
        return (jax.lax.stop_gradient(x),)

    def grads(th, k):
        (x,) = sample_push(th, k)
        return jax.vmap(partial(score.value_score_and_param_grad, f),
                        in_axes=(None, 0))(th, x)

    c = tdvp.cfg.chunk_size
    chunked = bool(c) and c < n

    def per_sample(th, k):
        (x,) = sample_push(th, k)
        return tdvp._per_sample_batch(th, x, 0.0)

    def per_sample_chunked(th, k):
        # the chunked program's per-sample stream: the split-emitting
        # kernel (or XLA pipeline) over all chunks, no Gram contractions
        (x,) = sample_push(th, k)
        xs = x.reshape(n // c, c, x.shape[-1])
        use_split = (tdvp._ps_split is not None
                     and c % tdvp._ps_round == 0)
        shift = jnp.zeros((tdvp.n_params,), th.dtype)

        def cf(carry, xc):
            if use_split:
                logp, eloc, pair, colsum, omax = \
                    tdvp._per_sample_batch_split(th, xc, 0.0, shift)
                s = (jnp.sum(colsum) + jnp.sum(omax) + jnp.sum(eloc)
                     + jnp.sum(logp)).astype(jnp.float32)
            else:
                logp, eloc, O = tdvp._per_sample_batch(th, xc, 0.0)
                s = (jnp.sum(O) + jnp.sum(eloc)
                     + jnp.sum(logp)).astype(jnp.float32)
            return carry + s, None

        acc, _ = jax.lax.scan(cf, jnp.float32(0), xs)
        return (acc,)

    def stats_all(th, k):
        (x,) = sample_push(th, k)
        st = (tdvp._chunked_stats(th, 0.0, x) if chunked
              else tdvp._direct_stats(th, 0.0, x))
        return (st["S0"], st["F0"])

    log(f"per-stage device times (incremental, "
        f"{'chunked' if chunked else 'direct'} stats):")
    timeit("sample+push", sample_push)
    if chunked:
        timeit("+ per-sample stream (chunks)", per_sample_chunked)
        timeit("+ Gram/force (chunked stats)", stats_all)
    else:
        timeit("+ per-sample grads (O)", grads)
        timeit("+ Hessian block + Eloc", per_sample)
        timeit("+ Gram/force (direct)", stats_all)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=32)
    ap.add_argument("--depth", type=int, default=4)
    # Default operating point (late round 3): N=524,288 / chunk=65,536
    # with the triangle-blocked Gram (tri2, auto; round-5 panels are
    # 512-aligned with merged remainder) and
    # the split-emitting per-sample Pallas kernel -- measured ~534k
    # samples/s/chip (results/bench_op2_r3d.txt; stacked gains
    # documented in BENCHMARKS.md: opsweep +19%, tri2 +10%, split kernel
    # +11%, panel re-pick +3%, chunk 65k +2%). The N sweep keeps
    # climbing slowly toward ~550k at N=1-2M (bench_op3_r3d.txt) but
    # doubles per-step latency each time; 5e5 samples at ~1 s/RHS is the
    # realistic production point. Same model, physics, and metric --
    # batch size is a free parameter of the samples/s/chip measurement.
    # default: the N=2M knee of the measured N-curve (727k/746k/760k
    # samples/s at N=524k/1M/2M, BENCHMARKS.md) -- per-RHS fixed costs
    # (sampling, solve, spectrum) amortize monotonically now that the
    # Gram passes sit at their MXU/HBM bounds. N=4M continues the
    # amortization by only +0.8% (765,561 vs 759,807 samples/s,
    # results/bench_n4m_r4.txt) at 2x the per-step latency (5.48 vs
    # 2.76 s/RHS) and 2x the memory footprint -- the wrong trade for
    # trajectory workloads with a step-count budget (BENCHMARKS.md
    # "Operating point: latency vs throughput"), so 2M is the default
    # and 4M the explicit peak-throughput point. With the round-5
    # 512-aligned-merge tri2 panels the 2M default measures 767,587
    # samples/s/chip (results/bench_panel512_r5.txt) -- above the
    # round-4 N=4M peak at half its latency.
    ap.add_argument("--samples", type=int, default=2097152)
    ap.add_argument("--chunk", type=int, default=65536,
                    help="streaming Gram chunk size (0 = direct; the "
                         "auto gram backend picks the triangle-blocked "
                         "2-pass split (tri2) on single-device TPU "
                         "either way)")
    ap.add_argument("--gram-precision", type=str, default="high",
                    choices=["highest", "high", "default", "f64", "f64acc"],
                    help="f64acc: f32 per-chunk contraction + exact f64 cross-chunk accumulation (needs --chunk > 0)")
    ap.add_argument("--gram-backend", type=str, default="auto",
                    choices=["auto", "xla", "syrk", "sym2", "tri2"],
                    help="Gram contraction backend (sym2 = 2-pass "
                         "symmetric hi/lo split, works chunked and on any "
                         "mesh; tri2 = triangle-blocked sym2, single-"
                         "device, ~1.56 passes -- 'auto' picks it at the "
                         "headline shape; syrk = triangle Pallas kernel)")
    ap.add_argument("--gram-cross", type=str, default="auto",
                    choices=["auto", "bf16", "int8"],
                    help="MXU engine for the split backends' cross pass "
                         "(int8 = per-column-quantized, 2x the bf16 rate)")
    ap.add_argument("--solver", type=str, default="auto",
                    choices=["auto", "eigh", "cholesky", "cg", "minsr"])
    ap.add_argument("--precision", type=str, default="tpu",
                    help="Precision preset (utils/dtypes.py): 'tpu' "
                         "(f32 compute/solve), 'tpu_f64stats' (pair "
                         "with --gram-precision f64 for true-f64 "
                         "statistics on the f32 compute path), 'f64' "
                         "(emulated-f64 everything)")
    ap.add_argument("--aot-dir", type=str,
                    default=os.path.join(
                        os.path.dirname(os.path.abspath(__file__)),
                        ".aot_cache"),
                    help="AOT executable cache dir (utils/aot.py): fresh "
                         "processes load the compiled bench programs in "
                         "~1 s instead of recompiling 1-12 min through "
                         "the remote TPU tunnel; '' disables")
    ap.add_argument("--quick", action="store_true",
                    help="small shapes for smoke testing")
    ap.add_argument("--stages", action="store_true",
                    help="also print the per-stage device-time table")
    ap.add_argument("--no-baseline", action="store_true")
    args = ap.parse_args()

    if args.quick:
        args.dim, args.samples = 8, 2048
        args.chunk = 0
    if args.samples < 1 or args.dim < 2 or args.dim % 2:
        ap.error("--samples must be >= 1 and --dim an even integer >= 2")

    # Device-probe watchdog: this image's TPU goes through a remote tunnel
    # that can be DOWN, in which case the first backend query blocks
    # forever. Probe it in a subprocess with a timeout and emit an honest
    # machine-readable failure line instead of hanging the bench harness.
    import subprocess

    why = None
    try:
        probe = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            capture_output=True, timeout=300, check=False)
        if probe.returncode != 0:
            tail = probe.stderr.decode(errors="replace").strip()[-300:]
            why = f"backend init failed (rc={probe.returncode}): {tail}"
    except subprocess.TimeoutExpired:
        # cannot distinguish a dead tunnel from a concurrent TPU process
        # holding the chip or an overloaded session (CLAUDE.md gotchas) --
        # all of them would hang the real bench just the same
        why = ("backend probe timed out after 300 s: remote TPU tunnel "
               "down, a concurrent TPU process holding the chip, or "
               "session overload")
    if why is not None:
        log(f"DEVICE PROBE FAILED: {why}")
        print(json.dumps({
            "metric": "d32_fokker_planck_rhs_throughput",
            "value": 0, "unit": "samples/s/chip", "vs_baseline": 0,
            "error": f"not a measurement -- {why}; see BENCHMARKS.md for "
                     "the last measured numbers",
        }))
        return

    import jax

    from vmc_pde_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    n_chips = len(jax.devices())
    log(f"devices: {jax.devices()} (n={n_chips})")

    # --- headline: north-star shape, pure device throughput -------------
    state, tdvp = build(args.dim, args.depth, args.samples,
                        precision_name=args.precision,
                        chunk=args.chunk, solver=args.solver,
                        gram_precision=args.gram_precision,
                        gram_backend=args.gram_backend,
                        gram_cross=args.gram_cross)
    backend = ("syrk" if tdvp._use_syrk
               else "tri2" if tdvp._use_tri2
               else "sym2" if tdvp._use_sym2 else "xla")
    log(f"solver={tdvp.solver_method} chunk={args.chunk} "
        f"gram={args.gram_precision} backend={backend} "
        f"cross={'int8' if tdvp._cross_int8 else 'bf16'}")
    log(f"dim={args.dim} n_params={state.numParameters} "
        f"n_samples={tdvp.n_samples}")

    aot_dir = args.aot_dir or None
    dt_fused, residual = device_time_per_rhs(state, tdvp,
                                             label=f"fused d{args.dim}",
                                             aot_dir=aot_dir)
    sps = tdvp.n_samples / dt_fused / n_chips
    log(f"fused: {dt_fused * 1e3:.2f} ms/rhs -> {sps:,.0f} samples/s/chip")
    # sym2 executes the f32-grade Gram in 2 MXU passes instead of HIGH's
    # 3; tri2 mirrors the symmetric term's block-triangle for
    # 1.5 + 0.5/K effective passes. The ceiling (and thus the honest MFU
    # denominator) scales accordingly.
    if tdvp._use_tri2:
        from vmc_pde_tpu.parallel.stats import tri2_bounds
        k_panels = len(tri2_bounds(state.numParameters)) - 1
        passes = 1.5 + 0.5 / k_panels
    else:
        passes = 2 if tdvp._use_sym2 else 3
    if tdvp._cross_int8:
        # the cross pass runs on the int8 MXU at 2x the bf16 rate: its
        # bf16-pass-equivalent cost halves in the honest ceiling
        passes -= 0.5
    mfu_report(dt_fused, tdvp.n_samples, state.numParameters, args.dim,
               gram_passes=passes)

    if args.stages:
        stage_breakdown(state, tdvp)

    # --- honest baseline: the reference's own shape + solver ------------
    vs = 1.0
    if not args.no_baseline:
        # dim-8 diffusion, N=10^4, spectral eigh solve (main.py:108-118);
        # fused-on-device vs per-stage dispatch + host f64 eigh on the
        # same chip. Matched shape AND solver, so the ratio measures the
        # architecture, not an O(P^3) host blowup.
        st8, td8 = build(8, 4, 10000, chunk=0, solver="eigh",
                         gram_precision=args.gram_precision)
        log(f"baseline shape: dim=8 n_params={st8.numParameters} "
            f"n_samples={td8.n_samples} solver=eigh (reference "
            f"main.py:108-118)")
        dt8, res8 = device_time_per_rhs(st8, td8, label="fused d8",
                                        aot_dir=aot_dir)
        dt_ref = bench_reference_style(st8, td8, 3)
        vs = dt_ref / dt8
        log(f"reference-style (matched shape+solver): "
            f"{dt_ref * 1e3:.2f} ms/rhs; fused {dt8 * 1e3:.2f} ms/rhs; "
            f"speedup {vs:.1f}x")

    print(json.dumps({
        "metric": f"tdvp_rhs_samples_per_sec_d{args.dim}_fokker_planck",
        "value": round(sps, 1),
        "unit": "samples/s/chip",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()

"""TPU A/B: the hand-written second-order jet Hessian quad
(persample._tile_quad_jet, one shared primal + lane-folded tangent pairs)
vs the jvp-of-jvp reference (_tile_quad) INSIDE the fused per-sample
Pallas kernel, at the flagship d=32 Fokker-Planck shape (P=9264, k=16
momentum directions).

Times the raw kernel (split-emitting variant, the headline configuration)
with quad_impl='jvp' vs 'jet'; fresh x per rep (fold_in key) because the
remote-execution tunnel memoizes identical (program, input) pairs
(CLAUDE.md gotchas; same methodology as scripts/bench_persample.py).

Run (repo root): timeout 1800 python scripts/bench_quadjet.py
    [--samples 16384] [--tile 256] [--no-split]

FINDINGS (2026-08-20, single v5e chip through the axon tunnel;
results/bench_quadjet_r4.txt): at N=16,384/tile 256 the jet quad takes
the split-emitting stage 8.32 -> 7.07 ms (1.18x, same session). The
no-quad probe ran in a separate session (none 5.04 / jet 5.99 ms;
sessions drift ~18%, so cross-session subtraction is invalid) --
scaling by the sessions' jet ratio puts the quad at ~1.1 ms (jet) vs
~2.4 ms (jvp^2), a ~2.1x cut of the quad itself; the stage remainder is
the hand fwd/bwd + O-pair write. tile=512 stays slower (6.79 ms) -- the
stage is compute-bound, wider tiles buy nothing (matches the round-4
tile probe on the jvp^2 kernel). Carry checksums match jvp bit-for-bit
at printed precision.
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=32)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--samples", type=int, default=16384)
    ap.add_argument("--tile", type=int, default=256)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--no-split", action="store_true",
                    help="time the plain (f32 O) kernel instead of the "
                         "split-emitting headline variant")
    ap.add_argument("--impls", type=str, default="jvp,jet",
                    help="comma list of quad impls; 'none' = no quad "
                         "(isolates the quad share)")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vmc_pde_tpu.kernels import persample
    from vmc_pde_tpu.models.flow import build_flow
    from vmc_pde_tpu.ops import score

    log(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    dim, depth, n, tile = args.dim, args.depth, args.samples, args.tile
    flow, params = build_flow(1, dim=dim, depth=depth, variant="affine",
                              latent_name="Gauss", dtype=jnp.float32)
    theta, unravel = score.flat_param_view(params)
    theta = jnp.asarray(theta, jnp.float32)
    # FokkerPlanck trace directions: the momentum-block unit vectors
    dirs = np.eye(dim, dtype=np.float32)[dim // 2:]
    log(f"dim={dim} depth={depth} P={theta.size} N={n} tile={tile} "
        f"k_dirs={dirs.shape[0]} split={not args.no_split}")
    key = jax.random.PRNGKey(0)
    emit_split = not args.no_split
    shift = jnp.zeros((theta.size,), jnp.float32) if emit_split else None

    results = {}
    for impl in args.impls.split(","):
        run = persample.make_per_sample_pallas(
            flow, unravel, int(theta.size),
            None if impl == "none" else dirs, tile=tile,
            template=params, emit_split=emit_split,
            quad_impl="jet" if impl == "none" else impl)

        def body(i, acc, run=run):
            x = jax.random.normal(jax.random.fold_in(key, i), (n, dim),
                                  dtype=jnp.float32)
            if emit_split:
                logp, g, quad, (ohi, olo), osum, oam = run(theta, x, shift)
                s = (jnp.sum(logp) + jnp.sum(g)
                     + (0.0 if quad is None else jnp.sum(quad))
                     + jnp.sum(osum) + jnp.sum(oam)
                     + jnp.sum(ohi.astype(jnp.float32))
                     + jnp.sum(olo.astype(jnp.float32)))
            else:
                logp, g, quad, O = run(theta, x)
                s = (jnp.sum(logp) + jnp.sum(g)
                     + (0.0 if quad is None else jnp.sum(quad))
                     + jnp.sum(O))
            return acc + s.astype(jnp.float32)

        @jax.jit
        def loop(body=body):
            return jax.lax.fori_loop(0, args.reps, body, jnp.float32(0))

        t0 = time.perf_counter()
        out = jax.block_until_ready(loop())
        log(f"{impl}: compile+first ({args.reps} reps): "
            f"{time.perf_counter() - t0:.1f}s  (carry {float(out):.6g})")
        t0 = time.perf_counter()
        jax.block_until_ready(loop())
        dt = (time.perf_counter() - t0) / args.reps
        log(f"{impl}: {dt * 1e3:.2f} ms/stage "
            f"({n / dt / 1e3:.0f}k samples/s)")
        results[impl] = dt

    if len(results) == 2:
        a, b = args.impls.split(",")
        log(f"speedup {a} -> {b}: {results[a] / results[b]:.3f}x")


if __name__ == "__main__":
    main()

"""Micro-benchmark for the triangle-only (syrk) Pallas Gram kernel at the
d=32 north-star shape: sweeps (tile, chunk) against the XLA HIGH matmul
baseline.

FINDINGS (2026-08-17, two sweeps; round-3 re-run incl. (1024, 512) and
(256, 2048)): the sweep is CLOSED with a documented blocker.
- (tile=512, chunk=1024) -- the shipped default -- remains the best
  compiling point. Every larger-block configuration ((512, 2048),
  (512, 4096), (1024, 2048), (1024, 512)) fails in the remote Mosaic
  compile (tpu_compile_helper exit 1; the tunnel hides the diagnostic --
  the block sizes are well inside VMEM budget, so this is a
  toolchain-level blocker on this image, not a resource bound we can
  tune around). (256, 2048) compiles but is slower (45.7 ms vs 38).
  The correctness check passes everywhere it compiles (maxrel ~5e-6 vs
  a HIGHEST reference).
- At the round-3 N=65,536 headline operating point the CHUNKED XLA Gram
  wins outright (BENCHMARKS.md), so the kernel's production role is the
  N <= 16k direct path, where its 38 ms vs XLA's 50 ms (73% of the
  triangle ceiling) stands.
- Wall timings from THIS harness are invalid on this machine: the remote
  TPU tunnel memoizes repeat executions of an identical (program, input)
  pair, returning in ~0 ms. The authoritative kernel timing is the
  in-RHS measurement (BENCHMARKS.md: 38 ms syrk vs ~50 ms XLA HIGH inside
  the fused TDVP step, where inputs change every call).

Usage: python scripts/bench_syrk.py [--n 16384] [--p 9264] [--reps 8]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

from vmc_pde_tpu.kernels.syrk import syrk


def device_time(fn, *args, reps=8):
    @jax.jit
    def loop(x):
        def body(i, acc):
            # fold a MAX of the result into the carry: max cannot be
            # algebraically pushed through the contraction the way a
            # slice or sum can, so the full product must be formed
            s = fn(x + acc * 1e-30)
            return acc + jnp.max(s)

        return jax.lax.fori_loop(0, reps, body, jnp.zeros((), jnp.float32))

    loop(*args).block_until_ready()  # compile + warm
    t0 = time.perf_counter()
    loop(*args).block_until_ready()
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16384)
    ap.add_argument("--p", type=int, default=9264)
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()

    key = jax.random.PRNGKey(0)
    O = jax.random.normal(key, (args.n, args.p), dtype=jnp.float32)
    O = O * jnp.exp(jnp.linspace(-3, 3, args.p))[None, :]  # scale spread

    ref = jnp.matmul(O.T, O, precision=jax.lax.Precision.HIGHEST)

    t_xla = device_time(
        lambda x: jnp.matmul(x.T, x, precision=jax.lax.Precision.HIGH),
        O, reps=args.reps)
    print(f"xla HIGH full matmul: {t_xla*1e3:8.2f} ms")

    # each variant costs a fresh (slow) Mosaic compile through this image's
    # remote tunnel -- keep the sweep tight around the current default
    for tile, chunk in ((512, 1024), (512, 2048), (512, 4096), (1024, 2048),
                        (1024, 512), (256, 2048)):
        try:
            t = device_time(
                lambda x, tl=tile, ck=chunk: syrk(x, tile=tl, chunk=ck),
                O, reps=args.reps)
            S = syrk(O, tile=tile, chunk=chunk)
            err = float(jnp.max(jnp.abs(S - ref))
                        / jnp.max(jnp.abs(ref)))
            print(f"syrk tile={tile:5d} chunk={chunk:5d}: "
                  f"{t*1e3:8.2f} ms  maxrel {err:.2e}")
        except Exception as e:  # noqa: BLE001 - report and continue sweep
            print(f"syrk tile={tile:5d} chunk={chunk:5d}: FAILED "
                  f"{type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()

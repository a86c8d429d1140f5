"""Micro-benchmark: int8 MXU matmul vs bf16 at the tri2 cross-term shape.

Motivation (round-3 trace, scripts/profile_rhs_parse.py): the headline
RHS spends ~half its Gram time in the bf16 cross term hs^T @ lo (one
full MXU pass at ~91% of the bf16 ceiling). The cross term is a ~2^-8
relative correction to the hi@hi triangle, so it only needs ~2^-16
relative accuracy itself -- the same class as the lo@lo term the 2-pass
split already drops. TPU MXUs run int8 x int8 -> int32 at 2x the bf16
rate, and per-column scales factor EXACTLY out of an outer-product Gram:

    hs[:, p] = s_p h8[:, p],  lo[:, q] = t_q l8[:, q]
    => m2 = diag(s) (h8^T l8) diag(t)

This script measures (a) the raw int8 matmul, (b) the end-to-end
quantize + int8 matmul + rescale path, against the bf16 pass, at the
per-chunk shape (N=65536, P=9264).

Timing caveat (same as bench_syrk.py): the remote tunnel memoizes
identical (program, input) pairs, so every rep perturbs the input via
the loop carry. All operands are passed as explicit jit ARGUMENTS --
a closed-over (N, P) array becomes an HLO constant, which bloats the
program shipped through the remote-compile tunnel by gigabytes.

Usage: python scripts/bench_int8.py [--n 65536] [--p 9264] [--reps 8]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp


def bench(fn, args, reps):
    """Median-of-3 of a reps-iteration fori_loop; fn(x, *rest) -> matrix.

    The remote tunnel memoizes repeat executions of an identical
    (program, input) pair, so every CALL gets a distinct scalar k folded
    into the operand, and every rep within a call perturbs via the carry."""
    @jax.jit
    def loop(k, x, *rest):
        x = x + k * 1e-30

        def body(i, acc):
            s = fn(x + acc * 1e-30, *rest)
            return acc + jnp.max(s).astype(jnp.float32)

        return jax.lax.fori_loop(0, reps, body, jnp.zeros((), jnp.float32))

    loop(jnp.float32(0), *args).block_until_ready()
    ts = []
    for k in range(1, 4):
        t0 = time.perf_counter()
        loop(jnp.float32(k), *args).block_until_ready()
        ts.append((time.perf_counter() - t0) / reps)
    return sorted(ts)[1]


def quantize_cols(x, axis=0):
    """Per-column symmetric int8 quantization: x ~= scale * q."""
    amax = jnp.max(jnp.abs(x), axis=axis, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=65536)
    ap.add_argument("--p", type=int, default=9264)
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()
    N, P = args.n, args.p
    flops = 2.0 * N * P * P

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (N, P), dtype=jnp.float32)
    x = x * jnp.exp(jnp.linspace(-3, 3, P))[None, :]
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    jax.block_until_ready((hi, lo))

    print(f"shape: N={N} P={P}  ({flops/1e12:.2f} TFLOP per pass)",
          flush=True)

    # (a) bf16 full pass (the current cross term); hi passed as f32 so the
    # perturbed carry re-rounds, lo as an explicit bf16 argument
    t_bf16 = bench(
        lambda h, b: jnp.matmul(h.astype(jnp.bfloat16).T, b,
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.DEFAULT),
        (hi.astype(jnp.float32), lo), args.reps)
    print(f"bf16 pass:            {t_bf16*1e3:8.2f} ms  "
          f"{flops/t_bf16/1e12:6.1f} TFLOP/s", flush=True)

    # (b) raw int8 matmul (inputs pre-quantized; perturb via int carry)
    h8, _ = quantize_cols(hi.astype(jnp.float32))
    l8, _ = quantize_cols(lo.astype(jnp.float32))
    jax.block_until_ready((h8, l8))

    @jax.jit
    def loop_i8(k, a8, b8):
        def body(i, acc):
            a = (a8 + ((acc + k) % 2).astype(jnp.int8)).astype(jnp.int8)
            s = jax.lax.dot_general(
                a, b8, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            return acc + jnp.max(s)

        return jax.lax.fori_loop(0, args.reps, body,
                                 jnp.zeros((), jnp.int32))

    loop_i8(jnp.int32(0), h8, l8).block_until_ready()
    ts = []
    for k in range(1, 4):
        t0 = time.perf_counter()
        loop_i8(jnp.int32(k), h8, l8).block_until_ready()
        ts.append((time.perf_counter() - t0) / args.reps)
    t_i8 = sorted(ts)[1]
    print(f"int8 matmul:          {t_i8*1e3:8.2f} ms  "
          f"{flops/t_i8/1e12:6.1f} TOP/s", flush=True)

    # (c) end-to-end: quantize both operands + int8 matmul + rescale
    def cross_i8(h, b):
        h8, s = quantize_cols(h)
        l8, t = quantize_cols(b.astype(jnp.float32))
        m = jax.lax.dot_general(h8, l8, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return m.astype(jnp.float32) * s.T * t

    t_e2e = bench(cross_i8, (hi.astype(jnp.float32), lo), args.reps)
    print(f"int8 quant+mm+scale:  {t_e2e*1e3:8.2f} ms  "
          f"{flops/t_e2e/1e12:6.1f} TOP/s-equiv", flush=True)

    # accuracy: int8 cross vs exact f32 cross, relative to the FULL Gram
    # magnitude (hi@hi dominates) -- compare against the dropped lo@lo term
    @jax.jit
    def errs(h, b, xf):
        ref_cross = jnp.matmul(h.T, b.astype(jnp.float32),
                               precision=jax.lax.Precision.HIGHEST)
        got = cross_i8(h, b)
        gram_diag = jnp.sqrt(jnp.sum(xf * xf, axis=0))
        denom = gram_diag[:, None] * gram_diag[None, :]
        err = jnp.max(jnp.abs(got - ref_cross) / denom)
        lof = b.astype(jnp.float32)
        lolo = jnp.matmul(lof.T, lof, precision=jax.lax.Precision.HIGHEST)
        drop = jnp.max(jnp.abs(lolo) / denom)
        return err, drop

    err, drop = errs(hi.astype(jnp.float32), lo, x)
    print(f"int8 cross err (rel to Gram scale): {float(err):.3e}  "
          f"(dropped lo@lo term: {float(drop):.3e})", flush=True)


if __name__ == "__main__":
    main()

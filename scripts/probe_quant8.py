"""Probe: can a Pallas kernel beat XLA's int8 quantize fusions?

The headline RHS device trace (BENCHMARKS.md int8 section) shows the two
XLA round/clip/convert-to-s8 fusions running at ~85 GB/s (20.6 + 21.4
ms/RHS) and the force pair_vecmat at ~94 GB/s (12.8 ms/RHS) -- all three
are bandwidth-shaped passes over the same bf16 (P, N) operands. This
probe builds a Pallas kernel that, per operand, fuses

    q8 = clip(round(x * inv[:, None]), -127, 127).astype(int8)
    f  = x @ V            (V: (tile, kv) slices of the force weights)

into one read of x, and measures it against the XLA quantize fusion at
the headline shape (P=9264, n=65536). Mosaic s8 stores are the risk on
this image (the syrk big-tile Mosaic failures); correctness is checked
first at a small shape.

Run: python scripts/probe_quant8.py [--quick]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vmc_pde_tpu.parallel import stats


def log(*a):
    print(*a, flush=True)


def make_quant_force(P, n, tile, kv, interpret=False):
    """fn(x (P, n) bf16, inv (P, 1) f32, V (n, kv) f32) ->
    (q8 (P, n) s8, f (P, kv) f32 grid-accumulated x @ V)."""
    _z = np.int32(0)

    def kernel(x_ref, inv_ref, v_ref, q_ref, f_ref):
        x = x_ref[:]
        inv = inv_ref[:]
        q = jnp.clip(jnp.round(x.astype(jnp.float32) * inv), -127, 127)
        q_ref[:] = q.astype(jnp.int8)
        fpart = jax.lax.dot_general(
            x, v_ref[:].astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        @pl.when(pl.program_id(0) == 0)
        def _init():
            f_ref[:] = fpart

        @pl.when(pl.program_id(0) != 0)
        def _acc():
            f_ref[:] += fpart

    return pl.pallas_call(
        kernel,
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((P, tile), lambda i: (_z, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, 1), lambda i: (_z, _z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, kv), lambda i: (i, _z),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((P, tile), lambda i: (_z, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, kv), lambda i: (_z, _z),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((P, n), jnp.int8),
            jax.ShapeDtypeStruct((P, kv), jnp.float32),
        ],
        interpret=interpret,
    )


def xla_quant(x, inv):
    return jnp.clip(jnp.round(x.astype(jnp.float32) * inv[:, None]),
                    -127, 127).astype(jnp.int8)


def run_case(P, n, tile, kv, reps, label):
    key = jax.random.PRNGKey(0)
    kx, kv_, ki = jax.random.split(key, 3)
    fn = jax.jit(make_quant_force(P, n, tile, kv))
    xla_q = jax.jit(xla_quant)
    xla_f = jax.jit(lambda x, V: jax.lax.dot_general(
        x, V.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32))

    xs = []
    for r in range(reps):
        x = (jax.random.normal(jax.random.fold_in(kx, r), (P, n),
                               jnp.float32) * 3.0).astype(jnp.bfloat16)
        xs.append(x)
    amax = jnp.max(jnp.abs(xs[0]).astype(jnp.float32), axis=1,
                   keepdims=True)
    inv = jnp.where(amax > 0, 127.0 / amax, 0.0)
    V = jax.random.normal(kv_, (n, kv), jnp.float32)

    # correctness
    q, f = jax.block_until_ready(fn(xs[0], inv, V))
    qx = jax.block_until_ready(xla_q(xs[0], inv[:, 0]))
    fx = jax.block_until_ready(xla_f(xs[0], V))
    nbad = int(jnp.sum(q != qx))
    ferr = float(jnp.max(jnp.abs(f - fx)) / (jnp.max(jnp.abs(fx)) + 1e-30))
    log(f"{label}: q8 mismatches {nbad}/{q.size}, force relerr {ferr:.2e}")

    # timing (vary inputs per rep -- the tunnel memoizes repeats)
    for name, g in [("pallas", lambda x: fn(x, inv, V)),
                    ("xla-quant", lambda x: xla_q(x, inv[:, 0])),
                    ("xla-quant+force",
                     lambda x: (xla_q(x, inv[:, 0]), xla_f(x, V)))]:
        jax.block_until_ready(g(xs[0]))
        t0 = time.perf_counter()
        for r in range(reps):
            out = g(xs[r])
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps * 1e3
        gb = (P * n * (2 + 1) + (P * n * 2 if "force" in name else 0)
              ) / 1e9
        log(f"{label} {name}: {dt:7.2f} ms  "
            f"({P * n * 3 / dt / 1e6:.0f} GB/s q8-only-bytes)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    log(f"devices: {jax.devices()}")

    # small correctness first (cheap Mosaic compile; fails fast if s8
    # stores are unsupported)
    run_case(1024, 2048, 256, 2, 3, "small")
    if not args.quick:
        run_case(9264, 65536, 128, 3, 3, "headline")


if __name__ == "__main__":
    main()

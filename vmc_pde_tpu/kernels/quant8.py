"""Fused int8-quantize + force-partial Pallas kernel.

On the int8-cross headline path the RHS makes three bandwidth-bound
passes over the chunk's bf16 (P, n) operand pair per chunk, each already
near HBM peak in isolation (device trace, BENCHMARKS.md int8 section):

    quantize hi -> s8      (reads hi,  2.58 ms/chunk)
    quantize lo -> s8      (reads lo,  2.67 ms/chunk)
    pair_vecmat force      (reads hi AND lo, 1.60 ms/chunk)

The irreducible bytes are one read of each operand + one s8 write of
each: this kernel fuses the force partials into the quantize pass so
each operand is read exactly once --

    q8 = clip(round(x * inv[:, None]), -127, 127).astype(int8)
    f  = grid-accumulated x @ V        (V: (n, kv) bf16 force weights)

where for the hi operand V = [es_hi, es_lo] (kv=2) and for lo
V = [es_hi] (kv=1), reproducing stats.pair_vecmat's three HIGH-
equivalent terms v_hi@hi + v_lo@hi + v_hi@lo exactly (bf16 x bf16
multiplies, f32 accumulation). The q8 tiles are written n-minor
(P, n) row-major -- the same physical layout XLA assigns both operands
of the int8 cross dot_general, so no relayout copy is inserted.

Quantization math is identical to stats._quant_cols_int8 (same
reciprocal-scale round/clip), so the emitted q8 is bit-identical to
the XLA path's.

VMEM: full-P blocks, lane tile 128 -> (P, 128) bf16 in + (P, 128) s8
out, double-buffered: ~0.75 KB/row -> P <= ~16k fits the 16 MB VMEM
with headroom. `supported(P)` gates engagement; the consumer falls
back to the separate XLA passes above it.

No reference counterpart (the reference has no quantized path at all);
this exists purely to hold the TPU HBM roofline on the Gram's cross
term, see parallel/stats._cross_sum.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 128
# full-P blocks: in bf16 + out s8, double buffered, ~0.75 KB per row at
# tile 128; 16384 rows ~ 12.3 MB of the 16 MB VMEM.
_P_MAX = 16384


def supported(P: int, n: int) -> bool:
    return P <= _P_MAX and n % _TILE == 0


@functools.lru_cache(maxsize=None)
def _build(P: int, n: int, kv: int, interpret: bool):
    _z = np.int32(0)

    def kernel(x_ref, inv_ref, v_ref, q_ref, f_ref):
        x = x_ref[:]
        q = jnp.clip(jnp.round(x.astype(jnp.float32) * inv_ref[:]),
                     -127, 127)
        q_ref[:] = q.astype(jnp.int8)
        fpart = jax.lax.dot_general(
            x, v_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        @pl.when(pl.program_id(0) == 0)
        def _init():
            f_ref[:] = fpart

        @pl.when(pl.program_id(0) != 0)
        def _acc():
            f_ref[:] += fpart

    return pl.pallas_call(
        kernel,
        grid=(n // _TILE,),
        in_specs=[
            pl.BlockSpec((P, _TILE), lambda i: (_z, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, 1), lambda i: (_z, _z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, kv), lambda i: (i, _z),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((P, _TILE), lambda i: (_z, i),
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


def quant_force(x_pn, inv, V, interpret=False):
    """x_pn: (P, n) bf16 operand (physical kernel orientation); inv:
    (P,) f32 reciprocal scales (127/amax, 0 for empty columns); V:
    (n, kv) bf16 force weights. Returns (q8 (P, n) s8, f (P, kv) f32
    = x @ V accumulated in f32)."""
    P, n = x_pn.shape
    kv = V.shape[1]
    if not supported(P, n):
        raise ValueError(f"quant_force unsupported shape P={P} n={n}")
    fn = _build(P, n, kv, interpret)
    return fn(x_pn.astype(jnp.bfloat16), inv[:, None].astype(jnp.float32),
              V.astype(jnp.bfloat16))

"""Capture a device trace of the fused headline RHS (jax.profiler
works through the TPU tunnel) and write it under /tmp/rhs_trace.
Parse with scripts/profile_rhs_parse.py. Drove the strip-carry +
in-kernel-colsum cleanup (BENCHMARKS.md profile-guided section).

Run: python scripts/profile_rhs.py
"""

import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from bench import build, log
import jax, jax.numpy as jnp

from vmc_pde_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
log(f"devices: {jax.devices()}")
N = int(sys.argv[1]) if len(sys.argv) > 1 else 524288
CHUNK = int(sys.argv[2]) if len(sys.argv) > 2 else 65536
state, tdvp = build(32, 4, N, chunk=CHUNK, gram_backend="tri2")
theta = jnp.asarray(state.get_parameters(), tdvp.precision.compute)
key = jax.random.PRNGKey(0)
n = tdvp.n_samples

@jax.jit
def loop(th):
    def body(i, carry):
        th, acc = carry
        aux = tdvp._rhs_impl(th, 0.0, jax.random.fold_in(key, i),
                             None, None, None, None, n, n)
        s = sum(jnp.sum(v).astype(jnp.float32) for v in jax.tree.leaves(aux))
        return th + 0.0 * aux["update"].astype(th.dtype), acc + s
    return jax.lax.fori_loop(0, 3, body, (th, jnp.float32(0)))

jax.block_until_ready(loop(theta))  # compile
try:
    with jax.profiler.trace("/tmp/rhs_trace"):
        jax.block_until_ready(loop(theta))
    print("trace written")
except Exception as e:
    print("profiler failed:", repr(e))

"""Compile+run probe: the split-emitting per-sample kernel at an
UNALIGNED parameter count (P=62, P%16=14) on real TPU -- validates
that the (P, tile) bf16 output blocks carry no P-alignment
constraint (P is a full, non-tiled block dim), so TDVP engages the
split path for any P (solver/tdvp.py _ps_split).

Run: python scripts/probe_oddp_split.py
"""

import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax, jax.numpy as jnp, numpy as np
from vmc_pde_tpu.models.flow import build_flow
from vmc_pde_tpu.ops import score
from vmc_pde_tpu.kernels import persample

print("devices:", jax.devices())
fl, params = build_flow(1, dim=4, depth=2, dtype=jnp.float32)
theta, unravel = score.flat_param_view(params)
P = int(theta.size)
print("P =", P, "P%16 =", P % 16)
dirs = np.eye(4, dtype=np.float32)
run = persample.make_per_sample_pallas(fl, unravel, P, dirs, tile=256,
                                       interpret=False, template=params,
                                       emit_split=True)
x = jax.random.normal(jax.random.PRNGKey(0), (512, 4), jnp.float32)
shift = jnp.zeros((P,), jnp.float32)
lp, g, q, (hi, lo) = jax.jit(run)(theta, x, shift)
jax.block_until_ready(hi)
# compare against the plain kernel
run_p = persample.make_per_sample_pallas(fl, unravel, P, dirs, tile=256,
                                         interpret=False, template=params)
lp2, g2, q2, O = jax.jit(run_p)(theta, x)
err = float(jnp.max(jnp.abs(hi.astype(jnp.float32) + lo.astype(jnp.float32) - O)))
scale = float(jnp.max(jnp.abs(O)))
print(f"odd-P split kernel OK on TPU: max|hi+lo-O| = {err:.3e} (scale {scale:.3e})")

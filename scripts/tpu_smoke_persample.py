"""TPU Mosaic compile + accuracy smoke for the late-round-3 per-sample
kernel extensions: Student-t latent (log1p tail + digamma nu-row),
hi/lo-split fwd/bwd selection matmuls, and the fused affine (s, t)
conditioner pairs. Runs the REAL Pallas kernel (no interpret mode) on
small batches and pins every output against the XLA per-sample pipeline
at f32-split tolerances.

Run (repo root, TPU): timeout 900 python scripts/tpu_smoke_persample.py
FINDINGS: see results/tpu_smoke_persample_r3.txt
"""

import sys
from functools import partial

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def log(*a):
    print(*a, flush=True)


def check(name, a, b, tol):
    a, b = np.asarray(a), np.asarray(b)
    scale = np.maximum(np.abs(b), 1.0)
    err = float(np.max(np.abs(a - b) / scale))
    status = "OK " if err <= tol else "FAIL"
    log(f"  {status} {name:8s} max scaled err {err:.3e} (tol {tol:.0e})")
    return err <= tol


def run_case(variant, latent_name, dim, depth, n, tile, want_quad):
    from vmc_pde_tpu.kernels import persample
    from vmc_pde_tpu.models.flow import build_flow
    from vmc_pde_tpu.ops import score

    log(f"case: variant={variant} latent={latent_name} dim={dim} "
        f"depth={depth} n={n} tile={tile} quad={want_quad}")
    flow, params = build_flow(3, dim, depth=depth, variant=variant,
                              latent_name=latent_name, dtype=jnp.float32)
    # Perturb GENTLY (0.05 at dim=32/alpha=10 compounds to |logp| ~ 1e7 --
    # the f64 CPU tests pin the math; this smoke checks Mosaic lowering
    # and f32-split numerics at realistic near-evolution conditioning).
    params = jax.tree_util.tree_map(
        lambda a: a + 0.005 * np.cos(np.arange(a.size, dtype=np.float64))
        .reshape(a.shape).astype(a.dtype), params)
    x = jax.random.normal(jax.random.PRNGKey(5), (n, dim), jnp.float32)
    theta, unravel = score.flat_param_view(params)
    dirs = np.eye(dim, dtype=np.float32)[: max(1, dim // 2)] \
        if want_quad else None

    run = persample.make_per_sample_pallas(
        flow, unravel, int(theta.size), dirs, tile=tile,
        interpret=False, template=params)
    lp_k, g_k, q_k, O_k = jax.block_until_ready(
        jax.jit(run)(theta, x))
    log("  Mosaic compile + execute: OK")

    f = score.make_flat_log_prob(flow, unravel)
    lp_r, g_r, O_r = jax.vmap(
        partial(score.value_score_and_param_grad, f), in_axes=(None, 0)
    )(theta, x)
    ok = check("logp", lp_k, lp_r, 5e-5)
    ok &= check("g", g_k, g_r, 5e-4)
    ok &= check("O", O_k, O_r, 5e-4)
    if want_quad:
        q_r = jax.vmap(
            partial(score.quad_trace, f, dirs=jnp.asarray(dirs)),
            in_axes=(None, 0))(theta, x)
        ok &= check("quad", q_k, q_r, 5e-3)
    return ok


def main():
    assert jax.default_backend() == "tpu", "this smoke needs the TPU"
    ok = True
    # flagship-class: affine fused pairs + split selections + quad
    ok &= run_case("affine", "Gauss", 32, 4, 2048, 256, True)
    # Student-t tail (scale variant, like the dim-8 preset)
    ok &= run_case("scale", "Student_t", 8, 4, 2048, 256, True)
    # no-quad path
    ok &= run_case("scale", "Gauss", 32, 4, 2048, 256, False)
    log("ALL OK" if ok else "FAILURES above")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()

"""TPU smoke for the on-device adaptive multi-step path (TDVP.adaptive_multi).

Runs a dim-4 diffusion workload (no 2-D grid, so the batched branch engages)
with adaptive_heun and adaptive_rk23 at steps_per_dispatch=4 on the TPU f32
path, then checks the batched trajectory against the per-step fused-attempt
path. Correctness is CPU-CI-covered (tests/test_multistep.py); this validates
the Mosaic/XLA compile of the lax.while_loop-inside-masked-lax.scan program
on real hardware and measures the dispatch amortization.

Usage: python scripts/amulti_tpu_smoke.py [--aot-dir DIR]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--aot-dir", default=None)
    ap.add_argument("--samples", type=int, default=4096)
    ap.add_argument("--t-end", type=float, default=0.05)
    args = ap.parse_args()

    from vmc_pde_tpu.config import RunConfig
    from vmc_pde_tpu.driver import run

    def cfg(stepper, k):
        return RunConfig(
            name="amulti_tpu", dim=4, offset=(0.0,) * 4,
            latent_name="Gauss", equation="diffusion", variant="scale",
            dt0=1e-3, max_step=5e-3, tol=1e-6, t_end=args.t_end,
            stepper=stepper, steps_per_dispatch=k,
            n_samples_tdvp=args.samples, n_samples_obs=args.samples,
            seed=3, sample_seed=3, precision="tpu", workdir=None,
            verbose=False, aot_dir=args.aot_dir,
        )

    for stepper in ("adaptive_heun", "adaptive_rk23"):
        t0 = time.perf_counter()
        s1, r1 = run(cfg(stepper, 1))
        t1 = time.perf_counter() - t0
        a1 = r1.as_arrays()
        t0 = time.perf_counter()
        s4, r4 = run(cfg(stepper, 4))
        t4 = time.perf_counter() - t0
        a4 = r4.as_arrays()
        n1, n4 = a1["times"].shape[0], a4["times"].shape[0]
        print(f"[{stepper}] per-step: {n1} steps {t1:.1f}s | "
              f"K=4: {n4} steps {t4:.1f}s")
        assert n1 == n4, (n1, n4)
        np.testing.assert_allclose(a1["times"], a4["times"], rtol=1e-9)
        # f32 stats + separate compile contexts: statistical agreement only
        np.testing.assert_allclose(a1["entropy"], a4["entropy"],
                                   rtol=1e-3, atol=1e-5)
        th1 = np.asarray(s1.get_parameters())
        th4 = np.asarray(s4.get_parameters())
        np.testing.assert_allclose(th1, th4, rtol=5e-2, atol=1e-4)
        assert not np.isnan(np.asarray(a4["entropy"])).any()
        print(f"[{stepper}] OK: batched == per-step "
              f"(max |dtheta| {np.abs(th1 - th4).max():.2e})")


if __name__ == "__main__":
    main()

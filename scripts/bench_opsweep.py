"""Operating-point sweep of the headline bench: (n_samples, chunk_size)
at the d=32 north-star shape, pure device time per fused RHS.

Round-3 context: bench.py's default moved to N=131,072 / chunk=8192
(344,479 samples/s/chip measured, results/bench_full_r3b.txt). This sweep
re-examines the knee with the current stack (per-sample Pallas kernel +
sym2 Gram): larger chunks amortize the per-chunk (P,P) accumulator
traffic and scan overhead; larger N amortizes the fixed solve.

Run (real TPU): python scripts/bench_opsweep.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import build, device_time_per_rhs, log  # noqa: E402


def main():
    import jax

    from vmc_pde_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    log(f"devices: {jax.devices()}")
    configs = [
        (131072, 8192),    # current bench.py default
        (131072, 16384),
        (262144, 16384),
        (262144, 32768),
        (524288, 32768),
    ]
    results = []
    for n, chunk in configs:
        t0 = time.perf_counter()
        state, tdvp = build(32, 4, n, chunk=chunk)
        dt, res = device_time_per_rhs(state, tdvp, K=6,
                                      label=f"N={n} c={chunk}")
        sps = n / dt
        log(f"N={n} chunk={chunk}: {dt * 1e3:.1f} ms/rhs -> {sps:,.0f} "
            f"samples/s/chip (residual {res:.2e}, total "
            f"{time.perf_counter() - t0:.0f}s)")
        results.append((n, chunk, dt, sps, res))

    log("\nsummary:")
    for n, chunk, dt, sps, res in results:
        log(f"  N={n:7d} chunk={chunk:6d}  {dt * 1e3:7.1f} ms/rhs  "
            f"{sps:10,.0f} samples/s/chip  res={res:.2e}")


if __name__ == "__main__":
    main()

"""A/B the triangle-blocked Gram (tri2) against sym2 on the real TPU at
the headline shape, at the post-sweep operating points
(results/bench_opsweep_r3c.txt).

Run: python scripts/bench_tri2.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import build, device_time_per_rhs, log  # noqa: E402


def main():
    import jax

    from vmc_pde_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    log(f"devices: {jax.devices()}")
    configs = [
        (131072, 16384, "sym2"),
        (131072, 16384, "tri2"),
        (262144, 32768, "sym2"),
        (262144, 32768, "tri2"),
        (524288, 32768, "tri2"),
    ]
    results = []
    for n, chunk, backend in configs:
        state, tdvp = build(32, 4, n, chunk=chunk, gram_backend=backend)
        assert (tdvp._use_tri2 if backend == "tri2" else tdvp._use_sym2)
        dt, res = device_time_per_rhs(state, tdvp, K=6,
                                      label=f"{backend} N={n} c={chunk}")
        results.append((backend, n, chunk, dt, n / dt, res))

    log("\nsummary:")
    for backend, n, chunk, dt, sps, res in results:
        log(f"  {backend}  N={n:7d} chunk={chunk:6d}  {dt * 1e3:7.1f} "
            f"ms/rhs  {sps:10,.0f} samples/s/chip  res={res:.2e}")


if __name__ == "__main__":
    main()

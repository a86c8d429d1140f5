"""tri2 panel-width (target_block) sweep WITH the split-emitting
per-sample kernel, at the headline shape (N=524,288, chunk=32,768,
P=9264). Produced results/bench_splitk_r3d.txt (tb 600/772) and
bench_splitk2_r3d.txt (tb 480/386/290): knee at tb=480 (K=19),
521,326 samples/s/chip -- now the tri2_bounds default.

Run: python scripts/bench_split_k.py
"""

import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from bench import build, device_time_per_rhs, log

def main():
    import jax
    from vmc_pde_tpu.parallel import stats
    from vmc_pde_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    log(f"devices: {jax.devices()}")
    N, chunk = 524288, 32768
    orig = stats.tri2_bounds
    results = []
    for tb in (600, 772, 480, 386, 290):  # r3d runs: 600/772 then 480/386/290
        stats.tri2_bounds = lambda p, target_block=tb: orig(p, target_block)
        K = len(orig(9264, tb)) - 1
        state, tdvp = build(32, 4, N, chunk=chunk, gram_backend="tri2")
        assert tdvp._ps_split is not None
        dt, res = device_time_per_rhs(state, tdvp, K=6,
                                      label=f"split tb={tb} K={K}")
        results.append((tb, K, dt, N / dt, res))
    stats.tri2_bounds = orig
    log("\nsummary:")
    for tb, K, dt, sps, res in results:
        log(f"  split tb={tb} K={K}  {dt*1e3:7.1f} ms/rhs  "
            f"{sps:10,.0f} samples/s/chip  res={res:.2e}")

main()

"""Operating-point probes with the split-emitting kernel at the
headline d=32 shape: chunk 65k/131k and N up to 2M
(results/bench_op2_r3d.txt, bench_op3_r3d.txt). Outcome: default
moved to N=524,288 / chunk=65,536 (536,700 samples/s/chip official,
bench_full_r3e.txt); the N sweep climbs slowly to ~550k at N=1-2M
but doubles per-step latency each time.

Run: python scripts/bench_op_split.py
"""

import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from bench import build, device_time_per_rhs, log

def main():
    import jax
    from vmc_pde_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    log(f"devices: {jax.devices()}")
    results = []
    for n, chunk in ((524288, 65536), (1048576, 32768), (1048576, 65536),
                 (524288, 131072), (1048576, 131072), (2097152, 65536)):
        state, tdvp = build(32, 4, n, chunk=chunk, gram_backend="tri2")
        assert tdvp._ps_split is not None
        dt, res = device_time_per_rhs(state, tdvp, K=4,
                                      label=f"N={n} c={chunk}")
        results.append((n, chunk, dt, n / dt, res))
    log("\nsummary:")
    for n, chunk, dt, sps, res in results:
        log(f"  N={n:8d} c={chunk:6d}  {dt*1e3:7.1f} ms/rhs  "
            f"{sps:10,.0f} samples/s/chip  res={res:.2e}")

main()

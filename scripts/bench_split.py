"""A/B the split-emitting per-sample kernel (kernels/persample.py
emit_split + the _chunked_stats pair branch) against the plain f32-O path
on the real TPU at the headline shape, and fold in the tri2 panel-width
re-pick (scripts/bench_tri2_k.py found K=16 ~= K=6 > K=8 within noise).

Expected: the pair branch removes one (chunk, P) f32 read + bf16-pair
write per chunk (the Gram's split production), ~49 ms of the 1152 ms RHS
at N=524,288 / chunk=32,768 (~+4%).

Run: python scripts/bench_split.py
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
    N, chunk = 524288, 32768
    results = []
    for label, split in (("plain", False), ("split", True)):
        state, tdvp = build(32, 4, N, chunk=chunk, gram_backend="tri2")
        assert tdvp._use_tri2 and tdvp._ps_pallas is not None
        assert tdvp._ps_split is not None
        if not split:
            tdvp._ps_split = None
        dt, res = device_time_per_rhs(state, tdvp, K=6,
                                      label=f"tri2+{label}")
        results.append((label, dt, N / dt, res))

    log("\nsummary:")
    for label, dt, sps, res in results:
        log(f"  tri2+{label:6s}  {dt * 1e3:7.1f} ms/rhs  "
            f"{sps:10,.0f} samples/s/chip  res={res:.2e}")


if __name__ == "__main__":
    main()

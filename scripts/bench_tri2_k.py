"""Sweep the tri2 Gram panel width (target_block -> K panels) on the real
TPU at the headline shape (N=524,288, chunk=32,768, d=32, P=9264).

Motivation: the measured sym2->tri2 gain (133 ms) is smaller than the pure
FLOP model predicts (0.4375 passes x ~457 ms/pass ~= 200 ms), i.e. the
triangle panel matmuls run at lower MXU efficiency than the full-width
pass. Fewer/wider panels (smaller K) do more FLOPs at better efficiency;
more/narrower panels (larger K) the reverse. This sweep finds the knee.

Run: python scripts/bench_tri2_k.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import build, device_time_per_rhs, log  # noqa: E402


def main():
    import jax

    from vmc_pde_tpu.parallel import stats
    from vmc_pde_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    log(f"devices: {jax.devices()}")
    N, chunk, P = 524288, 32768, 9264
    orig_bounds = stats.tri2_bounds
    results = []
    # target_block -> K at P=9264: 3088->3, 2316->4, 1544->6, 1184->8
    # (current default), 772->12, 579->16
    for tb in (3088, 2316, 1544, 1184, 772, 579):
        stats.tri2_bounds = lambda p, target_block=tb: orig_bounds(
            p, target_block)
        K = len(orig_bounds(P, tb)) - 1
        state, tdvp = build(32, 4, N, chunk=chunk, gram_backend="tri2")
        assert tdvp._use_tri2
        dt, res = device_time_per_rhs(state, tdvp, K=6,
                                      label=f"tri2 K={K} tb={tb}")
        passes = 1.5 + 0.5 / K
        results.append((K, tb, dt, N / dt, passes, res))
    stats.tri2_bounds = orig_bounds

    log("\nsummary:")
    for K, tb, dt, sps, passes, res in results:
        log(f"  K={K:3d} (tb={tb:5d}, {passes:.3f} passes)  "
            f"{dt * 1e3:7.1f} ms/rhs  {sps:10,.0f} samples/s/chip  "
            f"res={res:.2e}")


if __name__ == "__main__":
    main()

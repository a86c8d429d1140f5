"""Round-5 verdict item 5: tri2 Gram panel-width experiment at the FULL
headline operating point (N=2,097,152, chunk=65,536, d=32, P=9264, int8
cross + split kernel + jet quad).

The default near-equal panels at K=19 are 487/488 wide -- below the MXU's
preferred >= 512 M-dimension. Hypothesis: MXU-aligned 512-wide panels
(two-level blocking: floor(P/512) panels of exactly 512 plus one narrow
remainder strip) contract at better efficiency than 487-wide ones at the
same effective pass count. The bounds machinery takes arbitrary static
panel boundaries, so the probe is a tri2_bounds override -- same numerics
class, same strips-and-mirror assembly.

Variants (P = 9264 = 18 * 512 + 48):
  - default    : near-equal K=19 (widths 487/488)   [control]
  - a512       : 18 x 512 + 48 remainder (K=19)     [alignment at same K]
  - a768       : 12 x 768 + 48 remainder (K=13)     [wider aligned panels]
  - a1024      :  9 x 1024 + 48 remainder (K=10)    [even wider]
  - a512merge  : 17 x 512 + 560 last (K=18)         [remainder merged]

Run: python scripts/bench_tri2_panel512.py [--samples N] [--chunk C]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import build, device_time_per_rhs, log  # noqa: E402


def aligned_bounds(P, width, merge_remainder=False):
    """floor(P/width) panels of exactly ``width`` plus a remainder strip
    (merged into the last full panel when ``merge_remainder``)."""
    bounds = list(range(0, P + 1, width))
    if bounds[-1] != P:
        if merge_remainder and len(bounds) > 1:
            bounds[-1] = P
        else:
            bounds.append(P)
    return tuple(bounds)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=2097152)
    ap.add_argument("--chunk", type=int, default=65536)
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--only", type=str, default="",
                    help="comma-separated variant names to run")
    args = ap.parse_args()

    import jax

    from vmc_pde_tpu.parallel import stats
    from vmc_pde_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    log(f"devices: {jax.devices()}")
    N, chunk, P = args.samples, args.chunk, 9264
    orig_bounds = stats.tri2_bounds

    variants = [
        ("default487", lambda p: orig_bounds(p)),
        ("a512", lambda p: aligned_bounds(p, 512)),
        ("a768", lambda p: aligned_bounds(p, 768)),
        ("a1024", lambda p: aligned_bounds(p, 1024)),
        ("a512merge", lambda p: aligned_bounds(p, 512,
                                               merge_remainder=True)),
    ]

    if args.only:
        keep = set(args.only.split(","))
        variants = [v for v in variants if v[0] in keep]

    results = []
    for name, fn in variants:
        stats.tri2_bounds = lambda p, target_block=None, _fn=fn: _fn(p)
        b = fn(P)
        K = len(b) - 1
        widths = sorted({b[i + 1] - b[i] for i in range(K)})
        state, tdvp = build(32, 4, N, chunk=chunk, gram_backend="tri2")
        assert tdvp._use_tri2 and tdvp._cross_int8
        dt, res = device_time_per_rhs(
            state, tdvp, K=args.reps,
            label=f"{name}: K={K} widths={widths}")
        results.append((name, K, widths, dt, N / dt, res))
    stats.tri2_bounds = orig_bounds

    log("\nsummary (N=%d chunk=%d P=%d):" % (N, chunk, P))
    for name, K, widths, dt, sps, res in results:
        log(f"  {name:11s} K={K:3d} widths={widths!s:12s} "
            f"{dt * 1e3:7.1f} ms/rhs  {sps:10,.0f} samples/s/chip  "
            f"res={res:.2e}")


if __name__ == "__main__":
    main()

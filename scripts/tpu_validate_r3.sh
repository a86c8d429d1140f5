#!/bin/bash
# Round-3 late validation queue: run when the TPU tunnel is back.
# One TPU process at a time (CLAUDE.md); stages run sequentially.
set -x
cd /root/repo
mkdir -p results

# 1. Student-t + split/fusion Mosaic compile + accuracy smoke (fast, small)
timeout 900 python scripts/tpu_smoke_persample.py \
    2>&1 | tee results/tpu_smoke_persample_r3.txt

# 2. Per-sample stage + RHS bench at the flagship shape (split + affine
#    pair fusion vs the committed baseline numbers in BENCHMARKS.md)
timeout 1800 python scripts/bench_persample.py --rhs \
    2>&1 | tee results/bench_persample_r3b.txt

# 3. Headline bench at the round-3 operating point
timeout 3600 python bench.py 2>&1 | tee results/bench_full_r3b.txt

# 4. North-star L2: ALREADY PASSED ON CPU at the matched reference budget
#    (L2 = 1.12e-6 vs target 1e-5, results/northstar_l2.txt) once the
#    t_end-overshoot artifact (quirk Q11) was removed via exact_t_end.
#    TPU stage is now just a cheap confirmation that the f32 compute path
#    holds the target too (floor is the 1e-5-scale init representation
#    error, not precision).
timeout 1800 python scripts/northstar_l2.py --tpu \
    --aot-dir /root/repo/.aot_cache \
    2>&1 | tee -a results/northstar_l2.txt

# 5. Double-well quench (BASELINE config 3) on the TPU f32 path: rw
#    Metropolis chains + SVD TDVP on the quartic potential (late-r3
#    workload; CPU f64 artifact in results/doublewell_quench.npz)
timeout 1800 python scripts/evolve_doublewell.py --tpu --t-end 0.5 \
    --out results/doublewell_quench_tpu.npz \
    2>&1 | tee results/doublewell_tpu.txt

# 6. New steppers on the TPU f32 path (fused RK3 triple + fused RK23
#    attempt compile and run; correctness is CPU-CI-covered)
timeout 1200 python -m vmc_pde_tpu.driver mwe --samples 4096 --t-end 0.05 \
    --precision tpu --stepper fixed_rk3 --exact-t-end --max-steps 10 \
    --aot-dir /root/repo/.aot_cache 2>&1 | tail -20 | tee results/rk3_tpu.txt
timeout 1200 python -m vmc_pde_tpu.driver mwe --samples 4096 --t-end 0.05 \
    --precision tpu --stepper adaptive_rk23 --max-steps 10 \
    --aot-dir /root/repo/.aot_cache 2>&1 | tail -20 | tee results/rk23_tpu.txt

# 7. On-device adaptive multi-step (lax.while_loop attempt loop inside a
#    masked lax.scan): compile + run on the TPU f32 path. dim=4 keeps the
#    grid (2-D-only) out of the way so the batched branch engages.
timeout 1200 python scripts/amulti_tpu_smoke.py \
    --aot-dir /root/repo/.aot_cache 2>&1 | tee results/amulti_tpu.txt

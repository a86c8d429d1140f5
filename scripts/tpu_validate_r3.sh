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

# 4. North-star L2 on 2-D diffusion at a TPU-enabled budget (N=1e6,
#    dt=1e-3, f64-grade statistics): the accumulated MC random walk
#    scales ~sqrt(t*dt/N), so this should approach the 1e-5 target the
#    matched reference budget (1.1e-3 measured on CPU f64) cannot.
timeout 3600 python scripts/northstar_l2.py --tpu --samples 1000000 \
    --max-step 0.001 --gram-f64 --aot-dir /root/repo/.aot_cache \
    2>&1 | tee -a results/northstar_l2.txt

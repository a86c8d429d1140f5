"""Smoke tests for the bench harness the round driver runs (bench.py).

The driver executes ``python bench.py`` at round end; a broken harness
means a lost measurement even when the framework itself is healthy. These
tests run the measured fori_loop at tiny CPU shapes and check its
contract: a finite per-RHS time, the final iteration's solver residual
carried out of the loop (bench.py:device_time_per_rhs), and the AOT-cache
argument no-oping gracefully on non-TPU backends (utils/aot.py
SUPPORTED_BACKENDS).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def test_device_time_per_rhs_contract(tmp_path):
    state, tdvp = bench.build(4, 2, 256, chunk=0, solver="eigh")
    dt, res = bench.device_time_per_rhs(state, tdvp, K=2, label="smoke")
    assert np.isfinite(dt) and dt > 0
    # bench builds with the "tpu" precision preset (f32 statistics)
    # even on CPU, so the solve residual sits at f32 scale, not 1e-14
    assert np.isfinite(res) and 0 < res < 1e-4

    # aot_dir on the CPU backend: transparent no-op, same residual (the
    # two compilations may differ by fp-reassociation ulps if compilation
    # choices ever vary, so compare tightly rather than bitwise)
    dt2, res2 = bench.device_time_per_rhs(state, tdvp, K=2, label="smoke",
                                          aot_dir=str(tmp_path))
    assert np.isfinite(res2) and np.isclose(res2, res, rtol=1e-6, atol=0)


def test_build_solver_and_backend_selection():
    # chunked + auto on CPU: sym2/tri2 are TPU-only, chunking must engage
    state, tdvp = bench.build(4, 2, 512, chunk=256, solver="auto")
    assert tdvp.n_samples >= 512
    assert not tdvp._use_syrk and not tdvp._use_tri2
    dt, res = bench.device_time_per_rhs(state, tdvp, K=2, label="chunked")
    assert np.isfinite(res) and res < 1e-4

"""Tests for the diagnostics stack: native async recorder, paper-figure
analysis utilities, visualization battery, oracle CLI, timings."""

import math
import os

import numpy as np
import pytest


def test_async_recorder_roundtrip(tmp_path):
    from vmc_pde_tpu.utils.recorder import (AsyncRecorder, log_to_infos,
                                            read_log)

    path = str(tmp_path / "run.vpdr")
    rec = AsyncRecorder(path)
    if not rec.available:
        pytest.skip("no C++ toolchain")
    for step in range(100):
        rec.record("entropy", step, 2.84 + step * 1e-3)
        rec.record("ev", step, np.linspace(0, 1, 37))
    rec.record_dict(100, {"x1": np.array([0.1, 0.2]), "_private": 1.0})
    rec.close()

    infos = log_to_infos(path)
    assert len(infos["entropy"]) == 100
    assert np.asarray(infos["ev"]).shape == (100, 37)
    np.testing.assert_allclose(infos["entropy"][3], 2.843)
    assert "x1" in infos and "_private" not in infos
    names = {r[0] for r in read_log(path)}
    assert names == {"entropy", "ev", "x1"}


def test_recorder_corrupt_file(tmp_path):
    from vmc_pde_tpu.utils.recorder import read_log

    p = tmp_path / "junk.bin"
    p.write_bytes(b"not a log at all")
    with pytest.raises(ValueError):
        read_log(str(p))


def test_paper_analytic_targets():
    from vmc_pde_tpu.viz import paper

    # steady-state entropy (paper_plot_phaseSpaceTempDifference.py:87)
    np.testing.assert_allclose(
        paper.steady_state_entropy(3, 10.0),
        3 * math.log(2 * math.pi * math.e * 10.0),
    )
    # sphere-integral closed forms match the reference's Wolfram constants
    # for d=2 (paper_plot_phaseSpaceTempDifference.py:129-133)
    np.testing.assert_allclose(paper.gauss_ball_mass(2, 0.17), 1.44e-2,
                               rtol=0.01)
    np.testing.assert_allclose(paper.gauss_ball_mass(2, 1.0),
                               1 - np.exp(-0.5), rtol=1e-12)


def test_paper_entropy_error_stats():
    from vmc_pde_tpu.viz import paper

    t = np.linspace(0, 5, 50)
    infos = {
        "times": t,
        "entropy": paper.gauss_diffusion_entropy(t, dim=8) + 0.01,
    }
    stats = paper.entropy_error_stats(infos, dim=8)
    np.testing.assert_allclose(stats["max"], 0.01, rtol=1e-10)
    np.testing.assert_allclose(stats["final"], 0.01, rtol=1e-10)


def test_paper_plots_and_slim(tmp_path):
    from vmc_pde_tpu.viz import paper

    t = np.linspace(0, 2, 40)
    infos = {
        "times": t,
        "entropy": paper.gauss_diffusion_entropy(t, 2),
        "x1": np.zeros((40, 2)),
        "covar": np.tile(np.eye(2), (40, 1, 1)),
        "integral_1sigma": np.full(40, 0.86),
    }
    slim = paper.slim_infos(infos, 10)
    assert len(slim["times"]) == 4

    fig = paper.plot_entropy_comparison({"run": infos}, dim=2,
                                        save=str(tmp_path / "e.pdf"))
    assert os.path.exists(tmp_path / "e.pdf")
    figs = paper.plot_vs_oracle(infos, infos, entropy_target=1.0,
                                save_prefix=str(tmp_path / "cmp"))
    assert len(figs) >= 3
    assert os.path.exists(tmp_path / "cmp_entropy.pdf")


def test_make_final_plots(tmp_path):
    from vmc_pde_tpu.viz.plots import make_final_plots

    n, p = 20, 15
    t = np.linspace(0, 1, n)
    infos = {
        "times": t,
        "entropy": 2.8 + t,
        "x1": np.zeros((n, 2)),
        "covar": np.tile(np.eye(2), (n, 1, 1)),
        "solver_res": np.full(n, 1e-12),
        "tdvp_error": np.full(n, 1e-5),
        "ev": np.tile(np.logspace(-14, 2, p), (n, 1)),
        "snr": np.tile(np.logspace(0, 3, p), (n, 1)),
        "dist_params": np.zeros((n, 1)),
        "max_grad": np.ones(n),
        "x3": np.zeros((n, 2)),
        "integral_1sigma": np.full(n, 0.86),
    }
    figs = make_final_plots(str(tmp_path), infos, dim=2)
    assert "entropy" in figs and "spectrum" in figs and "snr" in figs
    assert os.path.exists(tmp_path / "entropy.pdf")


def test_oracle_cli(tmp_path, capsys):
    from vmc_pde_tpu.oracle.__main__ import main

    main(["diffusion2d", "--particles", "2000", "--t-end", "0.5",
          "--workdir", str(tmp_path)])
    out = capsys.readouterr().out
    assert "final covar diag" in out
    assert os.path.exists(tmp_path / "infos.hdf5")

    from vmc_pde_tpu.utils.infos import load_infos

    infos = load_infos(str(tmp_path / "infos.hdf5"))
    # 2D diffusion from N(0,I): covar diag ~ 1 + 2t at the last recorded step
    t_last = infos["times"][-1]
    np.testing.assert_allclose(
        np.diag(infos["covar"][-1]), (1 + 2 * t_last) * np.ones(2), atol=0.15
    )


def test_timings_sections():
    import time

    from vmc_pde_tpu.utils.timings import Timings

    tm = Timings()
    with tm.section("a"):
        time.sleep(0.01)
    tm.start_timing("b")
    tm.stop_timing("b")
    assert tm.last("a") >= 0.01
    assert "b" in tm.timing_dict
    tm.print_timings()


def test_info_recorder_device_arrays():
    """InfoRecorder must not force per-append host syncs and must
    materialize device arrays on flush."""
    import jax.numpy as jnp

    from vmc_pde_tpu.utils.infos import InfoRecorder

    rec = InfoRecorder()
    for i in range(4):
        rec.append("x", jnp.full((3,), i))
    arrs = rec.as_arrays()
    assert isinstance(arrs["x"], np.ndarray)
    assert arrs["x"].shape == (4, 3)


def test_plot_data_diff(tmp_path, ctx1):
    """Model-minus-histogram diff (visualization.py:80-109 parity): for
    samples drawn from the model itself, the integrated |diff| is small."""
    import jax

    from vmc_pde_tpu.models import flow as flow_mod
    from vmc_pde_tpu.models.state import VarState
    from vmc_pde_tpu.sampling.sampler import Sampler
    from vmc_pde_tpu.utils.dtypes import Precision
    from vmc_pde_tpu.utils.grid import Grid
    from vmc_pde_tpu.viz.plots import plot_data_diff

    prec = Precision.f64_everywhere()
    fl, params = flow_mod.build_flow(1, dim=2, depth=2, dtype=prec.compute)
    s = Sampler(dim=2, ctx=ctx1, name="Gauss", dtype=prec.compute)
    st = VarState(fl, params, sampler=s, ctx=ctx1, precision=prec)
    x, _ = st.sample(60000, key=jax.random.PRNGKey(0))
    g = Grid(np.ones(2) * 5.0, 40)
    fig, l1 = plot_data_diff(st, g, np.asarray(x))
    fig.savefig(tmp_path / "diff.png")
    assert l1 < 0.15, l1


def test_driver_density_snapshots(tmp_path):
    """Periodic per-step 2D density snapshots land in the workdir
    (main.py:198-201 parity)."""
    from vmc_pde_tpu.config import preset
    from vmc_pde_tpu.driver import run

    cfg = preset("mwe", n_samples_tdvp=256, n_samples_obs=256, dt0=1e-3,
                 max_step=1e-3, t_end=3e-3, plot_every=1e-3,
                 precision="f64", verbose=False, grid_points=30,
                 workdir=str(tmp_path))
    run(cfg, max_steps=3)
    import glob
    snaps = glob.glob(str(tmp_path / "t_*.pdf"))
    assert snaps, "no density snapshots written"


def test_info_recorder_mixed_rows_and_blocks():
    """Single-step rows and multi-step (K, ...) blocks interleave freely
    (the driver mixes them when batches fall back at checkpoint/t_end
    boundaries) and materialize in recording order."""
    import jax.numpy as jnp

    from vmc_pde_tpu.utils.infos import InfoRecorder

    rec = InfoRecorder()
    rec.append("e", 1.0)                                # step 0 (row)
    rec.append_block("e", jnp.array([2.0, 3.0, 4.0]))   # steps 1-3 (block)
    rec.append("e", 5.0)                                # step 4 (row)
    rec.append("v", np.array([1.0, 2.0]))
    rec.append_block("v", jnp.arange(6.0).reshape(3, 2))
    arrs = rec.as_arrays()
    np.testing.assert_allclose(arrs["e"], [1.0, 2.0, 3.0, 4.0, 5.0])
    assert arrs["v"].shape == (4, 2)
    np.testing.assert_allclose(arrs["v"][0], [1.0, 2.0])
    np.testing.assert_allclose(arrs["v"][1:], np.arange(6.0).reshape(3, 2))
    # append_dict_block applies the same skip rules as append_dict
    rec2 = InfoRecorder()
    rec2.append_dict_block({"keep": jnp.ones((2,)), "update": jnp.ones((2, 3)),
                            "_private": jnp.ones((2,))})
    arrs2 = rec2.as_arrays()
    assert set(arrs2) == {"keep"}


def test_plot_data_diff_asymmetric_density():
    """The histogram must be transposed to the meshgrid's [y, x] layout
    before differencing: for an x/y-ASYMMETRIC density sampled from itself,
    the integrated |diff| must still be small (the reference subtracts
    untransposed -- visualization.py:80-109 -- which mirrors the histogram
    and reports a large spurious error here)."""
    from vmc_pde_tpu.utils.grid import Grid
    from vmc_pde_tpu.viz.plots import plot_data_diff

    rng = np.random.default_rng(0)
    # anisotropic, offset Gaussian: p = N([1.5, -0.5], diag(0.25, 4.0))
    data = rng.normal([1.5, -0.5], [0.5, 2.0], size=(120000, 2))

    def fun(c):
        return (np.exp(-0.5 * ((c[0] - 1.5) / 0.5) ** 2
                       - 0.5 * ((c[1] + 0.5) / 2.0) ** 2)
                / (2 * np.pi * 0.5 * 2.0))

    g = Grid(np.ones(2) * 7.0, 40)
    fig, l1 = plot_data_diff(None, g, data, fun=fun)
    import matplotlib.pyplot as plt

    plt.close(fig)
    assert l1 < 0.1, l1


def test_async_recorder_wired_into_driver(tmp_path):
    """Round-3 item 5: the native recorder is a PRODUCT component, not a
    dangling one -- `async_recorder=True` makes the driver stream the same
    per-step metrics into <workdir>/metrics.bin, and the binary log must
    agree with the InfoRecorder/HDF5 stream."""
    from vmc_pde_tpu.config import preset
    from vmc_pde_tpu.driver import run
    from vmc_pde_tpu.utils.recorder import AsyncRecorder, log_to_infos

    probe = AsyncRecorder(str(tmp_path / "probe.bin"))
    if not probe.available:
        pytest.skip("no C++ toolchain")
    probe.close()

    wdir = str(tmp_path / "run")
    cfg = preset("mwe", n_samples_tdvp=512, n_samples_obs=512,
                 t_end=0.01, precision="f64", verbose=False,
                 workdir=wdir, async_recorder=True, grid_points=30)
    state, rec = run(cfg, max_steps=8)

    infos_bin = log_to_infos(os.path.join(wdir, "metrics.bin"))
    infos = rec.as_arrays()
    for key in ("times", "solver_res", "tdvp_error", "entropy", "x1",
                "covar", "dist_params"):
        a = np.asarray(infos[key], dtype=np.float64)
        b = np.asarray(infos_bin[key], dtype=np.float64).reshape(a.shape)
        np.testing.assert_allclose(b, a, rtol=1e-12, atol=1e-15,
                                   err_msg=key)
    assert "update" not in infos_bin  # SKIP_KEYS honored


def test_async_recorder_multistep_dispatch(tmp_path):
    """The batched (steps_per_dispatch) branch records per-step slices."""
    from vmc_pde_tpu.config import preset
    from vmc_pde_tpu.driver import run
    from vmc_pde_tpu.utils.recorder import AsyncRecorder, log_to_infos

    probe = AsyncRecorder(str(tmp_path / "probe.bin"))
    if not probe.available:
        pytest.skip("no C++ toolchain")
    probe.close()

    wdir = str(tmp_path / "run")
    cfg = preset("diffusion", dim=4, offset=(0.0,) * 4,
                 n_samples_tdvp=512, n_samples_obs=512,
                 t_end=0.01, precision="f64", verbose=False,
                 workdir=wdir, async_recorder=True,
                 steps_per_dispatch=3)
    state, rec = run(cfg, max_steps=6)
    infos_bin = log_to_infos(os.path.join(wdir, "metrics.bin"))
    infos = rec.as_arrays()
    a = np.asarray(infos["entropy"], dtype=np.float64)
    b = np.asarray(infos_bin["entropy"], dtype=np.float64)
    np.testing.assert_allclose(b, a.reshape(b.shape), rtol=1e-12)
    assert len(infos_bin["times"]) == len(a)

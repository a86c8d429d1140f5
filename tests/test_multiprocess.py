"""Multi-process (multi-host) execution tests: a real 2-process
jax.distributed cluster on CPU (gloo collectives), the TPU-native analogue
of the reference's MPI multi-rank runs (mpi_wrapper.py:9-11, 277-306) which
the reference itself never had automated tests for (SURVEY.md section 4.6).

Each test spawns two subprocesses that initialize jax.distributed against a
local coordinator, form a 4-device global mesh (2 virtual CPU devices per
process), and exercise broadcast_from_coordinator / sync_global_devices /
cross-process sharded statistics / the full driver CLI with
coordinator-gated IO.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

pid, port, wdir = int(sys.argv[1]), sys.argv[2], sys.argv[3]

from vmc_pde_tpu.driver import main as driver_main

# the driver CLI owns distributed_init (mpi_wrapper.py:9-11 replacement)
driver_main([
    "mwe", "--samples", "512", "--max-steps", "3", "--t-end", "1.0",
    "--precision", "f64", "--workdir", wdir, "--checkpoint-every", "2",
    "--distributed", "--coordinator", f"localhost:{port}",
    "--num-processes", "2", "--process-id", str(pid),
])
assert jax.process_count() == 2
assert jax.device_count() == 4

import jax.numpy as jnp
from vmc_pde_tpu.parallel import stats
from vmc_pde_tpu.parallel.mesh import (ParallelCtx,
                                       broadcast_from_coordinator,
                                       is_coordinator, sync_global_devices)

# coordinator-value broadcast (bcast_unknown_size parity)
val = jnp.asarray([42.0, 7.0]) if is_coordinator() else jnp.zeros(2)
got = broadcast_from_coordinator(val)
import numpy as np
np.testing.assert_allclose(np.asarray(got), [42.0, 7.0])

# cross-process barrier
sync_global_devices("test-barrier")

# sharded statistics over the global 4-device mesh: each process supplies
# its local half, the jitted reduction must see the global mean
ctx = ParallelCtx.create(dp=4)
full = np.arange(64 * 3, dtype=np.float64).reshape(64, 3) * 0.01
local = full[pid * 32:(pid + 1) * 32]
arr = jax.make_array_from_process_local_data(
    ctx.sharding(ctx.samples_spec), local)
out = jax.jit(lambda x: stats.mean(x, axis=0),
              out_shardings=ctx.sharding(ctx.replicated_spec))(arr)
np.testing.assert_allclose(np.asarray(out), full.mean(0))

print(f"WORKER_OK {pid} coordinator={int(is_coordinator())}", flush=True)
"""


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_driver_and_collectives(tmp_path):
    port = _free_port()
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    wdir = tmp_path / "run"
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + ":" + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), str(port), str(wdir)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {i} failed:\n{out[-3000:]}"
        assert f"WORKER_OK {i}" in out

    # both ranks ran the identical sharded program: same per-step residuals
    res = []
    for i, out in enumerate(outs):
        res.append([line for line in out.splitlines()
                    if "Solver Residual" in line])
    assert res[0] == res[1] and len(res[0]) == 3

    # coordinator-gated IO: exactly one process wrote, and the artifacts
    # are complete (atomic checkpoints, no stray temp files)
    names = sorted(os.listdir(wdir))
    assert "infos.hdf5" in names
    assert "ckpt_latest.npz" in names
    assert not [n for n in names if n.endswith(".tmp")]
    import h5py

    with h5py.File(wdir / "infos.hdf5") as f:
        assert f["times"].shape[0] == 3
        assert np.isfinite(f["solver_res"][:]).all()


_WORKER_MCMC = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

pid, port = int(sys.argv[1]), sys.argv[2]
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=2, process_id=pid)
assert jax.device_count() == 4

import numpy as np
import jax.numpy as jnp
from vmc_pde_tpu.models.flow import build_flow
from vmc_pde_tpu.models.state import VarState
from vmc_pde_tpu.ops.evolution import make_equation
from vmc_pde_tpu.parallel.mesh import ParallelCtx
from vmc_pde_tpu.sampling.sampler import Sampler
from vmc_pde_tpu.solver.tdvp import TDVP, TDVPConfig
from vmc_pde_tpu.utils.dtypes import Precision

ctx = ParallelCtx.create(dp=4)  # global mesh spanning both processes
prec = Precision.f64_everywhere()
fl, params = build_flow(0, dim=2, variant="affine", latent_name="cos_dist",
                        offset=(0.25, 0.25), dtype=jnp.float64)
s = Sampler(dim=2, ctx=ctx, name="cos_dist", n_chains=64,
            mcmc_info={"offset": np.array([0.25, 0.25]), "bound": 0.25},
            dtype=jnp.float64)
st = VarState(fl, params, sampler=s, ctx=ctx, precision=prec)
eq = make_equation("advection_paper", 2)
td = TDVP(st, eq, TDVPConfig(), n_samples=1024, precision=prec)
assert td._mcmc_fused

theta = st.get_parameters()
key = jax.random.PRNGKey(0)
for i in range(2):
    key, sk = jax.random.split(key)
    dy, aux = td.heun_pair(theta, i * 1e-3, 1e-3, sk)
    theta = theta + dy
res = float(aux["solver_res"])
acc = td.sampler.last_info.acceptance_rate
assert np.isfinite(np.asarray(theta)).all()
assert 0.05 < acc < 0.95, acc
print(f"MCMC_OK {pid} res={res:.6e} acc={acc:.4f}", flush=True)
"""


@pytest.mark.slow
def test_two_process_fused_mcmc(tmp_path):
    """The fused Metropolis chain runs on a GLOBAL 2-process mesh: chains
    shard over the cross-process dp axis, the chain state carries across
    dispatches, and both ranks see identical residuals/acceptance (the
    acceptance count is a global psum)."""
    port = _free_port()
    worker = tmp_path / "worker_mcmc.py"
    worker.write_text(_WORKER_MCMC)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + ":" + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    lines = []
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {i} failed:\n{out[-3000:]}"
        ok = [ln for ln in out.splitlines() if ln.startswith("MCMC_OK")]
        assert len(ok) == 1
        lines.append(ok[0].split(" ", 2)[2])  # res=... acc=...
    assert lines[0] == lines[1], lines  # identical global statistics

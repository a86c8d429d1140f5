"""Pallas kernel tests (syrk triangle Gram in interpreter mode on CPU;
the Metropolis kernel's hardware-PRNG path runs on real silicon and is
CI-tested here via interpret mode + injected uniforms)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


# ---------------------------------------------------------------------------
# Pallas Metropolis kernel (kernels/metropolis.py): CI coverage via TPU
# interpret mode + externally-supplied uniforms (the hardware PRNG is
# silicon-only), validated exactly against a host replica and statistically
# against the lax.scan Metropolis path.
# ---------------------------------------------------------------------------
import jax
import jax.numpy as jnp

from vmc_pde_tpu.kernels.metropolis import (SWEEPS_PER_BLOCK,
                                            cos_bump_log_prob,
                                            metropolis_chain_pallas)


def _host_replica(init, u_all, bound, offset, n_steps, log_prob_xy):
    """Plain-jnp mirror of the kernel semantics: same uniform consumption
    order, same Box-Muller proposal, same MH accept."""
    C, d = init.shape
    states = jnp.asarray(init, jnp.float32)
    lp = log_prob_xy(states)
    out = []
    acc = 0
    off = jnp.asarray(offset, jnp.float32)
    for i in range(n_steps):
        u = u_all[:, i * C:(i + 1) * C]
        u1, u2 = u[0:d], u[d:2 * d]
        dvec = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(2.0 * np.pi * u2)
        dvec = dvec / jnp.sqrt(jnp.sum(dvec * dvec, axis=0, keepdims=True))
        r = u[2 * d:2 * d + 1] ** (1.0 / d) * bound
        prop = (r * dvec + off[:, None]).T
        lp_new = log_prob_xy(prop)
        accept = u[2 * d + 1] < jnp.exp(lp_new - lp)
        states = jnp.where(accept[:, None], prop, states)
        lp = jnp.where(accept, lp_new, lp)
        acc += int(jnp.sum(accept))
        out.append(states)
    return np.asarray(jnp.concatenate(out, axis=0)), np.asarray(states), acc


def _bump_lp_xy(x, offset=(0.25, 0.25)):
    """(C, d) -> (C,) cosine-bump log-density (row-major layout)."""
    r = jnp.minimum(
        1.0, 4.0 * jnp.sqrt(jnp.sum((x - jnp.asarray(offset)) ** 2, axis=-1))
    )
    return jnp.log(0.5 * (1.0 + jnp.cos(np.pi * r))).astype(jnp.float32)


def test_metropolis_kernel_matches_host_replica():
    """Identical uniforms through the kernel (interpret mode) and the host
    replica must give identical chains, sample ordering, and acceptance
    count -- pinning the lane-major layout, per-sweep output slicing, and
    the sweep loop exactly."""
    C, d, bound = 128, 2, 0.25
    offset = np.array([0.25, 0.25], np.float32)
    n_steps = 3 * SWEEPS_PER_BLOCK  # multiple grid steps
    key = jax.random.PRNGKey(123)
    u = jax.random.uniform(
        key, (2 * d + 2, n_steps * C), dtype=jnp.float32,
        minval=1e-7, maxval=1.0 - 1e-7,
    )
    init = np.tile(offset, (C, 1)).astype(np.float32)

    samples, final, n_acc = metropolis_chain_pallas(
        0, init, cos_bump_log_prob, n_steps, bound, offset,
        interpret=True, uniforms=u,
    )
    ref_samples, ref_final, ref_acc = _host_replica(
        init, u, bound, offset, n_steps, _bump_lp_xy
    )
    assert samples.shape == (n_steps * C, d)
    np.testing.assert_allclose(np.asarray(samples), ref_samples,
                               rtol=0, atol=2e-6)
    np.testing.assert_allclose(np.asarray(final), ref_final,
                               rtol=0, atol=2e-6)
    assert n_acc == ref_acc
    assert 0 < n_acc < n_steps * C  # both accepts and rejects exercised


def test_metropolis_kernel_sweep_rounding():
    """Sweep counts round UP to whole blocks; the uniforms contract is
    validated against the rounded count."""
    C, d = 128, 2
    n_req = SWEEPS_PER_BLOCK + 3
    n_round = 2 * SWEEPS_PER_BLOCK
    u = jax.random.uniform(jax.random.PRNGKey(5),
                           (2 * d + 2, n_round * C), dtype=jnp.float32,
                           minval=1e-7, maxval=1.0 - 1e-7)
    init = np.full((C, d), 0.25, np.float32)
    samples, _, _ = metropolis_chain_pallas(
        0, init, cos_bump_log_prob, n_req, 0.25, (0.25, 0.25),
        interpret=True, uniforms=u)
    assert samples.shape == (n_round * C, d)
    with pytest.raises(ValueError, match="uniforms"):
        metropolis_chain_pallas(
            0, init, cos_bump_log_prob, n_req, 0.25, (0.25, 0.25),
            interpret=True, uniforms=u[:, :n_req * C])
    with pytest.raises(ValueError, match="multiple of 128"):
        metropolis_chain_pallas(
            0, np.full((64, d), 0.25, np.float32), cos_bump_log_prob,
            n_req, 0.25, (0.25, 0.25), interpret=True)


def test_metropolis_kernel_statistics_match_scan_path():
    """Kernel chains and the lax.scan Metropolis path must agree as
    samplers of the cosine bump: acceptance rate, mean radius (vs the
    analytic value), and radial histogram distance."""
    from vmc_pde_tpu.sampling.sampler import (cos_dist_log_prob,
                                              metropolis_chain,
                                              radial_proposal)

    C, d, bound = 128, 2, 0.25
    offset = np.array([0.25, 0.25], np.float32)
    n_steps = 400
    burn = 100 * C

    u = jax.random.uniform(jax.random.PRNGKey(9),
                           (2 * d + 2, n_steps * C), dtype=jnp.float32,
                           minval=1e-7, maxval=1.0 - 1e-7)
    init = np.tile(offset, (C, 1)).astype(np.float32)
    k_samples, _, k_acc = metropolis_chain_pallas(
        0, init, cos_bump_log_prob, n_steps, bound, offset,
        interpret=True, uniforms=u)

    from functools import partial
    s_samples, _, s_acc = metropolis_chain(
        jax.random.PRNGKey(10), jnp.asarray(init, jnp.float64),
        partial(cos_dist_log_prob, offset=jnp.asarray(offset)),
        radial_proposal, n_steps,
        {"offset": jnp.asarray(offset), "bound": bound})

    rate_k = k_acc / (n_steps * C)
    rate_s = float(s_acc) / (n_steps * C)
    np.testing.assert_allclose(rate_k, rate_s, atol=0.03)

    rk = np.linalg.norm(np.asarray(k_samples)[burn:] - offset, axis=1)
    rs = np.linalg.norm(np.asarray(s_samples)[burn:] - offset, axis=1)
    # analytic mean radius of p(s) ~ s (1 + cos(4 pi s)) on [0, 0.25]
    s_grid = np.linspace(0, bound, 20001)
    w = s_grid * (1 + np.cos(4 * np.pi * s_grid))
    mean_r = np.trapezoid(s_grid * w, s_grid) / np.trapezoid(w, s_grid)
    np.testing.assert_allclose(rk.mean(), mean_r, rtol=0.05)
    np.testing.assert_allclose(rs.mean(), mean_r, rtol=0.05)
    hk, edges = np.histogram(rk, bins=25, range=(0, bound), density=True)
    hs, _ = np.histogram(rs, bins=edges, density=True)
    l1 = np.abs(hk - hs).mean() / hs.mean()
    assert l1 < 0.15, l1


# ---------------------------------------------------------------------------
# Triangle (syrk) Gram kernel: kernels/syrk.py
# ---------------------------------------------------------------------------
from vmc_pde_tpu.kernels.syrk import syrk


@pytest.mark.parametrize("N,P", [(1024, 512), (512, 300), (100, 937)])
def test_syrk_matches_numpy(N, P):
    """Triangle-only contraction == full O^T O at 3-pass f32-grade accuracy,
    including parameter counts that need tile padding and sample counts that
    need chunk padding."""
    rng = np.random.default_rng(0)
    O = rng.normal(size=(N, P)).astype(np.float32)
    S = np.asarray(syrk(jnp.asarray(O), interpret=True))
    ref = O.T @ O
    np.testing.assert_allclose(S, ref, atol=2e-5 * np.abs(ref).max())
    assert S.shape == (P, P)


def test_syrk_weighted_signed():
    """Per-sample weights may be signed (the chunked-stats sum_EOO moment
    uses centered Eloc as the weight); the product stays symmetric."""
    rng = np.random.default_rng(1)
    N, P = 512, 384
    O = rng.normal(size=(N, P)).astype(np.float32)
    w = rng.normal(size=N).astype(np.float32)
    S = np.asarray(syrk(jnp.asarray(O), w=jnp.asarray(w), interpret=True))
    ref = O.T @ (O * w[:, None])
    np.testing.assert_allclose(S, ref, atol=3e-5 * np.abs(ref).max())


def test_syrk_small_tile_autoshrink():
    """tile/chunk larger than the (padded) problem must auto-shrink."""
    rng = np.random.default_rng(2)
    O = rng.normal(size=(48, 70)).astype(np.float32)
    S = np.asarray(syrk(jnp.asarray(O), tile=512, chunk=256, interpret=True))
    ref = O.T @ O
    np.testing.assert_allclose(S, ref, atol=2e-5 * np.abs(ref).max())


def test_metropolis_kernel_sharded_matches_single_device(ctx8):
    """The dp-sharded kernel (shard_map, one instance per device on its
    chain shard) replays BIT-IDENTICALLY to the single-device kernel when
    fed the same external uniforms: the uniform block is split by chain
    column, so every chain consumes exactly the same randomness either
    way. Acceptance counts psum to the same total."""
    from vmc_pde_tpu.kernels.metropolis import (
        metropolis_chain_pallas_sharded)
    from vmc_pde_tpu.parallel.mesh import ParallelCtx

    C, d, bound = 8 * 128, 2, 0.25
    offset = np.array([0.25, 0.25], np.float32)
    n_steps = 2 * SWEEPS_PER_BLOCK
    u = jax.random.uniform(
        jax.random.PRNGKey(7), (2 * d + 2, n_steps * C), dtype=jnp.float32,
        minval=1e-7, maxval=1.0 - 1e-7,
    )
    init = np.tile(offset, (C, 1)).astype(np.float32)

    s1, f1, a1 = metropolis_chain_pallas(
        0, init, cos_bump_log_prob, n_steps, bound, offset,
        interpret=True, uniforms=u)
    s8, f8, a8 = metropolis_chain_pallas_sharded(
        ctx8, 0, init, cos_bump_log_prob, n_steps, bound, offset,
        interpret=True, uniforms=u)
    np.testing.assert_array_equal(np.asarray(s8), np.asarray(s1))
    np.testing.assert_array_equal(np.asarray(f8), np.asarray(f1))
    assert a8 == a1
    # dp=1 passthrough returns the single-device path unchanged
    s0, f0, a0 = metropolis_chain_pallas_sharded(
        ParallelCtx.single_device(), 0, init, cos_bump_log_prob, n_steps,
        bound, offset, interpret=True, uniforms=u)
    np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))
    # chain counts must tile 128 lanes PER DEVICE
    with pytest.raises(ValueError, match="128"):
        metropolis_chain_pallas_sharded(
            ctx8, 0, init[:512], cos_bump_log_prob, n_steps, bound, offset,
            interpret=True, uniforms=u[:, : n_steps * 512])

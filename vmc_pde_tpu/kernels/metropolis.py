"""TPU-resident Metropolis sampler as a Pallas kernel.

The lax.scan Metropolis path (sampling/sampler.py) round-trips through XLA's
loop machinery with per-step threefry key splitting; this kernel keeps the
whole chain ensemble in VMEM, uses the TPU's hardware PRNG
(pltpu.prng_random_bits), and DMAs each sweep's states straight to the HBM
output -- the "TPU-resident Metropolis kernel" the north star calls for
(BASELINE.json). Matches the semantics of sampler.metropolis_chain:
independence proposals uniform in a ball, MH ratio p(new)/p(old), one
recorded sample per chain per sweep (vmc_fluids/sampler.py:88-111 behavior,
with the Q1 repair of an injectable latent log-density).

Layout is lane-major: chains ride the 128-wide vector lanes and the (small)
coordinate dimension rides sublanes, so the state block is (dim, chains)
with chains a multiple of 128. This keeps every per-sweep op a full-width
VPU op and makes the per-sweep DMA slice lane-aligned. (The obvious
(chains, dim) layout puts dim=2..32 in the lane dimension: everything pads
to 128 lanes and per-sweep stores violate Mosaic's lane-tiling alignment.)

Mosaic constraints encoded here: loop carries must be layout-stable 2D
blocks (1D vectors or f32 scalar carries trip "Not implemented: Offset
change"), and the PRNG is drawn in full (rows, chains) blocks.

The target log-density is an arbitrary jnp-traceable callable evaluated
inside the kernel on the (dim, chains) proposal block, so any latent target
(e.g. the cosine bump) fuses into the VPU loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INV24 = 1.0 / (1 << 24)
SWEEPS_PER_BLOCK = 8  # static unroll per grid step; sweep counts round up


def _uniforms(rows, n_chains):
    """(rows, n_chains) U(0,1) floats from the hardware PRNG. Mask to the
    low 23 bits as int32 (Mosaic supports int32->f32 casts but not
    uint32->f32, and an arithmetic shift on the raw signed bits would leave
    half the draws negative)."""
    bits = pltpu.bitcast(pltpu.prng_random_bits((rows, n_chains)),
                         jnp.int32)
    return (bits & 0x7FFFFF).astype(jnp.float32) * (1.0 / (1 << 23)) + 1e-12


def _ball_proposal(u, dim, bound, offset):
    """Uniform-in-ball independence proposal (sampler.radial_proposal) from
    a pre-drawn uniform block u of shape (2*dim+2, chains): rows 0..dim-1
    and dim..2dim-1 feed Box-Muller direction normals, row 2dim the radius.
    Returns (dim, chains)."""
    u1 = u[0:dim, :]
    u2 = u[dim:2 * dim, :]
    d = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(2.0 * np.pi * u2)
    d = d / jnp.sqrt(jnp.sum(d * d, axis=0, keepdims=True))
    r = u[2 * dim:2 * dim + 1, :] ** (1.0 / dim) * bound
    return r * d + offset


def _metropolis_body(get_uniforms, init_ref, offset_ref, out_ref, final_ref,
                     acc_ref, states_ref, lp_ref, accv_ref,
                     *, log_prob, n_chains, dim, sweeps_per_block, bound):
    """Shared sweep loop; ``get_uniforms(j)`` yields the (2*dim+2, chains)
    uniform block for sweep j (hardware PRNG or an external input)."""
    b = pl.program_id(0)
    n_blocks = pl.num_programs(0)
    off = offset_ref[:]  # (dim, 1), broadcast across chain lanes

    @pl.when(b == 0)
    def _():
        states_ref[:] = init_ref[:]
        lp_ref[:] = log_prob(init_ref[:], off)
        accv_ref[:] = jnp.zeros((1, n_chains), jnp.float32)

    states = states_ref[:]
    lp = lp_ref[:]
    acc = accv_ref[:]

    # Static unroll: each sweep's output slice has a compile-time lane
    # offset inside this grid step's block; the grid machinery pipelines
    # the block DMA to HBM behind the next step's compute.
    for j in range(sweeps_per_block):
        u = get_uniforms(j)
        prop = _ball_proposal(u, dim, bound, off)
        lp_new = log_prob(prop, off)
        accept = u[2 * dim + 1:2 * dim + 2, :] < jnp.exp(lp_new - lp)
        states = jnp.where(accept, prop, states)
        lp = jnp.where(accept, lp_new, lp)
        acc = acc + accept.astype(jnp.float32)
        out_ref[:, j * n_chains:(j + 1) * n_chains] = states

    states_ref[:] = states
    lp_ref[:] = lp
    accv_ref[:] = acc

    @pl.when(b == n_blocks - 1)
    def _():
        final_ref[:] = states
        acc_ref[0] = jnp.sum(acc)


def _metropolis_kernel_hw(seed_ref, init_ref, offset_ref, out_ref, final_ref,
                          acc_ref, states_ref, lp_ref, accv_ref,
                          *, log_prob, n_chains, dim, bound,
                          sweeps_per_block):
    # Distinct PRNG stream per grid step (the hardware PRNG state does not
    # persist across grid invocations).
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    _metropolis_body(
        lambda j: _uniforms(2 * dim + 2, n_chains),
        init_ref, offset_ref, out_ref, final_ref, acc_ref,
        states_ref, lp_ref, accv_ref,
        log_prob=log_prob, n_chains=n_chains, dim=dim,
        sweeps_per_block=sweeps_per_block, bound=bound,
    )


def _metropolis_kernel_ext(u_ref, init_ref, offset_ref, out_ref, final_ref,
                           acc_ref, states_ref, lp_ref, accv_ref,
                           *, log_prob, n_chains, dim, bound,
                           sweeps_per_block):
    # Externally-supplied uniforms: deterministic and platform-independent,
    # so CI can replay identical randomness through a host-side replica
    # (the hardware PRNG is TPU-only and a zero stub in interpret mode).
    _metropolis_body(
        lambda j: u_ref[:, j * n_chains:(j + 1) * n_chains],
        init_ref, offset_ref, out_ref, final_ref, acc_ref,
        states_ref, lp_ref, accv_ref,
        log_prob=log_prob, n_chains=n_chains, dim=dim,
        sweeps_per_block=sweeps_per_block, bound=bound,
    )


def metropolis_chain_pallas(
    seed: int,
    init_states,
    log_prob,
    n_steps: int,
    bound: float,
    offset,
    interpret: bool = False,
    uniforms=None,
):
    """Run all chains for n_steps Metropolis sweeps fully on-chip.

    ``init_states``: (n_chains, dim), n_chains a multiple of 128.
    ``log_prob``: maps ((dim, chains) block, (dim, 1) offset) -> (1, chains)
    log-densities; jnp-traceable (inlined into the kernel).
    ``uniforms``: optional (2*dim+2, n_steps_rounded * n_chains) U(0,1)
    block replacing the hardware PRNG (sweep j consumes columns
    [j*n_chains, (j+1)*n_chains); rows 0..2dim-1 feed Box-Muller, row 2dim
    the radius, row 2dim+1 the accept draw). Deterministic across platforms
    -- the CI path (the hardware PRNG is TPU-silicon-only).

    Returns (samples (n_steps*n_chains, dim), final_states (n_chains, dim),
    n_accepted). Sample row i*n_chains + c is chain c's state after sweep i,
    matching sampler.metropolis_chain's ordering.
    """
    init_states = jnp.asarray(init_states, dtype=jnp.float32)
    n_chains, dim = init_states.shape
    if n_chains % 128:
        raise ValueError("n_chains must be a multiple of 128 (VPU lanes)")
    offset_arr = jnp.asarray(
        np.asarray(offset, dtype=np.float32).reshape(dim, 1))

    K = SWEEPS_PER_BLOCK
    n_steps = ((int(n_steps) + K - 1) // K) * K

    call = _build_call(log_prob, n_steps, int(n_chains), int(dim),
                       float(bound), K, interpret, uniforms is not None)
    if uniforms is not None:
        u = jnp.asarray(uniforms, dtype=jnp.float32)
        expected = (2 * dim + 2, n_steps * n_chains)
        if u.shape != expected:
            raise ValueError(
                f"uniforms must have shape {expected}, got {u.shape}"
            )
        first = u
    else:
        first = jnp.asarray([seed], dtype=jnp.int32)
    samples, final_states, n_acc = call(first, init_states.T, offset_arr)
    return samples, final_states, int(n_acc[0])


def metropolis_chain_pallas_sharded(
    ctx,
    seed: int,
    init_states,
    log_prob,
    n_steps: int,
    bound: float,
    offset,
    interpret: bool = False,
    uniforms=None,
):
    """The chain ensemble dp-sharded over the mesh: shard_map the single-
    device kernel, each device running its n_chains/dp chain shard
    (multiple of 128). Hardware-PRNG streams decorrelate per device by
    seed + dp_index * n_blocks (each block consumes seed + block_id, so
    the per-device windows are disjoint); tp replicas see the same dp
    index and produce identical samples, matching the dp-only sharding the
    downstream statistics expect. With external ``uniforms`` (the CI path)
    the (rows, n_steps * n_chains) block is split by CHAIN column, so a
    sharded run replays bit-identically to the single-device kernel fed
    the same uniforms (tests/test_kernels.py). Same returns/ordering as
    metropolis_chain_pallas (sweep-major rows)."""
    init_states = jnp.asarray(init_states, dtype=jnp.float32)
    n_chains, dim = init_states.shape
    dp = ctx.dp_size
    if dp == 1:
        return metropolis_chain_pallas(seed, init_states, log_prob, n_steps,
                                       bound, offset, interpret=interpret,
                                       uniforms=uniforms)
    local = n_chains // dp
    if n_chains % dp or local % 128:
        raise ValueError(
            f"n_chains = {n_chains} must be a multiple of 128 * dp "
            f"(= {128 * dp}) for the dp-sharded kernel")
    offset_arr = jnp.asarray(
        np.asarray(offset, dtype=np.float32).reshape(dim, 1))
    K = SWEEPS_PER_BLOCK
    n_steps = ((int(n_steps) + K - 1) // K) * K
    ext = uniforms is not None
    smap = _build_sharded_call(ctx.mesh, log_prob, n_steps, local, dim,
                               float(bound), K, interpret, ext)

    if ext:
        u = jnp.asarray(uniforms, dtype=jnp.float32)
        expected = (2 * dim + 2, n_steps * n_chains)
        if u.shape != expected:
            raise ValueError(
                f"uniforms must have shape {expected}, got {u.shape}")
        # column j*n_chains + c belongs to chain c: split by chain axis
        first = u.reshape(2 * dim + 2, n_steps, n_chains)
    else:
        first = jnp.asarray([seed], dtype=jnp.int32)
    # NOTE the sweep-major merge reshards the (steps, chains) block across
    # devices -- same contract (and cost) as the standalone scan path,
    # whose burn-in trimming slices leading sweeps; the FUSED chain path
    # is the zero-communication chain-major one (sampler.metropolis_chain
    # chain_major docstring).
    samples, final_states, n_acc = smap(first, init_states, offset_arr)
    return (samples.reshape(n_steps * n_chains, dim), final_states,
            int(n_acc[0]))


@functools.lru_cache(maxsize=64)
def _build_sharded_call(mesh, log_prob, n_steps, local, dim, bound, K,
                        interpret, ext):
    """Cache the shard_map wrapper per static configuration: a fresh
    closure per invocation would defeat jax's callable-identity dispatch
    cache and re-trace the sharded Pallas program every sample() call
    (same rationale as _build_call)."""
    from jax.sharding import PartitionSpec as P

    n_blocks = n_steps // K
    call = _build_call(log_prob, n_steps, local, dim, bound, K,
                       interpret, ext)

    def body(first_l, init_l, off_l):
        if ext:
            u_l = first_l.reshape(2 * dim + 2, n_steps * local)
            s, f, acc = call(u_l, init_l.T, off_l)
        else:
            idx = jax.lax.axis_index("dp").astype(jnp.int32)
            s, f, acc = call(first_l + idx * jnp.int32(n_blocks),
                             init_l.T, off_l)
        s = s.reshape(n_steps, local, dim)
        return s, f, jax.lax.psum(acc, "dp")

    first_spec = P(None, None, "dp") if ext else P()
    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(first_spec, P("dp", None), P(None, None)),
        out_specs=(P(None, "dp", None), P("dp", None), P()),
        check_vma=False)


@functools.lru_cache(maxsize=64)
def _build_call(log_prob, n_steps, n_chains, dim, bound, K, interpret,
                external_uniforms=False):
    """Build (and cache) the jitted pallas_call for a static configuration --
    rebuilding/retracing per invocation costs ~100x the kernel runtime."""
    n_blocks = n_steps // K
    kernel = functools.partial(
        _metropolis_kernel_ext if external_uniforms else _metropolis_kernel_hw,
        log_prob=log_prob,
        n_chains=n_chains,
        dim=dim,
        bound=bound,
        sweeps_per_block=K,
    )
    if external_uniforms:
        first_spec = pl.BlockSpec((2 * dim + 2, K * n_chains),
                                  lambda b: (0, b), memory_space=pltpu.VMEM)
    else:
        first_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    call = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        out_shape=(
            jax.ShapeDtypeStruct((dim, n_steps * n_chains), jnp.float32),
            jax.ShapeDtypeStruct((dim, n_chains), jnp.float32),
            jax.ShapeDtypeStruct((1,), jnp.float32),
        ),
        in_specs=[
            first_spec,
            pl.BlockSpec((dim, n_chains), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dim, 1), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((dim, K * n_chains), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dim, n_chains), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((dim, n_chains), jnp.float32),   # chain states
            pltpu.VMEM((1, n_chains), jnp.float32),     # chain logp
            pltpu.VMEM((1, n_chains), jnp.float32),     # acceptance counts
        ],
        # TPU interpret mode: emulates the Mosaic memory/grid semantics on
        # CPU (the hardware PRNG stays TPU-only -- use external uniforms)
        interpret=pltpu.InterpretParams() if interpret else False,
    )

    @jax.jit
    def run(first, init_t, offset_arr):
        samples_t, final_t, n_acc = call(first, init_t, offset_arr)
        return samples_t.T, final_t.T, n_acc

    return run


def cos_bump_log_prob(x, offset):
    """The paper's cosine-bump latent target for in-kernel use
    (sampler.py:20-22). x: (dim, chains); offset: (dim, 1) -> (1, chains)."""
    r = jnp.minimum(
        1.0, 4.0 * jnp.sqrt(jnp.sum((x - offset) ** 2, axis=0,
                                    keepdims=True))
    )
    return jnp.log(0.5 * (1.0 + jnp.cos(np.pi * r)))

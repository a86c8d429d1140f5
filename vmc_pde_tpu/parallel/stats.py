"""Global sample statistics, TPU-native.

Replaces the reference's mpi_wrapper.py global_mean / global_variance /
global_covariance (mpi_wrapper.py:129-274). The reference pattern is
"psum over the local pmap axis -> host transfer -> MPI.Allreduce -> device
put"; here every statistic is an ordinary jnp reduction over a sample axis
that is sharded over the mesh, so XLA lowers it to on-fabric collectives
inside the enclosing jit. Under `shard_map` the same functions work with an
explicit axis name.

Conventions (matching the reference semantics):
- ``mean``/``variance`` reduce over leading sample axis (axis 0).
- ``second_moment_matrix(X) = E[X^T X]`` -- what mpi_wrapper.global_covariance
  actually computes (mpi_wrapper.py:21-25, 248-274): mean of per-sample outer
  products, *without* mean subtraction. The TDVP core feeds it pre-centered
  data, making it a covariance.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# On TPU, f32 matmuls lower to MXU bf16 passes; DEFAULT precision is a
# single pass (~bf16 mantissa), which is far too coarse for a Gram matrix
# whose eigenvalue spectrum spans many orders of magnitude. HIGHEST forces
# the 6-pass f32-equivalent contraction; HIGH (3-pass) halves the Gram cost
# at ~2x the rounding noise.
GRAM_PRECISION = jax.lax.Precision.HIGHEST

PRECISIONS = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
    # "f64": cast the (already f32-rounded) per-sample gradients to f64 and
    # contract in true float64 (emulated on TPU, ~an order of magnitude
    # slower and 2x the operand HBM). The statistics S, F then agree to f64
    # rounding and -- with an f64 solve -- the solver residual reaches the
    # reference's 1e-12 grade ON DEVICE even though the compute path is
    # f32 (the residual measures S/F/solve consistency, which all derive
    # from the same f32 O). BASELINE.md "matched solver tolerances" item.
    # CAVEAT (round 4, measured at d=32/P=9264): this image's libtpu
    # lowers the f64 dot through a custom call that materializes an
    # 8-way split of the full operand (f32[8, N, P] -- OOM at the
    # flagship shape) and faults the TPU worker at runtime even when it
    # fits; the mode is validated at d=8 scale only. Use "f64acc" at
    # flagship scale.
    "f64": jax.lax.Precision.HIGHEST,
    # "f64acc": f32/HIGH per-chunk contraction with EXACT f64
    # accumulation across chunks (chunked statistics path only). No f64
    # matmul emulation is ever emitted: the per-chunk Gram stays the
    # 3-pass-equivalent f32 class (sym2/tri2/int8 split backends
    # compose), and only the O(P^2)-per-chunk carry addition runs in
    # f64 -- removing the f32 partial-sum rounding across the FULL
    # sample budget (the dominant statistics error at N ~ 10^6) at
    # roughly zero MXU cost.
    "f64acc": jax.lax.Precision.HIGH,
}

# operand dtype override per gram_precision mode (None = keep compute dtype)
GRAM_OPERAND_DTYPE = {"f64": jnp.float64}

# accumulator (scan-carry) dtype override for the chunked statistics path
GRAM_ACC_DTYPE = {"f64": jnp.float64, "f64acc": jnp.float64}


def mean(data, axis=0):
    """E[X] over the (sharded) sample axis. (mpi_wrapper.py:166-193)"""
    return jnp.mean(data, axis=axis)


def variance(data, axis=0):
    """E[|X - E X|^2] over the sample axis (biased, like the reference:
    mpi_wrapper.py:196-245)."""
    m = jnp.mean(data, axis=axis, keepdims=True)
    d = data - m
    return jnp.mean(jnp.real(jnp.conj(d) * d), axis=axis)


def second_moment_matrix(data, preferred_dtype=jnp.float32,
                         precision=None):
    """E[X^T X] for data of shape (N, P): the Gram accumulation.

    This is the single large contraction of the TDVP step; on TPU it is an
    MXU matmul contracting the sample axis. When the sample axis is sharded
    over ``dp`` (and optionally P over ``tp``), XLA emits a reduce-scatter /
    all-reduce over ICI -- the TPU-native replacement for the reference's
    host Allreduce of the N_params^2 message (mpi_wrapper.py:150-163)."""
    n = data.shape[0]
    return jnp.matmul(
        data.T.conj(), data, preferred_element_type=preferred_dtype,
        precision=precision or GRAM_PRECISION,
    ) / n


def weighted_second_moment_matrix(data, w, preferred_dtype=jnp.float32,
                                  precision=None):
    """E[w_i X_i X_i^T] with per-sample weights w of shape (N,)."""
    n = data.shape[0]
    wd = data * w[:, None]
    return jnp.matmul(
        data.T.conj(), wd, preferred_element_type=preferred_dtype,
        precision=precision or GRAM_PRECISION,
    ) / n


def _split_bf16(x):
    """Exact f32 = hi + lo bf16 operand decomposition (the HIGH-precision
    emulation's split). The optimization_barrier pins the split under
    --xla_allow_excess_precision, which otherwise folds lo to zero
    (kernels/syrk.py:54-65)."""
    hi = jax.lax.optimization_barrier(x.astype(jnp.bfloat16))
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


# Exact-int32-accumulation bound for the int8 cross term: with |q| <= 127
# the worst-case partial sum over the contraction axis is N * 127^2, which
# must stay below 2^31 - 1 => N <= 133152; rounded down to the power-of-two
# friendly 131072 (131072 * 127^2 = 2.114e9 < 2.147e9). Beyond this the
# int8 request silently falls back to the bf16 pass (shapes are static
# under jit, so the branch is trace-time).
_INT8_CROSS_N_MAX = 131072


def _quant_cols_int8(x, amax=None):
    """Per-column symmetric int8 quantization: x == scale * q + err with
    |err| <~ scale/2 elementwise, scale = colmax(|x|)/127 (1.0 for zero
    columns). The rounding multiplies by the reciprocal scale -- a
    per-element f32 DIVIDE is ~10x slower on the TPU VPU and showed up
    as ~2.5% of the headline RHS in the device trace. |x| * inv <= 127
    up to f32 rounding of inv; the clip guards that ulp. ``amax``: the
    column max |x|, precomputed (the split kernel grid-accumulates it,
    saving a lane-axis max-reduce over the full operand per call)."""
    xf = x.astype(jnp.float32)
    if amax is None:
        amax = jnp.max(jnp.abs(xf), axis=0)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    inv = jnp.where(amax > 0, 127.0 / amax, 0.0)
    q = jnp.clip(jnp.round(xf * inv[None, :]), -127, 127).astype(jnp.int8)
    return q, scale


def _cross_sum(a, b, int8=False, amax=None):
    """The hi/lo cross term a^T @ b -> f32 (the full-pass, unsymmetric term
    of the 2-pass Gram split).

    Default: one bf16 MXU pass. ``int8=True`` requests the int8 MXU path
    (2x the bf16 rate on TPU): per-column scales factor EXACTLY out of the
    contraction -- a[:, p] = s_p a8[:, p], b[:, q] = t_q b8[:, q] gives
    a^T b = diag(s) (a8^T b8) diag(t) -- and the cross term is itself a
    ~2^-8-relative correction to the hi@hi term, so its int8 quantization
    error (~2^-15 of the Gram scale, measured 8.4e-7 vs the 2.8e-6 dropped
    lo@lo term at the headline shape; scripts/bench_int8.py) sits below
    the numerics class the split already accepts. Falls back to bf16 when
    exact int32 accumulation is not guaranteed (N > _INT8_CROSS_N_MAX).
    ``amax``: optional (colmax|a|, colmax|b|) pair, precomputed by the
    split kernel (skips two full-operand max-reduces)."""
    if int8 and a.shape[0] <= _INT8_CROSS_N_MAX:
        a8, sa = _quant_cols_int8(a, None if amax is None else amax[0])
        b8, sb = _quant_cols_int8(b, None if amax is None else amax[1])
        m = jax.lax.dot_general(a8, b8, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return m.astype(jnp.float32) * sa[:, None] * sb[None, :]
    return jnp.matmul(a.T, b, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.DEFAULT)


def sym2_gram_sum(data, w=None, cross_int8=False):
    """UNNORMALIZED symmetric Gram X^T diag(w) X (shape (N, P) -> (P, P),
    ``w`` None or any-signed) in TWO bf16 MXU passes instead of XLA
    HIGH's three.

    HIGH emulates the f32 matmul A@B as Ah@Bh + Ah@Bl + Al@Bh (hi/lo bf16
    splits, lo@lo dropped). For the symmetric Gram the operands coincide,
    so the third pass is the transpose of the second:

        X^T X ~= H^T H + H^T L + (H^T L)^T,

    i.e. the same three terms HIGH sums, from only two MXU passes -- a
    1.5x FLOP reduction on the dominant contraction of the TDVP step at
    identical numerics class (same dropped term, same per-pass rounding).
    Weights fold in as X <- sqrt(|w|) X with the SIGN applied to one
    side's hi-split only: with S = diag(sign w), Hs = S H is exact in
    bf16 (a sign flip touches no mantissa bits), and

        X^T diag(w) X ~= Hs^T H + Hs^T L + (Hs^T L)^T

    since (Hs^T L)^T = L^T S H -- the operand symmetry survives signed
    weights (used by the chunked path's sum_EOO moment, whose weight is
    the centered Eloc). f32 data only. Sharding-transparent: both matmuls
    are ordinary dot_generals, so the dp-sharded sample contraction still
    lowers to on-fabric collectives under the enclosing jit.
    ``cross_int8`` runs the cross pass on the int8 MXU (see _cross_sum)."""
    x = data.astype(jnp.float32)
    if w is not None:
        wf = w.astype(jnp.float32)
        x = x * jnp.sqrt(jnp.abs(wf))[:, None]
    hi, lo = _split_bf16(x)
    hs = hi if w is None else hi * jnp.sign(wf)[:, None]
    m1 = jnp.matmul(hs.T, hi, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT)
    m2 = _cross_sum(hs, lo, int8=cross_int8)
    return m1 + m2 + m2.T


# ---------------------------------------------------------------------------
# Pre-split (hi, lo) pair consumers: the fused per-sample Pallas kernel can
# emit the bf16 hi/lo operand split of its (pilot-shifted) O matrix directly
# (kernels/persample.py emit_split), skipping the per-chunk f32 O read +
# split write the sym2/tri2 backends otherwise pay. Pair arrays are
# (N, P) bf16 with hi + lo == O_shifted up to the dropped sub-lo residual
# (~2^-16 relative -- the same term the 2-pass Gram class already drops).
# ---------------------------------------------------------------------------

def pair_to_f32(pair):
    """Reconstruct the f32 operand from the (hi, lo) pair (used by the
    weighted Gram moments, whose sqrt(w) scaling must precede the split)."""
    hi, lo = pair
    return hi.astype(jnp.float32) + lo.astype(jnp.float32)


def pair_colsum(pair):
    """sum over the sample axis, f32 accumulation (== jnp.sum(O, 0) up to
    the dropped sub-lo residual)."""
    hi, lo = pair
    return (jnp.sum(hi.astype(jnp.float32), axis=0)
            + jnp.sum(lo.astype(jnp.float32), axis=0))


def pair_vecmat(v, pair):
    """v @ (hi + lo) at HIGH-equivalent numerics WITHOUT reconstructing the
    f32 operand: HIGH's three terms for v @ O are

        v_hi @ O_hi + v_hi @ O_lo + v_lo @ O_hi,

    and the two O_hi terms share one MXU pass by stacking [v_hi, v_lo] into
    a (2, N) left operand -- so the big operand is read exactly once per
    side (hi, lo), the same HBM bytes as the fused 3-pass HIGH matvec on
    the f32 O."""
    vf = v.astype(jnp.float32)
    v_hi, v_lo = _split_bf16(vf)
    hi, lo = pair
    r = jnp.matmul(jnp.stack([v_hi, v_lo]), hi,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.DEFAULT)
    r2 = jnp.matmul(v_hi[None, :], lo,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT)
    return r[0] + r[1] + r2[0]


def cross_from_q8(q8_a_pn, q8_b_pn, sa, sb):
    """The hi/lo cross term from PRE-QUANTIZED (P, n) operands (the
    kernels/quant8.py fused quantize+force pass): int8 MXU dot
    contracting the sample axis, de-scaled in f32. Same math as
    _cross_sum's int8 path with the quantization hoisted out."""
    m = jax.lax.dot_general(q8_a_pn, q8_b_pn, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.int32)
    return m.astype(jnp.float32) * sa[:, None] * sb[None, :]


def sym2_gram_sum_pair(pair, cross_int8=False, amax=None, m2=None):
    """Unweighted sym2_gram_sum from the pre-split pair: the two MXU passes
    read hi/lo straight from the kernel's output, no split production.
    ``amax``: optional (colmax|hi| bound, colmax|lo| bound) pair for the
    int8 cross quantization (derived from the kernel's omax output).
    ``m2``: optional precomputed cross term (cross_from_q8)."""
    hi, lo = pair
    m1 = jnp.matmul(hi.T, hi, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT)
    if m2 is None:
        m2 = _cross_sum(hi, lo, int8=cross_int8, amax=amax)
    return m1 + m2 + m2.T


def tri2_gram_sum_raw_pair(pair, bounds, cross_int8=False, amax=None,
                           m2=None):
    """Unweighted tri2_gram_sum_raw from the pre-split pair (same raw
    {"t", "m2"} parts, mirrored by tri2_gram_finalize after accumulation).
    ``amax``: optional (colmax|hi| bound, colmax|lo| bound) pair; ``m2``:
    optional precomputed cross term (cross_from_q8)."""
    hi, lo = pair
    return _tri2_from_split(hi, hi, lo, bounds, cross_int8=cross_int8,
                            amax=amax, m2=m2)


def sym2_outer_sum(data):
    """UNNORMALIZED symmetric OUTER Gram X X^T (shape (N, P) -> (N, N)) in
    two bf16 MXU passes -- sym2_gram_sum's trick in the kernel-space
    orientation used by minSR's T = Obar Obar^T assembly:

        X X^T ~= H H^T + H L^T + (H L^T)^T

    (same three hi/lo terms XLA HIGH sums in three passes, same dropped
    lo@lo). f32 data only."""
    x = data.astype(jnp.float32)
    hi, lo = _split_bf16(x)
    m1 = jnp.matmul(hi, hi.T, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT)
    m2 = jnp.matmul(hi, lo.T, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT)
    return m1 + m2 + m2.T


def tri2_bounds(P, target_block=512):
    """Panel boundaries for the triangle-blocked Gram: MXU-ALIGNED column
    panels of exactly ``target_block`` with the remainder MERGED into the
    last panel (K = max(1, P // target_block)). Returned as a static tuple
    (b_0=0, ..., b_K=P) so every slice below is shape-static under jit.

    Round-5 panel-width experiment (scripts/bench_tri2_panel512.py,
    results/bench_panel512_r5.txt, N=2M / chunk 65536 / P=9264 / int8
    cross / jet quad, two sessions): exact 512-wide panels with the
    48-wide remainder merged into a 560-wide last panel (K=18) measure
    2732-2734 ms/RHS vs the previous near-equal 487/488-wide K=19
    default's 2760-2788 -- +1.0-1.9%, 767,587 samples/s/chip at the N=2M
    operating point. The gain needs BOTH alignment and no-sliver: exact
    512s with a SEPARATE 48-wide remainder strip (K=19) measure at the
    old default, wider aligned panels lose (768: ~753k, 1024: ~747k),
    matching the earlier near-equal K sweep where K=16 (579-wide) lost
    to K=19 (results/bench_tri2k_int8_r4.txt: 751.5k/759.3k/753.1k at
    K=16/19/24). History of the near-equal scheme: ~480-wide panels were
    the measured knee of rounds 3-4 (results/bench_tri2k_r3c.txt,
    bench_splitk*_r3d.txt)."""
    K = max(1, P // target_block)
    return tuple([i * target_block for i in range(K)] + [P])


def tri2_gram_sum_raw(data, w=None, bounds=None, cross_int8=False):
    """Triangle-blocked 2-pass symmetric Gram: the UNNORMALIZED
    X^T diag(w) X split into raw parts {"t", "m2"} that an accumulation
    loop can sum across chunks and mirror ONCE at the end
    (``tri2_gram_finalize``), instead of paying the full-matrix transpose
    per chunk.

    sym2_gram_sum computes H^T H + H^T L + (H^T L)^T -- two FULL (N, P) x
    (N, P) MXU passes. The first term is symmetric, so only its lower
    block-triangle is needed: with K column panels, row-block i of
    H^T H costs one (N, p_i) x (N, b_{i+1}) matmul, and the triangle
    totals (1 + 1/K)/2 of a full pass. The cross term H^T L has no
    symmetry (both m2_ij and m2_ji feed S_ij = m1_ij + m2_ij + m2_ji^T)
    and stays one full pass. Total MXU work: (1.5 + 0.5/K) NP^2 MACs vs
    sym2's 2 NP^2 -- a ~23% cut at K=8 -- at the identical numerics class
    (same three hi/lo terms, same dropped lo@lo).

    Signed weights ride exactly as in sym2: X <- sqrt(|w|) X with the
    sign folded into the LEFT operand's hi-split (exact in bf16), so
    m1_ii = (S H_i)^T H_i = H_i^T S H_i stays symmetric and the triangle
    reconstruction remains valid.

    Single-device only by policy (TDVP gates it): the K+1 dot_generals
    would each all-reduce separately on a dp mesh, ~2x the Gram's
    collective bytes vs sym2's one assembled matrix."""
    x = data.astype(jnp.float32)
    if w is not None:
        wf = w.astype(jnp.float32)
        x = x * jnp.sqrt(jnp.abs(wf))[:, None]
    hi, lo = _split_bf16(x)
    hs = hi if w is None else hi * jnp.sign(wf)[:, None]
    if bounds is None:
        bounds = tri2_bounds(x.shape[1])
    return _tri2_from_split(hs, hi, lo, bounds, cross_int8=cross_int8)


def _tri2_from_split(hs, hi, lo, bounds, cross_int8=False, amax=None,
                     m2=None):
    """tri2 raw parts from an already-split (hs, hi, lo) operand triple.

    The triangle strips stay UNPADDED, as a tuple pytree: a chunked
    accumulation then adds K small (p_i, b_{i+1}) blocks per chunk
    instead of materializing a zero-padded (P, P) matrix per chunk (the
    pad+concatenate showed up as ~1.5% of the headline RHS in the device
    trace); ``tri2_gram_finalize`` pads and assembles ONCE at the end."""
    if m2 is None:
        m2 = _cross_sum(hs, lo, int8=cross_int8, amax=amax)
    strips = []
    for i in range(len(bounds) - 1):
        lo_b, hi_b = bounds[i], bounds[i + 1]
        strips.append(jnp.matmul(hs[:, lo_b:hi_b].T, hi[:, :hi_b],
                                 preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.DEFAULT))
    return {"t": tuple(strips), "m2": m2}


def tri2_gram_finalize(raw, bounds):
    """Mirror the accumulated triangle parts into the full symmetric Gram:
    S = M1 + m2 + m2^T with M1 = T + T^T - sym(block-diag T) (the diagonal
    panels appear in both T and T^T; they are symmetric up to per-element
    reduction order, so the symmetrized copy is subtracted once). ``t`` is
    the unpadded strip tuple from _tri2_from_split; padded and assembled
    here, once per statistics evaluation."""
    m2 = raw["m2"]
    P = m2.shape[0]
    T = jnp.concatenate(
        [s if s.shape[1] == P else jnp.pad(s, ((0, 0), (0, P - s.shape[1])))
         for s in raw["t"]], axis=0)
    idx = jnp.searchsorted(jnp.asarray(bounds[1:-1]), jnp.arange(P),
                           side="right")
    dmask = idx[:, None] == idx[None, :]
    D = jnp.where(dmask, T, 0.0)
    M1 = T + T.T - 0.5 * (D + D.T)
    return M1 + m2 + m2.T


def covariance_matrix(data, preferred_dtype=jnp.float32):
    """True covariance E[(X-m)^T (X-m)] in one pass (centering fused)."""
    m = jnp.mean(data, axis=0, keepdims=True)
    return second_moment_matrix(data - m, preferred_dtype=preferred_dtype)

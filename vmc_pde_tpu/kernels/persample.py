"""Fused per-sample statistics Pallas kernel: logp, coordinate score,
Hessian quadratic trace, and the O-matrix row for a tile of samples in ONE
TPU kernel.

The XLA per-sample pipeline (score.value_score_and_param_grad +
score.quad_trace, vmapped; SURVEY.md section 7 Pallas item (1)) is
memory/latency-bound, not FLOP-bound: the flagship d=32 flow's conditioner
matmuls are 16-wide slivers, and XLA materializes every activation,
tangent, and cotangent of the ~70 tiny ops in HBM between fusions. This
kernel runs the whole per-sample computation -- forward flow,
parameter/coordinate backward, and the forward-over-forward Hessian
trace -- on a VMEM-resident tile of m samples, so the only HBM traffic is
the x tile in and the (P, m) O tile out.

LAYOUT IS THE WHOLE GAME: every per-sample array inside the kernel is
FEATURE-MAJOR, shape (features, m), so the SAMPLES fill the 128-wide lane
dimension. In the natural (m, features) orientation each 16-wide
activation uses 16 of 128 lanes -- an 8x tax on every VPU op and on VMEM
footprint that a tile sweep measured as a flat 27 ms plateau; transposed,
the same ops run full-lane and the weight-gradient slabs land directly in
the (P, m) O tile. The wrapper feeds x transposed and returns ``O_T.T``
-- a logical transpose XLA folds into the consuming dot_generals for
free.

Mosaic lowering constraints that shaped the rest (each was a measured
compile failure, see git history):

- Parameter leaves enter as separate natural-shape INPUTS (flat-theta
  unraveling in-kernel needs (P,) -> (in, out) shape casts Mosaic
  rejects; ravel_pytree's unravel also emits a zero-size split for the
  Gauss latent's empty ``dist_params``). The latent packed-Cholesky
  vector is pre-scattered to a (d, d) matrix OUTSIDE the kernel.
- The theta-backward is HAND-WRITTEN, tile-batched, all 2-D: reverse-mode
  AD of per-sample parameter gradients emits batched outer products
  (dot_general with empty contracting dims) and 3-D cotangents, neither
  of which Mosaic lowers. Each weight slab is built by _outer_rows --
  sublane repeat/tile relayouts, exact and matmul-free. The coordinate
  score g falls out of the same backward sweep for free.
- The Hessian quadratic trace is HAND-WRITTEN second-order jet
  propagation (_tile_quad_jet, the default): one (d, m) primal pass
  shared by all k directions, with the k first/second-derivative tangent
  pairs lane-folded into (d, k*m) batches -- each transcendental is
  evaluated once per SAMPLE instead of once per direction-replicated
  lane, and the tangent matmuls halve the jvp-of-jvp pass count. The
  pure-forward jvp^2 fallback (quad_impl="jvp", directions folded into
  the lane axis) is kept as the AD reference the jets are pinned
  against.
- The latent Mahalanobis triangular solve becomes multiplication by the
  EXACT inverse factor: U = D(I - B) with B nilpotent, so
  U^{-1} = (sum_{k<dim} B^k) D^{-1}, summed in log2(dim) doubling steps.
- Static coordinate split/merge (coupling.py's ``x[ind_up]`` gathers and
  inverse-perm regather) are matmuls with static 0/1 selection matrices,
  passed as kernel inputs (Mosaic cannot materialize captured array
  constants). The selection matmuls run through the 2-pass hi/lo split
  (``_mm_split``, ~2^-16 relative -- the in-kernel ~Precision.HIGH
  stand-in); only the dense latent factor W stays HIGHEST.
- Index-map int literals are i32 (under x64 a literal 0 traces as i64
  and the mixed return fails 'func.return' legalization); the scoped
  VMEM limit is raised via CompilerParams (the 16 MB default is a
  compiler flag, not the chip's physical VMEM).

Numerics: identical math to flow.log_prob at f32 (conditioner matmuls
keep the XLA path's DEFAULT precision); tests pin logp/g/quad/O against
the XLA pipeline, and the hand fwd/bwd -- plain jnp functions usable
OUTSIDE Pallas -- against jax.grad directly on every coupling variant.

Scope (checked by ``supports``): Gauss and Student-t latents, any
coupling variant incl. the learned global affine, trace-mode Hessians
(the block path stays XLA). Student-t's two ``gammaln``/``digamma``
scalars are NOT Mosaic-supported transcendentals, but they depend only on
nu -- not on the sample -- so ``student_t_consts`` evaluates them OUTSIDE
the kernel (plain XLA on the traced theta) and passes [nu, c0, dg] in as
a 3-vector input; in-kernel the latent tail is one log1p and the backward
scales every quad-derived gradient by the per-sample s = (nu+d)/(nu+q).
Unsupported configs (cos_dist latent, block-mode Hessians) stay on the
XLA pipeline.

Reference counterpart: the per-sample pmap(vmap(...)) closures of
var_state.py:29-34; this is their TPU-resident fusion.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# sample-tile width (lane axis): 256 keeps the (P, m) O tile at ~9.5 MB
# for the flagship P=9264 under the raised VMEM limit
DEFAULT_TILE = 256

_HI = jax.lax.Precision.HIGHEST


def _mm(a, b, precision=None):
    """a @ b (2-D)."""
    return jnp.matmul(a, b, precision=precision)


def _mm_split(a, b):
    """a @ b for an exactly-bf16-representable a (0/1 selections) via two
    DEFAULT (1-pass bf16) matmuls on a hi/lo split of b: ~2^-16 relative,
    at 1/3 the passes of HIGHEST. Mosaic lowers only DEFAULT and HIGHEST,
    so this is the in-kernel stand-in for Precision.HIGH; used in the
    Hessian-quad primal where 6-pass selections dominated the cost. The
    jvp splits tangents the same way (convert_element_type's tangent is a
    convert), so forward-mode derivatives keep the same accuracy."""
    b_hi = b.astype(jnp.bfloat16).astype(b.dtype)
    return _mm(a, b_hi) + _mm(a, b - b_hi)


def _mm_tn_split(a, b):
    """a.T @ b, split like _mm_split."""
    b_hi = b.astype(jnp.bfloat16).astype(b.dtype)
    return _mm_tn(a, b_hi) + _mm_tn(a, b - b_hi)


def _mm_tn(a, b, precision=None):
    """a.T @ b without a transpose op (dot_general on both dim 0)."""
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               precision=precision)


def _selection_matrix(idx, dim, dtype=jnp.float32):
    """Static (k, dim) 0/1 matrix S with S @ z == z[idx] columns."""
    m = np.zeros((len(idx), dim), dtype=np.float32)
    m[np.arange(len(idx)), np.asarray(idx)] = 1.0
    return jnp.asarray(m, dtype)


def _packed_pair_matrices(dim, dtype=jnp.float32):
    """Static (n_off, dim) 0/1 selection pair (Ri, Rj) with
    Ri[k, iu0[k]] = Rj[k, iu1[k]] = 1 for the k-th strictly-upper entry
    (np.triu_indices(dim, 1) order): the packed-L gradient slab is
    (Ri @ wty) * (Rj @ ylat) -- two (n_off, d) sliver matmuls instead of
    materializing the full (d*d, m) outer product and selecting with a
    (n_off, d*d) matmul (16x the FLOPs at d=32)."""
    iu = np.triu_indices(dim, k=1)
    n_off = len(iu[0])
    Ri = np.zeros((n_off, dim), dtype=np.float32)
    Rj = np.zeros((n_off, dim), dtype=np.float32)
    Ri[np.arange(n_off), iu[0]] = 1.0
    Rj[np.arange(n_off), iu[1]] = 1.0
    return jnp.asarray(Ri, dtype), jnp.asarray(Rj, dtype)


def _outer_rows(h, abar):
    """Row-major per-sample outer product in feature-major layout:
    rows[i*out+o, s] = h[i, s] * abar[o, s], shape (in*out, m). Built
    from pure sublane relayouts -- repeat h's rows out times and tile
    abar in times -- which are EXACT (no matmul rounding) and free of
    the batched outer-product dot_general Mosaic rejects."""
    out_dim = abar.shape[0]
    in_dim = h.shape[0]
    h_rep = jnp.repeat(h, out_dim, axis=0)
    a_rep = (abar if in_dim == 1
             else jnp.concatenate([abar] * in_dim, axis=0))
    return h_rep * a_rep


def flow_consts(flow, dtype=jnp.float32):
    """Static kernel inputs, as a flat tuple (Pallas forbids captured
    array constants in kernel bodies): per-block (Su, Sd) selection
    matrices, the latent offset, and the packed-Cholesky (row, col)
    selection pair."""
    out = []
    for spec in flow.blocks:
        out.append(_selection_matrix(spec.ind_up, flow.dim, dtype))
        out.append(_selection_matrix(spec.ind_down, flow.dim, dtype))
    out.append(jnp.asarray(flow.offset_array, dtype))
    out.extend(_packed_pair_matrices(flow.dim, dtype))
    return tuple(out)


def split_consts(flow, consts):
    """(sel pairs, offset, (Ri, Rj)) from the flow_consts tuple."""
    B = len(flow.blocks)
    sel = [(consts[2 * i], consts[2 * i + 1]) for i in range(B)]
    off = consts[2 * B]
    lsel = (consts[2 * B + 1], consts[2 * B + 2])
    return sel, off, lsel


def student_t_consts(flow, params, dtype=jnp.float32):
    """The Student-t scalars the kernel cannot compute (gammaln/digamma
    are not Mosaic transcendentals) but that depend only on theta, not on
    the sample: [nu, c0, dg] with

      nu = exp(dist_params[0]) + 1                    (latent.nu_value)
      c0 = lgam((nu+d)/2) - lgam(nu/2) - (d/2) log(nu pi)
      dg = (psi((nu+d)/2) - psi(nu/2)) / 2 - d / (2 nu)

    so in-kernel logp = c0 - sum(L_diag) - (nu+d)/2 log1p(q/nu) + logjac
    and dlogp/dnu_raw = (nu-1) (dg - log1p(q/nu)/2 + s q/(2 nu)),
    s = (nu+d)/(nu+q). Evaluated OUTSIDE the kernel (plain XLA, traced).
    """
    from jax.scipy.special import digamma, gammaln

    d = flow.dim
    nu = jnp.exp(params["latent"]["dist_params"][0]) + 1.0
    half = 0.5 * (nu + d)
    c0 = gammaln(half) - gammaln(0.5 * nu) - 0.5 * d * jnp.log(nu * jnp.pi)
    dg = 0.5 * (digamma(half) - digamma(0.5 * nu)) - 0.5 * d / nu
    return jnp.stack([nu, c0, dg]).astype(dtype)


def _block_diag(a, b):
    za = jnp.zeros((a.shape[0], b.shape[1]), a.dtype)
    zb = jnp.zeros((b.shape[0], a.shape[1]), b.dtype)
    return jnp.concatenate([jnp.concatenate([a, za], 1),
                            jnp.concatenate([zb, b], 1)], 0)


def _fuse_pair(ps, pt):
    """Fuse the (s, t) conditioner pair of an affine block into ONE
    concatenated MLP: both nets read the same input, so layer 0 concats
    the weights along the output axis and deeper layers go block-diagonal
    on the concatenated hidden state. At conditioner widths (<= 64) every
    fused matmul still fits one 128x128 MXU tile, so this HALVES the
    conditioner MXU passes of the affine variant for free. Built OUTSIDE
    the kernel (plain XLA on the traced params)."""
    ws = [jnp.concatenate([ps["w"][0], pt["w"][0]], axis=1)]
    ws += [_block_diag(a, b) for a, b in zip(ps["w"][1:], pt["w"][1:])]
    bs = [jnp.concatenate([a, b]) for a, b in zip(ps["b"], pt["b"])]
    return {"w": ws, "b": bs}


def kernel_param_tree(flow, params):
    """The parameter pytree the kernel consumes: the blocks as-is --
    except affine blocks, whose (s, t) conditioner pairs are pre-fused
    into concatenated/block-diagonal MLPs (_fuse_pair) -- and the latent
    with the packed strictly-upper vector L pre-scattered to a (d, d)
    matrix (the in-kernel scatter is not Mosaic-lowerable; the O-rows for
    L are assembled analytically from the factor instead). Runs OUTSIDE
    the kernel (plain XLA)."""
    d = flow.dim
    lat = params["latent"]
    uoff = jnp.zeros((d, d), lat["L"].dtype)
    uoff = uoff.at[np.triu_indices(d, k=1)].set(lat["L"])
    blocks = []
    for spec, p in zip(flow.blocks, params["blocks"]):
        if spec.variant == "affine":
            q = {k: v for k, v in p.items() if k not in
                 ("s1", "t1", "s2", "t2")}
            q["f2"] = _fuse_pair(p["s2"], p["t2"])
            q["f1"] = _fuse_pair(p["s1"], p["t1"])
            blocks.append(q)
        else:
            blocks.append(p)
    return {
        "blocks": blocks,
        "latent": {"L_diag": lat["L_diag"], "Uoff": uoff, "mu": lat["mu"]},
    }


# ---------------------------------------------------------------------------
# Hand-written tile-batched forward/backward, FEATURE-MAJOR: every
# per-sample array is (features, m) with samples on the lane axis.
# Plain jnp: testable on CPU, lowerable by Mosaic.
# ---------------------------------------------------------------------------

def _mlp_fwd(net, h, alpha):
    """Feature-major mlp.apply with saved activations for the backward.
    h: (in, m) -> (y (out, m), saves = [(h_in, tanh_a) per layer])."""
    ws, bs = net["w"], net["b"]
    saves = []
    for w, b in zip(ws[:-1], bs[:-1]):
        t = jnp.tanh(_mm_tn(w, h) + b[:, None])
        saves.append((h, t))
        h = t
    t_last = jnp.tanh(_mm_tn(ws[-1], h) + bs[-1][:, None])
    saves.append((h, t_last))
    return alpha * t_last, saves


def _mlp_plain(net, h, alpha):
    """Save-free forward (the jvp^2 quad primal)."""
    ws, bs = net["w"], net["b"]
    for w, b in zip(ws[:-1], bs[:-1]):
        h = jnp.tanh(_mm_tn(w, h) + b[:, None])
    return alpha * jnp.tanh(_mm_tn(ws[-1], h) + bs[-1][:, None])


def _mlp_bwd(net, saves, ybar, alpha):
    """Backward through _mlp_fwd. Returns (xbar (in, m), slabs) where
    slabs = {"b": [(out_l, m)...], "w": [(in_l*out_l, m)...]} -- each
    weight slab holds the row-major per-sample gradient as O-tile rows,
    built by _outer_rows relayouts."""
    ws = net["w"]
    n = len(ws)
    wslabs = [None] * n
    bslabs = [None] * n
    h_in, t = saves[-1]
    abar = ybar * (alpha * (1.0 - t * t))
    xbar = None
    for layer in range(n - 1, -1, -1):
        h_in, t = saves[layer]
        bslabs[layer] = abar
        wslabs[layer] = _outer_rows(h_in, abar)
        xbar = _mm(ws[layer], abar)
        if layer > 0:
            _, t_prev = saves[layer - 1]
            abar = xbar * (1.0 - t_prev * t_prev)
    return xbar, {"b": bslabs, "w": wslabs}


def _pair_fwd(pf, h, alpha):
    """Fused (s, t) conditioner pair forward (weights from _fuse_pair).
    h: (in, m) -> (s (out, m), t (out, m), saves). Layer 0's save keeps
    the SHARED input; deeper saves are the concatenated hidden states."""
    ws, bs = pf["w"], pf["b"]
    saves = []
    for w, b in zip(ws[:-1], bs[:-1]):
        t = jnp.tanh(_mm_tn(w, h) + b[:, None])
        saves.append((h, t))
        h = t
    t_last = jnp.tanh(_mm_tn(ws[-1], h) + bs[-1][:, None])
    saves.append((h, t_last))
    y = alpha * t_last
    half = y.shape[0] // 2
    return y[:half], y[half:], saves


def _pair_plain(pf, h, alpha):
    """Save-free fused pair forward (the jvp^2 quad primal)."""
    ws, bs = pf["w"], pf["b"]
    for w, b in zip(ws[:-1], bs[:-1]):
        h = jnp.tanh(_mm_tn(w, h) + b[:, None])
    y = alpha * jnp.tanh(_mm_tn(ws[-1], h) + bs[-1][:, None])
    half = y.shape[0] // 2
    return y[:half], y[half:]


def _pair_bwd(pf, saves, sbar, tbar, alpha):
    """Backward through _pair_fwd. Returns (xbar (in, m), slab_s, slab_t)
    where each slab is the per-net {"b": [...], "w": [...]} dict in the
    ORIGINAL (unfused) leaf shapes -- the weight-gradient relayouts
    (_outer_rows) stay per-net because the O tile is laid out per leaf;
    only the matmuls ride the fused operands. Layer 0's xbar is the SUM
    of both nets' input gradients (they share the input)."""
    ws = pf["w"]
    n = len(ws)
    ws_slab, wt_slab = [None] * n, [None] * n
    bs_slab, bt_slab = [None] * n, [None] * n
    h_in, t = saves[-1]
    out2 = t.shape[0]
    half = out2 // 2
    abar = jnp.concatenate([sbar, tbar], axis=0) * (alpha * (1.0 - t * t))
    xbar = None
    for layer in range(n - 1, -1, -1):
        h_in, t = saves[layer]
        bs_slab[layer] = abar[:half]
        bt_slab[layer] = abar[half:]
        if layer == 0:
            # shared input: one h for both nets, summed xbar
            ws_slab[layer] = _outer_rows(h_in, abar[:half])
            wt_slab[layer] = _outer_rows(h_in, abar[half:])
        else:
            hs, ht = h_in[:h_in.shape[0] // 2], h_in[h_in.shape[0] // 2:]
            ws_slab[layer] = _outer_rows(hs, abar[:half])
            wt_slab[layer] = _outer_rows(ht, abar[half:])
        xbar = _mm(ws[layer], abar)
        if layer > 0:
            _, t_prev = saves[layer - 1]
            abar = xbar * (1.0 - t_prev * t_prev)
            half = t_prev.shape[0] // 2
    return (xbar, {"b": bs_slab, "w": ws_slab},
            {"b": bt_slab, "w": wt_slab})


def _couple_f(u, s, t, es, variant):
    """Coupling half-update (elementwise; layout-agnostic)."""
    if variant == "additive":
        return u + s
    if variant == "affine":
        return u * es + t
    if variant == "scale":
        return u * es
    return u * es + s  # scale_shift


def _couple_b(vbar, u, s, es, variant):
    """Backward of _couple_f INCLUDING the log-Jacobian contribution
    (d sum(s)/ds = 1 for the scaling variants). Returns
    (sbar, tbar, ubar)."""
    if variant == "additive":
        return vbar, vbar, vbar
    if variant == "affine":
        return vbar * u * es + 1.0, vbar, vbar * es
    if variant == "scale":
        return vbar * u * es + 1.0, None, vbar * es
    return vbar * (u * es + 1.0) + 1.0, None, vbar * es  # scale_shift


def _latent_factor(lat, dim):
    """(W = U^{-1}, dvec = exp(L_diag)) from the kernel latent leaves.
    U = Uoff + diag(dvec) is upper-triangular; with B = -(strictly upper
    of D^{-1}U) nilpotent, U^{-1} = (sum_{k<dim} B^k) D^{-1}, summed by
    doubling (S <- S + B^n S, B^n <- B^n B^n): exact in log2(dim)
    matmuls, no triangular solve."""
    dvec = jnp.exp(lat["L_diag"])
    row = jax.lax.broadcasted_iota(jnp.int32, (dim, dim), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (dim, dim), 1)
    eye = (row == col).astype(dvec.dtype)
    U = lat["Uoff"] + eye * dvec[None, :]
    B = eye - U * (1.0 / dvec)[:, None]
    S = eye
    P = B
    n = 1
    while n < dim:
        S = S + _mm(P, S, _HI)
        P = _mm(P, P, _HI)
        n *= 2
    return S * (1.0 / dvec)[None, :], dvec


def _forward(kt, specs, sel, off, X, tparams=None):
    """Hand forward pass over a feature-major sample tile X (d, m).
    Returns (logp (m,), saves, saves_lat). ``tparams`` is the Student-t
    [nu, c0, dg] 3-vector (None = Gauss latent)."""
    z = X
    logjac = jnp.zeros((X.shape[1],), X.dtype)
    saves = []
    for p, spec, (Su, Sd) in zip(kt["blocks"], specs, sel):
        u1 = _mm_split(Su, z)
        u2 = _mm_split(Sd, z)
        if spec.variant == "affine":
            s2, t2, sv_s2 = _pair_fwd(p["f2"], u2, spec.alpha)
        else:
            s2, sv_s2 = _mlp_fwd(p["s2"], u2, spec.alpha)
            t2 = None
        es2 = jnp.exp(s2)
        v1 = _couple_f(u1, s2, t2, es2, spec.variant)
        if spec.variant == "affine":
            s1, t1, sv_s1 = _pair_fwd(p["f1"], v1, spec.alpha)
        else:
            s1, sv_s1 = _mlp_fwd(p["s1"], v1, spec.alpha)
            t1 = None
        es1 = jnp.exp(s1)
        v2 = _couple_f(u2, s1, t1, es1, spec.variant)
        ym = _mm_tn_split(Su, v1) + _mm_tn_split(Sd, v2)
        if spec.variant != "additive":
            logjac = logjac + jnp.sum(s1, axis=0) + jnp.sum(s2, axis=0)
        if spec.global_affine:
            z = p["g_scale"][:, None] * ym + p["g_offset"][:, None]
            logjac = logjac + spec.dim * jnp.log(p["g_scale"][0])
        else:
            z = ym
        saves.append(dict(u1=u1, u2=u2, v1=v1, s1=s1, s2=s2, es1=es1,
                          es2=es2, ym=ym, sv_s1=sv_s1, sv_s2=sv_s2))

    lat = kt["latent"]
    dim = X.shape[0]
    W, dvec = _latent_factor(lat, dim)
    zc = z - off[:, None] - lat["mu"][:, None]
    # W is a learned dense factor: a one-sided split would leave W's own
    # bf16 rounding (~2^-8) in the Mahalanobis term, so this (d, d) sliver
    # stays HIGHEST (selections are 0/1 -- exactly bf16 -- hence splittable)
    ylat = _mm(W, zc, _HI)
    quadv = jnp.sum(ylat * ylat, axis=0)
    if tparams is None:
        logp = (-0.5 * (dim * math.log(2.0 * math.pi)
                        + 2.0 * jnp.sum(lat["L_diag"]) + quadv) + logjac)
    else:
        nu, c0 = tparams[0], tparams[1]
        logp = (c0 - jnp.sum(lat["L_diag"])
                - 0.5 * (nu + dim) * jnp.log1p(quadv / nu) + logjac)
    saves_lat = dict(W=W, dvec=dvec, ylat=ylat, quadv=quadv)
    return logp, saves, saves_lat


def _backward(kt, specs, sel, saves, saves_lat, lsel, tparams=None):
    """Hand backward pass: (g = dlogp/dx (d, m), slabs dict keyed by
    normalized template path -> (leaf_size, m) per-sample O-tile rows)."""
    lat = kt["latent"]
    W, dvec, ylat = saves_lat["W"], saves_lat["dvec"], saves_lat["ylat"]
    dim = W.shape[0]
    slabs = {}

    # Latent analytics: q = ||W zc||^2, dlp/dU[i,j] = (W^T y)_i y_j,
    # dlp/dld_i = dlp/dU[i,i] e^{ld_i} - 1, dlp/dmu = W^T y, dlp/dz = -W^T y.
    # Student-t: every quad-derived term scales by the per-sample
    # s = (nu+d)/(nu+q) (dlogp/dq = -s/2 instead of the Gauss -1/2); the
    # log-det -1 and the nu-row come straight from student_t_consts' dg.
    wty = _mm_tn(W, ylat, _HI)  # (d, m); W dense -- see _forward
    quad_term = wty * ylat * dvec[:, None]
    Ri, Rj = lsel
    l_term = _mm_split(Ri, wty) * _mm_split(Rj, ylat)
    if tparams is None:
        slabs[("latent", "mu")] = wty
        slabs[("latent", "L_diag")] = quad_term - 1.0
        slabs[("latent", "L")] = l_term
        zbar = -wty
    else:
        nu, dg = tparams[0], tparams[2]
        q = saves_lat["quadv"]                      # (m,)
        s = ((nu + dim) / (nu + q))[None, :]        # (1, m)
        slabs[("latent", "mu")] = wty * s
        slabs[("latent", "L_diag")] = quad_term * s - 1.0
        slabs[("latent", "L")] = l_term * s
        slabs[("latent", "dist_params")] = (nu - 1.0) * (
            dg - 0.5 * jnp.log1p(q / nu)[None, :] + s * (q / (2.0 * nu)))
        zbar = -wty * s

    for bi in range(len(specs) - 1, -1, -1):
        p, spec, (Su, Sd), sv = kt["blocks"][bi], specs[bi], sel[bi], saves[bi]
        if spec.global_affine:
            slabs[("blocks", bi, "g_scale")] = (
                jnp.sum(sv["ym"] * zbar, axis=0, keepdims=True)
                + spec.dim / p["g_scale"][0]
            )
            slabs[("blocks", bi, "g_offset")] = zbar
            ymbar = zbar * p["g_scale"][:, None]
        else:
            ymbar = zbar
        v1bar = _mm_split(Su, ymbar)
        v2bar = _mm_split(Sd, ymbar)

        s1bar, t1bar, u2bar = _couple_b(
            v2bar, sv["u2"], sv["s1"], sv["es1"], spec.variant)
        if spec.variant == "affine":
            xb, sl_s, sl_t = _pair_bwd(p["f1"], sv["sv_s1"], s1bar, t1bar,
                                       spec.alpha)
            v1bar = v1bar + xb
            slabs[("blocks", bi, "s1")] = sl_s
            slabs[("blocks", bi, "t1")] = sl_t
        else:
            xb, sl = _mlp_bwd(p["s1"], sv["sv_s1"], s1bar, spec.alpha)
            v1bar = v1bar + xb
            slabs[("blocks", bi, "s1")] = sl

        s2bar, t2bar, u1bar = _couple_b(
            v1bar, sv["u1"], sv["s2"], sv["es2"], spec.variant)
        if spec.variant == "affine":
            xb, sl_s, sl_t = _pair_bwd(p["f2"], sv["sv_s2"], s2bar, t2bar,
                                       spec.alpha)
            u2bar = u2bar + xb
            slabs[("blocks", bi, "s2")] = sl_s
            slabs[("blocks", bi, "t2")] = sl_t
        else:
            xb, sl = _mlp_bwd(p["s2"], sv["sv_s2"], s2bar, spec.alpha)
            u2bar = u2bar + xb
            slabs[("blocks", bi, "s2")] = sl

        zbar = _mm_tn_split(Su, u1bar) + _mm_tn_split(Sd, u2bar)
    return zbar, slabs


def _tile_logp(kt, specs, sel, off, X, tparams=None):
    """Save-free feature-major primal for the jvp^2 Hessian quad
    (theta constant). X: (d, m) -> (m,)."""
    z = X
    logjac = jnp.zeros((X.shape[1],), X.dtype)
    for p, spec, (Su, Sd) in zip(kt["blocks"], specs, sel):
        u1 = _mm_split(Su, z)
        u2 = _mm_split(Sd, z)
        if spec.variant == "affine":
            s2, t2 = _pair_plain(p["f2"], u2, spec.alpha)
        else:
            s2 = _mlp_plain(p["s2"], u2, spec.alpha)
            t2 = None
        v1 = _couple_f(u1, s2, t2, jnp.exp(s2), spec.variant)
        if spec.variant == "affine":
            s1, t1 = _pair_plain(p["f1"], v1, spec.alpha)
        else:
            s1 = _mlp_plain(p["s1"], v1, spec.alpha)
            t1 = None
        v2 = _couple_f(u2, s1, t1, jnp.exp(s1), spec.variant)
        z = _mm_tn_split(Su, v1) + _mm_tn_split(Sd, v2)
        if spec.variant != "additive":
            logjac = logjac + jnp.sum(s1, axis=0) + jnp.sum(s2, axis=0)
        if spec.global_affine:
            z = p["g_scale"][:, None] * z + p["g_offset"][:, None]
            logjac = logjac + spec.dim * jnp.log(p["g_scale"][0])
    lat = kt["latent"]
    dim = X.shape[0]
    W, _ = _latent_factor(lat, dim)
    zc = z - off[:, None] - lat["mu"][:, None]
    ylat = _mm(W, zc, _HI)  # W dense -- see _forward
    quadv = jnp.sum(ylat * ylat, axis=0)
    if tparams is None:
        return (-0.5 * (dim * math.log(2.0 * math.pi)
                        + 2.0 * jnp.sum(lat["L_diag"]) + quadv) + logjac)
    nu, c0 = tparams[0], tparams[1]
    return (c0 - jnp.sum(lat["L_diag"])
            - 0.5 * (nu + dim) * jnp.log1p(quadv / nu) + logjac)


def _fold_dirs(dirs, k_dirs: int, d: int, m: int):
    """(k, d) directions -> the (d, k*m) lane-folded tangent layout:
    lane block j (columns [j*m, (j+1)*m)) carries direction j broadcast
    over the m samples. Shared by both quad implementations so their
    direction-block ordering cannot drift apart."""
    return jnp.concatenate(
        [jnp.broadcast_to(dirs[j:j + 1, :].T, (d, m))
         for j in range(k_dirs)], axis=1)


def _sum_dir_blocks(vals, k_dirs: int, m: int):
    """Sum a (k*m,) lane-folded per-direction vector over its k blocks
    (the inverse of _fold_dirs' layout) -> (m,)."""
    out = vals[0:m]
    for j in range(1, k_dirs):
        out = out + vals[j * m:(j + 1) * m]
    return out


def _tile_quad(kt, specs, sel, off, X, dirs, k_dirs: int, tparams=None):
    """sum_j v_j^T H v_j per sample via ONE forward-over-forward jvp pass
    with the k directions folded into the sample (lane) axis: repeat the
    tile k times, give lane block j the tangent v_j, sum the blocks.
    Pure forward-mode -- no AD transposes for Mosaic to choke on.
    X: (d, m), dirs: (k, d) -> (m,)."""
    m = X.shape[1]
    x_rep = jnp.concatenate([X] * k_dirs, axis=1)
    v_rep = _fold_dirs(dirs, k_dirs, X.shape[0], m)

    def f(xv):
        return _tile_logp(kt, specs, sel, off, xv, tparams)

    def inner(y):
        return jax.jvp(f, (y,), (v_rep,))[1]

    q_all = jax.jvp(inner, (x_rep,), (v_rep,))[1]  # (k*m,)
    return _sum_dir_blocks(q_all, k_dirs, m)


def _tile_quad_jet(kt, specs, sel, off, X, dirs, k_dirs: int, tparams=None):
    """sum_j v_j^T H v_j per sample via hand-written SECOND-ORDER JETS:
    one (d, m) primal pass shared by ALL k directions, with the k
    first/second-derivative tangent pairs riding a lane-folded (d, k*m)
    batch.

    _tile_quad's jvp-of-jvp on the direction-replicated tile re-evaluates
    the primal -- and every tanh -- once PER DIRECTION: ~4 passes x k*m
    lanes of matmul and ~k*m transcendentals per layer. Propagating
    (value, f', f'') jets of t -> logp(x + t v_j) instead costs one m-lane
    primal plus two k*m-lane tangent matmuls per linear op (~2x fewer MXU
    columns at k=16) and evaluates each transcendental ONCE per sample
    (tanh/exp on m lanes; the tangent rules are pure VPU multiplies) --
    k x fewer transcendentals, which is what the per-sample stage is
    bound by (BENCHMARKS.md round-4 stage profile: 4.3x its HBM floor,
    VPU-bound).

    Jet triples are (p, j1, j2): p is (f, m), j1/j2 are (f, k*m) with
    direction j in lane block [j*m, (j+1)*m); j2 is None while it is
    identically zero (x'' = 0 until the first nonlinearity). The rules
    are the standard truncated Taylor algebra: (ab)'' = a''b + 2a'b' +
    ab'', tanh'' = -2 tanh (1 - tanh^2), exp'' = exp (a'' + a'^2).
    quad = d^2/dt^2 logp = the second jet, summed over the k blocks.
    Numerics match _tile_quad's precision choices op for op (selections
    through _mm_split -- AD's tangent of the bf16 round-trip is the same
    split -- conditioner matmuls DEFAULT, the dense latent W HIGHEST);
    tests pin jet == jvp^2 and the kernel against the XLA pipeline.
    X: (d, m), dirs: (k, d) -> (m,)."""
    m = X.shape[1]
    k = k_dirs

    def tk(p):
        """Tile a primal-shaped array along the direction-folded lanes."""
        return p if k == 1 else jnp.concatenate([p] * k, axis=1)

    def j2add(a, b):
        if a is None:
            return b
        if b is None:
            return a
        return a + b

    def jadd(a, b):
        return (a[0] + b[0], a[1] + b[1], j2add(a[2], b[2]))

    def jmul(a, b):
        """Elementwise product of jet triples."""
        (ap, a1, a2), (bp, b1, b2) = a, b
        apT, bpT = tk(ap), tk(bp)
        p = ap * bp
        j1 = a1 * bpT + apT * b1
        j2 = j2add(j2add(None if a2 is None else a2 * bpT,
                         None if b2 is None else apT * b2),
                   2.0 * (a1 * b1))
        return p, j1, j2

    def jtanh(a):
        ap, a1, a2 = a
        t = jnp.tanh(ap)
        s = 1.0 - t * t
        sT = tk(s)
        j1 = sT * a1
        j2 = j2add(None if a2 is None else sT * a2,
                   (-2.0) * tk(t * s) * (a1 * a1))
        return t, j1, j2

    def jexp(a):
        ap, a1, a2 = a
        e = jnp.exp(ap)
        eT = tk(e)
        return e, eT * a1, eT * j2add(a2, a1 * a1)

    def jlin(op, a):
        """Apply a linear map to each jet component."""
        ap, a1, a2 = a
        return op(ap), op(a1), None if a2 is None else op(a2)

    def jmlp(net, h, alpha):
        """Jet propagation through _mlp_plain (all layers tanh, then
        alpha scaling); bias enters the primal only."""
        ws, bs = net["w"], net["b"]
        for w, b in zip(ws, bs):
            hp, h1, h2 = jlin(partial_mm_tn(w), h)
            h = jtanh((hp + b[:, None], h1, h2))
        return h[0] * alpha, h[1] * alpha, None if h[2] is None \
            else h[2] * alpha

    def partial_mm_tn(w):
        return lambda v: _mm_tn(w, v)

    def jpair(pf, h, alpha):
        y = jmlp(pf, h, alpha)
        half = y[0].shape[0] // 2

        def cut(c, lo):
            return (c[:half] if lo else c[half:]) if c is not None else None

        return ((y[0][:half], y[1][:half], cut(y[2], True)),
                (y[0][half:], y[1][half:], cut(y[2], False)))

    def jcouple(u, s, t, variant):
        # the exp jet exists only for the variants that consume it (the
        # additive coupling never scales, so its branch must not even
        # build the jexp graph)
        if variant == "additive":
            return jadd(u, s)
        if variant == "affine":
            return jadd(jmul(u, jexp(s)), t)
        if variant == "scale":
            return jmul(u, jexp(s))
        return jadd(jmul(u, jexp(s)), s)  # scale_shift

    Z1 = _fold_dirs(dirs, k, X.shape[0], m)
    z = (X, Z1, None)
    lj2 = None  # second jet of logjac, (k*m,)
    for p, spec, (Su, Sd) in zip(kt["blocks"], specs, sel):
        u1 = jlin(lambda v, S=Su: _mm_split(S, v), z)
        u2 = jlin(lambda v, S=Sd: _mm_split(S, v), z)
        if spec.variant == "affine":
            s2, t2 = jpair(p["f2"], u2, spec.alpha)
        else:
            s2 = jmlp(p["s2"], u2, spec.alpha)
            t2 = None
        v1 = jcouple(u1, s2, t2, spec.variant)
        if spec.variant == "affine":
            s1, t1 = jpair(p["f1"], v1, spec.alpha)
        else:
            s1 = jmlp(p["s1"], v1, spec.alpha)
            t1 = None
        v2 = jcouple(u2, s1, t1, spec.variant)
        zm = jadd(jlin(lambda v, S=Su: _mm_tn_split(S, v), v1),
                  jlin(lambda v, S=Sd: _mm_tn_split(S, v), v2))
        if spec.variant != "additive":
            lj2 = j2add(lj2, j2add(
                None if s1[2] is None else jnp.sum(s1[2], axis=0),
                None if s2[2] is None else jnp.sum(s2[2], axis=0)))
        if spec.global_affine:
            gs = p["g_scale"][:, None]
            zm = (gs * zm[0] + p["g_offset"][:, None], gs * zm[1],
                  None if zm[2] is None else gs * zm[2])
        z = zm

    lat = kt["latent"]
    dim = X.shape[0]
    W, _ = _latent_factor(lat, dim)
    ylat = jlin(lambda v: _mm(W, v, _HI),
                (z[0] - off[:, None] - lat["mu"][:, None], z[1], z[2]))
    yp, y1, y2 = ylat
    ypT = tk(yp)
    q0 = jnp.sum(yp * yp, axis=0)                      # (m,)
    q1 = 2.0 * jnp.sum(ypT * y1, axis=0)               # (k*m,)
    q2 = 2.0 * jnp.sum(
        y1 * y1 + (0.0 if y2 is None else ypT * y2), axis=0)
    if tparams is None:
        blocks = -0.5 * q2
    else:
        nu = tparams[0]
        onepu = tk((1.0 + q0 / nu)[None, :])[0]        # (k*m,)
        h1 = 0.5 * (nu + dim) / nu / onepu
        blocks = -(h1 * q2 - (h1 / nu / onepu) * (q1 * q1))
    if lj2 is not None:
        blocks = blocks + lj2
    return _sum_dir_blocks(blocks, k, m)


# ---------------------------------------------------------------------------
# O-tile assembly in ravel_pytree order.
# ---------------------------------------------------------------------------

def _norm_path(path):
    out = []
    for k in path:
        if hasattr(k, "key"):
            out.append(k.key)
        elif hasattr(k, "idx"):
            out.append(k.idx)
        else:  # pragma: no cover
            out.append(str(k))
    return tuple(out)


def _slab_order(template):
    """Ordered (path, size) of ravel_pytree's layout: tree_flatten order,
    each leaf raveled row-major."""
    flat, _ = jax.tree_util.tree_flatten_with_path(template)
    return [(_norm_path(path), int(np.prod(np.shape(leaf))))
            for path, leaf in flat]


def _lookup_slab(slabs, path):
    """slabs is keyed by prefix paths: MLP nets map a prefix like
    ('blocks', 0, 's1') to {'b': [...], 'w': [...]} keyed further by the
    remaining path elements."""
    if path in slabs:
        return slabs[path]
    node = slabs[path[:3]]
    for k in path[3:]:
        node = node[k]
    return node


def assemble_O(slabs, order):
    """Concatenate per-leaf slabs into the (P, m) O tile in ravel order
    (sublane concat: 8-granular, no lane padding)."""
    pieces = []
    for path, size in order:
        if size == 0:
            continue
        pieces.append(_lookup_slab(slabs, path))
    return jnp.concatenate(pieces, axis=0)


# ---------------------------------------------------------------------------
# Pure-jnp public wrappers (tests; sample-major at the boundary).
# ---------------------------------------------------------------------------

def _maybe_tparams(flow, params, dtype):
    return (student_t_consts(flow, params, dtype)
            if flow.latent_name == "Student_t" else None)


def tile_value_and_grads(flow, params, x):
    """Pure-jnp hand fwd+bwd over a batch: (logp (N,), g (N, d), O (N, P)).
    Exactly the computation the Pallas kernel body runs (the kernel wraps
    this tile-by-tile); runs anywhere, pinned against jax.grad in tests."""
    kt = kernel_param_tree(flow, params)
    sel, off, lsel = split_consts(flow, flow_consts(flow, x.dtype))
    tp = _maybe_tparams(flow, params, x.dtype)
    logp, saves, saves_lat = _forward(kt, flow.blocks, sel, off, x.T, tp)
    g, slabs = _backward(kt, flow.blocks, sel, saves, saves_lat, lsel, tp)
    return logp, g.T, assemble_O(slabs, _slab_order(params)).T


def tile_quad(flow, params, x, dirs, impl: str = "jvp"):
    """Pure-jnp folded-direction Hessian quad (N,). ``impl``: "jvp" =
    jvp-of-jvp on the direction-replicated tile, "jet" = hand-written
    second-order jets sharing one primal (_tile_quad_jet, the kernel
    default)."""
    kt = kernel_param_tree(flow, params)
    sel, off, _ = split_consts(flow, flow_consts(flow, x.dtype))
    fn = _quad_impl(impl)
    return fn(kt, flow.blocks, sel, off, x.T,
              jnp.asarray(dirs, x.dtype), int(np.shape(dirs)[0]),
              _maybe_tparams(flow, params, x.dtype))


def _quad_impl(name: str):
    if name == "jet":
        return _tile_quad_jet
    if name == "jvp":
        return _tile_quad
    raise ValueError(f"unknown quad impl {name!r} (expected 'jet' or 'jvp')")


def supports(flow, hess_dirs, hess_idx) -> bool:
    """Static capability check for the fused kernel."""
    return (
        flow.latent_name in ("Gauss", "Student_t")
        and (hess_idx is None or hess_dirs is not None)  # trace mode only
    )


# ---------------------------------------------------------------------------
# The Pallas wrapper.
# ---------------------------------------------------------------------------

def make_per_sample_pallas(flow, unravel, n_params: int,
                           hess_dirs: Optional[np.ndarray],
                           tile: int = DEFAULT_TILE,
                           interpret: bool = False,
                           template=None,
                           emit_split: bool = False,
                           quad_impl: str = "jet"):
    """Build fn(theta (P,), x (N, d)) -> (logp (N,), g (N, d), quad (N,)
    or None, O (N, P)), computed tile-by-tile in one Pallas kernel.

    N must be a multiple of ``tile`` (TDVP budgets are rounded to much
    coarser multiples already). ``interpret=True`` runs the interpreter
    (CI on CPU). ``template``: the params pytree whose ravel layout
    defines theta (required). The returned O is a logical transpose of
    the kernel's (P, N) output -- XLA folds it into the consuming
    dot_generals.

    ``emit_split=True`` changes the signature to fn(theta, x, shift) ->
    (logp, g, quad or None, (O_hi, O_lo), colsum (P,), omax (P,)):
    instead of the f32 O the kernel writes the bf16 hi/lo operand split
    of (O - shift[:, None]), plus the column sums of the shifted O
    (grid-accumulated f32 -- summed BEFORE the split, and saving the
    consumer one full pair read), plus the grid-accumulated column
    max |O - shift| (one f32 lane reduce; the consumer derives both
    int8 cross quantization scale bounds from it -- max|hi| <=
    omax(1+2^-8) by monotone bf16 rounding and max|lo| <= omax 2^-8
    since the split residual is bounded by half a bf16 ulp -- saving
    a lane-axis max-reduce over each full operand, ~26 ms/RHS at the
    headline shape, without paying two reduces in-kernel)
    -- exactly the decomposition the sym2/tri2 Gram backends produce
    from f32 O (parallel/stats._split_bf16, with the chunked path's
    pilot shift already applied). Same HBM write bytes (2x bf16 == f32),
    but the consumer skips one full (N, P) f32 read + bf16-pair write
    per chunk per Gram. hi + lo reconstructs O - shift up to the dropped
    sub-lo residual (~2^-16 relative), the 2-pass Gram class's own
    rounding floor."""
    if template is None:
        raise ValueError("make_per_sample_pallas needs the params template")
    if not interpret and tile % 128:
        # samples ride the lane axis: Mosaic requires lane-dim block
        # sizes to be multiples of 128 (or the full array)
        raise ValueError(f"per-sample kernel tile {tile} must be a "
                         "multiple of 128")
    dim = flow.dim
    want_quad = hess_dirs is not None
    k_dirs = int(np.shape(hess_dirs)[0]) if want_quad else 0
    is_t = flow.latent_name == "Student_t"
    specs = flow.blocks
    order = _slab_order(template)
    quad_fn = _quad_impl(quad_impl)

    kt_template = kernel_param_tree(flow, template)
    kleaves_t, ktreedef = jax.tree_util.tree_flatten(kt_template)
    n_leaves = len(kleaves_t)
    n_consts = 2 * len(specs) + 3

    def kernel(*refs):
        x_ref = refs[0]
        leaf_refs = refs[1:1 + n_leaves]
        const_refs = refs[1 + n_leaves:1 + n_leaves + n_consts]
        pos = 1 + n_leaves + n_consts
        dirs_ref = refs[pos] if want_quad else None
        tp_ref = refs[pos + int(want_quad)] if is_t else None
        if emit_split:
            shift_ref = refs[pos + int(want_quad) + int(is_t)]
            (logp_ref, g_ref, quad_ref, o_hi_ref, o_lo_ref,
             o_sum_ref, o_amax_ref) = refs[-7:]
        else:
            logp_ref, g_ref, quad_ref, o_ref = refs[-4:]

        kt = jax.tree_util.tree_unflatten(
            ktreedef, [r[:] for r in leaf_refs])
        sel, off, lsel = split_consts(
            flow, tuple(r[:] for r in const_refs))
        X = x_ref[:]  # (d, m)
        tp = tp_ref[:] if is_t else None

        logp, saves, saves_lat = _forward(kt, specs, sel, off, X, tp)
        g, slabs = _backward(kt, specs, sel, saves, saves_lat, lsel, tp)
        logp_ref[:] = logp[None, :]
        g_ref[:] = g
        if emit_split:
            o32 = assemble_O(slabs, order) - shift_ref[:]
            hi16 = o32.astype(jnp.bfloat16)
            lo16 = (o32 - hi16.astype(o32.dtype)).astype(jnp.bfloat16)
            o_hi_ref[:] = hi16
            o_lo_ref[:] = lo16
            # column sums of the shifted O, accumulated across the
            # sample-tile grid into one (P, 1) output (constant index
            # map; TPU grids run sequentially) -- saves the consumer a
            # full read of the pair, and sums the f32 values BEFORE the
            # bf16 split; likewise the column max |o32| (P, 1), from
            # which the consumer derives BOTH int8 quantization scale
            # bounds (max|hi| <= m(1+2^-8) by monotone bf16 rounding,
            # max|lo| <= m 2^-8 since |lo| <= ulp/2) -- one lane reduce
            # on the f32 value instead of two on the split halves
            osum = jnp.sum(o32, axis=1, keepdims=True).astype(jnp.float32)
            oam = jnp.max(jnp.abs(o32), axis=1,
                          keepdims=True).astype(jnp.float32)

            @pl.when(pl.program_id(0) == 0)
            def _init():
                o_sum_ref[:] = osum
                o_amax_ref[:] = oam

            @pl.when(pl.program_id(0) != 0)
            def _acc():
                o_sum_ref[:] += osum
                o_amax_ref[:] = jnp.maximum(o_amax_ref[:], oam)
        else:
            o_ref[:] = assemble_O(slabs, order)
        if want_quad:
            quad = quad_fn(kt, specs, sel, off, X, dirs_ref[:], k_dirs,
                           tp)
            quad_ref[:] = quad[None, :]
        else:
            quad_ref[:] = jnp.zeros_like(quad_ref)

    # Index-map int literals must be i32: under x64 (the tpu_default
    # Precision enables it) a literal 0 traces as i64 and the map's mixed
    # (i32, i64) return fails Mosaic legalization ('func.return').
    _z = np.int32(0)

    def full_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i, _nd=nd: (_z,) * _nd,
                            memory_space=pltpu.VMEM)

    def run(theta, x, shift=None):
        n = x.shape[0]
        if n % tile:
            raise ValueError(f"sample count {n} not a multiple of the "
                             f"per-sample kernel tile {tile}")
        if emit_split != (shift is not None):
            raise ValueError("shift must be passed exactly when the "
                             "kernel was built with emit_split")
        params = unravel(theta)
        kt = kernel_param_tree(flow, params)
        kleaves = jax.tree_util.tree_leaves(kt)
        consts = flow_consts(flow, x.dtype)
        extra = [*kleaves, *consts]
        extra_specs = [full_spec(np.shape(a)) for a in extra]
        if want_quad:
            dirs = jnp.asarray(np.asarray(hess_dirs), dtype=x.dtype)
            extra.append(dirs)
            extra_specs.append(full_spec(dirs.shape))
        if is_t:
            tp = student_t_consts(flow, params, x.dtype)
            extra.append(tp)
            extra_specs.append(full_spec(tp.shape))
        if emit_split:
            extra.append(jnp.reshape(shift.astype(x.dtype),
                                     (n_params, 1)))
            extra_specs.append(full_spec((n_params, 1)))
        grid = (n // tile,)
        if emit_split:
            o_specs = [pl.BlockSpec((n_params, tile), lambda i: (_z, i),
                                    memory_space=pltpu.VMEM)] * 2
            o_specs.extend([pl.BlockSpec((n_params, 1), lambda i: (_z, _z),
                                         memory_space=pltpu.VMEM)] * 2)
            o_shapes = [jax.ShapeDtypeStruct((n_params, n), jnp.bfloat16)] * 2
            o_shapes.extend([jax.ShapeDtypeStruct((n_params, 1),
                                                  jnp.float32)] * 2)
        else:
            o_specs = [pl.BlockSpec((n_params, tile), lambda i: (_z, i),
                                    memory_space=pltpu.VMEM)]
            o_shapes = [jax.ShapeDtypeStruct((n_params, n), x.dtype)]
        logp, g, quad, *Os = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((dim, tile), lambda i: (_z, i),
                             memory_space=pltpu.VMEM),
                *extra_specs,
            ],
            out_specs=[
                pl.BlockSpec((1, tile), lambda i: (_z, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((dim, tile), lambda i: (_z, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile), lambda i: (_z, i),
                             memory_space=pltpu.VMEM),
                *o_specs,
            ],
            out_shape=[
                jax.ShapeDtypeStruct((1, n), x.dtype),
                jax.ShapeDtypeStruct((dim, n), x.dtype),
                jax.ShapeDtypeStruct((1, n), x.dtype),
                *o_shapes,
            ],
            # the default scoped-vmem flag is 16 MB; the (P, m) O tile
            # plus saves need more -- raise toward physical VMEM
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(x.T, *extra)
        if emit_split:
            return (logp[0], g.T, quad[0] if want_quad else None,
                    (Os[0].T, Os[1].T), Os[2][:, 0], Os[3][:, 0])
        return (logp[0], g.T,
                quad[0] if want_quad else None, Os[0].T)

    return run


def make_per_sample_sharded(flow, unravel, n_params: int,
                            hess_dirs: Optional[np.ndarray], ctx,
                            tile: int = DEFAULT_TILE,
                            interpret: bool = False,
                            template=None,
                            quad_impl: str = "jet"):
    """The fused kernel on a multi-device mesh: shard_map the single-
    device Pallas program over the sample (dp) axis. Each device runs the
    kernel on its local (N/dp, d) tile stream and writes its local
    (N/dp, P) O rows; tp replicas compute their dp shard redundantly --
    exactly the layout GSPMD gives the vmapped-AD pipeline, so the
    downstream Gram/statistics contractions see identical shardings
    (ctx.osample_spec). check_vma is off (pallas_call carries no
    varying-manual-axes info); outputs are dp-sharded / tp-replicated by
    construction. Sample budgets must divide dp_size * tile -- ragged
    budgets fall back to the XLA pipeline at the TDVP call site, same as
    single-device. ``quad_impl`` forwards to make_per_sample_pallas
    (jet default; "jvp" selects the pure-forward fallback), so meshes
    can pick the same quad variants as the single-device builder."""
    run = make_per_sample_pallas(flow, unravel, n_params, hess_dirs,
                                 tile=tile, interpret=interpret,
                                 template=template, quad_impl=quad_impl)
    want_quad = hess_dirs is not None

    def body(theta, x):
        logp, g, quad, O = run(theta, x)
        return (logp, g, quad, O) if want_quad else (logp, g, O)

    ps, samp, osamp = (ctx.per_sample_spec, ctx.samples_spec,
                       ctx.osample_spec)
    outs = (ps, samp, ps, osamp) if want_quad else (ps, samp, osamp)
    smap = jax.shard_map(body, mesh=ctx.mesh,
                         in_specs=(ctx.replicated_spec, samp),
                         out_specs=outs, check_vma=False)

    def run_sharded(theta, x):
        if x.shape[0] % (ctx.dp_size * tile):
            raise ValueError(
                f"sample count {x.shape[0]} not a multiple of "
                f"dp_size * tile = {ctx.dp_size} * {tile}")
        res = smap(theta, x)
        if want_quad:
            return res
        logp, g, O = res
        return logp, g, None, O

    return run_sharded

"""Fused per-sample statistics Pallas kernel: logp, coordinate score,
Hessian quadratic trace, and the O-matrix row for a tile of samples in ONE
TPU kernel.

The XLA per-sample pipeline (score.value_score_and_param_grad +
score.quad_trace, vmapped; SURVEY.md section 7 Pallas item (1)) is
memory/latency-bound, not FLOP-bound: the flagship d=32 flow's conditioner
matmuls are (N, 16) x (16, 16) slivers, and XLA materializes every
activation, tangent, and cotangent of the ~70 tiny ops in HBM between
fusions (~73 ms of a ~470 ms RHS at N=131,072 against a ~6 ms
speed-of-light bound set by the (N, P) O write). This kernel runs the
whole per-sample computation -- forward flow, parameter/coordinate
backward, and the forward-over-forward Hessian trace -- on a
VMEM-resident tile of C samples, so the only HBM traffic is the x tile in
and the (C, P) O tile out.

Design notes (what Mosaic can and cannot lower dictated the shape):

- Parameter leaves enter the kernel as separate natural-shape INPUTS
  (flat-theta unraveling in-kernel needs (P,) -> (in, out) shape casts
  Mosaic rejects). The latent packed-Cholesky vector is pre-scattered to
  a strictly-upper (d, d) matrix OUTSIDE the kernel; its O-columns are
  assembled analytically inside.
- The theta-backward is HAND-WRITTEN, tile-batched, all 2-D: reverse-mode
  AD of per-sample parameter gradients emits vmapped outer products
  (dot_general with empty contracting dims) and 3-D cotangent tensors,
  neither of which Mosaic lowers; the hand backward builds each weight
  slab as a lane-concat of x_i-scaled cotangent columns instead. The
  coordinate score g falls out of the same backward sweep for free.
- The Hessian quadratic trace stays on AD, but pure FORWARD-mode
  (jvp-of-jvp emits no transposes): directions are folded into the
  sample (sublane) axis -- one jvp^2 pass over a (k*C, d) batch of
  repeated tiles, full lane utilization, no 3-D tangents.
- The latent Mahalanobis triangular solve becomes multiplication by the
  EXACT inverse factor: U = D(I - B) with B nilpotent, so
  U^{-1} = (sum_{k<dim} B^k) D^{-1}, summed in log2(dim) doubling steps.
- Static coordinate split/merge (coupling.py's ``x[ind_up]`` gathers and
  inverse-perm regather) become matmuls with static 0/1 selection
  matrices at Precision.HIGHEST, passed as kernel inputs (Mosaic cannot
  materialize captured array constants).
- Numerics: identical math to flow.log_prob at f32 (conditioner matmuls
  keep the XLA path's DEFAULT precision); tests pin logp/g/quad/O
  against the XLA pipeline, and the hand fwd/bwd -- which are plain jnp
  functions usable OUTSIDE Pallas -- against jax.grad directly.

Scope (checked by ``supports``): Gauss latent (Student-t needs ``gammaln``
of two traced scalars -- not a Mosaic-supported transcendental), any
coupling variant incl. the learned global affine, trace-mode Hessians
(the block path stays XLA). Unsupported configs stay on the XLA pipeline.

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

# sample-tile height: 64 rows keeps the (C, P) O tile at ~2.4 MB for the
# flagship P=9264 -- the kernel's scoped-VMEM peak (saved activations +
# live slabs + the O assembly) must fit the 16 MB budget; 128 was measured
# 1 MB over it
DEFAULT_TILE = 64

_HI = jax.lax.Precision.HIGHEST


def _mm(a, b, precision=None):
    """a @ b (2-D)."""
    return jnp.matmul(a, b, precision=precision)


def _mm_nt(a, b, precision=None):
    """a @ b.T without a transpose op (dot_general on b's dim 1)."""
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               precision=precision)


def _selection_matrix(idx, dim, dtype=jnp.float32):
    """Static (k, dim) 0/1 matrix S with x @ S.T == x[:, idx]."""
    m = np.zeros((len(idx), dim), dtype=np.float32)
    m[np.arange(len(idx)), np.asarray(idx)] = 1.0
    return jnp.asarray(m, dtype)


def _packed_embed_matrix(dim, dtype=jnp.float32):
    """Static (dim*dim, n_off) 0/1 matrix E selecting the strictly-upper
    entries (np.triu_indices(dim, 1) order) out of a row-major-flattened
    (dim, dim) slab: slab_L = slab_U_full @ E."""
    iu = np.triu_indices(dim, k=1)
    flat_idx = iu[0] * dim + iu[1]
    E = np.zeros((dim * dim, len(flat_idx)), dtype=np.float32)
    E[flat_idx, np.arange(len(flat_idx))] = 1.0
    return jnp.asarray(E, dtype)


def _repeat_mats(in_dim, out_dim, dtype=jnp.float32):
    """Static replication matrices for the Mosaic-safe per-sample outer
    product: with Rh (in, in*out), Rh[i, i*out+o] = 1 and Ra (out, in*out),
    Ra[o, i*out+o] = 1, the row-major per-sample weight gradient is
    (h @ Rh) * (abar @ Ra) -- two sliver matmuls and one multiply with
    full-lane (m, in*out) results, instead of a concat of lane-padded
    16-wide pieces (measured 45 MB over the scoped-VMEM budget)."""
    Rh = np.zeros((in_dim, in_dim * out_dim), dtype=np.float32)
    Ra = np.zeros((out_dim, in_dim * out_dim), dtype=np.float32)
    for i in range(in_dim):
        Rh[i, i * out_dim:(i + 1) * out_dim] = 1.0
        for o in range(out_dim):
            Ra[o, i * out_dim + o] = 1.0
    return jnp.asarray(Rh, dtype), jnp.asarray(Ra, dtype)


def _layer_dim_pairs(flow):
    """Sorted unique (in, out) dims across all conditioner layers plus the
    latent (d, d) outer product."""
    pairs = {(flow.dim, flow.dim)}
    for spec in flow.blocks:
        n_up, n_down = len(spec.ind_up), len(spec.ind_down)
        for in_d, out_d in ((n_down, n_up), (n_up, n_down)):
            dims = [in_d, *spec.hidden, out_d]
            pairs.update(zip(dims[:-1], dims[1:]))
    return sorted(pairs)


def flow_consts(flow, dtype=jnp.float32):
    """Static kernel inputs, as a flat tuple (Pallas forbids captured
    array constants in kernel bodies): per-block (Su, Sd) selection
    matrices, the latent offset, the packed-Cholesky column selector, and
    (Rh, Ra) replication pairs for every distinct layer shape."""
    out = []
    for spec in flow.blocks:
        out.append(_selection_matrix(spec.ind_up, flow.dim, dtype))
        out.append(_selection_matrix(spec.ind_down, flow.dim, dtype))
    out.append(jnp.asarray(flow.offset_array, dtype))
    out.append(_packed_embed_matrix(flow.dim, dtype))
    for in_d, out_d in _layer_dim_pairs(flow):
        out.extend(_repeat_mats(in_d, out_d, dtype))
    return tuple(out)


def split_consts(flow, consts):
    """(sel pairs, offset, epack, rep dict) from the flow_consts tuple."""
    B = len(flow.blocks)
    sel = [(consts[2 * i], consts[2 * i + 1]) for i in range(B)]
    off = consts[2 * B]
    epack = consts[2 * B + 1]
    rep = {}
    pos = 2 * B + 2
    for pair in _layer_dim_pairs(flow):
        rep[pair] = (consts[pos], consts[pos + 1])
        pos += 2
    return sel, off, epack, rep


def kernel_param_tree(flow, params):
    """The parameter pytree the kernel consumes: the blocks as-is, the
    latent with the packed strictly-upper vector L pre-scattered to a
    (d, d) matrix (the in-kernel scatter is not Mosaic-lowerable; the
    O-columns for L are assembled analytically from the factor instead).
    Runs OUTSIDE the kernel (plain XLA)."""
    d = flow.dim
    lat = params["latent"]
    uoff = jnp.zeros((d, d), lat["L"].dtype)
    uoff = uoff.at[np.triu_indices(d, k=1)].set(lat["L"])
    return {
        "blocks": params["blocks"],
        "latent": {"L_diag": lat["L_diag"], "Uoff": uoff, "mu": lat["mu"]},
    }


# ---------------------------------------------------------------------------
# Hand-written tile-batched forward/backward (plain jnp: testable on CPU,
# lowerable by Mosaic).
# ---------------------------------------------------------------------------

def _mlp_fwd(net, x, alpha):
    """Tile-batched mlp.apply with saved activations for the backward.
    x: (m, in) -> (y (m, out), saves = [(h_in, tanh_a) per layer])."""
    ws, bs = net["w"], net["b"]
    saves = []
    h = x
    for w, b in zip(ws[:-1], bs[:-1]):
        t = jnp.tanh(_mm(h, w) + b[None, :])
        saves.append((h, t))
        h = t
    t_last = jnp.tanh(_mm(h, ws[-1]) + bs[-1][None, :])
    saves.append((h, t_last))
    return alpha * t_last, saves


def _mlp_plain(net, x, alpha):
    """Save-free forward (the jvp^2 quad primal)."""
    ws, bs = net["w"], net["b"]
    h = x
    for w, b in zip(ws[:-1], bs[:-1]):
        h = jnp.tanh(_mm(h, w) + b[None, :])
    return alpha * jnp.tanh(_mm(h, ws[-1]) + bs[-1][None, :])


def _mlp_bwd(net, saves, ybar, alpha, rep):
    """Backward through _mlp_fwd. Returns (xbar (m, in), slabs) where
    slabs = {"b": [(m, out_l)...], "w": [(m, in_l*out_l)...]} -- each
    weight slab is the PER-SAMPLE gradient flattened row-major via the
    ``rep`` replication matmuls (the Mosaic-safe, full-lane outer
    product; see _repeat_mats)."""
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
        Rh, Ra = rep[(h_in.shape[1], abar.shape[1])]
        wslabs[layer] = _mm(h_in, Rh, _HI) * _mm(abar, Ra, _HI)
        xbar = _mm_nt(abar, ws[layer])
        if layer > 0:
            _, t_prev = saves[layer - 1]
            abar = xbar * (1.0 - t_prev * t_prev)
    return xbar, {"b": bslabs, "w": wslabs}


def _couple_f(u, s, t, es, variant):
    """Tile-batched coupling._couple_fwd with the exp precomputed."""
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


def _forward(kt, specs, sel, off, X):
    """Hand forward pass over a sample tile X (m, d). Returns
    (logp (m,), saves) with everything the backward needs."""
    z = X
    logjac = jnp.zeros((X.shape[0],), X.dtype)
    saves = []
    for p, spec, (Su, Sd) in zip(kt["blocks"], specs, sel):
        u1 = _mm_nt(z, Su, _HI)
        u2 = _mm_nt(z, Sd, _HI)
        s2, sv_s2 = _mlp_fwd(p["s2"], u2, spec.alpha)
        es2 = jnp.exp(s2)
        t2, sv_t2 = (_mlp_fwd(p["t2"], u2, spec.alpha)
                     if spec.variant == "affine" else (None, None))
        v1 = _couple_f(u1, s2, t2, es2, spec.variant)
        s1, sv_s1 = _mlp_fwd(p["s1"], v1, spec.alpha)
        es1 = jnp.exp(s1)
        t1, sv_t1 = (_mlp_fwd(p["t1"], v1, spec.alpha)
                     if spec.variant == "affine" else (None, None))
        v2 = _couple_f(u2, s1, t1, es1, spec.variant)
        ym = _mm(v1, Su, _HI) + _mm(v2, Sd, _HI)
        if spec.variant != "additive":
            logjac = logjac + jnp.sum(s1, axis=1) + jnp.sum(s2, axis=1)
        if spec.global_affine:
            z = p["g_scale"][None, :] * ym + p["g_offset"][None, :]
            logjac = logjac + spec.dim * jnp.log(p["g_scale"][0])
        else:
            z = ym
        saves.append(dict(u1=u1, u2=u2, v1=v1, s1=s1, s2=s2, es1=es1,
                          es2=es2, ym=ym, sv_s1=sv_s1, sv_s2=sv_s2,
                          sv_t1=sv_t1, sv_t2=sv_t2))

    lat = kt["latent"]
    dim = X.shape[1]
    W, dvec = _latent_factor(lat, dim)
    zc = z - off[None, :] - lat["mu"][None, :]
    ylat = _mm_nt(zc, W, _HI)
    quadv = jnp.sum(ylat * ylat, axis=1)
    logp = (-0.5 * (dim * math.log(2.0 * math.pi)
                    + 2.0 * jnp.sum(lat["L_diag"]) + quadv) + logjac)
    saves_lat = dict(W=W, dvec=dvec, ylat=ylat)
    return logp, saves, saves_lat


def _backward(kt, specs, sel, saves, saves_lat, rep, epack):
    """Hand backward pass: (g = dlogp/dx (m, d), slabs dict keyed by
    normalized template path -> (m, leaf_size) per-sample gradients)."""
    lat = kt["latent"]
    W, dvec, ylat = saves_lat["W"], saves_lat["dvec"], saves_lat["ylat"]
    dim = W.shape[0]
    slabs = {}

    # Latent analytics: q = ||W zc||^2, dlp/dU[i,j] = (W^T y)_i y_j,
    # dlp/dld_i = dlp/dU[i,i] e^{ld_i} - 1, dlp/dmu = W^T y, dlp/dz = -W^T y.
    wty = _mm(ylat, W, _HI)  # rows = (W^T y)^T per sample
    slabs[("latent", "mu")] = wty
    slabs[("latent", "L_diag")] = wty * ylat * dvec[None, :] - 1.0
    Rh, Ra = rep[(dim, dim)]
    slab_u_full = _mm(wty, Rh, _HI) * _mm(ylat, Ra, _HI)  # (m, d*d)
    slabs[("latent", "L")] = _mm(slab_u_full, epack, _HI)
    zbar = -wty

    for bi in range(len(specs) - 1, -1, -1):
        p, spec, (Su, Sd), sv = kt["blocks"][bi], specs[bi], sel[bi], saves[bi]
        if spec.global_affine:
            slabs[("blocks", bi, "g_scale")] = (
                jnp.sum(sv["ym"] * zbar, axis=1, keepdims=True)
                + spec.dim / p["g_scale"][0]
            )
            slabs[("blocks", bi, "g_offset")] = zbar
            ymbar = zbar * p["g_scale"][None, :]
        else:
            ymbar = zbar
        v1bar = _mm_nt(ymbar, Su, _HI)
        v2bar = _mm_nt(ymbar, Sd, _HI)

        s1bar, t1bar, u2bar = _couple_b(
            v2bar, sv["u2"], sv["s1"], sv["es1"], spec.variant)
        xb, sl = _mlp_bwd(p["s1"], sv["sv_s1"], s1bar, spec.alpha, rep)
        v1bar = v1bar + xb
        slabs[("blocks", bi, "s1")] = sl
        if spec.variant == "affine":
            xb, sl = _mlp_bwd(p["t1"], sv["sv_t1"], t1bar, spec.alpha, rep)
            v1bar = v1bar + xb
            slabs[("blocks", bi, "t1")] = sl

        s2bar, t2bar, u1bar = _couple_b(
            v1bar, sv["u1"], sv["s2"], sv["es2"], spec.variant)
        xb, sl = _mlp_bwd(p["s2"], sv["sv_s2"], s2bar, spec.alpha, rep)
        u2bar = u2bar + xb
        slabs[("blocks", bi, "s2")] = sl
        if spec.variant == "affine":
            xb, sl = _mlp_bwd(p["t2"], sv["sv_t2"], t2bar, spec.alpha, rep)
            u2bar = u2bar + xb
            slabs[("blocks", bi, "t2")] = sl

        zbar = _mm(u1bar, Su, _HI) + _mm(u2bar, Sd, _HI)
    return zbar, slabs


def _tile_logp(kt, specs, sel, off, X):
    """Save-free primal for the jvp^2 Hessian quad (theta constant)."""
    z = X
    logjac = jnp.zeros((X.shape[0],), X.dtype)
    for p, spec, (Su, Sd) in zip(kt["blocks"], specs, sel):
        u1 = _mm_nt(z, Su, _HI)
        u2 = _mm_nt(z, Sd, _HI)
        s2 = _mlp_plain(p["s2"], u2, spec.alpha)
        t2 = (_mlp_plain(p["t2"], u2, spec.alpha)
              if spec.variant == "affine" else None)
        v1 = _couple_f(u1, s2, t2, jnp.exp(s2), spec.variant)
        s1 = _mlp_plain(p["s1"], v1, spec.alpha)
        t1 = (_mlp_plain(p["t1"], v1, spec.alpha)
              if spec.variant == "affine" else None)
        v2 = _couple_f(u2, s1, t1, jnp.exp(s1), spec.variant)
        z = _mm(v1, Su, _HI) + _mm(v2, Sd, _HI)
        if spec.variant != "additive":
            logjac = logjac + jnp.sum(s1, axis=1) + jnp.sum(s2, axis=1)
        if spec.global_affine:
            z = p["g_scale"][None, :] * z + p["g_offset"][None, :]
            logjac = logjac + spec.dim * jnp.log(p["g_scale"][0])
    lat = kt["latent"]
    dim = X.shape[1]
    W, _ = _latent_factor(lat, dim)
    zc = z - off[None, :] - lat["mu"][None, :]
    ylat = _mm_nt(zc, W, _HI)
    return (-0.5 * (dim * math.log(2.0 * math.pi)
                    + 2.0 * jnp.sum(lat["L_diag"])
                    + jnp.sum(ylat * ylat, axis=1)) + logjac)


def _tile_quad(kt, specs, sel, off, X, dirs, k_dirs: int):
    """sum_j v_j^T H v_j per sample via ONE forward-over-forward jvp pass
    with the k directions folded into the sample (sublane) axis: repeat
    the tile k times, give row block j the tangent v_j, sum the blocks.
    Pure forward-mode -- no AD transposes for Mosaic to choke on."""
    m = X.shape[0]
    x_rep = jnp.concatenate([X] * k_dirs, axis=0)
    v_rep = jnp.concatenate(
        [jnp.broadcast_to(dirs[j:j + 1, :], (m, X.shape[1]))
         for j in range(k_dirs)], axis=0)

    def f(xv):
        return _tile_logp(kt, specs, sel, off, xv)

    def inner(y):
        return jax.jvp(f, (y,), (v_rep,))[1]

    q_all = jax.jvp(inner, (x_rep,), (v_rep,))[1]  # (k*m,)
    quad = q_all[0:m]
    for j in range(1, k_dirs):
        quad = quad + q_all[j * m:(j + 1) * m]
    return quad


# ---------------------------------------------------------------------------
# Pure-jnp public wrappers (tests; also usable as an XLA path).
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
    """Concatenate per-leaf slabs into the (m, P) O tile in ravel order."""
    pieces = []
    for path, size in order:
        if size == 0:
            continue
        pieces.append(_lookup_slab(slabs, path))
    return jnp.concatenate(pieces, axis=1)


def tile_value_and_grads(flow, params, x):
    """Pure-jnp hand fwd+bwd over a batch: (logp (N,), g (N, d), O (N, P)).
    Exactly the computation the Pallas kernel body runs (the kernel wraps
    this tile-by-tile); runs anywhere, pinned against jax.grad in tests."""
    kt = kernel_param_tree(flow, params)
    sel, off, epack, rep = split_consts(flow, flow_consts(flow, x.dtype))
    logp, saves, saves_lat = _forward(kt, flow.blocks, sel, off, x)
    g, slabs = _backward(kt, flow.blocks, sel, saves, saves_lat, rep, epack)
    return logp, g, assemble_O(slabs, _slab_order(params))


def tile_quad(flow, params, x, dirs):
    """Pure-jnp folded-direction Hessian quad (N,)."""
    kt = kernel_param_tree(flow, params)
    sel, off, _, _ = split_consts(flow, flow_consts(flow, x.dtype))
    return _tile_quad(kt, flow.blocks, sel, off, x,
                      jnp.asarray(dirs, x.dtype), int(np.shape(dirs)[0]))


def supports(flow, hess_dirs, hess_idx) -> bool:
    """Static capability check for the fused kernel."""
    return (
        flow.latent_name == "Gauss"
        and (hess_idx is None or hess_dirs is not None)  # trace mode only
    )


# ---------------------------------------------------------------------------
# The Pallas wrapper.
# ---------------------------------------------------------------------------

def make_per_sample_pallas(flow, unravel, n_params: int,
                           hess_dirs: Optional[np.ndarray],
                           tile: int = DEFAULT_TILE,
                           interpret: bool = False,
                           template=None):
    """Build fn(theta (P,), x (N, d)) -> (logp (N,), g (N, d), quad (N,)
    or None, O (N, P)), computed tile-by-tile in one Pallas kernel.

    N must be a multiple of ``tile`` (TDVP budgets are rounded to much
    coarser multiples already). ``interpret=True`` runs the interpreter
    (CI on CPU). ``template``: the params pytree whose ravel layout
    defines theta (required)."""
    if template is None:
        raise ValueError("make_per_sample_pallas needs the params template")
    dim = flow.dim
    want_quad = hess_dirs is not None
    k_dirs = int(np.shape(hess_dirs)[0]) if want_quad else 0
    specs = flow.blocks
    order = _slab_order(template)

    kt_template = kernel_param_tree(flow, template)
    kleaves_t, ktreedef = jax.tree_util.tree_flatten(kt_template)
    n_leaves = len(kleaves_t)
    n_consts = 2 * len(specs) + 2 + 2 * len(_layer_dim_pairs(flow))

    def kernel(*refs):
        x_ref = refs[0]
        leaf_refs = refs[1:1 + n_leaves]
        const_refs = refs[1 + n_leaves:1 + n_leaves + n_consts]
        dirs_ref = refs[1 + n_leaves + n_consts] if want_quad else None
        logp_ref, g_ref, quad_ref, o_ref = refs[-4:]

        kt = jax.tree_util.tree_unflatten(
            ktreedef, [r[:] for r in leaf_refs])
        sel, off, epack, rep = split_consts(
            flow, tuple(r[:] for r in const_refs))
        X = x_ref[:]

        logp, saves, saves_lat = _forward(kt, specs, sel, off, X)
        g, slabs = _backward(kt, specs, sel, saves, saves_lat, rep, epack)
        logp_ref[:] = logp[:, None]
        g_ref[:] = g
        o_ref[:] = assemble_O(slabs, order)
        if want_quad:
            quad = _tile_quad(kt, specs, sel, off, X, dirs_ref[:], k_dirs)
            quad_ref[:] = quad[:, None]
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

    def run(theta, x):
        n = x.shape[0]
        if n % tile:
            raise ValueError(f"sample count {n} not a multiple of the "
                             f"per-sample kernel tile {tile}")
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
        grid = (n // tile,)
        logp, g, quad, O = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile, dim), lambda i: (i, _z),
                             memory_space=pltpu.VMEM),
                *extra_specs,
            ],
            out_specs=[
                pl.BlockSpec((tile, 1), lambda i: (i, _z),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, dim), lambda i: (i, _z),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, 1), lambda i: (i, _z),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, n_params), lambda i: (i, _z),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n, 1), x.dtype),
                jax.ShapeDtypeStruct((n, dim), x.dtype),
                jax.ShapeDtypeStruct((n, 1), x.dtype),
                jax.ShapeDtypeStruct((n, n_params), x.dtype),
            ],
            # the default scoped-vmem flag is 16 MB; the body's live set
            # (saves + slabs + the O assembly) peaks at ~19 MB per 64-row
            # tile -- raise the limit toward the chip's physical VMEM
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(x, *extra)
        return (logp[:, 0], g,
                quad[:, 0] if want_quad else None, O)

    return run

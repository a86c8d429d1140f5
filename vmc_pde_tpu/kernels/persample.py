"""Fused per-sample statistics Pallas kernel: logp, coordinate score,
Hessian quadratic trace, and the O-matrix row for a tile of samples in ONE
TPU kernel.

The XLA per-sample pipeline (score.value_score_and_param_grad +
score.quad_trace, vmapped; SURVEY.md section 7 Pallas item (1)) is
memory/latency-bound, not FLOP-bound: the flagship d=32 flow's conditioner
matmuls are (N, 16) x (16, 16) slivers, and XLA materializes every
activation, tangent, and cotangent of the ~70 tiny ops in HBM between
fusions (~85 ms of a 406 ms RHS at N=131,072 against a ~6 ms
speed-of-light bound set by the (N, P) O write). This kernel runs the
whole per-sample computation -- forward flow, parameter/coordinate
backward, and the 2k-pass forward-over-forward Hessian trace -- on a
VMEM-resident tile of C samples, so the only HBM traffic is the x tile in
and the (C, P) O tile out.

Design notes (why this is not simply ``flow.log_prob`` inside a kernel):

- The kernel BODY is ordinary traceable JAX: ``jax.vmap``, ``jax.grad``
  and ``jax.jvp`` applied at trace time emit plain jaxpr ops that Mosaic
  compiles like hand-written ones. No AD is hand-derived.
- Mosaic does not lower gather/scatter or ``triangular_solve``. The flow
  evaluation is therefore re-expressed (``mosaic_log_prob``) with
  *AD-closed* Mosaic-friendly primitives:
    - static coordinate split/merge (coupling.py's ``x[ind_up]`` gathers
      and inverse-perm regather) become matmuls with static 0/1 selection
      matrices -- whose transposes (their own AD rules) are again matmuls;
    - the latent Cholesky factor (latent.py chol_factor's ``.at[iu].set``
      scatter) is built row-by-row with static pads and one stack;
    - the Mahalanobis ``solve_triangular`` becomes multiplication by an
      explicitly-inverted upper-triangular factor, computed once per tile
      by UNROLLED back-substitution (d static steps of vector ops --
      differentiable, so parameter gradients of the latent block flow
      through it automatically).
  Selection matmuls run at ``Precision.HIGHEST`` so the 0/1 contraction
  is f32-grade (DEFAULT would round the coordinates through one bf16
  pass).
- Numerics: identical math to flow.log_prob at f32; the conditioner
  matmuls inside the kernel default to the same MXU precision as the XLA
  path, so per-sample outputs agree to f32-accumulation noise
  (tests/test_kernels.py pins logp/g/quad/O against the XLA pipeline).

Scope (checked by ``supports``): Gauss latent (Student-t needs ``gammaln``
of two traced scalars -- not a Mosaic-supported transcendental), any
coupling variant, optional global affine, trace-mode Hessians (the block
path stays XLA). Unsupported configs fall back to the XLA pipeline.

Reference counterpart: the per-sample pmap(vmap(...)) closures of
var_state.py:29-34; this is their TPU-resident fusion.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models import coupling as coupling_mod
from ..ops import score

# sample-tile height: 256 rows keeps the (C, P) O tile at ~9.5 MB for the
# flagship P=9264 -- inside VMEM with the ~0.2 MB of per-sample state --
# while giving the sliver matmuls 256 sublanes to amortize over
DEFAULT_TILE = 256

_SELECT_PREC = jax.lax.Precision.HIGHEST


def _selection_matrix(idx, dim, dtype=jnp.float32):
    """Static (k, dim) 0/1 matrix S with S @ x == x[idx]."""
    m = np.zeros((len(idx), dim), dtype=np.float32)
    m[np.arange(len(idx)), np.asarray(idx)] = 1.0
    return jnp.asarray(m, dtype)


def _chol_rows(latent_params, dim):
    """Upper-triangular factor L (== latent.chol_factor) without the
    .at[triu].set scatter: per-row static pad/concat + one stack."""
    v = latent_params["L"]
    diag = jnp.exp(latent_params["L_diag"])
    rows = []
    off = 0
    for i in range(dim):
        n_upper = dim - i - 1
        seg = v[off:off + n_upper]
        off += n_upper
        rows.append(jnp.concatenate([
            jnp.zeros((i,), v.dtype), diag[i:i + 1], seg]))
    return jnp.stack(rows)


def _inv_upper(U, dim):
    """W = U^{-1} for upper-triangular U by unrolled back-substitution
    (static dim steps; differentiable, Mosaic-friendly). Row i of W:
    W[i, i] = 1/U[i, i]; W[i, j>i] = -(U[i, i+1:] @ W[i+1:, j]) / U[i, i].
    Built bottom-up so each row only references already-built rows."""
    rows = [None] * dim
    for i in range(dim - 1, -1, -1):
        inv_d = 1.0 / U[i, i]
        if i == dim - 1:
            tail = jnp.zeros((0, dim), U.dtype)
        else:
            tail = jnp.stack(rows[i + 1:])  # (dim-1-i, dim)
        # -U[i, i+1:] @ tail gives the strictly-upper part of row i
        upper = -jnp.matmul(U[i, i + 1:], tail, precision=_SELECT_PREC)
        basis = jnp.concatenate([
            jnp.zeros((i,), U.dtype), jnp.ones((1,), U.dtype),
            jnp.zeros((dim - i - 1,), U.dtype)])
        rows[i] = inv_d * (basis + upper)
    return jnp.stack(rows)


def _gauss_log_prob_mosaic(latent_params, dim, x):
    """latent.gauss_log_prob with the triangular solve replaced by
    multiplication with the explicit inverse factor (per-call tiny)."""
    L = _chol_rows(latent_params, dim)
    W = _inv_upper(L, dim)
    xc = x - latent_params["mu"]
    y = jnp.matmul(W, xc, precision=_SELECT_PREC)
    quad = jnp.sum(y * y)
    log_det = 2.0 * jnp.sum(latent_params["L_diag"])
    return -0.5 * (dim * jnp.log(2.0 * jnp.pi) + log_det + quad)


def _block_forward_mosaic(params, spec, x, sel):
    """coupling.forward with the static gathers/regather replaced by 0/1
    selection matmuls (Su, Sd precomputed per spec). Identical math."""
    from ..models import mlp

    Su, Sd = sel
    u1 = jnp.matmul(Su, x, precision=_SELECT_PREC)
    u2 = jnp.matmul(Sd, x, precision=_SELECT_PREC)

    s2 = mlp.apply(params["s2"], u2, spec.alpha)
    t2 = (mlp.apply(params["t2"], u2, spec.alpha)
          if spec.variant == "affine" else None)
    v1, lj1 = coupling_mod._couple_fwd(u1, s2, t2, spec.variant)

    s1 = mlp.apply(params["s1"], v1, spec.alpha)
    t1 = (mlp.apply(params["t1"], v1, spec.alpha)
          if spec.variant == "affine" else None)
    v2, lj2 = coupling_mod._couple_fwd(u2, s1, t1, spec.variant)

    # merge: v1 back to the ind_up coordinates, v2 to ind_down
    y = (jnp.matmul(v1, Su, precision=_SELECT_PREC)
         + jnp.matmul(v2, Sd, precision=_SELECT_PREC))
    log_jac = jnp.sum(lj1) + jnp.sum(lj2)

    if spec.global_affine:
        y = params["g_scale"] * y + params["g_offset"]
        log_jac = log_jac + spec.dim * jnp.log(params["g_scale"][0])
    return y, log_jac


def flow_consts(flow, dtype=jnp.float32):
    """The static arrays mosaic_log_prob needs: per-block (Su, Sd)
    selection matrices and the latent offset. Returned as a flat tuple so
    the Pallas wrapper can pass them as kernel INPUTS (Pallas forbids
    captured array constants in kernel bodies)."""
    out = []
    for spec in flow.blocks:
        out.append(_selection_matrix(spec.ind_up, flow.dim, dtype))
        out.append(_selection_matrix(spec.ind_down, flow.dim, dtype))
    out.append(jnp.asarray(flow.offset_array, dtype))
    return tuple(out)


def mosaic_log_prob(flow, params, x, consts=None):
    """flow.log_prob re-expressed in Mosaic-lowerable, AD-closed ops.
    Single sample x (dim,) -> scalar; callers vmap. Also valid outside
    Pallas (tests compare it against flow.log_prob directly). ``consts``:
    the flow_consts tuple (built on the fly if omitted; inside a Pallas
    body it MUST be passed in, read from kernel input refs)."""
    if consts is None:
        consts = flow_consts(flow, x.dtype)
    log_jac = jnp.zeros((), dtype=x.dtype)
    z = x
    for i, (p, spec) in enumerate(zip(params["blocks"], flow.blocks)):
        sel = (consts[2 * i], consts[2 * i + 1])
        z, lj = _block_forward_mosaic(p, spec, z, sel)
        log_jac = log_jac + lj
    off = consts[-1]
    lp = _gauss_log_prob_mosaic(params["latent"], flow.dim, z - off)
    return lp + log_jac


def supports(flow, hess_dirs, hess_idx) -> bool:
    """Static capability check for the fused kernel."""
    return (
        flow.latent_name == "Gauss"
        and (hess_idx is None or hess_dirs is not None)  # trace mode only
    )


def make_per_sample_pallas(flow, unravel, n_params: int,
                           hess_dirs: Optional[np.ndarray],
                           tile: int = DEFAULT_TILE,
                           interpret: bool = False):
    """Build fn(theta (P,), x (N, d)) -> (logp (N,), g (N, d), quad (N,)
    or None, O (N, P)), computed tile-by-tile in one Pallas kernel.

    N must be a multiple of ``tile`` (TDVP budgets are rounded to much
    coarser multiples already). ``interpret=True`` runs the interpreter
    (CI on CPU). The flow's static selection matrices, latent offset, and
    the Hessian directions ride along as kernel INPUTS (full-array blocks,
    re-fetched per tile -- they are a few KB) because Mosaic cannot
    materialize captured array constants inside the body."""
    dim = flow.dim
    want_quad = hess_dirs is not None
    n_consts = 2 * len(flow.blocks) + 1

    def kernel(*refs):
        theta_ref, x_ref = refs[0], refs[1]
        const_refs = refs[2:2 + n_consts]
        pos = 2 + n_consts
        dirs_ref = refs[pos] if want_quad else None
        logp_ref, g_ref, quad_ref, o_ref = refs[-4:]

        consts = tuple(r[:] for r in const_refs)

        def f_flat(theta, xi):
            return mosaic_log_prob(flow, unravel(theta), xi, consts=consts)

        theta = theta_ref[:]
        x = x_ref[:]
        logp, g, O = jax.vmap(
            partial(score.value_score_and_param_grad, f_flat),
            in_axes=(None, 0),
        )(theta, x)
        logp_ref[:] = logp[:, None]
        g_ref[:] = g
        o_ref[:] = O
        if want_quad:
            quad = jax.vmap(
                partial(score.quad_trace, f_flat, dirs=dirs_ref[:]),
                in_axes=(None, 0),
            )(theta, x)
            quad_ref[:] = quad[:, None]
        else:
            quad_ref[:] = jnp.zeros_like(quad_ref)

    def full_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i, _nd=nd: (0,) * _nd,
                            memory_space=pltpu.VMEM)

    def run(theta, x):
        n = x.shape[0]
        if n % tile:
            raise ValueError(f"sample count {n} not a multiple of the "
                             f"per-sample kernel tile {tile}")
        consts = flow_consts(flow, x.dtype)
        extra = list(consts)
        extra_specs = [full_spec(c.shape) for c in consts]
        if want_quad:
            dirs = jnp.asarray(np.asarray(hess_dirs), dtype=x.dtype)
            extra.append(dirs)
            extra_specs.append(full_spec(dirs.shape))
        grid = (n // tile,)
        logp, g, quad, O = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                full_spec((n_params,)),
                pl.BlockSpec((tile, dim), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                *extra_specs,
            ],
            out_specs=[
                pl.BlockSpec((tile, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, dim), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, n_params), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n, 1), x.dtype),
                jax.ShapeDtypeStruct((n, dim), x.dtype),
                jax.ShapeDtypeStruct((n, 1), x.dtype),
                jax.ShapeDtypeStruct((n, n_params), x.dtype),
            ],
            interpret=interpret,
        )(theta, x, *extra)
        return (logp[:, 0], g,
                quad[:, 0] if want_quad else None, O)

    return run

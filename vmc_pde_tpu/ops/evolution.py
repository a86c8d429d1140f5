"""Evolution equations (the physics operators).

Each equation computes the per-sample local "energy"

    Eloc_i = (d/dt) log p(x_i)   prescribed by the PDE at sample x_i,

from the coordinate score g = grad_x log p and (where needed) a Hessian block
H of log p. Parity with vmc_fluids/evolutionEq.py:84-119, all six operators:

- diffusion                  dp/dt = D lap p
  Eloc = D (|g|^2 + tr H)                               (evolutionEq.py:84-87)
- diffusion_drift            adds mu * sum_i g_i        (evolutionEq.py:89-94)
- diffusion_anisotropic      Eloc = g D g + sum_ij H_ij D_ji
                                                        (evolutionEq.py:96-100)
- advection_paper            Eloc = -g . v(x, t), time-periodic 2D field
                                                        (evolutionEq.py:23-27)
- advection_hamiltonian      v = J grad H (symplectic)  (evolutionEq.py:30-45)
- advection_hamiltonian_wDiss  Fokker-Planck: advection + momentum diffusion
  m*gamma*T (|g_p|^2 + tr H_pp) + damping gamma sum_p x_p g_p
  (Eq. 2.14 of quant-ph/9709002; evolutionEq.py:107-119)

Equations are frozen dataclasses exposing
    hessian_coords(dim) -> None | tuple   (which Hessian block is needed)
    eloc(x, g, hess, t)  ->  per-sample scalars (batched jnp ops)
so the fused TDVP step computes exactly the derivatives each operator needs.
Coordinate layout for phase-space operators: [x1, p1, x2, p2, ...]
(positions 0::2, momenta 1::2), as in the reference.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Velocity fields
# ---------------------------------------------------------------------------

def velocity_field_mlpaper(coord, t, T=5.0):
    """Time-periodic 2D swirl from the ML-fluids paper (evolutionEq.py:23-27)."""
    x, y = coord[0], coord[1]
    c = jnp.cos(jnp.pi * t / T)
    return jnp.array(
        [
            -jnp.sin(jnp.pi * x) ** 2 * jnp.sin(2 * jnp.pi * y) * c,
            jnp.sin(jnp.pi * y) ** 2 * jnp.sin(2 * jnp.pi * x) * c,
        ]
    )


def hamiltonian(coord, m=1.0, omega=1.0, lam=0.0, coupled=False, v2=1.0,
                onsite=0.0):
    """Harmonic(+quartic) Hamiltonian on [x1,p1,x2,p2,...] layout
    (evolutionEq.py:32-42). ``v2`` scales the quadratic potential term:
    v2 < 0 with lam > 0 gives the double well
    V(x) = v2 m omega^2/2 x^2 + lam x^4 (minima at
    +-sqrt(-v2 m omega^2 / (4 lam)), barrier v2^2 m^2 omega^4 / (16 lam))
    -- BASELINE.json config 3; the reference's Hamiltonian is the v2=1
    special case. ``onsite`` (coupled chains only) adds an on-site
    pinning term onsite * m omega^2/2 sum x^2: the roll-coupled chain
    alone has a zero mode (uniform translation costs nothing), so a
    damped-diffusive chain has no stationary position distribution
    without it -- needed for the heat-transport NESS workload."""
    xs = coord[0::2]
    ps = coord[1::2]
    if coupled:
        pot = m * omega**2 / 2.0 * (
            jnp.sum((xs - jnp.roll(xs, 1)) ** 2)
            + onsite * jnp.sum(xs**2))
    else:
        pot = m * omega**2 / 2.0 * jnp.sum(xs**2)
    return v2 * pot + jnp.sum(ps**2) / (2.0 * m) + lam * jnp.sum(xs**4)


def velocity_field_hamiltonian(coord, t, m=1.0, omega=1.0, lam=0.0,
                               coupled=False, v2=1.0, onsite=0.0):
    """Symplectic flow v = J grad H: dx/dt = dH/dp, dp/dt = -dH/dx
    (evolutionEq.py:30-45)."""
    grads = jax.grad(hamiltonian)(coord, m=m, omega=omega, lam=lam,
                                  coupled=coupled, v2=v2, onsite=onsite)
    n_pairs = coord.shape[0] // 2
    J = jnp.kron(jnp.eye(n_pairs), jnp.array([[0.0, 1.0], [-1.0, 0.0]]))
    return (J @ grads).astype(coord.dtype)


@functools.lru_cache(maxsize=None)
def random_spd_matrix(dim: int, seed: int = 0):
    """Random SPD diffusion matrix D = A^T A (evolutionEq.py:18-20, same
    PRNGKey draw as the reference under its global x64). Evaluated EAGERLY
    and cached: eloc() runs under jit, and a jax.random draw made inside
    the trace cannot be np.asarray'd (the reference only ever built D at
    setup scope, so its in-jit use never arose). The draw is pinned to
    f64 regardless of the global x64 flag -- jax.random.normal yields
    DIFFERENT values per dtype, so an x64-dependent draw would make f32
    runs solve a different PDE than validators compare against (and the
    cache would pin whichever dtype came first)."""
    with jax.enable_x64(True), jax.ensure_compile_time_eval():
        A = jax.random.normal(jax.random.PRNGKey(seed), shape=(dim, dim),
                              dtype=jnp.float64)
        return np.asarray(A.T @ A)


# ---------------------------------------------------------------------------
# Equations
# ---------------------------------------------------------------------------

class Equation:
    """Base: subclasses define hessian mode and the batched Eloc formula."""

    name: str = "base"

    def hessian_coords(self, dim: int) -> Optional[Tuple[int, ...]]:
        """Coordinates whose Hessian block is needed; None = no Hessian,
        tuple(range(dim)) = full."""
        return None

    def hessian_trace_dirs(self, dim: int) -> Optional[np.ndarray]:
        """Static (k, d) direction matrix V when the equation consumes the
        Hessian ONLY through the quadratic-form sum sum_j V_j^T H V_j (a
        Laplacian or a tr(H D)). When set, the solver computes that scalar
        per sample forward-over-forward (score.quad_trace) instead of
        materializing the (k, k) block, and ``eloc`` receives it as a
        1-D ``hess`` array. None = the full block is required."""
        return None

    def eloc(self, x, g, hess, t):
        raise NotImplementedError


@dataclasses.dataclass(frozen=True)
class Diffusion(Equation):
    """dp/dt = D lap p  =>  dlogp/dt = D (|grad logp|^2 + lap logp)."""

    D: float = 1.0
    name: str = "diffusion"

    def hessian_coords(self, dim):
        return tuple(range(dim))

    def hessian_trace_dirs(self, dim):
        return np.eye(dim)

    def eloc(self, x, g, hess, t):
        lap = hess if hess.ndim == 1 else jnp.trace(hess, axis1=-2, axis2=-1)
        return self.D * (jnp.sum(g**2, axis=-1) + lap)


@dataclasses.dataclass(frozen=True)
class DiffusionDrift(Equation):
    """Diffusion plus constant drift mu along every coordinate
    (evolutionEq.py:89-94)."""

    D: float = 1.0
    mu: float = 4.0
    name: str = "diffusion_drift"

    def hessian_coords(self, dim):
        return tuple(range(dim))

    def hessian_trace_dirs(self, dim):
        return np.eye(dim)

    def eloc(self, x, g, hess, t):
        lap = hess if hess.ndim == 1 else jnp.trace(hess, axis1=-2, axis2=-1)
        return self.D * (jnp.sum(g**2, axis=-1) + lap) + self.mu * jnp.sum(
            g, axis=-1
        )


@dataclasses.dataclass(frozen=True)
class DiffusionAnisotropic(Equation):
    """dp/dt = div(D grad p) with a constant SPD matrix D
    (evolutionEq.py:96-100). ``seed`` reproduces the reference's random D."""

    dim: int = 2
    seed: int = 0
    name: str = "diffusion_anisotropic"

    @property
    def D_matrix(self):
        return random_spd_matrix(self.dim, self.seed)

    def hessian_coords(self, dim):
        return tuple(range(dim))

    def hessian_trace_dirs(self, dim):
        # tr(H D) = tr(H L L^T) = sum_j (L e_j)^T H (L e_j) with D = L L^T:
        # the columns of the Cholesky factor are exact trace directions.
        return np.linalg.cholesky(self.D_matrix).T

    def eloc(self, x, g, hess, t):
        D = jnp.asarray(self.D_matrix, dtype=g.dtype)
        quad = jnp.einsum("ni,ij,nj->n", g, D, g)
        tr = hess if hess.ndim == 1 else jnp.einsum("nij,ji->n", hess, D)
        return quad + tr


@dataclasses.dataclass(frozen=True)
class AdvectionPaper(Equation):
    """Liouville transport by the ML-paper 2D field: dlogp/dt = -g . v
    (evolutionEq.py:102-105)."""

    T: float = 5.0
    name: str = "advection_paper"

    def eloc(self, x, g, hess, t):
        v = jax.vmap(lambda c: velocity_field_mlpaper(c, t, self.T))(x)
        return -jnp.sum(g * v, axis=-1)


@dataclasses.dataclass(frozen=True)
class AdvectionHamiltonian(Equation):
    """Liouville transport by the symplectic flow (evolutionEq.py:71-73)."""

    m: float = 1.0
    omega: float = 1.0
    lam: float = 0.0
    coupled: bool = False
    v2: float = 1.0  # quadratic-potential prefactor; < 0 => double well
    onsite: float = 0.0  # coupled chains: on-site pinning (see hamiltonian)
    name: str = "advection_hamiltonian"

    def velocity(self, x, t):
        return jax.vmap(
            lambda c: velocity_field_hamiltonian(
                c, t, self.m, self.omega, self.lam, self.coupled,
                self.v2, self.onsite
            )
        )(x)

    def eloc(self, x, g, hess, t):
        return -jnp.sum(g * self.velocity(x, t), axis=-1)


@dataclasses.dataclass(frozen=True)
class FokkerPlanck(AdvectionHamiltonian):
    """Phase-space Fokker-Planck with momentum diffusion and damping
    (Eq. 2.14 of quant-ph/9709002; evolutionEq.py:107-119).

    ``T`` may be a PER-SITE tuple (one bath temperature per (x, p) pair):
    the diffusion term becomes m gamma sum_i T_i ((d_{p_i} log p)^2 +
    d^2_{p_i} log p) -- the nonequilibrium heat-transport setting
    (sites coupled to baths at different temperatures, cf. the
    reference's 'Tdifferent' paper data, whose SHIPPED code only
    supports a scalar T, evolutionEq.py:75,113). The T weights ride the
    Hessian-trace directions as sqrt(T_i) e_{p_i}, so the fused trace
    path (score.quad_trace / the Pallas per-sample kernel) serves the
    per-site case unchanged."""

    T: object = 10.0  # float or per-site tuple, length dim // 2
    gamma: float = 1.0
    name: str = "advection_hamiltonian_wDiss"

    def __post_init__(self):
        if isinstance(self.T, (list, np.ndarray)):
            # keep the frozen dataclass hashable (jit static closures)
            object.__setattr__(self, "T", tuple(float(t) for t in self.T))

    def _t_vec(self, n_pairs: int) -> np.ndarray:
        T = np.asarray(self.T, dtype=np.float64)
        if T.ndim == 0:
            return np.full(n_pairs, float(T))
        if T.shape != (n_pairs,):
            raise ValueError(
                f"per-site T has {T.shape[0]} entries; dim "
                f"{2 * n_pairs} has {n_pairs} (x, p) pairs"
            )
        return T

    def hessian_coords(self, dim):
        return tuple(range(1, dim, 2))  # momentum coordinates only

    def hessian_trace_dirs(self, dim):
        # sqrt(T_i)-scaled momentum basis vectors: the quadratic-form sum
        # the trace path returns is then sum_i T_i H_{p_i p_i} directly
        T = self._t_vec(dim // 2)
        return np.eye(dim)[1::2] * np.sqrt(T)[:, None]

    def eloc(self, x, g, hess, t):
        adv = -jnp.sum(g * self.velocity(x, t), axis=-1)
        g_p = g[:, 1::2]
        x_p = x[:, 1::2]
        Tv = jnp.asarray(self._t_vec(x.shape[-1] // 2), dtype=g.dtype)
        if hess.ndim == 1:
            lap_T = hess  # trace dirs already carry the sqrt(T) weights
        else:
            lap_T = jnp.sum(
                jnp.diagonal(hess, axis1=-2, axis2=-1) * Tv, axis=-1)
        diff = self.m * self.gamma * (
            jnp.sum(g_p**2 * Tv, axis=-1) + lap_T
        )
        damp = self.gamma * jnp.sum(x_p * g_p, axis=-1)
        return adv + diff + damp


# ---------------------------------------------------------------------------
# Registry (evolutionEq.py:54-77 equivalent, with overridable parameters)
# ---------------------------------------------------------------------------

def make_equation(name: str, dim: int, **overrides) -> Equation:
    if name == "diffusion":
        return Diffusion(**overrides)
    if name == "diffusion_drift":
        return DiffusionDrift(**overrides)
    if name == "diffusion_anisotropic":
        return DiffusionAnisotropic(dim=dim, **overrides)
    if name == "advection_paper":
        return AdvectionPaper(**overrides)
    if name == "advection_hamiltonian":
        return AdvectionHamiltonian(**overrides)
    if name == "advection_hamiltonian_wDiss":
        return FokkerPlanck(**overrides)
    raise ValueError(f"unknown evolution equation {name!r}")

"""Grid-based radial diffusion oracle: deterministic PDE reference for
ISOTROPIC initial conditions (the Student-t workloads).

The reference validates its dim-8 Student-t INN run against a grid-based
solution (paper_plot_diffusion.py:13-29, 'StudentT_gridbased' -- the data
file is not shipped and neither is the solver). For an isotropic density
p(x, t) = f(r, t) in d dimensions, the diffusion equation reduces to the
1-D radial problem

    df/dt = D r^(1-d) d/dr ( r^(d-1) df/dr ),

which this module integrates with a conservative finite-volume scheme on
shells: flux F_{i+1/2} = -D A_{i+1/2} (f_{i+1} - f_i)/dr with shell surface
A = S_{d-1} r^(d-1), so total mass sum_i f_i V_i is conserved to rounding
and r = 0 needs no special casing (the innermost face has A(0) = 0). Time
stepping is explicit RK2 inside one jitted lax.scan -- a (n_steps, n_r)
problem runs in seconds.

This gives an INDEPENDENT, sampling-free entropy/moment reference for the
dim-8 Student-t run: unlike the SDE particle oracle (oracle/sde.py) there
is no MC noise, so the comparison resolves the INN's dynamics error
directly (BENCHMARKS.md).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def sphere_area(d: int) -> float:
    """Surface of the unit (d-1)-sphere: S_{d-1} = 2 pi^{d/2} / Gamma(d/2)."""
    return 2.0 * math.pi ** (d / 2.0) / math.gamma(d / 2.0)


def student_t_radial(r, nu: float, d: int):
    """Isotropic multivariate Student-t density value at radius r
    (net.py:23-36 normalization, Q8-corrected)."""
    c = (math.gamma((nu + d) / 2.0)
         / (math.gamma(nu / 2.0) * (nu * math.pi) ** (d / 2.0)))
    return c * (1.0 + r**2 / nu) ** (-(nu + d) / 2.0)


def gauss_radial(r, d: int, sigma2: float = 1.0):
    return np.exp(-(r**2) / (2 * sigma2)) / (2 * math.pi * sigma2) ** (d / 2)


def student_t_entropy(nu: float, d: int) -> float:
    """Closed-form differential entropy of the d-dim Student-t (Sigma = I):
    -log c + (nu+d)/2 [psi((nu+d)/2) - psi(nu/2)] with c the normalization."""
    from scipy.special import digamma

    log_c = (math.lgamma((nu + d) / 2.0) - math.lgamma(nu / 2.0)
             - (d / 2.0) * math.log(nu * math.pi))
    return float(-log_c + (nu + d) / 2.0
                 * (digamma((nu + d) / 2.0) - digamma(nu / 2.0)))


def radial_faces(r_max: float, dr0: float, r_core: float = 10.0,
                 growth: float = 1.02):
    """Graded face radii: uniform spacing dr0 through the core (where the
    density varies on O(1) scales), then geometric growth out to r_max --
    heavy-tailed densities (Student-t: -f log f ~ r^{-3} log r in d=8)
    need domains of hundreds of units, which a uniform grid can't afford."""
    faces = list(np.arange(0.0, r_core + dr0, dr0))
    dr = dr0
    while faces[-1] < r_max:
        dr *= growth
        faces.append(faces[-1] + dr)
    return np.asarray(faces)


def evolve_radial(
    f0,
    d: int,
    D: float = 1.0,
    r_max: float = 60.0,
    n_r: int = 6000,
    t_end: float = 5.0,
    cfl: float = 0.2,
    n_record: int = 200,
    faces=None,
):
    """Integrate the radial diffusion of an isotropic density.

    ``f0``: callable r -> density value (e.g. partial(student_t_radial,
    nu=2, d=8)). ``faces``: optional graded face radii (radial_faces);
    default is a uniform grid of n_r cells to r_max. Returns a dict with
    times, entropy, mass, var (E[r^2]/d, the per-coordinate variance --
    grows as sigma0^2 + 2 D t).
    """
    rf = np.asarray(faces) if faces is not None \
        else np.linspace(0.0, r_max, n_r + 1)
    rc = 0.5 * (rf[1:] + rf[:-1])
    drc = np.diff(rc)                                # center-to-center
    dr_min = float(np.diff(rf).min())
    Sd = sphere_area(d)
    vol = Sd * (rf[1:] ** d - rf[:-1] ** d) / d      # exact shell volumes
    area = Sd * rf ** (d - 1)                        # S_{d-1} r^{d-1}
    area[-1] = 0.0                                   # zero-flux outer wall
    # (area[0] = 0 already: no flux through r = 0)

    f = jnp.asarray(f0(rc), dtype=jnp.float64)
    volj = jnp.asarray(vol)
    areaj = jnp.asarray(area)
    drcj = jnp.asarray(drc)

    # explicit stability: dt < dr^2 / (2 d D) (the d-dim Laplacian CFL)
    dt = cfl * dr_min * dr_min / (2.0 * d * D)
    n_steps = int(math.ceil(t_end / dt))
    every = max(n_steps // n_record, 1)
    # round the step count UP to whole recording chunks so the trajectory
    # reaches exactly t_end (a truncating n_steps // every would silently
    # stop short when n_record does not divide n_steps)
    n_steps = -(-n_steps // every) * every
    dt = t_end / max(n_steps, 1)

    def rhs(f):
        flux = -D * areaj[1:-1] * (f[1:] - f[:-1]) / drcj  # inner faces
        div = jnp.zeros_like(f)
        div = div.at[:-1].add(flux)                        # outflow of cell i
        div = div.at[1:].add(-flux)                        # inflow of cell i+1
        return -div / volj

    def step(f, _):
        k1 = rhs(f)
        k2 = rhs(f + dt * k1)
        return f + 0.5 * dt * (k1 + k2), None

    def chunk(f, _):
        f, _ = jax.lax.scan(step, f, None, length=every)
        fs = jnp.maximum(f, 1e-300)
        ent = -jnp.sum(jnp.where(f > 0, f * jnp.log(fs), 0.0) * volj)
        mass = jnp.sum(f * volj)
        var = jnp.sum(f * volj * jnp.asarray(rc) ** 2) / d
        return f, (ent, mass, var)

    n_chunks = n_steps // every

    @jax.jit
    def run(f):
        return jax.lax.scan(chunk, f, None, length=n_chunks)

    f_final, (ents, masses, variances) = run(f)
    times = (np.arange(n_chunks) + 1) * every * dt
    # prepend t = 0 diagnostics
    f0v = np.asarray(f0(rc))
    ent0 = -np.sum(np.where(f0v > 0, f0v * np.log(np.maximum(f0v, 1e-300)),
                            0.0) * vol)
    return {
        "times": np.concatenate([[0.0], times]),
        "entropy": np.concatenate([[ent0], np.asarray(ents)]),
        "mass": np.concatenate([[float(np.sum(f0v * vol))],
                                np.asarray(masses)]),
        "var": np.concatenate([[float(np.sum(f0v * vol * rc**2) / d)],
                               np.asarray(variances)]),
        "f_final": np.asarray(f_final),
        "r": rc,
    }

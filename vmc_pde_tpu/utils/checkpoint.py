"""Parameter checkpoint / resume.

The reference has no model checkpointing (SURVEY.md section 5.4: only the
diagnostics HDF5 survives a run; INN weights are lost). Here the flat master
parameter vector, time, step counter, and stepper dt are persisted so a run
can resume exactly. Plain npz is used (always available, tiny payloads);
an orbax-backed variant is provided for pytree checkpoints.
"""

from __future__ import annotations

import os

import numpy as np


def save_checkpoint(wdir: str, step: int, t: float, theta, dt: float):
    os.makedirs(wdir, exist_ok=True)
    path = os.path.join(wdir, f"ckpt_{step:08d}.npz")
    np.savez(path, step=step, t=t, theta=np.asarray(theta), dt=dt)
    latest = os.path.join(wdir, "ckpt_latest.npz")
    np.savez(latest, step=step, t=t, theta=np.asarray(theta), dt=dt)
    return path


def load_checkpoint(path: str):
    with np.load(path) as z:
        return dict(
            step=int(z["step"]), t=float(z["t"]),
            theta=np.asarray(z["theta"]), dt=float(z["dt"]),
        )


def latest_checkpoint(wdir: str):
    path = os.path.join(wdir, "ckpt_latest.npz")
    return load_checkpoint(path) if os.path.exists(path) else None


def save_pytree(wdir: str, name: str, tree):
    """Orbax-backed pytree checkpoint (model params, optimizer state)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(wdir, name))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()
    return path


def load_pytree(path: str, template):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), template)

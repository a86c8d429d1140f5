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


def _atomic_savez(path: str, **arrays):
    """Write-to-temp + rename so a crash mid-write can never leave a
    truncated checkpoint at the published path."""
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:  # file object: savez won't append ".npz"
        np.savez(fh, **arrays)
    os.replace(tmp, path)


def save_checkpoint(wdir: str, step: int, t: float, theta, dt: float):
    os.makedirs(wdir, exist_ok=True)
    payload = dict(step=step, t=t, theta=np.asarray(theta), dt=dt)
    path = os.path.join(wdir, f"ckpt_{step:08d}.npz")
    _atomic_savez(path, **payload)
    _atomic_savez(os.path.join(wdir, "ckpt_latest.npz"), **payload)
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


def _mask_empty(tree):
    """Orbax cannot serialize zero-size arrays (e.g. the Gauss latent's
    empty dist_params); stand in a 1-element dummy. The data-free leaves are
    reconstructed from the restore template."""
    import jax

    return jax.tree.map(
        lambda x: np.zeros(1, dtype=getattr(x, "dtype", np.float64))
        if getattr(x, "size", 1) == 0 else x,
        tree,
    )


def save_pytree(wdir: str, name: str, tree):
    """Orbax-backed pytree checkpoint (model params, optimizer state)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(wdir, name))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, _mask_empty(tree), force=True)
    ckptr.wait_until_finished()
    return path


def load_pytree(path: str, template):
    import jax
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.abspath(path), _mask_empty(template))
    return jax.tree.map(
        lambda t, r: t if getattr(t, "size", 1) == 0 else r,
        template, restored,
    )

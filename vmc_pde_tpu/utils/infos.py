"""Per-step diagnostics recording and HDF5 persistence.

Schema-compatible with the reference's infos dict -> HDF5 dump
(vmc_fluids/util.py:29-32, main.py:157-190): one dataset per key, rows are
time steps. The shipped paper data (paper_plot/*/infos.hdf5) reads back with
the same keys: times, ev, snr, solver_res, tdvp_error, dist_params, x1,
covar, entropy, x3..x6, max_grad, integral_*sigma.
"""

from __future__ import annotations

import numpy as np


class InfoRecorder:
    """Accumulates per-step diagnostics WITHOUT forcing device->host
    synchronization: values are stored as-is (device arrays stay device
    arrays, letting the step loop run ahead of the host) and materialized
    in one bulk transfer by ``as_arrays``/``flush``."""

    def __init__(self):
        self.infos = {}

    def append(self, key: str, value):
        self.infos.setdefault(key, []).append(value)

    # Internal per-step payloads that must never be recorded: "update" is
    # the raw parameter update, "SExp" is the (P, P) stepper-metric matrix
    # -- at P~10^4 one step would retain ~hundreds of MB and bloat the HDF5.
    SKIP_KEYS = frozenset({"update", "SExp"})

    def append_dict(self, d: dict):
        for k, v in d.items():
            if k.startswith("_") or k in self.SKIP_KEYS:
                continue
            self.append(k, v)

    def flush(self):
        """Materialize everything recorded so far to host numpy (one bulk
        device transfer)."""
        import jax

        self.infos = jax.device_get(self.infos)

    def as_arrays(self):
        self.flush()
        return {k: np.asarray(v) for k, v in self.infos.items()}


def store_infos(wdir: str, infos, name: str = "infos.hdf5"):
    """HDF5 writer (util.py:29-32). ``infos`` is a dict of lists/arrays."""
    import h5py

    if hasattr(infos, "infos"):
        infos = infos.infos
    path = wdir + name if wdir.endswith("/") else f"{wdir}/{name}"
    with h5py.File(path, "w") as f:
        for key, value in infos.items():
            f.create_dataset(key, data=np.asarray(value))
    return path


def load_infos(path: str):
    import h5py

    out = {}
    with h5py.File(path, "r") as f:
        for key in f.keys():
            out[key] = np.asarray(f[key])
    return out

"""Per-step diagnostics recording and HDF5 persistence.

Schema-compatible with the reference's infos dict -> HDF5 dump
(vmc_fluids/util.py:29-32, main.py:157-190): one dataset per key, rows are
time steps. The shipped paper data (paper_plot/*/infos.hdf5) reads back with
the same keys: times, ev, snr, solver_res, tdvp_error, dist_params, x1,
covar, entropy, x3..x6, max_grad, integral_*sigma.
"""

from __future__ import annotations

import numpy as np


class _Block:
    """Marker wrapper: ``value`` is a (K, ...) stack of K per-step rows."""

    __slots__ = ("value",)

    def __init__(self, value):
        self.value = value


class InfoRecorder:
    """Accumulates per-step diagnostics WITHOUT forcing device->host
    synchronization: values are stored as-is (device arrays stay device
    arrays, letting the step loop run ahead of the host) and materialized
    in one bulk transfer by ``as_arrays``/``flush``."""

    def __init__(self):
        # key -> list of entries; an entry is one per-step row, or a
        # (_Block-wrapped) stack of K rows from a multi-step dispatch.
        self.infos = {}

    def append(self, key: str, value):
        self.infos.setdefault(key, []).append(value)

    def append_block(self, key: str, value):
        """Record a (K, ...) stack of K consecutive per-step rows at once
        (the in-jit multi-step cruise path, TDVP.heun_multi) -- stays lazy
        like ``append``; rows are split out at materialization."""
        self.infos.setdefault(key, []).append(_Block(value))

    # Internal per-step payloads that must never be recorded: "update" is
    # the raw parameter update, "SExp" is the (P, P) stepper-metric matrix
    # -- at P~10^4 one step would retain ~hundreds of MB and bloat the HDF5.
    SKIP_KEYS = frozenset({"update", "SExp"})

    def append_dict(self, d: dict):
        for k, v in d.items():
            if k.startswith("_") or k in self.SKIP_KEYS:
                continue
            self.append(k, v)

    def append_dict_block(self, d: dict):
        for k, v in d.items():
            if k.startswith("_") or k in self.SKIP_KEYS:
                continue
            self.append_block(k, v)

    def flush(self):
        """Materialize everything recorded so far to host numpy (one bulk
        device transfer)."""
        import jax

        raw = {k: [e.value if isinstance(e, _Block) else e for e in v]
               for k, v in self.infos.items()}
        host = jax.device_get(raw)
        self.infos = {
            k: [_Block(hv) if isinstance(e, _Block) else hv
                for e, hv in zip(self.infos[k], host[k])]
            for k in self.infos
        }

    def as_arrays(self):
        self.flush()
        out = {}
        for k, entries in self.infos.items():
            parts = [np.asarray(e.value) if isinstance(e, _Block)
                     else np.asarray(e)[None] for e in entries]
            out[k] = np.concatenate(parts, axis=0)
        return out


def store_infos(wdir: str, infos, name: str = "infos.hdf5"):
    """HDF5 writer (util.py:29-32). ``infos`` is a dict of lists/arrays."""
    import h5py

    if hasattr(infos, "as_arrays"):
        infos = infos.as_arrays()
    elif hasattr(infos, "infos"):
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

"""AOT executable cache: persist COMPILED XLA/PJRT executables to disk
and reload them in fresh processes, skipping compilation entirely.

Why: this image's TPU backend writes but never loads JAX's persistent
compilation cache, so every process pays a 1-12 minute remote compile per
big program (BENCHMARKS.md multi-step section) -- and on any host, cold
starts of large fused step programs cost minutes.
``jax.experimental.serialize_executable`` round-trips the compiled
executable itself: measured on the fused mwe Heun pair (this repo), a
fresh process loads the 21 MB payload in 0.8 s and produces bit-identical
results where compilation took 8 s - 17 min depending on tunnel load.

Keying is content-addressed: sha256 of the lowered StableHLO text plus
the jax version, backend, and device kind -- any change to the traced
program, shapes, dtypes, shardings, or compile environment produces a
different entry. Tracing (``jitted.lower``) still runs per process (a few
seconds for the big step programs); only the minutes-long compile is
skipped. Failures at any stage (unsupported backend, stale payload,
pickle mismatch) fall back to normal compilation transparently.

The driver exposes this as ``RunConfig.aot_dir`` / ``--aot-dir``:
``TDVP.warm_aot`` pre-loads the stepper program the run will use.
"""

from __future__ import annotations

import hashlib
import os
import pickle

import jax

# Backends whose PJRT executables round-trip reliably. XLA:CPU AOT
# deserialization is NOT on the list: its loader compares literal host
# machine-feature strings and can drop compiled symbols, surfacing as
# "Function <fusion> not found" at DISPATCH time (observed flakily on
# this image) -- an unrecoverable async failure. On unlisted backends the
# cache no-ops (plain compile); tests exercise the plumbing with fakes.
SUPPORTED_BACKENDS = ("tpu",)


def _cache_key(lowered) -> str:
    dev = jax.devices()[0]
    src = "\x00".join([
        lowered.as_text(),
        jax.__version__,
        jax.default_backend(),
        getattr(dev, "device_kind", str(dev)),
        str(jax.device_count()),
    ])
    return hashlib.sha256(src.encode()).hexdigest()[:24]


def load_or_compile(jitted, args, kwargs=None, cache_dir=None, tag="fn",
                    devices=None, verbose=False):
    """Return a compiled executable for ``jitted`` at the given example
    arguments, loading it from ``cache_dir`` when a matching entry exists
    and writing one after compiling otherwise.

    ``devices``: the device list the program executes on (e.g. the mesh's
    devices) -- REQUIRED whenever the program does not span every local
    device, because deserialize_and_load defaults to all of them. The
    device count is part of the stored entry and validated on load.

    The returned object is called with the DYNAMIC arguments only (static
    argnames are baked into the executable). With ``cache_dir=None`` this
    is just ``jitted.lower(...).compile()``."""
    kwargs = kwargs or {}
    lowered = jitted.lower(*args, **kwargs)
    if devices is None:
        devices = jax.devices()
    path = None
    if cache_dir and jax.default_backend() not in SUPPORTED_BACKENDS:
        if verbose:
            print(f"aot: backend {jax.default_backend()!r} unsupported; "
                  "compiling without cache")
        cache_dir = None
    if cache_dir:
        os.makedirs(cache_dir, exist_ok=True)
        path = os.path.join(cache_dir, f"{tag}-{_cache_key(lowered)}.aotx")
        if os.path.exists(path):
            try:
                from jax.experimental.serialize_executable import (
                    deserialize_and_load)

                with open(path, "rb") as fh:
                    n_dev, payload, in_tree, out_tree = pickle.load(fh)
                if n_dev != len(devices):
                    raise ValueError(
                        f"entry spans {n_dev} devices, need {len(devices)}")
                compiled = deserialize_and_load(
                    payload, in_tree, out_tree,
                    execution_devices=list(devices))
                if verbose:
                    print(f"aot: loaded {tag} from {path}")
                return compiled
            except Exception as e:  # stale/foreign payload: recompile
                if verbose:
                    print(f"aot: load failed for {path} "
                          f"({type(e).__name__}); recompiling")
    compiled = lowered.compile()
    if path is not None:
        try:
            from jax.experimental.serialize_executable import serialize

            payload, in_tree, out_tree = serialize(compiled)
            tmp = path + f".tmp{os.getpid()}"
            with open(tmp, "wb") as fh:
                pickle.dump((len(devices), payload, in_tree, out_tree), fh)
            os.replace(tmp, path)  # atomic: concurrent writers race safely
            if verbose:
                print(f"aot: wrote {tag} ({len(payload)} bytes) to {path}")
        except Exception as e:  # backend without serialization support
            if verbose:
                print(f"aot: serialize failed ({type(e).__name__}); "
                      "executable not cached")
    return compiled

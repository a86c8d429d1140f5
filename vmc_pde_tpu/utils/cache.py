"""Persistent XLA compilation cache setup.

TPU compiles of the fused TDVP program are expensive (minutes through a
remote-compile path); the persistent cache makes every re-run of an
unchanged program near-instant across processes.
"""

from __future__ import annotations

import os

import jax

DEFAULT_DIR = os.path.expanduser("~/.cache/vmc_pde_tpu_xla")


def enable_compilation_cache(path: str = DEFAULT_DIR) -> None:
    """Point the persistent XLA cache at ``path`` (TPU-class backends only).

    NOTE: reading ``jax.default_backend()`` below initializes the JAX
    backend as a side effect -- call this only AFTER the platform is
    configured (jax_platforms / JAX_PLATFORMS), or the platform choice
    gets pinned prematurely. All in-repo call sites (driver.run, bench,
    dryrun) configure the platform first."""
    # XLA:CPU persistent-cache loads go through the CPU AOT deserializer,
    # whose machine-feature check false-positives on this image (compile
    # entries carry XLA tuning pseudo-features like +prefer-no-scatter the
    # host detector never reports). Round-5 measurement: the loader logs
    # the mismatch and then REJECTS the entry, silently recompiling --
    # warm == cold (287 vs 283 s on a dryrun leg,
    # results/dryrun_cold_r5.txt) -- and historically the round-1-era
    # loads that did go through could drop compiled symbols ("Function
    # <fusion> not found", utils/aot.py SUPPORTED_BACKENDS rationale).
    # The cache exists for the minutes-long remote TPU compiles; on CPU
    # it buys nothing -- skip it there. VMC_CPU_CACHE=1 opts back in
    # (for experiments only).
    if (jax.default_backend() == "cpu"
            and os.environ.get("VMC_CPU_CACHE", "0") != "1"):
        return
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax versions: cache flags unavailable

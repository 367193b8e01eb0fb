"""Central JAX runtime configuration.

Two environment quirks this hides from the rest of the package:

  * The tunneled-TPU ("axon") site hook pins the platform with
    `jax.config.update` at interpreter start, which silently overrides a
    user's `JAX_PLATFORMS=cpu`.  We re-assert the env var so tests and
    CPU runs behave as asked.
  * Remote TPU compiles go through the tunnel's compile service and can
    take minutes; the persistent compilation cache makes every compiled
    (panel shape, tile size) a one-time cost across processes.
"""

import os

_configured = False


def configure():
    global _configured
    if _configured:
        return
    _configured = True
    import jax

    env = os.environ.get("JAX_PLATFORMS")
    if env:
        try:
            jax.config.update("jax_platforms", env)
        except Exception:
            pass

    cache_dir = os.environ.get(
        "TNTBLAST_JAX_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "tntblast_jax"))
    if cache_dir and cache_dir != "0":
        try:
            os.makedirs(cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0)
            jax.config.update(
                "jax_persistent_cache_min_entry_size_bytes", 0)
        except Exception:
            pass

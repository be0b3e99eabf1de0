"""Shared JAX process configuration for the device compute paths.

setup_jax() makes pallas/jit executables reusable across runs:

* persistent compilation cache dir (first mosaic compile of each kernel
  shape costs seconds; a cache hit loads in <1s)
* tracebacks OFF in MLIR locations: jax embeds the full Python call
  stack (file:line of every caller frame) into the lowered module's
  location metadata, and the location data enters the persistent cache
  key -- so ANY edit upstream of a jit call site silently invalidates
  every cached kernel.  Disabling it makes keys depend only on the
  computation.
"""
import logging
import os

LOG = logging.getLogger(__name__)
_done = False


def setup_jax(cache_dir=None):
    global _done
    if _done:
        return
    _done = True
    import jax
    cache = (cache_dir or
             os.environ.get("JAX_COMPILATION_CACHE_DIR",
                            "/tmp/ftpu_jax_cache"))
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
    except Exception:
        LOG.debug("compilation cache dir unavailable", exc_info=True)
    try:
        jax.config.update("jax_include_full_tracebacks_in_locations", False)
    except Exception:
        pass

"""NPP-TPU: a TPU-native framework for learning continuous implicit
representations of near-periodic patterns (completion, segmentation,
remapping, periodicity detection).

Rebuilt from scratch for JAX/XLA/Pallas/pjit; capability reference:
github.com/ArmastusChen/Learning-Continuous-Implicit-Representation-for-Near-Periodic-Patterns
"""
__version__ = "0.1.0"

import os as _os


def enable_compilation_cache(path: str | None = None) -> None:
    """Persist compiled executables across processes. The per-image fit
    compiles a handful of large programs (fit step per patch-size stage,
    renderer, ranking scan); caching makes every run after the first start in
    seconds instead of minutes.

    No-op under a remote-compile TPU relay (PALLAS_AXON_REMOTE_COMPILE=1):
    serialising multi-hundred-MB executables through the relay stalls for
    minutes and can wedge the process; set NPP_TPU_FORCE_CACHE=1 to override.
    """
    if (_os.environ.get("PALLAS_AXON_REMOTE_COMPILE") == "1"
            and not _os.environ.get("NPP_TPU_FORCE_CACHE")):
        return
    import jax

    path = path or _os.environ.get(
        "NPP_TPU_CACHE_DIR", _os.path.expanduser("~/.cache/npp_tpu_jax"))
    _os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

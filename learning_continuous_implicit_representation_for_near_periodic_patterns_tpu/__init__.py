"""Alias package: the round-1 blueprint names the package after the reference
repository; the implementation lives in `npp_tpu` (the importable name).
Extending __path__ makes every `npp_tpu.*` submodule importable under this
name too."""
import npp_tpu as _npp_tpu

__version__ = _npp_tpu.__version__
enable_compilation_cache = _npp_tpu.enable_compilation_cache
__path__ = _npp_tpu.__path__

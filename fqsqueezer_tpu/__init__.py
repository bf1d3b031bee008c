"""fqsqueezer_tpu — TPU-native FASTQ compression framework.

A from-scratch JAX/XLA/Pallas re-design of the k-mer-statistics compression
method of refresh-bio/fqsqueezer (see DESIGN.md and SURVEY.md).
"""
__version__ = "0.1.0"

import os as _os

# Persistent XLA compilation cache is OPT-IN (FQTZ_JAX_CACHE=1): in this
# environment the compile service runs on a different machine type, and
# loading its cached CPU AOT executables on this host SEGFAULTS (machine
# feature mismatch, e.g. +prefer-no-scatter). TPU compiles bypass the local
# cache anyway (remote compile service).
if _os.environ.get("FQTZ_JAX_CACHE"):
    _os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/fqtz_jax_cache")
    try:
        import jax as _jax

        _jax.config.update("jax_compilation_cache_dir",
                           _os.environ["JAX_COMPILATION_CACHE_DIR"])
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

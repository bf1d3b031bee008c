"""fqsqueezer_tpu — TPU-native FASTQ compression framework.

A from-scratch JAX/XLA/Pallas re-design of the k-mer-statistics compression
method of refresh-bio/fqsqueezer (see DESIGN.md and SURVEY.md).
"""
__version__ = "0.1.0"

import os as _os

# Persistent XLA compilation cache: batch-shape recompiles are the dominant
# cold-start cost (~20-40s per shape on TPU). Opt out with FQTZ_NO_JAX_CACHE.
if not _os.environ.get("FQTZ_NO_JAX_CACHE"):
    _os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/fqtz_jax_cache")
    try:
        import jax as _jax

        _jax.config.update("jax_compilation_cache_dir",
                           _os.environ["JAX_COMPILATION_CACHE_DIR"])
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

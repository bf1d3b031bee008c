"""Run the fqsqueezer_tpu CLI pinned to the CPU backend.

The container's sitecustomize registers the TPU plugin in every interpreter
and plain JAX_PLATFORMS=cpu in the parent env is not enough, so this
re-execs itself with the env set BEFORE any jax import and then pins the
platform. Used for ratio measurements while the TPU tunnel is busy/down —
archives are backend-deterministic (integer-only codec), wall times are not.

Usage: python tools/cpu_cli.py e -s ... / d ...
"""
import os
import sys

if os.environ.get("_FQTZ_CPU_CLI") != "1":
    env = dict(os.environ)
    env["_FQTZ_CPU_CLI"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    os.execve(sys.executable, [sys.executable, os.path.abspath(__file__)]
              + sys.argv[1:], env)

import jax

jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.argv = ["cli"] + sys.argv[1:]

from fqsqueezer_tpu.cli import main  # noqa: E402

main()

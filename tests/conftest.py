import os

# Tests run on CPU with 8 virtual devices so multi-chip sharding logic is
# exercised without TPU hardware (the driver separately dry-runs multichip).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The container's sitecustomize registers the axon TPU PJRT plugin in every
# interpreter; its backend init dials the TPU tunnel and can block for minutes
# (and claims the single chip). Tests must never touch it — drop the factory
# before the first backend initialization.
try:
    import jax
    from jax._src import xla_bridge

    # Pallas must be imported while 'tpu' is still a known platform (its
    # lowering registrations name the tpu platform); importing it does NOT
    # initialize a backend, so the tunnel stays untouched.
    from jax.experimental import pallas as _pl            # noqa: F401
    from jax.experimental.pallas import tpu as _pltpu     # noqa: F401

    # sitecustomize imported jax before this conftest ran, so the env var
    # alone is not enough — update the live config too.
    jax.config.update("jax_platforms", "cpu")
    for _name in list(getattr(xla_bridge, "_backend_factories", {})):
        if _name != "cpu":
            xla_bridge._backend_factories.pop(_name, None)
except Exception:
    pass


# After dozens of big shard_map compiles in one process, the XLA CPU backend
# can SIGSEGV/SIGABRT inside backend_compile_and_load (observed once the
# mesh-pipeline tests joined the suite). Dropping compiled executables
# between tests keeps the long-lived interpreter healthy.
import pytest


@pytest.fixture(autouse=True)
def _clear_jax_caches_between_tests():
    yield
    try:
        import jax

        jax.clear_caches()
    except Exception:
        pass

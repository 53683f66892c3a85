"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding logic is tested without TPU hardware the standard way:
force the host platform and split it into 8 virtual devices
(SURVEY.md §4: jax.distributed / xla_force_host_platform_device_count).
"""
import os

# Force CPU: the session env pins JAX to the TPU tunnel ("axon") via a
# sitecustomize hook that calls jax.config.update("jax_platforms","axon,cpu")
# in every interpreter, overriding JAX_PLATFORMS.  Re-update the config after
# import (backends resolve lazily, so this wins) so unit tests run on the
# host with 8 virtual devices.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: the suite's CPU compiles dominate its runtime;
# caching them makes re-runs far cheaper (keyed on HLO hash, so code
# changes invalidate safely).  REVO_TPU_NO_CACHE=1 disables it (cache
# on/off is the first bisection step for interpreter-level crashes).
if not os.environ.get("REVO_TPU_NO_CACHE"):
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(__file__), "..", ".jax_cache_cpu"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture(autouse=True, scope="module")
def _bound_inprocess_jax_state():
    """Clear jit/executable caches after each test module.

    The full suite deterministically segfaulted ~130 tests in (inside an
    XLA:CPU execution; same spot with the persistent cache disabled and
    with an exclusive machine, while the crashing test passes in
    isolation) — in-process executable accumulation is the trigger.
    Clearing per module bounds it; the persistent on-disk cache keeps the
    re-compiles cheap."""
    yield
    jax.clear_caches()

"""Test harness configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding is exercised
without TPU hardware (XLA collectives are identical code single- vs
multi-host). Pallas kernels run in interpreter mode, the analog of the
reference's CPU SDPA fallback oracle (reference: flash_attention/flash_attention.py:6-15).

Must run before any jax import, hence module-level env mutation in conftest.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
# Route dispatch.on_tpu() to the interpret/reference path.
os.environ["FACT_FORCE_INTERPRET"] = "1"

import jax  # noqa: E402

# The axon TPU plugin overrides JAX_PLATFORMS; the config flag wins.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    import jax
    import numpy as np
    from jax.sharding import Mesh

    devices = np.array(jax.devices()).reshape(2, 4)
    return Mesh(devices, axis_names=("data", "model"))


@pytest.fixture(autouse=True, scope="module")
def _bound_xla_mmap_growth():
    """Every XLA CPU executable holds several mmaps and jit caches never
    drop them; a full-suite process crosses vm.max_map_count (65530)
    after ~150 tests and the NEXT compile segfaults inside
    backend_compile (reproduced deterministically; maps grow ~70/test).
    Clearing the compiled-function caches at module boundaries keeps the
    map count bounded at the cost of cross-module recompiles."""
    jax.clear_caches()
    yield

"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on host CPU with XLA's forced device-count flag.  This must run
before jax initializes, hence the env mutation at import time.
"""

import os

# Force CPU even when the session environment points at a TPU tunnel
# (JAX_PLATFORMS=axon): unit tests must be fast and deterministic.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Determinism + fp32 matmuls for parity tests.
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")

import jax  # noqa: E402

# The axon sitecustomize registers the TPU-tunnel backend at interpreter
# start and pins jax to it; the env var alone does not undo that.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _bounded_compile_state():
    """Drop jit/lowering caches after each test module.

    The full suite compiles many hundreds of XLA:CPU programs in one
    process; with everything kept alive the LLVM JIT state grows without
    bound and two 60-minute suite runs segfaulted inside
    ``backend_compile_and_load`` late in the run (the same tests pass in
    isolation).  Modules are compile-independent, so clearing between
    them bounds the live state at negligible recompile cost.
    """
    yield
    import gc

    jax.clear_caches()
    gc.collect()

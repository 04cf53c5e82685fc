"""Test config: run everything on CPU with 8 virtual devices.

Per SURVEY.md §4 "Distributed" tier: tiling/halo correctness is exactly
testable on a simulated multi-device CPU mesh
(--xla_force_host_platform_device_count), no TPU or cluster required.
Pallas kernels run under interpret=True on CPU.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("FSGM_PALLAS_INTERPRET", "1")
# Tests written against backend="pallas" must keep exercising the
# lane-major kernels even now that the runtime default resolves 'pallas'
# to the transposed backend; tr coverage uses explicit 'pallas_tr'
# (tests/unit/test_tr_parity.py and friends).
os.environ.setdefault("FSGM_TR", "0")

import jax  # noqa: E402

# The environment pins JAX_PLATFORMS=axon (the TPU relay); the env var set
# above is not enough to override it, the config flag is.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables at module boundaries.

    The full suite compiles hundreds of XLA:CPU programs in one process;
    past ~120 tests the NEXT large compile segfaults/aborts inside
    backend_compile_and_load (reproduced deterministically at
    test_flow_backward_mode_parity; 128 GB RAM free, so not OOM — a
    cumulative XLA:CPU/LLVM JIT state bug in this jax build).  Clearing
    the jit caches between modules keeps the live-executable footprint
    bounded; the recompiles cost a little wall-clock but keep the suite
    alive end-to-end."""
    yield
    jax.clear_caches()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)

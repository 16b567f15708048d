"""Test harness config: force an 8-device virtual CPU mesh so sharding tests
run without TPU hardware, and keep everything deterministic.

Note: the environment may pre-register a TPU platform via sitecustomize and
pin JAX_PLATFORMS; overriding selection through jax.config *before any
backend is initialized* (i.e. before the first computation) reliably lands on
CPU anyway, and XLA_FLAGS set here is read at CPU-backend init time.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# persistent XLA compile cache: most of the suite's wall clock is CPU
# compiles of the integrator scan; a warm cache cuts repeat runs several
# fold (opt out with TINSEL_NO_COMPILE_CACHE=1)
from tinsel_tpu.utils.compile_cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

assert jax.devices()[0].platform == "cpu"
assert jax.device_count() >= 8, "expected 8 virtual CPU devices for sharding tests"

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables + tracing caches after every test module.

    The full suite holds ~200 compiled CPU executables alive in one
    process by the end; r5 saw XLA:CPU segfault inside
    backend_compile_and_load at test ~200 (the sharding module) while
    the same module passes standalone — cumulative compiler/executable
    state is the trigger. Modules share almost no jitted functions, so
    per-module clearing costs little and keeps the process lean."""
    yield
    jax.clear_caches()

"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

This is the standard substitute for a fake multi-chip backend: all sharding /
collective tests run against 8 virtual CPU devices
(``--xla_force_host_platform_device_count=8``).
"""

import os

# Force CPU even when the session env points at a TPU: tests must be
# deterministic and runnable anywhere (fp32 on CPU; the real chip is for
# bench.py only). The env var alone is not enough when a site hook
# pre-registers a TPU backend, so also update jax.config before any
# backend is initialized.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite's big compiles (SPMD steps, the
# convergence proofs, full-shape parity) dominate wall time; caching them
# across runs cuts repeat-suite time sharply. min_compile_time 1s keeps the
# thousands of trivial CPU compiles out of the cache.
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def tiny_hierarchy():
    from hgr_tpu.hierarchy import synthetic_hierarchy

    return synthetic_hierarchy(branching=3, levels=4, extra_edges=5, seed=0)

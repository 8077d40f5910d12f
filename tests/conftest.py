"""Test harness configuration.

Tests run on CPU with 8 virtual devices so the multi-chip sharding paths are
exercised without TPU hardware (the driver separately dry-runs the multichip
path; the real chip is reserved for bench.py). Must set env BEFORE jax import.
"""

import os
import sys

# Force-override: the harness pre-sets JAX_PLATFORMS=axon (real TPU tunnel)
# and pre-imports jax via a sitecustomize hook, so plain env vars can be too
# late. Setting XLA_FLAGS still works because the CPU backend initializes
# lazily, and jax.config.update('jax_platforms') works post-import.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_mast3r")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", "tests must not run on the TPU tunnel"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def tiny_model():
    """Shared structure-identical test-scale MASt3R (compile once/session)."""
    from mast3r_slam_tpu.models import MASt3RConfig, MASt3RModel

    return MASt3RModel.create(resolution=64, _test_cfg=MASt3RConfig.tiny())


@pytest.fixture(autouse=True)
def _reset_global_config():
    yield
    from mast3r_slam_tpu import config as _cfg

    _cfg.reset_config()

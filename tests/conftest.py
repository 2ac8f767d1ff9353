"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh (SURVEY §4): hermetic, parallel
to the TPU bench, and enough devices to exercise the shard_map tile/spp
sharding logic under pytest without a pod.

The container's sitecustomize registers the axon TPU PJRT plugin in every
interpreter before pytest can run, and initialising jax with
JAX_PLATFORMS=cpu while that plugin is registered deadlocks.  So when we
detect the plugin env, re-exec pytest once with a clean environment —
from `pytest_configure`, after restoring the captured stdio fds so the
replacement process writes to the real terminal.
"""

from __future__ import annotations

import os
import sys

_REEXEC_MARK = "MRT_TEST_REEXEC"


def _needs_reexec():
    return (os.environ.get(_REEXEC_MARK) != "1"
            and bool(os.environ.get("PALLAS_AXON_POOL_IPS")))


def pytest_configure(config):
    if not _needs_reexec():
        return
    env = dict(os.environ)
    env[_REEXEC_MARK] = "1"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    # TPU-written persistent-cache entries mis-load on CPU hosts.
    env["MRT_NO_COMPILE_CACHE"] = "1"
    flags = env.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    # Restore real stdout/stderr fds before exec'ing the replacement.
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.stop_global_capturing()
    args = list(config.invocation_params.args)
    os.execvpe(sys.executable, [sys.executable, "-m", "pytest"] + args, env)


if not _needs_reexec():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    if "host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)

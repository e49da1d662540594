"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware via
`--xla_force_host_platform_device_count` (the standard JAX trick; SURVEY §4
test pyramid item 4).

This environment registers a TPU PJRT plugin from sitecustomize at
interpreter startup (gated on PALLAS_AXON_POOL_IPS) and force-overrides
``jax_platforms`` to the TPU backend — so tests would all serialise onto the
single real chip (and deadlock against any other process holding it).  Since
sitecustomize has already run by the time pytest starts, the only reliable
way to get a clean multi-device CPU test process is to re-exec pytest once
with the plugin env cleared.  We do it from ``pytest_configure`` so the
capture manager can first restore the real stdout/stderr fds.
"""

import os
import sys

_SENTINEL = "_AIRCRAFT_TPU_TEST_REEXEC"


def _needs_reexec() -> bool:
    return bool(os.environ.get("PALLAS_AXON_POOL_IPS")) and not os.environ.get(_SENTINEL)


def pytest_configure(config):
    if not _needs_reexec():
        return
    # restore the original stdout/stderr file descriptors before exec'ing,
    # otherwise the re-exec'd pytest reports into pytest's capture tempfile
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        try:
            capman.stop_global_capturing()
        except Exception:
            pass
    env = dict(os.environ)
    env[_SENTINEL] = "1"
    env["PALLAS_AXON_POOL_IPS"] = ""  # disable TPU plugin registration
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    sys.stdout.flush()
    sys.stderr.flush()
    os.execve(sys.executable, [sys.executable, "-m", "pytest", *sys.argv[1:]], env)


if not _needs_reexec():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()

# repo root on sys.path so `aircraft_tpu` imports without installation
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip sharding paths are validated on a virtual CPU mesh
(``--xla_force_host_platform_device_count=8``), mirroring how the driver
dry-runs ``__graft_entry__.dryrun_multichip``. Must run before jax imports.
"""

import os

# NB: on this host the axon TPU plugin ignores JAX_PLATFORMS; the legacy
# JAX_PLATFORM_NAME is what actually forces the CPU backend.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))

# XLA compiles are slow on this host; the persistent cache makes re-runs of
# the suite pay compile cost only once.
import jax

# pytest plugins can import jax before this conftest runs, snapshotting the
# harness env (JAX_PLATFORMS=axon -> the remote TPU); force CPU via config,
# which still applies as long as no backend has been initialised.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", str(REPO_ROOT / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

REFERENCE_DIR = Path(os.environ.get("REFERENCE_DIR", "/root/reference"))


@pytest.fixture(scope="session")
def reference_dir():
    if not REFERENCE_DIR.exists():
        pytest.skip("reference repo not mounted")
    return REFERENCE_DIR


@pytest.fixture(scope="session")
def vocab_path():
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu import VOCAB_PATH

    return VOCAB_PATH

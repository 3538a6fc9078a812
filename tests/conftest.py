"""Test config: force an 8-device CPU platform before JAX is imported.

Multi-chip sharding is exercised on a virtual CPU mesh (the driver separately
dry-runs the multi-chip path); parity tests run against the PyTorch reference
on CPU, so tests never need the real TPU.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# Keep everything deterministic & offline.
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")
# Parity tests compare against f64/f32 torch; JAX's default matmul precision
# is bf16-like even on CPU, so force true f32 accumulation.
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")
# Persistent compilation cache: first XLA-CPU compile in this environment
# costs ~100s of process-global setup; cache across test processes.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

REFERENCE_SRC = "/root/reference/src"

# The axon TPU plugin's sitecustomize rewrites JAX_PLATFORMS to "axon,cpu"
# at interpreter start, so the env var alone cannot force CPU — override the
# config directly before any backend is initialised.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Force true-f32 matmuls through the framework's own precision policy (env
# vars can be missed if a pytest plugin imports jax before this conftest).
from multimodalsum_tpu.core.precision import set_default_matmul_precision  # noqa: E402

set_default_matmul_precision("highest")


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_SRC)


def add_reference_to_path():
    if REFERENCE_SRC not in sys.path:
        sys.path.insert(0, REFERENCE_SRC)

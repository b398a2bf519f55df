"""Root conftest: force a virtual 8-device CPU mesh before JAX loads.

All tests run hermetically on CPU (the reference's CI philosophy — see its
``.github/workflows/ci.yml``); sharding/collective tests use the 8 virtual
devices. Real-TPU tests are marked ``tpu`` and skipped off-hardware.
"""

import os
import sys

# Must happen before the first `import jax` anywhere in the test session.
# FORCE cpu: the dev box runs a sitecustomize that registers a tunneled
# remote TPU PJRT plugin ("axon") and rewrites JAX_PLATFORMS=axon inside
# every process — per-op RPC latency makes unit tests hang. Overriding the
# env var is not enough; jax.config.update (below, pre-backend-init) wins.
# Set QTPU_TEST_ON_TPU=1 to run the suite against real hardware.
_FORCE_CPU = not os.environ.get("QTPU_TEST_ON_TPU")
if _FORCE_CPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("TOKENIZERS_PARALLELISM", "false")
os.environ.setdefault("HF_DATASETS_OFFLINE", "1")
os.environ.setdefault("HF_HUB_OFFLINE", "1")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Persistent compile cache makes repeated CPU test runs much faster.
_cache_dir = os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_test_cache")
)
os.makedirs(_cache_dir, exist_ok=True)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

if _FORCE_CPU:
    import jax

    jax.config.update("jax_platforms", "cpu")

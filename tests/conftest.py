"""Test configuration.

Platform selection on this box is decided BEFORE Python starts (an axon
sitecustomize pre-imports jax and locks the backend), so:

- plain ``pytest``: runs on whatever backend the environment provides (the
  single axon TPU chip here — real-hardware correctness);
- ``scripts/test_cpu_mesh.sh``: runs the same suite on a simulated 8-device
  CPU mesh (env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu
  XLA_FLAGS=--xla_force_host_platform_device_count=8) — the standard JAX
  recipe for testing pod topologies without a pod (SURVEY.md §4).  Tests that
  need >=8 devices skip automatically elsewhere.

The env mutations below are no-ops under axon but make the suite portable to
standard JAX installs where conftest runs before backend init.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_threefry_partitionable", True)
# The library's documented operating point (cli.py/bench.py): near-f32
# matmuls.  The TPU default single-pass bf16 fails whiten/unwhiten
# roundtrip and moment tolerances that are exact on the CPU backend.
jax.config.update("jax_default_matmul_precision", "high")

# XLA compiles dominate test time (2-CPU box / remote-compile tunnel): cache
# compiled executables across runs.
_CACHE = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)


requires_multidevice = pytest.mark.skipif(
    len(jax.devices()) < 8,
    reason="needs 8 devices (run via scripts/test_cpu_mesh.sh)",
)

"""Test harness setup: hermetic CPU run with a virtual 8-device mesh.

The machine environment pins JAX_PLATFORMS=axon (the real TPU tunnel) and its
sitecustomize imports jax at interpreter start -- BEFORE this conftest runs --
so env-var overrides alone don't stick. jax.config.update works after import
as long as no backend has initialized yet, which is the case here.
"""

import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

# Belt: env vars (effective when this process starts fresh without the
# axon sitecustomize having imported jax already).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# Braces: config updates (effective even when jax was imported earlier).
jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:  # older jax: the XLA_FLAGS env above covers it
    pass

jax.config.update("jax_default_matmul_precision", "highest")

assert jax.default_backend() == "cpu", (
    "tests must run on the CPU backend; got " + jax.default_backend()
)
assert len(jax.devices()) >= 8, "virtual 8-device CPU mesh unavailable"


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: multi-second equality/serving tests (deselect with -m 'not slow')",
    )

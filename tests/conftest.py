"""Test harness setup: hermetic CPU run with a virtual 8-device mesh.

Must run before the first `import jax` anywhere in the test process.
"""

import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

# Hard override: the machine environment pins JAX_PLATFORMS=axon (the real
# TPU tunnel, which serializes across processes); tests must run hermetically
# on the host CPU with a virtual multi-device mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")

"""Test configuration: force JAX onto a virtual 8-device CPU mesh so
sharding/parallelism tests run without TPU hardware, and keep everything
deterministic."""

import os
import sys

# Force CPU. The ambient sitecustomize (/root/.axon_site) registers and
# INITIALIZES the axon TPU backend at interpreter start, so env vars alone
# don't help — and TPU default-precision convs are bf16, which breaks f32
# parity tests. Re-point the already-initialized jax at a virtual 8-device
# CPU mesh instead.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import jax._src.api as _jax_api  # noqa: E402

jax.config.update("jax_platforms", "cpu")
_jax_api.clear_backends()
assert jax.default_backend() == "cpu", jax.default_backend()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_DIR = "/root/reference"


def reference_path(*parts: str) -> str | None:
    """Path into the read-only reference checkout, if it exists (used only to
    cross-validate against upstream data files like cfgs/test images)."""
    p = os.path.join(REFERENCE_DIR, *parts)
    return p if os.path.exists(p) else None

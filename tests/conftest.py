"""Test configuration: force JAX onto a virtual 8-device CPU mesh so
sharding/parallelism tests run without TPU hardware, and keep everything
deterministic."""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_DIR = "/root/reference"


def reference_path(*parts: str) -> str | None:
    """Path into the read-only reference checkout, if it exists (used only to
    cross-validate against upstream data files like cfgs/test images)."""
    p = os.path.join(REFERENCE_DIR, *parts)
    return p if os.path.exists(p) else None

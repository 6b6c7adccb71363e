"""Test configuration: force JAX onto a virtual 8-device CPU mesh so
sharding/parallelism tests run without TPU hardware, and keep everything
deterministic.

Fast/slow split: tests marked ``@pytest.mark.slow`` (interpret-mode
full-net kernel runs, the 500-step training fixture, reference-binary
builds) are DESELECTED by default so a plain ``pytest -q tests/`` stays
under ~5 minutes on this one-core box. Run them with ``--slow`` or
``YOLO2_RUN_SLOW=1`` (CI / pre-release); both suites must stay green."""

import os
import sys

import pytest

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

def pytest_addoption(parser):
    parser.addoption("--slow", action="store_true", default=False,
                     help="also run tests marked slow")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: expensive test (interpret-mode full net, long "
        "training, reference-binary build); excluded by default")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--slow") or os.environ.get("YOLO2_RUN_SLOW") == "1":
        return
    skip = pytest.mark.skip(
        reason="slow (use --slow or YOLO2_RUN_SLOW=1)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


REFERENCE_DIR = "/root/reference"


def reference_path(*parts: str) -> str | None:
    """Path into the read-only reference checkout, if it exists (used only to
    cross-validate against upstream data files like cfgs/test images)."""
    p = os.path.join(REFERENCE_DIR, *parts)
    return p if os.path.exists(p) else None

"""On-hardware test environment.

Unlike `tests/` (which forces CPU + x64 so everything runs anywhere), this
suite runs against the real accelerator and skips itself entirely when none
is present.  Run with:  python -m pytest tests_tpu/ -q
"""

import jax
import pytest


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def pytest_collection_modifyitems(config, items):
    if _on_tpu():
        return
    skip = pytest.mark.skip(reason="no TPU present")
    for item in items:
        item.add_marker(skip)

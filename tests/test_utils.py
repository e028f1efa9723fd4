"""Utility-layer tests: profiling hooks, backend registry hygiene, and
public API surface (the Aqua QA analogue, reference `test/runtests.jl:3-6`)."""

import jax.numpy as jnp
import numpy as np

import dprast
from dprast.ops import dispatch
from dprast.utils import profiling
from dprast.utils.testing import fixtures


def test_public_api_surface():
    for name in dprast.__all__:
        assert hasattr(dprast, name), name
    assert set(dprast.available_backends()) >= {"xla", "matmul", "pallas",
                                                "tiled"}
    assert dprast.default_backend() == "auto"


def test_resolve_consistency():
    """Every registered backend that claims support must actually run the
    canonical small case."""
    fx = fixtures(seed=0, n_points=8, batch_size=2, n_in=2, n_out=2)
    for name in dispatch.available_backends():
        if not dispatch._REGISTRY[name][2](2, (8, 8)):
            continue
        out = dispatch.fwd_fn(name)(
            (8, 8), *(jnp.asarray(v, jnp.float32) for v in fx.values()))
        assert out.shape == (2, 8, 8), name
        assert np.all(np.isfinite(np.asarray(out))), name


def test_time_fn_runs():
    ms = profiling.time_fn(lambda c: c + 1.0, iters=4)
    assert ms >= 0.0


def test_annotate_and_trace(tmp_path):
    with profiling.annotate("unit-test"):
        x = jnp.ones((4,)) * 2
    assert float(x.sum()) == 8.0

"""Multi-host helpers on the virtual 8-device CPU mesh."""

import jax
import numpy as np

import dprast
from dprast.parallel import multihost, raster_sharded
from dprast.utils.testing import fixtures


def test_initialize_is_safe_single_process():
    multihost.initialize()  # must not raise in a single-process test env
    assert jax.process_count() == 1


def test_pod_mesh_spans_all_devices():
    mesh = multihost.pod_mesh()
    assert mesh.devices.size == jax.device_count()
    assert set(mesh.axis_names) == {"poses", "points"}


def test_pod_mesh_end_to_end():
    mesh = multihost.pod_mesh()
    b = int(np.lcm(mesh.shape["poses"], 2))
    fx = fixtures(seed=2, n_points=23, batch_size=b, n_in=3, n_out=2)
    out = raster_sharded((16, 16), **fx, mesh=mesh)
    ref = dprast.raster((16, 16), **fx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-9,
                               atol=1e-9)

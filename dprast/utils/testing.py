"""Shared test fixtures, mirroring the reference's `test/data.jl`:
random points / rotations / orthographic projections / translations /
per-pose backgrounds & weights / per-point weights, with a batch size chosen
coprime to the device count to exercise uneven sharding (the reference keeps
it coprime to the thread count, `test/data.jl:5-11`)."""

from __future__ import annotations

import numpy as np


def batch_size_coprime_to(n: int, minimum: int = 6) -> int:
    b = max(minimum, 2)
    while np.gcd(b, max(n, 1)) != 1:
        b += 1
    return b


def random_rotation(rng: np.random.Generator, n: int) -> np.ndarray:
    """Random proper rotation matrix via QR (the Rotations.jl analogue)."""
    q, r = np.linalg.qr(rng.standard_normal((n, n)))
    q *= np.sign(np.diag(r))
    if np.linalg.det(q) < 0:
        q[:, 0] = -q[:, 0]
    return q


def fixtures(seed=0, n_points=10, batch_size=None, n_in=3, n_out=None,
             devices=8):
    """Random-but-deterministic argument set, as a dict of numpy arrays."""
    rng = np.random.default_rng(seed)
    if batch_size is None:
        batch_size = batch_size_coprime_to(devices)
    if n_out is None:
        n_out = n_in
    rotations = np.stack(
        [random_rotation(rng, n_in) for _ in range(batch_size)])
    if n_out < n_in:
        # orthographic projection: drop rows (reference test/data.jl:13-16
        # uses P @ R with P = [I 0])
        rotations = rotations[:, :n_out, :]
    return dict(
        points=0.4 * rng.standard_normal((n_points, n_in)),
        rotation=rotations,
        translation=0.1 * rng.standard_normal((batch_size, n_out)),
        background=0.1 * rng.standard_normal(batch_size),
        out_weight=rng.uniform(0.1, 10.0, batch_size),
        point_weight=rng.uniform(0.1, 10.0, n_points),
    )


def tree_allclose(a, b, rtol=1e-5, atol=1e-7):
    """Field-wise comparison of PullbackResult/RasterGrads-like tuples
    (the reference's `cuda_cpu_agree`, `test/util.jl:6-34`)."""
    import jax

    flat_a, _ = jax.tree.flatten(a)
    flat_b, _ = jax.tree.flatten(b)
    assert len(flat_a) == len(flat_b)
    return all(
        np.allclose(np.asarray(x), np.asarray(y), rtol=rtol, atol=atol)
        for x, y in zip(flat_a, flat_b))

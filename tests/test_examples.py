"""Smoke tests for the example applications (tiny step counts): the
reference ships its logo demo as living documentation; these keep ours
executable."""

import importlib.util
import os
import sys

import jax

_EX = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))), "examples")


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(_EX, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_langevin_demo_decreases_loss():
    m = _load("fit_langevin")
    target = m.make_target(jax.random.PRNGKey(42))
    _, _, _, hist = m.langevin_fit(target, steps=40, log_every=1000)
    assert hist[-1][1] < hist[0][1]


def test_tomography_demo_runs(monkeypatch):
    m = _load("tomography")
    monkeypatch.setattr(sys, "argv", ["tomography", "--steps", "3"])
    rots = m.view_matrices()
    assert rots.shape == (m.N_VIEWS, 2, 3)
    truth = m.make_truth(jax.random.PRNGKey(1))
    img = m.blur(__import__("dprast").raster(m.GRID, truth, rots,
                                             jax.numpy.zeros((m.N_VIEWS, 2))))
    assert img.shape == (m.N_VIEWS,) + m.GRID


def test_optax_training_loop():
    """Ecosystem fit: dprast.raster composes with optax optimisers (the
    standard JAX training stack) through jax.grad — a target-image fit
    with adam must reduce the loss."""
    import jax.numpy as jnp
    import numpy as np
    import pytest
    optax = pytest.importorskip("optax")

    import dprast

    grid = (32, 32)
    rng = np.random.default_rng(1)
    rot = jnp.eye(2)[None]
    tr = jnp.zeros((1, 2))
    target_pts = jnp.asarray(rng.uniform(-0.7, 0.7, (50, 2)), jnp.float32)
    kern = jnp.asarray([0.25, 0.5, 0.25])

    def blur(img):
        img = jnp.apply_along_axis(
            lambda r: jnp.convolve(r, kern, "same"), 1, img)
        return jnp.apply_along_axis(
            lambda r: jnp.convolve(r, kern, "same"), 2, img)

    target = blur(dprast.raster(grid, target_pts, rot, tr))

    def loss_fn(pts):
        return jnp.mean((blur(dprast.raster(grid, pts, rot, tr))
                         - target) ** 2)

    opt = optax.adam(3e-2)
    pts = jnp.asarray(rng.uniform(-0.7, 0.7, (50, 2)), jnp.float32)
    state = opt.init(pts)

    @jax.jit
    def step(pts, state):
        loss, g = jax.value_and_grad(loss_fn)(pts)
        updates, state = opt.update(g, state)
        return optax.apply_updates(pts, updates), state, loss

    losses = []
    for _ in range(60):
        pts, state, loss = step(pts, state)
        losses.append(float(loss))
    assert losses[-1] < 0.7 * losses[0], (losses[0], losses[-1])


def test_sharded_fit_demo_decreases_loss():
    """The multi-device fitting demo must reduce its loss on the virtual
    CPU mesh (grads through shard_map; uneven views vs mesh axes)."""
    m = _load("sharded_fit")
    _, hist = m.fit(steps=25, log_every=1000)
    assert hist[-1][1] < hist[0][1], hist

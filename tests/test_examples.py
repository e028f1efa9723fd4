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

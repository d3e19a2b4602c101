"""Render paths: native C++ ray tracer (when a toolchain exists) and the
numpy orthographic fallback both produce plausible frames
[ref: env_bases.py · BaseBulletEnv.render('rgb_array')]."""

import numpy as np
import pytest

import pybulletgym_tpu as pg
from pybulletgym_tpu.utils.render import _render_state_ortho, render_state_native


@pytest.fixture(scope="module")
def hopper_state():
    env = pg.make_batched("HopperPyBulletEnv-v0", 2, backend="xla")
    s = env.reset(seed=0)
    a = np.zeros((2, 3), np.float32)
    for _ in range(3):
        s = env.step(s, a)
    return env.task, s


def test_native_renderer(hopper_state):
    task, s = hopper_state
    img = render_state_native(task, s)
    if img is None:
        pytest.skip("no C++ toolchain for the native renderer")
    assert img.shape == (240, 320, 3) and img.dtype == np.uint8
    # scene has sky, floor checkerboard, and robot: many distinct colors
    assert len(np.unique(img.reshape(-1, 3), axis=0)) > 50


def test_ortho_fallback(hopper_state):
    task, s = hopper_state
    img = _render_state_ortho(task, s)
    assert img.shape == (240, 320, 3) and img.dtype == np.uint8
    assert (img < 250).any(), "fallback must draw something"


def test_gym_adapter_render():
    env = pg.make("InvertedPendulumPyBulletEnv-v0")
    env.reset(seed=0)
    img = env.render()
    assert img.shape == (240, 320, 3)

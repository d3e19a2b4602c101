"""Golden-trajectory regression: fixed seed + fixed actions must reproduce
the recorded rollout (tolerance-bounded). Re-record with
tools/record_goldens.py after an intentional behavior change; fixtures
recorded from the PyBullet reference drop into the same harness
(SURVEY §4)."""

import glob
import os

import numpy as np
import pytest

import pybulletgym_tpu as pg

pytestmark = pytest.mark.slow

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
GOLDENS = sorted(glob.glob(os.path.join(GOLDEN_DIR, "*.npz")))


def _env_id_of(path):
    name = os.path.basename(path)[:-4]
    return name[:-4] if name.endswith(".cpu") else name


@pytest.mark.parametrize(
    "path", GOLDENS, ids=[os.path.basename(p)[:-4] for p in GOLDENS]
)
def test_golden_rollout(path):
    data = np.load(path)
    env_id = _env_id_of(path)
    B, n_steps, seed = int(data["batch"]), int(data["n_steps"]), int(data["seed"])

    import jax

    if "platform" in data and str(data["platform"]) != jax.default_backend():
        pytest.skip(
            f"golden recorded on {data['platform']}, running on "
            f"{jax.default_backend()} — exact replay is platform-specific"
        )

    env = pg.make_batched(env_id, B, backend="xla")
    s = env.reset(seed=seed)
    rng = np.random.default_rng(seed)
    acts = rng.uniform(-1, 1, (n_steps, B, env.action_size)).astype(np.float32)

    # engine-recorded goldens are exact on the same platform; reference
    # (PyBullet) goldens get contact-tolerance slack
    exact = str(data["source"]) == "pybulletgym_tpu"
    atol = 1e-5 if exact else 1e-2

    for t, a in enumerate(acts):
        s = env.step(s, a)
        np.testing.assert_allclose(
            np.asarray(s.obs), data["obs"][t], atol=atol,
            err_msg=f"{env_id} obs diverged at step {t}",
        )
        np.testing.assert_allclose(
            np.asarray(s.reward), data["reward"][t], atol=atol,
            err_msg=f"{env_id} reward diverged at step {t}",
        )
        np.testing.assert_array_equal(np.asarray(s.terminated), data["terminated"][t])


def test_goldens_exist():
    assert len(GOLDENS) >= 8, (
        "golden fixtures missing — run tools/record_goldens.py"
    )

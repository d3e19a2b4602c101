"""Host-side debug rendering (the reference's `render('rgb_array')` is a
C++ TinyRenderer rasterization [ref: env_bases.py · BaseBulletEnv.render];
rendering is explicitly off the training path here, SURVEY §3.4).

A tiny orthographic software rasterizer over the model's primitive geoms:
good enough to eyeball a rollout, zero dependencies beyond numpy.
"""

from __future__ import annotations

import numpy as np

from pybulletgym_tpu.models.schema import GeomType
from pybulletgym_tpu.ops import dynamics as dyn


def render_state(task, state, width: int = 320, height: int = 240, env: int = 0):
    """Orthographic side view (x-z plane) of one env in the batch."""
    import jax.numpy as jnp

    m = task.model
    q = [state.q[i, env] for i in range(m.nq)]
    v = [state.v[i, env] for i in range(m.nv)]
    fk = dyn.forward_kinematics(m, q, v, with_inertia=False)
    img = np.full((height, width, 3), 255, np.uint8)

    # camera follows the base body, 5 m wide view
    bx = float(fk.p[0][0])
    scale = width / 5.0
    x0, z0 = bx - 2.5, -0.5

    def to_px(x, z):
        return int((x - x0) * scale), height - int((z - z0) * scale)

    # ground line
    gx, gz = to_px(x0, 0.0)
    _, gz = to_px(0, 0)
    if 0 <= gz < height:
        img[gz:min(gz + 2, height), :, :] = (120, 180, 120)

    for g in m.geoms:
        if g.body == -1:
            continue
        R = np.array([float(x) for x in fk.R[g.body]]).reshape(3, 3)
        p = np.array([float(x) for x in fk.p[g.body]])
        gp = p + R @ g.pos
        r = float(g.size[0]) if len(g.size) else 0.05
        if g.gtype in (GeomType.CAPSULE, GeomType.CYLINDER):
            Rg = R @ _quat_mat(g.quat)
            axis = Rg @ np.array([0, 0, float(g.size[1])])
            _line(img, to_px(gp[0] - axis[0], gp[2] - axis[2]),
                  to_px(gp[0] + axis[0], gp[2] + axis[2]),
                  max(1, int(r * scale)))
        else:
            cx, cz = to_px(gp[0], gp[2])
            _disk(img, cx, cz, max(1, int(r * scale)))
    return img


def _quat_mat(q):
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def _disk(img, cx, cz, r):
    h, w, _ = img.shape
    for dz in range(-r, r + 1):
        for dx in range(-r, r + 1):
            if dx * dx + dz * dz <= r * r:
                x, z = cx + dx, cz + dz
                if 0 <= x < w and 0 <= z < h:
                    img[z, x] = (70, 70, 200)


def _line(img, p0, p1, thickness=1):
    n = max(abs(p1[0] - p0[0]), abs(p1[1] - p0[1]), 1)
    for i in range(n + 1):
        t = i / n
        x = int(p0[0] + t * (p1[0] - p0[0]))
        z = int(p0[1] + t * (p1[1] - p0[1]))
        _disk(img, x, z, thickness)

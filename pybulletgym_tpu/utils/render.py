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

# geom colors cycle (rgb in [0,1])
_PALETTE = np.array([
    [0.85, 0.35, 0.30], [0.30, 0.45, 0.85], [0.90, 0.75, 0.25],
    [0.45, 0.75, 0.40], [0.65, 0.40, 0.75], [0.35, 0.75, 0.75],
])


def _geom_rows(task, state, env):
    """World-space primitive buffer (n, 24) for the native ray tracer."""
    m = task.model
    q = [state.q[i, env] for i in range(m.nq)]
    v = [state.v[i, env] for i in range(m.nv)]
    fk = dyn.forward_kinematics(m, q, v, with_inertia=False)
    rows = []
    for gi, g in enumerate(m.geoms):
        if g.body == -1:
            continue
        R = np.array([float(x) for x in fk.R[g.body]]).reshape(3, 3)
        p = np.array([float(x) for x in fk.p[g.body]])
        Rg = R @ _quat_mat(g.quat)
        gp = p + R @ g.pos
        row = np.zeros(24, np.float32)
        color = _PALETTE[gi % len(_PALETTE)]
        row[20:23] = color
        if g.gtype == GeomType.SPHERE:
            row[0], row[1] = 1, float(g.size[0])
            row[2:5] = gp
        elif g.gtype in (GeomType.CAPSULE, GeomType.CYLINDER):
            axis = Rg @ np.array([0.0, 0.0, float(g.size[1])])
            row[0], row[1] = 2, float(g.size[0])
            row[2:5] = gp - axis
            row[5:8] = gp + axis
        elif g.gtype == GeomType.BOX:
            row[0] = 4
            row[2:5] = gp
            row[8:17] = Rg.reshape(-1)
            row[17:20] = np.asarray(g.size[:3], np.float32)
        else:
            continue
        rows.append(row)
    return np.stack(rows) if rows else np.zeros((0, 24), np.float32)


def render_state_native(task, state, width: int = 320, height: int = 240,
                        env: int = 0, yaw: float = 0.0, pitch: float = -30.0,
                        dist: float = 3.0):
    """Perspective follow-camera render via the C++ ray tracer — the
    reference camera (dist 3, yaw 0, pitch −30, 320x240)
    [ref: env_bases.py · BaseBulletEnv.render]. Returns None when no
    native toolchain is available."""
    import ctypes

    from pybulletgym_tpu.native import load_render_lib

    lib = load_render_lib()
    if lib is None:
        return None
    geoms = np.ascontiguousarray(_geom_rows(task, state, env), np.float32)
    base = task.model.body_index("torso") if _has_torso(task.model) else 0
    m = task.model
    q = [state.q[i, env] for i in range(m.nq)]
    v = [state.v[i, env] for i in range(m.nv)]
    fk = dyn.forward_kinematics(m, q, v, with_inertia=False)
    target = np.array([float(x) for x in fk.p[base]], np.float32)
    out = np.empty((height, width, 3), np.uint8)
    lib.render_rgb(
        geoms.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(geoms),
        target.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_float(dist), ctypes.c_float(yaw), ctypes.c_float(pitch),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), width, height,
    )
    return out


def _has_torso(model) -> bool:
    return any(b.name == "torso" for b in model.bodies)


def render_state(task, state, width: int = 320, height: int = 240, env: int = 0):
    """Render one env: native C++ perspective ray tracer when available,
    numpy orthographic fallback otherwise."""
    img = render_state_native(task, state, width, height, env)
    if img is not None:
        return img
    return _render_state_ortho(task, state, width, height, env)


def _render_state_ortho(task, state, width: int = 320, height: int = 240, env: int = 0):
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

"""Generate models/assets/atlas.urdf — a deviation-flagged stand-in for
the Boston Dynamics Atlas v4 URDF the reference loads for
AtlasPyBulletEnv-v0 [ref: pybulletgym/envs/roboschool/robots/locomotors —
URDFBasedRobot('atlas/atlas_v4_with_multisense.urdf'), SURVEY §2.4].

The real asset is not on disk and there is no network (SURVEY App. B), so
this authored model keeps the reference's JOINT ROSTER AND NAMES (30
actuated dofs: 3 back, 1 neck, 2x6 legs, 2x7 arms, Atlas v4 naming), its
topology, and Atlas-scale masses/limits/efforts, with simplified
capsule/sphere/box collision geometry. When the real URDF appears, drop it
in and diff — the env layer reads everything from the model.

Run:  python tools/gen_atlas_urdf.py   (rewrites models/assets/atlas.urdf)
"""

import os

OUT = os.path.join(os.path.dirname(__file__), "..", "pybulletgym_tpu",
                   "models", "assets", "atlas.urdf")


def capsule_inertia(m, r, l):
    """Solid-cylinder approximation, axis = local z before rotation."""
    ia = 0.5 * m * r * r
    ip = m * (l * l / 12.0 + r * r / 4.0)
    return ip, ip, ia


def sphere_inertia(m, r):
    i = 0.4 * m * r * r
    return i, i, i


def box_inertia(m, sx, sy, sz):
    return (m * (sy * sy + sz * sz) / 12.0,
            m * (sx * sx + sz * sz) / 12.0,
            m * (sx * sx + sy * sy) / 12.0)


def fmt(x):
    return f"{x:.6g}"


class U:
    def __init__(self):
        self.links = []
        self.joints = []

    def link(self, name, mass, inertia, com=(0, 0, 0), geom=None):
        ixx, iyy, izz = inertia
        g = ""
        if geom is not None:
            kind, name_g, params, origin = geom
            ox, oy, oz, rr, rp, ry = origin
            if kind == "sphere":
                shape = f'<sphere radius="{fmt(params[0])}"/>'
            elif kind == "capsule":
                shape = (f'<capsule radius="{fmt(params[0])}" '
                         f'length="{fmt(params[1])}"/>')
            elif kind == "box":
                shape = ('<box size="'
                         + " ".join(fmt(p) for p in params) + '"/>')
            g = f"""
    <collision name="{name_g}">
      <origin xyz="{fmt(ox)} {fmt(oy)} {fmt(oz)}" rpy="{fmt(rr)} {fmt(rp)} {fmt(ry)}"/>
      <geometry>{shape}</geometry>
    </collision>"""
        self.links.append(f"""  <link name="{name}">
    <inertial>
      <origin xyz="{fmt(com[0])} {fmt(com[1])} {fmt(com[2])}"/>
      <mass value="{fmt(mass)}"/>
      <inertia ixx="{fmt(ixx)}" ixy="0" ixz="0" iyy="{fmt(iyy)}" iyz="0" izz="{fmt(izz)}"/>
    </inertial>{g}
  </link>""")

    def joint(self, name, parent, child, xyz, axis, lo, hi, effort, vel=12.0,
              damping=0.1, jtype="revolute"):
        self.joints.append(f"""  <joint name="{name}" type="{jtype}">
    <parent link="{parent}"/>
    <child link="{child}"/>
    <origin xyz="{fmt(xyz[0])} {fmt(xyz[1])} {fmt(xyz[2])}"/>
    <axis xyz="{fmt(axis[0])} {fmt(axis[1])} {fmt(axis[2])}"/>
    <limit lower="{fmt(lo)}" upper="{fmt(hi)}" effort="{fmt(effort)}" velocity="{fmt(vel)}"/>
    <dynamics damping="{fmt(damping)}"/>
  </joint>""")


def build():
    u = U()
    Z, Y, X = (0, 0, 1), (0, 1, 0), (1, 0, 0)

    # ---- torso chain --------------------------------------------------
    u.link("pelvis", 9.5, capsule_inertia(9.5, 0.12, 0.16),
           geom=("capsule", "pelvis", (0.12, 0.16), (0, 0, 0, 1.5708, 0, 0)))
    u.link("ltorso", 2.4, sphere_inertia(2.4, 0.09),
           geom=("sphere", "ltorso", (0.09,), (0, 0, 0.1, 0, 0, 0)))
    u.link("mtorso", 0.8, sphere_inertia(0.8, 0.07))
    u.link("utorso", 52.0, box_inertia(52.0, 0.30, 0.36, 0.50),
           com=(0.02, 0, 0.22),
           geom=("box", "utorso", (0.30, 0.36, 0.50), (0.02, 0, 0.22, 0, 0, 0)))
    u.link("head", 1.4, sphere_inertia(1.4, 0.11),
           geom=("sphere", "head", (0.11,), (0.05, 0, 0.02, 0, 0, 0)))
    u.joint("back_bkz", "pelvis", "ltorso", (-0.0125, 0, 0), Z,
            -0.664, 0.664, 106)
    u.joint("back_bky", "ltorso", "mtorso", (0, 0, 0.162), Y,
            -0.219, 0.538, 445)
    u.joint("back_bkx", "mtorso", "utorso", (0, 0, 0.05), X,
            -0.523, 0.523, 300)
    u.joint("neck_ry", "utorso", "head", (0.216, 0, 0.53), Y,
            -0.602, 1.14, 25)

    # ---- legs (s=+1 left, -1 right) ----------------------------------
    for s, p in ((1, "l"), (-1, "r")):
        u.link(f"{p}_uglut", 1.96, sphere_inertia(1.96, 0.08))
        u.link(f"{p}_lglut", 0.9, sphere_inertia(0.9, 0.08),
               geom=("sphere", f"{p}_lglut", (0.08,), (0.01, s * 0.02, -0.02, 0, 0, 0)))
        u.link(f"{p}_uleg", 8.2, capsule_inertia(8.2, 0.09, 0.28),
               com=(0, 0, -0.21),
               geom=("capsule", f"{p}_uleg", (0.09, 0.28), (-0.01, 0, -0.21, 0, 0, 0)))
        u.link(f"{p}_lleg", 4.5, capsule_inertia(4.5, 0.075, 0.32),
               com=(0, 0, -0.21),
               geom=("capsule", f"{p}_lleg", (0.075, 0.32), (0, 0, -0.21, 0, 0, 0)))
        u.link(f"{p}_talus", 0.12, sphere_inertia(0.12, 0.05))
        u.link(f"{p}_foot", 2.4, box_inertia(2.4, 0.26, 0.14, 0.05),
               com=(0.045, 0, -0.045),
               geom=("box", f"{p}_foot_box", (0.26, 0.14, 0.05),
                     (0.045, 0, -0.0525, 0, 0, 0)))
        u.joint(f"{p}_leg_hpz", "pelvis", f"{p}_uglut", (0, s * 0.089, 0), Z,
                -0.174 if s > 0 else -0.786, 0.786 if s > 0 else 0.174, 275)
        u.joint(f"{p}_leg_hpx", f"{p}_uglut", f"{p}_lglut", (0, 0, 0), X,
                -0.47 if s > 0 else -0.495, 0.495 if s > 0 else 0.47, 530)
        u.joint(f"{p}_leg_hpy", f"{p}_lglut", f"{p}_uleg",
                (0.05, s * 0.0225, -0.066), Y, -1.612, 0.658, 840)
        u.joint(f"{p}_leg_kny", f"{p}_uleg", f"{p}_lleg",
                (-0.05, 0, -0.374), Y, 0.0, 2.356, 890)
        u.joint(f"{p}_leg_aky", f"{p}_lleg", f"{p}_talus",
                (0, 0, -0.422), Y, -1.0, 0.7, 740)
        u.joint(f"{p}_leg_akx", f"{p}_talus", f"{p}_foot", (0, 0, 0), X,
                -0.8, 0.8, 360)

    # ---- arms ---------------------------------------------------------
    for s, p in ((1, "l"), (-1, "r")):
        u.link(f"{p}_clav", 2.4, capsule_inertia(2.4, 0.07, 0.14),
               geom=("capsule", f"{p}_clav", (0.07, 0.14),
                     (0, s * 0.048, -0.084, s * 1.5708, 0, 0)))
        u.link(f"{p}_scap", 2.6, sphere_inertia(2.6, 0.08),
               geom=("sphere", f"{p}_scap", (0.08,), (0, 0, 0, 0, 0, 0)))
        u.link(f"{p}_uarm", 2.8, capsule_inertia(2.8, 0.065, 0.18),
               com=(0, s * 0.09, 0),
               geom=("capsule", f"{p}_uarm", (0.065, 0.18),
                     (0, s * 0.09, 0, s * 1.5708, 0, 0)))
        u.link(f"{p}_larm", 2.6, sphere_inertia(2.6, 0.07),
               geom=("sphere", f"{p}_larm", (0.07,), (0, 0, 0, 0, 0, 0)))
        u.link(f"{p}_ufarm", 1.5, capsule_inertia(1.5, 0.055, 0.15),
               com=(0, s * 0.09, 0),
               geom=("capsule", f"{p}_ufarm", (0.055, 0.15),
                     (0, s * 0.09, 0, s * 1.5708, 0, 0)))
        u.link(f"{p}_lfarm", 1.1, sphere_inertia(1.1, 0.06),
               geom=("sphere", f"{p}_lfarm", (0.06,), (0, 0, 0, 0, 0, 0)))
        u.link(f"{p}_hand", 0.5, sphere_inertia(0.5, 0.055),
               geom=("sphere", f"{p}_hand", (0.055,), (0, s * 0.04, 0, 0, 0, 0)))
        u.joint(f"{p}_arm_shz", "utorso", f"{p}_clav",
                (0.134, s * 0.2256, 0.4), Z,
                -1.5708 if s > 0 else -0.785, 0.785 if s > 0 else 1.5708, 87)
        u.joint(f"{p}_arm_shx", f"{p}_clav", f"{p}_scap",
                (0, s * 0.11, -0.245), X, -1.5708, 1.5708, 99)
        u.joint(f"{p}_arm_ely", f"{p}_scap", f"{p}_uarm",
                (0, s * 0.047, 0), Y, 0.0, 3.14159, 63)
        u.joint(f"{p}_arm_elx", f"{p}_uarm", f"{p}_larm",
                (0, s * 0.187, -0.013), X,
                0.0 if s > 0 else -2.356, 2.356 if s > 0 else 0.0, 112)
        u.joint(f"{p}_arm_wry", f"{p}_larm", f"{p}_ufarm",
                (0, s * 0.01, 0.013), Y, -3.011, 3.011, 25)
        u.joint(f"{p}_arm_wrx", f"{p}_ufarm", f"{p}_lfarm",
                (0, s * 0.1885, 0), X, -1.762, 1.762, 25)
        u.joint(f"{p}_arm_wry2", f"{p}_lfarm", f"{p}_hand",
                (0, s * 0.058, 0), Y, -2.96, 2.96, 8)

    body = "\n".join(u.links) + "\n" + "\n".join(u.joints)
    return f'<robot name="atlas">\n{body}\n</robot>\n'


if __name__ == "__main__":
    xml = build()
    with open(OUT, "w") as f:
        f.write(xml)
    print("wrote", OUT, len(xml), "bytes")

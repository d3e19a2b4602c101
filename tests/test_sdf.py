"""SDF importer: extract static world geoms (the reference's stadium
ground path [ref: scene_stadium.py — p.loadSDF(plane_stadium.sdf)])."""

import numpy as np

from pybulletgym_tpu.models.schema import GeomType
from pybulletgym_tpu.models.sdf import parse_sdf_world_geoms

SDF = """
<sdf version="1.6">
  <world name="stadium">
    <model name="plane">
      <link name="ground">
        <collision name="floor">
          <geometry><plane><normal>0 0 1</normal></plane></geometry>
        </collision>
      </link>
    </model>
    <model name="wall">
      <pose>2 0 0 0 0 0</pose>
      <link name="w">
        <collision name="wall_box">
          <pose>0 1 0.5 0 0 0</pose>
          <geometry><box><size>0.2 4 1</size></box></geometry>
        </collision>
        <visual name="decor"><geometry><mesh/></geometry></visual>
      </link>
    </model>
  </world>
</sdf>
"""


def test_extracts_plane_and_box():
    geoms = parse_sdf_world_geoms(SDF)
    assert [g.gtype for g in geoms] == [GeomType.PLANE, GeomType.BOX]
    floor, wall = geoms
    assert floor.body == -1 and wall.body == -1
    np.testing.assert_allclose(wall.pos, [2, 1, 0.5])
    np.testing.assert_allclose(wall.size, [0.1, 2, 0.5])

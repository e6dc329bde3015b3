"""GLB scene exporter tests: container structure + JSON/buffer parsing."""

import json
import struct

import numpy as np

from happypose_tpu.meshes.database import MeshDataBase
from happypose_tpu.meshes.io import make_box_mesh, make_uv_sphere
from happypose_tpu.visualization.gltf_export import (
    GlbSceneWriter,
    export_scene_glb,
)


def _parse_glb(data: bytes):
    magic, version, total = struct.unpack("<4sII", data[:12])
    assert magic == b"glTF" and version == 2
    assert total == len(data)
    jlen, jtype = struct.unpack("<I4s", data[12:20])
    assert jtype == b"JSON"
    gltf = json.loads(data[20 : 20 + jlen])
    off = 20 + jlen
    blen, btype = struct.unpack("<I4s", data[off : off + 8])
    assert btype == b"BIN\x00"
    binary = data[off + 8 : off + 8 + blen]
    return gltf, binary


class TestGlbWriter:
    def test_valid_container(self, tmp_path):
        w = GlbSceneWriter()
        m = make_box_mesh((0.04, 0.03, 0.05))
        T = np.eye(4)
        T[:3, 3] = [0.1, 0.2, 0.5]
        w.add_instance("box", m.vertices, m.faces, T, m.vertex_colors)
        p = tmp_path / "scene.glb"
        w.save(p)
        gltf, binary = _parse_glb(p.read_bytes())
        assert gltf["buffers"][0]["byteLength"] <= len(binary)
        assert len(gltf["nodes"]) == 1
        # node matrix is column-major: translation in elements 12..14
        mtx = gltf["nodes"][0]["matrix"]
        np.testing.assert_allclose(mtx[12:15], [0.1, 0.2, 0.5])

    def test_positions_roundtrip(self, tmp_path):
        w = GlbSceneWriter()
        m = make_box_mesh((0.04, 0.03, 0.05))
        w.add_instance("box", m.vertices, m.faces, np.eye(4))
        gltf, binary = _parse_glb(w.to_bytes())
        acc = gltf["accessors"][gltf["meshes"][0]["primitives"][0]
                               ["attributes"]["POSITION"]]
        view = gltf["bufferViews"][acc["bufferView"]]
        pos = np.frombuffer(
            binary[view["byteOffset"] : view["byteOffset"] + view["byteLength"]],
            np.float32,
        ).reshape(-1, 3)
        np.testing.assert_allclose(pos, m.vertices, rtol=1e-6)
        np.testing.assert_allclose(acc["min"], m.vertices.min(0), rtol=1e-5)

    def test_shared_geometry(self):
        w = GlbSceneWriter()
        m = make_box_mesh((0.04, 0.03, 0.05))
        for i in range(3):
            T = np.eye(4)
            T[0, 3] = 0.1 * i
            w.add_instance(f"box_{i}", m.vertices, m.faces, T,
                           mesh_key="box")
        gltf, _ = _parse_glb(w.to_bytes())
        assert len(gltf["meshes"]) == 1  # geometry deduped
        assert len(gltf["nodes"]) == 3

    def test_export_scene_with_cameras(self, tmp_path):
        db = MeshDataBase(meshes={
            "obj_000001": make_uv_sphere(0.04, 8, 12),
            "obj_000002": make_box_mesh((0.035, 0.025, 0.045)),
        })
        poses = np.broadcast_to(np.eye(4), (3, 4, 4)).copy()
        poses[:, 2, 3] = [0.4, 0.5, 0.6]
        cams = np.broadcast_to(np.eye(4), (2, 4, 4)).copy()
        p = tmp_path / "scene.glb"
        export_scene_glb(
            p, db, ["obj_000001", "obj_000002", "obj_000001"], poses,
            camera_poses=cams,
        )
        gltf, _ = _parse_glb(p.read_bytes())
        assert len(gltf["nodes"]) == 5  # 3 objects + 2 cameras
        # obj_000001 used twice but stored once; + box + frustum = 3 meshes
        assert len(gltf["meshes"]) == 3

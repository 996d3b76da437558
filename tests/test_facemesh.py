import numpy as np
import pytest

from audio2face_tpu.utils.facemesh import FaceMesh, load_obj, save_obj


@pytest.fixture
def tri_mesh(tmp_path):
    verts = np.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [1.0, 1.0, 0.5]])
    faces = np.array([[0, 1, 2], [1, 3, 2]])
    p = tmp_path / "mesh.obj"
    save_obj(str(p), verts, faces)
    return verts, faces, str(p)


def test_obj_roundtrip(tri_mesh):
    verts, faces, path = tri_mesh
    v, f = load_obj(path)
    np.testing.assert_allclose(v, verts, atol=1e-7)
    np.testing.assert_array_equal(f, faces)


def test_obj_with_texture_indices_and_quads(tmp_path):
    p = tmp_path / "m.obj"
    p.write_text(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "vt 0 0\nvt 1 0\n"
        "f 1/1 2/2 3/1 4/2\n"  # quad with vt indices -> fan triangulated
    )
    v, f = load_obj(str(p))
    assert v.shape == (4, 3)
    np.testing.assert_array_equal(f, [[0, 1, 2], [0, 2, 3]])


def test_facemesh_validation(tri_mesh):
    verts, faces, path = tri_mesh
    mesh = FaceMesh.load(path)
    assert mesh.n_verts == 4 and mesh.n_faces == 2
    with pytest.raises(ValueError):
        mesh.set_verts(np.zeros((5, 2)))
    m2 = mesh.copy()
    m2.set_verts(mesh.verts + 1.0)
    assert not np.allclose(m2.verts, mesh.verts)


def test_ply_roundtrip(tmp_path):
    """Binary-little-endian PLY parsing (psbody replacement,
    reference src/utils/facemesh.py:37-46, convert_ply.py:8-22)."""
    import os
    import struct

    verts = np.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], np.float32)
    faces = [[0, 1, 2]]
    p = tmp_path / "m.ply"
    with open(p, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n")
        f.write(b"element vertex 3\nproperty float x\nproperty float y\nproperty float z\n")
        f.write(b"element face 1\nproperty list uchar int vertex_indices\nend_header\n")
        for v in verts:
            f.write(struct.pack("<fff", *v))
        f.write(struct.pack("<Biii", 3, 0, 1, 2))
    mesh = FaceMesh.load(str(p))
    np.testing.assert_allclose(mesh.verts, verts, atol=1e-7)
    np.testing.assert_array_equal(mesh.faces, faces)

    from audio2face_tpu.utils.facemesh import convert_ply_to_obj

    out = tmp_path / "m.obj"
    convert_ply_to_obj(str(p), str(out))
    m2 = FaceMesh.load(str(out))
    np.testing.assert_allclose(m2.verts, verts, atol=1e-7)

    ref_ply = "/root/reference/template/FLAME_sample.ply"
    if os.path.exists(ref_ply):
        m = FaceMesh.load(ref_ply)
        assert m.n_verts == 5023 and m.n_faces == 9976


def test_reference_flame_template_if_present():
    """The FLAME template is 5,023 verts / 9,976 faces (SURVEY §2 #22)."""
    import os

    path = "/root/reference/assets/FLAME_sample.obj"
    if not os.path.exists(path):
        pytest.skip("reference template not mounted")
    mesh = FaceMesh.load(path)
    assert mesh.n_verts == 5023
    assert mesh.n_faces == 9976

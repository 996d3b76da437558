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


def test_reference_flame_template_if_present():
    """The FLAME template is 5,023 verts / 9,976 faces (SURVEY §2 #22)."""
    import os

    path = "/root/reference/assets/FLAME_sample.obj"
    if not os.path.exists(path):
        pytest.skip("reference template not mounted")
    mesh = FaceMesh.load(path)
    assert mesh.n_verts == 5023
    assert mesh.n_faces == 9976

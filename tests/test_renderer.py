import pytest
import numpy as np

from audio2face_tpu.utils.facemesh import FaceMesh
from audio2face_tpu.utils.renderer import (
    Renderer,
    _rodrigues,
    images_to_video,
    light_positions,
    save_audio,
    vertex_normals,
)


def test_rodrigues_matches_cv2():
    import cv2

    for aa in ([0.5, 0, 0], [0, -0.5236, 0], [0.1, 0.2, 0.3]):
        ours = _rodrigues(np.asarray(aa, np.float64))
        ref = cv2.Rodrigues(np.asarray(aa))[0]
        np.testing.assert_allclose(ours, ref, atol=1e-8)


def test_light_positions():
    lp = light_positions()
    assert lp.shape == (5, 3)
    np.testing.assert_allclose(lp[0], [0, 0, 1])
    np.testing.assert_allclose(np.linalg.norm(lp, axis=1), 1.0, rtol=1e-6)


def test_vertex_normals_flat_quad():
    import jax.numpy as jnp

    verts = jnp.asarray([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], jnp.float32)
    faces = jnp.asarray([[0, 1, 2], [0, 2, 3]], jnp.int32)
    n = np.asarray(vertex_normals(verts, faces))
    np.testing.assert_allclose(np.abs(n[:, 2]), 1.0, atol=1e-6)


def _double_triangle_mesh():
    # a large triangle centered on the optical axis, 0.5 m from the camera,
    # plus a back triangle that must be occluded
    verts = np.array(
        [
            [-0.05, -0.05, 0.5], [0.05, -0.05, 0.5], [0.0, 0.05, 0.5],
            [-0.05, -0.05, 0.3], [0.05, -0.05, 0.3], [0.0, 0.05, 0.3],
        ],
        np.float32,
    )
    faces = np.array([[0, 1, 2], [3, 4, 5]])
    return FaceMesh(verts, faces)


def test_render_triangle_zbuffer():
    mesh = _double_triangle_mesh()
    r = Renderer(mesh)
    img = r._render_frame(mesh.verts)
    assert img.shape == (800, 800, 3) and img.dtype == np.uint8
    # something rendered near the image centre
    assert (img[:, :, 0] != 255).any()
    ys, xs = np.where(img[:, :, 0] != 255)
    cx, cy = xs.mean(), ys.mean()
    assert 300 < cx < 500 and 300 < cy < 500
    # z-buffer: front triangle (z=0.5 -> 0.5 m from camera) should win over
    # the z=0.3 one... z=0.5 world means distance 0.5 from camera at z=1.0,
    # the z=0.3 triangle is 0.7 away -> the nearer (z=0.5) covers the centre;
    # verify the covered area is contiguous and nontrivial
    assert len(xs) > 500


def test_render_fault_tolerance():
    mesh = _double_triangle_mesh()
    r = Renderer(mesh)
    good = mesh.verts
    frames = np.stack([good, good])
    images = r.render(frames)
    assert len(images) == 2
    np.testing.assert_array_equal(images[0], images[1])


@pytest.mark.slow
def test_fast_path_matches_banded():
    """The batched scatter-max rasterizer must agree with the exact banded
    path (z keys are quantized to 22 bits, so allow the same tolerance the
    golden test uses: <1% of pixels off by >3)."""
    import tempfile

    from audio2face_tpu.data.synthetic import (
        generate_demo_animation,
        generate_synthetic_face_obj,
    )

    with tempfile.TemporaryDirectory() as d:
        obj = generate_synthetic_face_obj(d + "/face.obj")
        vp = generate_demo_animation(obj, d + "/v.npy", seconds=3 / 60, fps=60)
        mesh = FaceMesh.load(obj)
        verts = np.load(vp)
    r = Renderer(mesh)
    fast = r._render_frames_fast(verts)
    assert len(fast) == len(verts)
    for i in range(len(verts)):
        slow = r._render_frame(verts[i])
        assert fast[i].shape == slow.shape and fast[i].dtype == np.uint8
        diff = np.abs(fast[i].astype(np.int32) - slow.astype(np.int32))
        assert (diff.max(axis=-1) > 3).mean() < 0.01
        # both must actually draw the face
        assert (fast[i][:, :, 0] != 255).mean() > 0.05


def test_fast_path_rejects_coarse_mesh_then_render_falls_back():
    """Triangles bigger than every patch tier must raise in the fast path
    and come out pixel-correct through render()'s banded fallback."""
    import pytest

    mesh = _double_triangle_mesh()
    r = Renderer(mesh)
    with pytest.raises(ValueError, match="banded"):
        r._render_frames_fast(np.stack([mesh.verts]))
    images = r.render(np.stack([mesh.verts]))
    ref = r._render_frame(mesh.verts)
    np.testing.assert_array_equal(images[0], ref)


def test_fast_path_nan_frame_renders_background():
    """A NaN frame renders as background in both paths (the banded path's
    empty-triangle early-out; the fast path's culled contributions)."""
    import tempfile

    from audio2face_tpu.data.synthetic import generate_synthetic_face_obj

    with tempfile.TemporaryDirectory() as d:
        mesh = FaceMesh.load(generate_synthetic_face_obj(d + "/face.obj"))
    r = Renderer(mesh)
    bad = np.full_like(np.asarray(mesh.verts, np.float32), np.nan)
    fast = r._render_frames_fast(np.stack([mesh.verts, bad]))
    assert (fast[1] == 255).all()
    assert (fast[0][:, :, 0] != 255).mean() > 0.05


def test_tiled_rasterizer_matches_banded():
    """The Pallas tile rasterizer (interpret mode on CPU) must agree with
    the exact banded path to the same tolerance as the scatter path (z keys
    quantized to 22 bits; fp-association differences flip a handful of
    silhouette pixels)."""
    import tempfile

    import jax.numpy as jnp

    from audio2face_tpu.data.synthetic import generate_synthetic_face_obj
    from audio2face_tpu.utils.renderer import render_frames_tiled

    with tempfile.TemporaryDirectory() as d:
        mesh = FaceMesh.load(generate_synthetic_face_obj(d + "/face.obj"))
    r = Renderer(mesh)
    verts = np.asarray(mesh.verts, np.float32)
    imgs = np.asarray(
        render_frames_tiled(
            jnp.asarray(verts[None]), r._faces_padded, r._face_valid,
            r.lights, interpret=True,
        )
    )
    slow = r._render_frame(verts)
    fast = np.repeat(imgs[0][..., None], 3, axis=2)
    diff = np.abs(fast.astype(np.int32) - slow.astype(np.int32))
    assert (diff.max(axis=-1) > 3).mean() < 0.01
    assert (fast[:, :, 0] != 255).mean() > 0.05


@pytest.mark.slow
def test_tiled_rasterizer_nan_and_degenerate():
    """NaN frames render as background; zero-area triangles draw nothing
    (the scatter path's inv_area=0 convention marks every bbox pixel
    'inside' — the tile rasterizer culls them instead, because its chunk
    bboxes would turn that latent artifact into a visible one)."""
    import jax.numpy as jnp

    from audio2face_tpu.ops.rasterizer import TRI_CHUNK
    from audio2face_tpu.utils.renderer import render_frames_tiled

    # one real triangle + one degenerate (collinear) triangle
    verts = np.array(
        [
            [-0.05, -0.05, 0.5], [0.05, -0.05, 0.5], [0.0, 0.05, 0.5],
            [-0.08, 0.08, 0.4], [0.0, 0.08, 0.4], [0.08, 0.08, 0.4],
        ],
        np.float32,
    )
    faces = np.zeros((TRI_CHUNK, 3), np.int32)
    faces[0] = [0, 1, 2]
    faces[1] = [3, 4, 5]  # collinear -> zero area
    valid = np.zeros(TRI_CHUNK, bool)
    valid[:2] = True
    lights = jnp.asarray(light_positions())

    imgs = np.asarray(
        render_frames_tiled(
            jnp.asarray(np.stack([verts, np.full_like(verts, np.nan)])),
            jnp.asarray(faces), jnp.asarray(valid), lights, interpret=True,
        )
    )
    assert (imgs[0] != 255).any()  # the real triangle drew
    assert (imgs[1] == 255).all()  # NaN frame is pure background
    # the image with the degenerate triangle included must equal the image
    # with it excluded: zero-area geometry contributes nothing
    valid_solo = valid.copy()
    valid_solo[1] = False
    solo = np.asarray(
        render_frames_tiled(
            jnp.asarray(verts[None]), jnp.asarray(faces),
            jnp.asarray(valid_solo), lights, interpret=True,
        )
    )
    np.testing.assert_array_equal(imgs[0], solo[0])


@pytest.mark.slow
def test_tiled_cropped_matches_full():
    """The cropped-transfer tiled path must reconstruct the exact full-frame
    image (the crop covers the projected-vertex bbox; everything outside is
    background), report fit=True for FLAME-scale geometry, and fall to
    fit=False when the window is deliberately too small."""
    import tempfile

    import jax.numpy as jnp

    from audio2face_tpu.data.synthetic import generate_synthetic_face_obj
    from audio2face_tpu.utils.renderer import (
        paste_crop,
        render_frames_tiled,
        render_frames_tiled_cropped,
        render_frames_tiled_packed,
        unpack_rendered,
    )

    with tempfile.TemporaryDirectory() as d:
        mesh = FaceMesh.load(generate_synthetic_face_obj(d + "/face.obj"))
    r = Renderer(mesh)
    verts = np.asarray(mesh.verts, np.float32)
    batch = jnp.asarray(np.stack([verts, np.full_like(verts, np.nan)]))

    full = np.asarray(
        render_frames_tiled(
            batch, r._faces_padded, r._face_valid, r.lights, interpret=True
        )
    )
    crops, offs, fit = render_frames_tiled_cropped(
        batch, r._faces_padded, r._face_valid, r.lights, interpret=True
    )
    crops, offs, fit = np.asarray(crops), np.asarray(offs), np.asarray(fit)
    assert fit.tolist() == [True, True]  # NaN frame: all culled -> any window
    for i in range(2):
        rebuilt = paste_crop(crops[i], offs[i], 800, 800)
        np.testing.assert_array_equal(rebuilt[:, :, 0], full[i])
    assert (crops[1] == 255).all()  # NaN frame is pure background
    # the face must actually live inside the crop (not clipped away)
    assert (crops[0] != 255).mean() > 0.10

    # a window smaller than the face reports fit=False
    _, _, small_fit = render_frames_tiled_cropped(
        batch[:1], r._faces_padded, r._face_valid, r.lights,
        crop_h=64, crop_w=128, interpret=True,
    )
    assert not bool(np.asarray(small_fit)[0])

    # the single-buffer packed form (one D2H per batch) round-trips exactly
    buf = np.asarray(
        render_frames_tiled_packed(
            batch, r._faces_padded, r._face_valid, r.lights, interpret=True
        )
    )
    p_crops, p_offs, p_fit = unpack_rendered(buf)
    np.testing.assert_array_equal(p_crops, crops)
    np.testing.assert_array_equal(p_offs, offs)
    np.testing.assert_array_equal(p_fit, fit)


@pytest.mark.slow
def test_rasterize_batched_submatches_direct(monkeypatch):
    """Batches larger than RASTER_BATCH must rasterize via the lax.map
    sub-batch path (the Pallas kernel's SMEM bbox prefetch caps F) and
    produce bit-identical frames to the direct call."""
    import tempfile

    import jax.numpy as jnp

    from audio2face_tpu.data.synthetic import generate_synthetic_face_obj
    from audio2face_tpu.utils import renderer as R

    with tempfile.TemporaryDirectory() as d:
        mesh = FaceMesh.load(generate_synthetic_face_obj(d + "/face.obj"))
    r = Renderer(mesh)
    verts = np.asarray(mesh.verts, np.float32)
    batch = jnp.asarray(np.stack([verts, verts * 1.01]))

    direct = np.asarray(
        R.render_frames_tiled(
            batch, r._faces_padded, r._face_valid, r.lights, interpret=True
        )
    )
    monkeypatch.setattr(R, "RASTER_BATCH", 1)  # force the lax.map path
    R.render_frames_tiled.clear_cache()
    R.render_frames_tiled_cropped.clear_cache()
    try:
        mapped = np.asarray(
            R.render_frames_tiled(
                batch, r._faces_padded, r._face_valid, r.lights, interpret=True
            )
        )
        np.testing.assert_array_equal(mapped, direct)
        crops, offs, fit = R.render_frames_tiled_cropped(
            batch, r._faces_padded, r._face_valid, r.lights, interpret=True
        )
        assert np.asarray(fit).all()
        for i in range(2):
            rebuilt = R.paste_crop(np.asarray(crops)[i], np.asarray(offs)[i], 800, 800)
            np.testing.assert_array_equal(rebuilt[:, :, 0], direct[i])
    finally:
        R.render_frames_tiled.clear_cache()
        R.render_frames_tiled_cropped.clear_cache()


@pytest.mark.slow
def test_rasterize_batched_non_multiple_pads(monkeypatch):
    """F > RASTER_BATCH with F % RASTER_BATCH != 0 (e.g. a 3-frame batch at
    RASTER_BATCH=2) must pad into the sub-batch path, not fall through to a
    direct call — on device the direct kernel exceeds its SMEM bbox
    prefetch above RASTER_BATCH frames. Padded frames must not leak into
    the output."""
    import tempfile

    import jax.numpy as jnp

    from audio2face_tpu.data.synthetic import generate_synthetic_face_obj
    from audio2face_tpu.utils import renderer as R

    with tempfile.TemporaryDirectory() as d:
        mesh = FaceMesh.load(generate_synthetic_face_obj(d + "/face.obj"))
    r = Renderer(mesh)
    verts = np.asarray(mesh.verts, np.float32)
    batch = jnp.asarray(np.stack([verts, verts * 1.01, verts * 0.99]))

    direct = np.asarray(
        R.render_frames_tiled(
            batch, r._faces_padded, r._face_valid, r.lights, interpret=True
        )
    )
    monkeypatch.setattr(R, "RASTER_BATCH", 2)  # 3 % 2 != 0 -> padded path
    R.render_frames_tiled.clear_cache()
    try:
        padded = np.asarray(
            R.render_frames_tiled(
                batch, r._faces_padded, r._face_valid, r.lights, interpret=True
            )
        )
        assert padded.shape == direct.shape
        np.testing.assert_array_equal(padded, direct)
    finally:
        R.render_frames_tiled.clear_cache()


def test_images_to_video_and_audio(tmp_path):
    img = np.full((64, 64, 3), 255, np.uint8)
    path = images_to_video([img, img, img], str(tmp_path), fps=30)
    assert path.endswith("tmp.mp4")
    import os

    assert os.path.getsize(path) > 0
    wav = save_audio(np.zeros(1600, np.float32), str(tmp_path))
    assert os.path.getsize(wav) > 0


def test_render_golden_image(tmp_path):
    """Full-frame golden: the synthetic face mesh rendered by the software
    rasterizer must match the committed PNG (pins shading, projection,
    z-buffer, and banding end-to-end — the reference's pyrender output is
    unavailable here, so the golden pins THIS renderer against regression).

    Regenerate after an intentional change:
        python -c "from tests.test_renderer import _write_golden; _write_golden()"
    """
    import os

    import cv2

    img = _golden_render()
    path = os.path.join(os.path.dirname(__file__), "fixtures", "render_golden.png")
    want = cv2.imread(path, cv2.IMREAD_COLOR)
    assert want is not None, f"missing golden at {path}"
    assert img.shape == want.shape
    diff = np.abs(img.astype(np.int32) - want.astype(np.int32))
    frac_diff = float((diff.max(axis=-1) > 3).mean())
    assert frac_diff < 0.01, (frac_diff, diff.max())
    # the face must actually cover a meaningful part of the frame
    assert (img.max(axis=-1) < 250).mean() > 0.05


def _golden_render():
    import tempfile

    from audio2face_tpu.data.synthetic import generate_synthetic_face_obj
    from audio2face_tpu.utils.facemesh import FaceMesh
    from audio2face_tpu.utils.renderer import Renderer

    with tempfile.TemporaryDirectory() as d:
        path = generate_synthetic_face_obj(d + "/face.obj")
        mesh = FaceMesh.load(path)
    r = Renderer(mesh)
    return r._render_frame(np.asarray(mesh.verts, np.float32))


def _write_golden():  # pragma: no cover
    import os

    import cv2

    here = os.path.dirname(os.path.abspath(__file__))
    os.makedirs(os.path.join(here, "fixtures"), exist_ok=True)
    path = os.path.join(here, "fixtures", "render_golden.png")
    cv2.imwrite(path, _golden_render())
    print("wrote", path)

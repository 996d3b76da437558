"""Offscreen mesh renderer: a JAX software rasterizer (no EGL/OpenGL).

Replaces the reference's pyrender EGL renderer (src/utils/renderer.py:14-113)
with a jit'd z-buffer rasterizer that runs on TPU/CPU with zero native
dependencies. Scene parity: the same intrinsics camera (f=4754.98/2,
c=(400,400), 800x800, near 0.01 / far 3.0, renderer.py:17-22), camera at
z=1 looking at the origin, ambient 0.2 with five white point lights of
intensity 1.5 placed at the camera position rotated ±30° about the x/y axes
(renderer.py:49-69), white background, double-sided shading (the reference
renders with SKIP_CULL_FACES), smooth per-vertex normals (Mesh.from_trimesh
smooth=True).

Per-frame fault tolerance matches the reference (renderer.py:99-108): a frame
that fails falls back to the previous frame's image.

Design: vertices are projected and Gouraud-shaded in one small jit'd kernel;
the host buckets triangles into row bands (cheap numpy bincount — a triangle
covers ~2 bands), and a second jit'd kernel rasterizes each band against only
its bucketed triangles with perspective-correct z-buffering, scanning
fixed-size triangle chunks so every intermediate stays small and fused.
Shapes are bucketed so the kernel compiles a handful of times per mesh.
"""

from __future__ import annotations

import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from audio2face_tpu.utils.facemesh import FaceMesh
from audio2face_tpu.utils.shapes import round_up as _round_up

CAMERA_F = 4754.97941935 / 2
CAMERA_C = (400.0, 400.0)
FRUSTUM = {"near": 0.01, "far": 3.0, "height": 800, "width": 800}
AMBIENT = 0.2
LIGHT_INTENSITY = 1.5
BG_COLOR = 255

ROW_BLOCK = 50
TRI_CHUNK = 256

# Fast path: per-triangle local-patch rasterization (see render_frames_u8).
# FLAME-scale triangles project to ~10 px bboxes at this camera; tier 1
# covers those, tier 2 catches coarser meshes, anything bigger falls back
# to the banded rasterizer (exact at any triangle size).
PATCH_TIERS = ((16, 24), (32, 48))
FRAME_BATCH = 16
_FLAT_CHUNK = 2048
_IZ_BITS = 22
_IZ_SCALE = float((1 << _IZ_BITS) - 1) * FRUSTUM["near"]  # iz <= 1/near


def _rodrigues(axis_angle: np.ndarray) -> np.ndarray:
    """Rotation matrix from an axis-angle vector (cv2.Rodrigues equivalent,
    used by the reference to place lights, renderer.py:60-69)."""
    theta = np.linalg.norm(axis_angle)
    if theta < 1e-12:
        return np.eye(3)
    k = axis_angle / theta
    kx = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(theta) * kx + (1 - np.cos(theta)) * (kx @ kx)


def light_positions() -> np.ndarray:
    """Five point lights: camera position rotated ±30° about x then y."""
    angle = np.pi / 6.0
    pos = np.array([0.0, 0.0, 1.0])
    out = [pos]
    for axis_angle in ([angle, 0, 0], [-angle, 0, 0], [0, -angle, 0], [0, angle, 0]):
        out.append(_rodrigues(np.asarray(axis_angle, np.float64)) @ pos)
    return np.stack(out).astype(np.float32)


def vertex_normals(verts: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """Smooth per-vertex normals: area-weighted face-normal accumulation."""
    v0, v1, v2 = (verts[faces[:, i]] for i in range(3))
    fn = jnp.cross(v1 - v0, v2 - v0)  # area-weighted
    vn = jnp.zeros_like(verts)
    for i in range(3):
        vn = vn.at[faces[:, i]].add(fn)
    norm = jnp.linalg.norm(vn, axis=1, keepdims=True)
    return vn / jnp.maximum(norm, 1e-12)


@jax.jit
def project_and_shade(verts: jnp.ndarray, faces: jnp.ndarray, lights: jnp.ndarray):
    """(V,3) world verts -> screen (u, v), depth, per-vertex shade."""
    verts = verts.astype(jnp.float32)
    cam_pos = jnp.asarray([0.0, 0.0, 1.0], jnp.float32)

    normals = vertex_normals(verts, faces)
    shade = jnp.full((verts.shape[0],), AMBIENT, jnp.float32)
    for li in range(5):
        d = lights[li][None, :] - verts
        dist2 = jnp.sum(d * d, axis=1)
        ldir = d * jax.lax.rsqrt(jnp.maximum(dist2, 1e-12))[:, None]
        lambert = jnp.abs(jnp.sum(normals * ldir, axis=1))  # double-sided
        shade = shade + LIGHT_INTENSITY * lambert / jnp.maximum(dist2, 1e-6)
    shade = jnp.clip(shade / (1.0 + LIGHT_INTENSITY * 5.0), 0.0, 1.0)

    rel = verts - cam_pos  # camera axes = identity, looking along -z
    z_cam = -rel[:, 2]
    z_safe = jnp.maximum(z_cam, 1e-6)
    u = CAMERA_F * rel[:, 0] / z_safe + CAMERA_C[0]
    v = CAMERA_C[1] - CAMERA_F * rel[:, 1] / z_safe
    visible = (z_cam > FRUSTUM["near"]) & (z_cam < FRUSTUM["far"])
    return u, v, z_safe, shade, visible


@partial(jax.jit, static_argnames=("row_block", "width"))
def rasterize_bands(
    tri: jnp.ndarray,  # (B, cap, 3, 4): per-corner (u, v, 1/z, shade/z)
    valid: jnp.ndarray,  # (B, cap) bool
    row0: jnp.ndarray,  # (B,) first row of each band
    col0: jnp.ndarray,  # () leftmost rendered column
    *,
    row_block: int = ROW_BLOCK,
    width: int = FRUSTUM["width"],
) -> jnp.ndarray:
    """Rasterize each row band against its bucketed triangles.

    Returns (B, row_block, width) shade in [0,1], background -1.
    """
    n_bands, cap = tri.shape[:2]
    px = col0 + jnp.arange(width, dtype=jnp.float32)[None, :] + 0.5

    def band(tri_b, valid_b, r0):
        py = (r0 + jnp.arange(row_block)).astype(jnp.float32)[:, None] + 0.5

        tri_c = tri_b.reshape(-1, TRI_CHUNK, 3, 4)
        valid_c = valid_b.reshape(-1, TRI_CHUNK)

        init = (
            jnp.zeros((row_block, width), jnp.float32),  # best 1/z (bigger = closer)
            jnp.full((row_block, width), -1.0, jnp.float32),
        )

        def body(carry, chunk):
            izbuf, cbuf = carry
            t, ok = chunk
            x0, x1, x2 = t[:, 0, 0, None, None], t[:, 1, 0, None, None], t[:, 2, 0, None, None]
            y0, y1, y2 = t[:, 0, 1, None, None], t[:, 1, 1, None, None], t[:, 2, 1, None, None]
            area = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)
            inv_area = jnp.where(jnp.abs(area) < 1e-12, 0.0, 1.0 / area)
            pxb, pyb = px[None], py[None]
            w0 = ((x1 - pxb) * (y2 - pyb) - (x2 - pxb) * (y1 - pyb)) * inv_area
            w1 = ((x2 - pxb) * (y0 - pyb) - (x0 - pxb) * (y2 - pyb)) * inv_area
            w2 = 1.0 - w0 - w1
            inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0) & ok[:, None, None]

            iz = (
                w0 * t[:, 0, 2, None, None]
                + w1 * t[:, 1, 2, None, None]
                + w2 * t[:, 2, 2, None, None]
            )
            soz = (
                w0 * t[:, 0, 3, None, None]
                + w1 * t[:, 1, 3, None, None]
                + w2 * t[:, 2, 3, None, None]
            )
            iz = jnp.where(inside, iz, 0.0)
            best = jnp.argmax(iz, axis=0)
            iz_best = jnp.max(iz, axis=0)
            s_best = jnp.take_along_axis(soz, best[None], axis=0)[0] / jnp.maximum(iz_best, 1e-12)
            closer = iz_best > izbuf
            return (
                jnp.where(closer, iz_best, izbuf),
                jnp.where(closer, s_best, cbuf),
            ), None

        (_, cbuf), _ = jax.lax.scan(body, init, (tri_c, valid_c))
        return cbuf

    return jax.vmap(band)(tri, valid, row0)


@partial(
    jax.jit,
    static_argnames=("patch_h", "patch_w", "height", "width", "tri_chunk"),
)
def render_frames_u8(
    verts: jnp.ndarray,  # (F, V, 3) float32
    faces: jnp.ndarray,  # (T, 3) int32, T a multiple of tri_chunk
    face_valid: jnp.ndarray,  # (T,) bool (False on padding rows)
    lights: jnp.ndarray,  # (5, 3)
    *,
    patch_h: int,
    patch_w: int,
    height: int = FRUSTUM["height"],
    width: int = FRUSTUM["width"],
    tri_chunk: int = _FLAT_CHUNK,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Render a whole batch of frames in ONE device program.

    Returns ((F, height, width) uint8 images, (F,) bool all_fit).

    TPU-first design: the banded rasterizer above tests every bucketed
    triangle against a full 50x800 row band, but FLAME-scale triangles
    project to ~10 px bboxes — >99% of those tests are dead work, and its
    per-frame host round trips (bucketing runs on host) cost more than the
    kernel on a tunneled/PCIe-attached chip. Here each triangle is
    rasterized only against a (patch_h, patch_w) pixel window anchored at
    its own screen bbox, and z-resolution is a single int32 scatter-max per
    chunk: key = (quantized 1/z) << 8 | shade byte, so depth test and color
    selection are one associative reduction (scatter-max measures ~0.1 ms
    for a full frame's contributions on v5e). No host work per frame at all.

    Triangles whose bbox exceeds the patch are NOT drawn; the per-frame
    ``all_fit`` flag reports that, and the caller escalates to a larger
    patch tier or the exact banded path. Frames with NaN/degenerate
    vertices render as background (the banded path does the same).

    Tie-break semantics: the scatter key packs the shade byte into the low
    8 bits under the 22-bit quantized 1/z, so fragments whose quantized
    depths tie resolve to the BRIGHTEST shade, not a deterministic
    triangle. Surfaces within ~1 depth-quantization step of each other can
    therefore differ from the exact banded path (which picks the argmax
    triangle) by up to the shade difference of the tied fragments — in
    practice a handful of silhouette pixels, covered by the 1 %-of-pixels
    golden tolerance. The Pallas tile rasterizer (ops/rasterizer.py) uses
    the same key, so all fast paths agree exactly with each other.
    """
    f32 = jnp.float32

    def project(vf):
        u, v, z, shade, visible = (
            project_and_shade(vf, faces, lights)
        )
        uu, vv = u[faces], v[faces]  # (T, 3)
        izv = 1.0 / z[faces]
        soz = shade[faces] * izv
        ok3 = visible[faces].all(axis=1) & face_valid
        xmin, xmax = uu.min(1), uu.max(1)
        ymin, ymax = vv.min(1), vv.max(1)
        x0 = jnp.floor(xmin).astype(jnp.int32)
        y0 = jnp.floor(ymin).astype(jnp.int32)
        fits = (xmax - xmin <= patch_w - 1.0) & (ymax - ymin <= patch_h - 1.0)
        onscreen = (xmax >= 0) & (ymax >= 0) & (xmin < width) & (ymin < height)
        ok = ok3 & onscreen & fits
        all_fit = ~jnp.any(ok3 & onscreen & ~fits)
        tri = jnp.stack([uu, vv, izv, soz], axis=2)  # (T, 3, 4)
        return tri, ok, x0, y0, all_fit

    n_frames = verts.shape[0]
    tri, ok, x0, y0, all_fit = jax.vmap(project)(verts.astype(f32))

    # flatten (frame, triangle) -> one scatter stream over a per-frame
    # framebuffer block; the last slot is the dump target for culled pixels
    n_px = height * width
    frame_base = jnp.repeat(
        jnp.arange(n_frames, dtype=jnp.int32) * n_px, tri.shape[1]
    )
    tri = tri.reshape(-1, 3, 4)
    ok = ok.reshape(-1)
    x0, y0 = x0.reshape(-1), y0.reshape(-1)

    n = tri.shape[0]
    assert n % tri_chunk == 0, (n, tri_chunk)
    shp = (n // tri_chunk, tri_chunk)
    dx = jnp.arange(patch_w, dtype=jnp.int32)
    dy = jnp.arange(patch_h, dtype=jnp.int32)

    def body(fb, chunk):
        t, okc, xc, yc, base = chunk
        xi = xc[:, None, None] + dx[None, None, :]  # (C, 1, PW)
        yi = yc[:, None, None] + dy[None, :, None]  # (C, PH, 1)
        px = xi.astype(f32) + 0.5
        py = yi.astype(f32) + 0.5
        ax, ay = t[:, 0, 0, None, None], t[:, 0, 1, None, None]
        bx, by = t[:, 1, 0, None, None], t[:, 1, 1, None, None]
        cx, cy = t[:, 2, 0, None, None], t[:, 2, 1, None, None]
        area = (bx - ax) * (cy - ay) - (cx - ax) * (by - ay)
        inv_area = jnp.where(jnp.abs(area) < 1e-12, 0.0, 1.0 / area)
        w0 = ((bx - px) * (cy - py) - (cx - px) * (by - py)) * inv_area
        w1 = ((cx - px) * (ay - py) - (ax - px) * (cy - py)) * inv_area
        w2 = 1.0 - w0 - w1
        inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0) & okc[:, None, None]
        iz = (
            w0 * t[:, 0, 2, None, None]
            + w1 * t[:, 1, 2, None, None]
            + w2 * t[:, 2, 2, None, None]
        )
        s = (
            w0 * t[:, 0, 3, None, None]
            + w1 * t[:, 1, 3, None, None]
            + w2 * t[:, 2, 3, None, None]
        ) / jnp.maximum(iz, 1e-12)
        izq = jnp.clip(iz * _IZ_SCALE, 1.0, float((1 << _IZ_BITS) - 1))
        izq = izq.astype(jnp.int32)
        sq = jnp.clip(jnp.minimum(s * 255.0, 254.0), 0.0, 254.0).astype(jnp.int32)
        key = (izq << 8) | sq
        valid = inside & (xi >= 0) & (xi < width) & (yi >= 0) & (yi < height)
        ids = jnp.where(
            valid, base[:, None, None] + yi * width + xi, n_frames * n_px
        )
        key = jnp.where(valid, key, 0)
        fb = fb.at[ids.reshape(-1)].max(key.reshape(-1), mode="promise_in_bounds")
        return fb, None

    fb0 = jnp.zeros((n_frames * n_px + 1,), jnp.int32)
    fb, _ = jax.lax.scan(
        body,
        fb0,
        (
            tri.reshape(shp + (3, 4)),
            ok.reshape(shp),
            x0.reshape(shp),
            y0.reshape(shp),
            frame_base.reshape(shp),
        ),
    )
    fb = fb[: n_frames * n_px].reshape(n_frames, height, width)
    img = jnp.where(fb == 0, 255, fb & 0xFF).astype(jnp.uint8)
    return img, all_fit


# D2H crop window for the pipelined tiled path: the FLAME-scale face
# projects to a ~410x560 px window of the 800x800 frame at this camera, so
# transferring a (CROP_H, CROP_W) slice + its per-frame offset moves 2.4x
# fewer bytes than the full frame — the end-to-end render is D2H-bandwidth
# bound on a tunneled/PCIe-attached chip. Exactness is guaranteed by
# construction (the crop covers the projected-vertex bbox, and every drawn
# fragment lies inside some triangle's vertex hull); frames whose geometry
# exceeds the window report fit=False and fall back to full-frame transfer.
CROP_H = 640  # rows (multiple of 8 for DMA-friendly slicing)
CROP_W = 512  # cols (multiple of 128 lanes)

# Frames per Pallas rasterize_keys call: the kernel scalar-prefetches the
# whole (F, n_chunks, 4) chunk_bbox operand into SMEM (1 MB on v5e), which
# caps F at ~25 frames for the FLAME-scale mesh (~41 kB/frame as laid out by
# the compiler — measured: F=64 was rejected with "Allocation (size=2621440)
# would exceed memory (size=1048576), space=smem"). Bigger host batches are
# rasterized as a lax.map over RASTER_BATCH-frame sub-batches inside one jit,
# so the D2H transfer batch (TRANSFER_BATCH) can grow independently.
RASTER_BATCH = 16


def _rasterize_batched(coefs, bbox, *, height, width, interpret):
    """rasterize_keys over F frames, sub-batched to fit the SMEM prefetch.

    coefs (F, T, 16) f32, bbox (F, n_chunks, 4) i32 -> (F, H, W) u32 keys.
    """
    from audio2face_tpu.ops.rasterizer import rasterize_keys

    f = coefs.shape[0]
    if f <= RASTER_BATCH:
        return rasterize_keys(
            coefs, bbox, height=height, width=width, interpret=interpret
        )
    # pad to the next RASTER_BATCH multiple: a direct call above
    # RASTER_BATCH frames exceeds the kernel's SMEM scalar-prefetch cap on
    # device, so non-multiple batches (e.g. F=40 through the public
    # render_frames_tiled) must sub-batch too. Padded frames carry
    # all-empty chunk bboxes (xmin > xmax — the pre-pass's empty-chunk
    # convention) so the kernel culls every chunk; they render as pure
    # background and are sliced off below.
    pad = -f % RASTER_BATCH
    if pad:
        coefs = jnp.concatenate(
            [coefs, jnp.zeros((pad, *coefs.shape[1:]), coefs.dtype)]
        )
        empty = jnp.broadcast_to(
            jnp.asarray([1, 0, 1, 0], bbox.dtype), (pad, *bbox.shape[1:])
        )
        bbox = jnp.concatenate([bbox, empty])
    n = (f + pad) // RASTER_BATCH
    keys = jax.lax.map(
        lambda cb: rasterize_keys(
            cb[0], cb[1], height=height, width=width, interpret=interpret
        ),
        (
            coefs.reshape(n, RASTER_BATCH, *coefs.shape[1:]),
            bbox.reshape(n, RASTER_BATCH, *bbox.shape[1:]),
        ),
    )
    return keys.reshape(n * RASTER_BATCH, *keys.shape[2:])[:f]


def _crop_window(u, v, visible, *, height, width, crop_h, crop_w):
    """Per-frame crop offset + fit flag from projected vertices.

    Returns ((2,) int32 [y_off, x_off], () bool fit). The crop
    [y_off:y_off+crop_h, x_off:x_off+crop_w] covers every drawn pixel when
    fit is True: drawn fragments lie inside a triangle whose three vertices
    are all visible and finite (plane_coefficients culls the rest), so the
    bbox of visible finite vertices, clipped to the screen, bounds them.
    An all-culled frame (NaN verts, everything behind the camera) renders
    as pure background — any window is correct, so fit stays True."""
    valid = visible & jnp.isfinite(u) & jnp.isfinite(v)
    big = jnp.float32(4 * max(height, width))
    u_lo = jnp.clip(jnp.floor(jnp.where(valid, u, big).min()), 0, width)
    u_hi = jnp.clip(jnp.ceil(jnp.where(valid, u, -big).max()) + 1, 0, width)
    v_lo = jnp.clip(jnp.floor(jnp.where(valid, v, big).min()), 0, height)
    v_hi = jnp.clip(jnp.ceil(jnp.where(valid, v, -big).max()) + 1, 0, height)
    any_valid = valid.any()
    fit = (~any_valid) | ((u_hi - u_lo <= crop_w) & (v_hi - v_lo <= crop_h))
    y_off = jnp.where(any_valid, jnp.minimum(v_lo, height - crop_h), 0.0)
    x_off = jnp.where(any_valid, jnp.minimum(u_lo, width - crop_w), 0.0)
    return jnp.stack([y_off, x_off]).astype(jnp.int32), fit


@partial(jax.jit, static_argnames=("height", "width", "crop_h", "crop_w", "interpret"))
def render_frames_tiled_cropped(
    verts: jnp.ndarray,  # (F, V, 3) float32
    faces: jnp.ndarray,  # (T, 3) int32, T a multiple of rasterizer.TRI_CHUNK
    face_valid: jnp.ndarray,  # (T,) bool
    lights: jnp.ndarray,  # (5, 3)
    *,
    height: int = FRUSTUM["height"],
    width: int = FRUSTUM["width"],
    crop_h: int = CROP_H,
    crop_w: int = CROP_W,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Tile-rasterize a batch and return only the face's crop window.

    Returns ((F, crop_h, crop_w) uint8 crops, (F, 2) int32 [y, x] offsets,
    (F,) bool fit). Rasterization is identical to render_frames_tiled (the
    full framebuffer is computed on device); only the D2H payload shrinks.
    When fit[i] is False the crop may miss drawn pixels — the caller must
    re-render that frame full-frame. Pixels outside the crop are background
    whenever fit is True."""
    assert crop_h <= height and crop_w <= width, (crop_h, crop_w)
    # the packed layout stores 5 metadata bytes in row crop_h and 16-bit
    # offsets; offsets are bounded by the screen size, so pin both here
    # where every cropped/packed render passes through
    assert crop_w >= 5, f"crop_w={crop_w}: packed metadata needs 5 bytes"
    assert height < 2**16 and width < 2**16, (height, width)
    from audio2face_tpu.ops.rasterizer import plane_coefficients

    def prep(vf):
        u, v, z, shade, vis = project_and_shade(vf, faces, lights)
        coefs, bbox = plane_coefficients(
            u, v, z, shade, vis, faces, face_valid, height=height, width=width
        )
        off, fit = _crop_window(
            u, v, vis, height=height, width=width, crop_h=crop_h, crop_w=crop_w
        )
        return coefs, bbox, off, fit

    coefs, bbox, offs, fit = jax.vmap(prep)(verts.astype(jnp.float32))
    keys = _rasterize_batched(
        coefs, bbox, height=height, width=width, interpret=interpret
    )
    img = jnp.where(keys == 0, BG_COLOR, keys & 0xFF).astype(jnp.uint8)
    crops = jax.vmap(
        lambda im, o: jax.lax.dynamic_slice(im, (o[0], o[1]), (crop_h, crop_w))
    )(img, offs)
    return crops, offs, fit


@partial(jax.jit, static_argnames=("height", "width", "crop_h", "crop_w", "interpret"))
def render_frames_tiled_packed(
    verts: jnp.ndarray,  # (F, V, 3) float32
    faces: jnp.ndarray,
    face_valid: jnp.ndarray,
    lights: jnp.ndarray,
    *,
    height: int = FRUSTUM["height"],
    width: int = FRUSTUM["width"],
    crop_h: int = CROP_H,
    crop_w: int = CROP_W,
    interpret: bool = False,
) -> jnp.ndarray:
    """Cropped render with offsets+fit packed into one uint8 buffer.

    Returns (F, crop_h + 1, crop_w) uint8: rows [0, crop_h) are the crop,
    row crop_h carries per-frame metadata bytes
    [y_off >> 8, y_off & 255, x_off >> 8, x_off & 255, fit]. One device
    array per batch means ONE D2H transfer per drain — the tunnel/PCIe
    link charges a fixed ~0.1-0.2 s per transfer regardless of size, so
    splitting crops/offsets/fit into three fetches triples the cost that
    dominates end-to-end render fps. Unpack with unpack_rendered."""
    crops, offs, fit = render_frames_tiled_cropped(
        verts, faces, face_valid, lights,
        height=height, width=width, crop_h=crop_h, crop_w=crop_w,
        interpret=interpret,
    )
    meta = jnp.zeros((verts.shape[0], crop_w), jnp.uint8)
    cols = jnp.stack(
        [
            (offs[:, 0] >> 8).astype(jnp.uint8),
            (offs[:, 0] & 0xFF).astype(jnp.uint8),
            (offs[:, 1] >> 8).astype(jnp.uint8),
            (offs[:, 1] & 0xFF).astype(jnp.uint8),
            fit.astype(jnp.uint8),
        ],
        axis=1,
    )
    meta = jax.lax.dynamic_update_slice(meta, cols, (0, 0))
    return jnp.concatenate([crops, meta[:, None, :]], axis=1)


def unpack_rendered(buf: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host-side inverse of render_frames_tiled_packed's metadata row.

    Returns ((F, crop_h, crop_w) crops, (F, 2) int32 offsets, (F,) bool fit).
    """
    crops = buf[:, :-1, :]
    m = buf[:, -1, :5].astype(np.int32)
    offs = np.stack([(m[:, 0] << 8) | m[:, 1], (m[:, 2] << 8) | m[:, 3]], axis=1)
    return crops, offs, m[:, 4].astype(bool)


@partial(jax.jit, static_argnames=("height", "width", "interpret"))
def render_frames_tiled(
    verts: jnp.ndarray,  # (F, V, 3) float32
    faces: jnp.ndarray,  # (T, 3) int32, T a multiple of rasterizer.TRI_CHUNK
    face_valid: jnp.ndarray,  # (T,) bool
    lights: jnp.ndarray,  # (5, 3)
    *,
    height: int = FRUSTUM["height"],
    width: int = FRUSTUM["width"],
    interpret: bool = False,
) -> jnp.ndarray:
    """Render a batch of frames through the Pallas tile rasterizer.

    Returns (F, height, width) uint8. Exact at any triangle size (no patch
    tiers, no fit flags — see ops/rasterizer.py); ~3 ms/frame at 800x800
    on v5e vs ~158 ms for a complete render on the scatter path. NaN or
    degenerate geometry is culled per-triangle, so a NaN frame renders as
    background, matching the scatter and banded paths.
    """
    from audio2face_tpu.ops.rasterizer import plane_coefficients

    def prep(vf):
        u, v, z, shade, vis = project_and_shade(vf, faces, lights)
        return plane_coefficients(
            u, v, z, shade, vis, faces, face_valid, height=height, width=width
        )

    coefs, bbox = jax.vmap(prep)(verts.astype(jnp.float32))
    keys = _rasterize_batched(
        coefs, bbox, height=height, width=width, interpret=interpret
    )
    return jnp.where(keys == 0, BG_COLOR, keys & 0xFF).astype(jnp.uint8)


class Renderer:
    """API parity with the reference Renderer (src/utils/renderer.py:14-113)."""

    def __init__(self, texture_mesh: FaceMesh):
        self.texture_mesh = texture_mesh
        self.faces_np = np.asarray(texture_mesh.faces, np.int32)
        self.faces = jnp.asarray(self.faces_np)
        self.lights = jnp.asarray(light_positions())
        # fast path: triangle stream padded to the scatter chunk size
        n_tri = len(self.faces_np)
        n_pad = _round_up(max(n_tri, 1), _FLAT_CHUNK)
        fp = np.zeros((n_pad, 3), np.int32)
        fp[:n_tri] = self.faces_np
        self._faces_padded = jnp.asarray(fp)
        self._face_valid = jnp.asarray(np.arange(n_pad) < n_tri)
        self.camera_params = {
            "c": np.array(CAMERA_C),
            "k": np.array([-0.19816071, 0.92822711, 0, 0, 0]),  # stored, unused (as in the reference)
            "f": np.array([CAMERA_F, CAMERA_F]),
        }
        self.frustum = dict(FRUSTUM)

    def _render_frame(self, verts: np.ndarray) -> np.ndarray:
        height, width = FRUSTUM["height"], FRUSTUM["width"]
        u, v, z, shade, visible = jax.tree.map(
            np.asarray, project_and_shade(jnp.asarray(verts), self.faces, self.lights)
        )

        f = self.faces_np
        tri_ok = visible[f].all(axis=1)
        uu, vv = u[f], v[f]  # (F, 3)
        iz = 1.0 / z[f]
        soz = shade[f] * iz
        tri = np.stack([uu, vv, iz, soz], axis=2).astype(np.float32)  # (F, 3, 4)

        # screen-space bbox culling + row-band bucketing (host, cheap)
        vmin, vmax = vv.min(1), vv.max(1)
        umin, umax = uu.min(1), uu.max(1)
        tri_ok &= (vmax >= 0) & (vmin < height) & (umax >= 0) & (umin < width)
        idx = np.nonzero(tri_ok)[0]
        if len(idx) == 0:
            return np.full((height, width, 3), BG_COLOR, np.uint8)

        b0 = np.clip(vmin[idx].astype(np.int64) // ROW_BLOCK, 0, height // ROW_BLOCK - 1)
        b1 = np.clip(vmax[idx].astype(np.int64) // ROW_BLOCK, 0, height // ROW_BLOCK - 1)
        # active window
        band_lo = int(b0.min())
        band_hi = int(b1.max())
        n_bands = band_hi - band_lo + 1
        c_lo = int(np.clip(umin[idx].min(), 0, width - 1)) // 128 * 128
        c_hi = min(_round_up(int(umax[idx].max()) + 1, 128), width)
        win_w = c_hi - c_lo

        # bucket triangle ids per band (each triangle lands in b0..b1)
        band_ids = []
        for b in range(band_lo, band_hi + 1):
            band_ids.append(idx[(b0 <= b) & (b1 >= b)])
        cap = _round_up(max(max(len(a) for a in band_ids), 1), TRI_CHUNK)

        tri_bands = np.zeros((n_bands, cap, 3, 4), np.float32)
        valid = np.zeros((n_bands, cap), bool)
        for i, ids in enumerate(band_ids):
            tri_bands[i, : len(ids)] = tri[ids]
            valid[i, : len(ids)] = True
        row0 = (band_lo + np.arange(n_bands)) * ROW_BLOCK

        bands = np.asarray(
            rasterize_bands(
                jnp.asarray(tri_bands), jnp.asarray(valid),
                jnp.asarray(row0, np.float32), jnp.asarray(float(c_lo)),
                width=win_w,
            )
        )
        img = np.full((height, width), -1.0, np.float32)
        img[band_lo * ROW_BLOCK : (band_hi + 1) * ROW_BLOCK, c_lo:c_hi] = bands.reshape(
            -1, win_w
        )[: (band_hi + 1 - band_lo) * ROW_BLOCK]
        return shade_to_image(img)

    def _render_frames_tiled(self, verts: np.ndarray) -> list[np.ndarray]:
        """Batched Pallas tile-rasterizer path (TPU): exact at any triangle
        size, no tiers. Returns RGB uint8 frames."""
        n = len(verts)
        if n < FRAME_BATCH:  # fixed frame count -> bounded compile set
            verts = np.concatenate(
                [verts, np.repeat(verts[-1:], FRAME_BATCH - n, axis=0)]
            )
        imgs = render_frames_tiled(
            jnp.asarray(verts, jnp.float32), self._faces_padded,
            self._face_valid, self.lights,
        )
        gray = np.asarray(imgs[:n])
        return [np.repeat(g[..., None], 3, axis=2) for g in gray]

    def _render_frames_fast(self, verts: np.ndarray) -> list[np.ndarray]:
        """Batched scatter fast path: escalate through PATCH_TIERS
        per FRAME (frames already complete at a smaller tier keep their
        image; only unfit frames pay the larger patches), then raise if
        any frame's triangles are too coarse for every tier (caller falls
        back to the exact banded rasterizer for those frames)."""
        n = len(verts)
        if n < FRAME_BATCH:  # fixed frame count -> bounded compile set
            verts = np.concatenate(
                [verts, np.repeat(verts[-1:], FRAME_BATCH - n, axis=0)]
            )
        vd = jnp.asarray(verts, jnp.float32)
        done: dict[int, np.ndarray] = {}
        for patch_h, patch_w in PATCH_TIERS:
            imgs, fit = render_frames_u8(
                vd, self._faces_padded, self._face_valid, self.lights,
                patch_h=patch_h, patch_w=patch_w,
            )
            fit = np.asarray(fit)
            for i in range(n):
                if i not in done and fit[i]:
                    done[i] = np.asarray(imgs[i])
            if len(done) == n:
                break
        if not done:
            raise ValueError(
                f"triangles exceed the {PATCH_TIERS[-1]} px patch; "
                "using the banded rasterizer"
            )
        # frames no tier could hold render exactly on the banded path;
        # fitting frames keep their (cheaper-tier) images
        return [
            np.repeat(done[i][..., None], 3, axis=2)
            if i in done
            else self._render_frame(verts[i])
            for i in range(n)
        ]

    def _render_serial(self, target_verts, images, prev, n_success):
        """Per-frame exact path with the reference's frame-level fault
        tolerance (renderer.py:99-108): a failed frame repeats the
        previous one."""
        for vert in target_verts:
            try:
                img = self._render_frame(np.asarray(vert))
                n_success += 1
            except Exception as e:
                print("Failed rendering frame " + str(e))
                img = prev
            prev = img
            images.append(img)
        return images, prev, n_success

    # device batches kept in flight before draining one (overlaps the D2H
    # image transfer + host unpack of batch i with the compute of i+1..i+D)
    PIPELINE_DEPTH = 3
    # frames per pipelined device batch / D2H transfer: the link charges a
    # fixed per-transfer cost, so bigger batches amortize it (64 crops
    # ~21 MB ≈ 0.5 s vs 4 transfers ≈ 1.1 s at measured link parameters)
    TRANSFER_BATCH = 64

    def render(self, target_verts: np.ndarray) -> list[np.ndarray]:
        n_frames = target_verts.shape[0]
        tic = time.time()
        print(f"Rendering {n_frames} frames...")
        if jax.default_backend() == "tpu":
            try:
                images = self._render_pipelined(np.asarray(target_verts, np.float32))
                toc = time.time()
                print(
                    f"Rendered {n_frames}/{n_frames} frames in {toc - tic:.2f}s, "
                    f"avg: {(toc - tic) / max(n_frames, 1):.3f}s/frame"
                )
                return images
            except Exception as e:  # genuine device/programming errors
                print(
                    f"Tiled rasterizer failed ({type(e).__name__}: {e}); "
                    "falling back to the scatter/banded paths"
                )
        prev = None
        images = []
        n_success = 0
        for lo in range(0, n_frames, FRAME_BATCH):
            chunk = np.asarray(target_verts[lo : lo + FRAME_BATCH], np.float32)
            try:
                batch = self._render_frames_fast(chunk)
                images.extend(batch)
                prev = batch[-1]
                n_success += len(batch)
            except Exception as e:  # coarse meshes, NaNs mid-bucketing, etc.
                print(
                    f"Fast rasterizer failed on frames {lo}.."
                    f"{lo + len(chunk) - 1} ({type(e).__name__}: {e}); "
                    "using the banded rasterizer"
                )
                images, prev, n_success = self._render_serial(
                    chunk, images, prev, n_success
                )
        toc = time.time()
        if n_success:
            print(
                f"Rendered {n_success}/{n_frames} frames in {toc - tic:.2f}s, "
                f"avg: {(toc - tic) / n_success:.3f}s/frame"
            )
        return images

    def _render_pipelined(self, target_verts: np.ndarray) -> list[np.ndarray]:
        """Tiled path with transfer/compute overlap: keep PIPELINE_DEPTH
        device batches in flight, drain the oldest while newer ones compute
        (JAX dispatch is async; the D2H DMA of a finished batch overlaps
        the kernel of the next). Each batch transfers only the face's
        (CROP_H, CROP_W) window + per-frame offsets — ~2.4x fewer D2H bytes
        than full frames, which is what bounds end-to-end fps on a
        tunneled/PCIe-attached chip. Frames whose geometry exceeds the crop
        window (fit=False) re-render full-frame, exactly."""
        height, width = FRUSTUM["height"], FRUSTUM["width"]
        n_frames = len(target_verts)
        tb = self.TRANSFER_BATCH
        pending: list[tuple] = []
        images: list[np.ndarray] = []

        def drain():
            buf, n, chunk = pending.pop(0)
            crops, offs, fit = unpack_rendered(np.asarray(buf))  # ONE D2H
            fit = fit[:n]
            if fit.all():
                images.extend(
                    paste_crop(crops[i], offs[i], height, width)
                    for i in range(n)
                )
                return
            # oversized geometry: full-frame re-render of ONLY the unfit
            # frames, padded to a fixed RASTER_BATCH shape — a whole-batch
            # re-render would stall the pipeline with a ~41 MB full-frame
            # transfer and a first-time F=TRANSFER_BATCH compile mid-render
            # (the warmup only compiles the packed path)
            bad = np.flatnonzero(~fit)
            full: dict[int, np.ndarray] = {}
            for g0 in range(0, len(bad), RASTER_BATCH):
                idx = bad[g0 : g0 + RASTER_BATCH]
                sub = chunk[idx]
                if len(idx) < RASTER_BATCH:
                    sub = np.concatenate(
                        [sub, np.repeat(sub[-1:], RASTER_BATCH - len(idx), axis=0)]
                    )
                gray = np.asarray(
                    render_frames_tiled(
                        jnp.asarray(sub), self._faces_padded,
                        self._face_valid, self.lights,
                    )
                )[: len(idx)]
                for j, i in enumerate(idx):
                    full[int(i)] = gray[j]
            images.extend(
                paste_crop(crops[i], offs[i], height, width)
                if fit[i]
                else np.repeat(full[i][..., None], 3, axis=2)
                for i in range(n)
            )

        for lo in range(0, n_frames, tb):
            chunk = target_verts[lo : lo + tb]
            n = len(chunk)
            if n < tb:
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], tb - n, axis=0)]
                )
            buf = render_frames_tiled_packed(
                jnp.asarray(chunk), self._faces_padded, self._face_valid,
                self.lights,
            )
            pending.append((buf, n, chunk))
            if len(pending) > self.PIPELINE_DEPTH:
                drain()
        while pending:
            drain()
        return images


def paste_crop(crop: np.ndarray, off: np.ndarray, height: int, width: int) -> np.ndarray:
    """Reassemble a full (height, width, 3) uint8 frame from a
    render_frames_tiled_cropped window: background outside the crop."""
    canvas = np.full((height, width), BG_COLOR, np.uint8)
    y, x = int(off[0]), int(off[1])
    canvas[y : y + crop.shape[0], x : x + crop.shape[1]] = crop
    return np.repeat(canvas[..., None], 3, axis=2)


def shade_to_image(shade: np.ndarray) -> np.ndarray:
    """[0,1] intensity (background -1) -> (H, W, 3) uint8, white background.

    Rendered pixels cap at 254 so geometry coverage is always distinguishable
    from the 255 background."""
    img = np.where(shade < 0.0, float(BG_COLOR), np.minimum(shade * 255.0, 254.0))
    img = np.clip(img, 0, 255).astype(np.uint8)
    return np.repeat(img[..., None], 3, axis=2)


def images_to_video(images: list, output: str, fps: int = 60) -> str:
    """Write frames to ``{output}/tmp.mp4`` (cv2, mp4v) — same contract as the
    reference (renderer.py:116-127: the argument is a directory)."""
    import cv2

    os.makedirs(output, exist_ok=True)
    path = os.path.join(output, "tmp.mp4")
    h, w, _ = images[0].shape
    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    video = cv2.VideoWriter(path, fourcc, fps, (w, h), True)
    for img in images:
        video.write(np.asarray(img))
    video.release()
    print(f"Wrote {len(images)} frames to {path}")
    return path


def verts_to_npy(verts: np.ndarray, output: str) -> None:
    np.save(output, verts)
    print(f"Saved verts to {output}")


def save_audio(audio: np.ndarray, output: str, sample_rate: int = 16000) -> str:
    """int16 wav at 16 kHz (reference: renderer.py:135-139, via scipy
    instead of soundfile)."""
    import scipy.io.wavfile as wavfile

    os.makedirs(output, exist_ok=True)
    path = os.path.join(output, "audio.wav")
    audio = np.asarray(audio)
    if audio.ndim == 2:
        audio = audio[0]
    wavfile.write(path, sample_rate, (audio * 32767).astype(np.int16))
    return path

"""Standalone render script — surface parity with the reference render.py:20-125:
render every frame of a vertex animation to PNGs, then encode an MP4.

The reference writes output/render_%d.png serially and shells out to ffmpeg
(-framerate 60 -r 30); here frames render through the JAX rasterizer and the
video encodes via cv2 (ffmpeg is used only if present).
"""

import argparse
import os
import shutil
import subprocess

import numpy as np

from audio2face_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()  # also pins A2F_FORCE_PLATFORM before first JAX use

from audio2face_tpu.utils.facemesh import FaceMesh
from audio2face_tpu.utils.renderer import Renderer


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--template", default="assets/FLAME_sample.obj")
    parser.add_argument("--verts", required=True, help=".npy vertex animation (T, V, 3)")
    parser.add_argument("--output", default="output")
    parser.add_argument("--framerate", type=int, default=60)
    parser.add_argument("--video-rate", type=int, default=30)
    args = parser.parse_args()

    os.makedirs(args.output, exist_ok=True)
    verts = np.load(args.verts)
    renderer = Renderer(FaceMesh.load(args.template))
    images = renderer.render(verts)

    import cv2

    for i, img in enumerate(images):
        cv2.imwrite(os.path.join(args.output, f"render_{i}.png"), img)

    video_path = os.path.join(args.output, "render.mp4")
    if shutil.which("ffmpeg"):
        subprocess.run(
            [
                "ffmpeg", "-y", "-framerate", str(args.framerate),
                "-i", os.path.join(args.output, "render_%d.png"),
                "-r", str(args.video_rate), "-c:v", "libx264", "-pix_fmt", "yuv420p",
                video_path,
            ],
            check=True,
        )
    else:
        h, w, _ = images[0].shape
        vw = cv2.VideoWriter(
            video_path, cv2.VideoWriter_fourcc(*"mp4v"), args.video_rate, (w, h), True
        )
        for img in images:
            vw.write(img)
        vw.release()
    print(f"Wrote {video_path}")


if __name__ == "__main__":
    main()

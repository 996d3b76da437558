"""Offline render entry point — surface parity with the reference main.py:8-13:
load the FLAME template + a saved vertex animation, render, write video.

Fixes the reference's latent path bug (main.py:13 passes "output.mp4" to a
function that treats it as a directory): here --output is a directory and the
video lands at {output}/tmp.mp4.
"""

import argparse

import numpy as np

from audio2face_tpu.utils.facemesh import FaceMesh
from audio2face_tpu.utils.renderer import Renderer, images_to_video


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--template", default="assets/FLAME_sample.obj")
    parser.add_argument("--verts", default="assets/verts_sample.npy")
    parser.add_argument("--output", default="output")
    parser.add_argument("--fps", type=int, default=60)
    args = parser.parse_args()

    texture_mesh = FaceMesh.load(args.template)
    renderer = Renderer(texture_mesh)
    verts = np.load(args.verts)
    rendered_images = renderer.render(verts)
    images_to_video(rendered_images, args.output, fps=args.fps)


if __name__ == "__main__":
    main()

"""Offline render entry point — surface parity with the reference main.py:8-13:
load the FLAME template + a saved vertex animation, render, write video.

Fixes the reference's latent path bug (main.py:13 passes "output.mp4" to a
function that treats it as a directory): here --output is a directory and the
video lands at {output}/tmp.mp4.

Runs green on a fresh clone: when the default assets are absent (FLAME is
licensed and cannot ship), a synthetic template + animation are generated
into assets/ first.
"""

import argparse
import os

import numpy as np

from audio2face_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()  # also pins A2F_FORCE_PLATFORM before first JAX use

from audio2face_tpu.utils.facemesh import FaceMesh
from audio2face_tpu.utils.renderer import Renderer, images_to_video


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--template", default="assets/FLAME_sample.obj")
    parser.add_argument("--verts", default="assets/verts_sample.npy")
    parser.add_argument("--output", default="output")
    parser.add_argument("--fps", type=int, default=60)
    args = parser.parse_args()

    if os.path.exists(args.template) and not os.path.exists(args.verts):
        # derive the demo animation from THE GIVEN template so frame vertex
        # counts always match the mesh being rendered
        from audio2face_tpu.data.synthetic import generate_demo_animation

        print(f"no vertex animation at {args.verts}; deriving one from {args.template}")
        os.makedirs(os.path.dirname(os.path.abspath(args.verts)), exist_ok=True)
        generate_demo_animation(args.template, args.verts)
    elif not os.path.exists(args.template):
        from audio2face_tpu.data.synthetic import generate_demo_assets

        assets_dir = os.path.dirname(args.template) or "assets"
        print(f"default assets missing; generating a synthetic demo into {assets_dir}/")
        paths = generate_demo_assets(assets_dir)
        args.template = paths["template"]
        args.verts = args.verts if os.path.exists(args.verts) else paths["verts"]

    texture_mesh = FaceMesh.load(args.template)
    renderer = Renderer(texture_mesh)
    verts = np.load(args.verts)
    rendered_images = renderer.render(verts)
    images_to_video(rendered_images, args.output, fps=args.fps)


if __name__ == "__main__":
    main()

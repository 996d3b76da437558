"""Standalone render script — surface parity with the reference render.py:20-125
(equivalently, ``a2f-render-frames`` after ``pip install .``).

Thin shim over audio2face_tpu.cli.render_frames: render every frame of a
vertex animation to PNGs, then encode an MP4 (ffmpeg if present, else cv2).
"""

from audio2face_tpu.cli.render_frames import main

if __name__ == "__main__":
    main()

"""Offline render entry point — surface parity with the reference main.py:8-13
(equivalently, ``a2f-render`` after ``pip install .``).

Thin shim over audio2face_tpu.cli.render_offline: load the FLAME template +
a saved vertex animation, render, write video, with the reference's latent
dir/file path bug fixed and synthetic stand-in assets generated on a fresh
clone.
"""

from audio2face_tpu.cli.render_offline import main

if __name__ == "__main__":
    main()

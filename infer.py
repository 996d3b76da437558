"""Inference entry point: wav file(s) -> vertex animation (+ optional video)
(equivalently, ``a2f-infer`` after ``pip install .``).

Thin shim over audio2face_tpu.cli.infer — a dedicated serving CLI the
reference lacks (its only predict path runs inside train.py's Lightning
predict pass, batch 1, 10 s cap). Decodes any number of clips of any
length in padded batches on one chip; --streaming for live decode.
"""

from audio2face_tpu.cli.infer import main

if __name__ == "__main__":
    main()

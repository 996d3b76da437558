"""Training entry point — surface parity with the reference train.py:18-76.

``python train.py --config config.yaml [--dataset-path PATH]``
(equivalently, ``a2f-train`` after ``pip install .``)

Thin shim over audio2face_tpu.cli.train, which loads the YAML ExpConfig,
applies the faceformer special-casing, fits with val-err checkpointing +
early stopping, reloads the newest checkpoint and renders one predicted
test sentence to video + wav.
"""

from audio2face_tpu.cli.train import main

if __name__ == "__main__":
    main()

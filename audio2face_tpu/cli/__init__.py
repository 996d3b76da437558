"""Console entry points (installed as ``a2f-*`` scripts via pyproject.toml).

The reference's scripts only resolve with ``src/`` on sys.path (SURVEY §1 L5,
reference main.py:4-5, render.py:13); here each command is an importable
module so a ``pip install`` gives working CLIs from any directory. The
repo-root ``train.py`` / ``main.py`` / ``render.py`` / ``infer.py`` scripts
are thin shims over these modules, preserving the reference's
``python train.py --config config.yaml`` invocation.
"""

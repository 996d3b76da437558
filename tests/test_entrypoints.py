"""Fresh-clone demo path: every entry script must run green with ZERO
external assets (VERDICT r1 #7). FLAME and VOCASET are licensed, so the entry
points synthesize stand-ins on demand (data/synthetic.py)."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, cwd, timeout=900):
    env = dict(os.environ)
    env["A2F_FORCE_PLATFORM"] = "cpu"  # hermetic: don't grab the TPU
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, *args], cwd=cwd, env=env,
        capture_output=True, text=True, timeout=timeout,
    )
    assert proc.returncode == 0, f"{args}\n--- stdout\n{proc.stdout}\n--- stderr\n{proc.stderr}"
    return proc


def test_generate_demo_assets(tmp_path):
    from audio2face_tpu.data.synthetic import generate_demo_assets
    from audio2face_tpu.utils.facemesh import FaceMesh

    paths = generate_demo_assets(str(tmp_path / "assets"), n_verts=523, seconds=0.3)
    mesh = FaceMesh.load(paths["template"])
    assert mesh.verts.shape == (523, 3)
    assert mesh.faces.min() >= 0 and mesh.faces.max() < 523
    anim = np.load(paths["verts"])
    assert anim.shape == (18, 523, 3)
    assert os.path.getsize(paths["audio"]) > 1000
    # idempotent: second call keeps the files
    before = os.path.getmtime(paths["template"])
    generate_demo_assets(str(tmp_path / "assets"), n_verts=523, seconds=0.3)
    assert os.path.getmtime(paths["template"]) == before


def test_speech_like_synthesis_has_speech_statistics():
    """The demo clip is formant-synthesized babble, not a tone: frame-wise
    spectral centroids must glide (formant transitions) and the RMS envelope
    must modulate syllabically (voicing alternation)."""
    from audio2face_tpu.data.synthetic import synthesize_speech_like

    sr = 22000
    w = synthesize_speech_like(2.0, sr, seed=0)
    assert w.shape == (2 * sr,) and w.dtype == np.float32
    assert np.isfinite(w).all() and 0.4 < np.abs(w).max() <= 0.5

    hop = sr // 10
    frames = w[: len(w) // hop * hop].reshape(-1, hop)
    spec = np.abs(np.fft.rfft(frames, axis=1))
    freqs = np.fft.rfftfreq(hop, 1 / sr)
    centroid = (spec * freqs).sum(1) / np.maximum(spec.sum(1), 1e-9)
    assert centroid.std() > 100.0  # a constant tone's centroid barely moves
    rms = np.sqrt((frames**2).mean(1))
    assert rms.max() > 4 * max(float(rms.min()), 1e-6)
    # deterministic per seed, different across seeds
    np.testing.assert_array_equal(w, synthesize_speech_like(2.0, sr, seed=0))
    assert np.abs(w - synthesize_speech_like(2.0, sr, seed=1)).max() > 0.01


def test_main_renders_from_fresh_dir(tmp_path):
    """`python main.py` in an empty cwd: generates assets, renders, writes
    the video — zero external files."""
    # pre-seed tiny assets so the CPU rasterizer renders ~12 frames, not 120
    from audio2face_tpu.data.synthetic import generate_demo_assets

    generate_demo_assets(str(tmp_path / "assets"), n_verts=523, seconds=0.2)
    _run([os.path.join(REPO, "main.py")], cwd=str(tmp_path))
    assert os.path.exists(tmp_path / "output" / "tmp.mp4")


@pytest.mark.slow
def test_train_runs_from_fresh_dir(tmp_path):
    """`python train.py --config configs/audio2mesh.yaml` in an empty cwd:
    synthesizes a VOCASET stand-in, fits one epoch, predicts, saves verts."""
    import shutil

    cfg_src = os.path.join(REPO, "configs", "audio2mesh.yaml")
    cfg = tmp_path / "audio2mesh.yaml"
    shutil.copy(cfg_src, cfg)
    # shrink the vertex count so the CPU run stays fast; the full-size path
    # is exercised on TPU by bench.py / train smoke
    text = cfg.read_text().replace("15069", "1569")
    cfg.write_text(text)

    _run(
        [
            os.path.join(REPO, "train.py"),
            "--config", str(cfg),
            "--max-epochs", "1",
            "--predict-subject", "FaceTalk_170809_00138_TA",
            "--predict-sentence", "sentence01",
            "--skip-render",
        ],
        cwd=str(tmp_path),
    )
    # synthetic dataset + a saved prediction exist
    assert os.path.exists(tmp_path / "synthetic_vocaset" / "data_verts.npy")
    logs = tmp_path / "logs"
    runs = list(logs.iterdir())
    assert runs, "no run dir written"
    pred = np.load(runs[0] / "pred_verts.npy")
    assert pred.shape[1:] == (523, 3)

    # a2f-eval sweep mode: restore the checkpoint the fit just wrote and
    # compute LVE/FDD/MVE over (a slice of) the test split
    proc = _run(
        [
            "-m", "audio2face_tpu.cli.evaluate",
            "--config", str(cfg),
            "--dataset-path", str(tmp_path / "synthetic_vocaset"),
            "--max-sentences", "2",
        ],
        cwd=str(tmp_path),
    )
    import json

    metrics = json.loads(proc.stdout.strip().splitlines()[-1])["metrics"]
    assert metrics["n_sentences"] == 2
    for k in ("lve", "fdd", "mve", "max_l2", "err"):
        assert np.isfinite(metrics[k]), metrics


def test_eval_animation_diff(tmp_path):
    """`a2f-eval --pred --gt --template` diff mode: identical animations
    score zero on every error metric; a perturbed copy scores positive and
    max_l2 reports the exact injected displacement."""
    import json

    from audio2face_tpu.data.synthetic import generate_synthetic_face_obj

    template = str(tmp_path / "template.obj")
    generate_synthetic_face_obj(template, n_verts=523)

    rng = np.random.default_rng(0)
    gt = rng.normal(size=(7, 523, 3)).astype(np.float32) * 0.01
    pred = gt.copy()
    pred[3, 41] += np.float32([3e-3, 0, 4e-3])  # ||d|| = 5e-3 exactly
    np.save(tmp_path / "gt.npy", gt)
    np.save(tmp_path / "pred.npy", pred)

    def run_eval(pred_path):
        proc = _run(
            ["-m", "audio2face_tpu.cli.evaluate",
             "--pred", str(pred_path), "--gt", str(tmp_path / "gt.npy"),
             "--template", template],
            cwd=str(tmp_path),
        )
        return json.loads(proc.stdout.strip().splitlines()[-1])["metrics"]

    same = run_eval(tmp_path / "gt.npy")
    assert same["n_frames"] == 7
    assert same["lve"] == 0 and same["mve"] == 0 and same["max_l2"] == 0
    assert same["fdd"] == 0

    diff = run_eval(tmp_path / "pred.npy")
    assert diff["max_l2"] == pytest.approx(5e-3, rel=1e-5)
    assert diff["mve"] > 0 and diff["lve"] >= 0


@pytest.mark.slow
def test_infer_frame_model_smoke(tmp_path):
    """`python infer.py --config <frame model>` serves a frame model from a
    wav + template, offline and --streaming (FrameStreamPool), writing
    per-clip vertex animations."""
    from audio2face_tpu.data.synthetic import generate_demo_assets

    paths = generate_demo_assets(str(tmp_path / "assets"), n_verts=523, seconds=0.4)
    cfg = tmp_path / "a2m.yaml"
    cfg.write_text(
        "batch_size: 4\nmodelname: audio2mesh\nvertex_count: 1569\n"
        "one_hot_size: 12\nsplit_frame: True\npercision: '32'\nlr: 1e-3\n"
        "feature_extractor: mfcc\nsample_rate: 22000\nn_feature: 32\n"
        "out_dim: 52\nwin_length: 440\n"
    )
    for extra in ([], ["--streaming"]):
        out_dir = tmp_path / ("out_stream" if extra else "out")
        proc = _run(
            [os.path.join(REPO, "infer.py"), "--audio", paths["audio"],
             "--template", paths["template"], "--config", str(cfg),
             "--output", str(out_dir), *extra],
            cwd=str(tmp_path),
        )
        verts = np.load(out_dir / "sample_audio_verts.npy")
        assert verts.shape == (24, 523, 3), (extra, verts.shape, proc.stdout)


def test_packaging_console_entry_points():
    """pyproject console scripts resolve: each a2f-* target module exposes a
    zero-arg main(), and the repo-root shims delegate to the same functions
    (the wheel install path and the reference-style `python train.py` path
    share one implementation)."""
    import importlib
    import tomllib

    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        scripts = tomllib.load(f)["project"]["scripts"]
    assert set(scripts) == {
        "a2f-train", "a2f-infer", "a2f-render", "a2f-render-frames", "a2f-serve",
        "a2f-eval", "a2f-export",
    }
    for target in scripts.values():
        mod_name, func = target.split(":")
        mod = importlib.import_module(mod_name)
        assert callable(getattr(mod, func))

    for shim, cli_mod in [
        ("train.py", "audio2face_tpu.cli.train"),
        ("main.py", "audio2face_tpu.cli.render_offline"),
        ("render.py", "audio2face_tpu.cli.render_frames"),
        ("infer.py", "audio2face_tpu.cli.infer"),
    ]:
        with open(os.path.join(REPO, shim)) as f:
            src = f.read()
        assert f"from {cli_mod} import main" in src, shim


@pytest.mark.slow
def test_train_biwi_from_fresh_dir(tmp_path):
    """`python train.py --config <biwi faceformer yaml>` in an empty cwd:
    routes to BiwiDataModule, synthesizes a BIWI stand-in corpus, fits one
    epoch at the 25 fps clock, and falls back to a BIWI test pair when the
    predict-subject default (a VOCASET name) is absent."""
    cfg = tmp_path / "faceformer_biwi.yaml"
    cfg.write_text(
        "batch_size: 2\nmodelname: faceformer\nvertex_count: 360\n"
        "one_hot_size: 6\nsplit_frame: False\npercision: '32'\nlr: 1e-4\n"
        "feature_extractor: mfcc\nsample_rate: 22000\nn_feature: 32\n"
        "out_dim: 52\nwin_length: 440\ndataset: biwi\n"
    )
    _run(
        [os.path.join(REPO, "train.py"), "--config", str(cfg),
         "--max-epochs", "1", "--skip-render"],
        cwd=str(tmp_path),
        timeout=1800,  # CPU wav2vec2 fwd+bwd compiles dominate (~5 min alone)
    )
    assert os.path.exists(tmp_path / "synthetic_biwi" / "templates.pkl")
    runs = list((tmp_path / "logs").iterdir())
    assert runs, "no run dir written"
    pred = np.load(runs[0] / "pred_verts.npy")
    assert pred.shape[1:] == (120, 3)
    # 25 fps clock: the synthetic 0.8 s sentences decode 20 frames
    assert pred.shape[0] == 20, pred.shape

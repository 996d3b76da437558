"""Synthetic VOCASET-format data generator.

Produces a directory with the exact artifact schema the reference loads
(src/dataset/vocaset.py:205-229): ``templates.pkl`` (subject -> (V,3) f64),
``raw_audio_fixed.pkl`` (subject -> sentence -> {"audio": int16,
"sample_rate": 22000}), ``data_verts.npy`` ((N, V, 3) float), and
``subj_seq_to_idx.pkl`` (subject -> sentence -> {frame_index: verts_row}).

Used by tests and smoke training runs — the real VOCASET requires a license
and ~30 GB; everything downstream (split CSVs, fragmenter, training loop) is
format-identical either way. Audio is a per-subject harmonic tone with an
amplitude envelope correlated with the vertex offsets, so models can actually
fit it.
"""

from __future__ import annotations

import os
import pickle

import numpy as np

from audio2face_tpu.data.vocaset import ALL_SUBJECTS, FPS


def generate_synthetic_vocaset(
    out_dir: str,
    *,
    n_verts: int = 5023,
    sentences_per_subject: int = 2,
    seconds_per_sentence: float = 0.8,
    sample_rate: int = 22000,
    subjects: list[str] | None = None,
    val_sentences: bool = True,
    seed: int = 0,
) -> str:
    """Write a miniature VOCASET into ``out_dir`` and return it."""
    rng = np.random.default_rng(seed)
    subjects = subjects if subjects is not None else ALL_SUBJECTS
    os.makedirs(out_dir, exist_ok=True)

    templates = {
        s: (rng.normal(0.0, 0.01, (n_verts, 3)) + [0.0, 0.0, 0.05]).astype(np.float64)
        for s in subjects
    }

    raw_audio: dict = {}
    subj_seq_to_idx: dict = {}
    verts_rows = []
    row = 0
    for si, subject in enumerate(subjects):
        raw_audio[subject] = {}
        subj_seq_to_idx[subject] = {}
        sentence_ids = [f"sentence{i:02d}" for i in range(1, sentences_per_subject + 1)]
        if val_sentences and sentences_per_subject < 21:
            # ensure val subjects also get sentences in the 21-40 val range
            sentence_ids += [f"sentence{20 + i:02d}" for i in range(1, sentences_per_subject + 1)]
        for sentence_id in sentence_ids:
            n_samples = int(seconds_per_sentence * sample_rate)
            t = np.arange(n_samples) / sample_rate
            f0 = 110.0 * (1 + si * 0.1)
            envelope = 0.4 + 0.3 * np.sin(2 * np.pi * 1.7 * t + si)
            wav = envelope * (
                np.sin(2 * np.pi * f0 * t) + 0.3 * np.sin(2 * np.pi * 2 * f0 * t)
            )
            audio_i16 = (wav * 16384).astype(np.int16)
            raw_audio[subject][sentence_id] = {
                "audio": audio_i16,
                "sample_rate": sample_rate,
            }

            n_frames = int(n_samples * FPS / sample_rate)
            frame_env = envelope[
                np.minimum((np.arange(n_frames) * sample_rate // FPS), n_samples - 1)
            ]
            base = templates[subject]
            direction = rng.normal(0.0, 1.0, (1, n_verts, 3)) * 0.002
            seq = base[None] + frame_env[:, None, None] * direction
            idx_map = {}
            for fi in range(n_frames):
                verts_rows.append(seq[fi].astype(np.float32))
                idx_map[fi] = row
                row += 1
            subj_seq_to_idx[subject][sentence_id] = idx_map

    with open(os.path.join(out_dir, "templates.pkl"), "wb") as f:
        pickle.dump(templates, f)
    with open(os.path.join(out_dir, "raw_audio_fixed.pkl"), "wb") as f:
        pickle.dump(raw_audio, f)
    np.save(os.path.join(out_dir, "data_verts.npy"), np.stack(verts_rows))
    with open(os.path.join(out_dir, "subj_seq_to_idx.pkl"), "wb") as f:
        pickle.dump(subj_seq_to_idx, f)
    return out_dir

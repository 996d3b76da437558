"""Training entry point — surface parity with the reference train.py:18-76.

``python train.py --config config.yaml [--dataset-path PATH]``

Loads the YAML ExpConfig, applies the faceformer special-casing
(split_frame=False, batch_size=1, no standalone extractor — train.py:30-34),
fits with val-err checkpointing + early stopping (patience 5, max 50 epochs —
train.py:48-59), reloads the newest checkpoint (train.py:62-67) and renders
one predicted test sentence to video + wav (train.py:73-76,
lightning_model.py:232-246).
"""

import argparse
import os

import numpy as np

from audio2face_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()  # also pins A2F_FORCE_PLATFORM before first JAX use

from audio2face_tpu.config import ExpConfig
from audio2face_tpu.data.vocaset import VocaDataModule
from audio2face_tpu.training.trainer import Audio2FaceExperiment
from audio2face_tpu.utils.facemesh import FaceMesh
from audio2face_tpu.utils.renderer import Renderer, images_to_video, save_audio


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, default="config.yaml")
    parser.add_argument(
        "--dataset-path", type=str, default=None,
        help="VOCASET artifact dir (default: parent of cwd, as the reference)",
    )
    parser.add_argument("--max-epochs", type=int, default=None)
    parser.add_argument(
        "--predict-subject", type=str, default="FaceTalk_170908_03277_TA"
    )
    parser.add_argument("--predict-sentence", type=str, default="sentence02")
    parser.add_argument(
        "--template", type=str, default="assets/FLAME_sample.obj",
        help="mesh used to render the prediction video",
    )
    parser.add_argument("--skip-render", action="store_true")
    parser.add_argument(
        "--accumulate-grad-batches", type=int, default=None,
        help="split each batch into k in-jit microbatches, average their "
        "gradients, apply ONE optimizer update (peak activation memory "
        "drops ~k-fold; Lightning's accumulate_grad_batches semantics; "
        "default: the config's accumulate_grad_batches key, else 1)",
    )
    parser.add_argument(
        "--batch-size", type=int, default=None,
        help="override the config's batch size AFTER the reference "
        "faceformer override (which pins it to 1, train.py:30-34) — "
        "padded whole-clip batching is this framework's extension",
    )
    args = parser.parse_args()

    dataset_path = args.dataset_path or os.path.join(os.getcwd(), "..")
    config = ExpConfig.from_yaml(args.config).apply_faceformer_overrides()
    if args.batch_size:
        config = config.model_copy(update={"batch_size": args.batch_size})

    if not args.skip_render and not os.path.exists(args.template):
        from audio2face_tpu.data.synthetic import generate_synthetic_face_obj

        print(f"{args.template} missing; writing a synthetic stand-in template")
        generate_synthetic_face_obj(args.template, n_verts=config.vertex_count // 3)

    # fresh-clone path: both corpora are licensed, so when no artifacts
    # exist we train on the format-identical synthetic stand-in
    if config.dataset == "biwi":
        from audio2face_tpu.data.biwi import BiwiDataModule, generate_synthetic_biwi

        if not os.path.exists(os.path.join(dataset_path, "templates.pkl")):
            dataset_path = os.path.join(os.getcwd(), "synthetic_biwi")
            if not os.path.exists(os.path.join(dataset_path, "templates.pkl")):
                print(f"no BIWI artifacts found; generating synthetic data in {dataset_path}")
                generate_synthetic_biwi(dataset_path, n_verts=config.vertex_count // 3)
        datamodule = BiwiDataModule(dataset_path, batch_size=config.batch_size)
    else:
        if not os.path.exists(os.path.join(dataset_path, "data_verts.npy")):
            from audio2face_tpu.data.synthetic import generate_synthetic_vocaset

            dataset_path = os.path.join(os.getcwd(), "synthetic_vocaset")
            if not os.path.exists(os.path.join(dataset_path, "data_verts.npy")):
                print(f"no VOCASET artifacts found; generating synthetic data in {dataset_path}")
                generate_synthetic_vocaset(dataset_path, n_verts=config.vertex_count // 3)
        datamodule = VocaDataModule(
            dataset_path,
            batch_size=config.batch_size,
            num_workers=8,
            split_frame=config.split_frame,
        )
    datamodule.setup()

    experiment = Audio2FaceExperiment(
        config, accumulate_grad_batches=args.accumulate_grad_batches
    )
    state, result = experiment.fit(datamodule, max_epochs=args.max_epochs)
    print(f"Best val/err {result.best_val_err} at epoch {result.best_epoch}")

    # reload newest checkpoint (reference sorts by trailing step int)
    state = experiment.load_checkpoint()

    pred_subject, pred_sentence = args.predict_subject, args.predict_sentence
    test_list = getattr(datamodule.test_dataset, "datalist", None)
    if test_list and not any(row[0] == pred_subject for row in test_list):
        # the CLI defaults name a VOCASET subject; on BIWI (or a custom
        # corpus) fall back to the first test pair instead of KeyError-ing
        pred_subject, pred_sentence = test_list[0][0], test_list[0][1]
        print(f"predict subject not in test split; using {pred_subject}/{pred_sentence}")
    batch = datamodule.predict_batch(pred_subject, pred_sentence)
    pred, err = experiment.predict(state, batch)
    pred = np.asarray(pred)
    if experiment.is_faceformer:
        # trim bucket padding to the clip's valid frames
        n_valid = int(batch["frame_lengths"][0])
        pred = pred.reshape(-1, pred.shape[-2], 3)[:n_valid]
    print(f"predict_rec_loss: {float(err)}")

    # domain metrics on the predicted sentence (LVE / FDD / MVE — see
    # audio2face_tpu/evaluation.py; beyond the reference's single MSE print)
    gt = np.asarray(batch["verts"], np.float32).reshape(-1, pred.shape[-2], 3)[
        : pred.shape[0]
    ]
    template_vert = np.asarray(batch["template_vert"], np.float32).reshape(
        -1, pred.shape[-2], 3
    )[0]
    from audio2face_tpu.evaluation import evaluate_animation

    metrics = evaluate_animation(pred, gt, template_vert)
    print(
        "predict metrics: "
        + " ".join(f"{k}={v:.6g}" for k, v in metrics.items())
    )

    log_dir = experiment.log_dir
    np.save(os.path.join(log_dir, "pred_verts.npy"), pred)
    if not args.skip_render and os.path.exists(args.template):
        renderer = Renderer(FaceMesh.load(args.template))
        images = renderer.render(pred)
        save_audio(batch["audio"].reshape(-1), log_dir)
        images_to_video(images, log_dir,
                        fps=25 if config.dataset == "biwi" else 60)


if __name__ == "__main__":
    main()

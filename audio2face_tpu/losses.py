"""Position + velocity losses, pure JAX.

Numerical semantics match the reference losses exactly
(src/loss/loss.py:4-55): reconstruction is the batch/vertex mean of the
per-vertex squared L2 norm, velocity pairs consecutive items along the
leading axis (view (-1, 2, V, 3)), weights k_rec=1 / k_vel=10, and the
FaceFormer variant squeezes the batch dim and drops the last frame when the
frame count is odd.
"""

from __future__ import annotations

import jax.numpy as jnp


def _per_vertex_sq_l2_mean(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    # (N, V, 3) -> mean over N and V of sum over coords of squared error
    return jnp.mean(jnp.sum(jnp.square(pred - gt), axis=2))


class VocaLoss:
    """Reconstruction + velocity loss (reference: src/loss/loss.py:25-55)."""

    def __init__(self, k_rec: float = 1.0, k_vel: float = 10.0):
        self.k_rec = k_rec
        self.k_vel = k_vel

    def __call__(self, pred: jnp.ndarray, gt: jnp.ndarray) -> dict[str, jnp.ndarray]:
        bs = pred.shape[0]
        pred = pred.reshape(bs, -1, 3).astype(jnp.float32)
        gt = gt.reshape(bs, -1, 3).astype(jnp.float32)
        n_verts = pred.shape[1]

        rec_loss = _per_vertex_sq_l2_mean(pred, gt)

        # velocity over consecutive leading-axis pairs: view (-1, 2, V, 3)
        pred_pairs = pred.reshape(-1, 2, n_verts, 3)
        gt_pairs = gt.reshape(-1, 2, n_verts, 3)
        v_pred = pred_pairs[:, 1] - pred_pairs[:, 0]
        v_gt = gt_pairs[:, 1] - gt_pairs[:, 0]
        vel_loss = _per_vertex_sq_l2_mean(v_pred, v_gt)

        return {
            "loss": rec_loss * self.k_rec + vel_loss * self.k_vel,
            "rec_loss": rec_loss,
            "vel_loss": vel_loss,
        }


class FaceFormerLoss:
    """Sequence loss: squeeze batch, drop trailing odd frame, delegate to
    VocaLoss so velocity pairs are (t, t+1) (reference: src/loss/loss.py:4-21)."""

    def __init__(self) -> None:
        self.loss = VocaLoss()

    def __call__(self, pred: jnp.ndarray, gt: jnp.ndarray) -> dict[str, jnp.ndarray]:
        pred = jnp.squeeze(pred, axis=0)
        gt = jnp.squeeze(gt, axis=0)
        if gt.shape[0] % 2 != 0:
            pred = pred[:-1]
            gt = gt[:-1]
        return self.loss(pred, gt)


def masked_faceformer_loss(
    pred: jnp.ndarray, gt: jnp.ndarray, frame_mask: jnp.ndarray
) -> dict[str, jnp.ndarray]:
    """Padded-batch generalisation of FaceFormerLoss for jit-friendly training.

    ``pred``/``gt`` are (B, T, V, 3) padded to a static T; ``frame_mask`` is
    (B, T) with 1.0 on valid frames. Matches FaceFormerLoss exactly for B=1
    when the valid frames fill the buffer: per-vertex squared-L2 means for
    reconstruction, and velocity over *non-overlapping* frame pairs
    ((0,1), (2,3), ... — the reference's ``view(-1, 2, V, 3)`` grouping,
    src/loss/loss.py:31-40; odd trailing frames drop, loss.py:13-16).
    """
    pred = pred.astype(jnp.float32)
    gt = gt.astype(jnp.float32)
    sq = jnp.sum(jnp.square(pred - gt), axis=-1)  # (B, T, V)
    per_frame = jnp.mean(sq, axis=-1)  # (B, T)
    denom = jnp.maximum(jnp.sum(frame_mask), 1.0)
    rec_loss = jnp.sum(per_frame * frame_mask) / denom

    # non-overlapping pairs: (0,1), (2,3), ...
    t_even = (pred.shape[1] // 2) * 2
    v_pred = pred[:, 1:t_even:2] - pred[:, 0:t_even:2]
    v_gt = gt[:, 1:t_even:2] - gt[:, 0:t_even:2]
    vmask = frame_mask[:, 1:t_even:2] * frame_mask[:, 0:t_even:2]
    vsq = jnp.mean(jnp.sum(jnp.square(v_pred - v_gt), axis=-1), axis=-1)
    vdenom = jnp.maximum(jnp.sum(vmask), 1.0)
    vel_loss = jnp.sum(vsq * vmask) / vdenom

    return {
        "loss": rec_loss + 10.0 * vel_loss,
        "rec_loss": rec_loss,
        "vel_loss": vel_loss,
    }


def mse_error(
    pred: jnp.ndarray,
    gt: jnp.ndarray,
    n_verts: int = 5023,
    frame_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Validation "err" metric: mean over items of the mean squared difference
    over the flattened (n_verts*3,) vertex vector
    (reference: src/model/lightning_model.py:119-125, hardcoded 5023*3).
    ``frame_mask`` restricts the item mean to valid frames in padded batches
    (the bs=1 reference never pads)."""
    per_item_shape = (-1, n_verts * 3)
    p = pred.reshape(per_item_shape).astype(jnp.float32)
    g = gt.reshape(per_item_shape).astype(jnp.float32)
    per_item = jnp.mean(jnp.square(p - g), axis=1)
    if frame_mask is None:
        return jnp.mean(per_item)
    mask = frame_mask.reshape(-1)
    return jnp.sum(per_item * mask) / jnp.maximum(jnp.sum(mask), 1.0)

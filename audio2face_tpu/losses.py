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


def chunked_faceformer_head_loss(
    hs: jnp.ndarray,  # (B, T, 64) decoder hidden states
    kernel: jnp.ndarray,  # (64, 3V) vertice_map_r
    bias: jnp.ndarray,  # (3V,)
    template: jnp.ndarray,  # (B, V, 3), training units
    gt: jnp.ndarray,  # (B, T, V, 3), training units
    frame_mask: jnp.ndarray,  # (B, T)
    *,
    n_verts: int,
    precision=None,
    chunk: int = 128,
):
    """``masked_faceformer_loss`` + ``mse_error`` WITHOUT materializing the
    (B, T, V, 3) prediction.

    The vertex head is a row-parallel matmul and every loss term is a sum
    over frames (velocity pairs are the reference's NON-overlapping
    (0,1), (2,3), ... grouping, src/loss/loss.py:31-40), so an even-sized
    frame chunking decomposes both exactly: each checkpointed scan step
    projects ``chunk`` frames, accumulates the masked sums, and the
    backward rematerializes one chunk of vertices at a time. Peak memory
    is O(B * chunk * V) instead of O(B * T * V) — the difference between
    batch-16 whole-clip FaceFormer training fitting in HBM or not.

    Returns ``({"loss", "rec_loss", "vel_loss"}, err)`` equal (up to f32
    summation order) to the unchunked pair.
    """
    import jax

    b, t, d = hs.shape
    # chunk must be even (velocity pairs may not straddle chunks) and must
    # DIVIDE the even prefix exactly: padding gt to a chunk multiple would
    # copy the very (B, T, V, 3)-scale buffer this function exists to avoid.
    # An odd trailing frame is handled separately below (it can never be in
    # a velocity pair — the reference drops it from pairing, loss.py:13-16).
    t_even = (t // 2) * 2
    c = min(chunk, max(t_even, 2))
    while t_even % c or c % 2:
        c -= 1  # terminates at 2 (t_even is even); static python
    chunk = c
    nc = max(t_even // chunk, 1)

    tmpl_flat = template.reshape(b, 1, -1)

    def head(hsc):
        p = (
            jnp.matmul(hsc.reshape(-1, d), kernel, precision=precision) + bias
        ).reshape(b, hsc.shape[1], -1)
        return (p.astype(jnp.float32) + tmpl_flat).reshape(
            b, hsc.shape[1], n_verts, 3
        )

    def body(carry, i):
        rec_n, m_n, vel_n, vm_n, err_n = carry
        # slice chunks in-body: a (nc, B, chunk, V, 3) transpose of gt would
        # be a second full-size copy of the largest array in the step —
        # exactly the buffer this function exists to avoid
        hsc = jax.lax.dynamic_slice_in_dim(hs, i * chunk, chunk, axis=1)
        gtc = jax.lax.dynamic_slice_in_dim(gt, i * chunk, chunk, axis=1)
        mc = jax.lax.dynamic_slice_in_dim(frame_mask, i * chunk, chunk, axis=1)
        pred = head(hsc)
        gtc = gtc.astype(jnp.float32)

        sq = jnp.sum(jnp.square(pred - gtc), axis=-1)  # (B, chunk, V)
        per_frame = jnp.mean(sq, axis=-1)
        rec_n = rec_n + jnp.sum(per_frame * mc)
        m_n = m_n + jnp.sum(mc)

        v_pred = pred[:, 1::2] - pred[:, 0::2]
        v_gt = gtc[:, 1::2] - gtc[:, 0::2]
        vmask = mc[:, 1::2] * mc[:, 0::2]
        vsq = jnp.mean(jnp.sum(jnp.square(v_pred - v_gt), axis=-1), axis=-1)
        vel_n = vel_n + jnp.sum(vsq * vmask)
        vm_n = vm_n + jnp.sum(vmask)

        per_item = jnp.mean(
            jnp.square(pred.reshape(b, chunk, -1) - gtc.reshape(b, chunk, -1)),
            axis=-1,
        )
        err_n = err_n + jnp.sum(per_item * mc)
        return (rec_n, m_n, vel_n, vm_n, err_n), None

    zeros = tuple(jnp.zeros((), jnp.float32) for _ in range(5))
    (rec_n, m_n, vel_n, vm_n, err_n), _ = jax.lax.scan(
        jax.checkpoint(body), zeros, jnp.arange(nc)
    )
    if t_even < t:  # odd trailing frame: rec + err terms only, never paired
        pred_t = head(hs[:, t_even:t])
        gt_t = gt[:, t_even:t].astype(jnp.float32)
        m_t = frame_mask[:, t_even:t]
        sq_t = jnp.sum(jnp.square(pred_t - gt_t), axis=-1)
        rec_n = rec_n + jnp.sum(jnp.mean(sq_t, axis=-1) * m_t)
        m_n = m_n + jnp.sum(m_t)
        per_item_t = jnp.mean(
            jnp.square(pred_t.reshape(b, 1, -1) - gt_t.reshape(b, 1, -1)),
            axis=-1,
        )
        err_n = err_n + jnp.sum(per_item_t * m_t)
    denom = jnp.maximum(m_n, 1.0)
    vdenom = jnp.maximum(vm_n, 1.0)
    rec_loss = rec_n / denom
    vel_loss = vel_n / vdenom
    return (
        {
            "loss": rec_loss + 10.0 * vel_loss,
            "rec_loss": rec_loss,
            "vel_loss": vel_loss,
        },
        err_n / denom,
    )

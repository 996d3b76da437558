"""Evaluation metrics for speech-driven 3D facial animation.

The reference's only quality signal is the scalar ``err`` MSE logged during
training (src/model/lightning_model.py:119-125). The metrics the field
actually compares models with (FaceFormer, CodeTalker and successors) are
region-based:

- **LVE** (lip vertex error): per frame, the maximum squared L2 distance
  over the lip-region vertices; averaged over frames. Captures worst-case
  lip-sync error, the perceptually dominant region.
- **FDD** (upper-face dynamics deviation): for each upper-face vertex, the
  standard deviation over time of its squared displacement from the neutral
  template — a scalar "how much does this vertex move" — compared between
  prediction and ground truth and averaged over the region. Captures
  whether the model reproduces the *amount* of upper-face motion (eyebrows,
  lids) rather than freezing it, which pointwise errors reward.
- **MVE** (mean vertex error): mean L2 distance over all vertices/frames.
- **max vertex L2**: the parity metric used throughout this repo's
  checkpoint-conversion tests (BASELINE.md: < 1e-4 vs PyTorch reference).

Formulas (x = prediction, y = ground truth, T = template, all (T, V, 3) in
dataset units — VOCASET is meters):

    LVE  = mean_t max_{v in lips} ||x_tv - y_tv||^2
    dyn(z)_v = std_t ||z_tv - T_v||^2
    FDD  = mean_{v in upper} ( dyn(x)_v - dyn(y)_v )      (signed)
    MVE  = mean_{t,v} ||x_tv - y_tv||

Region masks are vertex-index arrays. FLAME's official segmentation masks
are licensed and cannot ship here; pass them in when you have them
(``VertexRegions(lip=np.load(...), upper=np.load(...))``). Without them,
:func:`infer_regions` derives a documented geometric stand-in from the
neutral template (FLAME convention: +y up, +z out of the face) so the
metrics work out of the box — self-consistent across models/checkpoints,
but NOT comparable with published numbers computed on the official masks.

Everything is jit-friendly (static region indices, masked means) and
batched: arrays may be (T, V, 3) or (B, T, V, 3) with an optional
``frame_mask`` for padded batches.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class VertexRegions:
    """Vertex-index arrays for the metric regions (host numpy, static under
    jit). ``lip`` drives LVE, ``upper`` drives FDD."""

    lip: np.ndarray
    upper: np.ndarray

    def __post_init__(self):
        object.__setattr__(self, "lip", np.asarray(self.lip, np.int32).ravel())
        object.__setattr__(self, "upper", np.asarray(self.upper, np.int32).ravel())
        if self.lip.size == 0 or self.upper.size == 0:
            raise ValueError("regions must be non-empty index arrays")


def infer_regions(template: np.ndarray) -> VertexRegions:
    """Geometric stand-in for the licensed FLAME segmentation masks.

    Under the FLAME axis convention (+y up, +z toward the viewer):

    - ``lip``: vertices in the lower 45% of the bounding-box height, within
      the frontmost 30% of depth, and within the central half of the width —
      the protruding mouth/chin front.
    - ``upper``: vertices in the top 40% of the bounding-box height —
      forehead/brow/eye region.

    Documented heuristic, not anatomy: numbers computed with it are
    self-consistent (same mask for prediction and ground truth, so model
    comparisons are meaningful) but not comparable with published results
    that use the official masks.
    """
    t = np.asarray(template, np.float64).reshape(-1, 3)
    lo, hi = t.min(axis=0), t.max(axis=0)
    span = np.maximum(hi - lo, 1e-12)
    u = (t - lo) / span  # normalized [0,1]^3 coordinates

    lip = (u[:, 1] < 0.45) & (u[:, 2] > 0.70) & (np.abs(u[:, 0] - 0.5) < 0.25)
    upper = u[:, 1] > 0.60
    # degenerate templates (flat axes, tiny meshes): fall back to halves
    if not lip.any():
        lip = u[:, 1] < 0.5
    if not upper.any():
        upper = u[:, 1] >= 0.5
    return VertexRegions(lip=np.flatnonzero(lip), upper=np.flatnonzero(upper))


# ---------------------------------------------------------------------------
# metric primitives — (..., T, V, 3) arrays, optional (..., T) frame mask
# ---------------------------------------------------------------------------


def _masked_mean(x: jnp.ndarray, mask: Optional[jnp.ndarray], axis) -> jnp.ndarray:
    if mask is None:
        return jnp.mean(x, axis=axis)
    m = jnp.broadcast_to(mask, x.shape)
    denom = jnp.maximum(jnp.sum(m, axis=axis), 1.0)
    return jnp.sum(x * m, axis=axis) / denom


def lip_vertex_error(
    pred: jnp.ndarray,
    gt: jnp.ndarray,
    lip_ids: np.ndarray,
    frame_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """LVE: mean over frames of the max squared L2 over lip vertices.

    ``pred``/``gt``: (..., T, V, 3); ``frame_mask``: (..., T) 1=valid.
    Returns a scalar (batch dims averaged, mask-weighted).
    """
    ids = jnp.asarray(np.asarray(lip_ids, np.int32))
    d2 = jnp.sum(jnp.square(pred[..., ids, :] - gt[..., ids, :]), axis=-1)
    per_frame = jnp.max(d2, axis=-1)  # (..., T)
    return _masked_mean(per_frame, frame_mask, axis=None)


def upper_face_dynamics_deviation(
    pred: jnp.ndarray,
    gt: jnp.ndarray,
    template: jnp.ndarray,
    upper_ids: np.ndarray,
    frame_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """FDD: mean over upper-face vertices of dyn(pred) − dyn(gt), where
    dyn(z)_v = std over frames of ||z_tv − template_v||². Signed: positive
    means the prediction over-animates the upper face, negative means it
    under-animates (the common failure).

    ``template``: (..., V, 3) (broadcast over T). With a frame mask, the
    std is computed over valid frames only.
    """
    ids = jnp.asarray(np.asarray(upper_ids, np.int32))
    tmpl = template[..., None, :, :] if template.ndim == pred.ndim - 1 else template

    def dyn(z):
        d2 = jnp.sum(jnp.square(z[..., ids, :] - tmpl[..., ids, :]), axis=-1)
        # (..., T, Vu): std over the frame axis, mask-weighted
        if frame_mask is None:
            return jnp.std(d2, axis=-2)
        m = frame_mask[..., None]
        n = jnp.maximum(jnp.sum(m, axis=-2), 1.0)
        mu = jnp.sum(d2 * m, axis=-2) / n
        var = jnp.sum(jnp.square(d2 - mu[..., None, :]) * m, axis=-2) / n
        return jnp.sqrt(var)

    return jnp.mean(dyn(pred) - dyn(gt))


def mean_vertex_error(
    pred: jnp.ndarray, gt: jnp.ndarray, frame_mask: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """MVE: mean L2 distance over all vertices and (valid) frames."""
    d = jnp.sqrt(jnp.sum(jnp.square(pred - gt), axis=-1))  # (..., T, V)
    mask = None if frame_mask is None else frame_mask[..., None]
    return _masked_mean(d, mask, axis=None)


def max_vertex_l2(
    pred: jnp.ndarray, gt: jnp.ndarray, frame_mask: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """The repo's parity metric: max L2 distance over every vertex/frame."""
    d = jnp.sqrt(jnp.sum(jnp.square(pred - gt), axis=-1))
    if frame_mask is not None:
        d = d * frame_mask[..., None]
    return jnp.max(d)


def evaluate_animation(
    pred,
    gt,
    template,
    regions: Optional[VertexRegions] = None,
    frame_mask=None,
) -> dict:
    """All metrics for one (or a batch of) predicted animation(s), as python
    floats. ``regions=None`` infers the geometric stand-in from the
    template (see :func:`infer_regions`)."""
    pred = jnp.asarray(pred)
    gt = jnp.asarray(gt)
    template = jnp.asarray(template)
    if regions is None:
        host_t = np.asarray(template)
        regions = infer_regions(host_t.reshape(-1, host_t.shape[-2], 3)[0])
    return {
        "lve": float(lip_vertex_error(pred, gt, regions.lip, frame_mask)),
        "fdd": float(
            upper_face_dynamics_deviation(pred, gt, template, regions.upper, frame_mask)
        ),
        "mve": float(mean_vertex_error(pred, gt, frame_mask)),
        "max_l2": float(max_vertex_l2(pred, gt, frame_mask)),
    }

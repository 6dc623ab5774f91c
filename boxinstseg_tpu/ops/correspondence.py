"""DiscoBox cross-image semantic correspondence, TPU-native.

Rebuild of the reference's SemanticCorrSolver + ObjectQueues
(reference: discobox_head.py:93-411) with static shapes:

- the per-class object bank is a functional ring buffer of device arrays
  (threaded through the TrainState instead of python-side GPU/CPU queues,
  cf. ObjectQueues at discobox_head.py:132-227);
- retrieval (fg/bg mask IoU, appearance similarity, aspect-ratio gates)
  is a fixed top-``max_retrieval`` masked selection;
- regularized Hough matching ("solve", :330-411): cosine-similarity cost,
  distance-kernel mask, fixed-iteration diagonal message passing;
- InfoNCE between softmax(Cu) and argmax(T) assignments;
- entropic Sinkhorn is provided for completeness (the reference defines
  perform_sinkhorn/appearance_similarityOT at :261-316 but its solve()
  path does not invoke them).
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def relu_l2_norm(feat: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """relu + L2 normalization over channels (reference
    relu_and_l2_norm_feat, discobox_head.py:16-20)."""
    feat = jax.nn.relu(feat)
    norm = jnp.sqrt((feat ** 2).sum(axis=axis, keepdims=True) + 1e-6)
    return feat / (norm + 1e-6)


def sinkhorn(mu: jnp.ndarray, nu: jnp.ndarray, cost: jnp.ndarray,
             reg: float, num_iters: int = 100) -> jnp.ndarray:
    """Entropic OT (reference perform_sinkhorn, discobox_head.py:261-285).
    mu: (B, N); nu: (B, M); cost: (B, N, M). Returns transport (B, N, M)."""
    k = jnp.exp(-cost / reg)

    def body(_, uv):
        u, v = uv
        ktu = jnp.einsum('bnm,bn->bm', k, u)
        v = nu / jnp.maximum(ktu, 1e-12)
        kv = jnp.einsum('bnm,bm->bn', k, v)
        u = 1.0 / jnp.maximum(kv / jnp.maximum(mu, 1e-12), 1e-12)
        return u, v

    n, m = mu.shape[1], nu.shape[1]
    u0 = jnp.ones_like(mu) / n
    v0 = jnp.ones_like(nu) / m
    u, v = jax.lax.fori_loop(0, num_iters, body, (u0, v0))
    return u[:, :, None] * k * v[:, None, :]


def _diag_shift(t: jnp.ndarray, d: int, axis: int) -> jnp.ndarray:
    """Shift with zero fill along one axis."""
    if d == 0:
        return t
    pad = [(0, 0)] * t.ndim
    idx = [slice(None)] * t.ndim
    if d > 0:
        pad[axis] = (d, 0)
        idx[axis] = slice(0, t.shape[axis])
    else:
        pad[axis] = (0, -d)
        idx[axis] = slice(-d, t.shape[axis] - d)
    return jnp.pad(t, pad)[tuple(idx)]


def pass_message(t: jnp.ndarray, shape: Tuple[int, int]) -> jnp.ndarray:
    """Diagonal 3x3 neighborhood voting (reference pass_message,
    discobox_head.py:349-367): T'(s+d, t+d) averages T(s, t) over the 9
    shared displacements d. t: (B, N, N) with N = h*w."""
    h, w = shape
    b = t.shape[0]
    t5 = t.reshape(b, h, w, h, w)
    acc = jnp.zeros_like(t5)
    cnt = jnp.zeros_like(t5)
    ones = jnp.ones_like(t5)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            shifted = t5
            mask = ones
            for axis, d in ((1, dy), (2, dx), (3, dy), (4, dx)):
                shifted = _diag_shift(shifted, d, axis)
                mask = _diag_shift(mask, d, axis)
            acc = acc + shifted
            cnt = cnt + mask
    out = acc / jnp.maximum(cnt, 1.0)
    return out.reshape(b, h * w, h * w)


def solve_correspondence(q_feat: jnp.ndarray, k_feat: jnp.ndarray,
                         feat_hw: Tuple[int, int],
                         num_iter: int = 10, num_smooth_iter: int = 1,
                         dist_kernel: int = 9
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Regularized Hough matching (reference solve,
    discobox_head.py:369-411).

    q_feat: (B, N, C) query cells (relu+L2 normalized);
    k_feat: (B, N, C) retrieved-object cells.
    Returns (Cu, T): raw cosine similarity and refined assignment,
    both (B, N, N).
    """
    h, w = feat_hw
    n = h * w
    qn = q_feat / (jnp.linalg.norm(q_feat, axis=-1, keepdims=True) + 1e-4)
    kn = k_feat / (jnp.linalg.norm(k_feat, axis=-1, keepdims=True) + 1e-4)
    cu = jnp.einsum('bnc,bmc->bnm', qn, kn,
                    preferred_element_type=jnp.float32)

    # distance mask: max-pooled identity => only near-diagonal pairs seed
    eye = jnp.eye(n).reshape(n, h, w)
    half = dist_kernel // 2
    pooled = jax.lax.reduce_window(
        eye, -jnp.inf, jax.lax.max, (1, dist_kernel, dist_kernel),
        (1, 1, 1), [(0, 0), (half, half), (half, half)])
    dist_mask = pooled.reshape(n, n).T[None]

    c = jax.lax.stop_gradient(cu) * dist_mask

    def outer(_, c):
        votes = c
        for _ in range(num_smooth_iter):
            votes = pass_message(votes, (h, w))
            votes = votes / (votes.sum(2, keepdims=True) + 1e-4)
        c = jax.lax.stop_gradient(cu) + votes
        return c / (c.sum(2, keepdims=True) + 1e-4)

    t = jax.lax.fori_loop(0, num_iter, outer, c)
    return cu, t


def info_nce_loss(cu: jnp.ndarray, t: jnp.ndarray,
                  valid: jnp.ndarray) -> jnp.ndarray:
    """Cross-entropy of softmax(Cu) against argmax(T) assignments
    (reference corr_loss body, discobox_head.py:1081-1086).
    cu/t: (B, N, N); valid: (B,) pair validity. Returns scalar mean."""
    assignment = jnp.argmax(t, axis=2)                 # (B, N)
    logp = jax.nn.log_softmax(cu, axis=2)
    ce = -jnp.take_along_axis(logp, assignment[..., None], axis=2)[..., 0]
    per_pair = ce.mean(axis=1)
    v = valid.astype(cu.dtype)
    return (per_pair * v).sum() / jnp.maximum(v.sum(), 1e-4)


# --------------------------------------------------------------- object bank
class ObjectBank(NamedTuple):
    """Per-class ring buffers (device arrays, live in TrainState)."""
    feat: jnp.ndarray    # (C, L, fh, fw, D) relu+L2-normalized features
    mask: jnp.ndarray    # (C, L, mh, mw)
    box: jnp.ndarray     # (C, L, 4)
    ptr: jnp.ndarray     # (C,) int32
    count: jnp.ndarray   # (C,) int32 total appended


def create_object_bank(num_classes: int, len_queue: int, feat_hw, mask_hw,
                       feat_dim: int) -> ObjectBank:
    fh, fw = feat_hw
    mh, mw = mask_hw
    return ObjectBank(
        feat=jnp.zeros((num_classes, len_queue, fh, fw, feat_dim),
                       jnp.float32),
        mask=jnp.zeros((num_classes, len_queue, mh, mw), jnp.float32),
        box=jnp.zeros((num_classes, len_queue, 4), jnp.float32),
        ptr=jnp.zeros((num_classes,), jnp.int32),
        count=jnp.zeros((num_classes,), jnp.int32),
    )


def bank_append(bank: ObjectBank, labels: jnp.ndarray, feats: jnp.ndarray,
                masks: jnp.ndarray, boxes: jnp.ndarray,
                valid: jnp.ndarray) -> ObjectBank:
    """Append up to K objects (serialized ring-buffer writes; reference
    ObjectQueues.append, discobox_head.py:145-171).

    labels: (K,); feats: (K, fh, fw, D); masks: (K, mh, mw);
    boxes: (K, 4); valid: (K,)."""
    L = bank.feat.shape[1]

    def body(i, bk):
        cls = labels[i]
        ptr = bk.ptr[cls]
        ok = valid[i]

        def write(bk):
            return ObjectBank(
                feat=bk.feat.at[cls, ptr].set(feats[i]),
                mask=bk.mask.at[cls, ptr].set(masks[i]),
                box=bk.box.at[cls, ptr].set(boxes[i]),
                ptr=bk.ptr.at[cls].set((ptr + 1) % L),
                count=bk.count.at[cls].add(1),
            )

        return jax.lax.cond(ok, write, lambda b: b, bk)

    return jax.lax.fori_loop(0, labels.shape[0], body, bank)


def bank_retrieve(bank: ObjectBank, label: jnp.ndarray,
                  q_feat: jnp.ndarray, q_mask: jnp.ndarray,
                  q_box: jnp.ndarray,
                  fg_iou_thresh: float = 0.7, bg_iou_thresh: float = 0.7,
                  appear_thresh: float = 0.7,
                  ratio_range=(0.9, 1.2),
                  max_retrieval: int = 5
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Retrieve up to ``max_retrieval`` similar same-class objects
    (reference get_similar_obj, discobox_head.py:205-227).

    q_feat: (fh, fw, D); q_mask: (mh, mw); q_box: (4,).
    Returns (feats (R, fh, fw, D), masks (R, mh, mw), valid (R,))."""
    kf = bank.feat[label]                  # (L, fh, fw, D)
    km = bank.mask[label]                  # (L, mh, mw)
    kb = bank.box[label]
    L = kf.shape[0]
    filled = jnp.arange(L) < jnp.minimum(bank.count[label], L)

    qm = q_mask[None]
    fg_iou = (qm * km).sum((1, 2)) / jnp.maximum(
        ((qm + km) >= 1).sum((1, 2)), 1e-6)
    bg_iou = ((1 - qm) * (1 - km)).sum((1, 2)) / jnp.maximum(
        ((2 - qm - km) >= 1).sum((1, 2)), 1e-6)

    # appearance similarity on mask-weighted normalized features
    import jax.image  # noqa: F401
    fh, fw = kf.shape[1:3]
    qm_f = jax.image.resize(q_mask, (fh, fw), 'bilinear')
    km_f = jax.image.resize(km, (L, fh, fw), 'bilinear')
    sim = (q_feat[None] * kf * qm_f[None, ..., None]
           * km_f[..., None]).sum((1, 2, 3)) / jnp.maximum(
        (qm_f[None] * km_f).sum((1, 2)), 1e-6)

    q_ratio = (q_box[2] - q_box[0]) / (q_box[3] - q_box[1] + 1e-5)
    k_ratio = (kb[:, 2] - kb[:, 0]) / (kb[:, 3] - kb[:, 1] + 1e-5)
    ratio = q_ratio / jnp.maximum(k_ratio, 1e-5)

    ok = (filled & (fg_iou > fg_iou_thresh) & (bg_iou > bg_iou_thresh)
          & (sim > appear_thresh) & (ratio >= ratio_range[0])
          & (ratio <= ratio_range[1]))
    # first max_retrieval in index order (reference slicing semantics)
    key = jnp.where(ok, jnp.arange(L), L + jnp.arange(L))
    order = jnp.argsort(key)[:max_retrieval]
    valid = jnp.take(ok, order)
    return kf[order], km[order], valid


def bank_retrieve_batch(bank: ObjectBank, labels: jnp.ndarray,
                        q_feat: jnp.ndarray, q_mask: jnp.ndarray,
                        q_box: jnp.ndarray,
                        fg_iou_thresh: float = 0.7,
                        bg_iou_thresh: float = 0.7,
                        appear_thresh: float = 0.7,
                        ratio_range=(0.9, 1.2),
                        max_retrieval: int = 5
                        ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """``bank_retrieve`` over a BATCH of Q queries via flat global-index
    row gathers — a ``vmap`` of the single-query version lowers its
    per-class bank slices to batched gathers with dynamic-update-slice
    chains on TPU (~4.3 ms/step at DiscoBox bench shapes, profiled).

    labels: (Q,); q_feat: (Q, fh, fw, D); q_mask: (Q, mh, mw);
    q_box: (Q, 4). Returns (feats (Q, R, fh, fw, D),
    masks (Q, R, mh, mw), valid (Q, R)).
    """
    import jax.image  # noqa: F401
    cn, L, fh, fw, d = bank.feat.shape
    mh, mw = bank.mask.shape[2:]
    q = labels.shape[0]
    rows = (labels[:, None] * L
            + jnp.arange(L, dtype=labels.dtype)[None, :]).reshape(-1)
    kf = jnp.take(bank.feat.reshape(cn * L, fh * fw * d), rows,
                  axis=0).reshape(q, L, fh, fw, d)
    km = jnp.take(bank.mask.reshape(cn * L, mh * mw), rows,
                  axis=0).reshape(q, L, mh, mw)
    kb = jnp.take(bank.box.reshape(cn * L, 4), rows,
                  axis=0).reshape(q, L, 4)
    filled = jnp.arange(L)[None, :] < jnp.minimum(
        bank.count[labels], L)[:, None]

    qm = q_mask[:, None]                                   # (Q,1,mh,mw)
    fg_iou = (qm * km).sum((2, 3)) / jnp.maximum(
        ((qm + km) >= 1).sum((2, 3)), 1e-6)
    bg_iou = ((1 - qm) * (1 - km)).sum((2, 3)) / jnp.maximum(
        ((2 - qm - km) >= 1).sum((2, 3)), 1e-6)

    qm_f = jax.image.resize(q_mask, (q, fh, fw), 'bilinear')
    km_f = jax.image.resize(km.reshape(q * L, mh, mw), (q * L, fh, fw),
                            'bilinear').reshape(q, L, fh, fw)
    sim = (q_feat[:, None] * kf * qm_f[:, None, ..., None]
           * km_f[..., None]).sum((2, 3, 4)) / jnp.maximum(
        (qm_f[:, None] * km_f).sum((2, 3)), 1e-6)

    q_ratio = (q_box[:, 2] - q_box[:, 0]) / (q_box[:, 3]
                                             - q_box[:, 1] + 1e-5)
    k_ratio = (kb[..., 2] - kb[..., 0]) / (kb[..., 3]
                                           - kb[..., 1] + 1e-5)
    ratio = q_ratio[:, None] / jnp.maximum(k_ratio, 1e-5)

    ok = (filled & (fg_iou > fg_iou_thresh) & (bg_iou > bg_iou_thresh)
          & (sim > appear_thresh) & (ratio >= ratio_range[0])
          & (ratio <= ratio_range[1]))
    key = jnp.where(ok, jnp.arange(L)[None, :],
                    L + jnp.arange(L)[None, :])
    order = jnp.argsort(key, axis=1)[:, :max_retrieval]    # (Q, R)
    valid = jnp.take_along_axis(ok, order, axis=1)
    sel = (jnp.arange(q)[:, None] * L + order).reshape(-1)
    kf_sel = jnp.take(kf.reshape(q * L, fh * fw * d), sel,
                      axis=0).reshape(q, -1, fh, fw, d)
    km_sel = jnp.take(km.reshape(q * L, mh * mw), sel,
                      axis=0).reshape(q, -1, mh, mw)
    return kf_sel, km_sel, valid

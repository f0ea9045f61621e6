"""Training objectives as pure functions.

Reference: itr/modalmodule/Objectives.py — ContrastiveLoss (:34-115),
TripletLoss (:482-517), DiversityRegularization (:521-542),
LanguageModelCriterion (:138-158), NPairLoss/AngularLoss (:164-290).

All losses take a precomputed (N, N) score matrix (or embeddings) and return
a scalar, so the hot hinge-with-hardest-negative reduction is a single fused
XLA computation instead of masked_fill + max on materialized (N, N) copies.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e18


def contrastive_hinge(scores, margin: float = 0.2, max_violation: bool = False):
    """Bidirectional hinge ranking loss on an (N, N) score matrix.

    Ref Objectives.py:76-115: compares each off-diagonal score to the
    diagonal of its row (caption retrieval) and column (image retrieval);
    sum-of-violations or hardest-negative per query.  Also serves CAMERA's
    TripletLoss (:482-517), which is the identical computation on precomputed
    scores.
    """
    scores = scores.astype(jnp.float32)  # bf16 training still sums in fp32
    n = scores.shape[0]
    diag = jnp.diagonal(scores)
    eye = jnp.eye(n, dtype=bool)

    cost_s = jnp.maximum(margin + scores - diag[:, None], 0.0)
    cost_im = jnp.maximum(margin + scores - diag[None, :], 0.0)
    cost_s = jnp.where(eye, 0.0, cost_s)
    cost_im = jnp.where(eye, 0.0, cost_im)

    if max_violation:
        cost_s = jnp.max(cost_s, axis=1)
        cost_im = jnp.max(cost_im, axis=0)
    return jnp.sum(cost_s) + jnp.sum(cost_im)


triplet_loss = contrastive_hinge


def diversity_regularization(smry_mat):
    """CAMERA: || normalize(smry)^T normalize(smry) - I ||_F^2 summed over batch.

    smry_mat: (B, num_regions, K).  Ref Objectives.py:521-542 (normalize along
    the region axis).
    """
    n = smry_mat / jnp.maximum(
        jnp.linalg.norm(smry_mat, axis=1, keepdims=True), 1e-12
    )
    g = jnp.einsum("brk,brl->bkl", n, n)
    k = smry_mat.shape[-1]
    d = g - jnp.eye(k, dtype=g.dtype)[None]
    return jnp.sum(d * d)


def language_model_loss(logprobs, targets, mask):
    """Masked NLL over decoder log-probs, mean per batch row.

    logprobs: (B, T, V) log-softmax outputs; targets: (B, >=T) int ids;
    mask: (B, >=T).  Ref Objectives.py:138-158 truncates targets/mask to the
    logit length and divides by the batch size.
    """
    t = logprobs.shape[1]
    targets = targets[:, :t]
    # fp32 reduction even under bf16 training: summing ~B*T bf16 terms
    # drifts (same upcast-at-the-loss rule as contrastive_hinge)
    mask = mask[:, :t].astype(jnp.float32)
    nll = -jnp.take_along_axis(logprobs, targets[..., None].astype(jnp.int32), axis=-1)
    nll = nll[..., 0].astype(jnp.float32)
    return jnp.sum(nll * mask) / logprobs.shape[0]


def reward_loss(logprobs, seq, reward):
    """Self-critical reward loss (ref Objectives.py:121-134).

    Defined-but-unused in the reference's training flows; kept for API parity.
    logprobs: (B, T) sampled-token log-probs; seq: (B, T) sampled ids;
    reward: (B, T) advantages.
    """
    mask = (seq > 0).astype(logprobs.dtype)
    mask = jnp.concatenate(
        [jnp.ones((mask.shape[0], 1), mask.dtype), mask[:, :-1]], axis=1
    )
    out = -logprobs.reshape(-1) * reward.reshape(-1) * mask.reshape(-1)
    return jnp.sum(out) / jnp.sum(mask)


def _pairwise_x_npair(anchors, positives):
    """x[i, j] = a_i . (p_j - p_i) for j != i (diagonal invalid)."""
    ap = anchors @ positives.T  # (n, n), ap[i, j] = a_i . p_j
    return ap - jnp.diagonal(ap)[:, None]


def npair_loss(im, s, max_violation: bool = True):
    """N-pair loss with negatives = all other rows (ref Objectives.py:164-234)."""

    def one_direction(anchors, positives):
        x = _pairwise_x_npair(anchors, positives)
        n = x.shape[0]
        eye = jnp.eye(n, dtype=bool)
        if max_violation:
            cost = jnp.max(jnp.where(eye, NEG_INF, x), axis=1)
            return jnp.sum(jnp.log(1.0 + cost))
        e = jnp.sum(jnp.where(eye, 0.0, jnp.exp(x)), axis=1)
        return jnp.mean(jnp.log(1.0 + e))

    return one_direction(im, s) + one_direction(s, im)


def angular_loss(im, s, angle_bound: float = 1.0, max_violation: bool = True):
    """Angular loss (Wang et al. CVPR'17), negatives = all other rows.

    Ref Objectives.py:238-290:
      x[i,j] = 4*tan^2(a) * (a_i + p_i).p_j  -  2*(1+tan^2(a)) * a_i.p_i
    """

    def one_direction(anchors, positives):
        n = anchors.shape[0]
        eye = jnp.eye(n, dtype=bool)
        m = 4.0 * angle_bound * ((anchors + positives) @ positives.T)
        d = 2.0 * (1.0 + angle_bound) * jnp.sum(anchors * positives, axis=1)
        x = m - d[:, None]
        if max_violation:
            cost = jnp.max(jnp.where(eye, NEG_INF, x), axis=1)
            return jnp.sum(jnp.log1p(jnp.exp(cost)))
        t = jnp.max(jnp.where(eye, NEG_INF, x), axis=1, keepdims=True)
        e = jnp.sum(jnp.where(eye, 0.0, jnp.exp(x - t)), axis=1)
        return jnp.mean(t[:, 0] + jnp.log(jnp.exp(-t[:, 0]) + e))

    return one_direction(im, s) + one_direction(s, im)

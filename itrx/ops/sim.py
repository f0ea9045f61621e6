"""Global similarity measures between image / caption embedding sets.

Reference: itr/modalmodule/Objectives.py:18-30 (cosine_sim / order_sim),
:297-323 (pdist / pdist_cos), itr/modalmodule/Fusionmodule.py:670-693
(MultiViewMatching).  All are pure batched functions; the eval engine tiles
them over the full (N_img, N_cap) grid on device.
"""

import jax.numpy as jnp


def cosine_sim(im, s):
    """Plain inner product between all image/sentence pairs: (Ni, D)x(Nc, D)->(Ni, Nc)."""
    return jnp.matmul(im, s.T, preferred_element_type=jnp.float32)


def order_sim(im, s):
    """Order-embedding penalty -||max(0, s - im)||_2, transposed to (Ni, Nc)."""
    diff = jnp.maximum(s[:, None, :] - im[None, :, :], 0.0)  # (Nc, Ni, D)
    score = -jnp.sqrt(jnp.sum(diff * diff, axis=-1))
    return score.T


def pdist(x1, x2, eps=1e-4):
    """Pairwise euclidean distance (SAEM order measure)."""
    sq1 = jnp.sum(x1 * x1, axis=1)[:, None]
    sq2 = jnp.sum(x2 * x2, axis=1)[None, :]
    return jnp.sqrt(sq1 - 2.0 * (x1 @ x2.T) + sq2 + eps)


def pdist_cos(x1, x2):
    """Pairwise cosine similarity with NaN→0 (SAEM cosine measure)."""
    n1 = x1 / jnp.linalg.norm(x1, axis=1, keepdims=True)
    n2 = x2 / jnp.linalg.norm(x2, axis=1, keepdims=True)
    res = jnp.matmul(n1, n2.T, preferred_element_type=jnp.float32)
    return jnp.nan_to_num(res, nan=0.0)


def multi_view_matching(imgs, caps):
    """CAMERA: score = max over k views of view·capᵀ.

    imgs: (Ni, K, D) view embeddings; caps: (Nc, D) -> (Ni, Nc).
    One einsum + max instead of the reference's per-caption loop.
    """
    scores = jnp.einsum("ikd,cd->ikc", imgs, caps,
                        preferred_element_type=jnp.float32)
    return jnp.max(scores, axis=1)

"""Normalization helpers (ref itr/modalmodule/utils.py:4-15)."""

import jax.numpy as jnp

EPS = 1e-8


def l1norm(x, axis=-1, eps=EPS):
    return x / (jnp.sum(jnp.abs(x), axis=axis, keepdims=True) + eps)


def l2norm(x, axis=-1, eps=EPS):
    return x / (jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=True)) + eps)


def f_normalize(x, axis=-1, eps=1e-12):
    """torch.nn.functional.normalize semantics: divide by clamp(norm, min=eps)."""
    n = jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=True))
    return x / jnp.maximum(n, eps)

"""Normalization helpers (ref itr/modalmodule/utils.py:4-15)."""

import jax.numpy as jnp

EPS = 1e-8


def safe_sqrt(x, tiny=1e-16):
    """sqrt with a finite gradient at 0.

    Zero vectors occur structurally on TPU (masked/padded positions are exact
    zeros instead of being sliced away like the reference does), and
    d(sqrt)/dx at 0 is inf — which turns the 0-weighted gradients of padded
    positions into NaNs.  Clamping the operand keeps values identical for any
    real input while zeroing the gradient of the degenerate branch.
    """
    return jnp.sqrt(jnp.maximum(x, tiny))


def l1norm(x, axis=-1, eps=EPS):
    return x / (jnp.sum(jnp.abs(x), axis=axis, keepdims=True) + eps)


def l2norm(x, axis=-1, eps=EPS):
    return x / (safe_sqrt(jnp.sum(x * x, axis=axis, keepdims=True)) + eps)


def f_normalize(x, axis=-1, eps=1e-12):
    """torch.nn.functional.normalize semantics: divide by clamp(norm, min=eps)."""
    n = safe_sqrt(jnp.sum(x * x, axis=axis, keepdims=True), tiny=eps * eps)
    return x / jnp.maximum(n, eps)

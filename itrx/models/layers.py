"""Shared flax building blocks with torch-matching initialization.

The reference initializes Linear layers either with torch defaults
(U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for weight and bias) or with its own
"xavier" uniform U(-sqrt(6/(fan_in+fan_out))) + zero bias (e.g.
itr/modalmodule/ImgEncoder.py:126-131).  Matching init distributions keeps
training dynamics comparable seed-for-seed.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn
from jax import random


def torch_linear_init(key, shape, dtype=jnp.float32):
    """torch.nn.Linear default: U(-1/sqrt(fan_in), 1/sqrt(fan_in)).

    flax kernels are (in, out); torch fan_in is shape[0] here.
    """
    fan_in = shape[0]
    bound = 1.0 / jnp.sqrt(fan_in)
    return random.uniform(key, shape, dtype, -bound, bound)


def ref_xavier_init(key, shape, dtype=jnp.float32):
    """Reference's uniform xavier: U(-r, r), r = sqrt(6)/sqrt(fan_in+fan_out)."""
    r = jnp.sqrt(6.0) / jnp.sqrt(shape[0] + shape[1])
    return random.uniform(key, shape, dtype, -r, r)


class TorchLinear(nn.Module):
    """Dense with torch default init (weight and bias both U(-k, k))."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, *, params_only: bool = False):
        # params_only: pass the input dim as an int and get (kernel, bias)
        # back — for callers (Pallas kernels) that apply the weights
        # themselves while keeping this module's checkpoint layout
        fan_in = x if isinstance(x, int) else x.shape[-1]
        kernel = self.param("kernel", torch_linear_init, (fan_in, self.features))
        bias = None
        if self.use_bias:
            bound = 1.0 / jnp.sqrt(fan_in)
            bias = self.param(
                "bias",
                lambda k, s, d=jnp.float32: random.uniform(k, s, d, -bound, bound),
                (self.features,),
            )
        if params_only:
            return kernel, bias
        y = x @ kernel
        if bias is not None:
            y = y + bias
        return y


class XavierLinear(nn.Module):
    """Dense with the reference's uniform-xavier weight + zero bias."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, *, params_only: bool = False):
        # params_only: pass the input dim as an int and get (kernel, bias)
        # back — for callers (Pallas kernels) that apply the weights
        # themselves while keeping this module's checkpoint layout
        in_dim = x if isinstance(x, int) else x.shape[-1]
        kernel = self.param("kernel", ref_xavier_init, (in_dim, self.features))
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        if params_only:
            return kernel, bias
        # follow a reduced-precision input (bf16 activations keep the matmul
        # on the fast MXU path instead of promoting back to fp32)
        y = x @ kernel.astype(x.dtype)
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y


class WeightNormLinear(nn.Module):
    """torch weight_norm(Linear, dim=None): w = g * v / ||v||_F (scalar g)."""

    features: int

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        v = self.param("v", torch_linear_init, (fan_in, self.features))
        g = self.param(
            "g",
            lambda k, s: jnp.full(s, jnp.linalg.norm(v)),
            (),
        )
        kernel = g * v / jnp.linalg.norm(v)
        bound = 1.0 / jnp.sqrt(fan_in)
        bias = self.param(
            "bias",
            lambda k, s, d=jnp.float32: random.uniform(k, s, d, -bound, bound),
            (self.features,),
        )
        return x @ kernel + bias


class TorchBatchNormCore(nn.Module):
    """BatchNorm with torch-exact semantics (torch _BatchNorm defaults).

    Differences from flax nn.BatchNorm that matter for reference parity:
    torch normalizes with the *biased* batch variance but updates
    running_var with the *unbiased* one (factor n/(n-1), n = elements
    pooled per channel); flax uses the biased variance for both, so eval
    behavior after training drifts.  Verified by the training-trajectory
    parity suite (tests/test_ref_trajectory.py, batch_stats assertions).

    eps=1e-5, momentum=0.1 (torch convention: new = 0.9*old + 0.1*batch).
    Stats are computed in fp32 regardless of input dtype (matches the
    mixed-precision train step, which keeps master batch_stats in fp32).
    """

    use_running_average: bool
    axis: int = -1
    scale_init: Any = nn.initializers.ones

    @nn.compact
    def __call__(self, x):
        feat_ax = self.axis % x.ndim
        reduce_axes = tuple(i for i in range(x.ndim) if i != feat_ax)
        c = x.shape[feat_ax]
        bshape = tuple(c if i == feat_ax else 1 for i in range(x.ndim))
        scale = self.param("scale", self.scale_init, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable(
            "batch_stats", "mean", nn.initializers.zeros, None, (c,)
        )
        ra_var = self.variable(
            "batch_stats", "var", nn.initializers.ones, None, (c,)
        )
        if self.use_running_average:
            mean = jnp.asarray(ra_mean.value, jnp.float32)
            var = jnp.asarray(ra_var.value, jnp.float32)
        else:
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=reduce_axes)
            var = jnp.mean(jnp.square(xf), axis=reduce_axes) - jnp.square(mean)
            if not self.is_initializing():
                n = x.size / c
                unbiased = var * (n / max(n - 1.0, 1.0))
                ra_mean.value = (
                    0.9 * jnp.asarray(ra_mean.value, jnp.float32) + 0.1 * mean
                ).astype(jnp.asarray(ra_mean.value).dtype)
                ra_var.value = (
                    0.9 * jnp.asarray(ra_var.value, jnp.float32)
                    + 0.1 * unbiased
                ).astype(jnp.asarray(ra_var.value).dtype)
        inv = jax.lax.rsqrt(var + 1e-5).astype(x.dtype)
        mean = mean.astype(x.dtype)
        return (x - mean.reshape(bshape)) * (
            inv * scale.astype(x.dtype)
        ).reshape(bshape) + bias.astype(x.dtype).reshape(bshape)


class TorchBatchNorm(nn.Module):
    """BatchNorm matching torch defaults: eps=1e-5, momentum 0.1 (flax 0.9).

    `axis` is the feature axis (set axis=1 for torch BatchNorm1d on (N, C, L)
    inputs, where stats pool over (N, L) per channel).  The inner core keeps
    the historical `BatchNorm_0` scope name so existing checkpoints and the
    reference converter keep loading unchanged.
    """

    use_running_average: bool
    axis: int = -1

    @nn.compact
    def __call__(self, x):
        return TorchBatchNormCore(
            use_running_average=self.use_running_average,
            axis=self.axis,
            name="BatchNorm_0",
        )(x)


def torch_embedding_init(key, shape, dtype=jnp.float32):
    """Reference word embedding init: U(-0.1, 0.1) (TextEncoder.py:35-36)."""
    return random.uniform(key, shape, dtype, -0.1, 0.1)

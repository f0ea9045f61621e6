"""Shared flax building blocks with torch-matching initialization.

The reference initializes Linear layers either with torch defaults
(U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for weight and bias) or with its own
"xavier" uniform U(-sqrt(6/(fan_in+fan_out))) + zero bias (e.g.
itr/modalmodule/ImgEncoder.py:126-131).  Matching init distributions keeps
training dynamics comparable seed-for-seed.
"""

from __future__ import annotations

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
    def __call__(self, x):
        fan_in = x.shape[-1]
        kernel = self.param("kernel", torch_linear_init, (fan_in, self.features))
        y = x @ kernel
        if self.use_bias:
            bound = 1.0 / jnp.sqrt(fan_in)
            bias = self.param(
                "bias",
                lambda k, s, d=jnp.float32: random.uniform(k, s, d, -bound, bound),
                (self.features,),
            )
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


class TorchBatchNorm(nn.Module):
    """BatchNorm matching torch defaults: eps=1e-5, momentum 0.1 (flax 0.9).

    `axis` is the feature axis (set axis=1 for torch BatchNorm1d on (N, C, L)
    inputs, where stats pool over (N, L) per channel).
    """

    use_running_average: bool
    axis: int = -1

    @nn.compact
    def __call__(self, x):
        return nn.BatchNorm(
            use_running_average=self.use_running_average,
            axis=self.axis,
            momentum=0.9,
            epsilon=1e-5,
        )(x)


def torch_embedding_init(key, shape, dtype=jnp.float32):
    """Reference word embedding init: U(-0.1, 0.1) (TextEncoder.py:35-36)."""
    return random.uniform(key, shape, dtype, -0.1, 0.1)

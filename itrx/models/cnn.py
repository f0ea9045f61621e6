"""Raw-pixel CNN towers for VSE++ (ref itr/modalmodule/ImgEncoder.py:15-108).

The reference loads pretrained torchvision VGG19/ResNet152 and replaces the
top fc with a Linear to embed_size, freezing the CNN unless `finetune`.
torchvision is not a dependency here: the architectures are implemented in
flax (NHWC, XLA convs ride the MXU) and `load_torch_cnn` converts a
torchvision-layout `state_dict` file (e.g. vgg19-dcbb9e9d.pth) into the flax
parameter tree.  Without a weights file the tower initializes randomly —
fine for tests; real runs should pass config['cnn_weights'].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.norms import l2norm
from .layers import XavierLinear

# torchvision vgg19 'E' configuration
_VGG19_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
              512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]


class VGG19(nn.Module):
    """VGG19 features + classifier through fc7 (4096-d), torchvision layout."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (B, 224, 224, 3) NHWC
        ci = 0
        for v in _VGG19_CFG:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.Conv(v, (3, 3), padding=1, name=f"conv_{ci}")(x)
                x = nn.relu(x)
                ci += 1
        # torch flattens NCHW (C,H,W); transpose so converted fc weights match
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(4096, name="fc6")(x))
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = nn.relu(nn.Dense(4096, name="fc7")(x))
        x = nn.Dropout(0.5, deterministic=not train)(x)
        return x  # (B, 4096)


class Bottleneck(nn.Module):
    features: int
    strides: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name=name
        )
        identity = x
        out = nn.Conv(self.features, (1, 1), use_bias=False, name="conv1")(x)
        out = nn.relu(bn("bn1")(out))
        out = nn.Conv(
            self.features, (3, 3), strides=self.strides, padding=1,
            use_bias=False, name="conv2",
        )(out)
        out = nn.relu(bn("bn2")(out))
        out = nn.Conv(self.features * 4, (1, 1), use_bias=False, name="conv3")(out)
        out = bn("bn3")(out)
        if self.downsample:
            identity = nn.Conv(
                self.features * 4, (1, 1), strides=self.strides,
                use_bias=False, name="ds_conv",
            )(x)
            identity = bn("ds_bn")(identity)
        return nn.relu(out + identity)


class ResNet152(nn.Module):
    """ResNet152 through global average pool (2048-d), torchvision layout."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for li, (features, blocks) in enumerate(
            [(64, 3), (128, 8), (256, 36), (512, 3)]
        ):
            for b in range(blocks):
                strides = 2 if (li > 0 and b == 0) else 1
                x = Bottleneck(
                    features, strides=strides, downsample=(b == 0),
                    name=f"layer{li + 1}_{b}",
                )(x, train=train)
        return jnp.mean(x, axis=(1, 2))  # (B, 2048)


class EncoderImageFull(nn.Module):
    """Raw-pixel image encoder (ref ImgEncoder.py:15-108): CNN (frozen unless
    finetune) -> l2norm -> xavier Linear -> l2norm."""

    embed_size: int
    cnn_type: str = "vgg19"
    finetune: bool = False
    use_abs: bool = False
    no_imgnorm: bool = False

    @nn.compact
    def __call__(self, images, train: bool = False):
        if self.cnn_type.startswith("vgg"):
            cnn = VGG19(name="cnn")
        elif self.cnn_type.startswith("resnet"):
            cnn = ResNet152(name="cnn")
        else:
            raise ValueError(f"Unknown cnn_type: {self.cnn_type}")
        features = cnn(images, train=train and self.finetune)
        if not self.finetune:
            features = jax.lax.stop_gradient(features)
        features = l2norm(features, axis=-1)
        features = XavierLinear(self.embed_size, name="fc")(features)
        if not self.no_imgnorm:
            features = l2norm(features, axis=-1)
        if self.use_abs:
            features = jnp.abs(features)
        return features


def load_torch_cnn(state_dict_path: str, cnn_type: str = "vgg19"):
    """Convert a torchvision CNN state_dict file into flax params for
    VGG19/ResNet152 above.  Works without torchvision installed."""
    import torch

    sd = torch.load(state_dict_path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()

    def conv(key):
        w = sd[key + ".weight"].numpy().transpose(2, 3, 1, 0)  # OIHW->HWIO
        out = {"kernel": w}
        if key + ".bias" in sd:
            out["bias"] = sd[key + ".bias"].numpy()
        return out

    def bn(key):
        return (
            {"scale": sd[key + ".weight"].numpy(), "bias": sd[key + ".bias"].numpy()},
            {"mean": sd[key + ".running_mean"].numpy(),
             "var": sd[key + ".running_var"].numpy()},
        )

    if cnn_type.startswith("vgg"):
        params = {}
        conv_keys = [k[:-7] for k in sd if k.startswith("features") and k.endswith(".weight")]
        conv_keys.sort(key=lambda k: int(k.split(".")[1]))
        for i, k in enumerate(conv_keys):
            params[f"conv_{i}"] = conv(k)
        params["fc6"] = {
            "kernel": sd["classifier.0.weight"].numpy().T,
            "bias": sd["classifier.0.bias"].numpy(),
        }
        params["fc7"] = {
            "kernel": sd["classifier.3.weight"].numpy().T,
            "bias": sd["classifier.3.bias"].numpy(),
        }
        return jax.tree.map(jnp.asarray, params), {}

    # resnet152
    params = {"conv1": conv("conv1")}
    stats = {}
    p, st = bn("bn1")
    params["bn1"], stats["bn1"] = p, st
    blocks = [3, 8, 36, 3]
    for li, nb in enumerate(blocks):
        for b in range(nb):
            name = f"layer{li + 1}_{b}"
            base = f"layer{li + 1}.{b}"
            bp = {
                "conv1": conv(f"{base}.conv1"),
                "conv2": conv(f"{base}.conv2"),
                "conv3": conv(f"{base}.conv3"),
            }
            bs = {}
            for i in (1, 2, 3):
                pb, sb = bn(f"{base}.bn{i}")
                bp[f"bn{i}"], bs[f"bn{i}"] = pb, sb
            if f"{base}.downsample.0.weight" in sd:
                bp["ds_conv"] = conv(f"{base}.downsample.0")
                pb, sb = bn(f"{base}.downsample.1")
                bp["ds_bn"], bs[f"ds_bn"] = pb, sb
            params[name] = bp
            stats[name] = bs
    return jax.tree.map(jnp.asarray, params), jax.tree.map(jnp.asarray, stats)

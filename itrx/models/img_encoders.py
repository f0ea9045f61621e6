"""Image encoders over precomputed region features.

Reference: itr/modalmodule/ImgEncoder.py.  `EncoderImageFull` (raw-pixel
VGG/ResNet, :15-108) lives in itrx.models.cnn (flax VGG19/ResNet152 towers
with torchvision state-dict ingestion); the model factory routes to it when
the dataset is a raw-image one (coco/f8k/f30k).  This module covers the
precomputed-region-feature encoders the published numbers use.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from ..ops.norms import l2norm
from ..ops.rnn import MaskedGRU
from .layers import (
    TorchBatchNorm,
    TorchBatchNormCore,
    TorchLinear,
    WeightNormLinear,
    XavierLinear,
)


class EncoderImagePrecomp(nn.Module):
    """Single Linear img_dim->embed_size (+optional l2norm/abs).

    Ref ImgEncoder.py:112-159.  Works on (B, D) full-image features (VSE++)
    or (B, R, D) region features (SCAN/SGRAF) alike.
    """

    embed_size: int
    no_imgnorm: bool = False
    precomp_enc_type: str = "basic"
    use_abs: bool = False

    @nn.compact
    def __call__(self, images):
        if self.precomp_enc_type == "basic":
            features = XavierLinear(self.embed_size, name="fc")(images)
        elif self.precomp_enc_type == "weight_norm":
            features = WeightNormLinear(self.embed_size, name="fc")(images)
        else:
            raise ValueError(f"Unknown precomp_enc_type: {self.precomp_enc_type}")
        if not self.no_imgnorm:
            features = l2norm(features, axis=-1)
        if self.use_abs:
            features = jnp.abs(features)
        return features


class RsGCN(nn.Module):
    """Region-relation non-local block (ref itr/modalmodule/vsrn_.py:6-71).

    The reference phrases theta/phi/g as 1x1 Conv1d over (B, D, N); on TPU a
    1x1 conv over the region axis is just a Dense over the feature axis of
    (B, N, D), which keeps everything on the MXU with no transposes.
    W's conv + BatchNorm are zero-initialized so the block starts as identity.
    """

    inter_channels: int
    use_running_average: bool = True

    @nn.compact
    def __call__(self, v):
        # v: (B, N, D)
        n = v.shape[1]
        g_v = TorchLinear(self.inter_channels, name="g")(v)
        theta_v = TorchLinear(self.inter_channels, name="theta")(v)
        phi_v = TorchLinear(self.inter_channels, name="phi")(v)
        r = jnp.einsum("bnc,bmc->bnm", theta_v, phi_v) / n
        y = jnp.einsum("bnm,bmc->bnc", r, g_v)
        w_y = TorchLinear(v.shape[-1], name="W")(y)
        # ref zero-inits the BN scale and bias so the block starts as identity
        w_y = TorchBatchNormCore(
            use_running_average=self.use_running_average,
            scale_init=nn.initializers.zeros,
            name="W_bn",
        )(w_y)
        return w_y + v


class EncoderImagePrecompAttn(nn.Module):
    """VSRN image tower: fc -> 4x Rs_GCN -> l2norm -> region GRU -> final state.

    Ref ImgEncoder.py:166-231.  Returns (features (B, D), gcn_emb (B, R, D));
    the GCN sequence also feeds VSRN's caption decoder.  Dataset-conditional
    BatchNorm for f30k (ref :186-187,220-221).
    """

    embed_size: int
    data_name: str = "f30k_precomp"
    use_abs: bool = False
    no_imgnorm: bool = False

    @nn.compact
    def __call__(self, images, train: bool = False):
        fc_emb = XavierLinear(self.embed_size, name="fc")(images)
        # NB: the reference's l2norm defaults to dim=1 (modalmodule/utils.py:15),
        # so on the (B, N, D) region tensors these two norms run over the
        # REGION axis — an original-VSRN quirk preserved for checkpoint parity
        # (ImgEncoder.py:200,213).
        if self.data_name != "f30k_precomp":
            fc_emb = l2norm(fc_emb, axis=1)

        x = fc_emb
        for i in range(1, 5):
            x = RsGCN(
                inter_channels=self.embed_size,
                use_running_average=not train,
                name=f"Rs_GCN_{i}",
            )(x)
        gcn_emb = l2norm(x, axis=1)

        ones = jnp.ones(gcn_emb.shape[:2], dtype=gcn_emb.dtype)
        _, final = MaskedGRU(hidden_size=self.embed_size, name="img_rnn")(
            gcn_emb, ones
        )
        features = final

        if self.data_name == "f30k_precomp":
            features = TorchBatchNorm(use_running_average=not train, name="bn")(
                features
            )
        if not self.no_imgnorm:
            features = l2norm(features, axis=-1)
        if self.use_abs:
            features = jnp.abs(features)
        return features, gcn_emb

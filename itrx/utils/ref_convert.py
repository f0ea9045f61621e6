"""Reference (PyTorch) checkpoint -> itrx conversion.

The reference saves checkpoints as
``{epoch, model, best_rsum, best_r1|best_rl, _config, Eiters}`` where
``model`` is a *list* of sub-encoder state dicts —
``[img_enc, txt_enc]`` or ``[img_enc, txt_enc, sim_enc]``
(itr/modalmodule/Models.py:37-45) — loaded back at
itr/metricmodule/evaluation.py:269-279.  Two reference quirks are handled:

 - CAMERA wraps its encoders in nn.DataParallel (Models.py:561-562), so
   GPU-trained checkpoints carry a ``module.`` key prefix — stripped here.
 - SGRAF's base state_dict appends the *module object* rather than its state
   dict (Models.py:39), so pickled checkpoints hold a full nn.Module; we call
   ``.state_dict()`` on it (unpickling needs the reference package importable
   — pass ``ref_root`` to the CLI).

Conversion is strict: every torch tensor must land on an existing itrx
parameter path with the same shape, and any unconsumed torch key (other than
``num_batches_tracked`` counters) is an error.  Layout transforms:

 - torch Linear ``weight (out,in)``      -> flax ``kernel (in,out)``
 - torch Conv1d ``weight (out,in,K)``    -> flax ``kernel (K,in,out)``
 - torch Conv2d ``(out,1,K,H)`` text conv-> flax ``kernel (K,H,out)``
 - torch GRU ``weight_ih_l0`` etc.       -> MaskedGRU ``w_ih`` etc. (same layout)
 - torch BatchNorm weight/bias/running_* -> flax scale/bias + batch_stats
 - torch weight_norm(Linear, dim=None)   -> WeightNormLinear v (in,out), g ()
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# leaf transforms (torch state-dict fragments -> flat {path-tuple: ndarray})
# ---------------------------------------------------------------------------


def _np(v):
    return v.numpy() if hasattr(v, "numpy") else np.asarray(v)


def _strip_module(sd: dict) -> dict:
    return {
        (k[len("module."):] if k.startswith("module.") else k): v
        for k, v in sd.items()
    }


class _Consumer:
    """Wraps a torch state dict; tracks which keys conversion consumed."""

    def __init__(self, sd):
        self.sd = {k: _np(v) for k, v in _strip_module(sd).items()}
        self.used = set()

    def take(self, key):
        self.used.add(key)
        return self.sd[key]

    def has(self, key):
        return key in self.sd

    def unconsumed(self):
        return [
            k
            for k in self.sd
            if k not in self.used and not k.endswith("num_batches_tracked")
        ]


def _lin(c: _Consumer, key, out, *path):
    out[path + ("kernel",)] = c.take(key + ".weight").T
    out[path + ("bias",)] = c.take(key + ".bias")


def _conv1d(c: _Consumer, key, out, *path):
    # torch (out, in, K) -> flax (K, in, out)
    out[path + ("kernel",)] = c.take(key + ".weight").transpose(2, 1, 0)
    out[path + ("bias",)] = c.take(key + ".bias")


def _txt_conv2d(c: _Consumer, key, out, *path):
    # torch Conv2d (out, 1, K, H) over (B,1,L,H) -> flax Conv (K, H, out)
    w = c.take(key + ".weight")
    out[path + ("kernel",)] = w[:, 0].transpose(1, 2, 0)
    out[path + ("bias",)] = c.take(key + ".bias")


def _gru(c: _Consumer, prefix, out, *path, bidirectional=False):
    suffixes = [""] + (["_reverse"] if bidirectional else [])
    for suf in suffixes:
        out[path + (f"w_ih{suf}",)] = c.take(f"{prefix}.weight_ih_l0{suf}")
        out[path + (f"w_hh{suf}",)] = c.take(f"{prefix}.weight_hh_l0{suf}")
        out[path + (f"b_ih{suf}",)] = c.take(f"{prefix}.bias_ih_l0{suf}")
        out[path + (f"b_hh{suf}",)] = c.take(f"{prefix}.bias_hh_l0{suf}")


def _bn(c: _Consumer, key, out, *path):
    """path points at the flax BatchNorm module (e.g. (..., 'BatchNorm_0'))."""
    out[("params",) + path + ("scale",)] = c.take(key + ".weight")
    out[("params",) + path + ("bias",)] = c.take(key + ".bias")
    out[("batch_stats",) + path + ("mean",)] = c.take(key + ".running_mean")
    out[("batch_stats",) + path + ("var",)] = c.take(key + ".running_var")


def _finish(c: _Consumer, what: str, out: dict) -> dict:
    left = c.unconsumed()
    if left:
        raise ValueError(f"unmapped reference keys in {what}: {left}")
    return out


# ---------------------------------------------------------------------------
# sub-encoder converters (one per reference module family)
# ---------------------------------------------------------------------------


def convert_text_gru(sd) -> dict:
    """EncoderText (ref TextEncoder.py:15-70) -> txt_enc subtree."""
    c = _Consumer(sd)
    out = {}
    out[("params", "txt_enc", "embedding")] = c.take("embed.weight")
    bidir = c.has("rnn.weight_ih_l0_reverse")
    _gru(c, "rnn", out, "params", "txt_enc", "MaskedGRU_0", bidirectional=bidir)
    return _finish(c, "EncoderText", out)


def convert_img_precomp(sd) -> dict:
    """EncoderImagePrecomp (ref ImgEncoder.py:112-159), basic or weight_norm."""
    c = _Consumer(sd)
    out = {}
    if c.has("fc.weight_v"):
        out[("params", "img_enc", "fc", "v")] = c.take("fc.weight_v").T
        out[("params", "img_enc", "fc", "g")] = c.take("fc.weight_g").reshape(())
        out[("params", "img_enc", "fc", "bias")] = c.take("fc.bias")
    else:
        _lin(c, "fc", out, "params", "img_enc", "fc")
    return _finish(c, "EncoderImagePrecomp", out)


def convert_img_precomp_attn(sd, data_name: str) -> dict:
    """EncoderImagePrecompAttn (ref ImgEncoder.py:166-231): fc + 4x Rs_GCN +
    region GRU (+ f30k BatchNorm)."""
    c = _Consumer(sd)
    out = {}
    _lin(c, "fc", out, "params", "img_enc", "fc")
    _gru(c, "img_rnn", out, "params", "img_enc", "img_rnn")
    for i in range(1, 5):
        g = f"Rs_GCN_{i}"
        for sub in ("g", "theta", "phi"):
            w = c.take(f"{g}.{sub}.weight")  # (out, in, 1) 1x1 Conv1d
            out[("params", "img_enc", g, sub, "kernel")] = w[:, :, 0].T
            out[("params", "img_enc", g, sub, "bias")] = c.take(f"{g}.{sub}.bias")
        w = c.take(f"{g}.W.0.weight")
        out[("params", "img_enc", g, "W", "kernel")] = w[:, :, 0].T
        out[("params", "img_enc", g, "W", "bias")] = c.take(f"{g}.W.0.bias")
        # W.1 is the zero-init BatchNorm; flax RsGCN names it W_bn directly
        out[("params", "img_enc", g, "W_bn", "scale")] = c.take(f"{g}.W.1.weight")
        out[("params", "img_enc", g, "W_bn", "bias")] = c.take(f"{g}.W.1.bias")
        out[("batch_stats", "img_enc", g, "W_bn", "mean")] = c.take(
            f"{g}.W.1.running_mean"
        )
        out[("batch_stats", "img_enc", g, "W_bn", "var")] = c.take(
            f"{g}.W.1.running_var"
        )
    if c.has("bn.weight"):  # dataset-conditional (f30k only)
        _bn(c, "bn", out, "img_enc", "bn", "BatchNorm_0")
    return _finish(c, "EncoderImagePrecompAttn", out)


def _bert_layer(c: _Consumer, key, out, *path):
    """One reference BERTLayer (bert.py:262-273) -> itrx BertLayer subtree."""
    _lin(c, f"{key}.attention.self.query", out, *path, "query")
    _lin(c, f"{key}.attention.self.key", out, *path, "key")
    _lin(c, f"{key}.attention.self.value", out, *path, "value")
    _lin(c, f"{key}.attention.output.dense", out, *path, "attn_output")
    out[path + ("attn_ln", "gamma")] = c.take(f"{key}.attention.output.LayerNorm.gamma")
    out[path + ("attn_ln", "beta")] = c.take(f"{key}.attention.output.LayerNorm.beta")
    _lin(c, f"{key}.intermediate.dense", out, *path, "intermediate")
    _lin(c, f"{key}.output.dense", out, *path, "output")
    out[path + ("out_ln", "gamma")] = c.take(f"{key}.output.LayerNorm.gamma")
    out[path + ("out_ln", "beta")] = c.take(f"{key}.output.LayerNorm.beta")


def _bert_tower(c: _Consumer, out, *path):
    """Full ref BertModel under the 'bert.' prefix -> itrx BertModel subtree."""
    from ..models.bert import convert_bert_state_dict

    bert_sd = {k: c.take(k) for k in list(c.sd) if k.startswith("bert.")}
    n_layers = 1 + max(
        int(k.split("encoder.layer.")[1].split(".")[0])
        for k in bert_sd
        if "encoder.layer." in k
    )
    tree = convert_bert_state_dict(bert_sd, n_layers)

    def flatten(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                flatten(prefix + (k,), v)
        else:
            out[path + prefix] = np.asarray(node)

    flatten((), tree)


def convert_transformer_mapping(sd) -> dict:
    """SAEM image branch (ref ImgEncoder.py:324-350)."""
    c = _Consumer(sd)
    out = {}
    _lin(c, "mapping", out, "params", "img_enc", "mapping")
    _bert_layer(c, "layer", out, "params", "img_enc", "layer")
    return _finish(c, "TransformerMapping", out)


def convert_bert_mapping(sd, txt_stru: str = "cnn") -> dict:
    """SAEM text branch (ref TextEncoder.py:74-157), all four txt_stru heads."""
    c = _Consumer(sd)
    out = {}
    _bert_tower(c, out, "params", "txt_enc", "bert")
    _lin(c, "mapping", out, "params", "txt_enc", "mapping")
    if txt_stru == "cnn":
        for i in range(3):
            _txt_conv2d(c, f"convs1.{i}", out, "params", "txt_enc", f"conv_{i}")
    elif txt_stru == "pooling":
        _lin(c, "mapping_0", out, "params", "txt_enc", "mapping_0")
    elif txt_stru == "trans":
        _lin(c, "mapping_0", out, "params", "txt_enc", "mapping_0")
        _bert_layer(c, "layer", out, "params", "txt_enc", "layer")
    elif txt_stru == "rnn":
        bidir = c.has("rnn.weight_ih_l0_reverse")
        _gru(c, "rnn", out, "params", "txt_enc", "rnn", bidirectional=bidir)
    return _finish(c, "BertMapping", out)


def _agsa(c: _Consumer, prefix, out, *path):
    """Ref AGSA (camera_.py:14-89): per-layer gated attention + BatchNorm."""
    i = 0
    while c.has(f"{prefix}.att_layers.{i}.linears.0.weight"):
        att = f"{prefix}.att_layers.{i}"
        for j, ours in enumerate(("linear_q", "linear_k", "linear_v")):
            _lin(c, f"{att}.linears.{j}", out, *path, f"att_{i}", ours)
        for g in ("fc_q", "fc_k", "fc_g"):
            _lin(c, f"{att}.{g}", out, *path, f"att_{i}", g)
        bn_out = {}
        _bn(c, f"{prefix}.bns.{i}", bn_out, *path[1:], f"bn_{i}", "BatchNorm_0")
        out.update(bn_out)
        i += 1


def convert_camera_img(sd) -> dict:
    """CAMERA image tower (ref ImgEncoder.py:355-433)."""
    c = _Consumer(sd)
    out = {}
    _lin(c, "fc", out, "params", "img_enc", "fc")
    _lin(c, "position_enc.proj", out, "params", "img_enc", "position_enc", "proj")
    _agsa(c, "agsa", out, "params", "img_enc", "agsa")
    for i in range(7):
        _conv1d(c, f"mvs.convs_dilate.{i}", out, "params", "img_enc", "mvs", f"conv_{i}")
    _lin(c, "mvs.convs_fc", out, "params", "img_enc", "mvs", "convs_fc")
    return _finish(c, "EncoderImagePrecompSelfAttn", out)


def convert_camera_txt(sd) -> dict:
    """CAMERA text tower (ref TextEncoder.py:162-197)."""
    c = _Consumer(sd)
    out = {}
    _bert_tower(c, out, "params", "txt_enc", "bert")
    _lin(c, "mapping", out, "params", "txt_enc", "mapping")
    _agsa(c, "agsa", out, "params", "txt_enc", "agsa")
    _lin(c, "fc1", out, "params", "txt_enc", "fc1")
    _lin(c, "fc2", out, "params", "txt_enc", "fc2")
    _bn(c, "bn", out, "txt_enc", "bn", "BatchNorm_0")
    return _finish(c, "CAMERAEncoderText", out)


def convert_sgraf_sim(sd, module_name: str = "SGR") -> dict:
    """SGRAF EncoderSimilarity (ref Fusionmodule.py:373-461)."""
    if hasattr(sd, "state_dict"):
        # the reference pickles the module object itself (Models.py:39)
        sd = sd.state_dict()
    c = _Consumer(sd)
    out = {}
    p = ("params", "sim_enc")
    # VisualSA: Sequential(Linear, BatchNorm, Tanh, Dropout)
    _lin(c, "v_global_w.embedding_local.0", out, *p, "v_global_w", "local_fc")
    _bn(c, "v_global_w.embedding_local.1", out, "sim_enc", "v_global_w", "local_bn", "BatchNorm_0")
    _lin(c, "v_global_w.embedding_global.0", out, *p, "v_global_w", "global_fc")
    _bn(c, "v_global_w.embedding_global.1", out, "sim_enc", "v_global_w", "global_bn", "BatchNorm_0")
    _lin(c, "v_global_w.embedding_common.0", out, *p, "v_global_w", "common_fc")
    # TextSA (no BatchNorm)
    _lin(c, "t_global_w.embedding_local.0", out, *p, "t_global_w", "local_fc")
    _lin(c, "t_global_w.embedding_global.0", out, *p, "t_global_w", "global_fc")
    _lin(c, "t_global_w.embedding_common.0", out, *p, "t_global_w", "common_fc")
    _lin(c, "sim_tranloc_w", out, *p, "scorer", "sim_tranloc_w")
    _lin(c, "sim_tranglo_w", out, *p, "scorer", "sim_tranglo_w")
    _lin(c, "sim_eval_w", out, *p, "scorer", "sim_eval_w")
    if module_name == "SGR":
        i = 0
        while c.has(f"SGR_module.sgr{i}.graph_query_w.weight"):
            _lin(c, f"SGR_module.sgr{i}.graph_query_w", out, *p, "scorer", f"SGR_{i}", "query_w")
            _lin(c, f"SGR_module.sgr{i}.graph_key_w", out, *p, "scorer", f"SGR_{i}", "key_w")
            _lin(c, f"SGR_module.sgr{i}.sim_graph_w", out, *p, "scorer", f"SGR_{i}", "graph_w")
            i += 1
    else:
        _lin(c, "SAF_module.attn_sim_w", out, *p, "scorer", "SAF", "attn_w")
        _bn(c, "SAF_module.bn", out, "sim_enc", "scorer", "SAF", "bn", "BatchNorm_0")
    return _finish(c, "EncoderSimilarity", out)


def convert_vsrn_caption(sd) -> dict:
    """VSRN caption model (ref Fusionmodule.py: EncoderRNN :149-203,
    Attention :112-146, DecoderRNN :206-367).

    The reference never checkpoints this module (base_module.state_dict
    covers img_enc/txt_enc only, Models.py:37-40), so normal checkpoint
    conversion skips it; the training-trajectory parity tests pass
    `caption_model.state_dict()` explicitly to align the caption-loss path.
    """
    c = _Consumer(sd)
    out = {}
    enc = ("params", "caption_model", "encoder")
    _lin(c, "encoder.vid2hid", out, *enc, "vid2hid")
    _gru(c, "encoder.rnn", out, *enc, "rnn")
    dec = ("params", "caption_model", "decoder")
    out[dec + ("embedding",)] = c.take("decoder.embedding.weight")
    # additive attention: linear1 (2H->H), linear2 (H->1, no bias)
    out[dec + ("att_w1",)] = c.take("decoder.attention.linear1.weight").T
    out[dec + ("att_b1",)] = c.take("decoder.attention.linear1.bias")
    out[dec + ("att_w2",)] = c.take("decoder.attention.linear2.weight").T
    _gru(c, "decoder.rnn", out, *dec)
    out[dec + ("out_w",)] = c.take("decoder.out.weight").T
    out[dec + ("out_b",)] = c.take("decoder.out.bias")
    return _finish(c, "VSRN caption model", out)


# ---------------------------------------------------------------------------
# top level
# ---------------------------------------------------------------------------


def convert_state_list(name: str, state_list, config: dict) -> dict:
    """Reference state-dict list -> flat {path-tuple: ndarray} for itrx."""
    out = {}
    if name in ("VSE_PP", "VSE++"):
        if any(k.startswith("cnn.") for k in _strip_module(state_list[0])):
            raise NotImplementedError(
                "raw-pixel VSE++ (EncoderImageFull) checkpoints: use "
                "itrx.models.cnn.load_torch_cnn for the tower"
            )
        out.update(convert_img_precomp(state_list[0]))
        out.update(convert_text_gru(state_list[1]))
    elif name == "SCAN":
        out.update(convert_img_precomp(state_list[0]))
        out.update(convert_text_gru(state_list[1]))
    elif name == "VSRN":
        out.update(
            convert_img_precomp_attn(state_list[0], config.get("data_name", ""))
        )
        out.update(convert_text_gru(state_list[1]))
        # the reference does NOT checkpoint the caption decoder
        # (state_dict covers img_enc/txt_enc only, Models.py:37-40); an
        # optional third element (caption_model.state_dict()) is accepted
        # for the training-trajectory parity tests
        if len(state_list) > 2 and state_list[2] is not None:
            out.update(convert_vsrn_caption(state_list[2]))
    elif name == "SAEM":
        out.update(convert_transformer_mapping(state_list[0]))
        out.update(convert_bert_mapping(state_list[1], config.get("txt_stru", "cnn")))
    elif name == "SGRAF":
        out.update(convert_img_precomp(state_list[0]))
        out.update(convert_text_gru(state_list[1]))
        out.update(
            convert_sgraf_sim(state_list[2], config.get("module_name", "SGR"))
        )
    elif name == "CAMERA":
        out.update(convert_camera_img(state_list[0]))
        out.update(convert_camera_txt(state_list[1]))
    else:
        raise ValueError(f"Unknown method: {name}")
    return out


def merge_into_variables(variables: dict, flat: dict) -> dict:
    """Overwrite leaves of an initialized itrx variable tree.

    Strict: each converted path must exist with the same shape.  Leaves not
    covered (e.g. VSRN's caption decoder) keep their initialization.
    """
    import jax

    converted = dict(flat)

    def visit(path, leaf):
        key = tuple(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        if key in converted:
            new = converted.pop(key)
            if tuple(new.shape) != tuple(leaf.shape):
                raise ValueError(
                    f"shape mismatch at {'/'.join(key)}: "
                    f"ref {new.shape} vs itrx {leaf.shape}"
                )
            return np.asarray(new, dtype=leaf.dtype)
        return leaf

    merged = jax.tree_util.tree_map_with_path(visit, variables)
    if converted:
        missing = ["/".join(k) for k in converted]
        raise ValueError(f"converted leaves with no itrx target: {missing}")
    return merged


def _dummy_batch(config: dict, regions: int = 36, words: int = 16):
    """Smallest batch that traces every parameter of the method."""
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    name = config["name"]
    b = 4
    if name in ("VSE_PP", "VSE++") and config.get("data_name", "").endswith("_precomp"):
        images = rng.standard_normal((b, config["img_dim"]))
    else:
        images = rng.standard_normal((b, regions, config["img_dim"]))
    batch = {
        "images": jnp.asarray(images.astype(np.float32)),
        "cap_ids": jnp.asarray(
            rng.integers(0, config["vocab_size"], (b, words)).astype(np.int32)
        ),
        "cap_mask": jnp.asarray(
            (np.arange(words)[None] < rng.integers(3, words, (b,))[:, None]).astype(
                np.float32
            )
        ),
    }
    if name in ("SAEM", "CAMERA"):
        batch["type_ids"] = jnp.zeros_like(batch["cap_ids"])
    if name == "CAMERA":
        batch["boxes"] = jnp.asarray(
            rng.uniform(0, 100, (b, regions, 4)).astype(np.float32)
        )
        batch["imgs_wh"] = jnp.asarray(np.full((b, 2), 100.0, np.float32))
    if name == "VSRN":
        L = config.get("max_len", 60) + 1
        batch["label_ids"] = jnp.asarray(
            rng.integers(0, config["vocab_size"], (b, L)).astype(np.int32)
        )
        batch["label_mask"] = jnp.ones((b, L), jnp.float32)
    return batch


def ref_variables_for_model(model, config: dict, state_list) -> dict:
    """Initialize `model` and splice in converted reference weights."""
    import jax

    batch = _dummy_batch(config)
    # VSRN's decoder and CAMERA's diversity head only trace under train=True
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch,
        train=config["name"] in ("VSRN", "CAMERA"),
    )
    variables = jax.device_get(variables)
    if hasattr(variables, "unfreeze"):
        variables = variables.unfreeze()
    flat = convert_state_list(config["name"], state_list, config)
    return merge_into_variables(variables, flat)


def convert_reference_checkpoint(
    ckpt_path: str, out_path: str = None, ref_root: str = None, overrides=None
) -> str:
    """Convert a reference .pth.tar into a loadable itrx checkpoint.

    ``ref_root`` makes the reference package importable so SGRAF's pickled
    sim_enc module can be restored (a stub torchvision is injected — the
    precomp models never touch it).
    """
    import torch

    if ref_root:
        import sys
        import types

        if "torchvision" not in sys.modules:
            tv = types.ModuleType("torchvision")
            tv.models = types.ModuleType("torchvision.models")
            sys.modules["torchvision"] = tv
            sys.modules["torchvision.models"] = tv.models
        if ref_root not in sys.path:
            sys.path.insert(0, ref_root)

    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    state_list = ckpt["model"]
    ref_config = dict(ckpt["_config"])
    if overrides:
        ref_config.update(overrides)
    name = ref_config["name"].replace("VSE++", "VSE_PP")
    ref_config["name"] = name

    from ..models import get_model

    model = get_model(ref_config)
    variables = ref_variables_for_model(model, ref_config, state_list)

    from .checkpoint import save_checkpoint

    sd = {
        "params": variables["params"],
        "batch_stats": variables.get("batch_stats", {}),
        "epoch": int(ckpt.get("epoch", 0)),
        "best_rsum": float(ckpt.get("best_rsum", 0.0)),
        # epoch-end reference checkpoints store 'best_rl' (bug #2)
        "best_r1": float(ckpt.get("best_r1", ckpt.get("best_rl", 0.0))),
        "Eiters": int(ckpt.get("Eiters", 0)),
    }
    out_path = out_path or ckpt_path.rsplit(".pth", 1)[0] + ".itrx"
    save_checkpoint(sd, ref_config, out_path)
    print(f"Converted {name} reference checkpoint -> {out_path}")
    return out_path


def main():
    import argparse

    ap = argparse.ArgumentParser(
        description="Convert a reference PyTorch checkpoint to itrx format"
    )
    ap.add_argument("ckpt", help="reference .pth.tar checkpoint")
    ap.add_argument("--out", default=None, help="output .itrx path")
    ap.add_argument(
        "--ref_root",
        default=None,
        help="reference repo root (for unpickling SGRAF's sim_enc module)",
    )
    ap.add_argument(
        "--set",
        nargs="*",
        default=[],
        metavar="K=V",
        help="config overrides applied to the embedded _config",
    )
    args = ap.parse_args()
    overrides = {}
    for kv in args.set:
        k, v = kv.split("=", 1)
        try:
            import ast

            overrides[k] = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            overrides[k] = v
    convert_reference_checkpoint(
        args.ckpt, out_path=args.out, ref_root=args.ref_root, overrides=overrides
    )


if __name__ == "__main__":
    main()

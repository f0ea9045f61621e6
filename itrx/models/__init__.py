"""Model factory (ref itr/modalmodule/__init__.py:4-19)."""

from __future__ import annotations

from . import methods


def get_model(config: dict):
    """Build the method module named by config['name'] from a flat config dict."""
    name = config["name"]
    if name in ("VSE++", "VSE_PP"):
        return methods.VSEPP(
            vocab_size=config["vocab_size"],
            embed_size=config["embed_size"],
            word_dim=config["word_dim"],
            measure=config["measure"],
            use_abs=config["use_abs"],
            no_imgnorm=config["no_imgnorm"],
            margin=config["margin"],
            max_violation=config["max_violation"],
            full_encoder=config.get("data_name", "f30k_precomp")
            in ("coco", "f8k", "f30k"),
            cnn_type=config.get("img_encoder", "vgg19"),
            finetune=config.get("finetune", False),
        )
    if name == "SCAN":
        return methods.SCAN(
            vocab_size=config["vocab_size"],
            embed_size=config["embed_size"],
            word_dim=config["word_dim"],
            bi_gru=config["bi_gru"],
            no_imgnorm=config["no_imgnorm"],
            no_txtnorm=config["no_txtnorm"],
            precomp_enc_type=config["precomp_enc_type"],
            margin=config["margin"],
            max_violation=config["max_violation"],
            cross_attn=config["cross_attn"],
            raw_feature_norm=config["raw_feature_norm"],
            agg_func=config["agg_func"],
            lambda_lse=config["lambda_lse"],
            lambda_softmax=config["lambda_softmax"],
            use_fused_eval=config.get("use_fused_eval", True),
        )
    if name == "VSRN":
        return methods.VSRN(
            vocab_size=config["vocab_size"],
            embed_size=config["embed_size"],
            word_dim=config["word_dim"],
            data_name=config["data_name"],
            measure=config["measure"],
            use_abs=config["use_abs"],
            no_imgnorm=config["no_imgnorm"],
            no_txtnorm=config["no_txtnorm"],
            margin=config["margin"],
            max_violation=config["max_violation"],
            max_len=config["max_len"],
            dim_hidden=config["dim_hidden"],
            dim_vid=config["dim_vid"],
            dim_word=config["dim_word"],
            input_dropout_p=config["input_dropout_p"],
        )
    if name == "SGRAF":
        return methods.SGRAF(
            vocab_size=config["vocab_size"],
            embed_size=config["embed_size"],
            word_dim=config["word_dim"],
            sim_dim=config["sim_dim"],
            bi_gru=config["bi_gru"],
            no_imgnorm=config["no_imgnorm"],
            no_txtnorm=config["no_txtnorm"],
            module_name=config["module_name"],
            sgr_step=config["sgr_step"],
            margin=config["margin"],
            max_violation=config["max_violation"],
            cap_chunk=config.get("cap_chunk", 32),
            sim_bf16=config.get("sim_bf16", False),
            sim_remat=config.get("sim_remat", True),
            dropout=config.get("sgraf_dropout", 0.4),
        )
    if name == "SAEM":
        from .bert_methods import build_saem

        return build_saem(config)
    if name == "CAMERA":
        from .bert_methods import build_camera

        return build_camera(config)
    raise ValueError(
        f"Please choose a method in ['VSE_PP','SCAN','VSRN','SAEM','SGRAF','CAMERA']. {name} is given."
    )

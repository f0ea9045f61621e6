"""bf16 mixed-precision train step vs fp32 (tiny models, CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from itrx.models import get_model
from itrx.train.loop import make_train_step
from itrx.train.state import create_train_state


def _batch(rng, b=8, r=12, d=64, l=16, v=120):
    return {
        "images": jnp.asarray(rng.standard_normal((b, r, d)).astype(np.float32)),
        "cap_ids": jnp.asarray(rng.integers(0, v, (b, l)).astype(np.int32)),
        "cap_mask": jnp.asarray(
            (np.arange(l)[None] < rng.integers(3, l, (b,))[:, None]).astype(
                np.float32
            )
        ),
    }


def _run(cfg, batch, bf16, steps=3):
    model = get_model(cfg)
    cfg = dict(cfg, learning_rate=1e-3, lr_update=15, grad_clip=2.0, seed=0)
    state, tx = create_train_state(model, cfg, batch, 10)
    step = make_train_step(
        model, tx, compute_dtype="bfloat16" if bf16 else None
    )
    rng = jax.random.PRNGKey(0)
    losses = []
    for i in range(steps):
        state, aux = step(state, batch, rng, 0)
        losses.append(float(aux["Loss"]))
    return losses, state


def test_scan_bf16_step_close_to_fp32(rng):
    cfg = dict(
        name="SCAN", vocab_size=120, embed_size=64, word_dim=32, bi_gru=True,
        no_imgnorm=False, no_txtnorm=True, precomp_enc_type="basic",
        margin=0.2, max_violation=True, cross_attn="t2i",
        raw_feature_norm="clipped_l2norm", agg_func="LogSumExp",
        lambda_lse=6.0, lambda_softmax=9.0,
    )
    batch = _batch(rng)
    l32, s32 = _run(cfg, batch, False)
    l16, s16 = _run(cfg, batch, True)
    # same init/seed: first-step losses agree to bf16 tolerance, both decrease
    assert abs(l16[0] - l32[0]) / abs(l32[0]) < 0.03, (l16, l32)
    assert l16[-1] < l16[0] and l32[-1] < l32[0]
    # master params stay fp32 and finite
    leaves = jax.tree_util.tree_leaves(s16.params)
    assert all(x.dtype == jnp.float32 for x in leaves)
    assert all(bool(jnp.all(jnp.isfinite(x))) for x in leaves)


def test_sgraf_bf16_step_close_to_fp32(rng):
    cfg = dict(
        name="SGRAF", vocab_size=120, embed_size=64, word_dim=32, sim_dim=32,
        bi_gru=True, no_imgnorm=False, no_txtnorm=False, module_name="SGR",
        sgr_step=2, margin=0.2, max_violation=True, cap_chunk=8,
    )
    batch = _batch(rng)
    l32, s32 = _run(cfg, batch, False)
    l16, s16 = _run(cfg, batch, True)
    assert abs(l16[0] - l32[0]) / abs(l32[0]) < 0.03, (l16, l32)
    # batch_stats keep their master dtype under mixed precision
    assert all(
        x.dtype == jnp.float32
        for x in jax.tree_util.tree_leaves(s16.batch_stats)
    )


def test_vsrn_bf16_step(rng):
    b = _batch(rng, l=13)
    b["label_ids"] = jnp.asarray(
        np.random.default_rng(1).integers(0, 120, (8, 13)).astype(np.int32)
    )
    b["label_mask"] = jnp.ones((8, 13), jnp.float32)
    cfg = dict(
        name="VSRN", vocab_size=120, embed_size=64, word_dim=32,
        data_name="f30k_precomp", measure="cosine", use_abs=False,
        no_imgnorm=False, no_txtnorm=False, margin=0.2, max_violation=False,
        max_len=12, dim_hidden=32, dim_vid=64, dim_word=32,
        input_dropout_p=0.0,
    )
    l32, _ = _run(cfg, b, False)
    l16, _ = _run(cfg, b, True)
    assert abs(l16[0] - l32[0]) / abs(l32[0]) < 0.05, (l16, l32)


def test_camera_bf16_thin_box_stays_finite(rng, tmp_path):
    """Regression: bf16 quantization must not NaN CAMERA's position gate.

    h = y2 - y1 computed in bf16 collapses a thin box to exactly 0 (bf16
    spacing at y~300 is 2.0), so absolute_encode's w/h ratio becomes inf;
    sigmoid(inf) survives the forward but the gate kernel's gradient is
    0*inf = NaN, and grad-clip's global norm then wipes every parameter.
    The train step keeps boxes/imgs_wh fp32 (loop._KEEP_F32) and
    absolute_encode clamps degenerate heights.
    """
    import json

    bc = dict(
        vocab_size=120, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64, hidden_act="gelu",
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        max_position_embeddings=64, type_vocab_size=2,
        initializer_range=0.02,
    )
    (tmp_path / "bert_config.json").write_text(json.dumps(bc))

    b_, r_, l_ = 8, 12, 16
    batch = _batch(rng, b=b_, r=r_, l=l_)
    batch["type_ids"] = jnp.zeros((b_, l_), jnp.int32)
    xy = rng.uniform(0, 200, (b_, r_, 2)).astype(np.float32)
    wh = rng.uniform(5, 100, (b_, r_, 2)).astype(np.float32)
    boxes = np.concatenate([xy, xy + wh], axis=2)
    # the trigger: a thin box high in the image — under bf16, 300.5 - 300.0
    # rounds to 0 and w/h overflows to inf
    boxes[0, 0] = [10.0, 300.0, 90.0, 300.5]
    batch["boxes"] = jnp.asarray(boxes)
    batch["imgs_wh"] = jnp.full((b_, 2), 320.0, jnp.float32)

    cfg = dict(
        name="CAMERA", vocab_size=120, embed_size=64, head=4, smry_k=5,
        smry_lamda=0.01, drop=0.0, margin=0.2, max_violation=True,
        bert_config_file=str(tmp_path / "bert_config.json"),
    )
    l32, _ = _run(cfg, batch, False)
    l16, s16 = _run(cfg, batch, True)
    assert all(np.isfinite(l16)), (l16, l32)
    assert abs(l16[0] - l32[0]) / abs(l32[0]) < 0.05, (l16, l32)
    leaves = jax.tree_util.tree_leaves(s16.params)
    assert all(bool(jnp.all(jnp.isfinite(x))) for x in leaves)

"""BERT tower parity vs a HuggingFace torch oracle, + SAEM/CAMERA model tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from itrx.models import get_model
from itrx.models.bert import BertConfig, BertModel, load_torch_bert

TINY = dict(
    vocab_size=60,
    hidden_size=48,
    num_hidden_layers=2,
    num_attention_heads=4,
    intermediate_size=96,
    max_position_embeddings=64,
    type_vocab_size=2,
)


def test_bert_matches_huggingface_oracle(tmp_path, rng):
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    hf_cfg = transformers.BertConfig(
        **TINY, hidden_act="gelu", hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, layer_norm_eps=1e-12,
    )
    torch.manual_seed(0)
    hf = transformers.BertModel(hf_cfg, add_pooling_layer=True).eval()
    ckpt = tmp_path / "pytorch_model.bin"
    torch.save(hf.state_dict(), str(ckpt))

    cfg = BertConfig(**TINY, hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    params = load_torch_bert(str(ckpt), cfg)

    ids = rng.integers(0, 60, (3, 12)).astype(np.int64)
    mask = np.ones((3, 12), np.int64)
    mask[1, 7:] = 0
    mask[2, 4:] = 0
    types = np.zeros((3, 12), np.int64)

    with torch.no_grad():
        out = hf(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
            token_type_ids=torch.tensor(types),
        )
    want_seq = out.last_hidden_state.numpy()
    want_pool = out.pooler_output.numpy()

    model = BertModel(cfg)
    all_layers, pooled = model.apply(
        {"params": params}, jnp.asarray(ids), jnp.asarray(types),
        jnp.asarray(mask),
    )
    np.testing.assert_allclose(np.asarray(all_layers[-1]), want_seq, atol=2e-5)
    np.testing.assert_allclose(np.asarray(pooled), want_pool, atol=2e-5)


def _bert_batch(rng, B=6, R=12, D=64, L=16, V=60):
    boxes = rng.uniform(1, 100, (B, R, 4)).astype(np.float32)
    boxes[..., 2:] += 50.0
    return {
        "images": jnp.asarray(rng.standard_normal((B, R, D)).astype(np.float32)),
        "cap_ids": jnp.asarray(rng.integers(0, V, (B, L)).astype(np.int32)),
        "cap_mask": jnp.asarray(
            (np.arange(L)[None] < rng.integers(3, L, (B,))[:, None]).astype(np.float32)
        ),
        "type_ids": jnp.zeros((B, L), jnp.int32),
        "boxes": jnp.asarray(boxes),
        "imgs_wh": jnp.full((B, 2), 320.0, jnp.float32),
    }


@pytest.fixture
def tiny_bert(monkeypatch):
    import itrx.models.bert_methods as bm

    tiny = BertConfig(**TINY)
    monkeypatch.setattr(bm, "_bert_cfg_from_config", lambda cfg: tiny)
    return tiny


@pytest.mark.parametrize(
    "name,extra",
    [
        ("SAEM", dict(final_dims=32, embed_size=48, txt_stru="cnn", bi_gru=False, measure="cosine")),
        ("SAEM", dict(final_dims=32, embed_size=48, txt_stru="trans", bi_gru=False, measure="cosine")),
        ("SAEM", dict(final_dims=32, embed_size=48, txt_stru="rnn", bi_gru=True, measure="cosine")),
        ("CAMERA", dict(embed_size=48, head=4, smry_k=5, smry_lamda=0.01, drop=0.1)),
    ],
)
def test_bert_methods_train_and_eval(rng, tiny_bert, name, extra):
    cfg = dict(name=name, vocab_size=60, margin=0.2, max_violation=False,
               word_dim=16, **extra)
    model = get_model(cfg)
    batch = _bert_batch(rng)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, train=True,
    )
    has_bs = "batch_stats" in variables

    def loss_fn(p):
        vin = {"params": p}
        if has_bs:
            vin["batch_stats"] = variables["batch_stats"]
        out, _ = model.apply(
            vin, batch, train=True, rngs={"dropout": jax.random.PRNGKey(2)},
            mutable=["batch_stats"], epoch=3,
        )
        return out[0]

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    # frozen tower: zero grads through BERT
    bgn = sum(
        float(jnp.sum(jnp.abs(g)))
        for g in jax.tree.leaves(grads["txt_enc"]["bert"])
    )
    assert bgn == 0.0
    total = float(
        jnp.sqrt(sum(jnp.sum(g * g) for g in jax.tree.leaves(grads)))
    )
    assert np.isfinite(total) and total > 0

    e = model.apply(
        {"params": variables["params"],
         **({"batch_stats": variables["batch_stats"]} if has_bs else {})},
        batch, train=False, method="embed",
    )
    s = model.apply(
        {"params": variables["params"],
         **({"batch_stats": variables["batch_stats"]} if has_bs else {})},
        e["img"], e["cap"], None, method="similarity",
    )
    assert s.shape == (6, 6)
    assert np.all(np.isfinite(np.asarray(s)))


def test_saem_epoch_schedule(rng, tiny_bert):
    """SAEM's alpha drops with epoch: loss(epoch=30) must drop the angular term."""
    cfg = dict(name="SAEM", vocab_size=60, margin=0.2, max_violation=False,
               word_dim=16, final_dims=32, embed_size=48, txt_stru="cnn",
               bi_gru=False, measure="cosine")
    model = get_model(cfg)
    batch = _bert_batch(rng)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, train=True,
    )

    def loss_at(epoch):
        out, _ = model.apply(
            variables, batch, train=False, mutable=[], epoch=epoch,
        )
        return float(out[0]), float(out[1]["Loss1"]), float(out[1]["Loss2"])

    l0, l1_0, l2_0 = loss_at(0)
    l30, l1_30, _ = loss_at(30)
    assert l1_0 == pytest.approx(l1_30, rel=1e-6)
    # at epoch 0 alpha=0.5; at 30 alpha=0 -> smaller total when Loss2>0
    assert l0 - l30 == pytest.approx(0.5 * l2_0, rel=1e-4)

"""Model-level shape/gradient tests for the GRU-family methods under jit."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from itrx.models import get_model


def _batch(rng, B=8, R=12, D=64, L=16, V=100, flat_images=False):
    return {
        "images": jnp.asarray(
            rng.standard_normal((B, D) if flat_images else (B, R, D)).astype(
                np.float32
            )
        ),
        "cap_ids": jnp.asarray(rng.integers(0, V, (B, L)).astype(np.int32)),
        "cap_mask": jnp.asarray(
            (np.arange(L)[None] < rng.integers(3, L, (B,))[:, None]).astype(
                np.float32
            )
        ),
    }


def _cfg(name, **kw):
    base = dict(
        name=name, vocab_size=100, embed_size=32, word_dim=16,
        measure="cosine", use_abs=False, no_imgnorm=False, no_txtnorm=False,
        margin=0.2, max_violation=False, bi_gru=True,
        precomp_enc_type="basic", cross_attn="t2i",
        raw_feature_norm="clipped_l2norm", agg_func="LogSumExp",
        lambda_lse=6.0, lambda_softmax=9.0, sim_dim=16, module_name="SGR",
        sgr_step=3, data_name="f30k_precomp", max_len=15, dim_hidden=24,
        dim_vid=64, dim_word=16, input_dropout_p=0.2,
    )
    base.update(kw)
    return base


def _init_and_grad(model, batch):
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch,
        train=True,
    )
    has_bs = "batch_stats" in variables

    @jax.jit
    def loss_and_grad(params):
        def loss_fn(p):
            vin = {"params": p}
            if has_bs:
                vin["batch_stats"] = variables["batch_stats"]
            out, _ = model.apply(
                vin, batch, train=True, rngs={"dropout": jax.random.PRNGKey(2)},
                mutable=["batch_stats"],
            )
            return out[0]

        return jax.value_and_grad(loss_fn)(params)

    loss, grads = loss_and_grad(variables["params"])
    gn = float(jnp.sqrt(sum(jnp.sum(g * g) for g in jax.tree.leaves(grads))))
    return variables, float(loss), gn


@pytest.mark.parametrize(
    "name,kw",
    [
        ("VSE_PP", {}),
        ("VSE_PP", {"measure": "order", "max_violation": True}),
        ("SCAN", {"no_txtnorm": True}),
        ("SCAN", {"cross_attn": "i2t", "agg_func": "Max"}),
        ("SGRAF", {}),
        ("SGRAF", {"module_name": "SAF"}),
    ],
)
def test_loss_and_grads_finite(rng, name, kw):
    cfg = _cfg(name, **kw)
    model = get_model(cfg)
    batch = _batch(rng, flat_images=(name == "VSE_PP"), D=64)
    if name == "VSE_PP":
        batch["images"] = batch["images"]
    variables, loss, gn = _init_and_grad(model, batch)
    assert np.isfinite(loss) and np.isfinite(gn) and gn > 0


def test_vsrn_loss_and_grads(rng):
    cfg = _cfg("VSRN", embed_size=64)
    model = get_model(cfg)
    batch = _batch(rng, L=16)
    batch["cap_mask"] = jnp.ones_like(batch["cap_mask"])
    batch["label_ids"] = batch["cap_ids"]
    batch["label_mask"] = jnp.asarray(
        (np.arange(16)[None] < np.full((8, 1), 9)).astype(np.float32)
    )
    variables, loss, gn = _init_and_grad(model, batch)
    assert np.isfinite(loss) and gn > 0


def test_sgraf_chunking_matches_single_chunk(rng):
    """Chunked caption scoring must equal the unchunked computation."""
    cfg = _cfg("SGRAF", cap_chunk=3)
    cfg2 = _cfg("SGRAF", cap_chunk=100)
    m1, m2 = get_model(cfg), get_model(cfg2)
    batch = _batch(rng, B=6)
    v = m1.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, train=True,
    )
    e = m1.apply(v, batch, train=False, method="embed")
    s1 = m1.apply(v, e["img"], e["cap"], e["cap_mask"], method="similarity")
    s2 = m2.apply(v, e["img"], e["cap"], e["cap_mask"], method="similarity")
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-6)


def test_scan_similarity_invariant_to_padding(rng):
    """Extending captions with padded columns must not change scores."""
    cfg = _cfg("SCAN", no_txtnorm=True)
    model = get_model(cfg)
    batch = _batch(rng, L=12)
    v = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, train=True,
    )
    e = model.apply(v, batch, train=False, method="embed")
    s1 = model.apply(v, e["img"], e["cap"], e["cap_mask"], method="similarity")
    cap_pad = jnp.pad(e["cap"], ((0, 0), (0, 5), (0, 0)))
    mask_pad = jnp.pad(e["cap_mask"], ((0, 0), (0, 5)))
    s2 = model.apply(v, e["img"], cap_pad, mask_pad, method="similarity")
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-5)

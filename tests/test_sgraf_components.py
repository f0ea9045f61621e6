"""SGRAF tower components vs numpy oracles of the reference formulas
(itr/modalmodule/Fusionmodule.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from itrx.models.sgraf import (
    AttentionFiltration, GraphReasoning, TextSA, VisualSA,
)


def np_softmax(x, axis):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def np_l2(x, axis=-1):
    return x / (np.sqrt((x * x).sum(axis=axis, keepdims=True)) + 1e-8)


def _extract(params, *names):
    out = []
    for n in names:
        p = params[n]
        out.append((np.asarray(p["kernel"]), np.asarray(p["bias"])))
    return out


def test_visual_sa_eval_mode(rng):
    B, R, D = 4, 9, 16
    local = rng.standard_normal((B, R, D)).astype(np.float32)
    raw_global = local.mean(1)
    m = VisualSA(embed_dim=D)
    v = m.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(local),
               jnp.asarray(raw_global), train=False)
    got = np.asarray(
        m.apply(v, jnp.asarray(local), jnp.asarray(raw_global), train=False)
    )

    (lw, lb), (gw, gb), (cw, cb) = _extract(
        v["params"], "local_fc", "global_fc", "common_fc"
    )
    # eval BN with init stats (mean 0, var 1) is identity up to eps scaling
    l_emb = np.tanh((local @ lw + lb) / np.sqrt(1 + 1e-5))
    g_emb = np.tanh((raw_global @ gw + gb) / np.sqrt(1 + 1e-5))
    common = l_emb * g_emb[:, None, :]
    w = np_softmax((common @ cw + cb)[..., 0], axis=1)
    want = np_l2((w[..., None] * local).sum(1))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_text_sa_masking(rng):
    B, L, D = 4, 10, 16
    local = rng.standard_normal((B, L, D)).astype(np.float32)
    mask = (np.arange(L)[None] < np.array([[10], [6], [3], [8]])[:, 0][:, None]).astype(np.float32)
    local = local * mask[..., None]
    denom = mask.sum(1, keepdims=True)
    raw_global = local.sum(1) / denom

    m = TextSA(embed_dim=D)
    v = m.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(local),
               jnp.asarray(raw_global), jnp.asarray(mask), train=False)
    got = np.asarray(m.apply(v, jnp.asarray(local), jnp.asarray(raw_global),
                             jnp.asarray(mask), train=False))

    (lw, lb), (gw, gb), (cw, cb) = _extract(
        v["params"], "local_fc", "global_fc", "common_fc"
    )
    l_emb = np.tanh(local @ lw + lb)
    g_emb = np.tanh(raw_global @ gw + gb)
    common = l_emb * g_emb[:, None, :]
    logits = (common @ cw + cb)[..., 0]
    logits = np.where(mask > 0, logits, -1e18)
    w = np_softmax(logits, axis=1)
    want = np_l2((w[..., None] * local).sum(1))
    np.testing.assert_allclose(got, want, atol=1e-5)
    # padded words must get zero attention
    probs = w * (1 - mask)
    assert probs.max() < 1e-12


def test_graph_reasoning_matches_formula(rng):
    B, N, D = 3, 7, 8
    sim_emb = rng.standard_normal((B, N, D)).astype(np.float32)
    node_mask = np.ones((B, N), np.float32)
    m = GraphReasoning(sim_dim=D)
    v = m.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(sim_emb),
               jnp.asarray(node_mask))
    got = np.asarray(m.apply(v, jnp.asarray(sim_emb), jnp.asarray(node_mask)))

    (qw, qb), (kw, kb), (gw, gb) = _extract(
        v["params"], "query_w", "key_w", "graph_w"
    )
    q = sim_emb @ qw + qb
    k = sim_emb @ kw + kb
    edge = np_softmax(np.einsum("bnd,bmd->bnm", q, k), axis=-1)
    sgr = np.einsum("bnm,bmd->bnd", edge, sim_emb)
    want = np.maximum(sgr @ gw + gb, 0.0)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_attention_filtration_eval(rng):
    B, N, D = 3, 7, 8
    sim_emb = rng.standard_normal((B, N, D)).astype(np.float32)
    node_mask = np.ones((B, N), np.float32)
    m = AttentionFiltration(sim_dim=D, train=False)
    v = m.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(sim_emb),
               jnp.asarray(node_mask))
    got = np.asarray(m.apply(v, jnp.asarray(sim_emb), jnp.asarray(node_mask)))

    (aw, ab), = _extract(v["params"], "attn_w")
    attn = (sim_emb @ aw + ab)[..., 0]          # (B, N)
    attn = attn / np.sqrt(1 + 1e-5)             # eval BN, init stats
    attn = 1 / (1 + np.exp(-attn))
    attn = attn / (np.abs(attn).sum(-1, keepdims=True) + 1e-8)
    saf = np.einsum("bn,bnd->bd", attn, sim_emb)
    want = np_l2(saf)
    np.testing.assert_allclose(got, want, atol=1e-5)

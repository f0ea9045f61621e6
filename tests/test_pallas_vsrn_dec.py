"""Fused VSRN decoder kernel vs the XLA scan (interpret mode), plus the
DecoderRNN routing and the shard_map variant.

The kernel fuses the teacher-forced decode loop — additive attention over
encoder outputs, context dropout, GRU cell — into one Pallas grid with the
carry in VMEM (itrx/ops/pallas/vsrn_dec.py); VSRN routes to it for bf16
training at lane-aligned hidden sizes.
"""

import numpy as np
import jax
import jax.numpy as jnp

from itrx.ops.pallas import (
    dispatch_counts,
    force_interpret,
    shard_ctx,
)
from itrx.ops.pallas.vsrn_dec import decoder_seq, decoder_seq_auto
from itrx.ops.rnn import gru_cell


def _scan_ref(gxw, cm, enco, enca, h0, watt, w2, w_ctx, w_hh, b_hh):
    """The exact per-step math of DecoderRNN's XLA scan (b_ih pre-folded
    into gxw, dropout as a pre-scaled mask)."""
    T = gxw.shape[0]

    def attend(h_):
        o = jnp.tanh(enca + (h_ @ watt)[:, None, :])
        e = (o @ w2)[..., 0]
        a = jax.nn.softmax(e, axis=1)
        return jnp.einsum("bs,bsd->bd", a, enco)

    def step(h_, t):
        ctx = attend(h_) * cm[t]
        gx = gxw[t] + ctx @ w_ctx.T
        h_ = gru_cell(h_, gx, w_hh, b_hh)
        return h_, h_

    _, hs = jax.lax.scan(step, h0, jnp.arange(T))
    return hs


def _data(rng, t=7, b=6, r=5, h=16):
    f = lambda *s: jnp.asarray(  # noqa: E731
        (rng.standard_normal(s) * 0.4).astype(np.float32)
    )
    gxw = f(t, b, 3 * h)
    cm = jnp.ones((t, b, h), jnp.float32)
    enco, enca, h0 = f(b, r, h), f(b, r, h), f(b, h)
    watt, w2 = f(h, h), f(h, 1)
    w_ctx, w_hh, b_hh = f(3 * h, h), f(3 * h, h), f(3 * h)
    return (gxw, cm, enco, enca, h0, watt, w2, w_ctx, w_hh, b_hh)


def test_decoder_forward_matches_scan(rng):
    args = _data(rng)
    want = _scan_ref(*args)
    got = decoder_seq(*args, interpret=True, dot_dtype="float32")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_decoder_dropout_mask_applied(rng):
    args = list(_data(rng))
    t, b, h = args[0].shape[0], args[2].shape[0], args[4].shape[1]
    keep = 0.75
    args[1] = jnp.asarray(
        (rng.random((t, b, h)) < keep).astype(np.float32) / keep
    )
    want = _scan_ref(*args)
    got = decoder_seq(*args, interpret=True, dot_dtype="float32")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_decoder_grads_match_scan(rng):
    args = _data(rng)
    diff = (0, 2, 3, 4, 5, 6, 7, 8, 9)  # everything but the dropout mask

    def loss_k(*a):
        return jnp.sum(decoder_seq(*a, interpret=True,
                                   dot_dtype="float32") ** 2)

    def loss_x(*a):
        return jnp.sum(_scan_ref(*a) ** 2)

    gk = jax.grad(loss_k, argnums=diff)(*args)
    gx = jax.grad(loss_x, argnums=diff)(*args)
    names = ["gxw", "enco", "enca", "h0", "watt", "w2", "w_ctx", "w_hh",
             "b_hh"]
    for nm, a, b in zip(names, gk, gx):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=3e-4, rtol=2e-3, err_msg=f"grad {nm}",
        )


def test_decoder_grads_bf16_dot_drift_bounded(rng):
    """Production dot_dtype='bfloat16' gradients stay near the fp32 ones."""
    args = _data(rng)

    def loss(dd):
        def f(*a):
            return jnp.sum(decoder_seq(*a, interpret=True,
                                       dot_dtype=dd) ** 2)
        return f

    gk = jax.grad(loss("bfloat16"), argnums=(5, 7, 8))(*args)
    gx = jax.grad(loss("float32"), argnums=(5, 7, 8))(*args)
    for a, b in zip(gk, gx):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = max(np.abs(b).max(), 1e-6)
        assert np.max(np.abs(a - b)) / scale < 0.06


def test_decoder_rnn_routes_to_kernel(rng):
    """DecoderRNN's train branch dispatches the fused kernel for bf16
    lane-aligned hidden sizes, with outputs close to the XLA scan path."""
    from itrx.models.vsrn_decoder import DecoderRNN

    b, r, h, w, vocab, max_len = 3, 4, 128, 8, 11, 6
    mod = DecoderRNN(vocab_size=vocab, max_len=max_len, dim_hidden=h,
                     dim_word=w, input_dropout_p=0.0)
    enco = jnp.asarray(rng.standard_normal((b, r, h)).astype(np.float32))
    hidden = jnp.asarray(rng.standard_normal((b, h)).astype(np.float32))
    targets = jnp.asarray(rng.integers(0, vocab, (b, max_len)), jnp.int32)
    v = mod.init(jax.random.PRNGKey(0), enco, hidden, targets, train=True)
    vb = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, v
    )

    want = mod.apply(v, enco, hidden, targets, train=True)  # fp32 XLA scan
    before = dispatch_counts().get("vsrn_dec_fused", 0)
    with force_interpret():
        got = mod.apply(vb, enco.astype(jnp.bfloat16),
                        hidden.astype(jnp.bfloat16), targets, train=True)
    assert dispatch_counts().get("vsrn_dec_fused", 0) == before + 1
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=0.08, rtol=0.08,
    )


def test_decoder_sharded_matches_direct(rng):
    from itrx.parallel import mesh as pmesh

    cpu_mesh8 = pmesh.make_mesh(devices=jax.devices()[:8])
    args = _data(rng, b=8)
    with force_interpret(dot_dtype="float32"):
        direct = decoder_seq_auto(*args)
        with shard_ctx(cpu_mesh8):
            sharded = jax.jit(decoder_seq_auto)(*args)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(direct),
                               atol=2e-5, rtol=1e-4)

    def loss(fn):
        def f(watt):
            a = list(args)
            a[5] = watt
            return jnp.sum(fn(*a) ** 2)
        return f

    with force_interpret(dot_dtype="float32"):
        g_direct = jax.grad(loss(decoder_seq_auto))(args[5])
        with shard_ctx(cpu_mesh8):
            g_sharded = jax.jit(jax.grad(loss(decoder_seq_auto)))(args[5])
    np.testing.assert_allclose(np.asarray(g_sharded), np.asarray(g_direct),
                               atol=3e-4, rtol=2e-3)


def test_vsrn_bf16_train_step_uses_fused_decoder(rng):
    """Full VSRN bf16 train step under force_interpret: the fused decoder
    (and fused GRU) dispatch inside the loss/grad path, losses finite and
    close to the XLA-path bf16 step."""
    from itrx.models import get_model
    from itrx.train.loop import make_train_step
    from itrx.train.state import create_train_state

    b, r, d, l, v = 8, 12, 64, 16, 120
    batch = {
        "images": jnp.asarray(rng.standard_normal((b, r, d)).astype(np.float32)),
        "cap_ids": jnp.asarray(rng.integers(0, v, (b, l)).astype(np.int32)),
        "cap_mask": jnp.asarray(
            (np.arange(l)[None] < rng.integers(3, l, (b,))[:, None]).astype(
                np.float32
            )
        ),
        "label_ids": jnp.asarray(rng.integers(0, v, (b, 13)).astype(np.int32)),
        "label_mask": jnp.ones((b, 13), jnp.float32),
    }
    cfg = dict(
        name="VSRN", vocab_size=v, embed_size=128, word_dim=32,
        data_name="f30k_precomp", measure="cosine", use_abs=False,
        no_imgnorm=False, no_txtnorm=False, margin=0.2, max_violation=False,
        max_len=12, dim_hidden=128, dim_vid=d, dim_word=32,
        input_dropout_p=0.2, learning_rate=1e-3, lr_update=15,
        grad_clip=2.0, seed=0,
    )
    model = get_model(cfg)
    key = jax.random.PRNGKey(0)

    # the train step donates its state: build a fresh (identical, seeded)
    # state per run
    state, tx = create_train_state(model, cfg, batch, 10)
    step = make_train_step(model, tx, compute_dtype="bfloat16")
    _, aux_xla = step(state, batch, key, 0)  # pallas_ok() False on CPU
    before = dispatch_counts().get("vsrn_dec_fused", 0)
    state, tx = create_train_state(model, cfg, batch, 10)
    with force_interpret():
        step_f = make_train_step(model, tx, compute_dtype="bfloat16")
        state_f, aux_fused = step_f(state, batch, key, 0)
        # trace-time dispatch happens during the jit trace above
    assert dispatch_counts().get("vsrn_dec_fused", 0) > before
    lf, lx = float(aux_fused["Loss"]), float(aux_xla["Loss"])
    assert np.isfinite(lf)
    # dropout streams differ between the paths; losses stay in the same
    # neighborhood
    assert abs(lf - lx) / abs(lx) < 0.1, (lf, lx)
    # parameters moved and stayed finite
    leaf = jax.tree.leaves(state_f.params)[0]
    assert np.all(np.isfinite(np.asarray(leaf, np.float32)))

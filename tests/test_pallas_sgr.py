"""Fused Pallas SGR kernel vs the XLA GraphReasoning chain (interpret mode).

The kernel runs all sgr_step reasoning steps on VMEM-resident row blocks
(itrx/ops/pallas/sgr.py); these tests check forward and gradient agreement
with the XLA reference chain, including masked nodes, non-aligned row
counts, and the shard_map-sharded variant on the virtual mesh.
"""

import numpy as np
import jax
import jax.numpy as jnp

from itrx.ops.pallas.sgr import sgr_reason

NEG_INF = -1e18


def _xla_chain(s, mask, wq, bq, wk, bk, wg, bg):
    steps = wq.shape[0]
    for i in range(steps):
        q = s @ wq[i] + bq[i]
        k = s @ wk[i] + bk[i]
        e = jnp.einsum("bnd,bmd->bnm", q, k)
        e = jnp.where(mask[:, None, :] > 0, e, NEG_INF)
        a = jax.nn.softmax(e, axis=-1)
        g = jnp.einsum("bnm,bmd->bnd", a, s)
        s = jax.nn.relu(g @ wg[i] + bg[i])
    return s


def _data(rng, b=24, n=13, d=128, steps=3):
    s0 = jnp.asarray(rng.standard_normal((b, n, d)).astype(np.float32)) * 0.3
    lengths = rng.integers(3, n + 1, b)
    mask = jnp.asarray(
        (np.arange(n)[None] < lengths[:, None]).astype(np.float32)
    )
    w = lambda: jnp.asarray(
        (rng.standard_normal((steps, d, d)) * 0.05).astype(np.float32)
    )
    bvec = lambda: jnp.asarray(
        (rng.standard_normal((steps, d)) * 0.05).astype(np.float32)
    )
    return s0, mask, w(), bvec(), w(), bvec(), w(), bvec()


def test_sgr_forward_matches_xla(rng):
    s0, mask, *w = _data(rng)
    want = _xla_chain(s0, mask, *w)
    got = sgr_reason(s0, mask, *w, True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=3e-5, rtol=1e-4
    )


def test_sgr_forward_row_padding(rng):
    # b not a multiple of the 64-row block exercises row padding
    s0, mask, *w = _data(rng, b=37)
    want = _xla_chain(s0, mask, *w)
    got = sgr_reason(s0, mask, *w, True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=3e-5, rtol=1e-4
    )


def test_sgr_grads_match_xla(rng):
    s0, mask, *w = _data(rng, b=16, steps=2)

    def loss(fn):
        def f(s_, wq, bq, wk, bk, wg, bg):
            out = fn(s_, mask, wq, bq, wk, bk, wg, bg)
            # weight node 0 like the model does, plus a tail term so every
            # node's gradient is exercised
            return jnp.sum(out[:, 0, :] ** 2) + 0.1 * jnp.sum(jnp.cos(out))

        return f

    argnums = tuple(range(7))
    want = jax.grad(loss(lambda *a: _xla_chain(*a)), argnums)(s0, *w)
    got = jax.grad(
        loss(lambda *a: sgr_reason(*a, True)), argnums
    )(s0, *w)
    names = ("ds0", "dwq", "dbq", "dwk", "dbk", "dwg", "dbg")
    # dbk is structurally zero (bk shifts every edge row by a constant, and
    # softmax is shift-invariant), so its own magnitude is pure cancellation
    # noise — normalize every gradient by the same global scale instead of
    # per-tensor scales.
    scale = max(np.abs(np.asarray(x)).max() for x in want)
    for g, wnt, nm in zip(got, want, names):
        g, wnt = np.asarray(g), np.asarray(wnt)
        np.testing.assert_allclose(
            g / scale, wnt / scale, atol=2e-4,
            err_msg=f"SGR kernel grad mismatch: {nm}",
        )


def test_sgr_sharded_matches_single(rng):
    """shard_map route over the image axis on the 8-device mesh."""
    from itrx.ops import pallas
    from itrx.ops.pallas.sgr import sgr_reason_auto
    from itrx.parallel import mesh as pmesh

    c, ni, n, d = 3, 16, 11, 128
    s0, mask, *w = _data(rng, b=c * ni, n=n)
    single = sgr_reason(s0, mask, *w, True)

    mesh = pmesh.make_mesh(devices=jax.devices()[:8])
    pallas.reset_dispatch()
    with pallas.force_interpret(), pallas.shard_ctx(mesh):
        sharded = sgr_reason_auto(s0, mask, *w, cap_rows=c)
    assert pallas.dispatch_counts().get("sgr_fused_sharded") == 1
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(single), atol=1e-5
    )


def test_sgraf_model_routes_sgr_kernel(rng):
    """SGRAF-SGR with sim_bf16: the model's similarity dispatches the fused
    SGR kernel and agrees with the XLA path (bf16 tolerance)."""
    import jax.numpy as jnp

    from itrx.models import get_model
    from itrx.ops import pallas

    cfg = dict(
        name="SGRAF", vocab_size=90, embed_size=128, word_dim=32,
        sim_dim=128, bi_gru=True, no_imgnorm=False, no_txtnorm=False,
        module_name="SGR", sgr_step=2, margin=0.2, max_violation=True,
        sim_bf16=True, sgraf_dropout=0.0, cap_chunk=8,
    )
    model = get_model(cfg)
    b, r, l = 6, 8, 16
    batch = {
        "images": jnp.asarray(rng.standard_normal((b, r, 128)).astype(np.float32)),
        "cap_ids": jnp.asarray(rng.integers(0, 90, (b, l)).astype(np.int32)),
        "cap_mask": jnp.asarray(
            (np.arange(l)[None] < rng.integers(4, l, (b,))[:, None]).astype(np.float32)
        ),
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, train=False,
    )
    e = model.apply(variables, batch, train=False, method="embed")

    want = np.asarray(model.apply(
        variables, e["img"], e["cap"], e["cap_mask"],
        train=False, method="similarity",
    ))
    pallas.reset_dispatch()
    with pallas.force_interpret():
        got = np.asarray(model.apply(
            variables, e["img"], e["cap"], e["cap_mask"],
            train=False, method="similarity",
        ))
    # eval routes the mega-fused kernel (alignment + SGR + node 0 in one
    # grid, itrx/ops/pallas/sgraf_eval.py); sgr_fused remains the train path
    assert pallas.dispatch_counts().get("sgraf_eval_fused", 0) >= 1
    np.testing.assert_allclose(got, want, atol=2e-2)


def test_sgraf_eval_bf16_path_routes_sgr_kernel(rng):
    """Regression: the EVAL bf16 path (eval_bf16 casts embeddings to bf16 in
    the engine's sim_fn; the model itself has sim_bf16 UNSET, and the caption
    mask stays fp32) must still dispatch both fused kernels.  An fp32 mask
    multiplied into the bf16 caption stack used to promote cap_ave → cap_glo
    → sim_emb back to fp32, silently failing the SGR kernel's bf16 gate so
    the whole graph-reasoning chain ran as fp32 XLA fusions (~70% of the
    SGRAF eval tile)."""
    import jax.numpy as jnp

    from itrx.models import get_model
    from itrx.ops import pallas

    cfg = dict(
        name="SGRAF", vocab_size=90, embed_size=128, word_dim=32,
        sim_dim=128, bi_gru=True, no_imgnorm=False, no_txtnorm=False,
        module_name="SGR", sgr_step=2, margin=0.2, max_violation=True,
        sgraf_dropout=0.0, cap_chunk=8,  # note: no sim_bf16
    )
    model = get_model(cfg)
    b, r, l = 6, 8, 16
    batch = {
        "images": jnp.asarray(rng.standard_normal((b, r, 128)).astype(np.float32)),
        "cap_ids": jnp.asarray(rng.integers(0, 90, (b, l)).astype(np.int32)),
        "cap_mask": jnp.asarray(
            (np.arange(l)[None] < rng.integers(4, l, (b,))[:, None]).astype(np.float32)
        ),
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, train=False,
    )
    e = model.apply(variables, batch, train=False, method="embed")
    want = np.asarray(model.apply(
        variables, e["img"], e["cap"], e["cap_mask"],
        train=False, method="similarity",
    ))

    # exactly what engine._sim_fn_for + the eval_bf16 cast hand the model
    img = e["img"].astype(jnp.bfloat16)
    cap = e["cap"].astype(jnp.bfloat16)
    mask = e["cap_mask"].astype(jnp.float32)
    pallas.reset_dispatch()
    with pallas.force_interpret():
        got = np.asarray(model.apply(
            variables, img, cap, mask, train=False, method="similarity",
        ))
    counts = pallas.dispatch_counts()
    # the eval mega-kernel subsumes both sgraf_align and sgr_fused; if the
    # mask promotion regressed, sim_emb would flip to fp32 and neither the
    # mega-kernel nor the two-kernel path would dispatch
    assert counts.get("sgraf_eval_fused", 0) >= 1, counts
    np.testing.assert_allclose(got, want, atol=3e-2)

"""Fused SGRAF-SGR eval mega-kernel (alignment + reasoning + node-0) vs the
XLA/two-kernel paths — interpret mode on CPU, incl. the 8-device mesh
routing.

The kernel is eval-only (no VJP): itrx/ops/pallas/sgraf_eval.py."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from itrx.models.sgraf import EncoderSimilarity
from itrx.ops import pallas as pk
from itrx.ops.pallas.sgraf_eval import sgraf_eval_score


def _data(rng, ni=6, nc=13, r=12, l=16, d=256, dtype=jnp.float32):
    img = jnp.asarray(rng.standard_normal((ni, r, d)).astype(np.float32))
    cap = jnp.asarray(rng.standard_normal((nc, l, d)).astype(np.float32))
    lens = rng.integers(3, l + 1, nc)
    mask = jnp.asarray((np.arange(l)[None] < lens[:, None]).astype(np.float32))
    return img.astype(dtype), cap.astype(dtype), mask


def _model_and_vars(rng, d=256, cap_chunk=8, sgr_step=3):
    img, cap, mask = _data(rng, d=d)
    m = EncoderSimilarity(
        embed_size=d, sim_dim=256, module_name="SGR", sgr_step=sgr_step,
        cap_chunk=cap_chunk,
    )
    v = m.init({"params": jax.random.PRNGKey(0)}, img, cap, mask, train=False)
    return m, v


def test_eval_kernel_matches_xla_path_fp32(rng):
    """fp32 interpret run of the mega-kernel equals the XLA eval path to
    float tolerance (same math, different op order)."""
    m, v = _model_and_vars(rng)
    img, cap, mask = _data(rng, ni=5, nc=11)
    want = m.apply(v, img, cap, mask, train=False)
    pk.reset_dispatch()
    with pk.force_interpret():
        got = m.apply(v, img.astype(jnp.bfloat16).astype(jnp.float32),
                      cap, mask, train=False)
    # fp32 inputs do not pass the bf16 gate: the XLA path must have run
    assert pk.dispatch_counts().get("sgraf_eval_fused", 0) == 0
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_eval_kernel_matches_xla_path_bf16(rng):
    """bf16 eval (the production eval_bf16 routing) dispatches the fused
    eval kernel and matches the XLA bf16 path within bf16 drift."""
    m, v = _model_and_vars(rng)
    img, cap, mask = _data(rng, ni=7, nc=13, dtype=jnp.bfloat16)
    ref = m.apply(v, img, cap, mask, train=False)  # XLA (no routing on CPU)
    pk.reset_dispatch()
    with pk.force_interpret():
        got = m.apply(v, img, cap, mask, train=False)
    assert pk.dispatch_counts().get("sgraf_eval_fused", 0) >= 1
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=2e-3)


def test_eval_kernel_train_path_untouched(rng):
    """train=True must keep the two-kernel (VJP-capable) routing."""
    m, v = _model_and_vars(rng)
    img, cap, mask = _data(rng, dtype=jnp.bfloat16)
    pk.reset_dispatch()
    with pk.force_interpret():
        m.apply(v, img, cap, mask, train=True,
                rngs={"dropout": jax.random.PRNGKey(2)},
                mutable=["batch_stats"])
    counts = pk.dispatch_counts()
    assert counts.get("sgraf_eval_fused", 0) == 0
    assert counts.get("sgraf_align", 0) >= 1
    assert counts.get("sgr_fused", 0) >= 1


def test_eval_kernel_node0_trim_exact(rng):
    """The q/k fold (edge = S (Wq Wk^T) S^T + key-side bias, per-row
    constants dropped by softmax), the split node set, the node-0-trimmed
    last step, the in-kernel global node, and the sim_eval_w epilogue must
    together equal the naive reference: full q/k projections on the
    concatenated node tensor, FULL last step, slice node 0, Linear +
    sigmoid — directly against the raw kernel, fp32."""
    d, s, steps = 256, 256, 3
    ni, ncap = 4, 9
    img, cap, mask = _data(rng, ni=ni, nc=ncap, l=16, d=d)
    w = jnp.asarray((rng.standard_normal((d, s)) * 0.05).astype(np.float32))
    b = jnp.asarray((rng.standard_normal(s) * 0.01).astype(np.float32))
    gloc = jnp.asarray(rng.standard_normal((ncap, d)).astype(np.float32))
    imgglo = jnp.asarray(rng.standard_normal((ni, d)).astype(np.float32))
    gw = jnp.asarray((rng.standard_normal((d, s)) * 0.05).astype(np.float32))
    gb = jnp.asarray((rng.standard_normal(s) * 0.01).astype(np.float32))
    wq = jnp.asarray((rng.standard_normal((steps, s, s)) * 0.05).astype(np.float32))
    bq = jnp.asarray((rng.standard_normal((steps, s)) * 0.01).astype(np.float32))
    wk = jnp.asarray((rng.standard_normal((steps, s, s)) * 0.05).astype(np.float32))
    bk = jnp.asarray((rng.standard_normal((steps, s)) * 0.01).astype(np.float32))
    wg = jnp.asarray((rng.standard_normal((steps, s, s)) * 0.05).astype(np.float32))
    bg = jnp.asarray((rng.standard_normal((steps, s)) * 0.01).astype(np.float32))
    ew = jnp.asarray((rng.standard_normal((s, 1)) * 0.05).astype(np.float32))
    eb = jnp.asarray((rng.standard_normal(1) * 0.01).astype(np.float32))

    got = sgraf_eval_score(cap, mask, img, w, b, gloc, imgglo, gw, gb,
                           wq, bq, wk, bk, wg, bg, ew, eb, interpret=True)

    # reference: alignment chain + FULL GraphReasoning steps, slice node 0
    from itrx.ops.norms import l2norm
    from tests.test_sgraf_align import _ref_chain

    sim_loc = _ref_chain(cap, mask, img, w, b)  # (C, Ni, L, S)
    nc, niw, l, _ = sim_loc.shape
    glo = l2norm(
        (imgglo[None, :, :] - gloc[:, None, :]) ** 2 @ gw + gb, axis=-1
    )  # (C, Ni, S)
    nodes = jnp.concatenate(
        [glo[:, :, None, :], sim_loc], axis=2
    ).reshape(nc * niw, l + 1, s)
    nmask = jnp.concatenate(
        [jnp.ones((nc, 1), jnp.float32), mask], axis=1
    )
    nmask = jnp.broadcast_to(nmask[:, None, :], (nc, niw, l + 1)).reshape(
        nc * niw, l + 1
    )
    for i in range(steps):
        q = nodes @ wq[i] + bq[i]
        k = nodes @ wk[i] + bk[i]
        e = jnp.einsum("bnd,bmd->bnm", q, k)
        e = jnp.where(nmask[:, None, :] > 0, e, -1e18)
        a = jax.nn.softmax(e, axis=-1)
        nodes = jax.nn.relu(jnp.einsum("bnm,bmd->bnd", a, nodes) @ wg[i] + bg[i])
    want = jax.nn.sigmoid(nodes[:, 0, :] @ ew + eb)[:, 0].reshape(nc, niw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=1e-4)


def test_eval_saf_kernel_matches_xla_path_bf16(rng):
    """SAF variant: fused eval (BN affine folded into the attention Linear)
    dispatches and matches the XLA eval path within bf16 drift."""
    img, cap, mask = _data(rng, ni=6, nc=11)
    m = EncoderSimilarity(
        embed_size=256, sim_dim=256, module_name="SAF", cap_chunk=8
    )
    v = m.init({"params": jax.random.PRNGKey(0)}, img, cap, mask, train=False)
    # perturb the BN running stats away from the (0, 1) init so the fold
    # actually has something to fold
    v = jax.tree_util.tree_map(lambda x: x, v)
    bs = v["batch_stats"]["scorer"]["SAF"]["bn"]["BatchNorm_0"]
    bs["mean"] = jnp.asarray([0.37])
    bs["var"] = jnp.asarray([2.1])
    imgb, capb = img.astype(jnp.bfloat16), cap.astype(jnp.bfloat16)
    ref = m.apply(v, imgb, capb, mask, train=False)
    pk.reset_dispatch()
    with pk.force_interpret():
        got = m.apply(v, imgb, capb, mask, train=False)
    assert pk.dispatch_counts().get("sgraf_eval_saf_fused", 0) >= 1
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-3, rtol=2e-2)


def test_eval_saf_train_path_untouched(rng):
    """SAF train=True keeps the per-caption-BN XLA path (the fused kernel
    is eval-only: train-mode SAF BN needs batch stats + mutation)."""
    img, cap, mask = _data(rng, dtype=jnp.bfloat16)
    m = EncoderSimilarity(
        embed_size=256, sim_dim=256, module_name="SAF", cap_chunk=8
    )
    v = m.init({"params": jax.random.PRNGKey(0)}, img, cap, mask, train=False)
    pk.reset_dispatch()
    with pk.force_interpret():
        m.apply(v, img, cap, mask, train=True,
                rngs={"dropout": jax.random.PRNGKey(2)},
                mutable=["batch_stats"])
    assert pk.dispatch_counts().get("sgraf_eval_saf_fused", 0) == 0


def test_eval_kernel_sharded_matches_direct(rng):
    """8-device mesh: the shard_mapped eval kernel (images over 'dp')
    produces the same scores as the direct single-device call.

    Tolerance is bf16-drift, not exact: the direct (no-mesh) model call now
    rides the whole-set path (_fused_eval_whole — different caption
    super-chunk padding, hence different kernel blocking) while the mesh
    call stays per-chunk.  Exact sharded-vs-direct parity at identical
    blocking is asserted at raw kernel level in
    test_raw_eval_kernel_sharded_exact."""
    from itrx.parallel import mesh as pmesh

    m, v = _model_and_vars(rng)
    img, cap, mask = _data(rng, ni=11, nc=13, dtype=jnp.bfloat16)

    with pk.force_interpret():
        direct = m.apply(v, img, cap, mask, train=False)
        pk.reset_dispatch()
        mesh = pmesh.make_mesh(devices=jax.devices()[:8])
        with pk.shard_ctx(mesh):
            sharded = m.apply(v, img, cap, mask, train=False)
    assert pk.dispatch_counts().get("sgraf_eval_fused_sharded", 0) >= 1
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(direct),
                               atol=2e-4, rtol=2e-3)


def test_eval_saf_kernel_sharded_matches_direct(rng):
    """SAF variant on the 8-device mesh: the shard_map branch has its own
    argument reordering and image/glo padding (ni=11 over 8 devices pads to
    16) — it must equal the direct single-device call."""
    from itrx.parallel import mesh as pmesh

    img, cap, mask = _data(rng, ni=11, nc=13, dtype=jnp.bfloat16)
    m = EncoderSimilarity(
        embed_size=256, sim_dim=256, module_name="SAF", cap_chunk=8
    )
    v = m.init({"params": jax.random.PRNGKey(0)}, img, cap, mask, train=False)
    bs = v["batch_stats"]["scorer"]["SAF"]["bn"]["BatchNorm_0"]
    bs["mean"] = jnp.asarray([0.37])
    bs["var"] = jnp.asarray([2.1])

    with pk.force_interpret():
        direct = m.apply(v, img, cap, mask, train=False)
        pk.reset_dispatch()
        mesh = pmesh.make_mesh(devices=jax.devices()[:8])
        with pk.shard_ctx(mesh):
            sharded = m.apply(v, img, cap, mask, train=False)
    assert pk.dispatch_counts().get("sgraf_eval_saf_fused_sharded", 0) >= 1
    # bf16-drift tolerance: direct rides the whole-set path (see the SGR
    # sharded test above); exact parity is at raw kernel level below
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(direct),
                               atol=2e-4, rtol=2e-3)


def _raw_kernel_inputs(rng, ni=11, nc=13, l=16, d=256, s=256, steps=3):
    img, cap, mask = _data(rng, ni=ni, nc=nc, l=l, d=d, dtype=jnp.bfloat16)
    f = lambda *sh: jnp.asarray(
        (rng.standard_normal(sh) * 0.05).astype(np.float32)
    )
    w, b = f(d, s), f(s)
    gloc, imgglo = f(nc, d), f(ni, d)
    gw, gb = f(d, s), f(s)
    ew, eb = f(s, 1), f(1)
    wq, bq = f(steps, s, s), f(steps, s)
    wk, bk = f(steps, s, s), f(steps, s)
    wg, bg = f(steps, s, s), f(steps, s)
    return (img, cap, mask, w, b, gloc, imgglo, gw, gb,
            (wq, bq, wk, bk, wg, bg), ew, eb)


def test_raw_eval_kernel_sharded_exact(rng):
    """Raw-level sharded-vs-direct exactness: the shard_map wrapper's image
    padding (ni=11 -> 16 over 8 devices) and argument plumbing must not
    change the numbers at all — same kernel, same caption blocking, 2e-6."""
    from itrx.parallel import mesh as pmesh
    from itrx.ops.pallas.sgraf_eval import sgraf_eval_auto

    (img, cap, mask, w, b, gloc, imgglo, gw, gb, sgr_p, ew, eb) = (
        _raw_kernel_inputs(rng)
    )
    with pk.force_interpret():
        direct = sgraf_eval_auto(cap, mask, img, gloc, imgglo, w, b, gw, gb,
                                 *sgr_p, ew, eb)
        pk.reset_dispatch()
        mesh = pmesh.make_mesh(devices=jax.devices()[:8])
        with pk.shard_ctx(mesh):
            sharded = sgraf_eval_auto(cap, mask, img, gloc, imgglo, w, b,
                                      gw, gb, *sgr_p, ew, eb)
    assert pk.dispatch_counts().get("sgraf_eval_fused_sharded", 0) >= 1
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(direct),
                               atol=2e-6, rtol=2e-6)


def test_raw_eval_saf_kernel_sharded_exact(rng):
    """SAF raw-level analog of test_raw_eval_kernel_sharded_exact."""
    from itrx.parallel import mesh as pmesh
    from itrx.ops.pallas.sgraf_eval import sgraf_eval_saf_auto

    (img, cap, mask, w, b, gloc, imgglo, gw, gb, _, ew, eb) = (
        _raw_kernel_inputs(rng)
    )
    awf = jnp.asarray((rng.standard_normal((1, 256)) * 0.05).astype(np.float32))
    abf = jnp.asarray((rng.standard_normal((1, 256)) * 0.05).astype(np.float32))
    with pk.force_interpret():
        direct = sgraf_eval_saf_auto(cap, mask, img, gloc, imgglo, w, b,
                                     gw, gb, awf, abf, ew, eb)
        pk.reset_dispatch()
        mesh = pmesh.make_mesh(devices=jax.devices()[:8])
        with pk.shard_ctx(mesh):
            sharded = sgraf_eval_saf_auto(cap, mask, img, gloc, imgglo, w, b,
                                          gw, gb, awf, abf, ew, eb)
    assert pk.dispatch_counts().get("sgraf_eval_saf_fused_sharded", 0) >= 1
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(direct),
                               atol=2e-6, rtol=2e-6)


def test_whole_set_path_pads_ragged_word_axis(rng):
    """The whole-set fused eval path (EncoderSimilarity -> _fused_eval_whole,
    one lax.scan'd kernel grid per caption super-chunk instead of the
    per-chunk Python loop) pads L to %8 itself — ragged word axes that the
    per-chunk gate used to send to XLA now ride the kernel — and pads the
    caption count to the super-chunk size.  Must match the XLA path."""
    img, cap, mask = _data(rng, ni=5, nc=11, l=14, dtype=jnp.bfloat16)
    m = EncoderSimilarity(embed_size=256, sim_dim=256, module_name="SGR",
                          sgr_step=2, cap_chunk=8)
    v = m.init({"params": jax.random.PRNGKey(0)}, img, cap, mask, train=False)
    ref = m.apply(v, img, cap, mask, train=False)  # XLA (no routing on CPU)
    pk.reset_dispatch()
    with pk.force_interpret():
        got = m.apply(v, img, cap, mask, train=False)
    assert pk.dispatch_counts().get("sgraf_eval_fused", 0) >= 1
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=2e-3)


def test_engine_tile_free_sgraf(rng):
    """cal_sims goes tile-free for SGRAF (SGRAF.fused_eval_active mirrors
    the model's whole-set gate): bf16 sims from the single-call path must
    match the fp32 XLA tiled path within bf16 drift, and the fused eval
    kernel must have dispatched."""
    from itrx.eval.engine import cal_sims
    from itrx.models import get_model

    cfg = dict(
        name="SGRAF", vocab_size=90, embed_size=128, word_dim=32,
        sim_dim=128, bi_gru=True, no_imgnorm=False, no_txtnorm=False,
        module_name="SGR", sgr_step=2, margin=0.2, max_violation=True,
        sgraf_dropout=0.0, cap_chunk=8,
    )
    model = get_model(cfg)
    ni, l = 14, 18
    nc = 70  # >= 64 so the length-bucketing engine path runs
    batch = {
        "images": jnp.asarray(rng.standard_normal((4, 8, 128)).astype(np.float32)),
        "cap_ids": jnp.asarray(rng.integers(0, 90, (4, l)).astype(np.int32)),
        "cap_mask": jnp.ones((4, l), jnp.float32),
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, train=False,
    )
    assert model.fused_eval_active("bfloat16") is False  # CPU, no interpret
    img = jnp.asarray(rng.standard_normal((ni, 8, 128)).astype(np.float32))
    cap = jnp.asarray(rng.standard_normal((nc, l, 128)).astype(np.float32))
    lens = rng.integers(4, l + 1, nc)
    mask = jnp.asarray((np.arange(l)[None] < lens[:, None]).astype(np.float32))
    e = model.apply(
        variables,
        {"images": img, "cap_ids": jnp.ones((ni, l), jnp.int32),
         "cap_mask": jnp.ones((ni, l), jnp.float32)},
        train=False, method="embed",
    )
    cap_e = model.apply(
        variables,
        {"images": jnp.asarray(
            rng.standard_normal((nc, 8, 128)).astype(np.float32)),
         "cap_ids": jnp.asarray(rng.integers(1, 90, (nc, l)).astype(np.int32)),
         "cap_mask": mask},
        train=False, method="embed",
    )
    img_embs, cap_embs = e["img"], cap_e["cap"]

    want = cal_sims(model, variables, img_embs, cap_embs, mask,
                    verbose=False)
    pk.reset_dispatch()
    with pk.force_interpret():
        assert model.fused_eval_active("bfloat16") is True
        got = cal_sims(model, variables, img_embs, cap_embs, mask,
                       verbose=False, compute_dtype="bfloat16")
    assert pk.dispatch_counts().get("sgraf_eval_fused", 0) >= 1
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-2, rtol=3e-2)

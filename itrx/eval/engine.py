"""Device-resident evaluation engine.

Reference: itr/metricmodule/evaluation.py — encode_data (:75-121), cal_sims
(:124-153), evalrank_single (:262-335), evalrank_ensemble (:338-435).

TPU redesign (the north-star workload, SURVEY.md §3.3): per-batch jitted
encoding with static shapes, the full (N_img, N_cap) similarity matrix
computed in device-resident tiles (no host round-trips per shard like the
reference's numpy->cuda block loop), then rank metrics on device.

Reference bug #3 (SURVEY.md §2.11) — passing the full cap_lens array to every
caption shard so shards j>0 use wrong lengths — is fixed by construction:
each tile carries its own caption mask.
"""

from __future__ import annotations

import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..models import get_model
from ..utils.checkpoint import load_checkpoint
from . import metrics


def _pad_to(x, n, axis=0):
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.lru_cache(maxsize=64)
def _embed_fn_for(model, mesh=None, encode_dtype=None):
    """Per-model jitted embed, cached so repeated eval calls don't retrace.

    With a mesh, the batch arrives 'dp'-sharded and the Pallas routing
    context is active, so the fused kernels run shard_mapped per chip.

    `encode_dtype='bfloat16'` (the `encode_bf16` config flag) runs the embed
    FORWARD itself in bf16 — params and float batch fields cast at the
    boundary with the same discipline as make_train_step (loop.py:43-65):
    box geometry stays fp32 (thin boxes collapse under bf16 quantization),
    and output masks are restored to fp32 for the engine's bucket/length
    arithmetic.  Encode dominates end-to-end eval for the BERT/GCN methods;
    a 12-layer fp32 BERT over 25k captions is compute-bound on chip."""
    from ..ops.pallas import shard_ctx

    cdt = jnp.dtype(encode_dtype) if encode_dtype is not None else None
    _KEEP_F32 = ("boxes", "imgs_wh")

    def _cast(tree):
        return jax.tree.map(
            lambda x: x.astype(cdt)
            if hasattr(x, "dtype") and x.dtype == jnp.float32
            else x,
            tree,
        )

    @jax.jit
    def f(variables, batch):
        if cdt is not None:
            kept = {k: batch[k] for k in _KEEP_F32 if k in batch}
            batch = dict(_cast({k: v for k, v in batch.items() if k not in kept}))
            batch.update(kept)
            # cast only params — BatchNorm running stats (batch_stats: VSRN
            # GCN, CAMERA AGSA) stay fp32, matching make_train_step's
            # params-only discipline (loop.py); eval-mode BN must not
            # normalize with quantized mean/var
            variables = {
                k: _cast(v) if k == "params" else v
                for k, v in variables.items()
            }
        with shard_ctx(mesh):
            out = model.apply(variables, batch, train=False, method="embed")
        if cdt is not None:
            # masks travel fp32 downstream (bucket length sums, tile pads)
            out = {
                k: v.astype(jnp.float32) if "mask" in k and v.dtype == cdt
                else v
                for k, v in out.items()
            }
        return out

    return f


@functools.lru_cache(maxsize=64)
def _fused_bucket_eval_for(model, bounds, cdt_name=None):
    """ONE jitted call scoring every length bucket + scattering the columns.

    The production f30k-1K eval spends more wall time in host/relay dispatch
    gaps than on the device (profiled 2026-08-19: 164 ms device-lane vs
    0.58 s wall — the per-bucket kernel dispatches, scatters and the rank
    call each pay the relay round-trip).  When the fused whole-grid kernels
    are active there is no tiling, so the entire bucketed scoring collapses
    into one XLA program: per bucket, gather the caption rows, trim the word
    axis to the bucket bound (static `bounds`), run the model's fused
    similarity, scatter the columns — a single dispatch regardless of
    bucket count.  Single-device only (under a mesh the caption tiles are
    the dp parallelism and the tiled path is kept).
    """
    from ..ops.pallas import shard_ctx

    cdt = jnp.dtype(cdt_name) if cdt_name is not None else None

    @jax.jit
    def f(variables, img, cap_embs, cap_mask, *idxs):
        if cdt is not None:
            img = img.astype(cdt)
            cap_embs = cap_embs.astype(cdt)
        sims = jnp.zeros((img.shape[0], cap_embs.shape[0]), jnp.float32)
        with shard_ctx(None):
            for b, idx in zip(bounds, idxs):
                caps_b = cap_embs[idx, :b]
                mask_b = cap_mask[idx, :b]
                s = model.apply(
                    variables, img, caps_b, mask_b,
                    train=False, method="similarity",
                )
                sims = sims.at[:, idx].set(s)
        return sims

    return f


@functools.lru_cache(maxsize=64)
def _sim_fn_for(model, mesh=None):
    """Per-model jitted similarity; variables travel as an argument so one
    trace serves every (tile, bucket, checkpoint) combination of a shape.

    The Pallas routing context is entered at trace time: with a mesh, the
    model's fused kernels dispatch through their shard_map wrappers."""
    from ..ops.pallas import shard_ctx

    @jax.jit
    def f(variables, img, cap, mask):
        with shard_ctx(mesh):
            return model.apply(
                variables, img, cap, mask, train=False, method="similarity"
            )

    return f


def encode_data(model, variables, dataset, batch_size: int,
                offload_threshold_bytes: int = 3 << 30, mesh=None,
                compute_dtype=None, encode_dtype=None):
    """Encode a full split; returns dict of stacked embeddings (+masks).

    Mirror of ref encode_data (evaluation.py:75-121).  Embeddings whose full
    stack exceeds `offload_threshold_bytes` (e.g. coco-testall token-level
    caption embeddings, ~6.6GB) are staged to host numpy instead of living on
    HBM; the similarity engine re-uploads them one length-bucket at a time.
    Smaller stacks stay device-resident.

    `compute_dtype='bfloat16'` casts the embedding stacks (not masks) right
    at encode time — the values are bit-identical to the cast `cal_sims`
    would apply per tile, but every byte the stack moves afterwards (HBM
    residency, host offload, re-upload) is halved.  The 3GiB offload default
    is sized so the bf16 coco-testall token stack (25,010 x L x 1024 ≈
    2.5GB) stays device-resident on a 16GB chip while the fp32 one (~5GB)
    offloads.

    With a mesh (and a dp-divisible batch size), each eval batch is sharded
    over 'dp' so encoding parallelizes across chips.

    `encode_dtype='bfloat16'` additionally runs the embed forward itself in
    bf16 (see _embed_fn_for) — the stacks then come back bf16 regardless of
    `compute_dtype`.
    """
    if mesh is not None and batch_size % mesh.shape.get("dp", 1) != 0:
        mesh = None
    edt = jnp.dtype(encode_dtype).name if encode_dtype is not None else None
    embed_fn = _embed_fn_for(model, mesh, edt)

    if edt == "bfloat16":
        # cast the float batch fields to bf16 on HOST before upload: the
        # production encode is transfer-bound (fp32 region features), and
        # the host cast is bit-identical to the cast _embed_fn_for would
        # apply on device (see _host_cast) — half the bytes over the wire.
        # Box geometry stays fp32 (same _KEEP_F32 rule as the embed fn).
        import ml_dtypes

        def _host_cast_batch(b):
            return {
                k: v.astype(ml_dtypes.bfloat16)
                if (
                    k not in ("boxes", "imgs_wh")
                    and isinstance(v, np.ndarray)
                    and v.dtype == np.float32
                )
                else v
                for k, v in b.items()
            }

    else:

        def _host_cast_batch(b):
            return b
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        batch_sh = NamedSharding(mesh, P("dp"))
        rep = NamedSharding(mesh, P())
        variables = jax.tree.map(
            lambda x: jax.device_put(x, rep), variables
        )

        def place(v):
            return jax.device_put(jnp.asarray(v), batch_sh)

    else:

        def place(v):
            return jnp.asarray(v)

    cdt = jnp.dtype(compute_dtype) if compute_dtype is not None else None

    def _cast_out(e):
        if cdt is None:
            return e
        return {
            k: v.astype(cdt)
            if "mask" not in k and v.dtype == jnp.float32 else v
            for k, v in e.items()
        }

    # Double-buffered encode: a producer thread assembles batch k+1 on host
    # and dispatches its device upload while the device embeds batch k (the
    # train-side prefetch, loop.py, is the template; `place` keeps the mesh
    # device_put path).  Encode is the longest phase of the production eval
    # bench — the upload latency hides entirely under the embed.
    import threading
    from queue import Empty, Full, Queue

    q: Queue = Queue(maxsize=2)
    _END = object()
    stop = threading.Event()

    def _put(item):
        # bounded put that aborts when the consumer has stopped — otherwise
        # a consumer exception with a full queue would park this thread on
        # q.put forever, pinning the staged device buffers for the process
        # lifetime (repeated evals in a long run would accumulate them)
        while not stop.is_set():
            try:
                q.put(item, timeout=0.5)
                return
            except Full:
                continue

    def _producer():
        try:
            for batch in dataset.eval_batches(batch_size):
                if stop.is_set():
                    return
                nv = batch.pop("n_valid")
                batch = _host_cast_batch(batch)
                _put(({k: place(v) for k, v in batch.items()}, nv))
            _put(_END)
        except BaseException as e:  # noqa: BLE001 - relayed to the consumer
            _put(e)

    threading.Thread(target=_producer, daemon=True).start()
    outs = []
    try:
        while True:
            item = q.get()
            if item is _END:
                break
            if isinstance(item, BaseException):
                raise item
            placed, n_valid = item
            e = embed_fn(variables, placed)
            outs.append((_cast_out(e), n_valid))
    finally:
        stop.set()
        try:  # release a producer blocked on a full queue
            while True:
                q.get_nowait()
        except Empty:
            pass

    keys = outs[0][0].keys()
    result = {}
    for k in keys:
        itemsize = outs[0][0][k].dtype.itemsize
        per_item = int(np.prod(outs[0][0][k].shape[1:])) * itemsize
        total = per_item * len(dataset)
        if total > offload_threshold_bytes:
            parts = [np.asarray(e[k][: int(nv)]) for e, nv in outs]
            result[k] = np.concatenate(parts, axis=0)
        else:
            parts = [e[k][: int(nv)] for e, nv in outs]
            result[k] = jnp.concatenate(parts, axis=0)
    return result


def cal_sims(
    model,
    variables,
    img_embs,
    cap_embs,
    cap_mask=None,
    img_tile: int = 256,
    cap_tile: int = 1024,
    verbose: bool = True,
    mesh=None,
    length_buckets: int = 4,
    compute_dtype=None,
    budgets: dict | None = None,
):
    """See _cal_sims_tiled.  For token-level caption embeddings the word axis
    is statically padded (~3x the mean caption length on f30k/coco), and the
    cross-attention similarity cost is linear in it — so captions are first
    sorted into up to `length_buckets` buckets, each trimmed to its own
    (multiple-of-8) word length, and the result columns are scattered back.
    Cuts the VPU-bound elementwise work on the attention tensor by ~2-3x.
    """
    budgets = budgets or {}
    if (
        cap_mask is None
        or length_buckets <= 1
        or cap_embs.ndim != 3
        or cap_embs.shape[0] < 64
    ):
        return _cal_sims_tiled(
            model, variables, img_embs, cap_embs, cap_mask,
            img_tile, cap_tile, verbose, mesh,
            slab_bytes=budgets.get("slab_bytes"),
            compute_dtype=compute_dtype,
            fused_grid_bytes=budgets.get("fused_grid_bytes"),
        )

    t0 = time.time()
    lengths = np.asarray(jnp.sum(cap_mask, axis=1)).astype(np.int64)
    order = np.argsort(lengths, kind="stable")
    nc = cap_embs.shape[0]
    ni = img_embs.shape[0]
    # bucket boundaries at quantiles, lengths rounded up to multiples of 8
    bounds = sorted(
        {
            int(-(-int(lengths[order[min(int(q * nc), nc - 1)]]) // 8) * 8)
            for q in (0.25, 0.5, 0.75, 1.0)
        }
    )[: length_buckets]
    bounds[-1] = max(bounds[-1], int(-(-lengths.max() // 8) * 8))
    bounds[-1] = min(bounds[-1], cap_embs.shape[1])

    # Assembly strategy scales with the actual problem: on the common case
    # (device-resident embeddings, small output matrix — e.g. f30k-1K is
    # ~20MB) the bucket columns are scattered on device with no host round
    # trip.  Only when the embeddings were host-staged (coco-testall token
    # stacks) or the output is large does assembly fall back to host numpy,
    # where a device scatter would hold a second full (Ni, Nc) matrix plus
    # bucket copies live at once.
    host_staged = isinstance(cap_embs, np.ndarray)
    assembly_cap = budgets.get("device_assembly_bytes") or (1 << 30)
    on_device = (not host_staged) and (ni * nc * 4 * 2 < assembly_cap)
    slab_bytes = budgets.get("slab_bytes") or (
        (512 << 20) if host_staged else (2 << 30)
    )
    sims = jnp.zeros((ni, nc), jnp.float32) if on_device else np.zeros(
        (ni, nc), np.float32
    )
    prev_bound = 0
    buckets = []
    for b in bounds:
        in_bucket = order[(lengths[order] > prev_bound) & (lengths[order] <= b)]
        prev_bound = b
        if len(in_bucket):
            buckets.append((in_bucket, b))

    # Single-dispatch fast path: with the fused whole-grid kernels active
    # (single device, device-resident embeddings, bf16), every bucket is one
    # untiled kernel call — fold them all, plus the column scatters, into
    # ONE jitted call (see _fused_bucket_eval_for).  Wall time then tracks
    # device time instead of per-dispatch relay latency.
    fused_active = getattr(model, "fused_eval_active", None)
    if (
        not host_staged
        and on_device
        and mesh is None
        and fused_active is not None
        and cap_embs.ndim == 3
    ):
        from ..ops.pallas import shard_ctx

        with shard_ctx(None):
            fused_on = fused_active(compute_dtype)
        fused_bytes = _fused_grid_bytes(
            model, img_embs.shape[0], nc, cap_embs.shape[1],
            compute_dtype, cap_embs.ndim,
        )
        if fused_on and fused_bytes < (
            budgets.get("fused_grid_bytes") or (6 << 30)
        ):
            f = _fused_bucket_eval_for(
                model,
                tuple(b for _, b in buckets),
                jnp.dtype(compute_dtype).name if compute_dtype else None,
            )
            sims = f(
                variables, jnp.asarray(img_embs), cap_embs, cap_mask,
                *(jnp.asarray(ib) for ib, _ in buckets),
            )
            np.asarray(sims[:1, :1])  # barrier (see below)
            if verbose:
                print(
                    "Calculate similarity matrix elapses: {:.3f}s".format(
                        time.time() - t0
                    )
                )
            return sims

    if host_staged:
        # host-staged embeddings: upload just each bucket (cast to the
        # compute dtype on host first — half the bytes over the wire).
        # The next bucket's host cast + upload dispatch run in a worker
        # thread while the device scores the current one: the coco-testall
        # fold is transfer-bound under slow interconnects, so the overlap
        # hides the per-bucket compute entirely.
        from concurrent.futures import ThreadPoolExecutor

        cap_mask_np = np.asarray(cap_mask)
        pool = ThreadPoolExecutor(1)

        def _stage(ib, bnd):
            return (
                jnp.asarray(_host_cast(cap_embs[ib, :bnd], compute_dtype)),
                jnp.asarray(cap_mask_np[ib, :bnd]),
            )

        fut = pool.submit(_stage, *buckets[0])

    for bi, (in_bucket, b) in enumerate(buckets):
        if host_staged:
            caps_b, mask_b = fut.result()
            if bi + 1 < len(buckets):
                fut = pool.submit(_stage, *buckets[bi + 1])
        else:
            idx = jnp.asarray(in_bucket)
            caps_b = cap_embs[:, :b][idx]
            mask_b = cap_mask[:, :b][idx]
        s = _cal_sims_tiled(
            model, variables, img_embs, caps_b, mask_b,
            img_tile, cap_tile, verbose=False, mesh=mesh,
            slab_bytes=slab_bytes, compute_dtype=compute_dtype,
            fused_grid_bytes=budgets.get("fused_grid_bytes"),
        )
        if on_device:
            sims = sims.at[:, jnp.asarray(in_bucket)].set(s)
        else:
            sims[:, in_bucket] = np.asarray(s)
        del caps_b, mask_b, s
    if host_staged:
        pool.shutdown(wait=False)
    if on_device:
        # a tiny host transfer is the only real barrier under the axon
        # relay (block_until_ready does not synchronize there)
        np.asarray(sims[:1, :1])
    if verbose:
        print(
            "Calculate similarity matrix elapses: {:.3f}s".format(time.time() - t0)
        )
    return sims if on_device else jnp.asarray(sims)


def _fused_grid_bytes(model, ni, nc, l, compute_dtype, cap_ndim) -> int:
    """HBM bytes the fused whole-grid eval holds live: output matrix + one
    temp, plus (i2t only) the block-diagonal caption Gram the kernel
    materializes (xattn.py gram_bd, block_c=16) and the fp32 per-caption
    (L, L) Grams — the dominant term at coco-testall scale."""
    fused_bytes = ni * nc * 4 * 2
    if cap_ndim == 3 and getattr(model, "cross_attn", "") == "i2t":
        itemsize = 2 if (
            compute_dtype is not None
            and jnp.dtype(compute_dtype) == jnp.bfloat16
        ) else 4
        fused_bytes += nc * 16 * l * l * itemsize + nc * l * l * 4
    return fused_bytes


def _host_cast(x, compute_dtype):
    """Cast a host fp32 array to the eval compute dtype BEFORE upload.

    Bit-identical to the on-device cast `sim_fn` applies (ml_dtypes bfloat16
    rounds to nearest even, same as XLA's convert), but the host->device
    transfer moves half the bytes — the dominant cost of the host-staged
    coco-testall path under slow interconnects."""
    if (
        compute_dtype is not None
        and isinstance(x, np.ndarray)
        and x.dtype == np.float32
        and jnp.dtype(compute_dtype) == jnp.bfloat16
    ):
        import ml_dtypes

        return x.astype(ml_dtypes.bfloat16)
    return x


def _cal_sims_tiled(
    model,
    variables,
    img_embs,
    cap_embs,
    cap_mask=None,
    img_tile: int = 256,
    cap_tile: int = 1024,
    verbose: bool = True,
    mesh=None,
    slab_bytes: int | None = None,
    compute_dtype=None,
    fused_grid_bytes: int | None = None,
):
    """Full (N_img, N_cap) similarity matrix in device-resident tiles.

    compute_dtype='bfloat16' casts the embedding tiles before the similarity
    kernel (fp32 accumulation stays via preferred_element_type inside the
    sim functions): doubles MXU rate and halves the VPU elementwise cost of
    the cross-attention chain; scores come back fp32.

    Tiles are padded to static shapes so only one similarity kernel is
    compiled; the padded rows/cols are trimmed from the result.  With a
    `mesh`, each caption tile is sharded over the 'dp' axis (images and
    params replicated), so tiles span all chips and the matrix columns are
    computed in parallel over ICI.
    """
    ni, nc = img_embs.shape[0], cap_embs.shape[0]
    # when the model routes this dtype to a fused Pallas kernel, the raw
    # attention tensor never touches HBM — no slab budget applies and tiling
    # only adds dispatch/padding overhead, so the whole grid goes through in
    # one call (bounded only by the output matrix + embeddings in HBM)
    fused_active = getattr(model, "fused_eval_active", None)
    fused_bytes = _fused_grid_bytes(
        model, ni, nc,
        cap_embs.shape[1] if cap_embs.ndim == 3 else 0,
        compute_dtype, cap_embs.ndim,
    )
    from ..ops.pallas import shard_ctx

    with shard_ctx(mesh):
        # the routing context must be active for the decision too: under a
        # mesh pallas_ok() is True only inside shard_ctx (the model then
        # dispatches the kernels through their shard_map wrappers)
        fused_on = fused_active is not None and fused_active(compute_dtype)
    if (
        fused_on
        and not isinstance(cap_embs, np.ndarray)
        and fused_bytes < (fused_grid_bytes or (6 << 30))
    ):
        img_tile, cap_tile = ni, nc
    # budget the per-tile attention tensor for token-level similarities:
    # a (img_tile, cap_tile, R, L) fp32 slab (plus XLA temporaries) must
    # leave room for the resident embeddings on a 16GB chip.  The budget is
    # conservative (512MB) only when the caller host-staged the embeddings
    # (coco-testall scale); device-resident problems get a 2GB slab so the
    # common f30k-1K case keeps full-size tiles.
    elif cap_embs.ndim == 3 and getattr(img_embs, "ndim", 2) == 3:
        r = img_embs.shape[1]
        l = cap_embs.shape[1]
        if slab_bytes is None:
            slab_bytes = (512 << 20) if isinstance(cap_embs, np.ndarray) else (2 << 30)
        budget_elems = slab_bytes // 4
        max_pairs = max(budget_elems // max(r * l, 1), 1024)
        while img_tile * cap_tile > max_pairs and cap_tile > 128:
            cap_tile //= 2
        while img_tile * cap_tile > max_pairs and img_tile > 32:
            img_tile //= 2
    # balance tiles: round the tile size down so the last tile carries no
    # more than 8 rows of padding (cuts ~40% waste on ragged bucket sizes)
    img_tile = min(img_tile, ni)
    img_tile = -(-ni // (-(-ni // img_tile))) 
    img_tile = ((img_tile + 7) // 8) * 8
    cap_tile = min(cap_tile, nc)
    cap_tile = -(-nc // (-(-nc // cap_tile)))
    cap_tile = ((cap_tile + 7) // 8) * 8

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        ndp = mesh.shape["dp"]
        cap_sh = NamedSharding(mesh, P("dp"))
        rep = NamedSharding(mesh, P())
        variables = jax.tree.map(lambda x: jax.device_put(x, rep), variables)
        cap_tile = ((cap_tile + ndp - 1) // ndp) * ndp

        def place(img_t, cap_t, mask_t):
            return (
                jax.device_put(img_t, rep),
                jax.device_put(cap_t, cap_sh),
                None if mask_t is None else jax.device_put(mask_t, cap_sh),
            )

    else:

        def place(img_t, cap_t, mask_t):
            return img_t, cap_t, mask_t

    _sim = _sim_fn_for(model, mesh)
    cdt = jnp.dtype(compute_dtype) if compute_dtype is not None else None

    def sim_fn(img, cap, mask):
        if cdt is not None:
            img, cap = img.astype(cdt), cap.astype(cdt)
        return _sim(variables, img, cap, mask)

    img_embs = jnp.asarray(img_embs)
    t0 = time.time()
    n_it = -(-ni // img_tile)
    n_ct = -(-nc // cap_tile)
    rows = []
    for i in range(n_it):
        i0, i1 = i * img_tile, min((i + 1) * img_tile, ni)
        img_t = _pad_to(img_embs[i0:i1], img_tile)
        cols = []
        for j in range(n_ct):
            j0, j1 = j * cap_tile, min((j + 1) * cap_tile, nc)
            cap_t = _pad_to(
                jnp.asarray(_host_cast(cap_embs[j0:j1], compute_dtype))
                if isinstance(cap_embs, np.ndarray) else cap_embs[j0:j1],
                cap_tile,
            )
            if cap_mask is not None:
                mask_t = _pad_to(jnp.asarray(cap_mask[j0:j1]), cap_tile)
                # padded captions get one valid token to keep kernels finite
                mask_t = mask_t.at[j1 - j0 :, 0].set(1.0) if j1 - j0 < cap_tile else mask_t
            else:
                mask_t = None
            s = sim_fn(*place(img_t, cap_t, mask_t))
            cols.append(s[: i1 - i0, : j1 - j0])
        rows.append(jnp.concatenate(cols, axis=1))
    sims = jnp.concatenate(rows, axis=0)
    np.asarray(sims[:1, :1])  # real barrier (see cal_sims)
    if verbose:
        print(
            "Calculate similarity matrix elapses: {:.3f}s".format(time.time() - t0)
        )
    return sims



def _eval_budgets(config) -> dict:
    """HBM-budget knobs for the eval engine, config-overridable (round-2
    verdict item 9 — the defaults encode a 16GB v5e chip):

    - eval_slab_bytes: per-tile attention-tensor budget in _cal_sims_tiled
      (default 2GiB device-resident / 512MiB host-staged)
    - eval_fused_grid_bytes: cap under which the fused-kernel path scores
      the whole (Ni, Nc) grid in one call (default 6GiB)
    - eval_device_assembly_bytes: output-matrix size under which bucket
      columns are scattered on device instead of host numpy (default 1GiB)
    - eval_offload_bytes: embedding stacks above this are staged to host
      after encode (default 3GiB — the bf16 coco-testall token stack stays
      device-resident, the fp32 one offloads)
    """
    return {
        "slab_bytes": config.get("eval_slab_bytes"),
        "fused_grid_bytes": config.get("eval_fused_grid_bytes"),
        "device_assembly_bytes": config.get("eval_device_assembly_bytes"),
    }


def _eval_mesh(config):
    """Mesh for the offline eval surface (test.py -> evalrank_*).

    Same policy as fit() (train/loop.py:359-378): config['mesh_shape'] when
    set, else a 1-D 'dp' mesh over every visible device when there is more
    than one.  On a multi-chip host this both parallelizes encode/cal_sims
    over ICI and makes pallas_ok() True inside shard_ctx, so the fused eval
    kernels engage — without it the reference's primary published-number
    workflow (ref test.py:1-20 -> evaluation.py:262-435) would run on one
    chip with the kernels off.  Returns None single-device (direct routing).
    """
    if not (config.get("mesh_shape") or jax.device_count() > 1):
        return None
    from ..parallel.mesh import make_mesh

    mesh = make_mesh(config)
    if mesh.size <= 1:
        return None
    print(f"=> eval mesh over {mesh.size} devices: {dict(mesh.shape)}")
    return mesh


def evaluate_split(model, variables, dataset, config, fold5: bool = False, mesh=None):
    """encode -> dedup images -> sims -> recalls.  Returns the result dict."""
    edt = "bfloat16" if config.get("encode_bf16") else None
    # a bf16 embed forward hands bf16 stacks to the sim grid either way, so
    # encode_bf16 implies the bf16 eval compute path (fp32 accumulation)
    cdt = "bfloat16" if (config.get("eval_bf16") or edt) else None
    enc = encode_data(
        model, variables, dataset, config["batch_size"],
        offload_threshold_bytes=config.get("eval_offload_bytes", 3 << 30),
        mesh=mesh,
        compute_dtype=cdt,
        encode_dtype=edt,
    )
    img_embs = enc["img"]
    cap_embs = enc["cap"]
    cap_mask = enc.get("cap_mask")
    im_div = dataset.im_div

    if not fold5:
        imgs = img_embs[::im_div]
        sims = cal_sims(
            model,
            variables,
            imgs,
            cap_embs,
            cap_mask,
            img_tile=config.get("eval_img_tile", 256),
            cap_tile=config.get("eval_cap_tile", 1024),
            mesh=mesh,
            compute_dtype=cdt,
            budgets=_eval_budgets(config),
        )
        res = metrics.cal_recall(sims, cap_ratio=im_div)
        res["data_name"] = config["data_name"]
        return res

    # 5-fold cross-validation over coco testall (ref evaluation.py:293-331)
    res = {"sum_result": []}
    for i in range(5):
        sl = slice(i * 5000, (i + 1) * 5000)
        imgs_block = img_embs[sl][::5]
        caps_block = cap_embs[sl]
        mask_block = cap_mask[sl] if cap_mask is not None else None
        sims = cal_sims(
            model,
            variables,
            imgs_block,
            caps_block,
            mask_block,
            img_tile=config.get("eval_img_tile", 256),
            cap_tile=config.get("eval_cap_tile", 1024),
            mesh=mesh,
            compute_dtype=cdt,
            budgets=_eval_budgets(config),
        )
        print(f"--------------------- The {i + 1} part ---------------------")
        r = metrics.cal_recall(sims)
        res[f"PART_{i + 1}"] = r
        res["sum_result"] += r["result"]

    res["Mean_metrics"] = _fold5_mean_metrics(res["sum_result"])
    res["data_name"] = config["data_name"] + "_5fold"
    return res


def _fold5_mean_metrics(sum_result) -> dict:
    """Full per-direction mean block over the 5 coco folds.

    Per-part rows are list(r) + list(ri) + [ar, ari, rsum]: indices 10=ar,
    11=ari, 12=rsum.  (The reference misreads these — evaluation.py:310-314
    and the ensemble copy at :420-432 report ar*6 as "rsum" and ari as the
    i2t average; fixed here.)
    """
    mean_metrics = tuple(np.array(sum_result).mean(axis=0).flatten())
    print("---------------------------------------------------------")
    print("--------------------- Mean metrics: ---------------------")
    print("rsum: %.1f" % mean_metrics[12])
    print("Image to text: r1 %.1f; r5 %.1f; r10 %.1f; medr %.1f; meanr %.1f" % mean_metrics[:5])
    print("Text to image: r1 %.1f; r5 %.1f; r10 %.1f; medr %.1f; meanr %.1f" % mean_metrics[5:10])
    return {
        "rsum": mean_metrics[12],
        "i2t_r1": mean_metrics[0],
        "i2t_r5": mean_metrics[1],
        "i2t_r10": mean_metrics[2],
        "i2t_medr": mean_metrics[3],
        "i2t_meanr": mean_metrics[4],
        "t2i_r1": mean_metrics[5],
        "t2i_r5": mean_metrics[6],
        "t2i_r10": mean_metrics[7],
        "t2i_medr": mean_metrics[8],
        "t2i_meanr": mean_metrics[9],
        "i2t_ave_r": mean_metrics[10],
        "t2i_ave_r": mean_metrics[11],
    }


def _load_model_for_eval(model_path, data_path=None):
    ckpt = load_checkpoint(model_path)
    config = ckpt["config"]
    print(
        "Best model: Epoch = {}, Eiters = {}, Rsum = {:.2f}, R1 = {:.2f}".format(
            ckpt["epoch"], ckpt["Eiters"], ckpt["best_rsum"], ckpt["best_r1"]
        )
    )
    if data_path is not None:
        config["data_path"] = data_path
    model = get_model(config)
    variables = {"params": ckpt["params"]}
    if ckpt.get("batch_stats"):
        variables["batch_stats"] = ckpt["batch_stats"]
    # msgpack restore yields numpy arrays; move to device once so jitted
    # closures can index them with tracers
    variables = jax.tree.map(jnp.asarray, variables)
    return model, variables, config, ckpt


def _dump_result(res, model_path, suffix):
    save_dir = os.path.dirname(model_path)
    out = {
        k: v
        for k, v in res.items()
        if not isinstance(v, np.ndarray)
    }
    path = os.path.join(save_dir, f"{res['data_name']}_{suffix}_result.yaml")
    try:
        import yaml

        def clean(o):
            if isinstance(o, dict):
                return {k: clean(v) for k, v in o.items() if not isinstance(v, np.ndarray)}
            if isinstance(o, (np.floating, np.integer)):
                return float(o)
            return o

        with open(path, "w") as f:
            yaml.dump(clean(out), f)
    except ImportError:
        pass
    return path


def evalrank_single(model_path, data_path=None, split="dev", fold5=False):
    """Offline evaluation of one checkpoint (ref evaluation.py:262-335)."""
    from ..data import precomp

    model, variables, config, _ = _load_model_for_eval(model_path, data_path)
    print(f"Loading dataset : {config['data_name']} ......")
    dataset, _ = precomp.get_test_loader(split, config)
    print("Computing results...")
    res = evaluate_split(
        model, variables, dataset, config, fold5=fold5, mesh=_eval_mesh(config)
    )
    _dump_result(res, model_path, "single")
    return res


def evalrank_ensemble(model_path, model_path2, data_path=None, split="dev", fold5=False):
    """Two-checkpoint ensemble: average the two sim matrices (ref :338-435)."""
    from ..data import precomp

    model, variables, config, _ = _load_model_for_eval(model_path, data_path)
    model2, variables2, config2, _ = _load_model_for_eval(model_path2, data_path)

    dataset, _ = precomp.get_test_loader(split, config)
    mesh = _eval_mesh(config)

    def sims_of(m, v, cfg):
        edt = "bfloat16" if cfg.get("encode_bf16") else None
        return encode_data(
            m, v, dataset, cfg["batch_size"],
            offload_threshold_bytes=cfg.get("eval_offload_bytes", 3 << 30),
            compute_dtype="bfloat16" if (cfg.get("eval_bf16") or edt) else None,
            mesh=mesh,
            encode_dtype=edt,
        )

    enc1 = sims_of(model, variables, config)
    enc2 = sims_of(model2, variables2, config2)
    im_div = dataset.im_div

    def block_sims(enc, m, v, cfg, sl=None):
        img = enc["img"] if sl is None else enc["img"][sl]
        cap = enc["cap"] if sl is None else enc["cap"][sl]
        mask = enc.get("cap_mask")
        if mask is not None and sl is not None:
            mask = mask[sl]
        return cal_sims(
            m, v, img[::im_div if sl is None else 5], cap, mask,
            img_tile=cfg.get("eval_img_tile", 256),
            cap_tile=cfg.get("eval_cap_tile", 1024),
            mesh=mesh,
            compute_dtype="bfloat16"
            if (cfg.get("eval_bf16") or cfg.get("encode_bf16")) else None,
            budgets=_eval_budgets(cfg),
        )

    if not fold5:
        sims = (
            block_sims(enc1, model, variables, config)
            + block_sims(enc2, model2, variables2, config2)
        ) / 2.0
        res = metrics.cal_recall(sims, cap_ratio=im_div)
        res["data_name"] = config["data_name"]
    else:
        res = {"sum_result": []}
        for i in range(5):
            sl = slice(i * 5000, (i + 1) * 5000)
            sims = (
                block_sims(enc1, model, variables, config, sl)
                + block_sims(enc2, model2, variables2, config2, sl)
            ) / 2.0
            print(f"--------------------- The {i + 1} part ---------------------")
            r = metrics.cal_recall(sims)
            res[f"PART_{i + 1}"] = r
            res["sum_result"] += r["result"]
        res["Mean_metrics"] = _fold5_mean_metrics(res["sum_result"])
        res["data_name"] = config["data_name"] + "_5fold"
    res["modal_path_1"] = model_path
    res["modal_path_2"] = model_path2
    _dump_result(res, model_path, "ensemble")
    return res

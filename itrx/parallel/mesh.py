"""Device mesh + sharding helpers.

The reference's only parallelism is `nn.DataParallel` on two encoders
(SURVEY.md §2.10).  Here parallelism is first-class and XLA-native:

 - training: batch sharded over a 1-D 'dp' mesh axis, parameters replicated;
   the contrastive loss needs the full (N, N) score grid, so XLA inserts the
   all-gather over ICI automatically from the sharding annotations — no
   hand-written collectives,
 - evaluation: captions sharded over 'dp', images replicated; each chip
   computes its column block of the similarity matrix (the N×5N eval matrix
   is this workload's sequence-parallel analog, SURVEY.md §2.10).

Multi-chip behavior is validated on a virtual CPU mesh
(`xla_force_host_platform_device_count`) by tests and by
`__graft_entry__.dryrun_multichip`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(config=None, devices=None) -> Mesh:
    """Device mesh from config['mesh_shape'].

    mesh_shape=None or {'dp': n} -> 1-D data-parallel mesh.
    mesh_shape={'dp': a, 'tp': b} -> 2-D mesh: batch sharded over 'dp',
    large parameter matrices sharded over 'tp' (see param_pspec); XLA/GSPMD
    inserts the all-gathers/reduce-scatters the matmuls need over ICI.
    """
    devices = devices if devices is not None else jax.devices()
    shape = (config or {}).get("mesh_shape") if config else None
    if shape:
        if "dp" not in shape:
            # everything downstream (batch sharding, caption-sharded eval)
            # addresses a 'dp' axis — a tp-only request gets dp=1
            shape = {"dp": 1, **shape}
        n = int(np.prod(list(shape.values())))
        devices = devices[:n]
        return Mesh(
            np.asarray(devices).reshape(tuple(shape.values())),
            axis_names=tuple(shape.keys()),
        )
    return Mesh(np.asarray(devices), axis_names=("dp",))


def param_pspec(leaf, mesh: Mesh) -> P:
    """Tensor-parallel layout rule for one parameter leaf.

    2-D matrices shard their larger axis over 'tp' when divisible (sharding
    is pure layout — results are identical, XLA adds the collectives);
    vectors, scalars and indivisible shapes replicate.
    """
    tp = mesh.shape.get("tp", 1)
    if tp <= 1 or leaf.ndim != 2:
        return P()
    ax = int(np.argmax(leaf.shape))
    if leaf.shape[ax] % tp != 0:
        return P()
    spec = [None, None]
    spec[ax] = "tp"
    return P(*spec)


def shard_params(tree, mesh: Mesh):
    """Place a parameter pytree on the mesh under the tp layout rules
    (replicated everywhere when the mesh has no 'tp' axis)."""
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, param_pspec(x, mesh))),
        tree,
    )


def shard_train_state(state, mesh: Mesh):
    """Lay a TrainState out for a tp mesh: params under the tp layout rules,
    optimizer state re-laid-out to match (EXISTING values are preserved —
    a resumed run keeps its Adam moments and LR-schedule count; only the
    placement changes), batch stats and step replicated.

    The Adam moments mirror the parameter shapes, so the same per-leaf
    param_pspec rule lays them out identically to their parameters;
    scalars (schedule counts) replicate."""
    return state.replace(
        params=shard_params(state.params, mesh),
        opt_state=shard_params(state.opt_state, mesh),
        batch_stats=replicate_tree(state.batch_stats, mesh),
        step=replicate_tree(state.step, mesh),
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding for batch pytrees."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch on the mesh, sharded along the batch axis."""
    sh = batch_sharding(mesh)
    return {k: jax.device_put(jnp.asarray(v), sh) for k, v in batch.items()}


def replicate_tree(tree, mesh: Mesh):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def sharded_similarity(model, variables, img_embs, cap_embs, cap_mask, mesh):
    """Caption-sharded similarity over the mesh: images replicated, captions
    split along 'dp'; returns the full (Ni, Nc) matrix (column-sharded on
    device, gathered lazily by consumers)."""
    ndp = mesh.shape["dp"]
    nc = cap_embs.shape[0]
    nc_pad = pad_to_multiple(nc, ndp)

    def pad(x):
        if x is None:
            return None
        w = [(0, nc_pad - nc)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, w)

    cap_p = jax.device_put(pad(cap_embs), NamedSharding(mesh, P("dp")))
    mask_p = None
    if cap_mask is not None:
        mask_p = pad(cap_mask)
        # give padded captions one valid token so masked kernels stay finite
        if nc_pad > nc:
            mask_p = mask_p.at[nc:, 0].set(1.0)
        mask_p = jax.device_put(mask_p, NamedSharding(mesh, P("dp")))
    img_r = jax.device_put(img_embs, replicated(mesh))
    variables = replicate_tree(variables, mesh)

    from ..ops.pallas import shard_ctx

    @jax.jit
    def f(v, img, cap, mask):
        with shard_ctx(mesh):
            return model.apply(v, img, cap, mask, train=False, method="similarity")

    sims = f(variables, img_r, cap_p, mask_p)
    return sims[:, :nc]

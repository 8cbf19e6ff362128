"""Composite parallelism (DP x TP x EP x SP) over a 2-D device mesh, GSPMD.

The scaling design for multi-chip TPU (the reference only has DDP,
models/train_oc20v2_parallel.py — everything beyond pure data-parallel is
TPU-native new surface):

* mesh axes ``("data", "model")`` — ``data`` rides DCN-tolerant gradient
  all-reduces, ``model`` must ride ICI (tensor/expert/sequence collectives
  fire inside every block).
* **DP**: the stacked micro-batch's leading device axis is sharded over
  ``data``; the loss is a mean over micro-batches, so XLA emits the gradient
  all-reduce automatically (GSPMD), replacing the reference's NCCL
  ``all_reduce`` (train_oc20v2_parallel.py:204-211).
* **TP**: Megatron-style column/row pairing on the two big GEMM stacks —
  FFN ``so3_linear_1``/``gating`` shard the hidden dim (column), FFN
  ``so3_linear_2`` contracts it (row); attention ``so2_conv_1``/``value_act``
  shard the attention-hidden dim, ``so2_conv_2``/``proj`` contract it.
  Everything small (norms, embeddings, radial MLPs, alpha path, HTR edge
  stream) is replicated.
* **EP**: stacked MoE expert axes (``experts_eq``/``experts_ne``,
  nn/moe.py) shard over ``model`` — expert-parallel reuses the TP axis, the
  standard TPU layout for dense soft mixtures.
* **SP**: optionally shard the padded edge axis (the long "sequence" of a
  molecular graph: E_pad >> N_pad) over ``model`` as well; per-edge work
  (SO2 convs, S2 activation — the FLOPs majority) partitions cleanly and
  XLA inserts the gather/segment-sum collectives at node boundaries.

Everything is expressed as sharding annotations on a single jitted train
step; XLA's SPMD partitioner inserts all collectives.  No manual
psum/ppermute here (see parallel/pipeline.py for the explicitly scheduled
pipeline-parallel executor).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_composite_mesh",
    "param_partition_spec",
    "state_shardings",
    "batch_shardings",
    "make_composite_matpes_step",
]

AXIS_DATA = "data"
AXIS_MODEL = "model"


def make_composite_mesh(
    n_devices: int | None = None, model_parallel: int = 1, devices=None
) -> Mesh:
    """(data, model) mesh: data = n_devices // model_parallel."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[: n_devices]
    n = len(devices)
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by model={model_parallel}")
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, axis_names=(AXIS_DATA, AXIS_MODEL))


def _spec_for(path: str, shape, model_size: int):
    """TP/EP PartitionSpec for one param leaf, by flax path substring.

    Block params under a scanned layer stack carry a leading [num_layers]
    axis; expert stacks carry a [num_experts] axis.  Rules are written
    against the *trailing* dims so they hold with or without scan.
    """

    def ok(dim_from_end: int) -> bool:
        """dim (negative index) exists and is divisible by the axis size."""
        if dim_from_end > len(shape):
            return False
        return shape[-dim_from_end] % model_size == 0

    def spec(dim_from_end: int):
        s = [None] * len(shape)
        s[-dim_from_end] = AXIS_MODEL
        return P(*s)

    rep = P(*([None] * len(shape)))
    if model_size == 1:
        return rep

    # ── EP: stacked expert axis (after the optional scan axis) ────────────
    if "experts_eq" in path or "experts_ne" in path:
        # expert axis = dim 0, or dim 1 under a scanned block stack
        idx = 1 if "'blocks'" in path else 0
        if len(shape) > idx and shape[idx] % model_size == 0:
            s = [None] * len(shape)
            s[idx] = AXIS_MODEL
            return P(*s)
        return rep

    # ── TP: FFN column/row pair ───────────────────────────────────────────
    # matched by FeedForward leaf names, not the parent, so the output-head
    # FFNs (energy_block / force_block / QM9 heads) shard too — the
    # completeness test (test_no_big_param_silently_replicated) caught the
    # energy head replicating 1.3 MB under the old "'ffn'"-only gate
    if any(k in path for k in (
        "so3_linear_1", "so3_linear_2", "gating_linear", "scalar_mlp",
        "gate_proj", "grid_mlp",
    )):
        if "so3_linear_1" in path:
            # weight (..., 3, C_in, H): shard H; bias (..., H)
            return spec(1) if ok(1) else rep
        if "so3_linear_2" in path:
            # weight (..., 3, H, C_out): contract sharded H (row)
            if "weight" in path and ok(2):
                return spec(2)
            return rep
        if "gating_linear" in path or "scalar_mlp" in path or "gate_proj" in path:
            return spec(1) if ok(1) else rep
        if "grid_mlp" in path:
            # 3 chained square GEMMs in grid space: col / row / col
            if "grid_mlp_1" in path and "kernel" in path and ok(2):
                return spec(2)
            return spec(1) if ok(1) else rep
        return rep

    # ── TP: attention column/row pair ─────────────────────────────────────
    if "'ga'" in path:
        if "so2_conv_1" in path:
            if "RadialMLP" in path:
                return rep  # small; its outputs rescale *inputs*, unsharded
            # w_m0/w_m1_r/w_m1_i/b_m0: shard the packed output dim
            return spec(1) if ok(1) else rep
        if "value_act" in path:
            if "W_rs" in path or "gamma_s" in path or "xj_proj" in path:
                return spec(1) if ok(1) else rep
            return rep
        if "so2_conv_2" in path:
            # contracts the attention-hidden dim (row-parallel)
            if ("w_m0" in path or "w_m1" in path) and ok(2):
                return spec(2)
            return rep
        if "'proj'" in path and "weight" in path:
            # (..., 3, heads*v_per_head, C_out): contract the value dim
            return spec(2) if ok(2) else rep
        return rep

    return rep


def param_partition_spec(tree, model_size: int):
    """PartitionSpec pytree for a params/opt-state tree (path-rule based)."""
    from jax.tree_util import keystr, tree_map_with_path

    def one(path, leaf):
        shape = getattr(leaf, "shape", ())
        if not shape:
            return P()
        return _spec_for(keystr(path), shape, model_size)

    return tree_map_with_path(one, tree)


def state_shardings(mesh: Mesh, state_shape):
    """NamedShardings for a TrainState (params + optimizer + EMA).

    Optimizer moments mirror param subtrees, so the same path rules apply
    (the param path is a suffix of the moment's path).
    """
    model_size = mesh.shape[AXIS_MODEL]
    specs = param_partition_spec(state_shape, model_size)
    return jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), specs)


# batch keys whose trailing "long" axis is the edge axis (sequence-parallel)
_EDGE_KEYS = ("edge_src", "edge_dst", "edge_shift", "edge_mask")


def batch_shardings(mesh: Mesh, stacked: dict, sp: bool = False):
    """NamedShardings for a stacked micro-batch dict [D, ...].

    Leading axis -> ``data``.  With ``sp=True``, edge arrays additionally
    shard their edge axis over ``model`` (sequence parallelism over the
    padded edge list).
    """
    out = {}
    for k, v in stacked.items():
        ndim = np.ndim(v)
        spec = [None] * ndim
        spec[0] = AXIS_DATA
        if sp and k in _EDGE_KEYS and ndim >= 2:
            e = np.shape(v)[1]
            if e % mesh.shape[AXIS_MODEL] == 0:
                spec[1] = AXIS_MODEL
        out[k] = NamedSharding(mesh, P(*spec))
    return out


def make_composite_matpes_step(
    model,
    tx,
    mesh: Mesh,
    state_shape,
    stacked_batch: dict,
    w_energy: float = 1.0,
    w_force: float = 1.0,
    w_stress: float = 0.0,
    sp: bool = False,
    ema_decay: float = 0.999,
) -> Callable:
    """Composite DP x TP x EP (x SP) MatPES train step, one jit, GSPMD.

    ``state_shape`` — ``jax.eval_shape`` of the TrainState;
    ``stacked_batch`` — a representative stacked micro-batch (shapes only).
    Loss = mean over micro-batches of (energy, force[, stress]) loss; the
    gradient all-reduce over ``data`` and all TP/EP collectives over
    ``model`` are inserted by XLA.
    """
    import optax

    from ..models.matpes import (
        matpes_energy_forces_stress,
        matpes_energy_forces_stress_pergraph,
    )
    from ..train.trainer import TrainState, ema_update, matpes_loss

    n_micro = next(iter(stacked_batch.values())).shape[0]

    def loss_fn(params, stacked, rngs):
        def per_micro(batch, rng):
            if w_stress > 0.0:
                outs = matpes_energy_forces_stress_pergraph(
                    model, params, batch, rngs={"dropout": rng},
                    deterministic=False,
                )
            else:
                outs = matpes_energy_forces_stress(
                    model, params, batch, regress_stress=False,
                    rngs={"dropout": rng}, deterministic=False,
                )
            return matpes_loss(outs, batch, w_energy, w_force, w_stress)

        losses, metrics = jax.vmap(per_micro, in_axes=(0, 0))(stacked, rngs)
        return jnp.mean(losses), jax.tree_util.tree_map(jnp.mean, metrics)

    def step(state, stacked, rng):
        rngs = jax.random.split(rng, n_micro)
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, stacked, rngs)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=params,
            opt_state=opt_state,
            ema_params=ema_update(state.ema_params, params, ema_decay),
        )
        metrics = dict(metrics)
        metrics["loss"] = loss
        return new_state, metrics

    st_sh = state_shardings(mesh, state_shape)
    b_sh = batch_shardings(mesh, stacked_batch, sp=sp)
    rep = NamedSharding(mesh, P())
    metric_sh = None  # let XLA pick (scalars)
    return jax.jit(
        step,
        in_shardings=(st_sh, b_sh, rep),
        out_shardings=(st_sh, metric_sh),
        donate_argnums=(0,),
    )

"""Pipeline parallelism over the transformer layer stack (shard_map+ppermute).

The reference has no pipeline parallelism (DDP only,
models/train_oc20v2_parallel.py) — this is TPU-native new surface: the
scanned layer stack (params carry a leading ``[num_layers]`` axis,
models/backbone.py ``scan_layers=True``) is split into ``P`` contiguous
stages over a ``pipe`` mesh axis, and micro-batches flow through the stages
on a GPipe schedule with ``lax.ppermute`` moving activations stage-to-stage
over ICI.

Schedule (loop skew): with M micro-batches and P stages, T = M + P - 1
ticks.  At tick t every stage (SPMD: same program, behavior switched on
``lax.axis_index``) receives its predecessor's previous output, stage 0
feeds micro-batch t (or zeros once drained), each stage applies its local
L/P layers (an inner ``lax.scan``), and stage P-1 writes finished
micro-batches to the output buffer.  Bubble fraction = (P-1)/(M+P-1).

Differentiable end-to-end: ppermute/psum transpose to ppermute/psum, so the
backward pass runs the reverse pipeline automatically.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

__all__ = [
    "make_pipeline_mesh",
    "pipeline_apply",
    "make_dp_pipe_mesh",
    "pipeline_state_shardings",
    "make_pipeline_matpes_step",
]

AXIS_PIPE = "pipe"


def make_pipeline_mesh(n_stages: int, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()[:n_stages]
    return Mesh(np.asarray(devices), axis_names=(AXIS_PIPE,))


def _tree_where(pred, a, b):
    return jax.tree_util.tree_map(
        lambda x, y: jnp.where(pred, x, y), a, b
    )


def pipeline_apply(
    body_fn: Callable,
    stacked_params,
    micro_states,
    mesh: Mesh,
    axis: str = AXIS_PIPE,
    data_axis: str | None = None,
):
    """Run ``micro_states`` through all L layers on a P-stage pipeline.

    body_fn(layer_params, state) -> state
        one layer; ``layer_params`` = one slice of ``stacked_params``.
    stacked_params
        pytree with leading layer axis L (L % P == 0); sharded over ``axis``
        so each stage holds L/P layers.
    micro_states
        pytree with leading micro-batch axis M >= 1 (all leaves float or
        int; every micro-batch flows through every stage).
    data_axis
        optional second mesh axis: the micro-batch axis is sharded over it
        (DP x PP — each data row runs an independent pipeline over its own
        micro-batches with the same stage-sharded params).

    Returns the output states, [M, ...], replicated over ``axis`` (sharded
    over ``data_axis`` if given).
    """
    P_size = mesh.shape[axis]
    L = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    M_global = jax.tree_util.tree_leaves(micro_states)[0].shape[0]
    M = M_global // (mesh.shape[data_axis] if data_axis else 1)
    if L % P_size:
        raise ValueError(f"num_layers {L} not divisible by pipe={P_size}")
    if data_axis and M_global % mesh.shape[data_axis]:
        raise ValueError(
            f"micro-batches {M_global} not divisible by "
            f"data={mesh.shape[data_axis]}"
        )

    def local_apply(params_local, state):
        def scan_body(st, lp):
            return body_fn(lp, st), None

        st, _ = jax.lax.scan(scan_body, state, params_local)
        return st

    def spmd(params_local, states):
        i = jax.lax.axis_index(axis)
        zeros1 = jax.tree_util.tree_map(
            lambda x: jnp.zeros_like(x[0]), states
        )
        out_buf = jax.tree_util.tree_map(jnp.zeros_like, states)
        perm = [(j, (j + 1) % P_size) for j in range(P_size)]

        def tick(carry, t):
            prev_out, out_buf = carry
            incoming = jax.lax.ppermute(prev_out, axis, perm)
            feed_idx = jnp.clip(t, 0, M - 1)
            feed = jax.tree_util.tree_map(
                lambda x: jax.lax.dynamic_index_in_dim(
                    x, feed_idx, keepdims=False
                ),
                states,
            )
            feed = _tree_where(t < M, feed, zeros1)
            inp = _tree_where(i == 0, feed, incoming)
            out = local_apply(params_local, inp)
            # last stage writes finished micro-batch t-(P-1)
            w_idx = jnp.clip(t - (P_size - 1), 0, M - 1)
            write = jnp.logical_and(i == P_size - 1, t >= P_size - 1)

            def upd(buf, val):
                cur = jax.lax.dynamic_index_in_dim(
                    buf, w_idx, keepdims=False
                )
                new = jnp.where(write, val, cur)
                return jax.lax.dynamic_update_index_in_dim(
                    buf, new, w_idx, 0
                )

            out_buf = jax.tree_util.tree_map(upd, out_buf, out)
            return (out, out_buf), None

        (_, out_buf), _ = jax.lax.scan(
            tick, (zeros1, out_buf), jnp.arange(M + P_size - 1)
        )
        # only stage P-1 holds non-zero outputs -> psum replicates them
        return jax.lax.psum(out_buf, axis)

    fn = shard_map(
        spmd,
        mesh=mesh,
        in_specs=(P(axis), P(data_axis)),
        out_specs=P(data_axis),
        check_vma=False,
    )
    return fn(stacked_params, micro_states)


# ── trainer-path pipeline step (VERDICT r4 #7) ─────────────────────────────


def make_dp_pipe_mesh(data: int, pipe: int, devices=None) -> Mesh:
    """2-D ("data", "pipe") mesh for DP x PP training."""
    if devices is None:
        devices = jax.devices()
    n = data * pipe
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(data, pipe)
    return Mesh(arr, axis_names=("data", AXIS_PIPE))


def pipeline_state_shardings(mesh: Mesh, state_shape):
    """NamedShardings for a TrainState under the DP x PP step: the scanned
    block stack (every leaf under a ``blocks`` key — the nn.scan leading
    layer axis) shards its layer axis over ``pipe``; everything else
    replicates."""
    from jax.sharding import NamedSharding

    def spec_for(path, leaf):
        keys = [getattr(p, "key", getattr(p, "name", None)) for p in path]
        if "blocks" in keys and np.ndim(leaf) >= 1:
            return NamedSharding(mesh, P(AXIS_PIPE))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, state_shape)


def make_pipeline_matpes_step(
    model,
    tx,
    mesh: Mesh,
    state_shape,
    stacked_batch: dict,
    w_energy: float = 1.0,
    w_force: float = 1.0,
    ema_decay: float = 0.999,
    mixed_precision: bool = False,
) -> Callable:
    """DP x PP MatPES force-training step: the model's scanned block stack
    (``scan_layers=True`` param layout) runs on the GPipe schedule above,
    stage-sharded over ``pipe``; micro-batches shard over ``data``.  The
    pre-stack (embeddings, Wigner, edge streams) and post-stack (final
    norm, energy head) math stays inside the flax model via its
    ``stack_capture`` / ``stack_override`` hooks (models/backbone.py) — no
    duplicated forward logic; forces are the usual -dE/dpos autograd
    through the whole pipeline (ppermute transposes to the reverse
    schedule).

    ``stacked_batch``: representative micro-batch dict stacked on a leading
    [n_micro] axis (parallel/data_parallel.py:stack_microbatches);
    n_micro % data == 0 and num_layers % pipe == 0.

    The reference has no pipeline parallelism (DDP only,
    models/train_oc20v2_parallel.py) — TPU-native new surface.
    """
    import flax.linen as nn
    import optax
    from jax.sharding import NamedSharding

    from ..models.backbone import build_block_kwargs
    from ..nn.block import BlockScanBody
    from ..train.trainer import (
        TrainState,
        cast_params,
        ema_update,
        matpes_loss,
    )

    if not model.scan_layers:
        raise ValueError("pipeline step requires scan_layers=True")
    pipe = mesh.shape[AXIS_PIPE]
    if model.num_layers % pipe:
        raise ValueError(
            f"num_layers {model.num_layers} not divisible by pipe={pipe}"
        )
    n_micro = next(iter(stacked_batch.values())).shape[0]
    micro0 = {k: v[0] for k, v in stacked_batch.items()}
    B = int(micro0["cell"].shape[0])
    N = int(micro0["pos"].shape[0])
    E = int(micro0["edge_src"].shape[0])

    blocks = None
    if model.uniform_blocks or model.fixed_degree:
        blocks = (B, N // B, E // B)
        if model.fixed_degree:
            blocks = blocks + (E // N,)
    edge_channels_list = [model.num_rbf, model.edge_channels,
                          model.edge_channels]
    if model.share_atom_edge_embedding and model.use_atom_edge_embedding:
        edge_channels_list[0] += 2 * model.edge_channels
        block_atom_edge = False
    else:
        block_atom_edge = model.use_atom_edge_embedding
    kw = build_block_kwargs(
        model,
        edge_channels_list=edge_channels_list,
        block_atom_edge=block_atom_edge,
        blocks=blocks,
        num_graphs=B,
        deterministic=False,
    )
    body_cls = (
        nn.remat(BlockScanBody, prevent_cse=False)
        if model.remat
        else BlockScanBody
    )
    body = body_cls(block_kwargs=tuple(sorted(kw.items())))

    def body_fn(layer_params, state):
        carry, broadcast, key = state
        key, sub = jax.random.split(key)
        c2, _ = body.apply(
            {"params": layer_params}, carry, broadcast,
            rngs={"dropout": sub},
        )
        return (c2, broadcast, key)

    def loss_fn(params, stacked, rng):
        if mixed_precision:
            params = cast_params(params, jnp.bfloat16)
        p_stack = params["params"]["backbone"]["blocks"]
        keys = jax.random.split(rng, 3 * n_micro).reshape(3, n_micro, -1)

        def energy_fn(pos_stacked):
            def pre_one(b, pos, key):
                return model.apply(
                    params, b, pos=pos, deterministic=False,
                    stack_capture=True, rngs={"dropout": key},
                )

            carry, broadcast = jax.vmap(pre_one)(
                stacked, pos_stacked, keys[0]
            )
            states = (carry, broadcast, keys[1])
            out_states = pipeline_apply(
                body_fn, p_stack, states, mesh,
                axis=AXIS_PIPE, data_axis="data",
            )
            carry_out = out_states[0]

            def post_one(b, pos, c, key):
                return model.apply(
                    params, b, pos=pos, deterministic=False,
                    stack_override=c, rngs={"dropout": key},
                )

            outs = jax.vmap(post_one)(
                stacked, pos_stacked, carry_out, keys[2]
            )
            return jnp.sum(outs["energy_total"]), outs

        dpos, outs = jax.grad(energy_fn, has_aux=True)(stacked["pos"])
        forces = -dpos * stacked["node_mask"][..., None].astype(dpos.dtype)
        outs = dict(outs)
        outs["forces"] = forces
        losses, metrics = jax.vmap(
            lambda o, b: matpes_loss(o, b, w_energy, w_force, 0.0)
        )(outs, stacked)
        return jnp.mean(losses), jax.tree_util.tree_map(jnp.mean, metrics)

    def step(state, stacked, rng):
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, stacked, rng)
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

    def batch_sharding(v):
        ndim = np.ndim(v)
        return NamedSharding(mesh, P(*(["data"] + [None] * (ndim - 1))))

    b_sh = {k: batch_sharding(v) for k, v in stacked_batch.items()}
    rep = NamedSharding(mesh, P())
    st_sh = pipeline_state_shardings(mesh, state_shape)
    return jax.jit(
        step,
        in_shardings=(st_sh, b_sh, rep),
        out_shardings=(st_sh, None),
        donate_argnums=(0,),
    )

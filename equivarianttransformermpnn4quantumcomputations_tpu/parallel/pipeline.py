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

__all__ = ["make_pipeline_mesh", "pipeline_apply"]

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

    Returns the output states, [M, ...], replicated.
    """
    P_size = mesh.shape[axis]
    L = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    M = jax.tree_util.tree_leaves(micro_states)[0].shape[0]
    if L % P_size:
        raise ValueError(f"num_layers {L} not divisible by pipe={P_size}")

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
        in_specs=(P(axis), P()),
        out_specs=P(),
        check_vma=False,
    )
    return fn(stacked_params, micro_states)

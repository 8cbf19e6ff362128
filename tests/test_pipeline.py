"""Pipeline-parallel executor tests (parallel/pipeline.py) on the CPU mesh.

The pipeline must be bit-compatible with running the same stacked block
params through a sequential lax.scan — forward AND gradients (the ppermute
schedule transposes to a reverse pipeline under AD).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from equivarianttransformermpnn4quantumcomputations_tpu.models.backbone import (
    build_block_kwargs,
)
from equivarianttransformermpnn4quantumcomputations_tpu.models.matpes import (
    EquiformerV2MatPES,
)
from equivarianttransformermpnn4quantumcomputations_tpu.nn.block import (
    BlockScanBody,
)
from equivarianttransformermpnn4quantumcomputations_tpu.ops.rotation import (
    compute_wigner,
)
from equivarianttransformermpnn4quantumcomputations_tpu.parallel.pipeline import (
    make_pipeline_mesh,
    pipeline_apply,
)

L = 4          # layers (full/slow tier; the default tier runs 2x2x2)
PIPE = 4       # stages
M = 3          # micro-batches
N, E, C = 8, 32, 8
LMAX, MMAX = 2, 1
EDGE_C, NUM_RBF = 8, 16


def _body(n_layers=L):
    cfg = EquiformerV2MatPES(
        num_layers=n_layers, sphere_channels=C, attn_hidden_channels=C,
        num_heads=2, attn_alpha_channels=4, attn_value_channels=4,
        ffn_hidden_channels=C, lmax=LMAX, mmax=MMAX, edge_channels=EDGE_C,
        num_rbf=NUM_RBF, max_num_elements=10, gata=True,
        alpha_drop=0.0, drop_path_rate=0.0,
    )
    kw = build_block_kwargs(
        cfg,
        edge_channels_list=[NUM_RBF, EDGE_C, EDGE_C],
        block_atom_edge=True,
        blocks=None,
        num_graphs=1,
        deterministic=True,
    )
    return BlockScanBody(block_kwargs=tuple(sorted(kw.items())))


def _state(rng, key):
    K = (LMAX + 1) ** 2
    x = jnp.asarray(rng.normal(size=(N, K, C)), jnp.float32)
    t_ij = jnp.asarray(rng.normal(size=(E, EDGE_C)), jnp.float32)
    carry = (x, t_ij, None)
    atomic_numbers = jnp.asarray(rng.integers(1, 9, size=N), jnp.int32)
    edge_scalars = jnp.asarray(rng.normal(size=(E, NUM_RBF)), jnp.float32)
    edge_src = jnp.asarray(rng.integers(0, N, size=E), jnp.int32)
    edge_dst = jnp.asarray(rng.integers(0, N, size=E), jnp.int32)
    edge_mask = jnp.ones((E,), bool)
    wig = compute_wigner(LMAX, jnp.asarray(rng.normal(size=(E, 3)), jnp.float32))
    graph_idx = jnp.zeros((N,), jnp.int32)
    rl_ij = jnp.asarray(rng.normal(size=(E, K - 1)), jnp.float32)
    broadcast = (
        atomic_numbers, edge_scalars, edge_src, edge_dst, edge_mask,
        wig, graph_idx, rl_ij, None,
    )
    return (carry, broadcast)


def _stack_states(states):
    return jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *states
    )


def _setup(n_layers=L, n_micro=M):
    rng = np.random.default_rng(0)
    body = _body(n_layers)
    states = [_state(rng, i) for i in range(n_micro)]
    carry0, broadcast0 = states[0]
    keys = jax.random.split(jax.random.PRNGKey(0), n_layers)
    stacked_params = jax.vmap(
        lambda k: body.init(k, carry0, broadcast0)["params"]
    )(keys)
    return body, stacked_params, states


def _sequential(body, stacked_params, state):
    carry, broadcast = state

    def scan_body(c, lp):
        (c2, _) = body.apply({"params": lp}, c, broadcast)
        return c2, None

    out, _ = jax.lax.scan(scan_body, carry, stacked_params)
    return out


def _body_fn(body):
    def fn(layer_params, state):
        carry, broadcast = state
        c2, _ = body.apply({"params": layer_params}, carry, broadcast)
        return (c2, broadcast)

    return fn


def _check_forward(body, stacked_params, states, pipe):
    mesh = make_pipeline_mesh(pipe)
    outs = pipeline_apply(
        _body_fn(body), stacked_params, _stack_states(states), mesh
    )
    for m in range(len(states)):
        (x_seq, t_seq, _) = _sequential(body, stacked_params, states[m])
        x_pipe = outs[0][0][m]
        t_pipe = outs[0][1][m]
        np.testing.assert_allclose(
            np.asarray(x_pipe), np.asarray(x_seq), rtol=2e-5, atol=2e-6
        )
        np.testing.assert_allclose(
            np.asarray(t_pipe), np.asarray(t_seq), rtol=2e-5, atol=2e-6
        )


@pytest.mark.slow
def test_pipeline_smoke_forward():
    """2-stage x 2-layer x 2-micro pipeline forward vs sequential.  Slow
    tier: the driver runs the pipeline fwd+grad demo every round
    (__graft_entry__.dryrun_multichip), so the default tier does not pay the
    ~1-4 min shard_map pipeline compiles."""
    body, stacked_params, states = _setup(n_layers=2, n_micro=2)
    _check_forward(body, stacked_params, states, pipe=2)


@pytest.mark.slow
def test_pipeline_smoke_gradients():
    body, stacked_params, states = _setup(n_layers=2, n_micro=2)
    _check_gradients(body, stacked_params, states, pipe=2)


@pytest.mark.slow
def test_pipeline_matches_sequential():
    body, stacked_params, states = _setup()
    _check_forward(body, stacked_params, states, pipe=PIPE)


@pytest.mark.slow
def test_pipeline_gradients_match_sequential():
    body, stacked_params, states = _setup()
    _check_gradients(body, stacked_params, states, pipe=PIPE)


def _check_gradients(body, stacked_params, states, pipe):
    mesh = make_pipeline_mesh(pipe)
    stacked_states = _stack_states(states)

    def loss_pipe(sp):
        outs = pipeline_apply(
            _body_fn(body), sp, stacked_states, mesh
        )
        return jnp.sum(outs[0][0] ** 2)

    def loss_seq(sp):
        tot = 0.0
        for m in range(len(states)):
            x, _, _ = _sequential(body, sp, states[m])
            tot = tot + jnp.sum(x ** 2)
        return tot

    g_pipe = jax.grad(loss_pipe)(stacked_params)
    g_seq = jax.grad(loss_seq)(stacked_params)
    flat_p, _ = jax.tree_util.tree_flatten(g_pipe)
    flat_s, _ = jax.tree_util.tree_flatten(g_seq)
    for a, b in zip(flat_p, flat_s):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5
        )

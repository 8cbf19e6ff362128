"""Fused Pallas S2 activation: value, grad, and grad-of-grad vs XLA reference
(interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from equivarianttransformermpnn4quantumcomputations_tpu.ops.pallas.s2act import (
    s2act_fused,
    s2act_reference,
)
from equivarianttransformermpnn4quantumcomputations_tpu.ops.s2grid import s2grid

LMAX, MMAX = 3, 2


def setup(n=20, c=8, res=None):
    g = s2grid(LMAX, MMAX, res)
    rng = np.random.default_rng(0)
    K = g.to_grid_mat.shape[-1]
    x = jnp.asarray(rng.normal(size=(n, K, c)).astype(np.float32))
    return g, x


def test_fused_value_matches_reference():
    g, x = setup()
    a = np.asarray(s2act_fused(x, g))
    b = np.asarray(s2act_reference(x, g))
    assert np.abs(a - b).max() < 1e-5, np.abs(a - b).max()


def test_fused_grad_matches_reference():
    g, x = setup()

    def loss_f(fn):
        return lambda t: jnp.sum(jnp.sin(fn(t, g)) ** 2)

    ga = np.asarray(jax.grad(loss_f(s2act_fused))(x))
    gb = np.asarray(jax.grad(loss_f(s2act_reference))(x))
    assert np.abs(ga - gb).max() < 1e-4, np.abs(ga - gb).max()


def test_fused_grad_of_grad_matches_reference():
    """The force-training pattern: d/dx of a loss of grad(x)."""
    g, x = setup(n=10, c=4)

    def make(fn):
        def energy(t):
            return jnp.sum(fn(t, g) ** 2)

        def loss(t):
            forces = jax.grad(energy)(t)
            return jnp.sum(jnp.abs(forces)) + energy(t)

        return jax.grad(loss)

    ga = np.asarray(make(s2act_fused)(x))
    gb = np.asarray(make(s2act_reference)(x))
    assert np.abs(ga - gb).max() < 5e-3, np.abs(ga - gb).max()


def test_fused_nondivisible_tile():
    g, x = setup(n=37, c=8)  # not a multiple of any pow2 tile
    a = np.asarray(s2act_fused(x, g))
    b = np.asarray(s2act_reference(x, g))
    assert np.abs(a - b).max() < 1e-5

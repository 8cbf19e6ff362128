"""Op-level equivariance tests: SO(2) conv pipeline, norms, activations, segments."""

import numpy as np
import jax
import jax.numpy as jnp

from equivarianttransformermpnn4quantumcomputations_tpu.ops import rotation as R
from equivarianttransformermpnn4quantumcomputations_tpu.ops import wigner_np as W
from equivarianttransformermpnn4quantumcomputations_tpu.ops.irreps import layout
from equivarianttransformermpnn4quantumcomputations_tpu.ops.s2grid import s2grid
from equivarianttransformermpnn4quantumcomputations_tpu.ops.segment import (
    segment_softmax,
    segment_sum,
)
from equivarianttransformermpnn4quantumcomputations_tpu.nn.so3_layers import SO2Conv, SO3Linear
from equivarianttransformermpnn4quantumcomputations_tpu.nn.norms import (
    EquivariantRMSNormSH,
)
from equivarianttransformermpnn4quantumcomputations_tpu.nn.activations import (
    gate_activation,
)

LMAX, MMAX = 3, 2


def global_D(lmax, a, b, g):
    """Block-diag real Wigner-D [(lmax+1)^2]^2 for global rotation."""
    K = (lmax + 1) ** 2
    D = np.zeros((K, K))
    for l in range(lmax + 1):
        D[l * l : l * l + 2 * l + 1, l * l : l * l + 2 * l + 1] = (
            W.real_wigner_D_angles(l, a, b, g)
        )
    return D


def rotmat_zyz(a, b, g):
    def rz(t):
        return np.array(
            [[np.cos(t), -np.sin(t), 0], [np.sin(t), np.cos(t), 0], [0, 0, 1]]
        )

    def ry(t):
        return np.array(
            [[np.cos(t), 0, np.sin(t)], [0, 1, 0], [-np.sin(t), 0, np.cos(t)]]
        )

    return rz(a) @ ry(b) @ rz(g)


def test_so2_pipeline_equivariance():
    """rotate-to-edge -> SO2 conv -> rotate-back commutes with global rotation."""
    lay_red = layout(LMAX, MMAX)
    rng = np.random.default_rng(0)
    E, C = 6, 8
    vecs = rng.normal(size=(E, 3)).astype(np.float32)
    x = rng.normal(size=(E, (LMAX + 1) ** 2, C)).astype(np.float32)

    conv = SO2Conv(layout=lay_red, in_channels=C, out_channels=C)
    params = conv.init(jax.random.PRNGKey(0), jnp.zeros_like(x[:, lay_red.full_indices, :]))

    def pipeline(x_in, v_in):
        wig = R.compute_wigner(LMAX, jnp.asarray(v_in))
        xe = R.rotate_to_edge(wig, jnp.asarray(x_in), lay_red)
        y, _ = conv.apply(params, xe)
        return np.asarray(R.rotate_from_edge(wig, y, lay_red))

    a, b, g = rng.uniform(-np.pi, np.pi, 3)
    Rm = rotmat_zyz(a, b, g).astype(np.float32)
    D = global_D(LMAX, a, b, g).astype(np.float32)

    out = pipeline(x, vecs)
    out_rot = pipeline(
        np.einsum("ij,ejc->eic", D, x), (vecs @ Rm.T)
    )
    expected = np.einsum("ij,ejc->eic", D, out)
    assert np.abs(out_rot - expected).max() < 5e-4, np.abs(out_rot - expected).max()


def test_so3_linear_equivariance():
    rng = np.random.default_rng(1)
    N, C = 5, 8
    x = rng.normal(size=(N, (LMAX + 1) ** 2, C)).astype(np.float32)
    lin = SO3Linear(C, C, LMAX)
    params = lin.init(jax.random.PRNGKey(0), jnp.asarray(x))
    a, b, g = rng.uniform(-np.pi, np.pi, 3)
    D = global_D(LMAX, a, b, g).astype(np.float32)
    y1 = np.einsum("ij,njc->nic", D, np.asarray(lin.apply(params, jnp.asarray(x))))
    y2 = np.asarray(lin.apply(params, jnp.asarray(np.einsum("ij,njc->nic", D, x))))
    # bias on l=0 is rotation-invariant so this must hold exactly
    assert np.abs(y1 - y2).max() < 1e-5


def test_rms_norm_equivariance():
    rng = np.random.default_rng(2)
    N, C = 5, 8
    x = rng.normal(size=(N, (LMAX + 1) ** 2, C)).astype(np.float32)
    norm = EquivariantRMSNormSH(lmax=LMAX, num_channels=C)
    params = norm.init(jax.random.PRNGKey(0), jnp.asarray(x))
    a, b, g = rng.uniform(-np.pi, np.pi, 3)
    D = global_D(LMAX, a, b, g).astype(np.float32)
    y1 = np.einsum("ij,njc->nic", D, np.asarray(norm.apply(params, jnp.asarray(x))))
    y2 = np.asarray(
        norm.apply(params, jnp.asarray(np.einsum("ij,njc->nic", D, x)))
    )
    assert np.abs(y1 - y2).max() < 1e-5


def test_gate_activation_equivariance():
    rng = np.random.default_rng(3)
    N, C = 5, 8
    lay = layout(LMAX, LMAX)
    x = rng.normal(size=(N, lay.num_coefficients, C)).astype(np.float32)
    gates = rng.normal(size=(N, LMAX * C)).astype(np.float32)
    a, b, g = rng.uniform(-np.pi, np.pi, 3)
    D = global_D(LMAX, a, b, g).astype(np.float32)
    y1 = np.einsum(
        "ij,njc->nic",
        D,
        np.asarray(gate_activation(jnp.asarray(gates), jnp.asarray(x), LMAX, LMAX, C)),
    )
    xr = np.einsum("ij,njc->nic", D, x)
    y2 = np.asarray(gate_activation(jnp.asarray(gates), jnp.asarray(xr), LMAX, LMAX, C))
    assert np.abs(y1 - y2).max() < 2e-5


def test_s2grid_roundtrip():
    rng = np.random.default_rng(4)
    g = s2grid(LMAX, LMAX)
    x = rng.normal(size=(7, (LMAX + 1) ** 2, 4)).astype(np.float32)
    back = np.asarray(g.from_grid(g.to_grid(jnp.asarray(x))))
    assert np.abs(back - x).max() < 1e-4


def test_s2_activation_approx_equivariance():
    """S2 point-sample activation is approximately equivariant (as in ref)."""
    from equivarianttransformermpnn4quantumcomputations_tpu.nn.activations import (
        s2_activation,
    )

    rng = np.random.default_rng(5)
    x = (0.3 * rng.normal(size=(5, (LMAX + 1) ** 2, 4))).astype(np.float32)
    a, b, gm = rng.uniform(-np.pi, np.pi, 3)
    D = global_D(LMAX, a, b, gm).astype(np.float32)

    def rel_err(res):
        g = s2grid(LMAX, LMAX, res)
        y1 = np.einsum(
            "ij,njc->nic", D, np.asarray(s2_activation(jnp.asarray(x), g))
        )
        xr = np.einsum("ij,njc->nic", D, x)
        y2 = np.asarray(s2_activation(jnp.asarray(xr), g))
        return np.abs(y1 - y2).max() / np.abs(y1).max()

    # default resolution: same coarse grid as the reference — approximate
    assert rel_err(None) < 0.2
    # refining the grid must converge to exact equivariance
    assert rel_err(16) < 1e-4


def test_s2_activation_chunked_matches():
    """Auto-chunked S2 activation == single-shot, values and gradients."""
    import jax

    from equivarianttransformermpnn4quantumcomputations_tpu.nn import activations as A

    rng = np.random.default_rng(6)
    g = s2grid(LMAX, LMAX)
    x = jnp.asarray(rng.normal(size=(50, (LMAX + 1) ** 2, 4)).astype(np.float32))

    from equivarianttransformermpnn4quantumcomputations_tpu.utils import flags

    y_ref = np.asarray(A.s2_activation(x, g))
    with flags.override(s2_chunk_threshold_mb=0, s2_chunk_mb=1):  # force chunking
        y_chunk = np.asarray(A.s2_activation(x, g))
        gfun = jax.grad(lambda t: jnp.sum(A.s2_activation(t, g) ** 2))
        g_chunk = np.asarray(gfun(x))
    g_ref = np.asarray(
        jax.grad(lambda t: jnp.sum(A.s2_activation(t, g) ** 2))(x)
    )
    assert np.abs(y_ref - y_chunk).max() < 1e-5
    assert np.abs(g_ref - g_chunk).max() < 1e-4


def test_segment_softmax_masked():
    logits = jnp.asarray([1.0, 2.0, 3.0, 100.0, 5.0])
    seg = jnp.asarray([0, 0, 1, 1, 2])
    mask = jnp.asarray([True, True, True, False, True])
    w = np.asarray(segment_softmax(logits, seg, 4, mask))
    assert np.allclose(w[0] + w[1], 1.0, atol=1e-6)
    assert np.allclose(w[2], 1.0, atol=1e-6)  # masked partner
    assert w[3] == 0.0
    assert np.allclose(w[4], 1.0, atol=1e-6)
    # segment 3 empty: no NaN anywhere
    assert np.isfinite(w).all()


def test_segment_softmax_sorted_matches_scatter():
    rng = np.random.default_rng(7)
    E, N, H = 200, 40, 4
    ids = np.sort(rng.integers(0, N, size=E)).astype(np.int32)
    logits = rng.normal(size=(E, H)).astype(np.float32) * 3
    mask = np.ones(E, bool)
    mask[180:] = False  # contiguous padded tail
    ids[180:] = 0       # padding points at node 0 (like collate)
    # keep real part sorted
    ids[:180] = np.sort(ids[:180])
    a = np.asarray(
        segment_softmax(
            jnp.asarray(logits), jnp.asarray(ids), N, jnp.asarray(mask)
        )
    )
    b = np.asarray(
        segment_softmax(
            jnp.asarray(logits), jnp.asarray(ids), N, jnp.asarray(mask),
            sorted_ids=True,
        )
    )
    # padded-tail rows are zeroed in both
    assert np.allclose(a[:180], b[:180], atol=1e-5), np.abs(a - b).max()
    assert np.allclose(b[180:], 0.0)
    # gradients agree too
    import jax

    f = lambda s: lambda l: jnp.sum(
        jnp.sin(
            segment_softmax(
                l, jnp.asarray(ids), N, jnp.asarray(mask), sorted_ids=s
            )
        )
    )
    ga = np.asarray(jax.grad(f(False))(jnp.asarray(logits)))
    gb = np.asarray(jax.grad(f(True))(jnp.asarray(logits)))
    assert np.allclose(ga[:180], gb[:180], atol=1e-4)


def test_segment_sum_matmul_matches_scatter():
    rng = np.random.default_rng(8)
    vals = rng.normal(size=(50, 7, 3)).astype(np.float32)
    ids = rng.integers(0, 12, size=50).astype(np.int32)
    mask = rng.random(50) > 0.2
    a = np.asarray(
        segment_sum(jnp.asarray(vals), jnp.asarray(ids), 12,
                    jnp.asarray(mask), method="scatter")
    )
    b = np.asarray(
        segment_sum(jnp.asarray(vals), jnp.asarray(ids), 12,
                    jnp.asarray(mask), method="matmul")
    )
    assert np.allclose(a, b, atol=1e-5)


def test_segment_sum_masked():
    vals = jnp.asarray([[1.0], [2.0], [4.0]])
    seg = jnp.asarray([0, 0, 1])
    mask = jnp.asarray([True, False, True])
    out = np.asarray(segment_sum(vals, seg, 3, mask))
    assert np.allclose(out[:, 0], [1.0, 4.0, 0.0])


def test_gather_nodes_matches_indexing_to_second_order():
    """Matmul-transpose gather == plain indexing for value/grad/grad-of-grad."""
    import jax

    from equivarianttransformermpnn4quantumcomputations_tpu.ops.pallas.segsum import (
        gather_nodes,
    )

    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.normal(size=(10, 5, 4)).astype(np.float32))
    ids = jnp.asarray(np.sort(rng.integers(0, 10, size=30)).astype(np.int32))

    assert np.allclose(np.asarray(gather_nodes(x, ids)), np.asarray(x[ids]))

    def loss(fn):
        def e(t):
            return jnp.sum(jnp.sin(fn(t)) ** 2)

        def l(t):
            f = jax.grad(e)(t)
            return jnp.sum(jnp.abs(f)) + e(t)

        return l

    ga = np.asarray(jax.grad(loss(lambda t: gather_nodes(t, ids)))(x))
    gb = np.asarray(jax.grad(loss(lambda t: t[ids]))(x))
    assert np.allclose(ga, gb, atol=1e-5), np.abs(ga - gb).max()

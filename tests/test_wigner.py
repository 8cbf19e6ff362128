"""Math-core tests: Wigner matrices, spherical harmonics, edge frames.

These pin the conventions of the whole framework:
  Y(R x) = D(R) Y(x)  with  D(Rz(a) Ry(b) Rz(g)) = Xz(a) J Xz(b) J Xz(g).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from equivarianttransformermpnn4quantumcomputations_tpu.ops import wigner_np as W
from equivarianttransformermpnn4quantumcomputations_tpu.ops.sph import real_sph_harm
from equivarianttransformermpnn4quantumcomputations_tpu.ops import rotation as R
from equivarianttransformermpnn4quantumcomputations_tpu.ops.irreps import layout

LMAX = 4


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


def test_complex_d_orthogonal():
    for l in range(LMAX + 1):
        d = W.complex_wigner_d(l, 0.7321)
        assert np.allclose(d @ d.T, np.eye(2 * l + 1), atol=1e-10)
        assert np.allclose(W.complex_wigner_d(l, 0.0), np.eye(2 * l + 1), atol=1e-12)


def test_J_involution():
    for l in range(LMAX + 1):
        J = W.J_matrix(l)
        assert np.allclose(J @ J, np.eye(2 * l + 1), atol=1e-10)
        assert np.allclose(J, J.T, atol=1e-10)


def test_real_D_homomorphism_and_orthogonality():
    rng = np.random.default_rng(0)
    a1, b1, g1 = rng.uniform(-np.pi, np.pi, 3)
    for l in range(LMAX + 1):
        D = W.real_wigner_D_angles(l, a1, b1, g1)
        assert np.allclose(D @ D.T, np.eye(2 * l + 1), atol=1e-9)


def test_sph_equivariance_numpy_chain():
    """Y(R x) = D(R) Y(x) for random rotations and points (float64 setup path)."""
    rng = np.random.default_rng(1)
    for _ in range(5):
        a, b, g = rng.uniform(-np.pi, np.pi, 3)
        Rm = rotmat_zyz(a, b, g)
        pts = rng.normal(size=(7, 3))
        pts /= np.linalg.norm(pts, axis=-1, keepdims=True)
        Y = np.asarray(real_sph_harm(LMAX, jnp.asarray(pts)), dtype=np.float64)
        Yr = np.asarray(
            real_sph_harm(LMAX, jnp.asarray(pts @ Rm.T)), dtype=np.float64
        )
        for l in range(LMAX + 1):
            D = W.real_wigner_D_angles(l, a, b, g)
            sl = slice(l * l, l * l + 2 * l + 1)
            assert np.allclose(Yr[:, sl], Y[:, sl] @ D.T, atol=1e-5), l


def test_sph_normalizations():
    rng = np.random.default_rng(2)
    pts = rng.normal(size=(11, 3))
    pts /= np.linalg.norm(pts, axis=-1, keepdims=True)
    Yn = np.asarray(real_sph_harm(LMAX, jnp.asarray(pts), "norm"))
    Yc = np.asarray(real_sph_harm(LMAX, jnp.asarray(pts), "component"))
    for l in range(LMAX + 1):
        sl = slice(l * l, l * l + 2 * l + 1)
        assert np.allclose((Yn[:, sl] ** 2).sum(-1), 1.0, atol=1e-5)
        assert np.allclose((Yc[:, sl] ** 2).sum(-1), 2 * l + 1, atol=1e-4)


def test_edge_frame_properties():
    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(64, 3)).astype(np.float32)
    # include hard cases: exactly along axes
    vecs[0] = [0, 0, 1.5]
    vecs[1] = [0, 0, -2.0]
    vecs[2] = [0, 1e-4, 1.0]
    vecs[3] = [1.0, 0, 0]
    rot = np.asarray(R.edge_frame(jnp.asarray(vecs)))
    # orthonormal, det +1
    eye = np.eye(3)
    assert np.allclose(rot @ rot.transpose(0, 2, 1), eye[None], atol=1e-5)
    assert np.allclose(np.linalg.det(rot), 1.0, atol=1e-5)
    # maps v_hat to z
    vhat = vecs / np.linalg.norm(vecs, axis=-1, keepdims=True)
    z = np.einsum("eij,ej->ei", rot, vhat)
    assert np.allclose(z, np.array([0, 0, 1.0])[None], atol=1e-5)


def test_angles_reconstruct_rotation():
    rng = np.random.default_rng(4)
    vecs = rng.normal(size=(32, 3)).astype(np.float32)
    vecs[0] = [0, 0, 1.0]
    vecs[1] = [0, 0, -1.0]
    rot = np.asarray(R.edge_frame(jnp.asarray(vecs)))
    a, b, g = (np.asarray(t) for t in R.frame_to_zyz_angles(jnp.asarray(rot)))
    for i in range(len(vecs)):
        assert np.allclose(rotmat_zyz(a[i], b[i], g[i]), rot[i], atol=1e-4), i


def test_wigner_blocks_match_sph():
    """compute_wigner blocks rotate SH vectors exactly like the 3x3 frame."""
    rng = np.random.default_rng(5)
    vecs = rng.normal(size=(16, 3)).astype(np.float32)
    vecs[0] = [0, 0, 1.0]
    vecs[1] = [0, 0, -1.0]
    rot = np.asarray(R.edge_frame(jnp.asarray(vecs)))
    wig = R.compute_wigner_blocks(LMAX, jnp.asarray(vecs))

    pts = rng.normal(size=(16, 3))
    pts /= np.linalg.norm(pts, axis=-1, keepdims=True)
    Y = np.asarray(real_sph_harm(LMAX, jnp.asarray(pts)))
    rp = np.einsum("eij,ej->ei", rot, pts)
    Yr = np.asarray(real_sph_harm(LMAX, jnp.asarray(rp)))
    for l in range(LMAX + 1):
        D = np.asarray(wig.blocks[l])
        sl = slice(l * l, l * l + 2 * l + 1)
        got = np.einsum("eij,ej->ei", D, Y[:, sl])
        assert np.allclose(got, Yr[:, sl], atol=2e-4), l


def test_edge_aligned_is_m0_only():
    """After rotating into the edge frame, Y(v_hat) has only m=0 components."""
    rng = np.random.default_rng(6)
    vecs = rng.normal(size=(8, 3)).astype(np.float32)
    vhat = vecs / np.linalg.norm(vecs, axis=-1, keepdims=True)
    wig = R.compute_wigner_blocks(LMAX, jnp.asarray(vecs))
    Y = np.asarray(real_sph_harm(LMAX, jnp.asarray(vhat)))
    for l in range(1, LMAX + 1):
        D = np.asarray(wig.blocks[l])
        sl = slice(l * l, l * l + 2 * l + 1)
        got = np.einsum("eij,ej->ei", D, Y[:, sl])
        mask = np.ones(2 * l + 1, dtype=bool)
        mask[l] = False  # m = 0 at center
        assert np.abs(got[:, mask]).max() < 2e-4, l


def test_rotate_roundtrip_full_mmax():
    lay = layout(LMAX, LMAX)
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(8, 3)).astype(np.float32)
    x = rng.normal(size=(8, (LMAX + 1) ** 2, 16)).astype(np.float32)
    wig = R.compute_wigner_blocks(LMAX, jnp.asarray(vecs))
    xe = R.rotate_to_edge(wig, jnp.asarray(x), lay)
    back = np.asarray(R.rotate_from_edge(wig, xe, lay))
    assert np.allclose(back, x, atol=1e-4)


def test_factored_matches_blocks():
    """The MXU-friendly Xa-J-Xb-J-Xc factored path == explicit blocks path,
    for both full and mmax-truncated layouts, both directions."""
    rng = np.random.default_rng(8)
    vecs = rng.normal(size=(12, 3)).astype(np.float32)
    vecs[0] = [0, 0, 1.0]
    vecs[1] = [0, 0, -1.0]
    x = rng.normal(size=(12, (LMAX + 1) ** 2, 8)).astype(np.float32)
    blocks = R.compute_wigner_blocks(LMAX, jnp.asarray(vecs))
    factors = R.compute_wigner(LMAX, jnp.asarray(vecs))
    assert isinstance(factors, R.WignerFactors)
    for mmax in (LMAX, 2, 1):
        lay = layout(LMAX, mmax)
        a = np.asarray(R.rotate_to_edge(blocks, jnp.asarray(x), lay))
        b = np.asarray(R.rotate_to_edge(factors, jnp.asarray(x), lay))
        assert np.abs(a - b).max() < 5e-4, (mmax, np.abs(a - b).max())
        xr = rng.normal(size=a.shape).astype(np.float32)
        ia = np.asarray(R.rotate_from_edge(blocks, jnp.asarray(xr), lay))
        ib = np.asarray(R.rotate_from_edge(factors, jnp.asarray(xr), lay))
        assert np.abs(ia - ib).max() < 5e-4, (mmax, np.abs(ia - ib).max())


def test_layout_perms():
    lay = layout(4, 2)
    assert lay.num_coefficients == 1 + 3 + 5 + 5 + 5
    # round trip of the permutation
    x = np.arange(lay.num_coefficients)
    assert np.array_equal(x[lay.to_m_perm][lay.from_m_perm], x)
    # m-primary starts with the m=0 block: one coeff per degree
    assert lay.m_size.tolist() == [5, 4, 3]
    assert np.array_equal(
        lay.m_complex[lay.to_m_perm][:5], np.zeros(5, dtype=np.int32)
    )

"""Numerics-parity evidence (VERDICT r1 #2).

Three independent derivation paths cross-check the core math:
1. Wigner little-d vs the matrix exponential of the angular-momentum
   operator J_y (scipy.linalg.expm) — a construction sharing NO code with
   ops/wigner_np.py's factorial-sum formula.
2. Real spherical harmonics vs scipy.special.sph_harm_y (independent
   library), converted to our real basis.
3. Weight-port harness (utils/port.py): PyTorch modules implementing the
   REFERENCE layer semantics (SO3_LinearV2 so3.py:698-739, SO2_Convolution
   so2_ops.py:64-204, RadialFunction radial_function.py:5-30) are
   initialized in torch, their state_dicts ported to flax, and forward
   outputs asserted equal — the load-a-reference-checkpoint parity path.
"""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from equivarianttransformermpnn4quantumcomputations_tpu.ops import wigner_np as W
from equivarianttransformermpnn4quantumcomputations_tpu.ops.irreps import layout
from equivarianttransformermpnn4quantumcomputations_tpu.ops.sph import (
    real_sph_harm,
)
from equivarianttransformermpnn4quantumcomputations_tpu.utils.port import (
    port_radial_mlp,
    port_so2_conv,
    port_so3_linear,
)


# ── 1. Wigner-d vs expm(-i beta J_y) ─────────────────────────────────────


@pytest.mark.parametrize("l", [1, 2, 3, 4, 6])
def test_complex_wigner_d_matches_expm(l):
    """d^l(beta) = exp(-i beta J_y) in the |l,m> basis (m = -l..l).

    J_y = (J_+ - J_-) / 2i with J_± |l,m> = sqrt(l(l+1) - m(m±1)) |l,m±1>.
    Fully independent of the factorial-sum formula in wigner_np.py.
    """
    from scipy.linalg import expm

    dim = 2 * l + 1
    Jp = np.zeros((dim, dim), complex)
    for m in range(-l, l):
        # <l, m+1| J_+ |l, m>
        Jp[m + 1 + l, m + l] = math.sqrt(l * (l + 1) - m * (m + 1))
    Jm = Jp.conj().T
    Jy = (Jp - Jm) / 2j

    for beta in (0.3, 0.7, 1.9, np.pi - 0.05):
        golden = expm(-1j * beta * Jy)
        assert np.abs(golden.imag).max() < 1e-10
        ours = W.complex_wigner_d(l, beta)
        assert np.abs(golden.real - ours).max() < 1e-10, (l, beta)


# ── 2. real SH vs scipy ──────────────────────────────────────────────────


def test_real_sph_harm_matches_scipy():
    """Our real SH == scipy complex SH converted with our U convention
    (ops/wigner_np.py:real_to_complex_U: real functions WITHOUT
    Condon-Shortley, complex Y_l^m WITH it — scipy includes CS)."""
    from scipy.special import sph_harm_y

    lmax = 4
    rng = np.random.default_rng(0)
    v = rng.normal(size=(50, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    theta = np.arccos(np.clip(v[:, 2], -1, 1))       # polar from +z
    phi = np.arctan2(v[:, 1], v[:, 0])

    ours = np.asarray(real_sph_harm(lmax, jnp.asarray(v), "integral"))
    for l in range(lmax + 1):
        for m in range(0, l + 1):
            Ylm = sph_harm_y(l, m, theta, phi)       # CS-phased complex
            if m == 0:
                golden = Ylm.real
                assert np.abs(ours[:, l * l + l] - golden).max() < 1e-6, l
            else:
                Ylmneg = sph_harm_y(l, -m, theta, phi)
                cos_part = ((-1.0) ** m * Ylm + Ylmneg) / math.sqrt(2)
                sin_part = ((-1.0) ** m * Ylm - Ylmneg) / (1j * math.sqrt(2))
                assert np.abs(cos_part.imag).max() < 1e-10
                assert (
                    np.abs(ours[:, l * l + l + m] - cos_part.real).max()
                    < 1e-6
                ), (l, m)
                assert (
                    np.abs(ours[:, l * l + l - m] - sin_part.real).max()
                    < 1e-6
                ), (l, -m)


# ── 3. weight-port harness: torch reference semantics -> flax ────────────


def _torch_so3_linear(lmax, cin, cout):
    """Reference SO3_LinearV2 semantics (so3.py:698-739) in plain torch."""
    import torch

    torch.manual_seed(0)
    w = torch.empty(lmax + 1, cout, cin).uniform_(-0.5, 0.5)
    b = torch.empty(cout).uniform_(-0.1, 0.1)

    def forward(x):  # x [N, (L+1)^2, Cin]
        expand = torch.cat(
            [torch.full((2 * l + 1,), l, dtype=torch.long) for l in range(lmax + 1)]
        )
        wk = w[expand]                                  # [K, Cout, Cin]
        out = torch.einsum("bmi,moi->bmo", x, wk)
        out[:, 0, :] = out[:, 0, :] + b
        return out

    return {"weight": w, "bias": b}, forward


def test_port_so3_linear_torch_parity():
    import torch

    from equivarianttransformermpnn4quantumcomputations_tpu.nn.so3_layers import (
        SO3Linear,
    )

    lmax, cin, cout, n = 3, 6, 5, 7
    sd, fwd = _torch_so3_linear(lmax, cin, cout)
    rng = np.random.default_rng(1)
    x = rng.normal(size=(n, (lmax + 1) ** 2, cin)).astype(np.float32)
    golden = fwd(torch.from_numpy(x)).numpy()

    mod = SO3Linear(in_features=cin, out_features=cout, lmax=lmax)
    params = {"params": port_so3_linear(sd)}
    ours = np.asarray(mod.apply(params, jnp.asarray(x)))
    assert np.abs(ours - golden).max() < 1e-5


def _torch_so2_conv(lay, cin, cout, extra, rad_channels=None):
    """Reference SO2_Convolution semantics (so2_ops.py:64-204) in torch."""
    import torch

    torch.manual_seed(1)
    L0 = int(lay.m_size[0])
    sd = {}
    fc_m0_w = torch.empty(extra + L0 * cout, L0 * cin).uniform_(-0.3, 0.3)
    fc_m0_b = torch.empty(extra + L0 * cout).uniform_(-0.1, 0.1)
    sd["fc_m0.weight"] = fc_m0_w
    sd["fc_m0.bias"] = fc_m0_b
    for m in range(1, lay.mmax + 1):
        Lm = int(lay.m_size[m])
        w = torch.empty(2 * Lm * cout, Lm * cin).uniform_(-0.3, 0.3)
        w *= 1 / math.sqrt(2)  # reference init scale (so2_ops.py:50)
        sd[f"so2_m_conv.{m - 1}.fc.weight"] = w
    rad_lins = []
    if rad_channels is not None:
        n_rad = int(lay.m_size.sum()) * cin
        chs = list(rad_channels) + [n_rad]
        for i in range(1, len(chs)):
            lw = torch.empty(chs[i], chs[i - 1]).uniform_(-0.2, 0.2)
            lb = torch.empty(chs[i]).uniform_(-0.1, 0.1)
            j = 3 * (i - 1)
            sd[f"rad_func.net.{j}.weight"] = lw
            sd[f"rad_func.net.{j}.bias"] = lb
            if i < len(chs) - 1:
                sd[f"rad_func.net.{j + 1}.weight"] = torch.ones(chs[i])
                sd[f"rad_func.net.{j + 1}.bias"] = torch.zeros(chs[i])
            rad_lins.append((i, chs[i]))

    def rad_forward(e):
        import torch.nn.functional as Fn

        chs = list(rad_channels) + [int(lay.m_size.sum()) * cin]
        h = e
        for i in range(1, len(chs)):
            j = 3 * (i - 1)
            h = h @ sd[f"rad_func.net.{j}.weight"].T + sd[f"rad_func.net.{j}.bias"]
            if i < len(chs) - 1:
                h = Fn.layer_norm(
                    h, (chs[i],), sd[f"rad_func.net.{j + 1}.weight"],
                    sd[f"rad_func.net.{j + 1}.bias"],
                )
                h = Fn.silu(h)
        return h

    def forward(x, edge=None):  # x [E, K_red, Cin] l-primary
        E = x.shape[0]
        xm = x[:, torch.from_numpy(np.asarray(lay.to_m_perm)).long(), :]
        rad = rad_forward(edge) if rad_channels is not None else None
        off_rad = 0
        outs = []
        x0 = xm[:, :L0, :].reshape(E, L0 * cin)
        if rad is not None:
            x0 = x0 * rad[:, : L0 * cin]
            off_rad = L0 * cin
        y0 = x0 @ fc_m0_w.T + fc_m0_b
        x0_extra = y0[:, :extra]
        outs.append(y0[:, extra:].reshape(E, L0, cout))
        offset = L0
        for m in range(1, lay.mmax + 1):
            Lm = int(lay.m_size[m])
            x_m = xm[:, offset : offset + 2 * Lm, :].reshape(E, 2, Lm * cin)
            if rad is not None:
                x_m = x_m * rad[:, None, off_rad : off_rad + Lm * cin]
                off_rad += Lm * cin
            w = sd[f"so2_m_conv.{m - 1}.fc.weight"]
            y = x_m @ w.T                      # [E, 2, 2*Lm*cout]
            half = Lm * cout
            x_r, x_i = y[:, :, :half], y[:, :, half:]
            y_r = x_r[:, 0] - x_i[:, 1]
            y_i = x_r[:, 1] + x_i[:, 0]
            outs.append(
                torch.cat([y_r, y_i], dim=1).reshape(E, 2 * Lm, cout)
            )
            offset += 2 * Lm
        out_m = torch.cat(outs, dim=1)
        inv = torch.from_numpy(np.asarray(lay.from_m_perm)).long()
        return out_m[:, inv, :], x0_extra

    return sd, forward


@pytest.mark.parametrize("with_rad", [False, True])
def test_port_so2_conv_torch_parity(with_rad):
    import torch

    from equivarianttransformermpnn4quantumcomputations_tpu.nn.so3_layers import (
        SO2Conv,
    )

    lay = layout(3, 2)
    cin, cout, extra, n = 4, 3, 5, 6
    rad = (8, 8) if with_rad else None
    sd, fwd = _torch_so2_conv(lay, cin, cout, extra, rad)
    rng = np.random.default_rng(2)
    x = rng.normal(size=(n, lay.num_coefficients, cin)).astype(np.float32)
    edge = rng.normal(size=(n, 8)).astype(np.float32) if with_rad else None

    golden, golden_extra = fwd(
        torch.from_numpy(x),
        torch.from_numpy(edge) if with_rad else None,
    )
    mod = SO2Conv(
        layout=lay, in_channels=cin, out_channels=cout, extra_m0=extra,
        rad_channels=rad,
    )
    params = {"params": port_so2_conv(sd, mmax=lay.mmax)}
    ours, ours_extra = mod.apply(
        params, jnp.asarray(x), jnp.asarray(edge) if with_rad else None
    )
    assert np.abs(np.asarray(ours) - golden.numpy()).max() < 1e-5
    assert np.abs(np.asarray(ours_extra) - golden_extra.numpy()).max() < 1e-5


def test_port_radial_mlp_torch_parity():
    import torch
    import torch.nn.functional as Fn

    from equivarianttransformermpnn4quantumcomputations_tpu.nn.layers import (
        RadialMLP,
    )

    torch.manual_seed(3)
    chs = [6, 10, 7]
    sd = {}
    for i in range(1, len(chs)):
        j = 3 * (i - 1)
        sd[f"net.{j}.weight"] = torch.empty(chs[i], chs[i - 1]).uniform_(-0.3, 0.3)
        sd[f"net.{j}.bias"] = torch.empty(chs[i]).uniform_(-0.1, 0.1)
        if i < len(chs) - 1:
            sd[f"net.{j + 1}.weight"] = torch.rand(chs[i]) + 0.5
            sd[f"net.{j + 1}.bias"] = torch.rand(chs[i]) - 0.5

    def fwd(x):
        h = x
        for i in range(1, len(chs)):
            j = 3 * (i - 1)
            h = h @ sd[f"net.{j}.weight"].T + sd[f"net.{j}.bias"]
            if i < len(chs) - 1:
                h = Fn.layer_norm(
                    h, (chs[i],), sd[f"net.{j + 1}.weight"], sd[f"net.{j + 1}.bias"]
                )
                h = Fn.silu(h)
        return h

    rng = np.random.default_rng(4)
    x = rng.normal(size=(9, 6)).astype(np.float32)
    golden = fwd(torch.from_numpy(x)).numpy()
    mod = RadialMLP(channels=tuple(chs))
    params = {"params": port_radial_mlp(sd)}
    ours = np.asarray(mod.apply(params, jnp.asarray(x)))
    assert np.abs(ours - golden).max() < 1e-5


def test_qm9_split_bitwise_matches_torch_random_split():
    """The QM9 split must share the reference's EXACT test molecules
    (reference data_loader_qm9_v4.py:278-287: torch.random_split seed 42) —
    required for MAE parity comparisons (VERDICT r1 weak #7)."""
    import torch

    from equivarianttransformermpnn4quantumcomputations_tpu.data.qm9 import (
        qm9_random_split,
    )

    n = 130831  # QM9 molecule count (BASELINE.md)
    tr, va, te = qm9_random_split(n)
    a, b, c = torch.utils.data.random_split(
        list(range(n)), [len(tr), len(va), len(te)],
        generator=torch.Generator().manual_seed(42),
    )
    assert np.array_equal(tr, np.asarray(a.indices))
    assert np.array_equal(va, np.asarray(b.indices))
    assert np.array_equal(te, np.asarray(c.indices))

"""GOLDEN parity: the reference's ACTUAL torch modules, imported verbatim
from /root/reference (read-only), vs this framework's flax re-designs.

Unlike tests/test_parity_numerics.py (which checks against re-transcribed
reference semantics), every reference class here is executed from the
reference's own source file — so a transcription error cannot hide on both
sides.  Only torch-only reference modules qualify (no e3nn /
torch_geometric imports):

* EquiformerV2Functions/activation.py      (all 8 activation variants)
* EquiformerV2Functions/layer_norm.py      (4 norms + DegreeLayerScale)
* EquiformerV2Functions/radial_function.py (RadialFunction)
* NewFunctions/Gotennet_morethaninspired/activation.py (HTR :166,
  GATAValueActivation :270)

The e3nn-dependent geometry (Wigner matrices, SH, S2 grids) is verified
independently against scipy in test_parity_numerics.py; the S2-activation
checks below inject OUR grid tables into the REFERENCE einsum code via a
mock SO3_Grid, which pins the activation/einsum composition.
"""

import importlib.util
import math
import pathlib
import sys

import numpy as np

from equivarianttransformermpnn4quantumcomputations_tpu.utils import flags
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from equivarianttransformermpnn4quantumcomputations_tpu.nn import layers as L
from equivarianttransformermpnn4quantumcomputations_tpu.nn import norms as N
from equivarianttransformermpnn4quantumcomputations_tpu.nn.activations import (
    gate_activation,
    s2_activation,
    separable_s2_activation,
)
from equivarianttransformermpnn4quantumcomputations_tpu.nn.gata import (
    GATAValueActivation,
    HTR,
)
from equivarianttransformermpnn4quantumcomputations_tpu.ops.s2grid import s2grid
from equivarianttransformermpnn4quantumcomputations_tpu.utils.port import (
    port_gata_value_activation,
    port_htr,
    port_norm,
    port_radial_mlp,
)

REF = pathlib.Path("/root/reference/models")

pytestmark = pytest.mark.skipif(
    not REF.exists(), reason="reference checkout not present"
)


def _load(name: str, rel: str):
    """Import a reference module verbatim from its source file."""
    spec = importlib.util.spec_from_file_location(name, REF / rel)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_act():
    return _load("ref_eqv2_activation", "EquiformerV2Functions/activation.py")


@pytest.fixture(scope="module")
def ref_ln():
    m = _load("ref_eqv2_layer_norm", "EquiformerV2Functions/layer_norm.py")
    # EquivariantDegreeLayerScale:354-380 uses math.sqrt without importing
    # math (latent reference bug, fixed in nn/norms.py); inject the module
    # so the reference class is runnable for the comparison.
    m.math = math
    return m


@pytest.fixture(scope="module")
def ref_rad():
    return _load(
        "ref_eqv2_radial", "EquiformerV2Functions/radial_function.py"
    )


@pytest.fixture(scope="module")
def ref_gata():
    return _load(
        "ref_gata_activation",
        "NewFunctions/Gotennet_morethaninspired/activation.py",
    )


def _t(x):
    return torch.from_numpy(np.asarray(x))


def _close(ours, theirs, tol=1e-5):
    np.testing.assert_allclose(
        np.asarray(ours), theirs.detach().numpy(), rtol=tol, atol=tol
    )


# ── elementwise activations ─────────────────────────────────────────────────


def test_elementwise_activations(ref_act):
    x = np.random.default_rng(0).normal(size=(64, 32)).astype(np.float32)
    xt = _t(x)
    xj = jnp.asarray(x)
    with torch.no_grad():
        _close(L.scaled_silu(xj), ref_act.ScaledSiLU()(xt))
        _close(L.smooth_leaky_relu(xj), ref_act.SmoothLeakyReLU(0.2)(xt))
        _close(
            L.scaled_smooth_leaky_relu(xj),
            ref_act.ScaledSmoothLeakyReLU()(xt),
        )
        _close(L.scaled_sigmoid(xj), ref_act.ScaledSigmoid()(xt))


@pytest.mark.parametrize("scaled", [False, True])
def test_swiglu(ref_act, scaled):
    rng = np.random.default_rng(1)
    cin, cout = 24, 16
    x = rng.normal(size=(32, cin)).astype(np.float32)
    ref = (ref_act.ScaledSwiGLU if scaled else ref_act.SwiGLU)(cin, cout)
    mod = (L.ScaledSwiGLU if scaled else L.SwiGLU)(out_channels=cout)
    params = {
        "params": {
            "Dense_0": {
                "kernel": ref.w.weight.detach().numpy().T,
                "bias": ref.w.bias.detach().numpy(),
            }
        }
    }
    with torch.no_grad():
        _close(mod.apply(params, jnp.asarray(x)), ref(_t(x)))


# ── gate / S2 activations ───────────────────────────────────────────────────


@pytest.mark.parametrize("lmax,mmax", [(2, 1), (4, 2), (3, 3)])
def test_gate_activation(ref_act, lmax, mmax):
    rng = np.random.default_rng(2)
    C = 8
    K_red = 1 + sum(min(2 * l + 1, 2 * mmax + 1) for l in range(1, lmax + 1))
    g = rng.normal(size=(16, lmax * C)).astype(np.float32)
    x = rng.normal(size=(16, K_red, C)).astype(np.float32)
    ref = ref_act.GateActivation(lmax, mmax, C)
    with torch.no_grad():
        golden = ref(_t(g), _t(x))
    _close(gate_activation(jnp.asarray(g), jnp.asarray(x), lmax, mmax, C),
           golden)


class _MockSO3Grid:
    """Duck-types the reference SO3_Grid: returns OUR grid tables so the
    reference S2Activation einsums run on identical matrices."""

    def __init__(self, grid):
        self._to = torch.from_numpy(np.asarray(grid.to_grid_mat))
        self._from = torch.from_numpy(np.asarray(grid.from_grid_mat))

    def get_to_grid_mat(self, device=None):
        return self._to

    def get_from_grid_mat(self, device=None):
        return self._from


@pytest.mark.parametrize("lmax,mmax", [(2, 2), (4, 2)])
def test_s2_activation(ref_act, monkeypatch, lmax, mmax):
    monkeypatch.setattr(flags, "_DEFAULT", flags.patched(s2_fused="off"))  # XLA path (CPU numerics)
    rng = np.random.default_rng(3)
    C = 8
    grid = s2grid(lmax, mmax, resolution=18)
    K_red = int(grid.to_grid_mat.shape[2])
    x = rng.normal(size=(16, K_red, C)).astype(np.float32)
    so3_grid = {lmax: {mmax: _MockSO3Grid(grid)}}
    ref = ref_act.S2Activation(lmax, mmax)
    with torch.no_grad():
        golden = ref(_t(x), so3_grid)
    _close(s2_activation(jnp.asarray(x), grid), golden, tol=3e-5)


@pytest.mark.parametrize("lmax,mmax", [(4, 2)])
def test_separable_s2_activation(ref_act, monkeypatch, lmax, mmax):
    monkeypatch.setattr(flags, "_DEFAULT", flags.patched(s2_fused="off"))
    rng = np.random.default_rng(4)
    C = 8
    grid = s2grid(lmax, mmax, resolution=18)
    K_red = int(grid.to_grid_mat.shape[2])
    x = rng.normal(size=(16, K_red, C)).astype(np.float32)
    g = rng.normal(size=(16, C)).astype(np.float32)
    so3_grid = {lmax: {mmax: _MockSO3Grid(grid)}}
    ref = ref_act.SeparableS2Activation(lmax, mmax)
    with torch.no_grad():
        golden = ref(_t(g), _t(x), so3_grid)
    _close(
        separable_s2_activation(jnp.asarray(g), jnp.asarray(x), grid),
        golden, tol=3e-5,
    )


# ── radial function ─────────────────────────────────────────────────────────


def test_radial_function(ref_rad):
    rng = np.random.default_rng(5)
    chans = [16, 32, 24]
    ref = ref_rad.RadialFunction(chans)
    x = rng.normal(size=(32, chans[0])).astype(np.float32)
    params = {"params": port_radial_mlp(ref.state_dict())}
    mod = L.RadialMLP(tuple(chans))
    with torch.no_grad():
        _close(mod.apply(params, jnp.asarray(x)), ref(_t(x)))


# ── equivariant norms ───────────────────────────────────────────────────────

LMAX_NORM = 4
C_NORM = 16


def _norm_input(seed=6, n=32):
    rng = np.random.default_rng(seed)
    K = (LMAX_NORM + 1) ** 2
    return (rng.normal(size=(n, K, C_NORM)).astype(np.float32) * 2.0 + 0.3)


def _randomize(ref):
    """Perturb the reference's affine params away from init so the port is
    actually exercised (ones/zeros would make transposition bugs invisible)."""
    g = torch.Generator().manual_seed(0)
    with torch.no_grad():
        for p in ref.parameters():
            p.add_(torch.rand(p.shape, generator=g) * 0.5 - 0.25)
    return ref


def test_norm_layer_norm(ref_ln):
    ref = _randomize(ref_ln.EquivariantLayerNormArray(LMAX_NORM, C_NORM))
    x = _norm_input()
    mod = N.EquivariantLayerNorm(lmax=LMAX_NORM, num_channels=C_NORM)
    params = {"params": port_norm(ref.state_dict(), "layer_norm")}
    with torch.no_grad():
        _close(mod.apply(params, jnp.asarray(x)), ref(_t(x)))


def test_norm_layer_norm_sh(ref_ln):
    ref = _randomize(
        ref_ln.EquivariantLayerNormArraySphericalHarmonics(LMAX_NORM, C_NORM)
    )
    x = _norm_input(7)
    mod = N.EquivariantLayerNormSH(lmax=LMAX_NORM, num_channels=C_NORM)
    params = {"params": port_norm(ref.state_dict(), "layer_norm_sh")}
    with torch.no_grad():
        _close(mod.apply(params, jnp.asarray(x)), ref(_t(x)))


def test_norm_rms_norm_sh_v1(ref_ln):
    ref = _randomize(
        ref_ln.EquivariantRMSNormArraySphericalHarmonics(LMAX_NORM, C_NORM)
    )
    x = _norm_input(8)
    mod = N.EquivariantRMSNormSH(
        lmax=LMAX_NORM, num_channels=C_NORM,
        centering=False, std_balance_degrees=False,
    )
    params = {"params": port_norm(ref.state_dict(), "rms_norm_sh_v1")}
    with torch.no_grad():
        _close(mod.apply(params, jnp.asarray(x)), ref(_t(x)))


def test_norm_rms_norm_sh_v2(ref_ln):
    ref = _randomize(
        ref_ln.EquivariantRMSNormArraySphericalHarmonicsV2(LMAX_NORM, C_NORM)
    )
    x = _norm_input(9)
    mod = N.EquivariantRMSNormSH(lmax=LMAX_NORM, num_channels=C_NORM)
    params = {"params": port_norm(ref.state_dict(), "rms_norm_sh")}
    with torch.no_grad():
        _close(mod.apply(params, jnp.asarray(x)), ref(_t(x)))


def test_degree_layer_scale(ref_ln):
    ref = _randomize(ref_ln.EquivariantDegreeLayerScale(LMAX_NORM, C_NORM))
    x = _norm_input(10)
    mod = N.EquivariantDegreeLayerScale(lmax=LMAX_NORM, num_channels=C_NORM)
    params = {"params": port_norm(ref.state_dict(), "degree_layer_scale")}
    with torch.no_grad():
        _close(mod.apply(params, jnp.asarray(x)), ref(_t(x)))


# ── GATA core: HTR and the value activation ────────────────────────────────


def test_htr_golden(ref_gata):
    rng = np.random.default_rng(11)
    lmax, sphere, edge = 4, 24, 32
    Km1 = (lmax + 1) ** 2 - 1
    E = 48
    ref = ref_gata.HTR(sphere, edge, lmax)
    t_ij = rng.normal(size=(E, edge)).astype(np.float32)
    X_i = rng.normal(size=(E, Km1, sphere)).astype(np.float32)
    X_j = rng.normal(size=(E, Km1, sphere)).astype(np.float32)
    rl = rng.normal(size=(E, Km1)).astype(np.float32)
    with torch.no_grad():
        golden = ref(_t(t_ij), _t(X_i), _t(X_j), _t(rl))
    mod = HTR(sphere_channels=sphere, edge_channels=edge, lmax=lmax)
    params = {"params": port_htr(ref.state_dict(), lmax)}
    _close(
        mod.apply(params, jnp.asarray(t_ij), jnp.asarray(X_i),
                  jnp.asarray(X_j), jnp.asarray(rl)),
        golden, tol=2e-5,
    )


@pytest.mark.parametrize("lmax,mmax", [(4, 2), (2, 2)])
def test_gata_value_activation_golden(ref_gata, lmax, mmax):
    rng = np.random.default_rng(12)
    sphere, hidden, edge = 24, 16, 32
    S = 1 + 2 * lmax
    Km1 = (lmax + 1) ** 2 - 1
    E = 48
    ref = ref_gata.GATAValueActivation(sphere, hidden, edge, lmax, mmax)
    attn = rng.normal(size=(E, S * hidden)).astype(np.float32)
    t_ij = rng.normal(size=(E, edge)).astype(np.float32)
    h_j = rng.normal(size=(E, sphere)).astype(np.float32)
    X_j = rng.normal(size=(E, Km1, sphere)).astype(np.float32)
    rl = rng.normal(size=(E, Km1)).astype(np.float32)
    with torch.no_grad():
        golden = ref(_t(attn), _t(t_ij), _t(h_j), _t(X_j), _t(rl))
    mod = GATAValueActivation(
        sphere_channels=sphere, hidden_channels=hidden, edge_channels=edge,
        lmax=lmax, mmax=mmax,
    )
    params = {"params": port_gata_value_activation(ref.state_dict())}
    _close(
        mod.apply(params, jnp.asarray(attn), jnp.asarray(t_ij),
                  jnp.asarray(h_j), jnp.asarray(X_j), jnp.asarray(rl)),
        golden, tol=2e-5,
    )

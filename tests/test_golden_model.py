"""GOLDEN full-model parity: ENTIRE reference models imported verbatim and
run against this framework's models with ported state_dicts (VERDICT r3
Missing #1).

* MatPES GATA-V2 (reference equiformerv2_MatPES_GATAV2.py:79-438): full
  forward (embedding -> EdgeDegreeEmbedding -> t_ij init -> N blocks ->
  norm -> energy head) AND autograd forces compared on one batch.
* QM9 (reference equiformerv2_qm9.py:97-697): full forward with all 12
  vmapped heads compared on one batch.

This catches assembly-level drift block-level parity cannot: head wiring,
rescale factors, avg_degree, t_ij initialization, final-norm placement.

Environmental shims (none touch the computation under test):

* ``fairchem`` — registry decorator, BackboneInterface base, and
  GaussianSmearing; the smearing shim is the reference's own local copy
  (equiformerv2_oc20.py:43-60), whose numerics our nn/layers.py
  GaussianSmearing reproduces (identical offsets/coeff formula).
* ``e3nn.o3`` — SphericalHarmonics replaced with OUR real SH
  (ops/sph.py, 'norm' normalization exactly as the reference requests at
  equiformerv2_MatPES_GATAV2.py:137-140).
* ``SO3_Grid`` — replaced with a shim returning OUR s2grid tables, so both
  sides run identical grid matrices (same approach as the golden S2-act
  tests).
* Wigner geometry — the reference's ``init_edge_rot_mat`` +
  ``SO3_Rotation.set_wigner`` pipeline is replaced by OUR
  ``compute_wigner_blocks`` assembled block-diagonally, so both sides
  rotate with identical matrices (our J matrices are independently
  verified <1e-10 vs expm in test_parity_numerics.py).  This isolates
  module/assembly semantics from the (already verified) geometry.
"""

import importlib
import pathlib
import sys
import types

import numpy as np

from equivarianttransformermpnn4quantumcomputations_tpu.utils import flags
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from equivarianttransformermpnn4quantumcomputations_tpu.data.graph import (
    GraphSample,
    collate,
)
from equivarianttransformermpnn4quantumcomputations_tpu.models.matpes import (
    EquiformerV2MatPES,
    matpes_energy_forces_stress,
)
from equivarianttransformermpnn4quantumcomputations_tpu.models.qm9 import (
    EquiformerV2QM9,
)
from equivarianttransformermpnn4quantumcomputations_tpu.ops.irreps import (
    layout as get_layout,
)
from equivarianttransformermpnn4quantumcomputations_tpu.ops.rotation import (
    compute_wigner_blocks,
)
from equivarianttransformermpnn4quantumcomputations_tpu.ops.s2grid import s2grid
from equivarianttransformermpnn4quantumcomputations_tpu.ops.sph import (
    real_sph_harm,
)
from equivarianttransformermpnn4quantumcomputations_tpu.ops.wigner_np import (
    J_matrix,
)
from equivarianttransformermpnn4quantumcomputations_tpu.utils.port import (
    port_matpes_model,
    port_qm9_model,
)

REF = pathlib.Path("/root/reference/models")

pytestmark = pytest.mark.skipif(
    not REF.exists(), reason="reference checkout not present"
)


# ── shims ───────────────────────────────────────────────────────────────────


def _z_rot_mat(angle, l):
    shape = angle.shape
    M = angle.new_zeros((*shape, 2 * l + 1, 2 * l + 1))
    inds = torch.arange(0, 2 * l + 1, 1)
    reversed_inds = torch.arange(2 * l, -1, -1)
    frequencies = torch.arange(l, -l - 1, -1, dtype=angle.dtype)
    M[..., inds, reversed_inds] = torch.sin(frequencies * angle[..., None])
    M[..., inds, inds] = torch.cos(frequencies * angle[..., None])
    return M


def _segment_softmax(src, index, num_nodes=None):
    N = int(index.max().item()) + 1 if index.numel() else 1
    idx = index.view(-1, *([1] * (src.dim() - 1))).expand_as(src)
    mx = torch.full((N, *src.shape[1:]), float("-inf"), dtype=src.dtype)
    mx = mx.scatter_reduce(0, idx, src, reduce="amax", include_self=False)
    out = (src - mx[index]).exp()
    den = torch.zeros((N, *src.shape[1:]), dtype=src.dtype)
    den = den.index_add(0, index, out)
    return out / (den[index] + 1e-16)


class _SphericalHarmonicsShim(torch.nn.Module):
    """e3nn o3.SphericalHarmonics stand-in evaluating OUR real SH."""

    def __init__(self, irreps, normalize=False, normalization="norm"):
        super().__init__()
        self.lmax = int(irreps)
        self.normalize = normalize
        self.normalization = normalization

    def forward(self, x):
        v = x.detach().cpu().numpy()
        if self.normalize:
            v = v / np.maximum(
                np.linalg.norm(v, axis=-1, keepdims=True), 1e-12
            )
        sh = np.asarray(
            real_sph_harm(
                self.lmax, jnp.asarray(v), normalization=self.normalization
            )
        )
        return torch.from_numpy(sh).to(x.dtype)


class _SO3GridShim(torch.nn.Module):
    """Reference SO3_Grid stand-in built on OUR s2grid tables (lazy)."""

    def __init__(self, lmax, mmax, normalization="integral", resolution=None):
        super().__init__()
        self.lmax, self.mmax = lmax, mmax
        self.resolution = resolution
        self._to = self._from = None

    def _build(self):
        if self._to is None:
            g = s2grid(self.lmax, self.mmax, self.resolution)
            self._to = torch.from_numpy(np.asarray(g.to_grid_mat)).float()
            self._from = torch.from_numpy(np.asarray(g.from_grid_mat)).float()

    def get_to_grid_mat(self, device=None):
        self._build()
        return self._to

    def get_from_grid_mat(self, device=None):
        self._build()
        return self._from


def _set_wigner_ours(self, edge_vec):
    """SO3_Rotation.set_wigner stand-in: OUR Wigner blocks, block-diagonal.

    ``edge_vec`` arrives as the raw [E, 3] edge vectors because
    ``init_edge_rot_mat`` is patched to the identity on them — the 3x3
    frame + xyz_to_angles pipeline (so3.py:499-545) is replaced wholesale
    by our verified geometry.
    """
    wb = compute_wigner_blocks(self.lmax, jnp.asarray(edge_vec.detach().numpy()))
    K = (self.lmax + 1) ** 2
    W = torch.zeros(edge_vec.shape[0], K, K)
    for l, blk in enumerate(wb.blocks):
        s = l * l
        W[:, s : s + 2 * l + 1, s : s + 2 * l + 1] = torch.from_numpy(
            np.asarray(blk)
        )
    self.device, self.dtype = W.device, W.dtype
    self.wigner = W
    self.wigner_inv = W.transpose(1, 2).contiguous()


@pytest.fixture(scope="module")
def refmodels():
    """Import the full reference model modules verbatim with shims."""
    # e3nn.o3 with the pieces the model files touch
    e3nn = types.ModuleType("e3nn")
    o3 = types.ModuleType("e3nn.o3")

    class _Irreps:
        @staticmethod
        def spherical_harmonics(lmax):
            return lmax

    o3.Irreps = _Irreps
    o3.SphericalHarmonics = _SphericalHarmonicsShim
    e3nn.o3 = o3
    sys.modules["e3nn"] = e3nn
    sys.modules["e3nn.o3"] = o3

    tg = types.ModuleType("torch_geometric")
    tg.utils = types.ModuleType("torch_geometric.utils")
    tg.utils.softmax = _segment_softmax
    sys.modules["torch_geometric"] = tg
    sys.modules["torch_geometric.utils"] = tg.utils

    # fairchem stubs
    fc_names = [
        "fairchem", "fairchem.core", "fairchem.core.common",
        "fairchem.core.common.registry", "fairchem.core.common.utils",
        "fairchem.core.models", "fairchem.core.models.base",
        "fairchem.core.models.escaip", "fairchem.core.models.escaip.utils",
        "fairchem.core.models.escaip.utils.smearing",
    ]
    mods = {n: types.ModuleType(n) for n in fc_names}

    class _Registry:
        @staticmethod
        def register_model(name):
            def deco(cls):
                return cls

            return deco

    mods["fairchem.core.common.registry"].registry = _Registry

    def conditional_grad(dec):
        def decorator(fn):
            return fn

        return decorator

    mods["fairchem.core.common.utils"].conditional_grad = conditional_grad

    class BackboneInterface:
        pass

    mods["fairchem.core.models.base"].BackboneInterface = BackboneInterface

    class GaussianSmearing(torch.nn.Module):
        """The reference's own fairchem copy (equiformerv2_oc20.py:43-60)."""

        def __init__(self, start=0.0, stop=5.0, num_gaussians=50,
                     basis_width_scalar=1.0):
            super().__init__()
            offset = torch.linspace(start, stop, num_gaussians)
            self.coeff = (
                -0.5 / (basis_width_scalar * (offset[1] - offset[0])).item() ** 2
            )
            self.register_buffer("offset", offset)
            self.num_output = num_gaussians

        def forward(self, dist):
            d = dist.view(-1, 1) - self.offset.view(1, -1)
            return torch.exp(self.coeff * torch.pow(d, 2))

    mods["fairchem.core.models.escaip.utils.smearing"].GaussianSmearing = (
        GaussianSmearing
    )
    sys.modules.update(mods)

    # EquiformerV2Functions over the reference dir with wigner.py replaced
    # (its Jd.pt is missing from the checkout, SURVEY §0)
    pkg = types.ModuleType("EquiformerV2Functions")
    pkg.__path__ = [str(REF / "EquiformerV2Functions")]
    sys.modules.setdefault("EquiformerV2Functions", pkg)
    if "EquiformerV2Functions.wigner" not in sys.modules:
        wig = types.ModuleType("EquiformerV2Functions.wigner")

        def wigner_D(l, alpha, beta, gamma):
            J = torch.from_numpy(J_matrix(l)).to(alpha.dtype)
            alpha, beta, gamma = torch.broadcast_tensors(alpha, beta, gamma)
            return (
                _z_rot_mat(alpha, l) @ J @ _z_rot_mat(beta, l) @ J
                @ _z_rot_mat(gamma, l)
            )

        wig.wigner_D = wigner_D
        sys.modules["EquiformerV2Functions.wigner"] = wig

    nf = types.ModuleType("NewFunctions")
    nf.__path__ = [str(REF / "NewFunctions")]
    sys.modules.setdefault("NewFunctions", nf)
    gt = types.ModuleType("NewFunctions.Gotennet_morethaninspired")
    gt.__path__ = [str(REF / "NewFunctions" / "Gotennet_morethaninspired")]
    sys.modules.setdefault("NewFunctions.Gotennet_morethaninspired", gt)

    so3 = importlib.import_module("EquiformerV2Functions.so3")
    # SO3_Grid -> our-tables shim; must be in place before the model modules
    # bind the name at import
    orig_grid = so3.SO3_Grid
    so3.SO3_Grid = _SO3GridShim

    ref_dir = str(REF)
    if ref_dir not in sys.path:
        sys.path.insert(0, ref_dir)
    matpes_mod = importlib.import_module("equiformerv2_MatPES_GATAV2")
    qm9_mod = importlib.import_module("equiformerv2_qm9")

    so3.SO3_Grid = orig_grid
    return types.SimpleNamespace(so3=so3, matpes=matpes_mod, qm9=qm9_mod)


def _patch_geometry(monkeypatch, refmodels, model_mod):
    """Route the reference's frame+Wigner pipeline through our geometry."""
    monkeypatch.setattr(
        refmodels.so3.SO3_Rotation, "set_wigner", _set_wigner_ours
    )
    monkeypatch.setattr(
        model_mod, "init_edge_rot_mat", lambda vec: vec.detach()
    )


# ── MatPES GATA-V2: energy + forces ─────────────────────────────────────────

TINY = dict(
    num_layers=2, sphere_channels=16, attn_hidden_channels=16, num_heads=2,
    attn_alpha_channels=8, attn_value_channels=8, ffn_hidden_channels=16,
    edge_channels=12, max_num_elements=20,
)


def _matpes_sample(seed=0, n=6):
    rng = np.random.default_rng(seed)
    cell = (np.eye(3) * 30.0).astype(np.float32)       # isolated: no images
    pos = (rng.uniform(0, 2.5, size=(n, 3)) + 13.0).astype(np.float32)
    z = rng.integers(1, 19, size=n).astype(np.int32)
    return z, pos, cell


def test_golden_full_model_matpes_gatav2(refmodels, monkeypatch):
    monkeypatch.setattr(flags, "_DEFAULT", flags.patched(s2_fused="off"))
    _patch_geometry(monkeypatch, refmodels, refmodels.matpes)
    torch.manual_seed(11)
    ref = refmodels.matpes.EquiformerV2_MatPES(
        max_neighbors=20, max_radius=6.0, lmax_list=[4], mmax_list=[2],
        grid_resolution=18, alpha_drop=0.0, drop_path_rate=0.0,
        proj_drop=0.0, **TINY,
    )
    ref.eval()

    z, pos, cell = _matpes_sample(0)
    n = len(z)
    pos_t = torch.from_numpy(pos).requires_grad_(True)
    data = {
        "atomic_numbers": torch.from_numpy(z.astype(np.int64)),
        "pos": pos_t,
        "batch": torch.zeros(n, dtype=torch.long),
        "natoms": torch.tensor([n]),
        "cell": torch.from_numpy(cell)[None],
    }
    out = ref(data)
    golden_e = out["energy"].detach().numpy()           # [1, 1] per-atom
    (dpos,) = torch.autograd.grad(out["energy_total"].sum(), pos_t)
    golden_f = -dpos.numpy()

    # ours: same molecule through the data pipeline + ported weights
    mb = collate(
        [GraphSample(atomic_numbers=z, pos=pos, cell=cell, pbc=True)],
        6.0, 20, n_pad=n, e_pad=n * (n - 1),
    ).asdict()
    assert bool(np.all(mb["edge_mask"])), "expected the full graph, no padding"
    model = EquiformerV2MatPES(
        lmax=4, mmax=2, grid_resolution=18, num_rbf=600, cutoff=6.0,
        alpha_drop=0.0, drop_path_rate=0.0, gata=True, remat=False,
        avg_degree=12.0, **TINY,
    )
    params = port_matpes_model(ref.state_dict(), lmax=4, mmax=2, num_layers=2)
    batch = {k: jnp.asarray(v) for k, v in mb.items()}
    outs = matpes_energy_forces_stress(model, params, batch)

    np.testing.assert_allclose(
        np.asarray(outs["energy"]), golden_e, rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(outs["forces"]), golden_f, rtol=1e-4, atol=1e-4
    )


# ── QM9: 12 heads ───────────────────────────────────────────────────────────


def test_golden_full_model_qm9(refmodels, monkeypatch):
    monkeypatch.setattr(flags, "_DEFAULT", flags.patched(s2_fused="off"))
    _patch_geometry(monkeypatch, refmodels, refmodels.qm9)
    torch.manual_seed(13)
    kw = dict(TINY)
    kw["max_num_elements"] = 10
    ref = refmodels.qm9.EquiformerV2_QM9(
        num_targets=12, max_neighbors=20, max_radius=5.0,
        lmax_list=[4], mmax_list=[2], grid_resolution=None,
        alpha_drop=0.0, drop_path_rate=0.0, proj_drop=0.0, **kw,
    )
    ref.eval()

    rng = np.random.default_rng(2)
    n = 6
    pos = rng.uniform(0, 2.2, size=(n, 3)).astype(np.float32)
    z = rng.integers(1, 9, size=n).astype(np.int32)
    data = {
        "atomic_numbers": torch.from_numpy(z.astype(np.int64)),
        "pos": torch.from_numpy(pos),
        "batch": torch.zeros(n, dtype=torch.long),
        "natoms": torch.tensor([n]),
    }
    with torch.no_grad():
        golden = ref(data).numpy()                      # [1, 12]

    mb = collate(
        [GraphSample(atomic_numbers=z, pos=pos)],
        5.0, 20, n_pad=n, e_pad=n * (n - 1),
    ).asdict()
    assert bool(np.all(mb["edge_mask"]))
    model = EquiformerV2QM9(
        num_targets=12, lmax=4, mmax=2, grid_resolution=None, num_rbf=600,
        cutoff=5.0, alpha_drop=0.0, drop_path_rate=0.0, avg_degree=6.0,
        vmap_heads=True, **kw,
    )
    params = port_qm9_model(ref.state_dict(), lmax=4, mmax=2, num_layers=2)
    batch = {k: jnp.asarray(v) for k, v in mb.items()}
    ours = model.apply(params, batch)

    np.testing.assert_allclose(np.asarray(ours), golden, rtol=1e-4, atol=1e-4)

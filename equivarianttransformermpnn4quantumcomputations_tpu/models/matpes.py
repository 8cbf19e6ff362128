"""EquiformerV2 for MatPES: per-atom energy, autograd forces, optional stress.

Re-design of reference models/equiformerv2_MatPES.py:68-538 and the GATA
variants (equiformerv2_MatPES_GATAV2.py — ``gata=True`` here).

Force/stress design (TPU-native):
* the energy function is pure in (params, pos, strain); forces are
  ``-d(sum E)/d pos`` via one ``jax.grad`` — the reference's
  ``autograd.grad(..., create_graph=True)`` double-backward becomes plain
  grad-of-grad composition under jit;
* stress uses the strain trick exactly as the reference
  (equiformerv2_MatPES.py:374-391): positions and cell are deformed by
  ``(I + eps)`` and ``dE/d eps / volume`` is read off in Voigt-6 form.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.ffn import FeedForward
from ..ops.s2grid import s2grid
from ..ops.segment import segment_sum
from ..utils import flags as _flags
from .backbone import EquiformerV2Backbone

__all__ = ["EquiformerV2MatPES", "matpes_energy_forces_stress"]


class EquiformerV2MatPES(nn.Module):
    """Backbone + scalar energy head; returns per-atom-normalized energy."""

    num_layers: int = 6
    sphere_channels: int = 128
    attn_hidden_channels: int = 128
    num_heads: int = 8
    attn_alpha_channels: int = 32
    attn_value_channels: int = 16
    ffn_hidden_channels: int = 512
    lmax: int = 4
    mmax: int = 2
    grid_resolution: int | None = 18
    edge_channels: int = 128
    num_rbf: int = 600
    max_num_elements: int = 100
    cutoff: float = 6.0
    norm_type: str = "rms_norm_sh"
    use_gate_act: bool = False
    use_grid_mlp: bool = False
    use_sep_s2_act: bool = True
    use_m_share_rad: bool = False
    use_attn_renorm: bool = True
    use_atom_edge_embedding: bool = True
    share_atom_edge_embedding: bool = False
    alpha_drop: float = 0.05
    drop_path_rate: float = 0.05
    proj_drop: float = 0.0
    avg_degree: float = 12.0       # reference _AVG_DEGREE_MATPES
    # GATA
    gata: bool = True
    # GATA v1 (reference equiformerv2_MatPES_GATA.py / Gotennet_inspired):
    # set gata=False, gata_v1=True; requires mmax == lmax and
    # attn_hidden_channels == sphere_channels
    gata_v1: bool = False
    normalize_attn_output: bool = True
    use_phi_every_layer: bool = False
    # global all-to-all attention applied after the final norm, before the
    # energy head (reference equiformerv2_MatPESv2_all2all.py:181,
    # ...GLOBALALLATTENTION...py:231, ...HTR...DISTANCE.py:232-237,404-407):
    # None | 'scalar' | 'full' | 'full_equivariant' | 'htr' | 'htr_distance'
    # | 'htr_rope'
    global_attn: str | None = None
    global_attn_heads: int = 8
    # dense per-graph packing for the scalar global attention: O(B n^2)
    # instead of O((Bn)^2); set to the max atoms per graph (static)
    global_attn_dense_n_max: int | None = None
    # FFN variants (MoE / dual-stream forks)
    ffn_variant: str = "standard"
    num_experts: int = 4
    dual_stream: bool = False
    remat: bool = True
    scan_layers: bool = False
    uniform_blocks: bool = False
    fixed_degree: bool = False
    # Wigner representation (construction-time; 'auto' = flags/platform)
    wigner_rep: str = "auto"
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, batch: dict, pos=None, deterministic: bool = True,
                 stack_capture: bool = False, stack_override=None):
        """Returns dict(energy [B,1] per-atom, energy_total [B], node_energy [N]).

        ``stack_capture``/``stack_override`` thread through to the backbone
        (external block-stack executors — parallel/pipeline.py)."""
        if pos is None:
            pos = batch["pos"]
        out = EquiformerV2Backbone(
            num_layers=self.num_layers,
            sphere_channels=self.sphere_channels,
            attn_hidden_channels=self.attn_hidden_channels,
            num_heads=self.num_heads,
            attn_alpha_channels=self.attn_alpha_channels,
            attn_value_channels=self.attn_value_channels,
            ffn_hidden_channels=self.ffn_hidden_channels,
            lmax=self.lmax,
            mmax=self.mmax,
            grid_resolution=self.grid_resolution,
            edge_channels=self.edge_channels,
            num_rbf=self.num_rbf,
            max_num_elements=self.max_num_elements,
            cutoff=self.cutoff,
            norm_type=self.norm_type,
            use_gate_act=self.use_gate_act,
            use_grid_mlp=self.use_grid_mlp,
            use_sep_s2_act=self.use_sep_s2_act,
            use_m_share_rad=self.use_m_share_rad,
            use_attn_renorm=self.use_attn_renorm,
            use_atom_edge_embedding=self.use_atom_edge_embedding,
            share_atom_edge_embedding=self.share_atom_edge_embedding,
            alpha_drop=self.alpha_drop,
            drop_path_rate=self.drop_path_rate,
            proj_drop=self.proj_drop,
            avg_degree=self.avg_degree,
            gata=self.gata,
            gata_v1=self.gata_v1,
            normalize_attn_output=self.normalize_attn_output,
            use_phi_every_layer=self.use_phi_every_layer,
            ffn_variant=self.ffn_variant,
            num_experts=self.num_experts,
            dual_stream=self.dual_stream,
            remat=self.remat,
            scan_layers=self.scan_layers,
            uniform_blocks=self.uniform_blocks,
            fixed_degree=self.fixed_degree,
            wigner_rep=self.wigner_rep,
            compute_dtype=self.compute_dtype,
            name="backbone",
        )(
            batch["atomic_numbers"],
            pos,
            batch["graph_idx"],
            batch["edge_src"],
            batch["edge_dst"],
            batch["edge_shift"],
            batch["edge_mask"],
            batch.get("strained_cell", batch["cell"]),
            deterministic=deterministic,
            stack_capture=stack_capture,
            stack_override=stack_override,
        )
        if stack_capture:
            return out                        # (carry, broadcast)

        x = out.x
        if self.global_attn is not None:
            from ..nn.global_attn import (
                GlobalFullAttention,
                GlobalFullEquivariantAttention,
                GlobalHTRAttention,
                GlobalScalarAttention,
            )

            gm, nm = batch["graph_idx"], batch["node_mask"]
            # dense per-graph packing (O(B n_max^2) instead of O((Bn)^2))
            # for EVERY variant when global_attn_dense_n_max is set
            dense_kw = dict(
                node_slot=(
                    batch["node_slot"] if self.global_attn_dense_n_max else None
                ),
                n_max=self.global_attn_dense_n_max,
                num_graphs=(
                    batch["cell"].shape[0]
                    if self.global_attn_dense_n_max
                    else None
                ),
            )
            if self.global_attn == "scalar":
                scal = GlobalScalarAttention(
                    d_model=self.sphere_channels,
                    num_heads=self.global_attn_heads,
                    name="global_attn",
                )(x[:, 0, :], gm, nm, pos, deterministic=deterministic,
                  **dense_kw)
                x = jnp.concatenate([scal[:, None, :], x[:, 1:, :]], axis=1)
            elif self.global_attn == "full":
                x = GlobalFullAttention(
                    d_model=self.sphere_channels,
                    num_coeffs=(self.lmax + 1) ** 2,
                    num_heads=self.global_attn_heads,
                    name="global_attn",
                )(x, gm, nm, pos, deterministic=deterministic, **dense_kw)
            elif self.global_attn == "full_equivariant":
                x = GlobalFullEquivariantAttention(
                    sphere_channels=self.sphere_channels,
                    lmax=self.lmax,
                    num_heads=self.global_attn_heads,
                    name="global_attn",
                )(x, gm, nm, deterministic=deterministic, **dense_kw)
            elif self.global_attn in ("htr", "htr_distance", "htr_rope"):
                x = GlobalHTRAttention(
                    sphere_channels=self.sphere_channels,
                    lmax=self.lmax,
                    num_heads=self.global_attn_heads,
                    use_distance=(self.global_attn == "htr_distance"),
                    use_rope=(self.global_attn == "htr_rope"),
                    name="global_attn",
                )(x, gm, nm, pos, deterministic=deterministic, **dense_kw)
            else:
                raise ValueError(self.global_attn)

        grid_full = s2grid(self.lmax, self.lmax, self.grid_resolution)
        node_energy = FeedForward(
            sphere_channels=self.sphere_channels,
            hidden_channels=self.ffn_hidden_channels,
            output_channels=1,
            lmax=self.lmax,
            grid_full=grid_full,
            use_gate_act=self.use_gate_act,
            use_grid_mlp=self.use_grid_mlp,
            use_sep_s2_act=self.use_sep_s2_act,
            name="energy_block",
        )(x)[:, 0, 0]

        num_graphs = batch["cell"].shape[0]
        energy_total = segment_sum(
            node_energy,
            batch["graph_idx"],
            num_segments=num_graphs,
            mask=batch["node_mask"],
        )
        natoms = jnp.maximum(batch["natoms"].astype(energy_total.dtype), 1.0)
        return {
            "energy": (energy_total / natoms)[:, None],
            "energy_total": energy_total,
            "node_energy": node_energy,
        }


def matpes_energy_forces_stress(
    model: EquiformerV2MatPES,
    params,
    batch: dict,
    regress_stress: bool = False,
    rngs=None,
    deterministic: bool = True,
    inner_ckpt: bool | None = None,
):
    """Energy + forces (+ stress) with a single grad pass.

    Forces: F = -dE_total/d pos.  Stress (``regress_stress=True``) uses the
    strain trick (reference equiformerv2_MatPES.py:374-391, 461-488) with one
    symmetric strain **per graph** — delegated to
    :func:`matpes_energy_forces_stress_pergraph`, which is correct for any
    batch size (a single batch-shared strain would couple the graphs'
    dE/d eps and is only valid at B=1, so that path no longer exists).
    """
    if regress_stress:
        return matpes_energy_forces_stress_pergraph(
            model, params, batch, rngs=rngs, deterministic=deterministic,
            inner_ckpt=inner_ckpt,
        )

    def energy_fn(pos):
        outs = model.apply(
            params, batch, pos=pos, deterministic=deterministic, rngs=rngs
        )
        return jnp.sum(outs["energy_total"]), outs

    # inner_ckpt wraps the inner energy evaluation in jax.checkpoint: the
    # outer backward then rematerializes instead of storing the inner force
    # pass's linearization residuals.  Default OFF since round 4 — the
    # flagship batch-16 step fits v5e HBM without it and the remat
    # re-forward cost ~40% of the step (353.5 -> 211.6 ms device; bench
    # A/B).  Turn on for memory-constrained configs (bigger grids/batches)
    # via the argument or ETQ_INNER_CKPT=1 at process start (utils/flags.py).
    if inner_ckpt is None:
        inner_ckpt = _flags.current().inner_ckpt
    if inner_ckpt:
        energy_fn = jax.checkpoint(energy_fn)
    dpos, outs = jax.grad(energy_fn, has_aux=True)(batch["pos"])
    forces = -dpos * batch["node_mask"][:, None].astype(dpos.dtype)
    result = dict(outs)
    result["forces"] = forces
    return result


def matpes_energy_forces_stress_pergraph(
    model: EquiformerV2MatPES,
    params,
    batch: dict,
    rngs=None,
    deterministic: bool = True,
    inner_ckpt: bool | None = None,
):
    """Per-graph stress: one symmetric strain per graph ([B, 3, 3])."""

    def energy_fn(pos, strain):
        eye = jnp.eye(3, dtype=pos.dtype)
        defo = eye[None] + strain                      # [B, 3, 3]
        pos_s = jnp.einsum(
            "ni,nij->nj", pos, defo[batch["graph_idx"]]
        )
        b = dict(batch)
        b["strained_cell"] = jnp.einsum("bij,bjk->bik", batch["cell"], defo)
        outs = model.apply(
            params, b, pos=pos_s, deterministic=deterministic, rngs=rngs
        )
        return jnp.sum(outs["energy_total"]), outs

    if inner_ckpt is None:
        inner_ckpt = _flags.current().inner_ckpt
    if inner_ckpt:
        energy_fn = jax.checkpoint(energy_fn)   # see matpes_energy_forces_stress
    B = batch["cell"].shape[0]
    strain0 = jnp.zeros((B, 3, 3), dtype=batch["pos"].dtype)
    (grads, outs) = jax.grad(energy_fn, argnums=(0, 1), has_aux=True)(
        batch["pos"], strain0
    )
    dpos, dstrain = grads
    forces = -dpos * batch["node_mask"][:, None].astype(dpos.dtype)
    sym = 0.5 * (dstrain + jnp.swapaxes(dstrain, -1, -2))   # [B, 3, 3]
    vol = jnp.abs(jnp.linalg.det(batch["cell"]))
    s = sym / jnp.maximum(vol, 1e-9)[:, None, None]
    stress = jnp.stack(
        [s[:, 0, 0], s[:, 1, 1], s[:, 2, 2], s[:, 1, 2], s[:, 0, 2], s[:, 0, 1]],
        axis=1,
    )
    result = dict(outs)
    result["forces"] = forces
    result["stress"] = stress
    return result

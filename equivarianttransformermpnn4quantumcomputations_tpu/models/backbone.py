"""EquiformerV2 backbone, TPU-native.

Re-design of the common skeleton of the reference model files
(models/equiformerv2_qm9.py:186-637, equiformerv2_oc20.py:63-287,
equiformerv2_MatPES_GATAV2.py:79-438): atom embedding -> distance RBF ->
edge-degree embedding -> N transformer blocks -> final norm.

TPU-first differences:
* the graph (edge lists + integer cell shifts) is built in the input pipeline
  (data/graph.py); the forward only *re-derives* displacement vectors from
  positions inside jit, so force/stress gradients flow and every shape is
  static;
* per-edge Wigner matrices are built once per forward from our own J-matrix
  factorization (ops/rotation.py) and shared across all blocks;
* all irregular aggregation is masked segment_sum/softmax (ops/segment.py).

When ``gata=True`` this is the GATA-V2 variant: edge stream ``t_ij``
initialized as (h_i + h_j) * W_erp(phi(r)) (reference
equiformerv2_MatPES_GATAV2.py:243-281) and threaded through the blocks with
HTR refinement; ``rl_ij`` edge SH computed in the global frame (detached).
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.irreps import layout as get_layout
from ..ops.pallas.segsum import gather_nodes
from ..ops.rotation import compute_wigner
from ..ops.s2grid import s2grid
from ..ops.sph import real_sph_harm
from ..nn.block import TransBlock
from ..nn.embedding import EdgeDegreeEmbedding
from ..nn.layers import Dense, GaussianSmearing
from ..nn.norms import get_normalization_layer

__all__ = ["EquiformerV2Backbone", "BackboneOutput", "build_block_kwargs"]


class BackboneOutput:
    """Plain container for backbone results (node features + edge reusables)."""

    def __init__(self, x, edge_scalars, edge_dist, wigner, edge_src, edge_dst):
        self.x = x
        self.edge_scalars = edge_scalars
        self.edge_dist = edge_dist
        self.wigner = wigner
        self.edge_src = edge_src
        self.edge_dst = edge_dst


def build_block_kwargs(
    cfg,
    *,
    edge_channels_list,
    block_atom_edge,
    blocks,
    num_graphs,
    deterministic,
):
    """TransBlock kwargs from a backbone config (single source of truth —
    used by the forward below and by parallel/pipeline.py, which executes
    the same scanned block stack under an explicit pipeline schedule)."""
    lay_full = get_layout(cfg.lmax, cfg.lmax)
    lay_red = get_layout(cfg.lmax, cfg.mmax)
    return dict(
        layout_full=lay_full,
        layout_red=lay_red,
        grid_red=s2grid(cfg.lmax, cfg.mmax, cfg.grid_resolution),
        grid_full=s2grid(cfg.lmax, cfg.lmax, cfg.grid_resolution),
        sphere_channels=cfg.sphere_channels,
        attn_hidden_channels=cfg.attn_hidden_channels,
        num_heads=cfg.num_heads,
        attn_alpha_channels=cfg.attn_alpha_channels,
        attn_value_channels=cfg.attn_value_channels,
        ffn_hidden_channels=cfg.ffn_hidden_channels,
        output_channels=cfg.sphere_channels,
        max_num_elements=cfg.max_num_elements,
        edge_channels_list=tuple(edge_channels_list),
        use_atom_edge_embedding=block_atom_edge,
        use_m_share_rad=cfg.use_m_share_rad,
        use_attn_renorm=cfg.use_attn_renorm,
        use_gate_act=cfg.use_gate_act,
        use_grid_mlp=cfg.use_grid_mlp,
        use_sep_s2_act=cfg.use_sep_s2_act,
        norm_type=cfg.norm_type,
        alpha_drop=cfg.alpha_drop,
        drop_path_rate=cfg.drop_path_rate,
        proj_drop=cfg.proj_drop,
        gata=cfg.gata,
        gata_v1=cfg.gata_v1,
        edge_channels=cfg.edge_channels,
        normalize_attn_output=cfg.normalize_attn_output,
        use_phi_every_layer=cfg.use_phi_every_layer,
        num_rbf=cfg.num_rbf,
        ffn_variant=cfg.ffn_variant,
        num_experts=cfg.num_experts,
        dual_stream=cfg.dual_stream,
        blocks=blocks,
        num_graphs=num_graphs,
        deterministic=deterministic,
    )


class EquiformerV2Backbone(nn.Module):
    # architecture
    num_layers: int = 8
    sphere_channels: int = 128
    attn_hidden_channels: int = 128
    num_heads: int = 8
    attn_alpha_channels: int = 32
    attn_value_channels: int = 16
    ffn_hidden_channels: int = 512
    lmax: int = 4
    mmax: int = 2
    grid_resolution: Optional[int] = None
    edge_channels: int = 128
    num_rbf: int = 600
    max_num_elements: int = 90
    cutoff: float = 5.0
    # flags (reference defaults)
    norm_type: str = "rms_norm_sh"
    use_atom_edge_embedding: bool = True
    share_atom_edge_embedding: bool = False
    use_m_share_rad: bool = False
    use_attn_renorm: bool = True
    use_gate_act: bool = False
    use_grid_mlp: bool = False
    use_sep_s2_act: bool = True
    alpha_drop: float = 0.0
    drop_path_rate: float = 0.0
    proj_drop: float = 0.0
    avg_degree: float = 6.0       # EdgeDegreeEmbedding rescale
    # GATA variant
    gata: bool = False
    # GATA v1 (Gotennet_inspired fork, reference equiformerv2_MatPES_GATA.py):
    # rl_ij edge SH only — no t_ij stream / HTR; requires mmax == lmax and
    # attn_hidden_channels == sphere_channels
    gata_v1: bool = False
    normalize_attn_output: bool = True
    use_phi_every_layer: bool = False
    # FFN variant + dual (angular) edge stream
    ffn_variant: str = "standard"
    num_experts: int = 4
    dual_stream: bool = False
    # rematerialize each block under grad (essential for force training:
    # the grad-of-grad graph otherwise materializes every S2-grid activation)
    remat: bool = False
    # lax.scan over the (identical) layer stack: compiles ONE block body
    # instead of num_layers copies — cuts XLA compile time ~num_layers x and
    # shrinks the executable; params gain a leading layer axis.
    scan_layers: bool = False
    # compute dtype for the block stack ("float32" | "bfloat16")
    compute_dtype: str = "float32"
    # graph-uniform blocking (collate(uniform=True) layout): every graph owns
    # n_pad/B node rows and e_pad/B edge rows, so segment ops/gather
    # transposes are block-diagonal — one-hot FLOPs LINEAR in batch size
    # instead of quadratic (the PERF.md batch-16 regression)
    uniform_blocks: bool = False
    # fixed-degree edge layout (collate(fixed_degree=True)): every node owns
    # exactly k = e_pad/n_pad consecutive edge slots, so every dst-keyed
    # segment reduction/softmax/gather is a plain [N, k, ...] reshape
    # reduction — no one-hot GEMMs, no scatter, no layout copies (the
    # round-3 roofline's biggest movement bucket).  Implies uniform_blocks.
    fixed_degree: bool = False
    # Wigner representation: 'auto' (flags / platform default) | 'dense' |
    # 'factored' | 'blocks' — a model attribute so the choice is pinned at
    # construction, not trace time (VERDICT r4 #6)
    wigner_rep: str = "auto"

    @nn.compact
    def __call__(
        self,
        atomic_numbers,   # [N] int32
        pos,              # [N, 3] f32 (differentiable!)
        graph_idx,        # [N] int32
        edge_src,         # [E] int32
        edge_dst,         # [E] int32
        edge_shift,       # [E, 3] int32 cell image offsets
        edge_mask,        # [E] bool
        cell,             # [B, 3, 3] f32
        deterministic: bool = True,
        stack_capture: bool = False,
        stack_override=None,
    ) -> BackboneOutput:
        """``stack_capture=True``: stop before the transformer blocks and
        return ``(carry, broadcast)`` — the exact lax.scan protocol of the
        stacked block body (requires ``scan_layers=True`` param structure).
        ``stack_override=(x, t_ij, a_ij)``: skip the blocks and continue the
        head path from an externally computed carry.  Together these let an
        external executor (parallel/pipeline.py GPipe schedule) run the
        block stack across devices while this module keeps sole ownership
        of the pre/post math."""
        lay_full = get_layout(self.lmax, self.lmax)
        lay_red = get_layout(self.lmax, self.mmax)
        grid_red = s2grid(self.lmax, self.mmax, self.grid_resolution)
        grid_full = s2grid(self.lmax, self.lmax, self.grid_resolution)
        N = atomic_numbers.shape[0]
        num_graphs = cell.shape[0]
        cdt = jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32
        blocks = None
        if self.uniform_blocks or self.fixed_degree:
            E = edge_src.shape[0]
            if N % num_graphs or E % num_graphs:
                raise ValueError(
                    "uniform_blocks requires n_pad/e_pad divisible by the "
                    "number of graphs (use collate(uniform=True))"
                )
            blocks = (num_graphs, N // num_graphs, E // num_graphs)
            if self.fixed_degree:
                if E % N:
                    raise ValueError(
                        "fixed_degree requires e_pad divisible by n_pad "
                        "(use collate(fixed_degree=True))"
                    )
                blocks = blocks + (E // N,)

        # ── displacements (grad-carrying) ─────────────────────────────────
        shift_cart = jnp.einsum(
            "ek,ekj->ej",
            edge_shift.astype(pos.dtype),
            cell[graph_idx[edge_dst]],
        )
        dvec = (
            gather_nodes(pos, edge_dst, blocks=blocks, canonical_dst=True)
            + shift_cart
            - gather_nodes(pos, edge_src, blocks=blocks)
        )  # [E, 3]
        dist = jnp.sqrt(jnp.maximum(jnp.sum(dvec * dvec, -1), 1e-12))

        # ── per-edge Wigner matrices (detached geometry) ──────────────────
        # self.wigner_rep / flags.current().wigner selects the representation
        # (all numerically identical):
        #   dense    — composite block-sparse D built ONCE per forward, each
        #              rotate is a pairs-kernel VPU pass (ops/pallas/
        #              rotate_dense.py); measured 32.2 -> 43.1 graphs/s on
        #              the flagship step (PERF.md) — default on TPU
        #   factored — 5-stage Xa J Xb J Xc chain per rotate (fused pallas
        #              kernel on TPU; default elsewhere — the interpret-mode
        #              pairs kernel is slow on CPU)
        #   blocks   — per-degree dense D, XLA batched-matmul application
        #              (measured 25.3 g/s: XLA lowers the tiny batched
        #              matmuls poorly)
        from ..utils import flags as _flags
        from ..utils.backend import on_tpu

        _wrep = self.wigner_rep
        if _wrep == "auto":
            _wrep = _flags.current().wigner
        if _wrep == "auto":
            _wrep = "dense" if on_tpu() else "factored"
        if _wrep == "blocks":
            from ..ops.rotation import compute_wigner_blocks

            wigner = compute_wigner_blocks(self.lmax, dvec)
        elif _wrep == "dense":
            from ..ops.pallas.rotate_dense import compute_wigner_dense

            wigner = compute_wigner_dense(self.lmax, self.mmax, dvec)
        else:
            wigner = compute_wigner(self.lmax, dvec)

        # ── invariant edge features ───────────────────────────────────────
        smear = GaussianSmearing(0.0, self.cutoff, self.num_rbf, 2.0)
        phi_r = smear(dist)                                     # [E, num_rbf]
        edge_channels_list = [self.num_rbf, self.edge_channels, self.edge_channels]
        if self.share_atom_edge_embedding and self.use_atom_edge_embedding:
            from ..nn.attention import _atom_edge_embedding_init

            src_emb = nn.Embed(
                self.max_num_elements, self.edge_channels,
                embedding_init=_atom_edge_embedding_init,
                name="shared_source_embedding",
            )(atomic_numbers[edge_src])
            dst_emb = nn.Embed(
                self.max_num_elements, self.edge_channels,
                embedding_init=_atom_edge_embedding_init,
                name="shared_target_embedding",
            )(atomic_numbers[edge_dst])
            edge_scalars = jnp.concatenate([phi_r, src_emb, dst_emb], axis=1)
            edge_channels_list[0] += 2 * self.edge_channels
            block_atom_edge = False
        else:
            edge_scalars = phi_r
            block_atom_edge = self.use_atom_edge_embedding

        # ── node embedding: l=0 from atomic number ────────────────────────
        sphere_emb = nn.Embed(
            self.max_num_elements, self.sphere_channels, name="sphere_embedding"
        )(atomic_numbers)
        x = jnp.zeros(
            (N, lay_full.num_coefficients_full, self.sphere_channels),
            dtype=jnp.float32,
        )
        x = x.at[:, 0, :].set(sphere_emb)

        x = x + EdgeDegreeEmbedding(
            sphere_channels=self.sphere_channels,
            layout_red=lay_red,
            max_num_elements=self.max_num_elements,
            edge_channels_list=tuple(edge_channels_list),
            use_atom_edge_embedding=block_atom_edge,
            rescale_factor=self.avg_degree,
            blocks=blocks,
            name="edge_degree_embedding",
        )(
            atomic_numbers, edge_scalars, edge_src, edge_dst, edge_mask,
            wigner, N,
        )

        # ── GATA streams ──────────────────────────────────────────────────
        t_ij = None
        rl_ij = None
        a_ij = None
        if self.gata or self.gata_v1:
            # edge SH in the global frame, l >= 1, 'norm' normalization,
            # detached (reference equiformerv2_MatPES_GATAV2.py:232-241;
            # v1: equiformerv2_MatPES_GATA.py:266-300)
            unit = dvec / dist[..., None]
            rl_full = real_sph_harm(self.lmax, unit, normalization="norm")
            rl_ij = jax.lax.stop_gradient(rl_full[:, 1:])
        if self.gata:
            # t_ij init (reference :243-281)
            h = x[:, 0, :]
            h_sum = Dense(self.edge_channels, name="h_proj")(
                gather_nodes(h, edge_src, blocks=blocks)
                + gather_nodes(h, edge_dst, blocks=blocks,
                               canonical_dst=True)
            )
            t_ij = h_sum * Dense(self.edge_channels, name="W_erp")(phi_r)
            if self.dual_stream:
                # angular stream init: same construction as t_ij with its own
                # projections (the reference's dual-stream fork is not wired
                # into a committed model file; this mirrors the t_ij recipe)
                a_ij = Dense(self.edge_channels, name="a_h_proj")(
                    gather_nodes(h, edge_src, blocks=blocks)
                    + gather_nodes(h, edge_dst, blocks=blocks,
                                   canonical_dst=True)
                ) * Dense(self.edge_channels, name="a_W_erp")(phi_r)

        # ── transformer blocks ────────────────────────────────────────────
        x = x.astype(cdt)
        block_kwargs = build_block_kwargs(
            self,
            edge_channels_list=edge_channels_list,
            block_atom_edge=block_atom_edge,
            blocks=blocks,
            num_graphs=num_graphs,
            deterministic=deterministic,
        )
        edge_scalars_c = edge_scalars.astype(cdt)
        phi_c = phi_r.astype(cdt) if self.use_phi_every_layer else None
        if t_ij is not None:
            t_ij = t_ij.astype(cdt)
        if rl_ij is not None:
            rl_ij = rl_ij.astype(cdt)
        if a_ij is not None:
            a_ij = a_ij.astype(cdt)

        def unpack(out, prev_t, prev_a):
            if self.gata and self.dual_stream:
                return out
            if self.gata:
                return out + (prev_a,)
            return (out, prev_t, prev_a)

        if stack_capture:
            broadcast = (
                atomic_numbers, edge_scalars_c, edge_src, edge_dst,
                edge_mask, wigner, graph_idx, rl_ij, phi_c,
            )
            return (x, t_ij, a_ij), broadcast

        if stack_override is not None:
            x, t_ij, a_ij = stack_override
            x = x.astype(cdt)
        elif self.scan_layers:
            # scan_layers + fused S2 kernel is safe: the kernel pads its node
            # axis OUTSIDE the custom_vjp boundary (ops/pallas/s2act.py:_call
            # — a pad literal inside a custom_vjp primal corrupts residual
            # binding under lax.scan second-order AD)
            from ..nn.block import BlockScanBody

            body_cls = BlockScanBody
            if self.remat:
                body_cls = nn.remat(BlockScanBody, prevent_cse=False)
            scan_cls = nn.scan(
                body_cls,
                variable_axes={"params": 0, "intermediates": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=nn.broadcast,
                length=self.num_layers,
                # layer axis carries no partition name; needed so boxed
                # TP/EP params (nn/partition.py) flow through the scan
                metadata_params={nn.meta.PARTITION_NAME: None},
            )
            broadcast = (
                atomic_numbers, edge_scalars_c, edge_src, edge_dst,
                edge_mask, wigner, graph_idx, rl_ij, phi_c,
            )
            (x, t_ij, a_ij), _ = scan_cls(
                block_kwargs=tuple(sorted(block_kwargs.items())),
                name="blocks",
            )((x, t_ij, a_ij), broadcast)
        else:
            block_cls = (
                nn.remat(TransBlock, prevent_cse=False)
                if self.remat
                else TransBlock
            )
            for i in range(self.num_layers):
                block = block_cls(**block_kwargs, name=f"block_{i}")
                out = block(
                    x, atomic_numbers, edge_scalars_c, edge_src, edge_dst,
                    edge_mask, wigner, graph_idx, t_ij, rl_ij, phi_c, a_ij,
                )
                x, t_ij, a_ij = unpack(out, t_ij, a_ij)

        x = get_normalization_layer(
            self.norm_type, self.lmax, self.sphere_channels
        )(x)
        x = x.astype(jnp.float32)

        return BackboneOutput(
            x=x,
            edge_scalars=edge_scalars,
            edge_dist=dist,
            wigner=wigner,
            edge_src=edge_src,
            edge_dst=edge_dst,
        )

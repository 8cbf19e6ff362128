"""Fused rotate<->SO(2)-conv kernels (ops/pallas/rc_fused.py) vs the unfused
composition (dense-Wigner pairs rotate + plain SO2Conv math), in interpret
mode on CPU: forward, 1st/2nd-order AD, and lax.scan + grad-of-grad (the
flagship force-training regime)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from equivarianttransformermpnn4quantumcomputations_tpu.ops.irreps import (
    layout as get_layout,
)
from equivarianttransformermpnn4quantumcomputations_tpu.ops.pallas.rc_fused import (
    fused_conv_rotate,
    fused_rotate_conv,
)
from equivarianttransformermpnn4quantumcomputations_tpu.ops.pallas.rotate_dense import (
    compute_wigner_dense,
    rotate_from_edge_dense,
    rotate_to_edge_dense,
    rotate_to_edge_m0_dense,
)

pytestmark = pytest.mark.slow  # ETQ_RC_FUSED kernels are default-off (PERF.md r3)

LMAX, MMAX = 2, 1
E, CA, CB = 256, 128, 128
EXTRA = 64


def _setup(seed=0, lmax=LMAX, mmax=MMAX, ca=CA, cb=CB, extra=EXTRA):
    rng = np.random.default_rng(seed)
    lay = get_layout(lmax, mmax)
    edge_vec = rng.normal(size=(E, 3)).astype(np.float32)
    wd = compute_wigner_dense(lmax, mmax, jnp.asarray(edge_vec))
    K_full = (lmax + 1) ** 2
    L0 = lmax + 1
    x = jnp.asarray(rng.normal(size=(E, K_full, ca)).astype(np.float32))
    n_groups = int(lay.m_size.sum())
    rad = jnp.asarray(
        rng.normal(size=(E, n_groups * ca)).astype(np.float32)
    )
    w_ex = jnp.asarray(
        rng.normal(size=(L0 * ca, extra)).astype(np.float32) * 0.05
    )
    w_m0 = jnp.asarray(
        rng.normal(size=(L0 * ca, L0 * cb)).astype(np.float32) * 0.05
    )
    wbigs = []
    for m in range(1, mmax + 1):
        Lm = int(lay.m_size[m])
        wr = rng.normal(size=(Lm * ca, Lm * cb)).astype(np.float32) * 0.05
        wi = rng.normal(size=(Lm * ca, Lm * cb)).astype(np.float32) * 0.05
        wbig = np.block([[wr, wi], [-wi, wr]])
        wbigs.append(jnp.asarray(wbig))
    b_ex = jnp.asarray(rng.normal(size=(extra,)).astype(np.float32))
    b_m0 = jnp.asarray(rng.normal(size=(L0 * cb,)).astype(np.float32))
    return lay, wd, x, rad, w_ex, w_m0, wbigs, b_ex, b_m0


def _ref_conv_m(xm, rad, ws, bs, lay, ca, cb, extra):
    """Unfused SO2Conv math on an m-primary [E, K_red, ca] input.

    ws = (w_ex?, w_m0, wbig_1..), bs = (b_ex?, b_m0?) — the exact flatten
    order of nn/so3_layers.py:SO2Conv.
    """
    E = xm.shape[0]
    L0 = int(lay.m_size[0])
    wi = 0
    x0 = xm[:, :L0, :].reshape(E, L0 * ca)
    if rad is not None:
        x0 = x0 * rad[:, : L0 * ca]
    ex = None
    if extra:
        ex = x0 @ ws[wi]
        if bs:
            ex = ex + bs[0]
        wi += 1
    y0 = x0 @ ws[wi]
    if bs:
        y0 = y0 + bs[-1]
    wi += 1
    blocks = [y0.reshape(E, L0, cb)]
    off, offr = L0, L0 * ca
    for m in range(1, lay.mmax + 1):
        Lm = int(lay.m_size[m])
        xmm = xm[:, off : off + 2 * Lm, :]
        xr = xmm[:, :Lm, :].reshape(E, Lm * ca)
        xi = xmm[:, Lm:, :].reshape(E, Lm * ca)
        if rad is not None:
            rm = rad[:, offr : offr + Lm * ca]
            xr, xi = xr * rm, xi * rm
            offr += Lm * ca
        xcat = jnp.concatenate([xr, xi], axis=1)
        y = xcat @ ws[wi]
        wi += 1
        blocks.append(y.reshape(E, 2 * Lm, cb))
        off += 2 * Lm
    out_m = jnp.concatenate(blocks, axis=1)
    return out_m[:, lay.from_m_perm, :], ex


def _ref_in(x, wd, rad, ws, bs, lay, ca, cb, extra):
    u = rotate_to_edge_dense(wd, x, lay)
    return _ref_conv_m(u[:, lay.to_m_perm, :], rad, ws, bs, lay, ca, cb, extra)


def _ref_in_m0(x, wd, rad, w_ex, b_ex, lay, ca):
    u0 = rotate_to_edge_m0_dense(wd, x, lay)  # [E, L0, ca] rank order
    L0 = int(lay.m_size[0])
    x0 = u0.reshape(u0.shape[0], L0 * ca)
    if rad is not None:
        x0 = x0 * rad[:, : L0 * ca]
    return x0 @ w_ex + b_ex


def test_fused_in_forward_matches():
    lay, wd, x, rad, w_ex, w_m0, wbigs, b_ex, b_m0 = _setup()
    ws = (w_ex, w_m0, *wbigs)
    bs = (b_ex, b_m0)
    msg_f, ex_f = fused_rotate_conv(
        x, wd, rad, ws, bs, c_msg=CB, extra=EXTRA
    )
    msg_r, ex_r = _ref_in(x, wd, rad, ws, bs, lay, CA, CB, EXTRA)
    np.testing.assert_allclose(msg_f, msg_r, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(ex_f, ex_r, rtol=2e-5, atol=2e-5)


def test_fused_in_forward_no_rad_no_extra():
    lay, wd, x, rad, w_ex, w_m0, wbigs, b_ex, b_m0 = _setup()
    ws = (w_m0, *wbigs)
    msg_f, ex_f = fused_rotate_conv(x, wd, None, ws, (), c_msg=CB, extra=0)
    assert ex_f is None
    msg_r, _ = _ref_in(x, wd, None, ws, (), lay, CA, CB, 0)
    np.testing.assert_allclose(msg_f, msg_r, rtol=2e-5, atol=2e-5)


def test_fused_in_m0_forward_matches():
    lay, wd, x, rad, w_ex, w_m0, wbigs, b_ex, b_m0 = _setup()
    msg_f, ex_f = fused_rotate_conv(
        x, wd, rad, (w_ex,), (b_ex,), c_msg=CB, extra=EXTRA, m0=True
    )
    assert msg_f is None
    ex_r = _ref_in_m0(x, wd, rad, w_ex, b_ex, lay, CA)
    np.testing.assert_allclose(ex_f, ex_r, rtol=2e-5, atol=2e-5)


def test_fused_out_forward_matches():
    lay, wd, x, rad, w_ex, w_m0, wbigs, b_ex, b_m0 = _setup()
    rng = np.random.default_rng(3)
    K_red = lay.num_coefficients
    msg = jnp.asarray(rng.normal(size=(E, K_red, CB)).astype(np.float32))
    # orientation cb -> ca
    w_m0_o = jnp.swapaxes(w_m0, 0, 1)
    wbigs_o = [jnp.swapaxes(w, 0, 1) for w in wbigs]
    b_o = jnp.asarray(
        rng.normal(size=((lay.lmax + 1) * CA,)).astype(np.float32)
    )
    ws = (w_m0_o, *wbigs_o)
    y_f = fused_conv_rotate(msg, wd, None, ws, (b_o,), c_rot=CA)
    t, _ = _ref_conv_m(
        msg[:, lay.to_m_perm, :], None, ws, (b_o,), lay, CB, CA, 0
    )
    y_r = rotate_from_edge_dense(wd, t, lay)
    np.testing.assert_allclose(y_f, y_r, rtol=2e-5, atol=2e-5)


def test_fused_in_gradients_match():
    lay, wd, x, rad, w_ex, w_m0, wbigs, b_ex, b_m0 = _setup()
    ws = (w_ex, w_m0, *wbigs)
    bs = (b_ex, b_m0)
    probe_m = jnp.asarray(
        np.random.default_rng(5).normal(
            size=(E, lay.num_coefficients, CB)
        ).astype(np.float32)
    )
    probe_e = jnp.asarray(
        np.random.default_rng(6).normal(size=(E, EXTRA)).astype(np.float32)
    )

    def loss_fused(x, rad, ws, bs):
        m, e = fused_rotate_conv(x, wd, rad, ws, bs, c_msg=CB, extra=EXTRA)
        return jnp.sum(m * probe_m) + jnp.sum(e * probe_e)

    def loss_ref(x, rad, ws, bs):
        m, e = _ref_in(x, wd, rad, ws, bs, lay, CA, CB, EXTRA)
        return jnp.sum(m * probe_m) + jnp.sum(e * probe_e)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, rad, ws, bs)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, rad, ws, bs)
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(a, b, rtol=3e-4, atol=3e-4)


def test_fused_out_gradients_match():
    lay, wd, x, rad, w_ex, w_m0, wbigs, b_ex, b_m0 = _setup()
    rng = np.random.default_rng(7)
    K_red = lay.num_coefficients
    msg = jnp.asarray(rng.normal(size=(E, K_red, CB)).astype(np.float32))
    ws = (jnp.swapaxes(w_m0, 0, 1), *[jnp.swapaxes(w, 0, 1) for w in wbigs])
    b_o = jnp.asarray(
        rng.normal(size=((lay.lmax + 1) * CA,)).astype(np.float32)
    )
    probe = jnp.asarray(
        rng.normal(size=(E, (lay.lmax + 1) ** 2, CA)).astype(np.float32)
    )

    def loss_fused(msg, ws, bs):
        return jnp.sum(
            fused_conv_rotate(msg, wd, None, ws, bs, c_rot=CA) * probe
        )

    def loss_ref(msg, ws, bs):
        t, _ = _ref_conv_m(msg[:, lay.to_m_perm, :], None, ws, bs,
                           lay, CB, CA, 0)
        return jnp.sum(rotate_from_edge_dense(wd, t, lay) * probe)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(msg, ws, (b_o,))
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(msg, ws, (b_o,))
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(a, b, rtol=3e-4, atol=3e-4)


def test_fused_second_order_forcelike():
    """grad-of-grad: d/dW of ||d loss/d x||^2 — the force-training pattern."""
    lay, wd, x, rad, w_ex, w_m0, wbigs, b_ex, b_m0 = _setup()
    ws = (w_ex, w_m0, *wbigs)
    bs = (b_ex, b_m0)

    def make_outer(inner):
        def outer(ws, bs):
            fx = jax.grad(
                lambda xx: jnp.sum(
                    jnp.tanh(inner(xx, ws, bs)[0])
                ) + jnp.sum(inner(xx, ws, bs)[1])
            )(x)
            return jnp.sum(fx * fx)
        return outer

    def inner_fused(xx, ws, bs):
        return fused_rotate_conv(xx, wd, rad, ws, bs, c_msg=CB, extra=EXTRA)

    def inner_ref(xx, ws, bs):
        return _ref_in(xx, wd, rad, ws, bs, lay, CA, CB, EXTRA)

    gf = jax.grad(make_outer(inner_fused), argnums=(0, 1))(ws, bs)
    gr = jax.grad(make_outer(inner_ref), argnums=(0, 1))(ws, bs)
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3
        )


def test_fused_scan_grad_of_grad():
    """in->out composition under lax.scan, grad-of-grad — the scan_layers x
    custom_vjp regime that broke in round 1 (see ops/pallas/s2act.py)."""
    lay, wd, x, rad, w_ex, w_m0, wbigs, b_ex, b_m0 = _setup()
    n_layers = 2
    rng = np.random.default_rng(11)
    K_full = (lay.lmax + 1) ** 2
    L0 = lay.lmax + 1
    ws_in = jnp.stack([w_m0] * n_layers)
    ws_out = jnp.stack(
        [jnp.swapaxes(w_m0, 0, 1) * 0.5] * n_layers
    )
    wb_in = jnp.stack([wbigs[0]] * n_layers)
    wb_out = jnp.stack([jnp.swapaxes(wbigs[0], 0, 1) * 0.5] * n_layers)

    def layer(xx, params):
        wi, wbi, wo, wbo = params
        m, _ = fused_rotate_conv(
            xx, wd, None, (wi, wbi), (), c_msg=CB, extra=0
        )
        m = jnp.tanh(m)
        return fused_conv_rotate(m, wd, None, (wo, wbo), (), c_rot=CA)

    def net_scan(xx, stacked):
        def body(c, p):
            return layer(c, p), None
        out, _ = jax.lax.scan(body, xx, stacked)
        return out

    def net_unrolled(xx, stacked):
        for i in range(n_layers):
            xx = layer(xx, jax.tree_util.tree_map(lambda a: a[i], stacked))
        return xx

    stacked = (ws_in, wb_in, ws_out, wb_out)

    def force_loss(net):
        def f(stacked):
            fx = jax.grad(lambda xx: jnp.sum(jnp.sin(net(xx, stacked))))(x)
            return jnp.sum(fx * fx)
        return f

    ls = force_loss(net_scan)(stacked)
    lu = force_loss(net_unrolled)(stacked)
    np.testing.assert_allclose(ls, lu, rtol=1e-5)
    gs = jax.grad(force_loss(net_scan))(stacked)
    gu = jax.grad(force_loss(net_unrolled))(stacked)
    for a, b in zip(jax.tree_util.tree_leaves(gs),
                    jax.tree_util.tree_leaves(gu)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4
        )


def test_fused_flagship_layout_forward():
    """lmax 4 / mmax 2 (flagship tables) forward parity, in + out + m0."""
    lay, wd, x, rad, w_ex, w_m0, wbigs, b_ex, b_m0 = _setup(
        seed=2, lmax=4, mmax=2
    )
    ws = (w_ex, w_m0, *wbigs)
    bs = (b_ex, b_m0)
    msg_f, ex_f = fused_rotate_conv(
        x, wd, rad, ws, bs, c_msg=CB, extra=EXTRA
    )
    msg_r, ex_r = _ref_in(x, wd, rad, ws, bs, lay, CA, CB, EXTRA)
    np.testing.assert_allclose(msg_f, msg_r, rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(ex_f, ex_r, rtol=3e-5, atol=3e-5)

    ex_m0_f = fused_rotate_conv(
        x, wd, rad, (w_ex,), (b_ex,), c_msg=CB, extra=EXTRA, m0=True
    )[1]
    ex_m0_r = _ref_in_m0(x, wd, rad, w_ex, b_ex, lay, CA)
    np.testing.assert_allclose(ex_m0_f, ex_m0_r, rtol=3e-5, atol=3e-5)

    rng = np.random.default_rng(4)
    msg = jnp.asarray(
        rng.normal(size=(E, lay.num_coefficients, CB)).astype(np.float32)
    )
    ws_o = (jnp.swapaxes(w_m0, 0, 1),
            *[jnp.swapaxes(w, 0, 1) for w in wbigs])
    y_f = fused_conv_rotate(msg, wd, None, ws_o, (), c_rot=CA)
    t, _ = _ref_conv_m(msg[:, lay.to_m_perm, :], None, ws_o, (), lay,
                       CB, CA, 0)
    y_r = rotate_from_edge_dense(wd, t, lay)
    np.testing.assert_allclose(y_f, y_r, rtol=3e-5, atol=3e-5)


# ── model-level integration: GraphAttention takes the fused path ───────────
#
# At 128-aligned widths (so2conv_fusable) with ETQ_WIGNER=dense, attention
# conv-1 runs as fused rotate+conv and conv-2 as fused conv+rotate-back; the
# outputs (and autograd forces) must match ETQ_RC_FUSED=0 (pairs rotate +
# plain XLA GEMMs) with the SAME parameters.

ALIGNED = dict(
    num_layers=1,
    sphere_channels=64,      # conv-1 c_in = 2*64 = 128
    attn_hidden_channels=128,
    num_heads=2,
    attn_alpha_channels=64,  # alpha_ch = 128
    attn_value_channels=64,  # conv-2 c_out = 128
    ffn_hidden_channels=16,
    lmax=2,
    mmax=1,
    grid_resolution=None,
    edge_channels=16,
    num_rbf=16,
    max_num_elements=20,
    cutoff=5.0,
    alpha_drop=0.0,
    drop_path_rate=0.0,
)


def _matpes_batch(rng, n=6):
    from equivarianttransformermpnn4quantumcomputations_tpu.data.graph import (
        GraphSample,
        collate,
    )

    s = GraphSample(
        atomic_numbers=rng.integers(1, 15, size=n).astype(np.int32),
        pos=(rng.normal(size=(n, 3)) * 1.5).astype(np.float32),
        energy=0.0,
        forces=np.zeros((n, 3), np.float32),
    )
    pb = collate([s], 5.0, 20, n_pad=8, e_pad=64)
    return {k: jnp.asarray(v) for k, v in pb.asdict().items()}


def _fused_vs_unfused(monkeypatch, **kw):
    from equivarianttransformermpnn4quantumcomputations_tpu.models.matpes import (
        EquiformerV2MatPES,
    )

    monkeypatch.setenv("ETQ_WIGNER", "dense")
    rng = np.random.default_rng(0)
    b = _matpes_batch(rng)
    model = EquiformerV2MatPES(**ALIGNED, **kw)
    monkeypatch.setenv("ETQ_RC_FUSED", "0")
    params = model.init(jax.random.PRNGKey(0), b)

    def energy(pos, on):
        monkeypatch.setenv("ETQ_RC_FUSED", on)
        bb = dict(b)
        bb["pos"] = pos
        return model.apply(params, bb)["energy_total"].sum()

    e_f, g_f = jax.value_and_grad(energy)(b["pos"], "1")
    e_u, g_u = jax.value_and_grad(energy)(b["pos"], "0")
    np.testing.assert_allclose(float(e_f), float(e_u), rtol=2e-5)
    np.testing.assert_allclose(
        np.asarray(g_f), np.asarray(g_u), rtol=2e-4, atol=2e-5
    )


def test_attention_fused_parity_baseline(monkeypatch):
    """Baseline sep-S2 attention: full fused conv-1 (+extra) and conv-2."""
    _fused_vs_unfused(monkeypatch, gata=False)


def test_attention_fused_parity_gata_m0(monkeypatch):
    """GATA m0-only value path: fused m0 conv-1 + fused conv-2."""
    _fused_vs_unfused(monkeypatch, gata=True)


def test_attention_fused_parity_gata_full(monkeypatch):
    """GATA with ETQ_M0_ONLY=0: full fused conv-1 with the big extra block."""
    monkeypatch.setenv("ETQ_M0_ONLY", "0")
    _fused_vs_unfused(monkeypatch, gata=True)

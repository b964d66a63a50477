"""Parity tests for the denoiser's Pallas TPU kernels (pallas_ops).

The kernels only run on real TPUs; here the Pallas bodies execute in
interpreter mode and must match the reference XLA formulations bitwise-ish
(f32 rounding), and the custom VJPs must match autodiff of the XLA math.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from state_policy_diffusionmodel_tpu.models import pallas_ops as po


@pytest.fixture()
def interpret(monkeypatch):
    monkeypatch.setattr(pl, "pallas_call",
                        functools.partial(pl.pallas_call, interpret=True))


def _rand(rng, shape, scale=1.0):
    return jnp.asarray(rng.normal(size=shape) * scale, jnp.float32)


@pytest.mark.parametrize("shape,cout", [
    ((4, 32, 8, 16), 32),    # top U-Net level
    ((8, 8, 2, 64), 32),     # deep level, W=2
    ((16, 4, 1, 32), 16),    # bottleneck level, W=1
])
def test_conv3x3_pallas_matches_xla(interpret, shape, cout):
    rng = np.random.default_rng(0)
    x = _rand(rng, shape)
    w = _rand(rng, (9 * shape[-1], cout), 0.1)
    got = po._conv3x3_pallas(x, w)
    want = po._conv3x3_xla(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_conv3x3_batch_tile_respects_vmem():
    for isz in (2, 4):
        for (h, w, cin, cout) in [(8, 2, 512, 512), (16, 4, 256, 256),
                                  (32, 8, 128, 128)]:
            tb = po._conv_batch_tile(256, h, w, cin, cout, isz)
            assert 1 <= tb <= 256 and 256 % tb == 0
            used = (2 * tb * (h + 2) * (w + 2) * cin * isz
                    + 2 * tb * h * w * cout * isz
                    + tb * h * w * cout * 4 + tb * h * w * cin * isz
                    + 9 * cin * cout * isz)
            assert used <= 10 * 1024 * 1024, (isz, h, w, cin, cout, tb)


def test_conv3x3_custom_vjp_matches_autodiff():
    rng = np.random.default_rng(1)
    x = _rand(rng, (4, 8, 8, 16))
    w = _rand(rng, (9 * 16, 24), 0.1)

    def loss_custom(x, w):
        # the custom-VJP wrapper around the Pallas kernel (interpret mode)
        return jnp.sum(jnp.sin(po._conv3x3_p(x, w)))

    def loss_ref(x, w):
        return jnp.sum(jnp.sin(po._conv3x3_xla(x, w)))

    import functools as ft
    from jax.experimental import pallas as pl
    orig = pl.pallas_call
    pl.pallas_call = ft.partial(orig, interpret=True)
    try:
        g1 = jax.grad(loss_custom, (0, 1))(x, w)
    finally:
        pl.pallas_call = orig
    g2 = jax.grad(loss_ref, (0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]),
                               rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("b,t,c,h", [(8, 64, 64, 4), (16, 16, 128, 4),
                                     (4, 256, 64, 4), (8, 32, 32, 1)])
def test_attention_pallas_matches_xla(interpret, b, t, c, h):
    rng = np.random.default_rng(2)
    q, k, v = (_rand(rng, (b, t, c)) for _ in range(3))
    got = po._attn_pallas(q, k, v, h)
    want = po._attn_xla(q, k, v, h)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_attention_heads_are_independent():
    """Packed layout: head h only reads feature columns [h*Dh, (h+1)*Dh)."""
    rng = np.random.default_rng(5)
    q, k, v = (_rand(rng, (2, 16, 64)) for _ in range(3))
    full = po._attn_xla(q, k, v, 4)
    solo = po._attn_xla(q[..., :16], k[..., :16], v[..., :16], 1)
    np.testing.assert_allclose(np.asarray(full[..., :16]), np.asarray(solo),
                               rtol=1e-5, atol=1e-6)


def test_attention_custom_vjp_matches_autodiff():
    rng = np.random.default_rng(3)
    q, k, v = (_rand(rng, (8, 32, 32)) for _ in range(3))

    def loss_custom(q, k, v):
        return jnp.sum(jnp.cos(po.attention_core(q, k, v, 4)))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.cos(po._attn_xla(q, k, v, 4)))

    g1 = jax.grad(loss_custom, (0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, (0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_mha_module_param_tree_matches_flax():
    """_MHA must keep nn.MultiHeadDotProductAttention's parameter tree so
    checkpoints and init seeds stay interchangeable."""
    from flax import linen as nn

    from state_policy_diffusionmodel_tpu.models.layers import SelfAttention

    sa = SelfAttention(channels=32)
    params = sa.init(jax.random.key(0), jnp.zeros((2, 4, 4, 32)))["params"]
    mha = params["MultiHeadDotProductAttention_0"]
    assert set(mha) == {"query", "key", "value", "out"}
    assert mha["query"]["kernel"].shape == (32, 4, 8)
    assert mha["out"]["kernel"].shape == (4, 8, 32)

    class FlaxSA(nn.Module):
        @nn.compact
        def __call__(self, x):
            B, H, W, C = x.shape
            tokens = x.reshape(B, H * W, C)
            ln = nn.LayerNorm()(tokens)
            attn = nn.MultiHeadDotProductAttention(
                num_heads=4, qkv_features=C, out_features=C)(ln, ln)
            tokens = attn + tokens
            ff = nn.LayerNorm()(tokens)
            ff = nn.Dense(C)(ff)
            ff = nn.gelu(ff, approximate=False)
            ff = nn.Dense(C)(ff)
            tokens = ff + tokens
            return tokens.reshape(B, H, W, C)

    ref_params = FlaxSA().init(jax.random.key(0),
                               jnp.zeros((2, 4, 4, 32)))["params"]
    assert jax.tree.structure(params) == jax.tree.structure(ref_params)
    # identical init RNG consumption -> identical initial weights
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(ref_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # and (given identical params) identical attention output at f32
    x = jnp.asarray(np.random.default_rng(4).normal(size=(2, 4, 4, 32)),
                    jnp.float32)
    out_new = sa.apply({"params": params}, x)
    out_ref = FlaxSA().apply({"params": ref_params}, x)
    np.testing.assert_allclose(np.asarray(out_new), np.asarray(out_ref),
                               rtol=1e-5, atol=1e-5)


def _flax_double_conv(x, w1, w2, g1, b1, g2, b2, ps, pb, residual):
    """Unfused reference math using flax's own GroupNorm/gelu."""
    from flax import linen as nn

    cin = x.shape[-1]
    mid, out = w1.shape[1], w2.shape[1]
    h = po._conv3x3_xla(x, w1)
    gn1 = nn.GroupNorm(num_groups=1, dtype=x.dtype)
    h = gn1.apply({"params": {"scale": g1, "bias": b1}}, h)
    h = nn.gelu(h, approximate=False)
    y = po._conv3x3_xla(h, w2)
    gn2 = nn.GroupNorm(num_groups=1, dtype=x.dtype)
    y = gn2.apply({"params": {"scale": g2, "bias": b2}}, y)
    y = y * ps[:, None, None, :] + pb[:, None, None, :]
    if residual:
        y = nn.gelu(y + x, approximate=False)
    return y


@pytest.mark.parametrize("residual", [False, True])
def test_double_conv_xla_matches_flax_composition(residual):
    rng = np.random.default_rng(6)
    B, H, W, C = 3, 8, 4, 16
    x = _rand(rng, (B, H, W, C), 0.5)
    w1 = _rand(rng, (9 * C, C), 0.1)
    w2 = _rand(rng, (9 * C, C), 0.1)
    g1 = _rand(rng, (C,), 0.2) + 1.0
    b1 = _rand(rng, (C,), 0.2)
    ps = _rand(rng, (B, C), 0.1) + 1.0
    pb = _rand(rng, (B, C), 0.1)
    got = po._double_conv_xla(x, w1, w2, g1, b1, g1, b1, ps, pb, residual)
    want = _flax_double_conv(x, w1, w2, g1, b1, g1, b1, ps, pb, residual)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("shape,cmid,cout,residual", [
    ((4, 32, 8, 16), 16, 16, True),
    ((8, 8, 2, 32), 32, 16, False),
    ((16, 4, 1, 16), 32, 32, False),
])
def test_double_conv_pallas_matches_xla(interpret, shape, cmid, cout,
                                        residual):
    rng = np.random.default_rng(7)
    B, H, W, C = shape
    x = _rand(rng, shape, 0.5)
    w1 = _rand(rng, (9 * C, cmid), 0.1)
    w2 = _rand(rng, (9 * cmid, cout), 0.1)
    g1, b1 = _rand(rng, (cmid,)) + 1.0, _rand(rng, (cmid,), 0.2)
    g2, b2 = _rand(rng, (cout,)) + 1.0, _rand(rng, (cout,), 0.2)
    ps = jnp.ones((B, cout))
    pb = jnp.zeros((B, cout))
    got = po._dc_tpu(x, w1, w2, g1, b1, g2, b2, ps, pb, residual)
    want = po._double_conv_xla(x, w1, w2, g1, b1, g2, b2, ps, pb, residual)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-5, atol=3e-5)


def test_double_conv_custom_vjp_matches_autodiff():
    rng = np.random.default_rng(8)
    B, H, W, C = 2, 8, 4, 8
    x = _rand(rng, (B, H, W, C), 0.5)
    w1 = _rand(rng, (9 * C, C), 0.1)
    w2 = _rand(rng, (9 * C, C), 0.1)
    g1, b1 = _rand(rng, (C,)) + 1.0, _rand(rng, (C,), 0.2)
    ps, pb = jnp.ones((B, C)), jnp.zeros((B, C))

    def loss_custom(*a):
        return jnp.sum(jnp.sin(po._dc_p(*a, True)))

    def loss_ref(*a):
        return jnp.sum(jnp.sin(po._double_conv_xla(*a, True)))

    args = (x, w1, w2, g1, b1, g1, b1, ps, pb)
    import functools as ft
    from jax.experimental import pallas as pl
    orig = pl.pallas_call
    pl.pallas_call = ft.partial(orig, interpret=True)
    try:
        g_custom = jax.grad(loss_custom, tuple(range(9)))(*args)
    finally:
        pl.pallas_call = orig
    g_ref = jax.grad(loss_ref, tuple(range(9)))(*args)
    for a, b in zip(g_custom, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_conv_dw_pallas_matches_autodiff():
    """The fused Pallas weight-gradient kernel (SPDM_CONV_BWD=pallas train
    path) must match XLA autodiff's dw for the xla9 conv bitwise-ish."""
    rng = np.random.default_rng(5)
    x = _rand(rng, (8, 16, 8, 16))
    w = _rand(rng, (9 * 16, 32), 0.1)
    g = _rand(rng, (8, 16, 8, 32))

    import functools as ft
    orig = pl.pallas_call
    pl.pallas_call = ft.partial(orig, interpret=True)
    try:
        dw = po._conv_dw_pallas(x, g)
        # full custom-VJP path vs native autodiff
        g1 = jax.grad(lambda a, b: jnp.vdot(po._conv3x3_t(a, b), g),
                      (0, 1))(x, w)
    finally:
        pl.pallas_call = orig
    g2 = jax.grad(lambda a, b: jnp.vdot(po._conv3x3_xla9(a, b), g),
                  (0, 1))(x, w)
    want_dw = g2[1]
    np.testing.assert_allclose(np.asarray(dw), np.asarray(want_dw),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]),
                               rtol=1e-4, atol=1e-4)

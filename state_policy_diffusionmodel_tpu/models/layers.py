"""Shared model building blocks (Flax linen, NHWC).

Re-designs the torch blocks of `/root/reference/models/Unet_FiLmLayer.py` and
`simple_Unet.py` for TPU: NHWC layout (XLA's native conv layout), fp32
params with optional bf16 compute, and explicit align-corners upsampling
(torch `nn.Upsample(align_corners=True)` has no jax.image equivalent).

Semantics preserved from the reference:
- `DoubleConv`: conv3x3(no bias) -> GroupNorm(1) -> GELU -> conv3x3 ->
  *the same* GroupNorm applied again — the reference reuses one norm module
  for both convs (Unet_FiLmLayer.py:105,111-115), so the scale/bias are
  shared; reproduced via a single module instance called twice.
- `SelfAttention`: pre-LN MHA(4 heads) + residual, then LN->MLP->GELU->MLP
  applied to the post-attention tensor with a second residual
  (Unet_FiLmLayer.py:44-82).
- sinusoidal time embedding with inv_freq = 10000^(-2i/d)
  (Unet_FiLmLayer.py:266-274).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from . import pallas_ops


def sinusoidal_time_embedding(t: jax.Array, dim: int) -> jax.Array:
    """t: (B,) -> (B, dim)."""
    t = t.astype(jnp.float32)[:, None]
    inv_freq = 1.0 / (10000 ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
    ang = t * inv_freq
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


def pad_to(x: jax.Array, stride: int):
    """Zero-pad H, W (axes 1, 2 of NHWC) to multiples of `stride` with the
    reference's asymmetric split (Unet_FiLmLayer.py:14-34)."""
    h, w = x.shape[1], x.shape[2]
    nh = h + (stride - h % stride) % stride
    nw = w + (stride - w % stride) % stride
    lh, uh = (nh - h) // 2, (nh - h) - (nh - h) // 2
    lw, uw = (nw - w) // 2, (nw - w) - (nw - w) // 2
    x = jnp.pad(x, ((0, 0), (lh, uh), (lw, uw), (0, 0)))
    return x, (lw, uw, lh, uh)


def unpad(x: jax.Array, pads):
    lw, uw, lh, uh = pads
    if lh + uh > 0:
        x = x[:, lh : x.shape[1] - uh, :, :]
    if lw + uw > 0:
        x = x[:, :, lw : x.shape[2] - uw, :]
    return x


def upsample_align_corners(x: jax.Array, factor: int = 2) -> jax.Array:
    """Bilinear x2 with align_corners=True on NHWC (torch Upsample parity)."""

    def interp(arr, axis, out_len):
        in_len = arr.shape[axis]
        if in_len == 1:
            reps = [1] * arr.ndim
            reps[axis] = out_len
            return jnp.tile(arr, reps)
        pos = jnp.linspace(0.0, in_len - 1.0, out_len)
        lo = jnp.floor(pos).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, in_len - 1)
        w = (pos - lo).astype(arr.dtype)
        a = jnp.take(arr, lo, axis=axis)
        b = jnp.take(arr, hi, axis=axis)
        shape = [1] * arr.ndim
        shape[axis] = out_len
        w = w.reshape(shape)
        return a * (1 - w) + b * w

    x = interp(x, 1, x.shape[1] * factor)
    x = interp(x, 2, x.shape[2] * factor)
    return x


class Conv3x3(nn.Module):
    """3x3 same-padding conv expressed as an im2col matmul.

    Identical math and parameter shape/init to
    `nn.Conv(features, (3, 3), padding=1, use_bias=False)`, but XLA's TPU
    conv emitter takes ~10-20 s to compile EACH tiny-spatial conv of the
    denoiser (32x8 feature maps; ~20 convs made one U-Net forward take 355 s
    to compile, measured).  Nine static shifted slices + one dot compile in
    well under a second and map onto better MXU shapes at these sizes.

    On TPU the im2col patches tensor is never materialized: a Pallas kernel
    accumulates the nine shifted matmuls in VMEM (pallas_ops.conv3x3) —
    profiling showed patch assembly + re-read was ~2/3 of the denoiser's
    HBM traffic.
    """

    features: int

    @nn.compact
    def __call__(self, x):
        B, H, W, Cin = x.shape
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, Cin, self.features))
        w = kernel.reshape(9 * Cin, self.features)     # (i, j, cin) row-major
        return pallas_ops.conv3x3(x, w.astype(x.dtype))


class DoubleConv(nn.Module):
    """conv3x3 -> GroupNorm(1) -> GELU -> conv3x3 -> GroupNorm(1), with the
    reference's shared-norm quirk: when mid == out the SAME scale/bias are
    applied at both norm sites (Unet_FiLmLayer.py:105,111-115).

    The whole block (plus the optional folded FiLM/time affine epilogue
    `post_scale * y + post_bias` and the residual GELU) runs as one fused
    Pallas kernel on TPU (pallas_ops.double_conv) — the intermediate
    activation and both GroupNorm statistics stay in VMEM."""

    out_channels: int
    residual: bool = False
    mid_channels: Optional[int] = None

    @nn.compact
    def __call__(self, x, post_scale=None, post_bias=None):
        mid = self.mid_channels or self.out_channels
        out = self.out_channels
        cin = x.shape[-1]
        k1 = self.param("conv1_kernel", nn.initializers.lecun_normal(),
                        (3, 3, cin, mid))
        k2 = self.param("conv2_kernel", nn.initializers.lecun_normal(),
                        (3, 3, mid, out))
        # shared norm params (the reference reuses one norm module)
        g2 = self.param("norm_scale", nn.initializers.ones, (out,))
        b2 = self.param("norm_bias", nn.initializers.zeros, (out,))
        if mid == out:
            g1, b1 = g2, b2
        else:
            g1 = self.param("norm_mid_scale", nn.initializers.ones, (mid,))
            b1 = self.param("norm_mid_bias", nn.initializers.zeros, (mid,))
        dt = x.dtype
        B = x.shape[0]
        if post_scale is None:
            post_scale = jnp.ones((B, out), dt)
        if post_bias is None:
            post_bias = jnp.zeros((B, out), dt)
        return pallas_ops.double_conv(
            x, k1.reshape(9 * cin, mid).astype(dt),
            k2.reshape(9 * mid, out).astype(dt),
            g1.astype(dt), b1.astype(dt), g2.astype(dt), b2.astype(dt),
            post_scale.astype(dt), post_bias.astype(dt),
            self.residual)


class _MHA(nn.Module):
    """Multi-head attention, parameter-compatible with
    `nn.MultiHeadDotProductAttention` (same query/key/value/out DenseGeneral
    tree and init order), but with the softmax(qk^T)v core routed through
    `pallas_ops.attention_core`: on TPU the (B*heads, T, T) score tensor
    stays in VMEM instead of round-tripping HBM in f32.

    q/k/v stay packed as (B, T, heads*Dh) end to end — heads live on lane
    slices inside the kernel — so no (B,T,H,Dh)->(B,H,T,Dh) layout copies
    ever materialize (three such copies measured ~60 us/step each).
    `dtype` is the compute dtype of the surrounding block (the pre-LN
    tokens), keeping the whole attention bf16 under amp."""

    num_heads: int
    qkv_features: int
    out_features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        B, T, C = x.shape
        Dh = self.qkv_features // self.num_heads
        dense = partial(nn.DenseGeneral, features=(self.num_heads, Dh),
                        dtype=self.dtype)
        q = dense(name="query")(x).reshape(B, T, self.num_heads * Dh)
        k = dense(name="key")(x).reshape(B, T, self.num_heads * Dh)
        v = dense(name="value")(x).reshape(B, T, self.num_heads * Dh)
        out = pallas_ops.attention_core(q, k, v, num_heads=self.num_heads)
        out = out.reshape(B, T, self.num_heads, Dh)
        return nn.DenseGeneral(self.out_features, axis=(-2, -1),
                               dtype=self.dtype, name="out")(out)


class SelfAttention(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        dt = x.dtype
        tokens = x.reshape(B, H * W, C)
        ln = nn.LayerNorm(dtype=dt)(tokens)
        attn = _MHA(num_heads=4, qkv_features=C, out_features=C, dtype=dt,
                    name="MultiHeadDotProductAttention_0")(ln)
        tokens = attn + tokens
        ff = nn.LayerNorm(dtype=dt)(tokens)
        ff = nn.Dense(C, dtype=dt)(ff)
        ff = nn.gelu(ff, approximate=False)
        ff = nn.Dense(C, dtype=dt)(ff)
        tokens = ff + tokens
        return tokens.reshape(B, H, W, C)


def max_pool_2x2(x: jax.Array) -> jax.Array:
    """2x2/stride-2 max pool as an elementwise max of four strided slices.

    Exactly nn.max_pool(x, (2,2), strides=(2,2)) — but reduce-window over
    the sublane (W) dim measured ~2.9 ms/step at (256,32,8,64) bf16 in the
    standard layout the Pallas conv kernels pin; four strided slices fuse
    into one cheap loop fusion."""
    a = jnp.maximum(x[:, ::2, ::2], x[:, 1::2, ::2])
    b = jnp.maximum(x[:, ::2, 1::2], x[:, 1::2, 1::2])
    return jnp.maximum(a, b)


class _PostAffine(nn.Module):
    """The folded per-(batch, channel) conditioning epilogue of a block:
    TimeInject then FiLM, i.e. s*(y + tb) + b = s*y + (s*tb + b), returned
    as (post_scale, post_bias) vectors for DoubleConv's fused epilogue."""

    channels: int

    @nn.compact
    def __call__(self, t_emb, cond, dtype):
        tb = nn.Dense(self.channels, dtype=dtype,
                      name="time_dense")(nn.silu(t_emb))       # (B, C)
        if cond is None:
            return jnp.ones_like(tb), tb
        cond = cond.reshape(cond.shape[0], -1)
        emb = nn.Dense(self.channels * 2, dtype=dtype,
                       name="film_dense")(jax.nn.mish(cond))
        emb = emb.reshape(-1, 2, self.channels)
        scale, bias = emb[:, 0], emb[:, 1]
        return scale, scale * tb + bias


class DownBlock(nn.Module):
    out_channels: int
    use_cond: bool = True
    residual_first: bool = False

    @nn.compact
    def __call__(self, x, t_emb, cond=None):
        in_ch = x.shape[-1]
        x = max_pool_2x2(x)
        x = DoubleConv(in_ch, residual=self.residual_first)(x)
        ps, pb = _PostAffine(self.out_channels)(
            t_emb, cond if self.use_cond else None, x.dtype)
        return DoubleConv(self.out_channels)(x, ps, pb)


class UpBlock(nn.Module):
    out_channels: int
    use_cond: bool = True
    residual_first: bool = False

    @nn.compact
    def __call__(self, x, skip, t_emb, cond=None):
        x = upsample_align_corners(x, 2)
        x = jnp.concatenate([x, skip], axis=-1)
        in_ch = x.shape[-1]
        x = DoubleConv(in_ch, residual=self.residual_first)(x)
        ps, pb = _PostAffine(self.out_channels)(
            t_emb, cond if self.use_cond else None, x.dtype)
        return DoubleConv(self.out_channels)(x, ps, pb)

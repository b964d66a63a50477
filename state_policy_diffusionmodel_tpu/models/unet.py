"""The three denoiser U-Nets, Flax/NHWC.

Architecture parity with the reference:
- `UNetFiLM`      <- `UNet_Film` (`/root/reference/models/Unet_FiLmLayer.py:240-312`):
  inc 1->64; downs 64->128->256->256 each + 4-head SelfAttention; bottleneck
  256->512->512->256; ups with skip concat (512->128, 256->64, 128->64) each
  + attention; 1x1 out conv.  FiLM conditioning on the flattened observation
  vector in every up/down block; sinusoidal 256-d time embedding.
- `UNetFiLMNoAttention` <- `UNet_Film_noAttention` (same minus attention).
- `UNetSimple`    <- `UNet` (`/root/reference/models/simple_Unet.py:260-339`):
  smaller channel plan (16/32/128/256), residual first DoubleConvs,
  conditioning by concatenating a 32-d cond embedding as extra channels,
  table-free sinusoidal time embedding.

Inputs are NHWC: x (B, T, D, 1) — the reference's (B, 1, T, D) transposed.
All nets pad T, D to multiples of 8 (3 pooling levels) like the reference's
`pad_to` (Unet_FiLmLayer.py:286,310).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import (
    DoubleConv, DownBlock, SelfAttention, UpBlock, max_pool_2x2,
    pad_to, sinusoidal_time_embedding, unpad, upsample_align_corners,
)


class UNetFiLM(nn.Module):
    out_channels: int = 1
    time_dim: int = 256
    with_attention: bool = True
    width: int = 64   # base channel count; 64 = reference channel plan

    @nn.compact
    def __call__(self, x: jax.Array, t: jax.Array, cond: Optional[jax.Array] = None):
        """x: (B, T, D, 1); t: (B,) or (); cond: (B, ...) flattened for FiLM."""
        t = jnp.atleast_1d(t)
        if t.shape[0] != x.shape[0]:
            t = jnp.broadcast_to(t, (x.shape[0],))
        t_emb = sinusoidal_time_embedding(t, self.time_dim)

        x, pads = pad_to(x, 2**3)

        sa = (lambda c: SelfAttention(c)) if self.with_attention else (
            lambda c: (lambda h: h))

        w = self.width
        x1 = DoubleConv(w)(x)
        x2 = sa(2 * w)(DownBlock(2 * w)(x1, t_emb, cond))
        x3 = sa(4 * w)(DownBlock(4 * w)(x2, t_emb, cond))
        x4 = sa(4 * w)(DownBlock(4 * w)(x3, t_emb, cond))

        x5 = DoubleConv(8 * w)(x4)
        x5 = DoubleConv(8 * w)(x5)
        x5 = DoubleConv(4 * w)(x5)

        h = sa(2 * w)(UpBlock(2 * w)(x5, x3, t_emb, cond))
        h = sa(w)(UpBlock(w)(h, x2, t_emb, cond))
        h = sa(w)(UpBlock(w)(h, x1, t_emb, cond))

        h = nn.Conv(self.out_channels, (1, 1))(h)
        return unpad(h, pads)


class UNetFiLMNoAttention(UNetFiLM):
    with_attention: bool = False


class _CondConcat(nn.Module):
    """SiLU->Dense(32), broadcast and concatenated as channels
    (simple_Unet.py:152-156,170-174)."""

    @nn.compact
    def __call__(self, x, cond):
        cond = cond.reshape(cond.shape[0], -1)
        emb = nn.Dense(32)(nn.silu(cond))
        emb = jnp.broadcast_to(
            emb[:, None, None, :], x.shape[:3] + (emb.shape[-1],))
        return jnp.concatenate([x, emb], axis=-1)


class UNetSimple(nn.Module):
    out_channels: int = 1
    time_dim: int = 256
    width: int = 16   # base channel count; 16 = reference channel plan

    @nn.compact
    def __call__(self, x: jax.Array, t: jax.Array, cond: Optional[jax.Array] = None):
        t = jnp.atleast_1d(t)
        if t.shape[0] != x.shape[0]:
            t = jnp.broadcast_to(t, (x.shape[0],))
        t_emb = sinusoidal_time_embedding(t, self.time_dim)
        use_cond = cond is not None

        x, pads = pad_to(x, 2**3)

        def time_bias(h, out_ch):
            # TimeInject folded into DoubleConv's fused affine epilogue
            return nn.Dense(out_ch, dtype=h.dtype)(nn.silu(t_emb))

        def down(h, out_ch):
            in_ch = h.shape[-1]
            h = max_pool_2x2(h)
            h = DoubleConv(in_ch, residual=True)(h)
            h = DoubleConv(out_ch)(h, post_bias=time_bias(h, out_ch))
            if use_cond:
                h = _CondConcat()(h, cond)
            return h

        def up(h, skip, out_ch):
            h = upsample_align_corners(h, 2)
            h = jnp.concatenate([h, skip], axis=-1)
            in_ch = h.shape[-1]
            h = DoubleConv(in_ch, residual=True)(h)
            h = DoubleConv(out_ch)(h, post_bias=time_bias(h, out_ch))
            if use_cond:
                h = _CondConcat()(h, cond)
            return h

        w = self.width
        x1 = DoubleConv(w)(x)
        x2 = down(x1, 2 * w)      # 32 (+32 cond) at the default width
        x3 = down(x2, 8 * w)      # 128 (+32)
        x4 = down(x3, 16 * w)     # 256 (+32)
        h = up(x4, x3, 8 * w)
        h = up(h, x2, 4 * w)
        h = up(h, x1, 2 * w)
        h = nn.Conv(self.out_channels, (1, 1))(h)
        return unpad(h, pads)


MODEL_REGISTRY = {
    "UNet_Film": UNetFiLM,
    "UNet_FilmnoAttention": UNetFiLMNoAttention,
    "UNet": UNetSimple,
}


def build_model(name: str, out_channels: int = 1, time_dim: int = 256,
                width: Optional[int] = None):
    """Model selection by the reference's CLI names (diffusion_ddpm.py:54-62).

    width: base channel count override (default None = each net's reference
    channel plan). The whole plan scales proportionally — handy for width
    sweeps and for tests, which compile much faster at width 8."""
    cls = MODEL_REGISTRY.get(name, UNetSimple)
    kw = {} if width is None else {"width": width}
    return cls(out_channels=out_channels, time_dim=time_dim, **kw)

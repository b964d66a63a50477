"""Pallas TPU kernels for the denoiser hot ops: 3x3 conv and attention.

Profiling the closed-loop DDIM-10 policy (bench.py --mode policy
--profile-dir) showed the U-Net forward is HBM-bound, not MXU-bound:

- every `Conv3x3` materialized its im2col patches tensor in HBM
  ((B, 32, 8, 9*Cin) bf16 = 151 MB at B=256, Cin=128), assembled by ~9
  dynamic-update-slice fusions and re-read by the dot — ~350 ms of the
  526 ms device time per measured policy run;
- `SelfAttention` at the full 32x8 resolution round-tripped its
  (B, 4, 256, 256) f32 score tensor (268 MB at B=256) through HBM for the
  softmax — ~155 ms.

Both kernels keep those intermediates in VMEM:

- `conv3x3`: grid over batch tiles; the zero-padded input block lives in
  VMEM and the nine shifted (TB*H*W, Cin) x (Cin, Cout) matmuls accumulate
  in f32 registers — the patches tensor never exists. HBM traffic drops
  from ~11x to ~2x the activation size.
- `attention_core`: grid over flattened (batch*heads) tiles; per head the
  (T, T) f32 scores + softmax + (T, T)@(T, Dh) product all stay in VMEM.

Each op is a `jax.custom_vjp` whose backward pass is plain XLA math
(conv transpose / attention recompute), so both remain differentiable for
training; the forward picks the Pallas kernel on TPU and the reference XLA
formulation elsewhere (CPU tests, the virtual-mesh dry run).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


# ---------------------------------------------------------------------------
# 3x3 same-padding convolution
# ---------------------------------------------------------------------------

def _conv3x3_xla(x: jax.Array, w9: jax.Array) -> jax.Array:
    """Reference im2col formulation (models/layers.py round-1 math)."""
    B, H, W, Cin = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    patches = jnp.concatenate(
        [xp[:, i:i + H, j:j + W, :] for i in range(3) for j in range(3)],
        axis=-1)                                   # (B, H, W, 9*Cin)
    return jax.lax.dot_general(
        patches, w9, (((3,), (0,)), ((), ())),
        preferred_element_type=x.dtype)


def _conv_kernel(xp_ref, w_ref, out_ref, *, TB: int, H: int, W: int,
                 Cin: int, Cout: int):
    acc = jnp.zeros((TB * H * W, Cout), jnp.float32)
    for di in range(3):
        for dj in range(3):
            xs = xp_ref[:, di:di + H, dj:dj + W, :]
            xs = xs.reshape(TB * H * W, Cin)
            ws = w_ref[(di * 3 + dj) * Cin:(di * 3 + dj + 1) * Cin, :]
            acc += jax.lax.dot_general(
                xs, ws, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    out_ref[:] = acc.reshape(TB, H, W, Cout).astype(out_ref.dtype)


def _conv_batch_tile(B: int, H: int, W: int, Cin: int, Cout: int,
                     itemsize: int) -> int:
    """Largest power-of-two batch tile whose modeled VMEM working set fits
    comfortably under Mosaic's ~16 MB scoped limit: double-buffered in/out
    blocks, the f32 accumulator, the shifted-slice temporary, and the
    weights. (A 64-batch f32 tile at the 16x4x256 level measured 16.7 MB
    and OOM'd scoped vmem; this model keeps the worst level under ~10 MB.)"""
    budget = 10 * 1024 * 1024
    tb = 1
    while tb < B:
        nxt = tb * 2
        in_bytes = 2 * nxt * (H + 2) * (W + 2) * Cin * itemsize
        out_bytes = 2 * nxt * H * W * Cout * itemsize
        acc_bytes = nxt * H * W * Cout * 4
        xs_bytes = nxt * H * W * Cin * itemsize
        w_bytes = 9 * Cin * Cout * itemsize
        if (in_bytes + out_bytes + acc_bytes + xs_bytes + w_bytes > budget
                or B % nxt):
            break
        tb = nxt
    return tb


def _conv3x3_pallas(x: jax.Array, w9: jax.Array) -> jax.Array:
    B, H, W, Cin = x.shape
    Cout = w9.shape[1]
    TB = _conv_batch_tile(B, H, W, Cin, Cout, x.dtype.itemsize)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    grid_spec = pl.GridSpec(
        grid=(B // TB,),
        in_specs=[
            pl.BlockSpec((TB, H + 2, W + 2, Cin), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * Cin, Cout), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, H, W, Cout), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_conv_kernel, TB=TB, H=H, W=W, Cin=Cin, Cout=Cout),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, W, Cout), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W * 9 * Cin * Cout,
            bytes_accessed=xp.size * xp.dtype.itemsize
            + B * H * W * Cout * x.dtype.itemsize,
            transcendentals=0),
    )(xp, w9)


def _conv3x3_impl(x: jax.Array, w9: jax.Array) -> jax.Array:
    B, H, W, Cin = x.shape
    # the Pallas path wants >= 8 input lanes and a batch worth tiling; the
    # U-Net's first conv (Cin=1) and CPU runs use the XLA formulation
    if _on_tpu() and Cin >= 8 and B * H * W >= 1024:
        return _conv3x3_pallas(x, w9)
    return _conv3x3_xla(x, w9)


@jax.custom_vjp
def conv3x3(x: jax.Array, w9: jax.Array) -> jax.Array:
    """3x3 same-padding conv, NHWC; w9 is the kernel reshaped (9*Cin, Cout)
    row-major in (di, dj, cin)."""
    return _conv3x3_impl(x, w9)


def _conv3x3_fwd(x, w9):
    return _conv3x3_impl(x, w9), (x, w9)


def _conv3x3_bwd(res, g):
    x, w9 = res
    B, H, W, Cin = x.shape
    Cout = w9.shape[1]
    # dx: 'same' conv of g with the spatially-flipped, transposed kernel
    w = w9.reshape(3, 3, Cin, Cout)
    w_flip = jnp.flip(w, (0, 1)).transpose(0, 1, 3, 2).reshape(9 * Cout, Cin)
    dx = _conv3x3_impl(g, w_flip).astype(x.dtype)
    # dw[di,dj,ci,co] = sum_{b,h,w} xpad[b,h+di,w+dj,ci] * g[b,h,w,co]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    g2 = g.reshape(-1, Cout)
    dws = [
        jax.lax.dot_general(
            xp[:, di:di + H, dj:dj + W, :].reshape(-1, Cin),
            g2, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        for di in range(3) for dj in range(3)
    ]
    dw9 = jnp.concatenate(dws, axis=0).astype(w9.dtype)
    return dx, dw9


conv3x3.defvjp(_conv3x3_fwd, _conv3x3_bwd)


# ---------------------------------------------------------------------------
# multi-head attention core: softmax(q k^T / sqrt(Dh)) v
# ---------------------------------------------------------------------------

def _split_heads(x: jax.Array, num_heads: int) -> jax.Array:
    B, T, C = x.shape
    return x.reshape(B, T, num_heads, C // num_heads)


def _attn_xla(q: jax.Array, k: jax.Array, v: jax.Array,
              num_heads: int) -> jax.Array:
    """(B, T, heads*Dh) each; f32 softmax (flax dot_product_attention math)."""
    B, T, C = q.shape
    Dh = C // num_heads
    qh = _split_heads(q, num_heads) / jnp.sqrt(Dh).astype(q.dtype)
    s = jnp.einsum("bqhd,bkhd->bhqk", qh, _split_heads(k, num_heads),
                   preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", p.astype(v.dtype),
                     _split_heads(v, num_heads),
                     preferred_element_type=jnp.float32).astype(q.dtype)
    return out.reshape(B, T, C)


def _attn_kernel(q_ref, k_ref, v_ref, out_ref, *, GB: int, H: int, Dh: int):
    scale = 1.0 / (Dh ** 0.5)
    for g in range(GB):
        for h in range(H):
            sl = slice(h * Dh, (h + 1) * Dh)           # heads on lane slices
            qg = (q_ref[g, :, sl] * scale).astype(q_ref.dtype)
            s = jax.lax.dot_general(                   # (T, T) f32 in VMEM
                qg, k_ref[g, :, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            s = s - jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            out_ref[g, :, sl] = jax.lax.dot_general(
                p.astype(v_ref.dtype), v_ref[g, :, sl],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(out_ref.dtype)


def _attn_pallas(q: jax.Array, k: jax.Array, v: jax.Array,
                 num_heads: int) -> jax.Array:
    B, T, C = q.shape
    GB = 1
    while GB < B and GB * T <= 2048 and B % (GB * 2) == 0:
        GB *= 2
    spec = pl.BlockSpec((GB, T, C), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    grid_spec = pl.GridSpec(grid=(B // GB,), in_specs=[spec] * 3,
                            out_specs=spec)
    return pl.pallas_call(
        functools.partial(_attn_kernel, GB=GB, H=num_heads,
                          Dh=C // num_heads),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, T, C), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * num_heads * T * T * (C // num_heads),
            bytes_accessed=4 * B * T * C * q.dtype.itemsize,
            transcendentals=B * num_heads * T * T),
    )(q, k, v)


def _attn_impl(q, k, v, num_heads):
    B, T, C = q.shape
    # tiny token counts (the 4x1 bottleneck level) stay on XLA: sublane
    # padding would waste most of the tile
    if _on_tpu() and T >= 16 and C // num_heads >= 8:
        return _attn_pallas(q, k, v, num_heads)
    return _attn_xla(q, k, v, num_heads)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def attention_core(q: jax.Array, k: jax.Array, v: jax.Array,
                   num_heads: int = 1) -> jax.Array:
    """Per-head softmax(q k^T / sqrt(Dh)) v over packed (B, T, heads*Dh)
    tensors (head h occupies feature columns [h*Dh, (h+1)*Dh))."""
    return _attn_impl(q, k, v, num_heads)


def _attn_fwd(q, k, v, num_heads):
    return _attn_impl(q, k, v, num_heads), (q, k, v)


def _attn_bwd(num_heads, res, g):
    q, k, v = res
    B, T, C = q.shape
    Dh = C // num_heads
    f32 = lambda t: _split_heads(t, num_heads).astype(jnp.float32)
    scale = 1.0 / jnp.sqrt(Dh).astype(jnp.float32)
    s = jnp.einsum("bqhd,bkhd->bhqk", f32(q) * scale, f32(k))
    p = jax.nn.softmax(s, axis=-1)                       # (B, H, T, T) f32
    gf = f32(g)
    dv = jnp.einsum("bhqk,bqhd->bkhd", p, gf)
    dp = jnp.einsum("bqhd,bkhd->bhqk", gf, f32(v))
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bkhd->bqhd", ds, f32(k)) * scale
    dk = jnp.einsum("bhqk,bqhd->bkhd", ds, f32(q)) * scale
    pack = lambda t, like: t.reshape(B, T, C).astype(like.dtype)
    return pack(dq, q), pack(dk, k), pack(dv, v)


attention_core.defvjp(_attn_fwd, _attn_bwd)

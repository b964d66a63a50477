"""Autoencoder pretraining (parity with /root/reference/encoder/
train_autoencoder.py: MSE reconstruction on dataset frames, Adam +
ReduceLROnPlateau, batch 128, 90/10 split).

TPU-shaped like the policy loop (train/loop.py): the frame set lives in
device HBM (uint8 when the [0,1] floats are exact 8-bit values — 4x
smaller, /255 in-jit), and a whole epoch of train steps runs as ONE
jitted lax.scan — the host pays one round trip per epoch instead of one
per step + a float(loss) sync per step.  Epoch checkpoints save on a
background thread (_AsyncSaver).
"""

from __future__ import annotations

import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import Autoencoder
from . import checkpoints as ckpt_lib
from .loop import _AsyncSaver
from .lr_schedule import ReduceLROnPlateau


def train_autoencoder(
    images: np.ndarray,
    out_dir: str,
    epochs: int = 50,
    batch_size: int = 128,
    lr: float = 1e-3,
    seed: int = 0,
    log=print,
) -> Dict:
    """images: (N, 96, 96, 3) float in [0,1]. Returns {params, history}."""
    ae = Autoencoder()
    rng = jax.random.key(seed)
    params = jax.jit(ae.init)(rng, jnp.zeros((1, 96, 96, 3)))["params"]

    opt = optax.chain(optax.clip_by_global_norm(1.0),
                      optax.inject_hyperparams(optax.adam)(learning_rate=lr))
    opt_state = opt.init(params)

    # device-resident frames: uint8 when lossless (the env writes exact
    # 8-bit values scaled to [0,1]), f32 otherwise
    scaled = images * np.float32(255.0)
    rounded = np.round(scaled)
    if np.abs(scaled - rounded).max() < 1e-3:
        data = jnp.asarray(rounded.astype(np.uint8))
    else:
        data = jnp.asarray(images.astype(np.float32))
    jax.block_until_ready(data)

    # `data` is an EXPLICIT argument of every jitted function: a closed-over
    # device array is inlined into the lowered HLO as a literal and shipped
    # with every remote compile request — the axon tunnel rejects bodies
    # above ~256 MB (HTTP 413), and it bloats the persistent cache.
    def get_batch(data, idx):
        batch = data[idx]
        if batch.dtype == jnp.uint8:
            batch = batch.astype(jnp.float32) / 255.0
        return batch

    def step(params, opt_state, batch, lr_val):
        def loss_fn(p):
            recon = ae.apply({"params": p}, batch)
            return jnp.mean((recon - batch) ** 2)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        opt_state[1].hyperparams["learning_rate"] = lr_val
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def run_epoch(params, opt_state, idx_chunks, lr_val, data):
        def body(carry, idx):
            params, opt_state = carry
            params, opt_state, loss = step(params, opt_state,
                                           get_batch(data, idx), lr_val)
            return (params, opt_state), loss
        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), idx_chunks)
        return params, opt_state, losses

    @jax.jit
    def run_val(params, idx_chunks, data):
        return jnp.mean(jax.lax.map(
            lambda idx: eval_loss(params, get_batch(data, idx)), idx_chunks))

    @jax.jit
    def eval_loss(params, batch):
        recon = ae.apply({"params": params}, batch)
        return jnp.mean((recon - batch) ** 2)

    n = len(images)
    host_rng = np.random.default_rng(seed)
    split = int(n * 0.9)
    perm = host_rng.permutation(n)
    train_idx, val_idx = perm[:split], perm[split:]
    n_val_full = len(val_idx) // batch_size
    val_chunks = (jnp.asarray(
        val_idx[:n_val_full * batch_size].reshape(n_val_full, batch_size)
        .astype(np.int32)) if n_val_full else None)

    plateau = ReduceLROnPlateau(lr=lr)
    cur_lr = lr
    history = {"train_loss": [], "val_loss": []}
    saver = _AsyncSaver()
    os.makedirs(out_dir, exist_ok=True)

    def save_epoch(params, epoch):
        ckpt_lib.save_checkpoint(out_dir, {"encoder": params["encoder"],
                                           "decoder": params["decoder"]},
                                 epoch)

    for epoch in range(epochs):
        order = host_rng.permutation(train_idx)
        k = len(order) // batch_size
        chunks = jnp.asarray(
            order[:k * batch_size].reshape(k, batch_size).astype(np.int32))
        params, opt_state, losses = run_epoch(params, opt_state, chunks,
                                              jnp.asarray(cur_lr), data)
        if val_chunks is not None:
            val = float(run_val(params, val_chunks, data))
        elif len(val_idx):
            # fewer val frames than one batch: single partial batch
            # (matches the reference's ragged tail evaluation)
            val = float(eval_loss(params, get_batch(
                data, jnp.asarray(val_idx.astype(np.int32)))))
        else:
            val = float("nan")
        cur_lr = plateau.update(val)
        history["train_loss"].append(float(jnp.mean(losses)))
        history["val_loss"].append(val)
        log(f"epoch {epoch}: train {history['train_loss'][-1]:.5f} "
            f"val {val:.5f} lr {cur_lr:.2e}")
        saver.submit(save_epoch, params, epoch)

    saver.wait()
    return {"params": params, "history": history}

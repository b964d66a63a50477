"""Autoencoder pretraining (parity with /root/reference/encoder/
train_autoencoder.py: MSE reconstruction on dataset frames, Adam +
ReduceLROnPlateau, batch 128, 90/10 split)."""

from __future__ import annotations

import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import Autoencoder
from . import checkpoints as ckpt_lib
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
    params = ae.init(rng, jnp.zeros((1, 96, 96, 3)))["params"]

    opt = optax.chain(optax.clip_by_global_norm(1.0),
                      optax.inject_hyperparams(optax.adam)(learning_rate=lr))
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, batch, lr_val):
        def loss_fn(p):
            recon = ae.apply({"params": p}, batch)
            return jnp.mean((recon - batch) ** 2)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        opt_state[1].hyperparams["learning_rate"] = lr_val
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def eval_loss(params, batch):
        recon = ae.apply({"params": params}, batch)
        return jnp.mean((recon - batch) ** 2)

    n = len(images)
    host_rng = np.random.default_rng(seed)
    split = int(n * 0.9)
    perm = host_rng.permutation(n)
    train_idx, val_idx = perm[:split], perm[split:]

    plateau = ReduceLROnPlateau(lr=lr)
    cur_lr = lr
    history = {"train_loss": [], "val_loss": []}
    os.makedirs(out_dir, exist_ok=True)

    for epoch in range(epochs):
        order = host_rng.permutation(train_idx)
        losses = []
        for i in range(0, len(order) - batch_size + 1, batch_size):
            batch = jnp.asarray(images[order[i:i + batch_size]])
            params, opt_state, loss = step(params, opt_state, batch,
                                           jnp.asarray(cur_lr))
            losses.append(float(loss))
        vlosses = [float(eval_loss(params, jnp.asarray(images[val_idx[i:i + batch_size]])))
                   for i in range(0, max(len(val_idx) - batch_size + 1, 1), batch_size)]
        val = float(np.mean(vlosses)) if vlosses else float("nan")
        cur_lr = plateau.update(val)
        history["train_loss"].append(float(np.mean(losses)))
        history["val_loss"].append(val)
        log(f"epoch {epoch}: train {history['train_loss'][-1]:.5f} "
            f"val {val:.5f} lr {cur_lr:.2e}")
        ckpt_lib.save_checkpoint(out_dir, {"encoder": params["encoder"],
                                           "decoder": params["decoder"]}, epoch)

    return {"params": params, "history": history}

"""Checkpointing: orbax params + hparams.yaml + STATS.pkl sidecars.

Capability-parity with the reference's Lightning artifacts
(`/root/reference/train.py:96-100,122-125`): per-epoch keep-all checkpoints
under `<run>/checkpoints/epoch=K`, an `hparams.yaml` with the full config
(restored by every inference/eval script via
`fetch_hyperparams_from_yaml`, utils/data_utils.py:5-8), and the STATS.pkl
normalization sidecar written by the data module.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import yaml

try:
    import orbax.checkpoint as ocp
except Exception:  # pragma: no cover
    ocp = None


def checkpoint_dir(out_dir: str, epoch: int,
                   subdir: str = "checkpoints") -> str:
    return os.path.join(out_dir, subdir, f"epoch={epoch}")


def save_checkpoint(out_dir: str, params, epoch: int,
                    subdir: str = "checkpoints") -> str:
    path = checkpoint_dir(out_dir, epoch, subdir)
    if ocp is not None:
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(path), jax.device_get(params), force=True)
        ckptr.wait_until_finished()
    else:  # fallback: flat npz
        os.makedirs(path, exist_ok=True)
        flat = jax.tree_util.tree_flatten_with_path(jax.device_get(params))[0]
        np.savez(os.path.join(path, "params.npz"),
                 **{jax.tree_util.keystr(k): np.asarray(v) for k, v in flat})
    return path


def load_checkpoint(path: str, like=None):
    if path is None:
        # every --ema CLI path funnels latest_checkpoint(...) in here; a
        # run trained without --ema_decay has no checkpoints_ema/ and
        # latest_checkpoint returns None (round-4 advisor, low)
        raise FileNotFoundError(
            "no checkpoint found — if this was a --ema load, the run has "
            "no checkpoints_ema/ (trained without --ema_decay?)")
    if ocp is not None and not os.path.exists(os.path.join(path, "params.npz")):
        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(os.path.abspath(path), like)
    data = np.load(os.path.join(path, "params.npz"))
    if like is None:
        raise ValueError("npz restore requires a template pytree")
    flat, treedef = jax.tree_util.tree_flatten_with_path(like)
    # npz snapshots may be stored downcast (tools/snapshot_run.py --dtype
    # float16); restore at the template's dtype so downstream code sees
    # the usual fp32 params
    return jax.tree_util.tree_unflatten(
        treedef,
        [np.asarray(data[jax.tree_util.keystr(k)], dtype=np.asarray(t).dtype)
         for k, t in flat])


def latest_checkpoint(out_dir: str,
                      subdir: str = "checkpoints") -> Optional[str]:
    root = os.path.join(out_dir, subdir)
    if not os.path.isdir(root):
        return None
    epochs = []
    for name in os.listdir(root):
        if name.startswith("epoch="):
            try:
                epochs.append(int(name.split("=")[1]))
            except ValueError:
                pass
    if not epochs:
        return None
    return checkpoint_dir(out_dir, max(epochs), subdir)


def save_train_state(out_dir: str, opt_state, meta: Dict[str, Any]) -> str:
    """Resume sidecar: optimizer state (orbax/npz) + host metadata (yaml).

    Written once per epoch (latest-only); together with the per-epoch params
    checkpoint this makes training resumable mid-run — a capability the
    reference gets from Lightning's ckpt format (train.py:96-100) but never
    wires up."""
    path = os.path.join(out_dir, "trainer_state")
    if ocp is not None:
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(os.path.join(path, "opt")),
                   jax.device_get(opt_state), force=True)
        ckptr.wait_until_finished()
    else:
        os.makedirs(os.path.join(path, "opt"), exist_ok=True)
        flat = jax.tree_util.tree_flatten_with_path(
            jax.device_get(opt_state))[0]
        np.savez(os.path.join(path, "opt", "params.npz"),
                 **{jax.tree_util.keystr(k): np.asarray(v) for k, v in flat})
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "meta.yaml"), "w") as f:
        yaml.safe_dump(meta, f)
    return path


def load_train_state(out_dir: str, like_opt_state):
    """Returns (opt_state, meta) or None if no resume sidecar exists."""
    path = os.path.join(out_dir, "trainer_state")
    meta_path = os.path.join(path, "meta.yaml")
    if not os.path.exists(meta_path):
        return None
    with open(meta_path) as f:
        meta = yaml.safe_load(f)
    opt = load_checkpoint(os.path.join(path, "opt"), like_opt_state)
    return opt, meta


def save_hparams(out_dir: str, policy_config, train_config=None) -> str:
    """hparams.yaml with the policy + train config (Lightning
    save_hyperparameters parity, diffusion_ddpm.py:38)."""
    payload: Dict[str, Any] = dict(dataclasses.asdict(policy_config))
    if train_config is not None:
        payload.update({f"train_{k}": v
                        for k, v in dataclasses.asdict(train_config).items()})
    # reference-compatible key aliases (hparams.yaml keys read by eval scripts)
    payload.setdefault("observation_dim", policy_config.observation_dim)
    path = os.path.join(out_dir, "hparams.yaml")
    with open(path, "w") as f:
        yaml.safe_dump(payload, f)
    return path


def load_hparams(path: str) -> Dict[str, Any]:
    with open(path) as f:
        return yaml.safe_load(f)

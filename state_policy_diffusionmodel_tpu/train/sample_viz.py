"""Validation-time sample figures — the reference's quarter-epoch visual
feedback loop.

The reference runs full reverse diffusion on validation batch 0 at every
validation check and logs position/action figures to TensorBoard
(`/root/reference/models/diffusion_ddpm.py:100-113` via `plt2tsb`
`:351-422,425-437`). Here `make_sample_hook` builds the equivalent
`sample_hook` for `Trainer.fit`: a fixed validation window is sampled with
the jitted denoise loop and the overlay figures are written as PNGs into
`<out_dir>/samples/` and, when TensorBoard mirroring is on, as TB images.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data import normalize as N
from ..diffusion import DiffusionPolicy


def make_sample_hook(policy: DiffusionPolicy, dm, out_dir: str,
                     tb_writer=None, sampler: str = "ddim",
                     num_inference_steps: Optional[int] = 50,
                     window_rank: int = 0):
    """sample_hook(params, step_idx) for `Trainer.fit`.

    Uses the `window_rank`-th validation window (fixed across the run, like
    the reference's `batch_idx == 0` gate, diffusion_ddpm.py:101).
    Returns None if the validation split is empty.
    """
    from ..utils import plotting

    if len(dm.val_idx) == 0:
        return None
    ds = dm.data_full
    idx = int(np.asarray(dm.val_idx)[window_rank % len(dm.val_idx)])
    start, end = (int(v) for v in ds.indices[idx][:2])
    raw = {k: np.asarray(v[start:end:ds.step_size])
           for k, v in ds.train_data.items()}
    npos, translation = N.normalize_position(raw["position"],
                                             ds.stats["position"])
    batch = {
        "image": jnp.asarray(raw["image"])[None],
        "position": jnp.asarray(npos.astype(np.float32))[None],
        "velocity": jnp.asarray(raw["velocity"])[None],
        "action": jnp.asarray(raw["action"])[None],
    }

    cfg = policy.config
    obs_h, inp_h = cfg.obs_horizon, cfg.inpaint_horizon
    sample_dir = os.path.join(out_dir, "samples")
    os.makedirs(sample_dir, exist_ok=True)

    sample_fn = jax.jit(lambda params, rng: policy.sample(
        params, batch, rng, sampler=sampler,
        num_inference_steps=num_inference_steps))

    def hook(params, step_idx: int):
        pred = np.asarray(sample_fn(params, jax.random.key(step_idx))[0])
        pos = N.unnormalize_position(pred[:, :2], translation,
                                     ds.stats["position"])
        act = N.unnormalize_data(pred[:, 2:], ds.stats["action"])

        fig_pos = plotting.plot_prediction_overlay(
            positions_gt=raw["position"][obs_h:],
            positions_obs=raw["position"][:obs_h],
            positions_pred=pos[inp_h:],
            positions_inpaint=pos[:inp_h],
            title=f"val sample @ step {step_idx}")
        fig_act = plotting.plot_action_comparison(
            actions_pred=act,
            actions_gt=raw["action"][obs_h - inp_h:],
            inpaint_horizon=inp_h,
            title=f"val sample @ step {step_idx}")

        for tag, fig in (("positions", fig_pos), ("actions", fig_act)):
            arr = plotting.fig_to_array(fig)
            path = os.path.join(sample_dir, f"step_{step_idx:07d}_{tag}.png")
            _save_png(arr, path)
            if tb_writer is not None:
                # HWC uint8 -> TB expects CHW
                tb_writer.add_image(f"val_sample/{tag}",
                                    arr.transpose(2, 0, 1), step_idx)
        _close(fig_pos, fig_act)

    return hook


def _save_png(arr: np.ndarray, path: str):
    from PIL import Image

    Image.fromarray(arr).save(path)


def _close(*figs):
    import matplotlib.pyplot as plt

    for f in figs:
        plt.close(f)

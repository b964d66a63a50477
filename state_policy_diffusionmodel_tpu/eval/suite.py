"""The reference evaluation suite as library functions.

Reimplements the capabilities of `/root/reference/evaluation/` (the scripts
there have drifted from the model API and would crash as-is — see SURVEY §2.12;
here they are maintained, tested code):

- `position_consistency`  <- eval_consistency_diffusion_positions.py:
  N samples on one window, per-step mean±std position error vs ground truth.
- `position_accuracy`     <- eval_acurracy_diffusion_positions.py:
  sweep all windows, 1 sample each, mean per-step position error.
- `precision`             <- eval_precision.py: repeatability across runs +
  zero-order-hold action replay in the env.
- `action_consistency`    <- eval_consistency_diffusion_actions.py:
  N rollouts executing predicted actions with linear interpolation.
- `robustness`            <- eval_robustness.py: uniform obs-noise sweep
  (alpha = run * 0.01), MSE of predictions vs noise level.
- `compare_position_actions` <- eval_compare_position_actions.py: pointwise
  distance between the position head and the executed-action trajectory.
- `smoke`                 <- evaluate_init.py: one sample + replay overlay.

All samplers run vmapped/jitted; env replays are `lax.scan` rollouts.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.dataset import WindowDataset
from ..data import normalize as N
from ..diffusion import DiffusionPolicy
from ..track import build as build_track, make_track
from . import rollout


@dataclasses.dataclass
class EvalContext:
    """Everything the eval functions need."""

    policy: DiffusionPolicy
    params: Dict
    dataset: WindowDataset          # inference-mode (stats supplied)
    track_seed: int = 42            # env seed for closed-loop replays
    sampler: str = "ddim"
    num_inference_steps: int = 50

    def __post_init__(self):
        self._geom = None

    @property
    def geom(self):
        if self._geom is None:
            self._geom = build_track(make_track(self.track_seed))
        return self._geom

    def window(self, idx: int):
        sample, translation, start, end = self.dataset.get_window(idx)
        batch = {k: jnp.asarray(v)[None] for k, v in sample.items()}
        return batch, translation, start, end

    def sample_n(self, batch, n_runs: int, seed: int = 0) -> jax.Array:
        """(n_runs, horizon, 5) predictions for one window batch."""
        rngs = jax.random.split(jax.random.key(seed), n_runs)
        tiled = {k: jnp.repeat(v, n_runs, axis=0) for k, v in batch.items()}
        out = self.policy.sample(
            self.params, tiled, rngs[0], sampler=self.sampler,
            num_inference_steps=self.num_inference_steps)
        return out

    def unnormalize_positions(self, pred, translation) -> np.ndarray:
        """(..., horizon, 2) world positions from normalized predictions."""
        return N.unnormalize_position(
            np.asarray(pred[..., :2]), translation,
            self.dataset.stats["position"])

    def unnormalize_actions(self, pred) -> np.ndarray:
        return N.unnormalize_data(np.asarray(pred[..., 2:]),
                                  self.dataset.stats["action"])


def _gt_positions(ctx: EvalContext, idx: int) -> np.ndarray:
    sample, translation, _, _ = ctx.dataset.get_window(idx)
    gt = N.unnormalize_position(sample["position"], translation,
                                ctx.dataset.stats["position"])
    return gt[ctx.policy.config.obs_horizon - ctx.policy.config.inpaint_horizon:]


def position_consistency(ctx: EvalContext, window_idx: int = 70,
                         n_runs: int = 10, seed: int = 0) -> Dict:
    batch, translation, _, _ = ctx.window(window_idx)
    preds = ctx.sample_n(batch, n_runs, seed)          # (n, horizon, 5)
    pos = ctx.unnormalize_positions(preds, translation)
    gt = _gt_positions(ctx, window_idx)
    err = np.linalg.norm(pos - gt[None], axis=-1)      # (n, horizon)
    return {"mean_error": err.mean(0), "std_error": err.std(0),
            "positions": pos, "ground_truth": gt}


def position_accuracy(ctx: EvalContext, max_windows: Optional[int] = None,
                      seed: int = 0) -> Dict:
    n = len(ctx.dataset) if max_windows is None else min(
        max_windows, len(ctx.dataset))
    errors = []
    for i in range(n):
        batch, translation, _, _ = ctx.window(i)
        pred = ctx.sample_n(batch, 1, seed + i)
        pos = ctx.unnormalize_positions(pred, translation)[0]
        gt = _gt_positions(ctx, i)
        errors.append(np.linalg.norm(pos - gt, axis=-1))
    errors = np.stack(errors)                          # (n_windows, horizon)
    return {"per_step_error": errors.mean(0), "per_window_error": errors.mean(1),
            "overall": float(errors.mean())}


def precision(ctx: EvalContext, window_idx: int = 70, n_runs: int = 5,
              seed: int = 0) -> Dict:
    """Repeatability + ZOH closed-loop replay (eval_precision.py)."""
    cfg = ctx.policy.config
    batch, translation, start, _ = ctx.window(window_idx)
    preds = ctx.sample_n(batch, n_runs, seed)
    pos = ctx.unnormalize_positions(preds, translation)
    spread = pos.std(0).mean()

    actions = ctx.unnormalize_actions(preds)           # (n, horizon, 3)
    data_actions = np.asarray(
        N.unnormalize_data(ctx.dataset.train_data["action"],
                           ctx.dataset.stats["action"]))
    state0 = rollout.state_at_window_start(ctx.geom, data_actions, start)
    frames = jax.vmap(lambda a: rollout.hold_actions(a, cfg.step_size))(
        jnp.asarray(actions[:, cfg.inpaint_horizon:]))
    n_steps = int(frames.shape[1])
    _, traj, _ = rollout.replay_batch(ctx.geom, state0, frames, n_steps)
    return {"sample_spread": float(spread), "positions": pos,
            "rollout_positions": np.asarray(traj)}


def action_consistency(ctx: EvalContext, window_idx: int = 70,
                       n_runs: int = 5, seed: int = 0) -> Dict:
    """Execute predicted actions with linear interpolation
    (eval_consistency_diffusion_actions.py)."""
    cfg = ctx.policy.config
    batch, translation, start, _ = ctx.window(window_idx)
    preds = ctx.sample_n(batch, n_runs, seed)
    actions = ctx.unnormalize_actions(preds)[:, cfg.inpaint_horizon:]
    data_actions = np.asarray(
        N.unnormalize_data(ctx.dataset.train_data["action"],
                           ctx.dataset.stats["action"]))
    state0 = rollout.state_at_window_start(ctx.geom, data_actions, start)
    frames = jax.vmap(lambda a: rollout.interpolate_actions(a, cfg.step_size)
                      )(jnp.asarray(actions))
    n_steps = int(frames.shape[1])
    _, traj, _ = rollout.replay_batch(ctx.geom, state0, frames, n_steps)
    traj = np.asarray(traj)                            # (n, steps, 2)
    gt = _gt_positions(ctx, window_idx)[1:]
    gt_at_frames = gt[np.minimum(
        np.arange(n_steps) // cfg.step_size, len(gt) - 1)]
    err = np.linalg.norm(traj - gt_at_frames[None], axis=-1)
    return {"mean_error": err.mean(0), "std_error": err.std(0),
            "trajectories": traj}


def robustness(ctx: EvalContext, window_idx: int = 70, n_levels: int = 5,
               seed: int = 0) -> Dict:
    """Uniform obs-noise sweep, alpha = level * 0.01 (eval_robustness.py:
    179-191)."""
    batch, translation, _, _ = ctx.window(window_idx)
    gt = _gt_positions(ctx, window_idx)
    rng = np.random.default_rng(seed)
    rows = []
    for level in range(n_levels):
        alpha = level * 0.01
        noisy = {k: v + alpha * jnp.asarray(
            rng.uniform(-1, 1, v.shape).astype(np.float32))
            for k, v in batch.items()}
        pred = ctx.sample_n(noisy, 1, seed + level)
        pos = ctx.unnormalize_positions(pred, translation)[0]
        act = ctx.unnormalize_actions(pred)[0]
        rows.append({
            "alpha": alpha,
            "position_mse": float(((pos - gt) ** 2).mean()),
        })
    return {"levels": rows}


def compare_position_actions(ctx: EvalContext, window_idx: int = 70,
                             seed: int = 0) -> Dict:
    """Position head vs executed-action trajectory
    (eval_compare_position_actions.py:198-270)."""
    cfg = ctx.policy.config
    batch, translation, start, _ = ctx.window(window_idx)
    pred = ctx.sample_n(batch, 1, seed)
    pos_head = ctx.unnormalize_positions(pred, translation)[0][cfg.inpaint_horizon:]
    actions = ctx.unnormalize_actions(pred)[0, cfg.inpaint_horizon:]
    data_actions = np.asarray(
        N.unnormalize_data(ctx.dataset.train_data["action"],
                           ctx.dataset.stats["action"]))
    state0 = rollout.state_at_window_start(ctx.geom, data_actions, start)
    frames = rollout.interpolate_actions(jnp.asarray(actions), cfg.step_size)
    _, traj, _ = rollout.replay(ctx.geom, state0, frames, int(frames.shape[0]))
    exec_pos = np.asarray(traj)[::cfg.step_size][: len(pos_head) - 1]
    k = len(exec_pos)
    dists = np.linalg.norm(pos_head[1 : k + 1] - exec_pos, axis=-1)
    return {"pointwise_distance": dists, "position_head": pos_head,
            "executed": exec_pos}


def smoke(ctx: EvalContext, window_idx: int = 0, seed: int = 0) -> Dict:
    """evaluate_init.py: one sample end to end; finite outputs, right shapes."""
    batch, translation, _, _ = ctx.window(window_idx)
    pred = ctx.sample_n(batch, 1, seed)
    pos = ctx.unnormalize_positions(pred, translation)
    act = ctx.unnormalize_actions(pred)
    assert np.isfinite(pos).all() and np.isfinite(act).all()
    return {"positions": pos[0], "actions": act[0]}

"""Closed-loop policy machinery shared by the demo CLIs, the headline
bench and the multi-chip rollout.

The reference's closed loop (`/root/reference/run_predictions.py:97-167`)
steps ONE env eagerly and re-denoises from a host-side ring buffer.  Here
the same semantics — a rolling raw-frame observation ring, subsampled
every `step_size` frames (newest-aligned) at denoise time, an action queue
refreshed every `step_size` frames, row 0 executed in between — are built
as a pure per-step function suitable for `lax.scan` and for sharding over
a device mesh (envs/vector.rollout_policy_sharded).

Shard-invariance: the reverse-diffusion x_T draw is keyed per GLOBAL env
id (folded with the frame counter), not per local batch — the same env
produces the same actions whether the batch lives on one chip or is
sharded over eight.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .policy import DiffusionPolicy


def make_obs_normalizers(stats):
    """(norm_batch, unnorm_actions) closures for a closed-loop rollout.

    norm_batch applies the training-time normalization of
    data/dataset.py:get_window to a rolling obs window dict of RAW values
    {image_features?, position, velocity, action} (each (B, T_obs, ...)):
    min-max velocity/action to [-1,1], position min-max then centered on the
    window's first frame and halved.  unnorm_actions maps the sampler's
    normalized action output back to env units.  stats=None -> identity
    (random-init throughput runs)."""
    if stats is None:
        return (lambda hist: hist), (lambda a: a)
    pmin = float(np.min(stats["position"]["min"]))
    pmax = float(np.max(stats["position"]["max"]))
    prng = (pmax - pmin) or 1.0
    vlo = np.asarray(stats["velocity"]["min"], np.float32)
    vrng = np.asarray(stats["velocity"]["max"], np.float32) - vlo
    vrng = np.where(vrng == 0, 1.0, vrng)
    alo = np.asarray(stats["action"]["min"], np.float32)
    arng = np.asarray(stats["action"]["max"], np.float32) - alo
    arng = np.where(arng == 0, 1.0, arng)

    def norm_batch(hist):
        sn = (hist["position"] - pmin) / prng * 2.0 - 1.0
        out = {
            "position": (sn - sn[:, 0:1]) / 2.0,
            "velocity": (hist["velocity"] - vlo) / vrng * 2.0 - 1.0,
            "action": (hist["action"] - alo) / arng * 2.0 - 1.0,
        }
        if "image_features" in hist:
            out["image_features"] = hist["image_features"]
        return out

    def unnorm_actions(a):
        return (a + 1.0) / 2.0 * arng + alo

    return norm_batch, unnorm_actions


def init_ring_carry(policy: DiffusionPolicy, n_envs: int,
                    env_uids: Optional[jax.Array] = None):
    """Per-env carry pytree (all leaves lead with n_envs, so the carry
    shards over a mesh's `data` axis): raw-frame observation rings of
    length obs_horizon*step_size, the committed action queue, a per-env
    frame counter and the GLOBAL env ids used to key the x_T draws."""
    cfg = policy.config
    L = cfg.obs_horizon * cfg.step_size
    hist = {
        "position": jnp.zeros((n_envs, L, 2)),
        "velocity": jnp.zeros((n_envs, L, 2)),
        "action": jnp.zeros((n_envs, L, 3)),
    }
    if policy.encoder is not None:
        # feature width = what the encoder actually emits (512 for
        # resnet18, vision_latent for the conv-AE)
        hist["image_features"] = jnp.zeros(
            (n_envs, L, cfg.observation_dim - cfg.state_cond_dim))
    return {
        "hist": hist,
        "queue": jnp.zeros((n_envs, cfg.pred_horizon, 3)),
        "k": jnp.zeros((n_envs,), jnp.int32),
        "uid": (jnp.arange(n_envs, dtype=jnp.int32)
                if env_uids is None else env_uids),
    }


def make_ring_policy(policy: DiffusionPolicy, stats=None,
                     sampler: str = "ddim", num_inference_steps: int = 10,
                     ddim_spacing: str = "leading", amp: bool = False,
                     key: Optional[jax.Array] = None) -> Callable:
    """policy_fn(params, carry, states, prev_res) -> ((B, 3) actions, carry).

    The 4-arg signature matches envs.vector.rollout_policy_sharded (which
    threads params explicitly so they can be replicated over the mesh).
    rollout_policy expects a 3-arg policy(carry, states, prev_res): bind
    params first — `functools.partial(policy_fn, params)`.

    Shard invariance (8-device actions == 1-device actions) holds for
    DETERMINISTIC samplers (ddim, dpmpp): x_T is keyed per global env id
    (`uid`), so it is independent of the mesh layout. Stochastic samplers
    (ddpm) additionally draw batch-shaped per-step noise inside
    policy.sample from fold_in(base_key, k0) — that draw depends on the
    local batch size, so actions would differ between mesh sizes; use
    ddim/dpmpp when shard-exact reproducibility matters.

    Denoises every cfg.step_size frames from the step_size-subsampled
    (newest-aligned) ring — the observation window spans the same 1 s the
    training windows did — and executes queue row 0 in between (the action
    predicted for the 0.1 s right after the window; see bench.py for the
    measured single-chip formulation this mirrors)."""
    cfg = policy.config
    L = cfg.obs_horizon * cfg.step_size
    norm_batch, unnorm_actions = make_obs_normalizers(stats)
    base_key = jax.random.key(0) if key is None else key
    sub_idx = np.arange(cfg.step_size - 1, L, cfg.step_size)

    def _init_noise_per_env(uid, k0):
        """x_T drawn per global env id + frame index: shard-invariant."""
        shape = (cfg.horizon, cfg.prediction_dim)

        def one(u):
            r = jax.random.fold_in(jax.random.fold_in(base_key, u), k0)
            if cfg.uniform_init:
                return jax.random.uniform(r, shape)
            return jax.random.normal(r, shape)

        return jax.vmap(one)(uid)

    def policy_fn(params, carry, states, prev_res):
        del states
        hist, queue = carry["hist"], carry["queue"]
        k, uid = carry["k"], carry["uid"]
        k0 = k[0]

        def roll(h, new):
            return jnp.concatenate([h[:, 1:], new[:, None]], axis=1)

        # fold the incoming observation into the rings
        hist = dict(hist)
        hist["position"] = roll(hist["position"], prev_res.info.car_position)
        hist["velocity"] = roll(hist["velocity"], prev_res.info.car_velocity)
        if "image_features" in hist:
            frame = (prev_res.obs.astype(jnp.float32) / 255.0)[:, None]
            enc_params = params
            if amp:
                enc_params = jax.tree.map(
                    lambda v: v.astype(jnp.bfloat16)
                    if v.dtype == jnp.float32 else v, params)
                frame = frame.astype(jnp.bfloat16)
            feats = policy.encode_images(enc_params, frame)
            hist["image_features"] = roll(hist["image_features"],
                                          feats[:, 0].astype(jnp.float32))

        def denoise(_):
            window = {k2: v[:, sub_idx] for k2, v in hist.items()}
            out = policy.sample(
                params, norm_batch(window),
                jax.random.fold_in(base_key, k0),
                sampler=sampler, num_inference_steps=num_inference_steps,
                amp=amp, ddim_spacing=ddim_spacing,
                init_noise=_init_noise_per_env(uid, k0))
            return unnorm_actions(out[:, cfg.inpaint_horizon:, 2:5])

        queue = jax.lax.cond(k0 % cfg.step_size == 0, denoise,
                             lambda _: queue, None)
        actions = queue[:, 0]
        hist["action"] = roll(hist["action"], actions)
        return actions, {"hist": hist, "queue": queue, "k": k + 1,
                         "uid": uid}

    return policy_fn

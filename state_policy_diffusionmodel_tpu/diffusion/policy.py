"""The conditioned diffusion policy: training loss + DDPM/DDIM samplers.

Functional re-design of `Diffusion_DDPM` / `Diffusion_DDIM`
(`/root/reference/models/diffusion_ddpm.py:22-348`,
`diffusion_ddim.py:19-74`): the Lightning module becomes a config + pure
functions over explicit params, and the 1000-step reverse loops become one
`lax.scan` that XLA compiles into a single device program (the reference
pays a python->GPU round trip per denoise step).

Reproduced semantics (each a reference behavior, quirks included by default):
- conditioning vector = concat(position, action, velocity, vision(image))
  over the observation horizon (diffusion_ddpm.py:317-330),
- prediction vector  = concat(position, action) with the last
  `inpaint_horizon` observation steps prepended (:332-348, :164),
- the inpaint region is overwritten after noising and after every reverse
  step (`add_constraints`, :216-219),
- the loss is MSE(noise, noise_est) over the FULL vector including the
  inpaint rows (:170-172),
- samplers initialize from UNIFORM [0,1) noise, not Gaussian (:205,252) —
  set `gaussian_init=True` for the textbook variant,
- the DDIM path of `generate.py:28-35` rebuilds a 100-step schedule and
  feeds t in [0,100) to a model trained on 1000 steps; that behavior is
  available as `ddim_compat_100=True`, while the default DDIM samples the
  trained schedule at `num_inference_steps` spaced timesteps.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..models import Encoder, ResNet18GN, build_model
from . import schedules as S


@dataclasses.dataclass(frozen=True)
class PolicyConfig:
    """Hyperparameters (defaults = reference train.py:16-35)."""

    noise_steps: int = 1000
    obs_horizon: int = 10
    pred_horizon: int = 30
    inpaint_horizon: int = 1
    prediction_dim: int = 5          # 2 pos + 3 action
    model: str = "UNet_Film"
    noise_scheduler_type: str = "linear"
    step_size: int = 5
    time_dim: int = 256
    vision_encoder: str = "autoencoder"   # autoencoder | resnet18 | none
    vision_latent: int = 128
    uniform_init: bool = True        # reference torch.rand sampler init
    train_encoder: bool = False      # reference freezes the AE encoder
    model_width: Optional[int] = None  # U-Net base channels (None = ref plan)

    @property
    def state_cond_dim(self) -> int:
        return 2 + 3 + 2             # position + action + velocity

    @property
    def observation_dim(self) -> int:
        latent = 0
        if self.vision_encoder == "autoencoder":
            latent = self.vision_latent
        elif self.vision_encoder == "resnet18":
            latent = 512
        return self.state_cond_dim + latent

    @property
    def horizon(self) -> int:
        return self.pred_horizon + self.inpaint_horizon


class DiffusionPolicy:
    def __init__(self, config: PolicyConfig):
        self.config = config
        self.unet = build_model(config.model, out_channels=1,
                                time_dim=config.time_dim,
                                width=config.model_width)
        if config.vision_encoder == "autoencoder":
            self.encoder = Encoder(config.vision_latent)
        elif config.vision_encoder == "resnet18":
            self.encoder = ResNet18GN()
        else:
            self.encoder = None
        self.schedule = S.make_schedule(
            config.noise_steps, config.noise_scheduler_type)

    # -- params -------------------------------------------------------------
    def init_params(self, rng: jax.Array,
                    encoder_params: Optional[Any] = None) -> Dict[str, Any]:
        cfg = self.config
        r1, r2 = jax.random.split(rng)
        x = jnp.zeros((1, cfg.horizon, cfg.prediction_dim, 1))
        cond = jnp.zeros((1, cfg.obs_horizon * cfg.observation_dim))
        # jit the initializers: eager flax init dispatches every layer op
        # separately (a U-Net init measured 311 s eager vs 14 s jitted on a
        # small CPU host)
        params = {"unet": jax.jit(self.unet.init)(
            r1, x, jnp.zeros(1), cond)["params"]}
        if self.encoder is not None:
            if encoder_params is None:
                encoder_params = jax.jit(self.encoder.init)(
                    r2, jnp.zeros((1, 96, 96, 3)))["params"]
            params["encoder"] = encoder_params
        return params

    # -- conditioning -------------------------------------------------------
    def encode_images(self, params, images: jax.Array) -> jax.Array:
        """(B, T, 96, 96, 3) -> (B, T, latent)."""
        B, T = images.shape[:2]
        feats = self.encoder.apply(
            {"params": params["encoder"]}, images.reshape(B * T, *images.shape[2:]))
        return feats.reshape(B, T, -1)

    def obs_cond(self, params, batch: Dict[str, jax.Array]) -> jax.Array:
        """Concatenated conditioning over the obs horizon -> (B, T_obs*obs_dim).

        diffusion_ddpm.py:317-330.  Closed-loop callers may pass precomputed
        `image_features` (B, T, latent) instead of `image` — encoding each
        incoming frame once instead of re-encoding the whole window every
        denoise pass."""
        T = self.config.obs_horizon
        parts = [batch["position"][:, :T], batch["action"][:, :T],
                 batch["velocity"][:, :T]]
        if self.encoder is not None:
            if "image_features" in batch:
                feats = batch["image_features"][:, :T]
            else:
                feats = self.encode_images(params, batch["image"][:, :T])
            if not self.config.train_encoder:
                feats = jax.lax.stop_gradient(feats)
            parts.append(feats)
        cond = jnp.concatenate(parts, axis=-1)      # (B, T_obs, obs_dim)
        return cond.reshape(cond.shape[0], -1)

    # -- prediction / inpaint vectors --------------------------------------
    def prediction_vector(self, batch) -> jax.Array:
        """(B, pred_horizon, 5): positions+actions after the obs horizon."""
        T = self.config.obs_horizon
        return jnp.concatenate(
            [batch["position"][:, T:], batch["action"][:, T:]], axis=-1)

    def inpaint_vector(self, batch) -> jax.Array:
        """(B, inpaint_horizon, 5): last obs steps (diffusion_ddpm.py:340-348)."""
        T, I = self.config.obs_horizon, self.config.inpaint_horizon
        return jnp.concatenate(
            [batch["position"][:, T - I:T], batch["action"][:, T - I:T]],
            axis=-1)

    def _constrain(self, x: jax.Array, inpaint: jax.Array) -> jax.Array:
        """Overwrite the first inpaint_horizon rows (add_constraints)."""
        return jnp.concatenate(
            [inpaint, x[:, self.config.inpaint_horizon:]], axis=1)

    # -- training loss ------------------------------------------------------
    def loss(self, params, batch: Dict[str, jax.Array], rng: jax.Array):
        """process_single_batch (diffusion_ddpm.py:128-173)."""
        cfg = self.config
        cond = self.obs_cond(params, batch)
        x0 = self.prediction_vector(batch)
        inpaint = self.inpaint_vector(batch)
        vec = jnp.concatenate([inpaint, x0], axis=1)     # (B, horizon, 5)

        B = vec.shape[0]
        r_t, r_n = jax.random.split(rng)
        t = jax.random.randint(r_t, (B,), 0, cfg.noise_steps)
        noise = jax.random.normal(r_n, vec.shape, vec.dtype)
        x_noisy = S.add_noise(self.schedule, vec, noise, t)
        x_noisy = self._constrain(x_noisy, inpaint)

        eps = self.unet.apply({"params": params["unet"]},
                              x_noisy[..., None], t, cond)[..., 0]
        # reduce in fp32 even under bf16 amp: a bf16 mean over B*horizon*5
        # elements loses ~2 decimal digits, which is gradient noise the
        # fp32 master weights would then integrate
        return jnp.mean((noise.astype(jnp.float32)
                         - eps.astype(jnp.float32)) ** 2)

    # -- sampling -----------------------------------------------------------
    def _init_noise(self, rng, B):
        cfg = self.config
        shape = (B, cfg.horizon, cfg.prediction_dim)
        if cfg.uniform_init:
            return jax.random.uniform(rng, shape)
        return jax.random.normal(rng, shape)

    def sample(self, params, batch: Dict[str, jax.Array], rng: jax.Array,
               sampler: str = "ddpm",   # "ddpm" | "ddim" | "dpmpp"
               num_inference_steps: Optional[int] = None,
               history: bool = False, ddim_compat_100: bool = False,
               amp: bool = False, ddim_spacing: str = "leading",
               init_noise: Optional[jax.Array] = None):
        """Reverse diffusion conditioned on an observation-only batch.

        Returns (B, inpaint+pred, 5), or with history=True the full
        (T_steps+1, B, inpaint+pred, 5) denoising trajectory
        (option='sample_history', diffusion_ddpm.py:254-265).

        amp=True runs the U-Net/encoder forwards in bfloat16 (params cast
        once, scheduler math kept fp32) — ~2x MXU rate for closed-loop
        inference.

        init_noise: optional explicit (B, horizon, prediction_dim) x_T,
        overriding the rng draw — lets a caller split one batch into
        sequential microbatches that match the full-batch call (same x_T
        draw; deterministic DDIM consumes no other noise; residual
        difference is XLA's batch-shape tiling reassociation, ~1e-6)."""
        cfg = self.config
        inpaint = self.inpaint_vector(batch)   # stays fp32: written verbatim
        if amp:
            bf16 = lambda v: (v.astype(jnp.bfloat16)
                              if v.dtype == jnp.float32 else v)
            params = jax.tree.map(bf16, params)
            batch = {k: bf16(v) for k, v in batch.items()}
        cond = self.obs_cond(params, batch)
        B = cond.shape[0]

        r_init, r_steps = jax.random.split(rng)
        x_t = self._init_noise(r_init, B) if init_noise is None else init_noise
        x_t = self._constrain(x_t, inpaint)

        if sampler == "ddpm":
            sched = self.schedule
            timesteps = jnp.arange(cfg.noise_steps - 1, -1, -1)
            prev_ts = timesteps - 1
            use_ddim = False
        elif sampler == "dpmpp":
            # DPM-Solver++(2M): one model eval per step like DDIM, but
            # second-order multistep — lower discretization error at equal
            # step count (schedules.dpmpp_2m_step). Beyond the reference's
            # HF DDPM/DDIM pair.
            sched = self.schedule
            n = num_inference_steps or 100
            timesteps = jnp.asarray(
                S.ddim_timesteps(cfg.noise_steps, n, ddim_spacing))
            prev_ts = jnp.concatenate(
                [timesteps[1:], jnp.full((1,), -1, timesteps.dtype)])
            # first step has no history; final step drops to first order
            # (diffusers lower_order_final — exact in the sigma_prev=0 limit)
            second = jnp.arange(n) >= 1
            if n > 1:
                second = second.at[n - 1].set(False)

            def body_dpmpp(carry, inputs):
                x, m_prev, lam_prev = carry
                t, prev_t, so = inputs
                x_in = x.astype(jnp.bfloat16) if amp else x
                eps = self.unet.apply({"params": params["unet"]},
                                      x_in[..., None], jnp.full((B,), t),
                                      cond)[..., 0].astype(jnp.float32)
                # Per-step x_t overwrite, like DDIM/DDPM — deliberately.
                # Round 4 tested the "cleaner" alternative (constrain the
                # x0 prediction via dpmpp_2m_step's x0_fix and let x_t
                # evolve freely): accuracy COLLAPSED 12.4 -> 44.5 u at 5
                # steps.  Cause: training constrains x_noisy
                # (policy.loss above), so the network has only ever seen
                # inputs whose inpaint rows are CLEAN — solver-evolved
                # rows are off-distribution.  The reference's overwrite
                # is the training-consistent choice; dpmpp's few-step
                # deficit vs DDIM (RESULTS_r4.md) is a property of the
                # model/solver pairing, not of the constraint.
                x, m0, lam_s = S.dpmpp_2m_step(
                    sched, eps, t, prev_t, x, m_prev, lam_prev, so)
                x = self._constrain(x, inpaint)
                return (x, m0, lam_s), (x if history else None)

            carry0 = (x_t, jnp.zeros_like(x_t), jnp.float32(0.0))
            (x_final, _, _), hist = jax.lax.scan(
                body_dpmpp, carry0, (timesteps, prev_ts, second))
            if history:
                return jnp.concatenate([x_t[None], hist], axis=0)
            return x_final
        elif sampler == "ddim":
            if ddim_compat_100:
                n = num_inference_steps or 100
                sched = S.make_schedule(n, "linear")
                timesteps = jnp.arange(n - 1, -1, -1)
                prev_ts = timesteps - 1
            else:
                sched = self.schedule
                n = num_inference_steps or 100
                timesteps = jnp.asarray(
                    S.ddim_timesteps(cfg.noise_steps, n, ddim_spacing))
                # each step's target is the next grid point (last -> -1);
                # for 'leading' this equals the diffusers t - ratio (both
                # land below 0 at the end, where alpha_bar_prev = 1)
                prev_ts = jnp.concatenate(
                    [timesteps[1:], jnp.full((1,), -1, timesteps.dtype)])
            use_ddim = True
        else:
            raise ValueError(sampler)

        def body(x, inputs):
            t, prev_t, step_rng = inputs
            x_in = x.astype(jnp.bfloat16) if amp else x
            eps = self.unet.apply({"params": params["unet"]},
                                  x_in[..., None], jnp.full((B,), t),
                                  cond)[..., 0].astype(jnp.float32)
            if use_ddim:
                x = S.ddim_step(sched, eps, t, prev_t, x)
            else:
                z = jax.random.normal(step_rng, x.shape)
                x = S.ddpm_step(sched, eps, t, x, z)
            x = self._constrain(x, inpaint)
            return x, (x if history else None)

        step_rngs = jax.random.split(r_steps, len(timesteps))
        x_final, hist = jax.lax.scan(body, x_t, (timesteps, prev_ts, step_rngs))
        if history:
            return jnp.concatenate([x_t[None], hist], axis=0)
        return x_final

    # convenience jitted entry points
    @partial(jax.jit, static_argnums=0)
    def loss_jit(self, params, batch, rng):
        return self.loss(params, batch, rng)

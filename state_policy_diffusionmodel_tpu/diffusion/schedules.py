"""Beta schedules and closed-form diffusion math.

Replaces HF `diffusers` DDPMScheduler/DDIMScheduler
(`/root/reference/models/diffusion_ddpm.py:65-70`,
`diffusion_ddim.py:11`) and the standalone schedules in
`/root/reference/utils/schedulers.py` with explicit arrays, so the whole
sampler fuses into one `lax.scan`.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


def linear_betas(steps: int, beta_start: float = 1e-4,
                 beta_end: float = 0.02) -> np.ndarray:
    """diffusers 'linear' (DDPMScheduler defaults) == the reference's
    linear_beta_schedule at 1000 steps (utils/schedulers.py:6-14)."""
    return np.linspace(beta_start, beta_end, steps, dtype=np.float32)


def linear_betas_v2(steps: int) -> np.ndarray:
    """utils/schedulers.py:17-25 (scale 500/steps)."""
    scale = 500 / steps
    return np.linspace(scale * 1e-4, scale * 0.02, steps, dtype=np.float32)


def cosine_betas(steps: int, s: float = 0.008) -> np.ndarray:
    """squaredcos_cap_v2 (utils/schedulers.py:28-40)."""
    n = steps + 1
    x = np.linspace(0, n, n)
    ac = np.cos(((x / n) + s) / (1 + s) * np.pi * 0.5) ** 2
    ac = ac / ac[0]
    betas = 1 - (ac[1:] / ac[:-1])
    return np.clip(betas, 0, 0.999).astype(np.float32)


SCHEDULES = {
    "linear": linear_betas,
    "linear_v2": linear_betas_v2,
    "cosine": cosine_betas,
    "squaredcos_cap_v2": cosine_betas,
}


class DiffusionSchedule(NamedTuple):
    betas: jax.Array           # (T,)
    alphas: jax.Array          # (T,)
    alphas_cumprod: jax.Array  # (T,)

    @property
    def num_steps(self) -> int:
        return self.betas.shape[0]


def make_schedule(num_steps: int, kind: str = "linear") -> DiffusionSchedule:
    betas = jnp.asarray(SCHEDULES[kind](num_steps))
    alphas = 1.0 - betas
    return DiffusionSchedule(betas, alphas, jnp.cumprod(alphas))


def add_noise(sched: DiffusionSchedule, x0: jax.Array, noise: jax.Array,
              t: jax.Array) -> jax.Array:
    """Forward process q(x_t | x_0). t: (B,) int, broadcast over x0 dims."""
    acp = sched.alphas_cumprod[t]
    shape = (-1,) + (1,) * (x0.ndim - 1)
    return (jnp.sqrt(acp).reshape(shape) * x0
            + jnp.sqrt(1.0 - acp).reshape(shape) * noise)


def _acp_prev(sched: DiffusionSchedule, prev_t: jax.Array) -> jax.Array:
    """alpha_bar at prev_t, with final_alpha_cumprod = 1 for prev_t < 0."""
    return jnp.where(prev_t >= 0, sched.alphas_cumprod[jnp.maximum(prev_t, 0)], 1.0)


def ddpm_step(sched: DiffusionSchedule, eps: jax.Array, t: jax.Array,
              x_t: jax.Array, z: jax.Array,
              clip_sample: bool = False) -> jax.Array:
    """One reverse DDPM step (diffusers semantics: epsilon prediction,
    variance_type='fixed_small'). z: standard normal, ignored at t == 0."""
    beta_t = sched.betas[t]
    alpha_t = sched.alphas[t]
    acp_t = sched.alphas_cumprod[t]
    acp_p = _acp_prev(sched, t - 1)

    x0 = (x_t - jnp.sqrt(1.0 - acp_t) * eps) / jnp.sqrt(acp_t)
    if clip_sample:
        x0 = jnp.clip(x0, -1.0, 1.0)
    coef0 = jnp.sqrt(acp_p) * beta_t / (1.0 - acp_t)
    coef_t = jnp.sqrt(alpha_t) * (1.0 - acp_p) / (1.0 - acp_t)
    mean = coef0 * x0 + coef_t * x_t

    var = jnp.clip(beta_t * (1.0 - acp_p) / (1.0 - acp_t), 1e-20)
    sigma = jnp.where(t > 0, jnp.sqrt(var), 0.0)
    return mean + sigma * z


def ddim_step(sched: DiffusionSchedule, eps: jax.Array, t: jax.Array,
              prev_t: jax.Array, x_t: jax.Array,
              clip_sample: bool = True) -> jax.Array:
    """One reverse DDIM step, eta = 0 (diffusers DDIMScheduler defaults —
    including clip_sample=True, which generate.py:28-35 relies on)."""
    acp_t = sched.alphas_cumprod[t]
    acp_p = _acp_prev(sched, prev_t)
    x0 = (x_t - jnp.sqrt(1.0 - acp_t) * eps) / jnp.sqrt(acp_t)
    if clip_sample:
        x0 = jnp.clip(x0, -1.0, 1.0)
    dir_xt = jnp.sqrt(1.0 - acp_p) * eps
    return jnp.sqrt(acp_p) * x0 + dir_xt


def dpmpp_2m_step(sched: DiffusionSchedule, eps: jax.Array, t: jax.Array,
                  prev_t: jax.Array, x_t: jax.Array, m_prev: jax.Array,
                  lam_prev: jax.Array, second_order: jax.Array,
                  clip_sample: bool = True, x0_fix=None):
    """One DPM-Solver++(2M) multistep update (data-prediction form).

    A second-order ODE solver for the probability-flow ODE (Lu et al. 2022,
    arXiv:2211.01095; the `dpmsolver++` / `solver_order=2` multistep
    algorithm of diffusers' DPMSolverMultistepScheduler). Matches DDIM's
    cost — exactly one model eval per step — but the finite-difference
    correction from the previous step's x0 prediction upgrades the local
    error from O(h^2) to O(h^3) (tests/test_diffusion_policy.py measures
    it against an exact ODE endpoint: 27% lower error at 64 steps, ~7x at
    1000; at very few steps the shared first-order opening step limits
    both). Beyond-parity capability: the reference only ships HF DDPM/DDIM.

    Args:
      eps: the model's noise prediction at (x_t, t).
      m_prev, lam_prev: the previous step's x0 prediction and log-SNR
        (carried through the sampler scan).
      second_order: bool array — False on the first step (no history yet)
        and on the final step (diffusers' `lower_order_final`, which
        stabilizes the h -> inf limit at sigma_prev = 0).

    Returns (x_next, m0, lam_s) for the next carry.
    """
    acp_s = sched.alphas_cumprod[t]
    acp_p = _acp_prev(sched, prev_t)
    alpha_s, sigma_s = jnp.sqrt(acp_s), jnp.sqrt(1.0 - acp_s)
    alpha_p = jnp.sqrt(acp_p)
    # at prev_t < 0, acp_p = 1 exactly -> sigma_p = 0; clamp so lambda stays
    # finite (lam ~ +34 in fp32): exp(-h) underflows to 0 and sigma_p/sigma_s
    # ~ 1e-15, reproducing the exact x -> x0 limit of the final step
    sigma_p = jnp.sqrt(jnp.maximum(1.0 - acp_p, 1e-30))

    m0 = (x_t - sigma_s * eps) / alpha_s
    if clip_sample:
        m0 = jnp.clip(m0, -1.0, 1.0)
    if x0_fix is not None:
        # Optional x0-space inpainting hook — MEASURED NEGATIVE for this
        # repo's policies, kept for models trained without the input
        # constraint: constraining m0 and letting x_t evolve freely
        # collapsed accuracy 12.4 -> 44.5 u at 5 steps (round 4), because
        # the denoiser is trained on x_noisy whose inpaint rows are
        # overwritten CLEAN (policy.loss) and solver-evolved rows are
        # off-distribution for it.  DiffusionPolicy.sample therefore uses
        # the reference's per-step x_t overwrite instead (RESULTS_r4.md).
        m0 = x0_fix(m0)

    lam_s = jnp.log(alpha_s / sigma_s)
    lam_p = jnp.log(alpha_p / sigma_p)
    h = lam_p - lam_s                       # current step size (log-SNR)
    h0 = lam_s - lam_prev                   # previous step size
    r0 = h0 / h
    d1 = (m0 - m_prev) / r0                 # finite-difference derivative
    # select, don't scale: on first-order steps the carry is uninitialized
    # and d1 may be inf/nan — 0 * nan would poison the update
    d1 = jnp.where(second_order, d1, 0.0)
    em1 = jnp.exp(-h) - 1.0
    x_next = (sigma_p / sigma_s) * x_t - alpha_p * em1 * (m0 + 0.5 * d1)
    return x_next, m0, lam_s


def ddim_timesteps(num_train: int, num_inference: int,
                   spacing: str = "leading") -> np.ndarray:
    """DDIM timestep grids.

    'leading' — diffusers DDIMScheduler default (what the reference's HF
    scheduler uses): (arange(n) * (train // n)).round()[::-1]; the chain
    starts at t = train - ratio, not train - 1.
    'trailing' — arange(train, 0, -train/n).round() - 1: the chain starts
    at the last trained timestep, which removes the known few-step DDIM
    bias (the sampler otherwise treats pure noise as if it were the
    slightly-less-noisy t = train - ratio marginal). Measurably better at
    n <= 50 on this repo's policies; opt-in to keep reference parity.
    """
    if spacing == "trailing":
        return (np.round(np.arange(num_train, 0, -num_train / num_inference))
                .astype(np.int64) - 1).copy()
    ratio = num_train // num_inference
    return (np.arange(num_inference) * ratio).round().astype(np.int64)[::-1].copy()

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from state_policy_diffusionmodel_tpu import models
from state_policy_diffusionmodel_tpu.diffusion import schedules as S
from state_policy_diffusionmodel_tpu.models import layers


def test_time_embedding_shape_and_range():
    emb = layers.sinusoidal_time_embedding(jnp.array([0.0, 500.0]), 256)
    assert emb.shape == (2, 256)
    assert float(jnp.abs(emb).max()) <= 1.0
    # t=0: sin part 0, cos part 1
    np.testing.assert_allclose(np.asarray(emb[0, :128]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(emb[0, 128:]), 1.0, atol=1e-6)


def test_pad_unpad_roundtrip():
    x = jnp.arange(1 * 31 * 5 * 1.0).reshape(1, 31, 5, 1)
    padded, pads = layers.pad_to(x, 8)
    assert padded.shape == (1, 32, 8, 1)
    assert pads == (1, 2, 0, 1)  # reference pad_to split: lw,uw,lh,uh
    back = layers.unpad(padded, pads)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_upsample_align_corners_matches_torch_semantics():
    # endpoints preserved, midpoints interpolated at i*(H-1)/(2H-1)
    x = jnp.array([[0.0], [3.0]]).reshape(1, 2, 1, 1)
    up = layers.upsample_align_corners(x, 2)
    np.testing.assert_allclose(
        np.asarray(up[0, :, 0, 0]), [0.0, 1.0, 2.0, 3.0], atol=1e-6)


@pytest.mark.parametrize("name", [
    "UNet_Film", "UNet_FilmnoAttention", "UNet"])
def test_unet_forward_shapes(name):
    # width=8: a 1/8-scale channel plan — same graph topology, same shape
    # handling, a fraction of the XLA compile time (the three full-width
    # programs dominated this file's wall time on 1-CPU hosts)
    net = models.build_model(name, width=8)
    x = jnp.zeros((2, 31, 5, 1))
    t = jnp.array([3.0, 7.0])
    cond = jnp.zeros((2, 10 * 135))
    # jit both: eager flax init/apply dispatch per-op (the full-size U-Net
    # init measured 311 s eager vs 14 s jitted on a small CPU host)
    params = jax.jit(net.init)(jax.random.key(0), x, t, cond)["params"]
    out = jax.jit(net.apply)({"params": params}, x, t, cond)
    assert out.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(out)))


def test_default_width_is_reference_channel_plan():
    """width=None must reproduce the reference channel plans exactly
    (diffusion_unet.py conv ladders). eval_shape: no compilation."""
    x = jax.ShapeDtypeStruct((1, 32, 8, 1), jnp.float32)
    t = jax.ShapeDtypeStruct((1,), jnp.float32)
    cond = jax.ShapeDtypeStruct((1, 1350), jnp.float32)

    def out_ch(tree, path):
        node = tree
        for k in path:
            node = node[k]
        return node["conv2_kernel"].shape[-1]

    film = jax.eval_shape(models.build_model("UNet_Film").init,
                          jax.random.key(0), x, t, cond)["params"]
    assert out_ch(film, ["DoubleConv_0"]) == 64          # inc
    assert out_ch(film, ["DownBlock_0", "DoubleConv_1"]) == 128
    assert out_ch(film, ["DownBlock_2", "DoubleConv_1"]) == 256
    assert out_ch(film, ["DoubleConv_1"]) == 512         # bottleneck

    simple = jax.eval_shape(models.build_model("UNet").init,
                            jax.random.key(0), x, t, cond)["params"]
    assert out_ch(simple, ["DoubleConv_0"]) == 16        # inc
    assert out_ch(simple, ["DoubleConv_6"]) == 256       # deepest down


def test_autoencoder_shapes():
    ae = models.Autoencoder()
    x = jnp.zeros((2, 96, 96, 3))
    params = jax.jit(ae.init)(jax.random.key(0), x)["params"]
    recon = jax.jit(ae.apply)({"params": params}, x)
    assert recon.shape == (2, 96, 96, 3)
    z = jax.jit(lambda p, x: ae.apply(p, x, method=ae.encode))(
        {"params": params}, x)
    assert z.shape == (2, 128)


def test_resnet18_output_dim():
    net = models.ResNet18GN()
    x = jnp.zeros((1, 96, 96, 3))
    params = jax.jit(net.init)(jax.random.key(0), x)["params"]
    out = jax.jit(net.apply)({"params": params}, x)
    assert out.shape == (1, 512)


# -- schedules ---------------------------------------------------------------

def test_linear_schedule_matches_diffusers_constants():
    sched = S.make_schedule(1000, "linear")
    np.testing.assert_allclose(float(sched.betas[0]), 1e-4, rtol=1e-6)
    np.testing.assert_allclose(float(sched.betas[-1]), 0.02, rtol=1e-6)
    assert float(sched.alphas_cumprod[-1]) < 5e-5  # fully noised at T


def test_add_noise_snr():
    sched = S.make_schedule(1000, "linear")
    x0 = jnp.ones((4, 8, 2))
    noise = jnp.zeros_like(x0)
    # zero noise: x_t = sqrt(acp_t) * x0
    t = jnp.array([0, 100, 500, 999])
    xt = S.add_noise(sched, x0, noise, t)
    expect = jnp.sqrt(sched.alphas_cumprod[t])
    np.testing.assert_allclose(np.asarray(xt[:, 0, 0]), np.asarray(expect),
                               rtol=1e-5)


def test_ddim_with_perfect_eps_recovers_x0():
    sched = S.make_schedule(1000, "linear")
    rng = jax.random.key(1)
    x0 = jax.random.normal(rng, (2, 6, 3)) * 0.5
    noise = jax.random.normal(jax.random.key(2), x0.shape)
    ts = S.ddim_timesteps(1000, 10)
    t = jnp.asarray(ts[0])
    xt = S.add_noise(sched, x0, noise, jnp.full((2,), t))
    # with the true eps, DDIM jumps to sqrt(acp_prev) x0 + sqrt(1-acp_prev) eps
    x_prev = S.ddim_step(sched, noise, t, jnp.asarray(ts[1]), xt,
                         clip_sample=False)
    acp_p = sched.alphas_cumprod[ts[1]]
    expect = jnp.sqrt(acp_p) * x0 + jnp.sqrt(1 - acp_p) * noise
    np.testing.assert_allclose(np.asarray(x_prev), np.asarray(expect), atol=1e-5)


def test_ddim_timestep_spacings():
    """'leading' must keep the diffusers/reference grid exactly; 'trailing'
    must start at the last trained timestep and end at t=0, removing the
    few-step start-of-chain bias (sampling begins where alpha_bar is
    smallest, matching the pure-noise init)."""
    lead = S.ddim_timesteps(1000, 10)
    np.testing.assert_array_equal(lead, np.arange(10)[::-1] * 100)
    trail = S.ddim_timesteps(1000, 10, "trailing")
    np.testing.assert_array_equal(trail, np.arange(999, 0, -100))
    assert trail[0] == 999  # chain starts at the LAST trained timestep
    # n that doesn't divide the train steps still yields n descending ts
    t2 = S.ddim_timesteps(1000, 7, "trailing")
    assert len(t2) == 7 and (np.diff(t2) < 0).all() and t2[0] == 999
    # the sampler's shifted prev grid equals diffusers' t - ratio rule for
    # 'leading' at every step that matters (both end below 0 -> acp_prev=1)
    sched = S.make_schedule(1000, "linear")
    prev_shift = np.concatenate([lead[1:], [-1]])
    prev_diffusers = lead - 100
    np.testing.assert_array_equal(
        np.asarray(S._acp_prev(sched, jnp.asarray(prev_shift))),
        np.asarray(S._acp_prev(sched, jnp.asarray(prev_diffusers))))


def test_ddpm_step_t0_is_deterministic_posterior_mean():
    sched = S.make_schedule(1000, "linear")
    x0 = jnp.full((1, 2, 2), 0.3)
    noise = jax.random.normal(jax.random.key(3), x0.shape)
    xt = S.add_noise(sched, x0, noise, jnp.zeros(1, jnp.int32))
    z = jax.random.normal(jax.random.key(4), x0.shape)
    out = S.ddpm_step(sched, noise, jnp.asarray(0), xt, z)
    # at t=0, acp_prev=1: output is exactly pred_x0 = x0 (fp32: the
    # (1-acp_0)=1e-4 division amplifies roundoff, hence the loose atol)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-3)


def test_ddim_timesteps_spacing():
    ts = S.ddim_timesteps(1000, 10)
    np.testing.assert_array_equal(ts, [900, 800, 700, 600, 500, 400, 300,
                                       200, 100, 0])

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from state_policy_diffusionmodel_tpu import diffusion, parallel, train
from state_policy_diffusionmodel_tpu.data.dataset import DataModule, WindowDataset
from state_policy_diffusionmodel_tpu.data.replay_buffer import ReplayBuffer


# One canonical tiny config shared by every test in this file (and matched
# by test_diffusion_policy.py): a single DiffusionPolicy instance + one
# init_params lets jax's in-process jit cache and the persistent compile
# cache dedupe the U-Net programs across tests — the compile-heavy tests
# here dominated serial suite wall time on 1-CPU hosts.
TINY_CFG = diffusion.PolicyConfig(
    noise_steps=20, obs_horizon=4, pred_horizon=8, inpaint_horizon=1,
    model="UNet", model_width=8, vision_encoder="none", step_size=2)


@pytest.fixture(scope="module")
def tiny_pol():
    return diffusion.DiffusionPolicy(TINY_CFG)


@pytest.fixture(scope="module")
def tiny_params(tiny_pol):
    return tiny_pol.init_params(jax.random.key(0))


def _synthetic_module(T_obs=4, T_pred=8, n_steps=400, batch_size=8):
    rng = np.random.default_rng(0)
    t = np.arange(n_steps, dtype=np.float32)
    pos = np.stack([np.cos(t * 0.01), np.sin(t * 0.01)], -1) * 50
    vel = np.gradient(pos, axis=0) * 50
    act = rng.normal(size=(n_steps, 3)).astype(np.float32) * 0.1
    buf = ReplayBuffer.create_empty_numpy()
    buf.add_episode({"img": np.zeros((n_steps, 8, 8, 3), np.float32),
                     "position": pos.astype(np.float32),
                     "velocity": vel.astype(np.float32),
                     "action": act})
    ds = WindowDataset(buf, T_obs, T_pred, step_size=2)
    dm = DataModule(batch_size=batch_size, T_obs=T_obs, T_pred=T_pred,
                    seed=0, step_size=2)
    dm.data_full = ds
    dm.stats = ds.stats
    n = len(ds)
    perm = np.random.default_rng(0).permutation(n)
    dm.train_idx = perm[: int(n * 0.8)]
    dm.val_idx = perm[int(n * 0.8):]
    return dm


def test_mesh_has_8_virtual_devices():
    mesh = parallel.make_mesh()
    assert mesh.devices.size == 8  # conftest forces 8 CPU devices
    batch = {"x": np.zeros((16, 3), np.float32)}
    sharded = parallel.shard_batch(batch, mesh)
    assert sharded["x"].sharding.spec == jax.sharding.PartitionSpec("data")


def test_pad_to_multiple():
    batch = {"x": np.arange(10, dtype=np.float32)[:, None]}
    padded, real = parallel.pad_to_multiple(batch, 8)
    assert real == 10 and padded["x"].shape[0] == 16
    np.testing.assert_allclose(padded["x"][10:], np.full((6, 1), 9.0))


def test_reduce_lr_on_plateau():
    sch = train.ReduceLROnPlateau(lr=1e-3, patience=2)
    assert sch.update(1.0) == 1e-3
    for _ in range(2):
        assert sch.update(1.0) == 1e-3  # within patience
    assert sch.update(1.0) == pytest.approx(1e-4)  # decayed
    assert sch.update(0.5) == pytest.approx(1e-4)  # new best resets
    # min_lr floors the decay (torch min_lr; the r3 --no_early_stop run
    # decayed to 1e-20 without it — nothing halts decay once the early
    # stop is off)
    floored = train.ReduceLROnPlateau(lr=1e-3, patience=0, min_lr=1e-5)
    for _ in range(10):
        lr = floored.update(1.0)
    assert lr == pytest.approx(1e-5)
    assert not train.should_early_stop(1e-3)
    assert not train.should_early_stop(1e-4)  # strict: initial lr never stops
    assert train.should_early_stop(9.9e-5)


def test_plateau_steps_once_per_epoch(tmp_path, tiny_pol, tiny_params):
    """Lightning cadence: validation runs 4×/epoch (val_check_interval=0.25)
    but ReduceLROnPlateau steps once per EPOCH on the epoch's last val_loss
    (reference diffusion_ddpm.py:115-125, default interval="epoch") — so
    under a constant-plateau val_loss the lr must survive >= patience
    EPOCHS, not patience val checks. Round 2 stepped the plateau on every
    val check (effective patience 1.25 epochs; lr collapsed to 1e-10
    mid-run) — this pins the fix."""
    import json

    lr0 = 3e-4
    tcfg = train.TrainConfig(epochs=8, batch_size=8, lr=lr0, seed=0,
                             early_stop=False)
    trainer = train.Trainer(tiny_pol, tcfg, str(tmp_path / "run"))
    # stub out the compute: this test is about host-side scheduler cadence
    trainer.train_step = lambda p, o, b, r, lr: (p, o, jnp.float32(1.0))
    trainer._validate = lambda params, dm_, rng: 1.0   # perfect plateau
    trainer._save_epoch = lambda *a, **k: None
    dm = _synthetic_module(n_steps=120)
    trainer.fit(dm, params=tiny_params)

    events = [json.loads(l) for l in open(tmp_path / "run" / "metrics.jsonl")]
    vals = [e for e in events if e["event"] == "val"]
    lr_epochs = [e for e in events if e["event"] == "lr_epoch"]
    # quarter-epoch validation still ran 4x per epoch...
    assert len(vals) == 8 * 4
    # ...but the plateau stepped once per epoch: torch semantics decay on
    # num_bad > patience, i.e. after 1 best-setting epoch + 6 bad epochs
    assert len(lr_epochs) == 8
    lrs = [e["lr"] for e in lr_epochs]
    assert lrs[:6] == [lr0] * 6          # lr survives patience=5 epochs
    assert lrs[6] == pytest.approx(lr0 * 0.1)   # exactly one decay
    assert lrs[7] == pytest.approx(lr0 * 0.1)   # num_bad reset after decay


def test_cosine_lr_schedule(tmp_path, tiny_pol, tiny_params):
    """lr_schedule='cosine': deterministic half-cosine lr -> min_lr over the
    epoch budget, independent of val_loss, never early-stopped (the
    large-batch recipe — run_r3g.sh showed the epoch-patience plateau
    floors the lr by epoch ~54 at B=256). Resume must recompute the lr
    from the epoch index, not restore the stale checkpointed value."""
    import json

    lr0, lrmin, E = 4e-4, 1e-6, 8
    # log_every=1: the default 50 outruns this tiny run's ~15 steps/epoch,
    # leaving no "train" event in the final epoch for the assertion below
    tcfg = train.TrainConfig(epochs=E, batch_size=8, lr=lr0, min_lr=lrmin,
                             lr_schedule="cosine", seed=0, early_stop=True,
                             log_every=1)
    trainer = train.Trainer(tiny_pol, tcfg, str(tmp_path / "run"))
    trainer.train_step = lambda p, o, b, r, lr: (p, o, jnp.float32(1.0))
    trainer._validate = lambda params, dm_, rng: 1.0   # plateau: irrelevant
    trainer._save_epoch = lambda *a, **k: None
    dm = _synthetic_module(n_steps=120)
    trainer.fit(dm, params=tiny_params)

    events = [json.loads(l) for l in open(tmp_path / "run" / "metrics.jsonl")]
    lrs = [e["lr"] for e in events if e["event"] == "lr_epoch"]
    assert len(lrs) == E                 # early_stop never fires on cosine
    expect = [lrmin + 0.5 * (lr0 - lrmin) * (1 + np.cos(np.pi * (k + 1) / E))
              for k in range(E)]
    np.testing.assert_allclose(lrs, expect, rtol=1e-6)
    assert lrs[-1] == pytest.approx(lrmin)
    # the cosine lr is what reaches the train step: epoch E-1 trained at
    # the epoch E-2 boundary value
    trains = [e for e in events if e["event"] == "train"]
    last_epoch_lr = [e["lr"] for e in trains if e["epoch"] == E - 1]
    assert last_epoch_lr and all(
        lr == pytest.approx(expect[E - 2]) for lr in last_epoch_lr)


def test_train_step_descends_loss(tiny_pol, tiny_params):
    params = tiny_params
    tcfg = train.TrainConfig(batch_size=8, lr=3e-4)
    opt = train.make_optimizer(tcfg)
    opt_state = opt.init(params)
    step = train.make_train_step(tiny_pol, opt)

    dm = _synthetic_module()
    batch = next(iter(dm.train_batches(np.random.default_rng(0))))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    rng = jax.random.key(1)
    losses = []
    for i in range(20):
        rng, sub = jax.random.split(rng)
        params, opt_state, loss = step(params, opt_state, batch, sub,
                                       jnp.asarray(3e-4))
        losses.append(float(loss))
    # overfitting one batch must reduce the loss substantially
    assert np.mean(losses[-5:]) < 0.7 * np.mean(losses[:5])


def test_model_width_hparams_round_trip(tmp_path, tiny_pol):
    """model_width survives hparams.yaml and the CLI-side PolicyConfig
    rebuild (cli/{sample,evaluate,run_predictions}.py key filter), so a
    non-default-width run reloads as the same architecture."""
    train.checkpoints.save_hparams(str(tmp_path), tiny_pol.config)
    hp = train.checkpoints.load_hparams(
        os.path.join(str(tmp_path), "hparams.yaml"))
    assert hp["model_width"] == 8
    cfg = diffusion.PolicyConfig(**{
        k: hp[k] for k in (
            "noise_steps", "obs_horizon", "pred_horizon", "inpaint_horizon",
            "prediction_dim", "model", "noise_scheduler_type", "step_size",
            "time_dim", "vision_encoder", "vision_latent", "uniform_init",
            "train_encoder", "model_width") if k in hp})
    assert cfg == tiny_pol.config
    assert diffusion.DiffusionPolicy(cfg).unet.width == 8
    # width=None falls back to each net's reference channel plan
    from state_policy_diffusionmodel_tpu.models import build_model
    assert build_model("UNet_Film", width=None).width == 64
    assert build_model("UNet", width=None).width == 16


@pytest.mark.slow
def test_trainer_end_to_end(tmp_path, tiny_pol):
    tcfg = train.TrainConfig(epochs=2, batch_size=8, lr=3e-4, seed=0,
                             early_stop=False)
    # 1-device mesh: this test covers the host loop + checkpoint plumbing;
    # multi-device SPMD programs compile ~5x slower cold and have their own
    # dedicated tests (fused multichip, sharded rollout, mesh)
    trainer = train.Trainer(tiny_pol, tcfg, str(tmp_path / "run"),
                            mesh=_one_device_mesh())
    dm = _synthetic_module(n_steps=120)  # small: the loop, not the loss
    out = trainer.fit(dm)
    assert len(out["history"]["train_loss"]) == 2
    # checkpoints + sidecars exist
    assert os.path.exists(tmp_path / "run" / "STATS.pkl")
    assert os.path.exists(tmp_path / "run" / "hparams.yaml")
    ck = train.checkpoints.latest_checkpoint(str(tmp_path / "run"))
    assert ck is not None
    restored = train.checkpoints.load_checkpoint(
        ck, jax.device_get(out["params"]))
    a = jax.tree.leaves(restored)[0]
    b = jax.tree.leaves(jax.device_get(out["params"]))[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # hparams round trip
    hp = train.checkpoints.load_hparams(str(tmp_path / "run" / "hparams.yaml"))
    assert hp["obs_horizon"] == 4 and hp["observation_dim"] == 7


@pytest.mark.slow
def test_trainer_resume(tmp_path, tiny_pol):
    pol = tiny_pol
    dm = _synthetic_module(n_steps=120)

    tcfg1 = train.TrainConfig(epochs=1, batch_size=8, lr=3e-4, seed=0,
                              early_stop=False)
    t1 = train.Trainer(pol, tcfg1, str(tmp_path / "run"),
                       mesh=_one_device_mesh())
    t1.fit(dm)

    tcfg2 = train.TrainConfig(epochs=2, batch_size=8, lr=3e-4, seed=0,
                              early_stop=False)
    t2 = train.Trainer(pol, tcfg2, str(tmp_path / "run"),
                       mesh=_one_device_mesh())
    out = t2.fit(dm, resume=True)
    # epoch 0 already done: resumed run trains exactly one more epoch
    assert len(out["history"]["train_loss"]) == 1
    assert train.checkpoints.latest_checkpoint(
        str(tmp_path / "run")).endswith("epoch=1")
    # resume event logged, and the global step count continues (metrics
    # stay monotonic across resumes instead of restarting at 0)
    import json
    events = [json.loads(l)
              for l in open(tmp_path / "run" / "metrics.jsonl")]
    kinds = [e["event"] for e in events]
    assert "resume" in kinds
    resumed_vals = [e["step"] for e in events[kinds.index("resume"):]
                    if e["event"] == "val"]
    steps_per_epoch = len(dm.train_idx) // 8
    assert resumed_vals
    # every resumed val step continues past epoch 0's count and stays
    # within epoch 1's range (no restart at 0, no double counting)
    assert all(steps_per_epoch < s <= 2 * steps_per_epoch
               for s in resumed_vals)


def _one_device_mesh():
    from jax.sharding import Mesh
    return Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1),
                ("data", "model"))


def test_fused_chunk_matches_per_step_losses(tmp_path, tiny_pol, tiny_params):
    """run_train_chunk (lax.scan over steps) must reproduce the per-step
    device-data loop bit-for-bit: same RNG splits, same gathers."""
    tcfg = train.TrainConfig(batch_size=8, lr=3e-4, seed=0,
                             device_data=True, early_stop=False)
    tr = train.Trainer(tiny_pol, tcfg, str(tmp_path / "run"),
                       mesh=_one_device_mesh())
    assert tr._use_device_data()
    dm = _synthetic_module(n_steps=160)
    dev = tr._device_ds(dm)
    run_chunk, run_val = tr._chunk_fns(dm)

    params = tiny_params
    opt_state = tr.optimizer.init(params)
    rng = jax.random.key(7)
    idxs = tr._index_chunks(np.arange(24), 8, True)          # (3, 8)
    lr = jnp.asarray(3e-4)
    # run_chunk DONATES its state args: pass device copies so the shared
    # module-scope fixture (and this test's replay below) stay alive
    copy = lambda t: jax.tree.map(jnp.copy, t)
    p1, _, o1, rng1, losses = run_chunk(copy(params), None, copy(opt_state),
                                        jnp.asarray(idxs), rng, lr, dev._data)

    p2, o2, r2 = params, opt_state, rng
    expected = []
    for row in idxs:
        r2, sub = jax.random.split(r2)
        p2, o2, loss = tr.train_step(p2, o2, dev.batch(row), sub, lr)
        expected.append(float(loss))
    np.testing.assert_allclose(np.asarray(losses), expected, rtol=1e-5)
    a = jax.tree.leaves(jax.device_get(p1))[0]
    b = jax.tree.leaves(jax.device_get(p2))[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-7)

    # validation runner agrees with the averaged per-chunk eval steps
    vrng = jax.random.key(3)
    v1 = float(run_val(params, jnp.asarray(idxs), vrng, dev._data))
    r2, vexp = vrng, []
    for row in idxs:
        r2, sub = jax.random.split(r2)
        vexp.append(float(tr.eval_step(params, dev.batch(row), sub)))
    np.testing.assert_allclose(v1, np.mean(vexp), rtol=1e-5)


@pytest.mark.slow
def test_fused_chunk_multichip_matches_single_device(tmp_path):
    """device_data over the full 8-device mesh: dataset replicated, batch
    indices sharded over `data`, grads psum'd by XLA — losses and updated
    params must match the 1-device run.

    slow: compiles the 8-device chunk program twice (~110 s cold on a small
    host); the 1-device fused-vs-per-step equivalence stays in the fast set
    and the driver's dryrun_multichip exercises this path every round."""
    cfg = TINY_CFG
    dm = _synthetic_module(n_steps=160)
    idxs_np = np.arange(32).reshape(2, 16).astype(np.int32)

    def run(mesh, out):
        pol = diffusion.DiffusionPolicy(cfg)
        tcfg = train.TrainConfig(batch_size=16, lr=3e-4, seed=0,
                                 device_data=True, early_stop=False)
        tr = train.Trainer(pol, tcfg, str(tmp_path / out), mesh=mesh)
        assert tr._use_device_data()
        run_chunk, _ = tr._chunk_fns(dm)
        params = pol.init_params(jax.random.key(0))
        params = parallel.replicate(params, tr.mesh)
        opt_state = tr.optimizer.init(params)
        idxs = jax.device_put(idxs_np, tr._idx_sharding(True))
        copy = lambda t: jax.tree.map(jnp.copy, t)
        p, _, o, r, losses = run_chunk(copy(params), None, copy(opt_state),
                                       idxs, jax.random.key(7),
                                       jnp.asarray(3e-4),
                                       tr._device_ds(dm)._data)
        return np.asarray(losses), jax.device_get(p)

    l1, p1 = run(_one_device_mesh(), "run1")
    l8, p8 = run(parallel.make_mesh(), "run8")   # 8 devices on `data`
    np.testing.assert_allclose(l1, l8, rtol=1e-5)
    # params: cross-device psum reorders the gradient reduction, and Adam's
    # per-element normalization amplifies that noise where grad ~ 0
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)


@pytest.mark.slow
def test_trainer_device_data_end_to_end(tmp_path, tiny_pol):
    tcfg = train.TrainConfig(epochs=2, batch_size=8, lr=3e-4, seed=0,
                             early_stop=False, device_data=True)
    trainer = train.Trainer(tiny_pol, tcfg, str(tmp_path / "run"),
                            mesh=_one_device_mesh())
    dm = _synthetic_module(n_steps=120)
    out = trainer.fit(dm)
    assert len(out["history"]["train_loss"]) == 2
    assert np.isfinite(out["history"]["train_loss"]).all()
    assert out["history"]["val_loss"]                # quarter-epoch vals ran
    assert np.isfinite(out["history"]["val_loss"]).all()
    assert os.path.exists(tmp_path / "run" / "STATS.pkl")
    assert train.checkpoints.latest_checkpoint(
        str(tmp_path / "run")) is not None


@pytest.mark.slow
def test_train_autoencoder_fused(tmp_path):
    from state_policy_diffusionmodel_tpu.train.autoencoder import (
        train_autoencoder)

    rng = np.random.default_rng(0)
    images = (rng.integers(0, 256, (40, 96, 96, 3)) / 255.0).astype(
        np.float32)
    out = train_autoencoder(images, str(tmp_path / "ae"), epochs=2,
                            batch_size=8, lr=1e-3, log=lambda *a: None)
    hist = out["history"]
    assert len(hist["train_loss"]) == 2
    assert np.isfinite(hist["train_loss"]).all()
    assert np.isfinite(hist["val_loss"]).all()   # 4-frame partial val batch
    assert hist["train_loss"][1] < hist["train_loss"][0]
    ck = train.checkpoints.latest_checkpoint(str(tmp_path / "ae"))
    assert ck is not None and ck.endswith("epoch=1")
    restored = train.checkpoints.load_checkpoint(
        ck, jax.device_get({"encoder": out["params"]["encoder"],
                            "decoder": out["params"]["decoder"]}))
    assert set(restored) == {"encoder", "decoder"}


def test_step_timer_and_timed():
    from state_policy_diffusionmodel_tpu.utils import profiling
    st = profiling.StepTimer()
    for _ in range(5):
        st.tick(16)
    snap = st.snapshot()
    assert snap["steps"] == 5 and snap["items_per_sec"] > 0
    with profiling.timed("phase") as t:
        pass
    assert t.seconds >= 0


def test_sample_hook_writes_figures(tmp_path, tiny_pol, tiny_params):
    """make_sample_hook: the reference's validation-time position/action
    overlay figures (diffusion_ddpm.py:100-113,351-422) land in
    <out_dir>/samples/ as PNGs."""
    pytest.importorskip("matplotlib")
    params = tiny_params
    dm = _synthetic_module(n_steps=120)

    hook = train.make_sample_hook(tiny_pol, dm, str(tmp_path), sampler="ddim",
                                  num_inference_steps=5)
    assert hook is not None
    hook(params, step_idx=7)
    files = sorted(os.listdir(tmp_path / "samples"))
    assert files == ["step_0000007_actions.png", "step_0000007_positions.png"]


def test_snapshot_npz_fp16_roundtrip(tmp_path):
    """tools/snapshot_run.py exports the latest checkpoint as a downcast
    params.npz that load_checkpoint restores at the TEMPLATE's dtype —
    the host-reset insurance path for trained artifacts."""
    import subprocess
    import sys as _sys

    params = {"w": np.linspace(-1, 1, 32, dtype=np.float32).reshape(4, 8),
              "step": np.int32(7)}
    run = tmp_path / "run"
    train.checkpoints.save_checkpoint(str(run), params, epoch=3)
    with open(run / "hparams.yaml", "w") as f:
        f.write("obs_horizon: 4\n")
    snap = tmp_path / "snap"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    subprocess.run(
        [_sys.executable, os.path.join(repo, "tools", "snapshot_run.py"),
         str(run), str(snap), "--dtype", "float16"],
        check=True, env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert os.path.exists(snap / "hparams.yaml")
    ck = train.checkpoints.latest_checkpoint(str(snap))
    assert ck.endswith("epoch=3")
    restored = train.checkpoints.load_checkpoint(ck, like=params)
    assert np.asarray(restored["w"]).dtype == np.float32
    assert np.asarray(restored["step"]).dtype == np.int32
    np.testing.assert_allclose(restored["w"], params["w"], atol=1e-3)


def test_ema_step_matches_manual_recurrence(tiny_pol, tiny_params):
    """make_train_step(ema_decay=d) must produce the same params trajectory
    as the plain step (same rng/batch) and an EMA equal to the manual
    recurrence ema <- d*ema + (1-d)*params applied per optimizer step."""
    tcfg = train.TrainConfig(batch_size=8, lr=3e-4)
    opt = train.make_optimizer(tcfg)
    d = 0.75

    dm = _synthetic_module()
    batch = next(iter(dm.train_batches(np.random.default_rng(0))))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    step_plain = train.make_train_step(tiny_pol, opt)
    step_ema = train.make_train_step(tiny_pol, opt, ema_decay=d)

    p_a, o_a = tiny_params, opt.init(tiny_params)
    p_b, o_b = tiny_params, opt.init(tiny_params)
    ema = jax.tree.map(jnp.copy, tiny_params)
    ema_manual = jax.tree.map(np.asarray, tiny_params)
    rng = jax.random.key(1)
    for _ in range(3):
        rng, sub = jax.random.split(rng)
        p_a, o_a, loss_a = step_plain(p_a, o_a, batch, sub, jnp.asarray(3e-4))
        p_b, ema, o_b, loss_b = step_ema(p_b, ema, o_b, batch, sub,
                                         jnp.asarray(3e-4))
        assert float(loss_a) == float(loss_b)
        ema_manual = jax.tree.map(
            lambda e, p: e * d + np.asarray(p) * (1 - d), ema_manual, p_a)
    # identical params trajectory, EMA == manual recurrence
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), p_a, p_b)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7), ema, ema_manual)
    # EMA lags the raw params (it still remembers the init)
    diffs = jax.tree_util.tree_leaves(jax.tree.map(
        lambda e, p: float(np.abs(np.asarray(e) - np.asarray(p)).max()),
        ema, p_b))
    assert max(diffs) > 0


@pytest.mark.slow
def test_trainer_ema_and_insurance(tmp_path, tiny_pol):
    """Trainer with ema_decay saves checkpoints_ema/ (loadable, different
    from raw) and drops a best-val fp16 insurance snapshot + BEST.json."""
    import json as _json

    ins = tmp_path / "insurance"
    tcfg = train.TrainConfig(epochs=2, batch_size=8, lr=3e-4, seed=0,
                             early_stop=False, device_data=True,
                             ema_decay=0.9, insurance_dir=str(ins))
    trainer = train.Trainer(tiny_pol, tcfg, str(tmp_path / "run"),
                            mesh=_one_device_mesh())
    dm = _synthetic_module(n_steps=120)
    out = trainer.fit(dm)
    assert out["ema"] is not None
    raw_ck = train.checkpoints.latest_checkpoint(str(tmp_path / "run"))
    ema_ck = train.checkpoints.latest_checkpoint(
        str(tmp_path / "run"), subdir="checkpoints_ema")
    assert raw_ck is not None and ema_ck is not None
    tmpl = jax.device_get(out["params"])
    raw = train.checkpoints.load_checkpoint(raw_ck, tmpl)
    ema = train.checkpoints.load_checkpoint(ema_ck, tmpl)
    deltas = jax.tree_util.tree_leaves(jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        raw, ema))
    assert max(deltas) > 0            # EMA genuinely lags the raw params
    # insurance snapshot: fp16 npz + sidecars + BEST.json
    best = _json.load(open(ins / "BEST.json"))
    assert best["ema"] is True and np.isfinite(best["val_loss"])
    ins_ck = train.checkpoints.latest_checkpoint(str(ins))
    assert ins_ck is not None and os.path.exists(
        os.path.join(ins_ck, "params.npz"))
    restored = train.checkpoints.load_checkpoint(ins_ck, like=tmpl)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=2e-2), restored, ema)
    assert os.path.exists(ins / "hparams.yaml")
    assert os.path.exists(ins / "STATS.pkl")


@pytest.mark.slow
def test_insurance_seeds_from_existing_best(tmp_path, tiny_pol):
    """A resumed run must NOT clobber a previously saved better insurance
    snapshot: best_insured seeds from insurance_dir/BEST.json (round-4
    advisor, medium)."""
    import json as _json

    ins = tmp_path / "insurance"
    # pre-existing snapshot with an unbeatable val loss
    prev_ck = ins / "checkpoints" / "epoch=99"
    prev_ck.mkdir(parents=True)
    np.savez(prev_ck / "params.npz", marker=np.ones(3))
    (ins / "BEST.json").write_text(
        _json.dumps({"epoch": 99, "val_loss": 0.0, "ema": True}))
    tcfg = train.TrainConfig(epochs=2, batch_size=8, lr=3e-4, seed=0,
                             early_stop=False, device_data=True,
                             ema_decay=0.9, insurance_dir=str(ins))
    trainer = train.Trainer(tiny_pol, tcfg, str(tmp_path / "run"),
                            mesh=_one_device_mesh())
    trainer.fit(_synthetic_module(n_steps=120))
    best = _json.load(open(ins / "BEST.json"))
    assert best["epoch"] == 99 and best["val_loss"] == 0.0
    assert os.path.exists(prev_ck / "params.npz")


def test_load_checkpoint_none_raises_clear_error():
    """--ema loads on a run without checkpoints_ema/ funnel None in here;
    the error must say so instead of TypeError from os.path.join (round-4
    advisor, low)."""
    with pytest.raises(FileNotFoundError, match="ema_decay"):
        train.checkpoints.load_checkpoint(None, like=None)

"""Diffusion policy training CLI (parity with /root/reference/train.py)."""

from __future__ import annotations

import argparse
import os
from datetime import datetime


def parse_arguments():
    p = argparse.ArgumentParser(description="Train the diffusion policy")
    # reference defaults (train.py:16-35)
    p.add_argument("--n_epochs", type=int, default=500)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--min_lr", type=float, default=0.0,
                   help="plateau-decay floor (torch min_lr; reference "
                        "default 0). Recommended with --no_early_stop, "
                        "which removes the stop that normally halts decay")
    p.add_argument("--lr_schedule", default="plateau",
                   choices=["plateau", "cosine"],
                   help="cosine = half-cosine lr->min_lr over --n_epochs, "
                        "ignoring val (the large-batch recipe; the epoch-"
                        "patience plateau decays too early at big batches)")
    p.add_argument("--obs_horizon", type=int, default=10)
    p.add_argument("--pred_horizon", type=int, default=30)
    p.add_argument("--inpaint_horizon", type=int, default=1)
    p.add_argument("--step_size", type=int, default=5)
    p.add_argument("--noise_steps", type=int, default=1000)
    p.add_argument("--model", default="UNet_Film",
                   choices=["UNet_Film", "UNet_FilmnoAttention", "UNet"])
    p.add_argument("--model_width", type=int, default=None,
                   help="U-Net base channel count; default = each net's "
                        "reference channel plan (64 FiLM / 16 simple)")
    p.add_argument("--noise_scheduler", default="linear",
                   choices=["linear", "linear_v2", "cosine"])
    p.add_argument("--vision_encoder", default="autoencoder",
                   choices=["autoencoder", "resnet18", "none"])
    p.add_argument("--train_encoder", action="store_true",
                   help="backprop into the vision encoder (the reference "
                        "freezes the AE; required for a from-scratch "
                        "ResNet18-GN encoder, whose random frozen features "
                        "carry no signal)")
    p.add_argument("--encoder_ckpt", default=None,
                   help="pretrained autoencoder checkpoint dir (optional)")
    p.add_argument("--dataset_dir", default="./data")
    p.add_argument("--dataset_name", required=True)
    p.add_argument("--out_dir", default="./tb_logs")
    p.add_argument("--amp", action="store_true")
    p.add_argument("--device_data", action="store_true",
                   help="keep the dataset resident in device HBM and gather "
                        "training windows in-jit; on a multi-chip mesh "
                        "indices shard over the data axis")
    p.add_argument("--no_early_stop", action="store_true",
                   help="disable the reference's lr-monitor early stopping")
    p.add_argument("--ema_decay", type=float, default=0.0,
                   help="> 0: maintain an EMA of the params (per optimizer "
                        "step), saved under checkpoints_ema/; evaluate with "
                        "the downstream CLIs' --ema flag. 0.999 is a good "
                        "default for large-batch runs")
    p.add_argument("--insurance_dir", default=None,
                   help="write a small fp16 best-val params snapshot (+ "
                        "hparams/STATS) into this dir whenever val improves "
                        "— host-reset insurance outside tb_logs")
    p.add_argument("--tensorboard", action="store_true",
                   help="also mirror metrics to TensorBoard event files")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--version", default=None)
    p.add_argument("--resume", action="store_true",
                   help="continue from the latest checkpoint in the run dir "
                        "(requires --version of an existing run)")
    p.add_argument("--profile_dir", default=None,
                   help="capture a jax.profiler device trace of the first "
                        "training steps into this directory")
    p.add_argument("--no_sample_viz", action="store_true",
                   help="skip the validation-time sample figures (the "
                        "reference logs position/action overlays for val "
                        "batch 0 at every validation check)")
    p.add_argument("--sample_viz_steps", type=int, default=50,
                   help="DDIM steps for the validation-time sample figures")
    return p.parse_args()


def main():
    args = parse_arguments()
    import jax
    from state_policy_diffusionmodel_tpu import diffusion, train
    from state_policy_diffusionmodel_tpu.data.dataset import DataModule
    from state_policy_diffusionmodel_tpu.utils.printing import (
        print_dataset_info, print_hyperparameters)

    version = args.version or datetime.now().strftime("version_%Y%m%d_%H%M%S")
    out_dir = os.path.join(args.out_dir, version)

    cfg = diffusion.PolicyConfig(
        noise_steps=args.noise_steps,
        obs_horizon=args.obs_horizon,
        pred_horizon=args.pred_horizon,
        inpaint_horizon=args.inpaint_horizon,
        model=args.model,
        model_width=args.model_width,
        noise_scheduler_type=args.noise_scheduler,
        step_size=args.step_size,
        vision_encoder=args.vision_encoder,
        train_encoder=args.train_encoder,
    )
    tcfg = train.TrainConfig(
        epochs=args.n_epochs, batch_size=args.batch_size, lr=args.lr,
        min_lr=args.min_lr, lr_schedule=args.lr_schedule,
        amp=args.amp, seed=args.seed,
        device_data=args.device_data,
        early_stop=not args.no_early_stop, tensorboard=args.tensorboard,
        ema_decay=args.ema_decay, insurance_dir=args.insurance_dir)
    print_hyperparameters(cfg, tcfg)

    dm = DataModule(batch_size=args.batch_size, data_dir=args.dataset_dir,
                    T_obs=args.obs_horizon, T_pred=args.pred_horizon,
                    seed=args.seed, step_size=args.step_size)
    dm.setup(args.dataset_name)
    print_dataset_info(args.dataset_name, len(dm.data_full),
                       len(dm.train_idx), len(dm.val_idx),
                       args.obs_horizon, args.pred_horizon, args.step_size)

    policy = diffusion.DiffusionPolicy(cfg)
    params = None
    if args.encoder_ckpt:
        import jax.numpy as jnp
        from state_policy_diffusionmodel_tpu.models import Autoencoder

        # accept either a run dir (tb_logs_autoencoder/<version>) or a
        # specific checkpoints/epoch=K dir
        ck = args.encoder_ckpt
        latest = train.checkpoints.latest_checkpoint(ck)
        if latest is not None:
            ck = latest
        ae_tmpl = jax.device_get(jax.jit(Autoencoder(cfg.vision_latent).init)(
            jax.random.key(0), jnp.zeros((1, 96, 96, 3)))["params"])
        enc = train.checkpoints.load_checkpoint(ck, ae_tmpl)["encoder"]
        params = policy.init_params(jax.random.key(0), encoder_params=enc)
        print(f"loaded pretrained encoder from {ck}")

    trainer = train.Trainer(policy, tcfg, out_dir)
    sample_hook = None
    if not args.no_sample_viz:
        # the reference's quarter-epoch visual feedback: full reverse
        # diffusion on a fixed val window, position/action overlay figures
        # (diffusion_ddpm.py:100-113,351-422)
        sample_hook = train.make_sample_hook(
            policy, dm, out_dir, tb_writer=trainer._tb,
            num_inference_steps=args.sample_viz_steps)
    if args.profile_dir:
        from state_policy_diffusionmodel_tpu.utils import profiling

        with profiling.trace(args.profile_dir):
            result = trainer.fit(dm, params=params, resume=args.resume,
                                 sample_hook=sample_hook)
    else:
        result = trainer.fit(dm, params=params, resume=args.resume,
                             sample_hook=sample_hook)
    print(f"done; final lr {result['lr']}, artifacts in {out_dir}")


if __name__ == "__main__":
    main()

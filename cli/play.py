"""Interactive keyboard demo (parity with the reference's manual-driving
main, /root/reference/envs/car_racing.py:779-835): drive the car with the
arrow keys in a matplotlib window; prints action/step/reward every 200 steps
like the reference's render loop.

Keys: left/right = steer, up = gas, down = brake, r = reset, q = quit.
"""

from __future__ import annotations

import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--augmented", action="store_true",
                   help="show the augmented (behavior-lane) frame")
    p.add_argument("--fps", type=float, default=50.0)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import matplotlib

    try:
        matplotlib.use("TkAgg")
    except Exception:
        pass
    import matplotlib.pyplot as plt

    from state_policy_diffusionmodel_tpu import envs, track as T

    geom = T.build(T.make_track(args.seed))
    reset = jax.jit(envs.reset)
    step = jax.jit(envs.step)
    state, res = reset(geom)

    action = np.zeros(3, np.float32)
    flags = {"quit": False, "reset": False}

    def on_key(event, down):
        k = event.key
        if k == "left":
            action[0] = -1.0 if down else 0.0
        elif k == "right":
            action[0] = +1.0 if down else 0.0
        elif k == "up":
            action[1] = +1.0 if down else 0.0
        elif k == "down":
            action[2] = +0.8 if down else 0.0
        elif k == "r" and down:
            flags["reset"] = True
        elif k == "q" and down:
            flags["quit"] = True

    fig, ax = plt.subplots(figsize=(5, 5))
    fig.canvas.mpl_connect("key_press_event", lambda e: on_key(e, True))
    fig.canvas.mpl_connect("key_release_event", lambda e: on_key(e, False))
    frame = np.asarray(res.augmented if args.augmented else res.obs)
    im = ax.imshow(frame)
    ax.axis("off")
    ax.set_title("arrows drive, r resets, q quits")
    plt.ion()
    plt.show()

    total, steps = 0.0, 0
    while not flags["quit"] and plt.fignum_exists(fig.number):
        if flags["reset"]:
            state, res = reset(geom)
            total, steps = 0.0, 0
            flags["reset"] = False
        state, res = step(state, geom, jnp.asarray(action))
        total += float(res.reward)
        steps += 1
        if steps % 200 == 0 or bool(res.done):
            print(f"action {action.tolist()} step {steps} "
                  f"total_reward {total:+0.2f}")
        if bool(res.done):
            state, res = reset(geom)
            total, steps = 0.0, 0
        im.set_data(np.asarray(res.augmented if args.augmented else res.obs))
        plt.pause(max(1.0 / args.fps, 1e-3))


if __name__ == "__main__":
    main()

"""TPU-native re-implementation of the State_Policy_DiffusionModel framework.

A brand-new JAX/XLA/Pallas framework with the capabilities of the reference
repo `rafaelsoStanford/State_Policy_DiffusionModel` (a conditioned diffusion
model predicting driver trajectories + actions in a modified CarRacing-v0
environment), re-designed TPU-first:

- ``physics``   : pure-JAX analytic car dynamics (replaces Box2D).
- ``track``     : procedural track generation (host numpy) + device geometry.
- ``render``    : 96x96 top-down rasterizer (jnp + Pallas), replaces pyglet/GL.
- ``envs``      : functional CarRacing env (reset/step/render), vmappable.
- ``control``   : PID lane-following / sinusoidal drivers as scanned functions.
- ``data``      : episodic replay buffer (tensorstore-zarr), windowed datasets.
- ``models``    : Flax U-Nets (FiLM / no-attention / simple), autoencoder,
                  ResNet18-GN vision encoder.
- ``diffusion`` : DDPM/DDIM schedulers and samplers fused with ``lax.scan``.
- ``train``     : pjit/data-parallel training loop, orbax checkpoints.
- ``eval``      : the reference's closed-loop evaluation suite, vmapped.
- ``parallel``  : device-mesh / sharding utilities.

This is not a port: all compute paths are array programs designed for the
MXU/VPU and XLA's compilation model.
"""

__version__ = "0.1.0"

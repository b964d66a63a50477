"""Conv autoencoder vision encoder (Flax/NHWC).

Parity with `/root/reference/models/encoder/autoencoder.py:7-37`: encoder
3->16->32->64 (three stride-2 convs, first with padding 1) -> flatten ->
Dense(128) latent; mirrored ConvTranspose decoder with sigmoid output.
The encoder half is the default vision conditioning path of the diffusion
model (diffusion_ddpm.py:84-88).
"""

from __future__ import annotations

import jax
from flax import linen as nn


class Encoder(nn.Module):
    latent_dim: int = 128

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x: (B, 96, 96, 3) in [0, 1] -> (B, latent_dim)."""
        x = nn.Conv(16, (2, 2), strides=2, padding=((1, 1), (1, 1)))(x)  # 49
        x = nn.relu(x)
        x = nn.Conv(32, (2, 2), strides=2, padding="VALID")(x)           # 24
        x = nn.relu(x)
        x = nn.Conv(64, (2, 2), strides=2, padding="VALID")(x)           # 12
        x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(self.latent_dim)(x)


class Decoder(nn.Module):
    channels: int = 3

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        x = nn.Dense(64 * 12 * 12)(z)
        x = x.reshape(-1, 12, 12, 64)
        x = nn.ConvTranspose(32, (2, 2), strides=(2, 2))(x)              # 24
        x = nn.relu(x)
        x = nn.ConvTranspose(16, (2, 2), strides=(2, 2))(x)              # 48
        x = nn.relu(x)
        x = nn.ConvTranspose(self.channels, (2, 2), strides=(2, 2))(x)   # 96
        return nn.sigmoid(x)


class Autoencoder(nn.Module):
    latent_dim: int = 128
    channels: int = 3

    def setup(self):
        self.encoder = Encoder(self.latent_dim)
        self.decoder = Decoder(self.channels)

    def __call__(self, x):
        return self.decoder(self.encoder(x))

    def encode(self, x):
        return self.encoder(x)

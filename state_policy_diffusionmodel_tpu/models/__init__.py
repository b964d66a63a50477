from .autoencoder import Autoencoder, Decoder, Encoder
from .resnet import ResNet18GN
from .unet import (
    MODEL_REGISTRY, UNetFiLM, UNetFiLMNoAttention, UNetSimple, build_model,
)

__all__ = [
    "Autoencoder", "Encoder", "Decoder", "ResNet18GN",
    "UNetFiLM", "UNetFiLMNoAttention", "UNetSimple", "build_model",
    "MODEL_REGISTRY",
]

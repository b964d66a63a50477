from . import normalize
from .collect import collect_episodes, generate_dataset
from .dataset import DataModule, WindowDataset, load_stats
from .replay_buffer import (ReplayBuffer, ZarrReplayBuffer, load_zarr, save_zarr)

__all__ = [
    "normalize", "ReplayBuffer", "ZarrReplayBuffer", "save_zarr", "load_zarr",
    "collect_episodes", "generate_dataset", "WindowDataset", "DataModule",
    "load_stats",
]

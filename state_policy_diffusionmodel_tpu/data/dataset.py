"""Windowed dataset + data module for diffusion-policy training.

Capability-parity with `CarRacingDataset` / `CarRacingDataModule`
(`/root/reference/utils/load_data.py`): sparse strided windows over zarr
episodes, min-max action/velocity normalization, the per-window position
centering, the averaged-window position stats quirk, the 80/20 seeded split
and the `STATS.pkl` sidecar.

TPU-native differences:
- images stay NHWC (the reference transposes to torch NCHW, load_data.py:47),
- batches are assembled as stacked numpy and fed to `jax.device_put` (no
  torch DataLoader workers); batch assembly optionally dispatches to the
  C++ window-sampler in `csrc/` when built.
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, Iterator, Optional

import numpy as np

from . import normalize as N
from .replay_buffer import ReplayBuffer, load_zarr


class WindowDataset:
    """Sparse strided windows with reference normalization."""

    def __init__(self, source, obs_horizon: int, pred_horizon: int,
                 step_size: int = 1, stats: Optional[dict] = None):
        if isinstance(source, str):
            source = load_zarr(source)
        if isinstance(source, ReplayBuffer):
            data, ends = source.data, source.episode_ends
            self.meta = dict(source.meta)
        else:
            data, ends = source
            self.meta = {}
        self.episode_ends = np.asarray(ends, np.int64)
        self.obs_horizon = obs_horizon
        self.pred_horizon = pred_horizon
        self.sequence_len = obs_horizon + pred_horizon
        self.step_size = step_size

        self.indices = N.create_sample_indices_sparse(
            ends, self.sequence_len, step_size)
        if len(self.indices) == 0:
            raise ValueError("no valid windows — episodes too short")

        raw = {
            "position": np.asarray(data["position"], np.float32),
            "velocity": np.asarray(data["velocity"], np.float32),
            "action": np.asarray(data["action"], np.float32),
        }
        # per-frame raw sim states ((T, 30) physics.save_state vectors) when
        # the dataset carries them — enables O(1) mid-episode env restore in
        # eval (the reference pickles these beside each dataset,
        # generateParallelTraj.py:77-80); older datasets lack the key and
        # fall back to action replay
        self.car_state = (np.asarray(data["car_state"], np.float32)
                          if "car_state" in data else None)
        img = np.asarray(data["img"])
        if img.dtype == np.uint8:
            img = img.astype(np.float32) / 255.0

        self.inference_mode = stats is not None
        self.stats = stats if stats is not None else self._compute_stats(raw)

        self.train_data = {
            "position": raw["position"],
            "velocity": N.normalize_data(raw["velocity"], self.stats["velocity"]),
            "action": N.normalize_data(raw["action"], self.stats["action"]),
            "image": img.astype(np.float32),
        }

    def _compute_stats(self, raw):
        """Averaged per-window position min/max (load_data.py:58-78 quirk)
        + global action/velocity min-max."""
        pos = raw["position"]
        mins, maxs = [], []
        for start, end, _, _ in self.indices:
            w = pos[start:end:self.step_size]
            mins.append(w.min())
            maxs.append(w.max())
        return {
            "position": {"min": np.float32(np.mean(mins)),
                         "max": np.float32(np.mean(maxs))},
            "velocity": N.get_data_stats(raw["velocity"]),
            "action": N.get_data_stats(raw["action"]),
        }

    def __len__(self):
        return len(self.indices)

    def get_window(self, idx: int):
        start, end, _, _ = self.indices[idx]
        sample = {k: v[start:end:self.step_size]
                  for k, v in self.train_data.items()}
        npos, translation = N.normalize_position(
            sample["position"], self.stats["position"])
        sample["position"] = npos.astype(np.float32)
        if self.inference_mode:
            return sample, translation, int(start), int(end)
        return sample

    def batch(self, idxs, return_translations: bool = False):
        """Stacked batch {image, position, velocity, action}: (B, T, ...).

        Uses the C++ window-sampler (csrc/) when built — one multithreaded
        gather instead of per-window python — falling back to numpy.
        With return_translations=True also returns the (B, 2) per-window
        first-frame translation vectors (needed to unnormalize predicted
        positions back to the world frame, cf. `get_window`)."""
        from . import native
        idxs = np.asarray(idxs, np.int64)
        starts = self.indices[idxs, 0]
        seq, step = self.sequence_len, self.step_size
        out = {
            "image": native.gather_windows(self.train_data["image"], starts,
                                           seq, step),
            "velocity": native.gather_windows(self.train_data["velocity"],
                                              starts, seq, step),
            "action": native.gather_windows(self.train_data["action"], starts,
                                            seq, step),
        }
        pos = native.gather_windows(self.train_data["position"], starts, seq,
                                    step)
        pos, translations = native.normalize_positions(
            pos, float(self.stats["position"]["min"]),
            float(self.stats["position"]["max"]))
        out["position"] = pos
        if return_translations:
            return out, translations
        return out

    def save_stats(self, path: str):
        """Reference STATS.pkl sidecar: a single-element list
        (load_data.py:179-182)."""
        with open(path, "wb") as f:
            pickle.dump([self.stats], f)


class DeviceWindowDataset:
    """Device-resident variant of WindowDataset.

    The whole dataset lives in HBM (images as uint8, 4x smaller) and the
    strided window gather + position normalization run inside jit — the host
    only supplies batch indices. This removes the per-batch host->device
    image transfer entirely (the torch-DataLoader shape of the reference,
    `utils/load_data.py:174`; ~70 MB/batch at the default horizons).
    Outputs match `WindowDataset.batch` to 1 ulp (XLA lowers the /255 and
    normalization divisions to multiply-by-reciprocal).
    """

    def __init__(self, ds: WindowDataset, sharding=None):
        """`sharding` (optional): a replicated NamedSharding placing the
        dataset arrays on every device of a mesh, so batch gathers can run
        inside multi-chip jitted programs (idx sharded over `data`, gather
        local to each shard)."""
        import jax
        import jax.numpy as jnp

        self.stats = ds.stats
        self.sequence_len = ds.sequence_len
        self.step_size = ds.step_size
        self.n_windows = len(ds)
        put = ((lambda x: jax.device_put(jnp.asarray(x), sharding))
               if sharding is not None else jnp.asarray)

        img = ds.train_data["image"]
        scaled = img * np.float32(255.0)
        rounded = np.round(scaled)
        if np.abs(scaled - rounded).max() < 1e-3:
            img_dev = put(rounded.astype(np.uint8))          # lossless
        else:
            img_dev = put(img)                                # keep f32
        self._data = {
            "image": img_dev,
            "position": put(ds.train_data["position"]),
            "velocity": put(ds.train_data["velocity"]),
            "action": put(ds.train_data["action"]),
        }
        self._data["starts"] = put(np.asarray(ds.indices[:, 0], np.int32))
        jax.block_until_ready(self._data)
        # pmin/pmax/step baked as python scalars; the dataset arrays are
        # EXPLICIT jit arguments, never closures: closed-over device arrays
        # get inlined into the lowered HLO as literals, which ships the
        # whole dataset with every (remote) compile — the axon tunnel
        # rejects such requests above ~256 MB (HTTP 413), and even under
        # the limit it bloats compile time and the persistent cache.
        step = self.step_size
        seq = self.sequence_len
        pmin = float(ds.stats["position"]["min"])
        pmax = float(ds.stats["position"]["max"])

        @jax.jit
        def _batch(data, idx):
            offs = jnp.arange(seq, dtype=jnp.int32) * step
            rows = data["starts"][idx][:, None] + offs[None, :]  # (B, seq)
            img = data["image"][rows]
            if img.dtype == jnp.uint8:
                img = img.astype(jnp.float32) / 255.0
            pos = data["position"][rows]
            rng = pmax - pmin
            rng = rng if rng != 0 else 1.0
            sn = (pos - pmin) / rng * 2 - 1
            trans = sn[:, 0:1]
            return {
                "image": img,
                "velocity": data["velocity"][rows],
                "action": data["action"][rows],
                "position": (sn - trans) / 2.0,
            }

        self._batch_fn = _batch

    def __len__(self):
        return self.n_windows

    def batch(self, idxs):
        import jax
        import jax.numpy as jnp

        if not isinstance(idxs, jax.Array):
            idxs = jnp.asarray(np.asarray(idxs), jnp.int32)
        return self._batch_fn(self._data, idxs)


def load_stats(path: str) -> dict:
    with open(path, "rb") as f:
        return pickle.load(f)[0]


class DataModule:
    """80/20 split + shuffled batch iterators (load_data.py:146-182)."""

    def __init__(self, batch_size: int, data_dir: str = "", T_obs: int = 4,
                 T_pred: int = 8, seed: Optional[int] = None,
                 stats: Optional[dict] = None, step_size: int = 5):
        self.batch_size = batch_size
        self.data_dir = data_dir
        self.T_obs, self.T_pred = T_obs, T_pred
        self.seed = seed
        self.stats = stats
        self.step_size = step_size
        self.data_full: Optional[WindowDataset] = None

    def setup(self, name: str = ""):
        path = os.path.join(self.data_dir, name) if name else self.data_dir
        self.data_full = WindowDataset(
            path, self.T_obs, self.T_pred, self.step_size, stats=self.stats)
        self.stats = self.data_full.stats
        n = len(self.data_full)
        n_train = int(n * 0.8)
        rng = np.random.default_rng(self.seed)
        perm = rng.permutation(n)
        self.train_idx = perm[:n_train]
        self.val_idx = perm[n_train:]

    def _iterate(self, idxs, shuffle: bool, rng=None,
                 drop_last: bool = False) -> Iterator[Dict[str, np.ndarray]]:
        order = idxs
        if shuffle:
            rng = rng or np.random.default_rng()
            order = rng.permutation(idxs)
        for i in range(0, len(order), self.batch_size):
            chunk = order[i:i + self.batch_size]
            if drop_last and len(chunk) < self.batch_size:
                return
            yield self.data_full.batch(chunk)

    def train_batches(self, rng=None, drop_last=True):
        return self._iterate(self.train_idx, True, rng, drop_last)

    def val_batches(self):
        return self._iterate(self.val_idx, False)

    def save_stats(self, path: str):
        self.data_full.save_stats(path)

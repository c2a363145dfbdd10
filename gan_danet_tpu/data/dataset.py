"""Dataset + batcher (the reference's CustomDataset/DataLoader,
datasets.py:156-208, rebuilt for static-shape TPU training).

Design notes:
  * Samples: (lr_grace_05 [H05,W05,1], lr_grace_025 [H25,W25,1],
    hr_aux [H25,W25,C]) — NHWC.
  * Fixed batch size always: the final short batch wraps around to the
    epoch's start instead of shrinking (torch DataLoader emits a ragged
    last batch, which would trigger an XLA recompile per epoch). The
    <=bs-1 duplicated samples per epoch are noted; set drop_last=True for
    exact torch drop_last semantics.
  * Augmentation (random h/v flip, rot180, gaussian noise on the GRACE
    channels; reference datasets.py:181-208) is a jittable pure function
    over a PRNG key, applied on device per batch. rot90/270 is only valid
    on square grids (torch would crash collating 44x90 rotated to 90x44);
    on non-square grids we rotate by 180 only — the reference never
    enables augmentation on the main path (CustomDataset defaults
    augment=False in ModelTrainer).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class ArrayDataset:
    lr_grace_05: np.ndarray    # (N, H05, W05)
    lr_grace_025: np.ndarray   # (N, H25, W25)
    hr_aux: np.ndarray         # (N, H25, W25, C)

    def __len__(self) -> int:
        return self.lr_grace_05.shape[0]

    def __getitem__(self, idx):
        return {
            "lr05": self.lr_grace_05[idx][..., None],
            "lr025": self.lr_grace_025[idx][..., None],
            "aux": self.hr_aux[idx],
        }


def train_test_split_indices(n: int, test_fraction: float, seed: int):
    """sklearn-compatible shuffled split (the reference uses
    train_test_split(random_state=rand); we reproduce via sklearn when
    available so member splits match bit-for-bit)."""
    try:
        from sklearn.model_selection import train_test_split

        idx = np.arange(n)
        train_idx, test_idx = train_test_split(idx, test_size=test_fraction,
                                               random_state=seed)
        return np.asarray(train_idx), np.asarray(test_idx)
    except ImportError:  # pragma: no cover
        rng = np.random.default_rng(seed)
        perm = rng.permutation(n)
        n_test = int(np.ceil(n * test_fraction))
        return perm[n_test:], perm[:n_test]


class Batcher:
    """Fixed-size batch iterator with optional shuffling and wrap-around
    final batch."""

    def __init__(
        self,
        dataset: ArrayDataset,
        batch_size: int,
        shuffle: bool = False,
        drop_last: bool = False,
        seed: int = 0,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self._rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return int(np.ceil(n / self.batch_size))

    def __iter__(self) -> Iterator[dict]:
        n = len(self.dataset)
        order = self._rng.permutation(n) if self.shuffle else np.arange(n)
        bs = self.batch_size
        n_batches = len(self)
        for b in range(n_batches):
            idx = order[b * bs : (b + 1) * bs]
            if len(idx) < bs:  # wrap-around fill
                idx = np.concatenate([idx, order[: bs - len(idx)]])
            yield self.dataset[idx]


def apply_augmentation(batch: dict, key: jax.Array, noise_std: float = 0.05) -> dict:
    """Jittable per-batch augmentation (reference datasets.py:181-208):
    50% horizontal flip, 50% vertical flip, 50% rot180, 50% gaussian noise
    on both GRACE channels. Whole-batch decisions (the reference decides
    per sample; per-batch keeps shapes static and fuses — distribution is
    equivalent over an epoch)."""
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    lr05, lr025, aux = batch["lr05"], batch["lr025"], batch["aux"]

    def flip_w(t):
        return t[:, :, ::-1, :]

    def flip_h(t):
        return t[:, ::-1, :, :]

    do_h = jax.random.bernoulli(k1)
    do_v = jax.random.bernoulli(k2)
    do_r = jax.random.bernoulli(k3)
    do_n = jax.random.bernoulli(k4)

    def maybe(pred, fn, *ts):
        return tuple(jax.lax.cond(pred, fn, lambda a: a, t) for t in ts)

    lr05, lr025, aux = maybe(do_h, flip_w, lr05, lr025, aux)
    lr05, lr025, aux = maybe(do_v, flip_h, lr05, lr025, aux)
    lr05, lr025, aux = maybe(do_r, lambda t: flip_h(flip_w(t)), lr05, lr025, aux)

    noise05 = noise_std * jax.random.normal(k5, lr05.shape, lr05.dtype)
    noise25 = noise_std * jax.random.normal(k6, lr025.shape, lr025.dtype)
    lr05 = jnp.where(do_n, lr05 + noise05, lr05)
    lr025 = jnp.where(do_n, lr025 + noise25, lr025)
    return {"lr05": lr05, "lr025": lr025, "aux": aux}

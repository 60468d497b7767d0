"""Latent-moments cache: skip the frozen VAE encoder in the train step.

The reference re-encodes the ground-truth image through the frozen VAE
every training step (`train_controlnet.py:1081-1082`).  The encoder is
frozen and its posterior is a diagonal Gaussian, so the per-sample output
MOMENTS (mean ++ logvar, `2 * latent_channels` channels at H/8) can be
computed once offline; the train step then draws
``mean + exp(0.5 * logvar) * eps`` — the same math as the online encode
given the same rng (equal to float fusion-order rounding across the two
XLA programs; bounded in tests/test_latent_cache.py) while
removing the encoder forward entirely (78 ms of the 425 ms batch-8 step,
artifacts/profile_train.json — an 18% step-time cut).

Correctness precondition: the cached pixels must be the pixels the step
would have seen.  The dataset's ColorJitter augmentation makes pixels
draw-dependent, so caching requires ``transform=False`` (enforced at wrap
time).  Text dropout and flow handling are unaffected (latents depend on
the image only).

Storage: float32 .npy per sample index.  The production VAE runs bf16;
bf16 -> f32 -> bf16 is an exact round-trip, so the cache file adds no
rounding of its own on top of the bf16 encode.
"""

from __future__ import annotations

import json
import os
from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp

_META = "latent_cache_meta.json"


def _moments_path(cache_dir: str, index: int) -> str:
    return os.path.join(cache_dir, f"moments_{index:08d}.npy")


def precompute_latent_moments(vae, vae_params, dataset, cache_dir: str,
                              batch_size: int = 8) -> int:
    """Encode every dataset sample once and store (mean ++ logvar).

    dataset: indexable, samples with an 'image' [H,W,3] in [-1,1] key.
    Returns the number of samples written.  Batches are padded to
    `batch_size` so exactly one program compiles.
    """
    if getattr(dataset, "transform", False):
        raise ValueError(
            "latent caching requires deterministic pixels: construct the "
            "dataset with transform=False (ColorJitter changes the image "
            "per draw, which would make the cache stale by construction)")
    os.makedirs(cache_dir, exist_ok=True)

    @jax.jit
    def encode(imgs):
        mean, logvar = vae.apply(vae_params, imgs, method=vae.encode)
        return jnp.concatenate([mean, logvar], axis=-1)

    n = len(dataset)
    written = 0
    for s0 in range(0, n, batch_size):
        idx = list(range(s0, min(s0 + batch_size, n)))
        # same target selection as the trainer's loss_fn: the residual
        # variant encodes the residual image
        samples = [dataset[i] for i in idx]
        imgs = np.stack([s.get("residual", s["image"]) for s in samples])
        nb = imgs.shape[0]
        if nb < batch_size:
            imgs = np.concatenate(
                [imgs] + [imgs[-1:]] * (batch_size - nb))
        # fetch in f32: exact for bf16 moments (8-bit mantissa subset)
        moments = np.asarray(encode(jnp.asarray(imgs)),
                             np.float32)[:nb]
        for k, i in enumerate(idx):
            np.save(_moments_path(cache_dir, i), moments[k])
        written += nb
    with open(os.path.join(cache_dir, _META), "w") as f:
        json.dump({"count": written,
                   "moments_shape": list(moments[0].shape)}, f)
    return written


def cache_complete(cache_dir: str, n: int) -> bool:
    meta = os.path.join(cache_dir, _META)
    if not os.path.exists(meta):
        return False
    with open(meta) as f:
        return json.load(f).get("count") == n


class LatentCachedDataset:
    """Wrap an indexable dataset, adding 'latent_moments' to each sample.

    The trainer's loss_fn uses the key to skip the VAE encoder
    (train/trainer.py); every other key passes through untouched.
    """

    def __init__(self, dataset, cache_dir: str):
        if getattr(dataset, "transform", False):
            raise ValueError(
                "latent caching requires transform=False on the wrapped "
                "dataset (ColorJitter invalidates cached latents)")
        if not cache_complete(cache_dir, len(dataset)):
            raise FileNotFoundError(
                f"latent cache at {cache_dir!r} is missing or incomplete; "
                "run precompute_latent_moments first")
        self.dataset = dataset
        self.cache_dir = cache_dir

    def __len__(self):
        return len(self.dataset)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        sample = dict(self.dataset[index])
        sample["latent_moments"] = np.load(
            _moments_path(self.cache_dir, index))
        return sample

    def iter_batches(self, batch_size: int, text_encoder=None,
                     shuffle: bool = True):
        """UniDataset.iter_batches parity, with 'latent_moments' stacked
        into every batch (iter_dataset_batches stacks all array keys)."""
        from diffcodec_tpu.train.dataset import iter_dataset_batches
        return iter_dataset_batches(
            self, batch_size, rng=getattr(self.dataset, "_rng", None),
            text_encoder=text_encoder, shuffle=shuffle)

    # pass-through for UniDataset helpers the harness touches (anything
    # sample-shaping is overridden above)
    def __getattr__(self, name):
        return getattr(self.dataset, name)

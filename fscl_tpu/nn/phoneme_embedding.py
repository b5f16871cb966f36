"""Legacy phoneme-embedding hub: mode registry + codebook variants.

Re-provides lightning/model/phoneme_embedding.py:150-656 (+
phoneme_embedding2.py): the "table / table-sep / hard / soft / soft-m" mode
registry behind `get_new_embedding`, including HardAttCodebook (cosine
argmax against k-means centroids of SSL features) and SoftAttCodebook.
K-means replaces the reference's sklearn dependency with a jit-friendly
Lloyd's iteration.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from fscl_tpu.nn.embeddings import SoftMultiAttCodebook, SoftMultiAttCodebook2


@partial(jax.jit, static_argnames=("k", "iters"))
def kmeans(x: jnp.ndarray, k: int, iters: int = 20,
           seed: int = 0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Lloyd's k-means over (N, D): returns (centroids (k, D), assignments).

    Replaces sklearn.cluster.KMeans used to build codebook centroids
    (phoneme_embedding.py k-means centroid loaders)."""
    N, D = x.shape
    rng = jax.random.PRNGKey(seed)
    init_idx = jax.random.choice(rng, N, (k,), replace=False)
    centroids = x[init_idx]

    def step(centroids, _):
        d = jnp.sum((x[:, None, :] - centroids[None]) ** 2, axis=-1)
        assign = jnp.argmin(d, axis=-1)
        sums = jax.ops.segment_sum(x, assign, num_segments=k)
        counts = jax.ops.segment_sum(jnp.ones(N), assign, num_segments=k)
        new = jnp.where(counts[:, None] > 0,
                        sums / jnp.maximum(counts, 1.0)[:, None],
                        centroids)
        return new, None

    centroids, _ = jax.lax.scan(step, centroids, None, length=iters)
    d = jnp.sum((x[:, None, :] - centroids[None]) ** 2, axis=-1)
    return centroids, jnp.argmin(d, axis=-1)


class HardAttCodebook(nn.Module):
    """Cosine-argmax matching against (k-means) centroid banks
    (phoneme_embedding.py HardAttCodebook): each phoneme query snaps to the
    nearest centroid's learned embedding."""
    codebook_size: int = 128
    dim: int = 256
    upstream_dim: int = 1024

    @nn.compact
    def __call__(self, queries, centroids=None, need_weights: bool = False):
        """queries: (n_symbols, upstream_dim); centroids: fixed att banks
        (codebook_size, upstream_dim) — k-means output or learned."""
        emb_banks = self.param(
            "emb_banks", nn.initializers.normal(1.0),
            (self.codebook_size, self.dim))
        if centroids is None:
            centroids = self.param(
                "att_banks", nn.initializers.normal(1.0),
                (self.codebook_size, self.upstream_dim))
        qn = queries / (jnp.linalg.norm(queries, axis=-1, keepdims=True) + 1e-8)
        cn = centroids / (jnp.linalg.norm(centroids, axis=-1, keepdims=True) + 1e-8)
        sim = qn @ cn.T                              # (n_symbols, codebook)
        idx = jnp.argmax(sim, axis=-1)
        table = jnp.take(emb_banks, idx, axis=0)
        # zero symbols with no signal (all-zero query)
        has_signal = jnp.any(queries != 0, axis=-1, keepdims=True)
        table = jnp.where(has_signal, table, 0.0)
        if need_weights:
            return table, jax.nn.one_hot(idx, self.codebook_size)
        return table, None


class SoftAttCodebook(nn.Module):
    """Single-head soft attention variant (phoneme_embedding.py
    SoftAttCodebook)."""
    codebook_size: int = 128
    dim: int = 256
    upstream_dim: int = 1024
    temperature: Optional[float] = None

    @nn.compact
    def __call__(self, queries, need_weights: bool = False):
        temp = self.temperature if self.temperature is not None else self.dim ** 0.5
        emb_banks = self.param("emb_banks", nn.initializers.normal(1.0),
                               (self.codebook_size, self.dim))
        att_banks = self.param("att_banks", nn.initializers.normal(1.0),
                               (self.codebook_size, self.upstream_dim))
        scores = queries @ att_banks.T / temp
        attn = jax.nn.softmax(scores, axis=-1)
        table = attn @ emb_banks
        return (table, attn) if need_weights else (table, None)


class PhonemeEmbeddingHub:
    """Mode registry (phoneme_embedding.py PhonemeEmbedding.get_new_embedding):
    "table" -> plain learned table; "hard" -> HardAttCodebook;
    "soft" -> SoftAttCodebook; "soft-m" -> SoftMultiAttCodebook(2)."""

    MODES = ("table", "table-sep", "hard", "soft", "soft-m", "soft-m2")

    @staticmethod
    def build(mode: str, codebook_size: int = 128, dim: int = 256,
              upstream_dim: int = 1024, n_layers: int = 25):
        if mode in ("table", "table-sep"):
            return None   # MultilingualEmbedding handles plain tables
        if mode == "hard":
            return HardAttCodebook(codebook_size, dim, upstream_dim)
        if mode == "soft":
            return SoftAttCodebook(codebook_size, dim, upstream_dim)
        if mode == "soft-m":
            return SoftMultiAttCodebook(codebook_size, dim)
        if mode == "soft-m2":
            return SoftMultiAttCodebook2(
                codebook_size=codebook_size, dim=dim,
                upstream_dim=upstream_dim, n_layers=n_layers)
        raise NotImplementedError(mode)

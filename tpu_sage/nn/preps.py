"""Prep classes: how raw node ids/features become layer-0 inputs.

Reference surface (``nn_modules.py``, SURVEY.md §2.1 "Prep classes"):
``IdentityPrep`` (raw features), ``NodeEmbeddingPrep`` (learned per-node
embedding — transductive; optionally concatenated with features), and
``LinearPrep`` (linear projection of features). Registered in ``prep_lookup``
by the same flag strings the reference CLI uses.

Preps take ``(ids, x)`` where ``x`` is that level's *already gathered* feature
rows (``feats[ids]`` on a single device; a halo-exchange ``dist_gather`` in
partitioned mode — see tpu_sage.dist). Keeping the gather outside the module
is what lets the same network run replicated or node-sharded unchanged; only
``NodeEmbeddingPrep`` touches ids directly (its table is replicated).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn


class IdentityPrep(nn.Module):
    """Pass gathered raw features through unchanged."""

    n_nodes: int = 0
    embedding_dim: int = 0  # unused; uniform ctor surface across preps

    @nn.compact
    def __call__(self, ids: jnp.ndarray, x: Optional[jnp.ndarray]) -> jnp.ndarray:
        if x is None:
            raise ValueError("IdentityPrep requires node features")
        return x


class LinearPrep(nn.Module):
    """Linear projection of raw features: ``out = feats[ids] @ W``.

    The reference uses a bias-free ``nn.Linear`` here (SURVEY.md §2.1 — exact
    bias presence is a §8 verify item; bias-free kept as default, flag to
    flip).
    """

    n_nodes: int = 0
    embedding_dim: int = 64  # projection width
    use_bias: bool = False

    @nn.compact
    def __call__(self, ids: jnp.ndarray, x: Optional[jnp.ndarray]) -> jnp.ndarray:
        if x is None:
            raise ValueError("LinearPrep requires node features")
        return nn.Dense(self.embedding_dim, use_bias=self.use_bias, name="fc")(x)


class NodeEmbeddingPrep(nn.Module):
    """Learned per-node embedding, optionally concatenated with raw features.

    Transductive (embeddings exist only for training-time nodes); mirrors the
    reference's ``NodeEmbeddingPrep`` (SURVEY.md §2.1). With features present,
    output is ``concat([feats[ids], E[ids]])``; without, just ``E[ids]``.
    """

    n_nodes: int
    embedding_dim: int = 64

    @nn.compact
    def __call__(self, ids: jnp.ndarray, x: Optional[jnp.ndarray]) -> jnp.ndarray:
        emb = nn.Embed(self.n_nodes, self.embedding_dim, name="embedding")(ids)
        if x is None:
            return emb
        return jnp.concatenate([x, emb], axis=-1)


prep_lookup = {
    "identity": IdentityPrep,
    "linear": LinearPrep,
    "node_embedding": NodeEmbeddingPrep,
}

"""Aggregator modules: combine a node's vector with its sampled neighborhood.

Reference surface (``nn_modules.py``, SURVEY.md §2.1): mean / max-pool /
mean-pool / LSTM / attention aggregators, all sharing the combine idiom

    out = activation(concat(W_self · x_self, W_neigh · summarize(x_neigh)))

so the output width is ``2 * output_dim`` (each branch projects to
``output_dim``). The exact concat-vs-add variant is a SURVEY §8 verify item;
``combine='concat'`` is the default and ``'add'`` is available (paper-style
single-width output). A ``'gcn'`` aggregator (paper variant: no separate self
branch) is included beyond the reference surface.

TPU notes: every aggregator is (batched matmul over the flattened level) +
(reduction over the fanout axis) — XLA fuses the elementwise tail into the
matmul epilogue and tiles the matmuls onto the MXU. The LSTM aggregator is a
``flax.linen.RNN``/``lax.scan`` over the fanout axis (≤ 25 steps, fully
on-chip; replaces the reference's cuDNN LSTM — SURVEY.md §2.2).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax.numpy as jnp
import flax.linen as nn


Activation = Optional[Callable[[jnp.ndarray], jnp.ndarray]]
Dtype = Any  # compute dtype; params stay float32 (flax param_dtype default)


def _finish_combine(
    h_self: jnp.ndarray,
    h_neigh: jnp.ndarray,
    combine: str,
    activation: Activation,
) -> jnp.ndarray:
    """Shared combine tail: concat or add the two projected branches."""
    if combine == "concat":
        out = jnp.concatenate([h_self, h_neigh], axis=-1)
    elif combine == "add":
        out = h_self + h_neigh
    else:
        raise ValueError(f"unknown combine: {combine}")
    return out if activation is None else activation(out)


class MeanAggregator(nn.Module):
    """``concat(W_self·x, W_neigh·mean(neighbors))`` (SURVEY.md §2.1).

    setup-style so the two projections are addressable individually: the
    fused first-layer path (``GSSupervised.fuse_first_layer``) projects the
    *whole* feature table once per step and gathers in output space —
    projection and mean commute, so the math is identical while the dominant
    HBM gather shrinks by ``feat_dim / output_dim`` (measured 2.76 ms → see
    model.py).
    """

    output_dim: int
    activation: Activation = nn.relu
    combine: str = "concat"
    use_bias: bool = False
    hidden_dim: int = 0  # unused; uniform ctor surface
    dtype: Dtype = None

    def setup(self):
        self.fc_self = nn.Dense(self.output_dim, use_bias=self.use_bias,
                                dtype=self.dtype, name="fc_self")
        self.fc_neigh = nn.Dense(self.output_dim, use_bias=self.use_bias,
                                 dtype=self.dtype, name="fc_neigh")

    def _finish(self, h_self: jnp.ndarray, h_neigh: jnp.ndarray) -> jnp.ndarray:
        return _finish_combine(h_self, h_neigh, self.combine, self.activation)

    def __call__(self, x_self: jnp.ndarray, x_neigh: jnp.ndarray) -> jnp.ndarray:
        return self.combine_from_summary(
            x_self, self.neigh_summary(x_self, x_neigh), x_neigh.shape[1]
        )

    def project_table(self, table: jnp.ndarray):
        """Project every node's features through both branches (fused path)."""
        return self.fc_self(table), self.fc_neigh(table)

    def combine_projected(self, h_self: jnp.ndarray, pn_neigh: jnp.ndarray) -> jnp.ndarray:
        """Finish from pre-projected self rows and mean of pre-projected
        neighbor rows (projection ∘ mean == mean ∘ projection)."""
        return self._finish(h_self, jnp.mean(pn_neigh, axis=1))

    def neigh_summary(self, x_self: jnp.ndarray, x_neigh: jnp.ndarray) -> jnp.ndarray:
        """Per-root neighborhood summary (root-aligned — the fused
        deepest-level path computes it per gather chunk)."""
        del x_self
        return jnp.mean(x_neigh, axis=1)

    def combine_from_summary(
        self, x_self: jnp.ndarray, summary: jnp.ndarray, fanout: int
    ) -> jnp.ndarray:
        """Finish from the PRE-COMPUTED neighborhood summary (fused
        deepest-level gather+summarize path); the mean aggregator consumes
        it directly — ``fanout`` is only needed by reduces that span self
        too (GCN)."""
        del fanout
        return self._finish(self.fc_self(x_self), self.fc_neigh(summary))


class PoolAggregator(nn.Module):
    """Per-neighbor MLP then an elementwise pool over the fanout axis.

    ``MaxPoolAggregator`` / ``MeanPoolAggregator`` below fix ``pool``. The
    per-neighbor MLP is a single Dense+ReLU of width ``hidden_dim`` (paper's
    pooling architecture; reference default hidden 512 — SURVEY.md §2.1).
    """

    output_dim: int
    pool: str = "max"
    hidden_dim: int = 512
    activation: Activation = nn.relu
    combine: str = "concat"
    use_bias: bool = True
    dtype: Dtype = None

    def setup(self):
        # setup-style (param tree identical to the prior nn.compact names)
        # so the fused deepest-level path can call neigh_summary per chunk
        self.mlp = nn.Dense(self.hidden_dim, dtype=self.dtype, name="mlp")
        self.fc_self = nn.Dense(self.output_dim, use_bias=self.use_bias,
                                dtype=self.dtype, name="fc_self")
        self.fc_neigh = nn.Dense(self.output_dim, use_bias=self.use_bias,
                                 dtype=self.dtype, name="fc_neigh")

    def neigh_summary(self, x_self: jnp.ndarray, x_neigh: jnp.ndarray) -> jnp.ndarray:
        del x_self
        h = nn.relu(self.mlp(x_neigh))                   # (B, F, H)
        if self.pool == "max":
            return jnp.max(h, axis=1)
        if self.pool == "mean":
            return jnp.mean(h, axis=1)
        raise ValueError(f"unknown pool: {self.pool}")

    def combine_from_summary(
        self, x_self: jnp.ndarray, summary: jnp.ndarray, fanout: int
    ) -> jnp.ndarray:
        del fanout
        return _finish_combine(
            self.fc_self(x_self), self.fc_neigh(summary),
            self.combine, self.activation,
        )

    def __call__(self, x_self: jnp.ndarray, x_neigh: jnp.ndarray) -> jnp.ndarray:
        return self.combine_from_summary(
            x_self, self.neigh_summary(x_self, x_neigh), x_neigh.shape[1]
        )


class MaxPoolAggregator(PoolAggregator):
    pool: str = "max"


class MeanPoolAggregator(PoolAggregator):
    pool: str = "mean"


class _LSTMRecurrent(nn.Module):
    """Recurrent half of the hoisted LSTM: consumes precomputed input-gate
    pre-activations per step and applies ONE fused ``(H, 4H)`` recurrent
    projection (the OptimizedLSTMCell trick), biased, orthogonal init.
    Gate order i, f, g, o."""

    hidden_dim: int
    dtype: Dtype = None

    @nn.compact
    def __call__(self, carry, xz):
        c, h = carry
        z = xz + nn.Dense(
            4 * self.hidden_dim, use_bias=True, dtype=self.dtype,
            kernel_init=nn.initializers.orthogonal(), name="hz",
        )(h)
        i, f, g, o = jnp.split(z, 4, axis=-1)
        i, f, o = nn.sigmoid(i), nn.sigmoid(f), nn.sigmoid(o)
        g = jnp.tanh(g)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (c, h), None


class _HoistedLSTM(nn.Module):
    """Hoisted-input LSTM over the fanout axis; returns the final hidden
    state. Input projections for ALL gates run as one (B·F, D)×(D, 4H)
    matmul over the whole sequence; the scan carries only the recurrent
    half."""

    hidden_dim: int
    dtype: Dtype = None

    @nn.compact
    def __call__(self, seq):
        xz = nn.Dense(4 * self.hidden_dim, use_bias=False, dtype=self.dtype,
                      name="xz")(seq)          # (B, F, 4H)
        xz = jnp.swapaxes(xz, 0, 1)            # (F, B, 4H)
        cell = nn.scan(
            _LSTMRecurrent,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=0, out_axes=0,
        )(self.hidden_dim, dtype=self.dtype, name="cell")
        h0 = jnp.zeros((seq.shape[0], self.hidden_dim), seq.dtype)
        (_, h), _ = cell((h0, h0), xz)
        return h


class LSTMAggregator(nn.Module):
    """LSTM over the sampled-neighbor sequence; final hidden state summarizes.

    The neighbor order is already random (sampling is i.i.d.), matching the
    paper's "LSTM over a random permutation" trick. Parity tests must fix
    neighbor order (SURVEY.md §7.3 #5). Replaces the reference's cuDNN LSTM
    (SURVEY.md §2.2) the way cuDNN itself does it: the input projections of
    all four gates are HOISTED out of the recurrence — one large
    ``(B·F, D)×(D, H)`` MXU matmul per gate over the whole sequence — and the
    ``lax.scan`` carries only the (H, H) recurrent half. At fanout 25/602-dim
    features this removes 25 small serial matmuls from the critical path.
    """

    output_dim: int
    hidden_dim: int = 512
    activation: Activation = nn.relu
    combine: str = "concat"
    use_bias: bool = True
    dtype: Dtype = None

    def setup(self):
        # setup-style (param tree identical to the prior nn.compact names:
        # "lstm"/{"xz","cell"}, "fc_self", "fc_neigh") so the fused
        # deepest-level path can call neigh_summary per chunk
        self.lstm = _HoistedLSTM(hidden_dim=self.hidden_dim, dtype=self.dtype,
                                 name="lstm")
        self.fc_self = nn.Dense(self.output_dim, use_bias=self.use_bias,
                                dtype=self.dtype, name="fc_self")
        self.fc_neigh = nn.Dense(self.output_dim, use_bias=self.use_bias,
                                 dtype=self.dtype, name="fc_neigh")

    def neigh_summary(self, x_self: jnp.ndarray, x_neigh: jnp.ndarray) -> jnp.ndarray:
        del x_self
        return self.lstm(x_neigh)

    def combine_from_summary(
        self, x_self: jnp.ndarray, summary: jnp.ndarray, fanout: int
    ) -> jnp.ndarray:
        del fanout
        return _finish_combine(
            self.fc_self(x_self), self.fc_neigh(summary),
            self.combine, self.activation,
        )

    def __call__(self, x_self: jnp.ndarray, x_neigh: jnp.ndarray) -> jnp.ndarray:
        return self.combine_from_summary(
            x_self, self.neigh_summary(x_self, x_neigh), x_neigh.shape[1]
        )


class AttentionAggregator(nn.Module):
    """Softmax attention of the self vector over neighbor vectors.

    bkj extension beyond the paper (SURVEY.md §2.1, presence [K-med]):
    ``α = softmax(⟨q(x_self), k(neighbors)⟩)``; summary ``Σ α·v(neighbors)``.
    """

    output_dim: int
    hidden_dim: int = 32  # attention key width
    activation: Activation = nn.relu
    combine: str = "concat"
    use_bias: bool = False
    dtype: Dtype = None

    def setup(self):
        # setup-style (param tree identical to the prior nn.compact names)
        # so the fused deepest-level path can call neigh_summary per chunk
        self.att_q = nn.Dense(self.hidden_dim, use_bias=False,
                              dtype=self.dtype, name="att_q")
        self.att_k = nn.Dense(self.hidden_dim, use_bias=False,
                              dtype=self.dtype, name="att_k")
        self.fc_self = nn.Dense(self.output_dim, use_bias=self.use_bias,
                                dtype=self.dtype, name="fc_self")
        self.fc_neigh = nn.Dense(self.output_dim, use_bias=self.use_bias,
                                 dtype=self.dtype, name="fc_neigh")

    def neigh_summary(self, x_self: jnp.ndarray, x_neigh: jnp.ndarray) -> jnp.ndarray:
        # the softmax spans only each root's own fanout group, so the
        # summary stays root-aligned (chunkable) despite needing x_self
        q = self.att_q(x_self)                                     # (B, K)
        k = self.att_k(x_neigh)                                    # (B, F, K)
        scores = jnp.einsum("bk,bfk->bf", q, k) / jnp.sqrt(float(self.hidden_dim))
        alpha = nn.softmax(scores, axis=-1)                        # (B, F)
        return jnp.einsum("bf,bfd->bd", alpha, x_neigh)

    def combine_from_summary(
        self, x_self: jnp.ndarray, summary: jnp.ndarray, fanout: int
    ) -> jnp.ndarray:
        del fanout
        return _finish_combine(
            self.fc_self(x_self), self.fc_neigh(summary),
            self.combine, self.activation,
        )

    def __call__(self, x_self: jnp.ndarray, x_neigh: jnp.ndarray) -> jnp.ndarray:
        return self.combine_from_summary(
            x_self, self.neigh_summary(x_self, x_neigh), x_neigh.shape[1]
        )


class GCNAggregator(nn.Module):
    """Paper's GCN variant: single projection of mean(self ∪ neighbors).

    No separate self branch; output width is ``output_dim`` (not doubled).
    Beyond the bkj surface — included for paper parity (Hamilton et al. §3).
    """

    output_dim: int
    activation: Activation = nn.relu
    combine: str = "concat"  # ignored; GCN has one branch
    use_bias: bool = True
    hidden_dim: int = 0
    dtype: Dtype = None

    def setup(self):
        # setup-style (param tree identical to the prior nn.compact "fc")
        # so __call__ and combine_prereduced share the projection
        self.fc = nn.Dense(self.output_dim, use_bias=self.use_bias,
                           dtype=self.dtype, name="fc")

    def _project(self, summary: jnp.ndarray) -> jnp.ndarray:
        out = self.fc(summary)
        return out if self.activation is None else self.activation(out)

    def __call__(self, x_self: jnp.ndarray, x_neigh: jnp.ndarray) -> jnp.ndarray:
        return self.combine_from_summary(
            x_self, self.neigh_summary(x_self, x_neigh), x_neigh.shape[1]
        )

    def neigh_summary(self, x_self: jnp.ndarray, x_neigh: jnp.ndarray) -> jnp.ndarray:
        del x_self
        return jnp.mean(x_neigh, axis=1)

    def combine_from_summary(
        self, x_self: jnp.ndarray, summary: jnp.ndarray, fanout: int
    ) -> jnp.ndarray:
        """Finish from the PRE-COMPUTED per-root neighbor mean (the fused
        deepest-level gather+mean path): GCN's reduce spans self ∪ neighbors,
        so the pre-computed neighbor mean re-enters with weight ``fanout``:
        ``mean(self ∪ N) = (x_self + fanout·mean(N)) / (fanout + 1)``."""
        return self._project((x_self + fanout * summary) / (fanout + 1))


aggregator_lookup = {
    "mean": MeanAggregator,
    "max_pool": MaxPoolAggregator,
    "mean_pool": MeanPoolAggregator,
    "lstm": LSTMAggregator,
    "attention": AttentionAggregator,
    "gcn": GCNAggregator,
}

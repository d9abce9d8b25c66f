"""The supervised GraphSAGE model (reference: ``models.py::GSSupervised``).

Architecture per SURVEY.md §3.2: sampling builds a static-shape neighborhood
tree (done *outside* the network — see ``tpu_sage.sample``); the network
prepares level-0..L features with a shared prep module, then collapses the
tree top-down with one aggregator per layer (that layer's weights applied at
every remaining depth), L2-normalizes the final embedding, and applies a
linear classifier head.

Everything is static-shape; the whole forward is one traced XLA computation —
gathers, matmuls, fanout-axis reductions — with no python control flow
dependent on data.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from tpu_sage import overrides
from tpu_sage.nn.aggregators import aggregator_lookup
from tpu_sage.nn.preps import prep_lookup
from tpu_sage.ops import row_gather, row_gather_chunked, row_gather_fanout_mean
from tpu_sage.sample.sampler import sample_tree


def _l2_normalize(x: jnp.ndarray, eps: float = 1e-24) -> jnp.ndarray:
    """Row-wise L2 normalization with a NaN-safe BACKWARD at zero rows.

    ``x / max(||x||, eps)`` is safe in the forward but its backward is not:
    when a row is exactly zero the ``max`` zeroes the norm's cotangent, yet
    sqrt's local derivative at 0 is inf and ``0 * inf = NaN`` poisons every
    upstream kernel gradient (hit in practice by bucketed-halo overflow
    fallback rows, which can make a whole embedding row exactly zero).
    ``x * rsqrt(sum(x²) + eps)`` has finite derivatives everywhere; the eps
    is below f32 resolution for any non-degenerate row, so values (and the
    torch-parity tests) are unchanged, and zero rows map to zero with zero
    gradient instead of NaN.
    """
    sq = jnp.sum(jnp.square(x), axis=-1, keepdims=True)
    return x * jax.lax.rsqrt(sq + eps)

activation_lookup = {
    "relu": nn.relu,
    "elu": nn.elu,
    "tanh": jnp.tanh,
    "identity": None,
    None: None,
}


@dataclasses.dataclass(frozen=True)
class LayerSpec:
    """One aggregation layer (reference ``train.py`` builds these from flags).

    ``n_train_samples`` / ``n_val_samples`` are the fanouts used during
    training vs evaluation (reference defaults 25,10 train; larger at val —
    SURVEY.md §2.4 #3).
    """

    n_train_samples: int = 25
    n_val_samples: int = 25
    output_dim: int = 128
    activation: Optional[str] = "relu"


def default_layer_specs(
    fanouts: Sequence[int] = (25, 10),
    val_fanouts: Optional[Sequence[int]] = None,
    output_dims: Sequence[int] = (128, 128),
) -> Tuple[LayerSpec, ...]:
    """The reference's canonical 2-layer spec: fanout (25, 10), dims (128, 128),
    ReLU on all but the last layer."""
    if val_fanouts is None:
        val_fanouts = fanouts
    n = len(fanouts)
    return tuple(
        LayerSpec(
            n_train_samples=int(f),
            n_val_samples=int(v),
            output_dim=int(d),
            activation="relu" if i < n - 1 else "identity",
        )
        for i, (f, v, d) in enumerate(zip(fanouts, val_fanouts, output_dims))
    )


class GSSupervised(nn.Module):
    """Supervised GraphSAGE: prep → L aggregation passes → normalize → head.

    Call with the per-level flat id arrays from ``sample_tree`` (or injected
    tables, for parity tests) and the full feature array.
    """

    layer_specs: Tuple[LayerSpec, ...]
    n_classes: int
    aggregator_class: str = "mean"
    prep_class: str = "identity"
    n_nodes: int = 0
    embedding_dim: int = 64
    combine: str = "concat"
    normalize: bool = True
    agg_hidden_dim: int = 512
    dtype: Optional[str] = None  # compute dtype ('bfloat16' for speed); params stay f32
    fuse_first_layer: bool = False  # project the feature table once per step
    # (mean aggregator + identity prep only): projection and fanout-mean
    # commute, so gathering happens in output_dim space instead of feat_dim
    # space — the dominant HBM gather shrinks by feat_dim/output_dim.
    #
    # Measured-perf knobs (TrainConfig fields of the same names; the
    # TPU_SAGE_* env vars in tpu_sage.overrides remain whole-program A/B
    # overrides):
    gather_form: Optional[str] = None  # None = per-aggregator policy (encode);
    # "plain" | "masked" | "masked_chunked" (masked non-deepest levels,
    # chunked — the round-5 unsupervised winner candidate)
    gather_form_deep: Optional[str] = None  # deepest fused level's form
    # override ("plain" | "masked"); None = follow gather_form's base
    gather_chunks: int = 10            # descriptor-stream overlap chunk count
    fuse_last: str = "auto"            # deepest-level fused gather+summary:
    # "auto" (on, except lstm — measured loss), "off", "all" (force incl. lstm)
    int8_summean: bool = True          # int8 tables: int32-sum then one dequant

    def setup(self):
        dtype = jnp.dtype(self.dtype) if self.dtype else None
        prep_cls = prep_lookup[self.prep_class]
        self.prep = prep_cls(n_nodes=self.n_nodes, embedding_dim=self.embedding_dim)
        agg_cls = aggregator_lookup[self.aggregator_class]
        self.agg_layers = [
            agg_cls(
                output_dim=spec.output_dim,
                activation=activation_lookup[spec.activation],
                combine=self.combine,
                hidden_dim=self.agg_hidden_dim,
                dtype=dtype,
            )
            for spec in self.layer_specs
        ]
        self.fc = nn.Dense(self.n_classes, dtype=dtype, name="fc")

    def encode(self, levels: List[jnp.ndarray], feats: Optional[jnp.ndarray]) -> jnp.ndarray:
        """Collapse the neighborhood tree into per-root embeddings ``(B, D)``.

        ``feats`` is the full (replicated) feature table; the per-level gather
        happens here. For node-sharded features use ``encode_gathered`` with
        halo-exchanged rows (tpu_sage.dist)."""
        if (
            self.fuse_first_layer
            and self.aggregator_class == "mean"
            and self.prep_class == "identity"
            and feats is not None
            and len(self.layer_specs) >= 1
        ):
            return self._encode_fused(levels, feats)
        # The gather lowering is "plain" + chunked for every aggregator since
        # round 3: at 8+ gather chunks the descriptor-stream overlap dominates
        # and plain-everywhere measures 61.46M edges/s on the mean headline
        # vs 59.70M masked-everywhere (same-session A/B, bench_logs/r3_form*)
        # — reversing round 2d, where the mean path won with "masked"
        # (gather forced to materialize, 4 unchunked levels). "masked" stays
        # reachable via gather_form for A/B; it keeps the round-2d shape
        # (one unchunked gather per non-deepest level — chunking masked RAW
        # rows regressed 36% there, the concat re-materialization forfeits
        # the defusion win).
        form = overrides.gather_form(self.gather_form) or "plain"
        # round-5 split: the whole-program form conflated two independent
        # choices — the NON-deepest levels' lowering and the deepest fused
        # level's. "masked_chunked" chunks the masked non-deepest gathers
        # (the unsup tree's 153,600-row L1 level is one serial descriptor
        # stream under plain "masked" — bench_logs/r5_unsup_breakdown.log);
        # ``gather_form_deep`` overrides the deepest level independently.
        chunk_masked = form == "masked_chunked"
        base_form = "masked" if chunk_masked else form
        deep_form = self.gather_form_deep or base_form
        if base_form == "masked" and not chunk_masked:
            gather = row_gather
        else:
            gather = lambda t, i, form: row_gather_chunked(
                t, i, form=form, n_chunks=self.gather_chunks
            )
        # The DEEPEST level's rows have a single consumer — the first
        # aggregation pass's per-root neighborhood summary (fanout mean /
        # pooled MLP / attention / LSTM final state), and every summary is
        # root-aligned — so with an ids-blind prep, gather and summarize
        # fuse per chunk: the chunk concat shrinks from the raw rows to the
        # (n_roots, summary_dim) summaries, keeping the descriptor-stream
        # overlap without the raw-row re-materialization. mean/gcn take the
        # linear fast path (ops.row_gather_fanout_mean, masked/plain form
        # per the round-2d policy); the rest summarize per chunk through
        # the first aggregator's neigh_summary.
        # fuse_last="off" restores the round-2e behavior (full last-level
        # gather, summary inside the aggregator) for whole-program A/B.
        # LSTM is excluded by measurement under "auto": its per-chunk
        # summaries run the recurrent scan once PER CHUNK and the serial
        # chains don't overlap — 6.23M fused vs 6.73M unfused edges/s at
        # hidden 512, the one aggregator where the fusion loses
        # (bench_logs/r2g_agg_lstm*). fuse_last="all" forces it everywhere.
        fl = overrides.fuse_last(self.fuse_last)
        fuse_last = (
            feats is not None
            and self.prep_class == "identity"
            and len(levels) >= 2
            and fl != "off"
            and (self.aggregator_class != "lstm" or fl == "all")
        )
        gathered = [
            None if feats is None else gather(feats, ids, form=base_form)
            for ids in (levels[:-1] if fuse_last else levels)
        ]
        if not fuse_last:
            return self.encode_gathered(levels, gathered)
        fanout = levels[-1].shape[0] // levels[-2].shape[0]
        if self.aggregator_class in ("mean", "gcn"):
            gathered.append(
                row_gather_fanout_mean(
                    feats, levels[-1], fanout, form=deep_form,
                    n_chunks=self.gather_chunks,
                    int8_summean=self.int8_summean,
                )
            )
        else:
            gathered.append(
                self._deepest_summary(levels, gathered[-1], feats, fanout,
                                      deep_form)
            )
        return self.encode_gathered(levels, gathered, last_reduced_fanout=fanout)

    def _deepest_summary(
        self,
        levels: List[jnp.ndarray],
        x_self_rows: jnp.ndarray,
        feats: jnp.ndarray,
        fanout: int,
        form: str,
    ) -> jnp.ndarray:
        """Per-chunk gather + neighborhood summary for the deepest level.

        Chunks are root-aligned (each root's whole fanout group lives in one
        chunk), so any per-root summary — pooled MLP, attention (its softmax
        spans only the root's own group), LSTM over the group — computes
        exactly per chunk; the concat re-materializes only the summaries.
        ``x_self_rows`` are the (identity-prep'd) level-(L-1) rows, chunked
        in step (attention's queries)."""
        from tpu_sage.ops import _CHUNK_MIN_ROWS, snap_chunks

        n_chunks = overrides.gather_chunks(self.gather_chunks)
        agg0 = self.agg_layers[0]
        n_roots = levels[-2].shape[0]
        n = levels[-1].shape[0]
        nc = (
            n_chunks
            if n_chunks > 1 and n >= _CHUNK_MIN_ROWS and n_roots >= n_chunks
            else 1
        )
        # equal-sized chunks only: a ragged tail chunk serializes
        # (ops.snap_chunks doc carries the measurements)
        nc = snap_chunks(nc, n_roots) if nc > 1 else 1
        cb = n_roots // nc  # roots per chunk (exact by construction)
        parts = []
        for j in range(nc):
            lo, hi = j * cb, (j + 1) * cb
            rows = row_gather(feats, levels[-1][lo * fanout : hi * fanout], form=form)
            parts.append(
                agg0.neigh_summary(
                    x_self_rows[lo:hi], rows.reshape(hi - lo, fanout, -1)
                )
            )
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)

    def _encode_fused(self, levels: List[jnp.ndarray], feats: jnp.ndarray) -> jnp.ndarray:
        """First aggregation pass via whole-table projection (see class doc).

        The projections run through :func:`tpu_sage.nn.fused.project_gather`,
        whose custom VJP computes ``dW`` from the gathered raw rows instead of
        autodiff's table-sized scatter — this is what makes the fusion viable
        for TRAINING, not just inference. The identity-matrix probe below
        extracts each branch's kernel through the Dense itself (bias-free by
        construction for the mean aggregator), so gradients flow to the
        ordinary ``fc_self``/``fc_neigh`` params and the param tree is
        unchanged."""
        from tpu_sage.nn.fused import project_gather

        agg0 = self.agg_layers[0]
        eye = jnp.eye(feats.shape[1], dtype=feats.dtype)
        w_self = agg0.fc_self(eye)    # == kernel (no bias), autodiff-transparent
        w_neigh = agg0.fc_neigh(eye)
        n_levels = len(levels) - 1
        self_rows = project_gather(feats, w_self, [levels[d] for d in range(n_levels)])
        neigh_rows = project_gather(feats, w_neigh, [levels[d + 1] for d in range(n_levels)])
        h = []
        for d in range(n_levels):
            n_self = levels[d].shape[0]
            neigh = neigh_rows[d].reshape(n_self, -1, neigh_rows[d].shape[-1])
            h.append(agg0.combine_projected(self_rows[d], neigh))
        for agg in self.agg_layers[1:]:
            h = [
                agg(h[d], h[d + 1].reshape(h[d].shape[0], -1, h[d + 1].shape[-1]))
                for d in range(len(h) - 1)
            ]
        out = h[0]
        if self.normalize:
            out = _l2_normalize(out)
        return out

    def encode_gathered(
        self,
        levels: List[jnp.ndarray],
        level_feats: List[Optional[jnp.ndarray]],
        last_reduced_fanout: Optional[int] = None,
    ) -> jnp.ndarray:
        """As ``encode`` but with each level's feature rows already gathered.

        ``last_reduced_fanout``: set when the DEEPEST level's rows arrive
        pre-summarized per root (``(n_roots, summary_dim)`` instead of
        ``(n_roots·fanout, D)`` — the fused gather paths in ``encode`` and
        ``dist/train.gather_level_feats``). The first aggregation pass's
        deepest pairing then goes through ``agg.combine_from_summary``,
        which re-weights reduces that span self too (GCN). Without the flag
        a reduced mean-path level still works via the fanout-1 reshape (the
        axis-1 mean of one element is the identity)."""
        if len(levels) != len(self.layer_specs) + 1:
            raise ValueError(
                f"need {len(self.layer_specs) + 1} tree levels, got {len(levels)}"
            )
        h = [self.prep(ids, x) for ids, x in zip(levels, level_feats)]
        for li, agg in enumerate(self.agg_layers):
            nxt = []
            for d in range(len(h) - 1):
                n_self = h[d].shape[0]
                if li == 0 and d == len(h) - 2 and last_reduced_fanout is not None:
                    nxt.append(
                        agg.combine_from_summary(h[d], h[d + 1], last_reduced_fanout)
                    )
                    continue
                x_neigh = h[d + 1].reshape(n_self, -1, h[d + 1].shape[-1])
                nxt.append(agg(h[d], x_neigh))
            h = nxt
        out = h[0]
        if self.normalize:
            out = _l2_normalize(out)
        return out

    def __call__(self, levels: List[jnp.ndarray], feats: Optional[jnp.ndarray]) -> jnp.ndarray:
        return self.fc(self.encode(levels, feats))

    def forward_gathered(
        self,
        levels: List[jnp.ndarray],
        level_feats: List[Optional[jnp.ndarray]],
        last_reduced_fanout: Optional[int] = None,
    ) -> jnp.ndarray:
        """Logits from pre-gathered level features (partitioned path)."""
        return self.fc(
            self.encode_gathered(levels, level_feats, last_reduced_fanout)
        )

    # -- convenience -------------------------------------------------------

    def fanouts(self, train: bool) -> Tuple[int, ...]:
        return tuple(
            (s.n_train_samples if train else s.n_val_samples) for s in self.layer_specs
        )

    def forward_with_sampling(
        self,
        key: jax.Array,
        graph_adj: jnp.ndarray,
        graph_degrees: jnp.ndarray,
        ids: jnp.ndarray,
        feats: Optional[jnp.ndarray],
        train: bool,
    ) -> jnp.ndarray:
        """Sample the tree then run the network (the reference's
        ``forward(ids, feats, train=)`` contract, SURVEY.md §3.2)."""
        levels = sample_tree(key, graph_adj, graph_degrees, ids, self.fanouts(train))
        return self(levels, feats)

"""Full-graph layer-wise inference: exact embeddings for EVERY node.

Serving-oriented capability beyond the reference: at inference time there is
no reason to sample — each GraphSAGE layer can be evaluated over the whole
graph at once (the standard layer-wise inference trick). Per layer, for every
node: summarize ALL its (≤ max_degree) neighbors with a mask over padding,
combine with the self vector, activation. Two layers give the same math the
sampled tree converges to in expectation, with zero sampling variance — the
right mode for production scoring and for exporting embedding tables.

Memory is bounded by chunking the node axis: each chunk materializes
``(chunk, max_degree, d)`` gathered neighbor rows. Everything is a jit'd
``lax.map`` over chunks — static shapes, on-device end to end.

Supports every permutation-invariant aggregator exactly: linear summaries
(mean, gcn), pools (masked max/mean over all neighbors), and softmax
attention (masked scores over all neighbors — the softmax is permutation-
invariant, so the exact limit of the sampled semantics exists just as for
mean). LSTM is order/subset-dependent by construction and keeps its sampled
semantics — ``embed_all_nodes`` raises for it.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from tpu_sage.graph.graph_data import DeviceGraph
from tpu_sage.nn.model import GSSupervised


def _chunk_combine(model, params, layer_idx, neigh, d_chunk, h_self):
    """One chunk of one layer from already-materialized neighbor rows.

    ``neigh`` (chunk, max_deg, d) comes from a local ``h[rows]`` on the
    single-device path or a halo ``dist_gather`` on the sharded path — the
    masked-summary math is identical. Masked summaries mirror the aggregator
    math over ALL true neighbors; degree-0 nodes SELF-LOOP (neighbor summary
    drawn from the node itself), matching the sampled path's padding
    semantics — the model was trained with that behavior (graph_data.py
    padding idiom)."""
    chunk, max_deg = neigh.shape[:2]
    mask = (
        jax.lax.broadcasted_iota(jnp.int32, (chunk, max_deg), 1)
        < d_chunk[:, None]
    )
    agg_name = model.aggregator_class
    sub = {"params": params["params"][f"agg_layers_{layer_idx}"]}
    isolated = d_chunk[:, None] == 0
    dtype = h_self.dtype
    if agg_name in ("mean", "gcn"):
        denom = jnp.maximum(d_chunk[:, None], 1).astype(dtype)
        summary = jnp.where(mask[:, :, None], neigh, 0).sum(axis=1) / denom
        summary = jnp.where(isolated, h_self, summary)
        if agg_name == "gcn":
            # gcn summarizes mean(self ∪ neighbors); isolated → self
            summary = jnp.where(
                isolated, h_self, (summary * denom + h_self) / (denom + 1.0)
            )
        return _combine_with_params(model, layer_idx, sub, h_self, summary, agg_name)
    if agg_name in ("max_pool", "mean_pool"):
        mlp_out = _dense(sub, "mlp", neigh)
        mlp_out = jax.nn.relu(mlp_out)
        self_mlp = jax.nn.relu(_dense(sub, "mlp", h_self))  # self-loop fallback
        if agg_name == "max_pool":
            neg = jnp.finfo(mlp_out.dtype).min
            summary = jnp.where(mask[:, :, None], mlp_out, neg).max(axis=1)
        else:
            denom = jnp.maximum(d_chunk[:, None], 1).astype(dtype)
            summary = jnp.where(mask[:, :, None], mlp_out, 0).sum(axis=1) / denom
        summary = jnp.where(isolated, self_mlp, summary)
        return _combine_with_params(model, layer_idx, sub, h_self, summary, agg_name)
    if agg_name == "attention":
        # softmax attention over ALL true neighbors — permutation-invariant,
        # so the exact limit of the sampled semantics exists just as for
        # mean (train on a sampled multiset, evaluate on the full set);
        # padding columns get -inf scores, isolated nodes self-loop
        q = _dense(sub, "att_q", h_self)                     # (chunk, K)
        k = _dense(sub, "att_k", neigh)                      # (chunk, max_deg, K)
        key_dim = q.shape[-1]
        scores = jnp.einsum("bk,bfk->bf", q, k) / jnp.sqrt(float(key_dim))
        scores = jnp.where(mask, scores, jnp.finfo(scores.dtype).min)
        alpha = jax.nn.softmax(scores, axis=-1)
        summary = jnp.einsum("bf,bfd->bd", alpha, neigh)
        # all-masked rows softmax to uniform garbage — the self-loop
        # override (sampled-path padding semantics) replaces them
        summary = jnp.where(isolated, h_self, summary)
        return _combine_with_params(model, layer_idx, sub, h_self, summary, agg_name)
    raise ValueError(f"full-graph inference unsupported for {agg_name}")


def _layer_full(
    model, params, layer_idx: int, h: jnp.ndarray, graph: DeviceGraph, chunk: int
) -> jnp.ndarray:
    """Apply aggregation layer ``layer_idx`` to every node. ``h``: (n, d)."""
    n = graph.n_nodes
    max_deg = graph.max_degree
    pad = (-n) % chunk
    adj = jnp.concatenate([graph.adj, jnp.zeros((pad, max_deg), jnp.int32)]) if pad else graph.adj
    deg = jnp.concatenate([graph.degrees, jnp.zeros((pad,), jnp.int32)]) if pad else graph.degrees
    n_chunks = adj.shape[0] // chunk

    def one_chunk(args):
        rows, d_chunk, h_self = args           # (chunk, max_deg), (chunk,), (chunk, d)
        neigh = h[rows]                         # (chunk, max_deg, d)
        return _chunk_combine(model, params, layer_idx, neigh, d_chunk, h_self)

    rows_c = adj.reshape(n_chunks, chunk, max_deg)
    deg_c = deg.reshape(n_chunks, chunk)
    h_pad = jnp.concatenate([h, jnp.zeros((pad, h.shape[1]), h.dtype)]) if pad else h
    h_c = h_pad.reshape(n_chunks, chunk, h.shape[1])
    out = jax.lax.map(one_chunk, (rows_c, deg_c, h_c))
    return out.reshape(-1, out.shape[-1])[:n]


def _dense(sub, name, x):
    p = sub["params"][name]
    out = x @ p["kernel"]
    if "bias" in p:
        out = out + p["bias"]
    return out


def _combine_with_params(model, layer_idx, sub, h_self, summary, agg_name):
    from tpu_sage.nn.model import activation_lookup

    spec = model.layer_specs[layer_idx]
    act = activation_lookup[spec.activation]
    if agg_name == "gcn":
        out = _dense(sub, "fc", summary)
    else:
        hs = _dense(sub, "fc_self", h_self)
        hn = _dense(sub, "fc_neigh", summary)
        out = jnp.concatenate([hs, hn], axis=-1) if model.combine == "concat" else hs + hn
    return out if act is None else act(out)


@partial(jax.jit, static_argnums=(0, 3, 4))
def _embed_jit(model, params, graph, chunk, with_head):
    h = graph.feats
    if hasattr(h, "dequantize"):  # int8 table: layerwise matmuls need dense
        h = h.dequantize()
    elif (getattr(graph, "feat_scale", None) is not None
          and jnp.issubdtype(h.dtype, jnp.integer)):
        # raw-int8 DeviceGraph form (graph_data contract: feats int8 +
        # feat_scale set — the partitioned path's layout); running the
        # matmuls on raw integers would be silently wrong (round-5 review).
        # Float feats with feat_scale=ones (the uniform-signature case) skip
        # the multiply to keep the compute dtype untouched.
        h = h.astype(graph.feat_scale.dtype) * graph.feat_scale
    if model.prep_class == "linear":
        h = _dense({"params": params["params"]["prep"]}, "fc", h)
    elif model.prep_class == "node_embedding":
        emb = params["params"]["prep"]["embedding"]["embedding"]
        h = jnp.concatenate([h, emb], axis=-1)
    for layer_idx in range(len(model.layer_specs)):
        h = _layer_full(model, params, layer_idx, h, graph, chunk)
    if model.normalize:
        from tpu_sage.nn.model import _l2_normalize

        h = _l2_normalize(h)
    if with_head:
        h = _dense(params, "fc", h)
    return h


EXACT_AGGREGATORS = ("mean", "gcn", "max_pool", "mean_pool", "attention")


def _check_exact_supported(model: GSSupervised) -> None:
    if model.aggregator_class not in EXACT_AGGREGATORS:
        raise ValueError(
            f"full-graph inference needs a permutation-invariant aggregator "
            f"over all neighbors; {model.aggregator_class!r} is sample-defined"
        )


def exact_supported(model: GSSupervised) -> bool:
    """True when this model admits exact (variance-free) layer-wise
    inference — every permutation-invariant aggregator (linear summaries,
    pools, and softmax attention over the full masked neighbor set); LSTM is
    sample/order-defined by construction and keeps sampled semantics."""
    return model.aggregator_class in EXACT_AGGREGATORS


def embed_all_nodes(
    model: GSSupervised,
    params,
    graph: DeviceGraph,
    chunk: int = 4096,
    with_head: bool = False,
) -> jnp.ndarray:
    """Exact embeddings (or logits with ``with_head``) for all nodes."""
    _check_exact_supported(model)
    return _embed_jit(model, params, graph, chunk, with_head)


def embed_all_nodes_partitioned(
    model: GSSupervised,
    params,
    graph: DeviceGraph,   # node-sharded (dist.partition.shard_graph, train=False)
    mesh,
    axis="data",
    chunk: int = 2048,
    with_head: bool = False,
) -> jnp.ndarray:
    """Exact layer-wise inference over a NODE-SHARDED graph.

    The single-device ``embed_all_nodes`` holds the whole activation table
    ``h`` on one chip; a graph big enough to need ``--partitioned`` training
    cannot be exported that way. Here ``h`` stays sharded: per layer, each
    shard walks its local nodes in chunks and fetches the (chunk·max_degree)
    neighbor activations by halo exchange (``dist_gather`` — exact, same
    collectives as training), then applies the identical masked-summary math
    (``_chunk_combine``). Everything static-shape; the chunk loop is a
    ``lax.map`` with the collective inside (uniform trip count on every
    shard, since shards are equal-sized by construction).

    Returns the global ``(n_padded, out_dim)`` array (sharded over ``axis``;
    rows past ``store.n_nodes`` are partition padding — slice them off).
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from tpu_sage.dist.halo import dist_gather

    from tpu_sage.dist.mesh import axis_size

    _check_exact_supported(model)
    names = (axis,) if isinstance(axis, str) else tuple(axis)
    n_shards = axis_size(mesh, axis)

    # One compiled program per (model, mesh, axis, chunk, with_head):
    # params enter as a jit ARGUMENT, not a closure constant — closing over
    # them forced a full retrace + XLA recompile on EVERY call (each
    # exact-val epoch paid the multi-layer full-graph compile; round-5
    # review). The single-device twin always had this via _embed_jit's
    # static_argnums.
    cache_key = (model, mesh, names, chunk, with_head)
    cached = _partitioned_embed_cache.get(cache_key)
    if cached is not None:
        return cached(params, graph.adj, graph.degrees, graph.feats,
                      graph.feat_scale)

    def shard_embed(params, adj, deg, feats, fscale):
        m, max_deg = adj.shape
        h = feats.astype(fscale.dtype) * fscale  # dequant (ones when dense)
        if model.prep_class == "linear":
            h = _dense({"params": params["params"]["prep"]}, "fc", h)
        elif model.prep_class == "node_embedding":
            emb = params["params"]["prep"]["embedding"]["embedding"]
            # pad the (n_nodes, D) table to n_shards·m so the LAST shard's
            # slice stays aligned (dynamic_slice clamps the start otherwise,
            # silently shifting real nodes' embedding rows)
            epad = n_shards * m - emb.shape[0]
            if epad:
                emb = jnp.concatenate(
                    [emb, jnp.zeros((epad, emb.shape[1]), emb.dtype)]
                )
            my = jax.lax.axis_index(names if len(names) > 1 else names[0])
            local_emb = jax.lax.dynamic_slice(
                emb, (my * m, 0), (m, emb.shape[1])
            )
            h = jnp.concatenate([h, local_emb], axis=-1)
        pad = (-m) % chunk
        adj_p = jnp.concatenate([adj, jnp.zeros((pad, max_deg), adj.dtype)]) if pad else adj
        deg_p = jnp.concatenate([deg, jnp.zeros((pad,), deg.dtype)]) if pad else deg
        n_chunks = adj_p.shape[0] // chunk

        for layer_idx in range(len(model.layer_specs)):
            def one_chunk(args, h=h, layer_idx=layer_idx):
                rows, d_chunk, h_self = args
                neigh = dist_gather(h, rows.reshape(-1), axis).reshape(
                    chunk, max_deg, -1
                )
                return _chunk_combine(
                    model, params, layer_idx, neigh, d_chunk, h_self
                )

            h_p = jnp.concatenate([h, jnp.zeros((pad, h.shape[1]), h.dtype)]) if pad else h
            out = jax.lax.map(one_chunk, (
                adj_p.reshape(n_chunks, chunk, max_deg),
                deg_p.reshape(n_chunks, chunk),
                h_p.reshape(n_chunks, chunk, h.shape[1]),
            ))
            h = out.reshape(-1, out.shape[-1])[:m]
        if model.normalize:
            from tpu_sage.nn.model import _l2_normalize

            h = _l2_normalize(h)
        if with_head:
            h = _dense(params, "fc", h)
        return h

    spec = P(axis) if isinstance(axis, str) else P(tuple(axis))
    mapped = shard_map(
        shard_embed, mesh=mesh,
        in_specs=(P(), spec, spec, spec, P()),  # params replicated
        out_specs=spec, check_vma=False,
    )
    fn = jax.jit(mapped)
    _partitioned_embed_cache[cache_key] = fn
    return fn(params, graph.adj, graph.degrees, graph.feats,
              graph.feat_scale)


_partitioned_embed_cache = {}

"""Full-graph layer-wise inference vs a dense numpy oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_sage.data.synthetic import sbm_store
from tpu_sage.nn.full_graph import embed_all_nodes
from tpu_sage.train.trainer import TrainConfig, build_model


def _numpy_reference(store, params, combine_act=True):
    """Dense mean-aggregator 2-layer forward over all nodes (numpy)."""
    p = jax.tree_util.tree_map(np.asarray, params)["params"]
    h = store.feats.astype(np.float64)
    for li in range(2):
        pl = p[f"agg_layers_{li}"]
        summary = np.zeros_like(h)
        for v in range(store.n_nodes):
            d = store.degrees[v]
            if d > 0:
                summary[v] = h[store.adj[v, :d]].mean(axis=0)
            else:
                summary[v] = h[v]  # sampled-path self-loop semantics
        hs = h @ pl["fc_self"]["kernel"]
        hn = summary @ pl["fc_neigh"]["kernel"]
        out = np.concatenate([hs, hn], axis=-1)
        if li == 0:
            out = np.maximum(out, 0)
        h = out
    h = h / np.maximum(np.linalg.norm(h, axis=-1, keepdims=True), 1e-12)
    return h


def test_full_graph_mean_matches_dense_oracle():
    store = sbm_store(n_nodes=120, n_classes=3, feat_dim=8, avg_degree=5,
                      max_degree=16, seed=17)
    # force an isolated node to exercise the self-loop fallback
    store.degrees[7] = 0
    store.adj[7] = 7
    store.train_degrees[7] = 0
    store.train_adj[7] = 7
    cfg = TrainConfig(n_train_samples=(4, 3), n_val_samples=(4, 3),
                      output_dims=(16, 16))
    model = build_model(cfg, store.n_nodes, store.n_classes)
    graph = store.to_device(train=False)
    levels = [jnp.zeros((4,), jnp.int32), jnp.zeros((16,), jnp.int32),
              jnp.zeros((48,), jnp.int32)]
    params = model.init(jax.random.key(0), levels, graph.feats)

    out = np.asarray(embed_all_nodes(model, params, graph, chunk=32))
    ref = _numpy_reference(store, params)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_full_graph_logits_and_pool():
    store = sbm_store(n_nodes=100, n_classes=3, feat_dim=8, max_degree=8, seed=18)
    cfg = TrainConfig(n_train_samples=(4, 3), n_val_samples=(4, 3),
                      output_dims=(16, 16), aggregator_class="max_pool",
                      agg_hidden_dim=16)
    model = build_model(cfg, store.n_nodes, store.n_classes)
    graph = store.to_device(train=False)
    levels = [jnp.zeros((4,), jnp.int32), jnp.zeros((16,), jnp.int32),
              jnp.zeros((48,), jnp.int32)]
    params = model.init(jax.random.key(1), levels, graph.feats)
    logits = embed_all_nodes(model, params, graph, chunk=25, with_head=True)
    assert logits.shape == (100, 3)
    assert np.isfinite(np.asarray(logits)).all()


def _numpy_attention_reference(store, params, key_dim):
    """Dense attention-aggregator 2-layer forward over all nodes (numpy):
    per node, softmax(q(self)·k(neighbors)/sqrt(K)) over ALL true neighbors,
    summary = alpha-weighted neighbor sum; isolated nodes self-loop."""
    p = jax.tree_util.tree_map(np.asarray, params)["params"]
    h = store.feats.astype(np.float64)
    for li in range(2):
        pl = p[f"agg_layers_{li}"]
        q = h @ pl["att_q"]["kernel"]
        k = h @ pl["att_k"]["kernel"]
        summary = np.zeros_like(h)
        for v in range(store.n_nodes):
            d = store.degrees[v]
            if d > 0:
                nbr = store.adj[v, :d]
                s = (k[nbr] @ q[v]) / np.sqrt(float(key_dim))
                a = np.exp(s - s.max())
                a = a / a.sum()
                summary[v] = a @ h[nbr]
            else:
                summary[v] = h[v]
        hs = h @ pl["fc_self"]["kernel"]
        hn = summary @ pl["fc_neigh"]["kernel"]
        out = np.concatenate([hs, hn], axis=-1)
        if li == 0:
            out = np.maximum(out, 0)
        h = out
    return h / np.maximum(np.linalg.norm(h, axis=-1, keepdims=True), 1e-12)


def test_full_graph_attention_matches_dense_oracle():
    """Exact inference extends to attention (softmax over the full masked
    neighbor set is permutation-invariant — same exact-limit argument as
    mean); isolated nodes exercise the self-loop override, where the
    all-masked softmax would otherwise produce uniform garbage."""
    store = sbm_store(n_nodes=120, n_classes=3, feat_dim=8, avg_degree=5,
                      max_degree=16, seed=21)
    store.degrees[11] = 0
    store.adj[11] = 11
    store.train_degrees[11] = 0
    store.train_adj[11] = 11
    cfg = TrainConfig(n_train_samples=(4, 3), n_val_samples=(4, 3),
                      output_dims=(16, 16), aggregator_class="attention",
                      agg_hidden_dim=16)
    model = build_model(cfg, store.n_nodes, store.n_classes)
    graph = store.to_device(train=False)
    levels = [jnp.zeros((4,), jnp.int32), jnp.zeros((16,), jnp.int32),
              jnp.zeros((48,), jnp.int32)]
    params = model.init(jax.random.key(2), levels, graph.feats)

    out = np.asarray(embed_all_nodes(model, params, graph, chunk=32))
    ref = _numpy_attention_reference(store, params, key_dim=16)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_full_graph_rejects_sample_defined_aggregators():
    store = sbm_store(n_nodes=60, n_classes=3, feat_dim=8, max_degree=8, seed=19)
    cfg = TrainConfig(n_train_samples=(4, 3), n_val_samples=(4, 3),
                      output_dims=(16, 16), aggregator_class="lstm",
                      agg_hidden_dim=8)
    model = build_model(cfg, store.n_nodes, store.n_classes)
    graph = store.to_device(train=False)
    with pytest.raises(ValueError, match="sample-defined"):
        embed_all_nodes(model, None, graph)


@pytest.mark.parametrize("agg", ["mean", "gcn", "max_pool", "attention"])
def test_partitioned_full_graph_matches_single_device(agg):
    """Sharded exact inference (halo-gathered activations, VERDICT r2 #7)
    equals the single-device embed_all_nodes on the same graph/params —
    per layer the masked-summary math is shared, only the neighbor-row
    fetch differs (dist_gather vs local h[rows])."""
    from tpu_sage.dist.mesh import make_mesh
    from tpu_sage.dist.partition import shard_graph
    from tpu_sage.nn.full_graph import embed_all_nodes_partitioned

    mesh = make_mesh()
    store = sbm_store(n_nodes=120, n_classes=3, feat_dim=8, avg_degree=5,
                      max_degree=16, seed=19)
    cfg = TrainConfig(n_train_samples=(4, 3), n_val_samples=(4, 3),
                      output_dims=(16, 16), aggregator_class=agg,
                      agg_hidden_dim=16)
    model = build_model(cfg, store.n_nodes, store.n_classes)
    graph = store.to_device(train=False)
    levels = [jnp.zeros((4,), jnp.int32), jnp.zeros((16,), jnp.int32),
              jnp.zeros((48,), jnp.int32)]
    params = model.init(jax.random.key(0), levels, graph.feats)

    want = np.asarray(embed_all_nodes(model, params, graph, chunk=32,
                                      with_head=True))
    sharded, m = shard_graph(store, mesh, train=False)
    got = np.asarray(embed_all_nodes_partitioned(
        model, params, sharded, mesh, chunk=8, with_head=True
    ))[: store.n_nodes]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_partitioned_full_graph_2d_mesh_and_int8():
    """The sharded exact path also runs over the 2-D (host, chip) mesh and
    over int8 feature shards (dequantized at layer 0)."""
    from tpu_sage.dist.mesh import make_mesh
    from tpu_sage.dist.partition import shard_graph
    from tpu_sage.nn.full_graph import embed_all_nodes_partitioned

    store = sbm_store(n_nodes=96, n_classes=3, feat_dim=8, avg_degree=5,
                      max_degree=8, seed=20)
    cfg = TrainConfig(n_train_samples=(4, 3), n_val_samples=(4, 3),
                      output_dims=(16, 16))
    model = build_model(cfg, store.n_nodes, store.n_classes)
    graph = store.to_device(train=False)
    levels = [jnp.zeros((4,), jnp.int32), jnp.zeros((16,), jnp.int32),
              jnp.zeros((48,), jnp.int32)]
    params = model.init(jax.random.key(0), levels, graph.feats)
    want = np.asarray(embed_all_nodes(model, params, graph, chunk=16))

    mesh2d = make_mesh(axis_names=("host", "chip"), shape=(2, 4))
    sharded, _ = shard_graph(store, mesh2d, train=False,
                             axis=("host", "chip"))
    got2d = np.asarray(embed_all_nodes_partitioned(
        model, params, sharded, mesh2d, axis=("host", "chip"), chunk=8
    ))[: store.n_nodes]
    np.testing.assert_allclose(got2d, want, rtol=1e-4, atol=1e-5)

    mesh = make_mesh()
    sharded8, _ = shard_graph(store, mesh, train=False, quantize=True)
    got8 = np.asarray(embed_all_nodes_partitioned(
        model, params, sharded8, mesh, chunk=8
    ))[: store.n_nodes]
    # int8 storage is lossy; the layerwise math on dequantized rows must
    # stay close to the dense run
    np.testing.assert_allclose(got8, want, rtol=0.1, atol=0.05)


def test_embed_all_nodes_raw_int8_feat_scale():
    """The raw-int8 DeviceGraph form (feats int8 + feat_scale set — the
    partitioned layout, graph_data contract) must be dequantized by
    embed_all_nodes, not fed to the matmuls as integers (round-5 review:
    the check only covered the QuantizedFeats wrapper)."""
    import dataclasses

    store = sbm_store(n_nodes=100, n_classes=3, feat_dim=8, max_degree=8,
                      seed=21)
    cfg = TrainConfig(n_train_samples=(4, 3), n_val_samples=(4, 3),
                      output_dims=(16, 16))
    model = build_model(cfg, store.n_nodes, store.n_classes)
    graph = store.to_device(train=False, quantize=True)
    q = graph.feats  # QuantizedFeats wrapper: .q int8, .scale (D,)
    levels = [jnp.zeros((4,), jnp.int32), jnp.zeros((16,), jnp.int32),
              jnp.zeros((48,), jnp.int32)]
    params = model.init(jax.random.key(0), levels, q.dequantize())

    want = np.asarray(embed_all_nodes(model, params, graph, chunk=32))
    raw = dataclasses.replace(graph, feats=q.q, feat_scale=q.scale)
    got = np.asarray(embed_all_nodes(model, params, raw, chunk=32))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_partitioned_embed_program_is_cached():
    """embed_all_nodes_partitioned must reuse one compiled program across
    calls with different PARAM VALUES (round-5 review: params were closed
    over, forcing a retrace + full recompile every exact-val epoch)."""
    from tpu_sage.dist.mesh import make_mesh
    from tpu_sage.dist.partition import shard_graph
    from tpu_sage.nn.full_graph import (_partitioned_embed_cache,
                                        embed_all_nodes_partitioned)

    mesh = make_mesh()
    store = sbm_store(n_nodes=96, n_classes=3, feat_dim=8, avg_degree=5,
                      max_degree=8, seed=22)
    cfg = TrainConfig(n_train_samples=(4, 3), n_val_samples=(4, 3),
                      output_dims=(16, 16))
    model = build_model(cfg, store.n_nodes, store.n_classes)
    graph = store.to_device(train=False)
    levels = [jnp.zeros((4,), jnp.int32), jnp.zeros((16,), jnp.int32),
              jnp.zeros((48,), jnp.int32)]
    params = model.init(jax.random.key(0), levels, graph.feats)
    sharded, _ = shard_graph(store, mesh, train=False)

    _partitioned_embed_cache.clear()
    a = np.asarray(embed_all_nodes_partitioned(model, params, sharded, mesh,
                                               chunk=8))
    assert len(_partitioned_embed_cache) == 1
    fn = next(iter(_partitioned_embed_cache.values()))
    traced_once = fn._cache_size()
    p2 = jax.tree.map(lambda x: x * 1.5, params)
    b = np.asarray(embed_all_nodes_partitioned(model, p2, sharded, mesh,
                                               chunk=8))
    # same compiled program (no retrace), different params -> different out
    assert len(_partitioned_embed_cache) == 1
    assert fn._cache_size() == traced_once == 1
    assert not np.allclose(a, b)


@pytest.mark.parametrize("prep", ["linear", "node_embedding"])
def test_partitioned_full_graph_preps(prep):
    """Sharded exact inference with the non-identity preps — in particular
    node_embedding on a node count NOT divisible by the shard count (the
    last shard's embedding slice must stay aligned, not clamp-shift)."""
    from tpu_sage.dist.mesh import make_mesh
    from tpu_sage.dist.partition import shard_graph
    from tpu_sage.nn.full_graph import embed_all_nodes_partitioned

    mesh = make_mesh()
    n = 115  # 8 shards of 15 -> 5 padding rows on the last shard
    store = sbm_store(n_nodes=n, n_classes=3, feat_dim=8, avg_degree=5,
                      max_degree=8, seed=21)
    cfg = TrainConfig(n_train_samples=(4, 3), n_val_samples=(4, 3),
                      output_dims=(16, 16), prep_class=prep,
                      embedding_dim=8)
    model = build_model(cfg, store.n_nodes, store.n_classes)
    graph = store.to_device(train=False)
    levels = [jnp.zeros((4,), jnp.int32), jnp.zeros((16,), jnp.int32),
              jnp.zeros((48,), jnp.int32)]
    params = model.init(jax.random.key(0), levels, graph.feats)

    want = np.asarray(embed_all_nodes(model, params, graph, chunk=16))
    sharded, _ = shard_graph(store, mesh, train=False)
    got = np.asarray(embed_all_nodes_partitioned(
        model, params, sharded, mesh, chunk=8
    ))[:n]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

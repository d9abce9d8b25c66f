"""Distributed tests on the 8-device CPU mesh (SURVEY.md §4.2 #4).

The partitioned sampler/halo-exchange must return results identical to the
single-device gather; partitioned training must run and converge.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from tpu_sage.data.synthetic import sbm_store
from tpu_sage.dist.halo import dist_gather, dist_gather_bucketed
from tpu_sage.dist.mesh import make_mesh
from tpu_sage.dist.partition import partition_arrays, shard_fold
from tpu_sage.dist.train import PartitionedTrainer
from tpu_sage.train.trainer import TrainConfig


@pytest.fixture(scope="module")
def mesh(eight_devices):
    return make_mesh()


def _sharded_table(mesh, n_rows, d, seed=0):
    rng = np.random.default_rng(seed)
    table = rng.normal(size=(n_rows, d)).astype(np.float32)
    sh = NamedSharding(mesh, P("data"))
    return table, jax.device_put(jnp.asarray(table), sh)


def test_dist_gather_exact(mesh):
    n, d, q = 64, 16, 40  # 8 rows per shard
    table, table_d = _sharded_table(mesh, n, d)
    rng = np.random.default_rng(1)
    ids = rng.integers(0, n, size=(8, q)).astype(np.int32)  # per-shard queries
    ids_d = jax.device_put(jnp.asarray(ids.reshape(-1)), NamedSharding(mesh, P("data")))

    out = shard_map(
        lambda t, i: dist_gather(t, i, "data"),
        mesh=mesh, in_specs=(P("data"), P("data")), out_specs=P("data"),
        check_vma=False,
    )(table_d, ids_d)
    np.testing.assert_array_equal(np.asarray(out), table[ids.reshape(-1)])


@pytest.mark.parametrize("mode", ["exact", "ring", "bucketed"])
def test_dist_gather_fanout_mean_matches_local(mesh, mode):
    """Fused halo gather + per-root fanout mean equals the local
    gather-then-mean for every halo mode, float and int8-like tables."""
    from tpu_sage.dist.train import make_gather_last

    n, d, fanout, n_roots = 64, 16, 5, 8  # q = 40 per shard
    table, table_d = _sharded_table(mesh, n, d, seed=4)
    rng = np.random.default_rng(5)
    ids = rng.integers(0, n, size=(8, n_roots * fanout)).astype(np.int32)
    ids_d = jax.device_put(
        jnp.asarray(ids.reshape(-1)), NamedSharding(mesh, P("data"))
    )
    gl = make_gather_last(mode, 8, capacity_factor=float(n_roots * fanout))

    out = shard_map(
        lambda t, i: gl(t, i, fanout, "data")[0],
        mesh=mesh, in_specs=(P("data"), P("data")), out_specs=P("data"),
        check_vma=False,
    )(table_d, ids_d)
    want = table[ids.reshape(-1)].reshape(8 * n_roots, fanout, d).mean(axis=1)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-5, atol=1e-5)

    # int8 shard (quantized feature storage): fused mean must promote
    int8_table = rng.integers(-100, 100, size=(n, d)).astype(np.int8)
    t8_d = jax.device_put(jnp.asarray(int8_table), NamedSharding(mesh, P("data")))
    out8 = shard_map(
        lambda t, i: gl(t, i, fanout, "data")[0],
        mesh=mesh, in_specs=(P("data"), P("data")), out_specs=P("data"),
        check_vma=False,
    )(t8_d, ids_d)
    want8 = (
        int8_table[ids.reshape(-1)]
        .astype(np.float32)
        .reshape(8 * n_roots, fanout, d)
        .mean(axis=1)
    )
    assert out8.dtype == jnp.float32
    # per-shard partial means reassociate the f32 sum; bound is looser
    np.testing.assert_allclose(np.asarray(out8), want8, rtol=1e-5, atol=1e-5)


def test_dist_gather_bucketed_exact_capacity(mesh):
    n, d, q = 64, 8, 24
    table, table_d = _sharded_table(mesh, n, d, seed=2)
    rng = np.random.default_rng(3)
    ids = rng.integers(0, n, size=(8, q)).astype(np.int32)
    ids_d = jax.device_put(jnp.asarray(ids.reshape(-1)), NamedSharding(mesh, P("data")))

    out, overflow = shard_map(
        lambda t, i: dist_gather_bucketed(t, i, "data", n_shards=8, capacity=q),
        mesh=mesh, in_specs=(P("data"), P("data")),
        out_specs=(P("data"), P("data")), check_vma=False,
    )(table_d, ids_d)
    assert int(np.asarray(overflow).sum()) == 0
    np.testing.assert_array_equal(np.asarray(out), table[ids.reshape(-1)])


def test_dist_gather_bucketed_overflow_masks(mesh):
    """With capacity 1 and all queries hitting shard 0: shard 0's own
    queries take the LOCAL BYPASS (exact, no capacity charge); each remote
    shard gets its first query served and the rest overflow to zeros."""
    n, d, q = 64, 8, 4
    table, table_d = _sharded_table(mesh, n, d, seed=4)
    ids = np.zeros((8, q), dtype=np.int32)  # every query wants row 0 (shard 0)
    ids_d = jax.device_put(jnp.asarray(ids.reshape(-1)), NamedSharding(mesh, P("data")))

    out, overflow = shard_map(
        lambda t, i: dist_gather_bucketed(t, i, "data", n_shards=8, capacity=1),
        mesh=mesh, in_specs=(P("data"), P("data")),
        out_specs=(P("data"), P("data")), check_vma=False,
    )(table_d, ids_d)
    out = np.asarray(out).reshape(8, q, d)
    overflow = np.asarray(overflow)
    # shard 0 owns row 0: all q of its queries are local-bypass exact
    np.testing.assert_array_equal(out[0], np.broadcast_to(table[0], (q, d)))
    # remote shards: first query served exactly, remaining q-1 overflow
    for s in range(1, 8):
        np.testing.assert_array_equal(out[s, 0], table[0])
        assert (out[s, 1:] == 0).all()
    assert overflow.sum() == 7 * (q - 1)


def test_partition_arrays_padding():
    store = sbm_store(n_nodes=100, n_classes=3, feat_dim=8, seed=5)
    arrays, m = partition_arrays(store, 8, train=False)
    assert m == 13 and arrays["adj"].shape[0] == 104
    # padding rows: self-loop, degree 0, zero feats
    assert (arrays["degrees"][100:] == 0).all()
    assert (arrays["adj"][100:] == np.arange(100, 104)[:, None]).all()
    assert (arrays["feats"][100:] == 0).all()


def test_shard_fold_wrap_and_weights():
    fold = np.array([0, 1, 2, 10, 11, 30])  # shards 0,1,3 of 8 (size 10 ea → use 4 shards)
    ids, w = shard_fold(fold, n_shards=4, shard_size=10)
    assert ids.shape == (4, 3)
    # weights are the TRUE per-shard fold counts: loss weight after psum
    # normalization AND the sampling bound (wrapped tail never drawn)
    np.testing.assert_allclose(w, [3.0, 2.0, 0.0, 1.0])
    assert set(ids[0]) == {0, 1, 2}
    assert set(ids[1]) == {10, 11}  # wrapped
    assert set(ids[3]) == {30}


def test_epoch_batch_ids_exact_uniform_and_cycling():
    """Per-epoch permutation batching: within one epoch each real fold node
    is drawn the same number of times ±1 (no wrap-tile bias); across epochs
    the order changes; padding slots are never drawn."""
    from tpu_sage.dist.train import epoch_batch_ids

    fold_row = jnp.asarray([5, 6, 7, 5, 5], jnp.int64)  # 3 real + wrapped tail
    count = jnp.float32(3.0)
    key = jax.random.key(0)
    my = jnp.int32(0)
    bps, spe = 2, 4  # 8 draws per epoch over 3 real nodes
    draws = []
    for t in range(spe):
        ids = epoch_batch_ids(key, jnp.int32(t), fold_row, count, bps, spe, my)
        draws.extend(np.asarray(ids).tolist())
    assert set(draws) <= {5, 6, 7}
    counts = {v: draws.count(v) for v in (5, 6, 7)}
    # 8 draws over a cycled 3-perm: counts within ±1 of each other
    assert max(counts.values()) - min(counts.values()) <= 1, counts
    # the first 3 draws of the epoch are a permutation (no replacement)
    assert len(set(draws[:3])) == 3
    # a different epoch reshuffles
    e2 = [
        int(x)
        for t in range(spe)
        for x in np.asarray(
            epoch_batch_ids(key, jnp.int32(spe + t), fold_row, count, bps, spe, my)
        )
    ]
    assert e2 != draws


@pytest.mark.parametrize("agg", ["mean", "gcn"])
def test_partitioned_training_converges(mesh, agg):
    """mean and gcn both route the deepest level through the fused halo
    gather+mean (gcn re-weights the pre-reduced mean via
    combine_from_summary + last_reduced_fanout on the dist path)."""
    store = sbm_store(n_nodes=512, n_classes=4, feat_dim=16, avg_degree=6, seed=6)
    cfg = TrainConfig(batch_size=64, epochs=1, n_train_samples=(5, 3),
                      n_val_samples=(5, 3), output_dims=(32, 32), lr_init=0.01,
                      aggregator_class=agg)
    trainer, graph, fold_ids, fold_w = PartitionedTrainer.from_store(store, cfg, mesh)
    state = trainer.init_state(feat_dim=store.feat_dim)

    losses = []
    for _ in range(30):
        state, metrics = trainer.train_step(state, graph, fold_ids, fold_w)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.7, losses[:3] + losses[-3:]


def test_partitioned_matches_single_device_forward(mesh):
    """Halo-exchanged feature gather == replicated gather for a fixed tree."""
    store = sbm_store(n_nodes=256, n_classes=3, feat_dim=8, seed=7)
    arrays, m = partition_arrays(store, 8, train=False)
    sh = NamedSharding(mesh, P("data"))
    feats_d = jax.device_put(jnp.asarray(arrays["feats"]), sh)

    rng = np.random.default_rng(8)
    ids = rng.integers(0, 256, size=8 * 16).astype(np.int32)
    ids_d = jax.device_put(jnp.asarray(ids), sh)
    out = shard_map(
        lambda t, i: dist_gather(t, i, "data"),
        mesh=mesh, in_specs=(P("data"), P("data")), out_specs=P("data"),
        check_vma=False,
    )(feats_d, ids_d)
    np.testing.assert_array_equal(np.asarray(out), arrays["feats"][ids])


def test_partitioned_eval_matches_fold_exactly(mesh):
    """Partitioned masked evaluation counts every fold node exactly once and
    produces a sane accuracy on a trained model."""
    store = sbm_store(n_nodes=512, n_classes=4, feat_dim=16, avg_degree=8,
                      feat_noise=0.5, seed=9)
    cfg = TrainConfig(batch_size=64, epochs=1, n_train_samples=(5, 3),
                      n_val_samples=(5, 3), output_dims=(32, 32), lr_init=0.01)
    trainer, graph, fold_ids, fold_w = PartitionedTrainer.from_store(store, cfg, mesh)
    state = trainer.init_state(feat_dim=store.feat_dim)
    for _ in range(40):
        state, _ = trainer.train_step(state, graph, fold_ids, fold_w)
    acc = trainer.evaluate(state, store, fold="val")
    assert 0.5 < acc <= 1.0, acc


def test_replica_debug_utils():
    from tpu_sage.dist.debug import assert_replicas_equal, tree_fingerprint

    fp = tree_fingerprint({"a": jnp.ones((3,)), "b": jnp.arange(4.0)})
    assert np.isfinite(float(fp))
    assert_replicas_equal({"x": jnp.ones(2)})  # single-process no-op


def test_partitioned_training_bucketed_halo(mesh):
    """Capacity-routed halo exchange also trains (overflow → graceful
    fallback); convergence within a slightly looser bound."""
    store = sbm_store(n_nodes=512, n_classes=4, feat_dim=16, avg_degree=6, seed=12)
    cfg = TrainConfig(batch_size=64, epochs=1, n_train_samples=(5, 3),
                      n_val_samples=(5, 3), output_dims=(32, 32), lr_init=0.01,
                      halo="bucketed", halo_capacity_factor=4.0)
    trainer, graph, fold_ids, fold_w = PartitionedTrainer.from_store(store, cfg, mesh)
    state = trainer.init_state(feat_dim=store.feat_dim)
    losses = []
    for _ in range(30):
        state, metrics = trainer.train_step(state, graph, fold_ids, fold_w)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.8, losses[:3] + losses[-3:]


def test_dist_gather_ring_exact(mesh):
    from tpu_sage.dist.halo import dist_gather_ring

    n, d, q = 64, 16, 24
    table, table_d = _sharded_table(mesh, n, d, seed=20)
    rng = np.random.default_rng(21)
    ids = rng.integers(0, n, size=(8, q)).astype(np.int32)
    ids_d = jax.device_put(jnp.asarray(ids.reshape(-1)), NamedSharding(mesh, P("data")))
    out = shard_map(
        lambda t, i: dist_gather_ring(t, i, "data", n_shards=8),
        mesh=mesh, in_specs=(P("data"), P("data")), out_specs=P("data"),
        check_vma=False,
    )(table_d, ids_d)
    np.testing.assert_array_equal(np.asarray(out), table[ids.reshape(-1)])


def test_partitioned_training_ring_halo(mesh):
    store = sbm_store(n_nodes=512, n_classes=4, feat_dim=16, avg_degree=6, seed=22)
    cfg = TrainConfig(batch_size=64, epochs=1, n_train_samples=(5, 3),
                      n_val_samples=(5, 3), output_dims=(32, 32), lr_init=0.01,
                      halo="ring")
    trainer, graph, fold_ids, fold_w = PartitionedTrainer.from_store(store, cfg, mesh)
    state = trainer.init_state(feat_dim=store.feat_dim)
    losses = []
    for _ in range(30):
        state, metrics = trainer.train_step(state, graph, fold_ids, fold_w)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.7, losses[:3] + losses[-3:]


def test_partitioned_train_epoch_scan(mesh):
    """Scanned multi-step partitioned path matches the per-step path's
    convergence behavior in one dispatch."""
    store = sbm_store(n_nodes=512, n_classes=4, feat_dim=16, avg_degree=6, seed=30)
    cfg = TrainConfig(batch_size=64, epochs=1, n_train_samples=(5, 3),
                      n_val_samples=(5, 3), output_dims=(32, 32), lr_init=0.01)
    trainer, graph, fold_ids, fold_w = PartitionedTrainer.from_store(store, cfg, mesh)
    state = trainer.init_state(feat_dim=store.feat_dim)
    state, m0 = trainer.train_epoch(state, graph, fold_ids, fold_w, n_steps=5)
    l0 = float(m0["loss"])
    state, m1 = trainer.train_epoch(state, graph, fold_ids, fold_w, n_steps=25)
    l1 = float(m1["loss"])
    assert np.isfinite([l0, l1]).all()
    assert l1 < l0, (l0, l1)
    assert int(state.step) == 30


def test_degree_balanced_reorder():
    """Reordering balances edges across shards and preserves graph semantics."""
    from tpu_sage.dist.partition import (degree_balanced_permutation,
                                         reorder_store)

    # heavily skewed graph: first 64 nodes have degree ~16, rest ~1
    rng = np.random.default_rng(33)
    n = 256
    src = np.concatenate([np.repeat(np.arange(64), 16),
                          np.arange(64, n)])
    dst = rng.integers(0, n, len(src))
    edges = np.stack([src, dst], 1)
    edges = edges[edges[:, 0] != edges[:, 1]]
    from tpu_sage.data.convert import from_edgelist

    feats = rng.normal(size=(n, 8)).astype(np.float32)
    targets = rng.integers(0, 3, n)
    folds = {"train": np.arange(0, 200), "val": np.arange(200, 230),
             "test": np.arange(230, 256)}
    store = from_edgelist(edges, feats, targets, folds, max_degree=16)

    n_shards = 4
    m = -(-n // n_shards)
    # contiguous partition: shard 0 owns all heavy nodes
    before = [store.degrees[s * m:(s + 1) * m].sum() for s in range(n_shards)]
    perm = degree_balanced_permutation(store.degrees, n_shards)
    store2 = reorder_store(store, perm)
    after = [store2.degrees[s * m:(s + 1) * m].sum() for s in range(n_shards)]
    assert max(after) - min(after) < max(before) - min(before)
    assert max(after) / max(np.mean(after), 1) < 1.3  # near-balanced

    # semantics preserved: total edges, per-node neighborhoods up to relabel
    assert store2.degrees.sum() == store.degrees.sum()
    inv = np.empty(n, dtype=np.int64)
    inv[perm] = np.arange(n)
    for old in rng.choice(n, 20, replace=False):
        new = inv[old]
        d = store.degrees[old]
        assert store2.degrees[new] == d
        old_nbrs = set(store.adj[old, :d].tolist())
        new_nbrs = {int(perm[x]) for x in store2.adj[new, :d]}
        assert new_nbrs == old_nbrs
    # folds relabeled consistently: same targets multiset per fold
    for f in ("train", "val", "test"):
        a = np.sort(store.targets[store.folds[f]])
        b = np.sort(store2.targets[store2.folds[f]])
        np.testing.assert_array_equal(a, b)


def test_reordered_store_trains_partitioned(mesh):
    from tpu_sage.dist.partition import (degree_balanced_permutation,
                                         reorder_store)

    store = sbm_store(n_nodes=512, n_classes=4, feat_dim=16, avg_degree=6, seed=35)
    store = reorder_store(store, degree_balanced_permutation(store.degrees, 8))
    cfg = TrainConfig(batch_size=64, epochs=1, n_train_samples=(5, 3),
                      n_val_samples=(5, 3), output_dims=(32, 32), lr_init=0.01)
    trainer, graph, fold_ids, fold_w = PartitionedTrainer.from_store(store, cfg, mesh)
    state = trainer.init_state(feat_dim=store.feat_dim)
    state, m0 = trainer.train_epoch(state, graph, fold_ids, fold_w, n_steps=25)
    assert np.isfinite(float(m0["loss"]))
    acc = trainer.evaluate(state, store, fold="val")
    assert acc > 0.5


def test_fit_partitioned_end_to_end(mesh):
    from tpu_sage.dist.train import fit_partitioned

    store = sbm_store(n_nodes=512, n_classes=4, feat_dim=16, avg_degree=8,
                      feat_noise=0.5, seed=36)
    cfg = TrainConfig(batch_size=64, epochs=3, n_train_samples=(5, 3),
                      n_val_samples=(5, 3), output_dims=(32, 32), lr_init=0.01)
    recs = []
    _, state, hist = fit_partitioned(store, cfg, mesh=mesh, log=recs.append)
    assert hist[-1]["train_loss"] < hist[0]["train_loss"]
    assert hist[-1]["val_metric"] > 0.5
    assert hist[-1]["n_shards"] == 8
    assert any("final_test_metric" in r for r in recs)


def test_partitioned_regression_eval(mesh):
    """Regression trains AND evaluates on the partitioned path (previously
    raised); the partitioned -MSE metric tracks the single-device one."""
    store = sbm_store(n_nodes=512, n_classes=4, feat_dim=16, avg_degree=6,
                      task="regression", seed=41)
    cfg = TrainConfig(batch_size=64, epochs=6, n_train_samples=(5, 3),
                      n_val_samples=(5, 3), output_dims=(32, 32), lr_init=0.01)
    from tpu_sage.dist.train import fit_partitioned

    _, state, hist = fit_partitioned(store, cfg, mesh=mesh, log=lambda d: None)
    assert hist[-1]["train_loss"] < hist[0]["train_loss"]
    # evaluate() no longer raises and returns a finite negated-MSE
    assert "val_metric" in hist[-1]
    assert np.isfinite(hist[-1]["val_metric"])
    assert hist[-1]["val_metric"] <= 0  # -MSE
    # training actually regressed toward the targets (MSE well under var(y))
    var = float(np.var(store.targets[store.folds["val"]]))
    assert -hist[-1]["val_metric"] < var, (hist[-1]["val_metric"], var)


def test_locality_reorder_cuts_cross_shard_edges(mesh):
    """BFS locality ordering must substantially reduce the cross-shard edge
    fraction on a community graph with interleaved natural ids — and the
    reordered store still trains on the partitioned path."""
    from tpu_sage.dist.partition import (edge_cut_fraction,
                                         locality_permutation, reorder_store)

    # strong communities, ids randomly interleaved by sbm_store
    store = sbm_store(n_nodes=512, n_classes=8, feat_dim=16, avg_degree=6,
                      p_in=0.95, seed=44)
    n_shards = 8
    cut_natural = edge_cut_fraction(store, n_shards)
    perm = locality_permutation(store.adj, store.degrees)
    assert sorted(perm.tolist()) == list(range(store.n_nodes))  # permutation
    store2 = reorder_store(store, perm)
    cut_local = edge_cut_fraction(store2, n_shards)
    # interleaved ids put ~7/8 of edges across shards; BFS blocks must
    # recover most of the community locality
    assert cut_natural > 0.7, cut_natural
    assert cut_local < 0.5 * cut_natural, (cut_natural, cut_local)

    # semantics preserved: the reordered store trains and evaluates
    cfg = TrainConfig(batch_size=64, epochs=1, n_train_samples=(5, 3),
                      n_val_samples=(5, 3), output_dims=(32, 32), lr_init=0.01)
    trainer, graph, fold_ids, fold_w = PartitionedTrainer.from_store(
        store2, cfg, mesh)
    state = trainer.init_state(feat_dim=store2.feat_dim)
    state, m0 = trainer.train_epoch(state, graph, fold_ids, fold_w, n_steps=25)
    assert np.isfinite(float(m0["loss"]))
    assert trainer.evaluate(state, store2, fold="val") > 0.5


def test_bucketed_partitioned_training_converges(mesh):
    """Regression: the bucketed halo used to charge LOCAL queries against
    capacity, overflowing the (always-local) batch roots to zero features —
    whose exactly-zero embedding rows then NaN'd the L2-normalize backward.
    Both fixed (halo local bypass; rsqrt-based safe normalize): bucketed
    training must converge with finite losses."""
    store = sbm_store(n_nodes=512, n_classes=4, feat_dim=16, avg_degree=6,
                      seed=21)
    cfg = TrainConfig(batch_size=64, epochs=1, n_train_samples=(5, 3),
                      n_val_samples=(5, 3), output_dims=(32, 32),
                      lr_init=0.01, halo="bucketed")
    trainer, graph, fold_ids, fold_w = PartitionedTrainer.from_store(
        store, cfg, mesh)
    state = trainer.init_state(feat_dim=store.feat_dim)
    losses = []
    for _ in range(30):
        state, m = trainer.train_step(state, graph, fold_ids, fold_w)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0] * 0.7, losses[:3] + losses[-3:]


def test_elastic_resume_across_shard_counts(mesh, tmp_path):
    """Elastic recovery (SURVEY.md §5.3): a checkpoint written by an 8-shard
    run resumes on a 4-shard mesh. Params/opt-state/step are replicated, the
    fold sharding and steps_per_epoch re-derive from the store and batch
    size, so the shard count is a free deployment choice at resume time."""
    from tpu_sage.dist.mesh import make_mesh
    from tpu_sage.dist.train import fit_partitioned

    store = sbm_store(n_nodes=512, n_classes=4, feat_dim=16, avg_degree=8,
                      feat_noise=0.5, seed=51)
    ckpt = str(tmp_path / "elastic.npz")
    cfg2 = TrainConfig(batch_size=64, epochs=2, n_train_samples=(5, 3),
                       n_val_samples=(5, 3), output_dims=(32, 32),
                       lr_init=0.01)
    _, _, hist8 = fit_partitioned(store, cfg2, mesh=mesh, log=lambda d: None,
                                  resume_from=ckpt, checkpoint_every=1)
    assert hist8[-1]["n_shards"] == 8

    cfg4 = TrainConfig(batch_size=64, epochs=4, n_train_samples=(5, 3),
                       n_val_samples=(5, 3), output_dims=(32, 32),
                       lr_init=0.01)
    recs = []
    _, _, hist4 = fit_partitioned(store, cfg4, mesh=make_mesh(n_devices=4),
                                  log=recs.append, resume_from=ckpt)
    # resumed at epoch 2 (after the 8-shard run's last checkpoint), on 4 shards
    assert hist4[0]["epoch"] == 2 and hist4[0]["n_shards"] == 4
    assert np.isfinite([r["train_loss"] for r in hist4]).all()
    # training continues from the 8-shard optimum, not from scratch
    assert hist4[0]["train_loss"] < hist8[0]["train_loss"] * 0.9
    assert hist4[-1]["val_metric"] > 0.5


def test_halo_auto_resolution(mesh):
    """The default halo mode resolves to exact (the round-3 measured winner
    at every shard count — SCALING_r03.json); explicit modes pass through
    untouched."""
    from tpu_sage.dist.train import resolve_halo_mode

    assert resolve_halo_mode("auto", 1) == "exact"
    assert resolve_halo_mode("auto", 8) == "exact"
    for mode in ("exact", "ring", "pipelined", "bucketed"):
        assert resolve_halo_mode(mode, 1) == mode
        assert resolve_halo_mode(mode, 8) == mode

    store = sbm_store(n_nodes=256, n_classes=3, feat_dim=8, avg_degree=5, seed=3)
    cfg = TrainConfig(batch_size=32, epochs=1, n_train_samples=(3, 2),
                      n_val_samples=(3, 2), output_dims=(16, 16))
    assert cfg.halo == "auto"
    trainer, *_ = PartitionedTrainer.from_store(store, cfg, mesh)
    assert trainer.halo_mode == "exact"


def test_halo_mode_validation():
    """Typos in the halo mode fail fast with the valid choices named
    (ADVICE r2: unknown strings used to pass through to a later, less
    direct error inside make_gather)."""
    from tpu_sage.dist.train import resolve_halo_mode

    with pytest.raises(ValueError, match="rings"):
        resolve_halo_mode("rings", 8)


def test_halo_measured_races_and_trains(mesh):
    """halo='measured' times the semantics-preserving candidates with real
    scanned epochs on the live mesh, resolves to the measured winner, logs
    the per-mode ms/step, and the resulting trainer trains normally (the
    durable answer to the auto-mode ordering reversing between rounds)."""
    from tpu_sage.dist.train import fit_partitioned, halo_candidates

    store = sbm_store(n_nodes=512, n_classes=4, feat_dim=16, avg_degree=8,
                      feat_noise=0.5, seed=36)
    cfg = TrainConfig(batch_size=64, epochs=2, n_train_samples=(5, 3),
                      n_val_samples=(5, 3), output_dims=(32, 32),
                      halo="measured", halo_measure_steps=2)
    recs = []
    _, state, hist = fit_partitioned(store, cfg, mesh=mesh, log=recs.append)
    resolved = next(r for r in recs if "halo" in r)
    modes = resolved["halo_measured_ms"]  # purely {mode: ms/step} since r5
    assert set(modes) == {"exact", "ring", "pipelined"}
    assert all(v > 0 for v in modes.values())
    if "halo_measured_fallback" in resolved:
        # sub-noise margin → the race abstains to the auto default
        assert resolved["halo"] == "exact"
    else:
        assert resolved["halo"] == min(modes, key=modes.get)
    assert hist[-1]["train_loss"] < hist[0]["train_loss"]

    # candidate policy: bucketed never auto-selected (capacity overflow
    # changes semantics), 1-shard short-circuits, 2-D meshes race hier2d
    assert halo_candidates("data", 1) == ["exact"]
    assert halo_candidates("data", 8) == ["exact", "ring", "pipelined"]
    assert halo_candidates(("host", "chip"), 8) == ["exact", "hier2d"]


def test_halo_measured_subnoise_margin_falls_back(monkeypatch):
    """A winner margin inside the repeat-to-repeat spread is a coin flip,
    not a measurement — the race must abstain to the auto default (exact)
    and record why (VERDICT r4 weak #2: two timed repeats of a short epoch
    were deciding near-ties). Deterministic fake clocks drive both arms."""
    import time

    from tpu_sage.dist.train import measure_halo_mode, resolve_measure_steps

    candidates = ["exact", "ring", "pipelined"]

    class FakeTrainer:
        def init_state(self, feat_dim):
            return None

    run_epoch = lambda tr, st, n: (st, {"loss": jnp.zeros(())})

    def race(durations):
        # perf_counter is consumed as (t0, t1) pairs per timed repeat, in
        # candidate order (the warm-up run takes no clock readings)
        seq = []
        for mode in candidates:
            for d in durations[mode]:
                seq += [0.0, d]
        it = iter(seq)
        monkeypatch.setattr(time, "perf_counter", lambda: next(it))
        return measure_halo_mode(lambda mode: FakeTrainer(), 8, run_epoch,
                                 candidates, n_steps=1, repeats=2)

    # ring is raw-fastest by 0.05 ms/step but both contenders wobble 0.3 —
    # sub-noise margin: abstain to exact, return the reason separately
    # (timings stay purely {mode: float} — the mixed-type dict was a
    # round-5 review finding)
    winner, t, why = race({"exact": [1.0e-3, 1.3e-3],
                           "ring": [0.95e-3, 1.25e-3],
                           "pipelined": [2e-3, 2e-3]})
    assert winner == "exact"
    assert why is not None and "noise" in why
    assert all(isinstance(v, float) for v in t.values())
    # a clear margin keeps the measured winner
    winner, t, why = race({"exact": [1.0e-3, 1.001e-3],
                           "ring": [0.5e-3, 0.501e-3],
                           "pipelined": [2e-3, 2e-3]})
    assert winner == "ring" and why is None
    # near-tied contenders but exact decisively slower: abstaining to exact
    # would pin the run to a mode the race just rejected — keep the measured
    # best and record why (round-5 review finding)
    winner, t, why = race({"exact": [10e-3, 10.3e-3],
                           "ring": [2.0e-3, 2.3e-3],
                           "pipelined": [2.05e-3, 2.35e-3]})
    assert winner == "ring"
    assert why is not None and "keeping the measured best" in why

    # backend-resolved racing-epoch length: CPU keeps 20 (no dispatch tax);
    # explicit values pass through verbatim
    assert resolve_measure_steps(None) == 20
    assert resolve_measure_steps(7) == 7


def test_halo_measured_requires_from_store():
    """Direct trainer construction cannot race (no sharded graph yet) —
    the error names the supported path instead of silently falling back."""
    from tpu_sage.dist.train import resolve_halo_mode

    with pytest.raises(ValueError, match="from_store"):
        resolve_halo_mode("measured", 8)


def test_bucketed_overflow_telemetry(mesh):
    """An under-capacity bucketed run must VISIBLY report overflow in the
    step metrics (VERDICT r2 #3 — halo.py returns the count 'for
    monitoring'; training must surface it, not drop it), a comfortable
    capacity must report zero, and exact mode always reports zero."""
    store = sbm_store(n_nodes=512, n_classes=4, feat_dim=16, avg_degree=6,
                      seed=12)

    def run(cfg):
        trainer, graph, fold_ids, fold_w = PartitionedTrainer.from_store(
            store, cfg, mesh
        )
        state = trainer.init_state(feat_dim=store.feat_dim)
        state, metrics = trainer.train_step(state, graph, fold_ids, fold_w)
        assert np.isfinite(float(metrics["loss"]))
        return int(metrics["halo_overflow"])

    base = dict(batch_size=64, epochs=1, n_train_samples=(5, 3),
                n_val_samples=(5, 3), output_dims=(32, 32), lr_init=0.01)
    # capacity_factor 0.05 -> capacity ~1 per destination: heavy overflow
    starved = TrainConfig(halo="bucketed", halo_capacity_factor=0.05, **base)
    assert run(starved) > 0
    # generous capacity: zero overflow
    roomy = TrainConfig(halo="bucketed", halo_capacity_factor=16.0, **base)
    assert run(roomy) == 0
    # exact mode structurally cannot overflow
    exact = TrainConfig(halo="exact", **base)
    assert run(exact) == 0


def test_bucketed_overflow_in_epoch_log(mesh):
    """fit_partitioned's per-epoch JSON line carries the overflow count for
    bucketed runs (and omits it for exact runs, where it is structurally 0)."""
    from tpu_sage.dist.train import fit_partitioned

    store = sbm_store(n_nodes=512, n_classes=4, feat_dim=16, avg_degree=6,
                      seed=12)
    records = []
    cfg = TrainConfig(batch_size=64, epochs=1, n_train_samples=(5, 3),
                      n_val_samples=(5, 3), output_dims=(32, 32),
                      halo="bucketed", halo_capacity_factor=0.05)
    fit_partitioned(store, cfg, mesh=mesh, log=records.append,
                    eval_every_epoch=False)
    epoch_recs = [r for r in records if "epoch" in r]
    assert epoch_recs and all("halo_overflow" in r for r in epoch_recs)
    assert sum(r["halo_overflow"] for r in epoch_recs) > 0

    records.clear()
    cfg = TrainConfig(batch_size=64, epochs=1, n_train_samples=(5, 3),
                      n_val_samples=(5, 3), output_dims=(32, 32), halo="exact")
    fit_partitioned(store, cfg, mesh=mesh, log=records.append,
                    eval_every_epoch=False)
    epoch_recs = [r for r in records if "epoch" in r]
    assert epoch_recs and all("halo_overflow" not in r for r in epoch_recs)


def test_partitioned_eval_rekeys_on_new_store(mesh):
    """evaluate(state, store_B) after evaluate(state, store_A) must score
    against store_B (VERDICT r2 weak #4: the cached sharded eval graph was
    keyed on nothing, silently reusing store_A's graph)."""
    import dataclasses

    store = sbm_store(n_nodes=512, n_classes=4, feat_dim=16, avg_degree=6,
                      feat_noise=0.5, seed=12)
    cfg = TrainConfig(batch_size=64, epochs=1, n_train_samples=(5, 3),
                      n_val_samples=(5, 3), output_dims=(32, 32), lr_init=0.01)
    trainer, graph, fold_ids, fold_w = PartitionedTrainer.from_store(store, cfg, mesh)
    state = trainer.init_state(feat_dim=store.feat_dim)
    for _ in range(30):
        state, _ = trainer.train_step(state, graph, fold_ids, fold_w)
    acc_a = trainer.evaluate(state, store, fold="val", seed=1)
    assert acc_a > 0.5  # trained: well above the 0.25 chance level

    # same graph, every label rotated: a fresh shard of store_b must score
    # ~chance-complement; the stale cache would keep returning acc_a
    store_b = dataclasses.replace(
        store, targets=(store.targets + 1) % store.n_classes
    )
    acc_b = trainer.evaluate(state, store_b, fold="val", seed=1)
    assert acc_b < 0.3, (acc_a, acc_b)
    # and switching back re-keys again
    assert trainer.evaluate(state, store, fold="val", seed=1) == acc_a


def test_pipelined_ring_bitwise_matches_per_level(mesh):
    """The hop-major interleaved ring (SURVEY.md §5.7 'Overlap') returns
    answers bitwise-identical to the per-level ring functions, with and
    without last-level pre-reduction."""
    from tpu_sage.dist.halo import (dist_gather_ring,
                                    dist_gather_ring_fanout_mean,
                                    dist_gather_ring_pipelined)

    n, d = 64, 16
    table, table_d = _sharded_table(mesh, n, d, seed=9)
    rng = np.random.default_rng(10)
    sizes = (16, 48, 240)  # three levels per shard, last = 48*5 fanout groups
    ids = [rng.integers(0, n, size=(8, q)).astype(np.int32) for q in sizes]
    ids_d = [
        jax.device_put(jnp.asarray(a.reshape(-1)), NamedSharding(mesh, P("data")))
        for a in ids
    ]

    def run_pipelined(last_fanout):
        return shard_map(
            lambda t, a, b, c: tuple(
                dist_gather_ring_pipelined(t, [a, b, c], "data", 8,
                                           last_fanout=last_fanout)
            ),
            mesh=mesh, in_specs=(P("data"),) * 4, out_specs=(P("data"),) * 3,
            check_vma=False,
        )(table_d, *ids_d)

    def run_per_level(last_fanout):
        outs = []
        for i, a in enumerate(ids_d):
            if last_fanout is not None and i == 2:
                fn = lambda t, x: dist_gather_ring_fanout_mean(
                    t, x, last_fanout, "data", 8)
            else:
                fn = lambda t, x: dist_gather_ring(t, x, "data", 8)
            outs.append(shard_map(
                fn, mesh=mesh, in_specs=(P("data"), P("data")),
                out_specs=P("data"), check_vma=False,
            )(table_d, a))
        return outs

    for lf in (None, 5):
        got = run_pipelined(lf)
        want = run_per_level(lf)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
        # and exactness vs the plain local gather for the unreduced levels
        for i in (0, 1):
            np.testing.assert_array_equal(
                np.asarray(got[i]), table[ids[i].reshape(-1)]
            )


def test_partitioned_training_pipelined_halo(mesh):
    """The pipelined halo mode trains and converges like ring (same math,
    interleaved schedule)."""
    store = sbm_store(n_nodes=512, n_classes=4, feat_dim=16, avg_degree=6, seed=12)
    cfg = TrainConfig(batch_size=64, epochs=1, n_train_samples=(5, 3),
                      n_val_samples=(5, 3), output_dims=(32, 32), lr_init=0.01,
                      halo="pipelined")
    trainer, graph, fold_ids, fold_w = PartitionedTrainer.from_store(store, cfg, mesh)
    assert trainer.gather_levels is not None
    state = trainer.init_state(feat_dim=store.feat_dim)
    losses = []
    for _ in range(30):
        state, metrics = trainer.train_step(state, graph, fold_ids, fold_w)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.8, losses[:3] + losses[-3:]
    assert trainer.evaluate(state, store, fold="val", seed=1) > 0.5


@pytest.fixture(scope="module")
def mesh2d(eight_devices):
    return make_mesh(axis_names=("host", "chip"), shape=(2, 4))


def test_hier2d_gather_bitwise_matches_flat(mesh2d):
    """The hierarchical (host, chip) exchange — within-host ICI reduction
    before the cross-host DCN hop — returns rows bitwise-identical to the
    flat exact gather over the linearized axis pair (SURVEY.md §5.7 ICI/DCN
    routing), incl. the fanout-pre-reduced variant."""
    from tpu_sage.dist.halo import (dist_gather, dist_gather_2d,
                                    dist_gather_fanout_mean)

    n, d, fanout = 64, 16, 5
    rng = np.random.default_rng(13)
    table = rng.normal(size=(n, d)).astype(np.float32)
    ax2 = ("host", "chip")
    sh = NamedSharding(mesh2d, P(ax2))
    table_d = jax.device_put(jnp.asarray(table), sh)
    ids = rng.integers(0, n, size=(8, 40)).astype(np.int32)
    ids_d = jax.device_put(jnp.asarray(ids.reshape(-1)), sh)

    got = shard_map(
        lambda t, i: dist_gather_2d(t, i, "host", "chip"),
        mesh=mesh2d, in_specs=(P(ax2), P(ax2)), out_specs=P(ax2),
        check_vma=False,
    )(table_d, ids_d)
    flat = shard_map(
        lambda t, i: dist_gather(t, i, ax2),
        mesh=mesh2d, in_specs=(P(ax2), P(ax2)), out_specs=P(ax2),
        check_vma=False,
    )(table_d, ids_d)
    np.testing.assert_array_equal(np.asarray(got), table[ids.reshape(-1)])
    np.testing.assert_array_equal(np.asarray(got), np.asarray(flat))

    got_m = shard_map(
        lambda t, i: dist_gather_2d(t, i, "host", "chip", fanout=fanout),
        mesh=mesh2d, in_specs=(P(ax2), P(ax2)), out_specs=P(ax2),
        check_vma=False,
    )(table_d, ids_d)
    want_m = table[ids.reshape(-1)].reshape(8 * 8, fanout, d).mean(axis=1)
    np.testing.assert_allclose(np.asarray(got_m), want_m, rtol=1e-5, atol=1e-6)


def test_partitioned_training_hier2d(mesh2d):
    """End-to-end partitioned training over the 2-D (host, chip) mesh with
    hierarchical halo routing: converges and evaluates like the flat modes;
    the per-epoch loss trajectory matches flat-exact on the SAME 8 shards
    (identical batches — the linearized shard index drives the RNG)."""
    store = sbm_store(n_nodes=512, n_classes=4, feat_dim=16, avg_degree=6, seed=12)
    base = dict(batch_size=64, epochs=1, n_train_samples=(5, 3),
                n_val_samples=(5, 3), output_dims=(32, 32), lr_init=0.01)

    def run(cfg, mesh, axis):
        trainer, graph, fold_ids, fold_w = PartitionedTrainer.from_store(
            store, cfg, mesh, axis=axis
        )
        state = trainer.init_state(feat_dim=store.feat_dim)
        losses = []
        for _ in range(20):
            state, metrics = trainer.train_step(state, graph, fold_ids, fold_w)
            losses.append(float(metrics["loss"]))
        return losses, trainer.evaluate(state, store, fold="val", seed=1)

    losses_h, acc_h = run(TrainConfig(halo="hier2d", **base), mesh2d,
                          ("host", "chip"))
    assert np.isfinite(losses_h).all()
    assert losses_h[-1] < losses_h[0] * 0.8
    assert acc_h > 0.5

    losses_e, _ = run(TrainConfig(halo="exact", **base), make_mesh(), "data")
    np.testing.assert_allclose(losses_h, losses_e, rtol=2e-3)


def test_hier2d_requires_2d_axis(mesh):
    store = sbm_store(n_nodes=256, n_classes=3, feat_dim=8, avg_degree=5, seed=3)
    cfg = TrainConfig(batch_size=32, epochs=1, n_train_samples=(3, 2),
                      n_val_samples=(3, 2), output_dims=(16, 16), halo="hier2d")
    with pytest.raises(ValueError, match="hier2d"):
        PartitionedTrainer.from_store(store, cfg, mesh)


def test_partitioned_exact_val(mesh):
    """fit_partitioned with exact_val: the per-epoch metric is the sharded
    exact full-graph number (evaluate_exact), equal to recomputing it and
    close to the single-device exact metric for the same params."""
    from tpu_sage.dist.train import fit_partitioned

    store = sbm_store(n_nodes=512, n_classes=4, feat_dim=16, avg_degree=6,
                      feat_noise=0.5, seed=24)
    cfg = TrainConfig(batch_size=64, epochs=2, n_train_samples=(5, 3),
                      n_val_samples=(5, 3), output_dims=(32, 32),
                      lr_init=0.01, exact_val=True)
    trainer, state, hist = fit_partitioned(store, cfg, mesh=mesh,
                                           log=lambda d: None)
    assert "val_metric" in hist[-1]
    assert hist[-1]["val_metric"] == trainer.evaluate_exact(state, store,
                                                            fold="val")
    assert hist[-1]["val_metric"] > 0.5


def test_partitioned_early_stopping(mesh):
    """patience works through fit_partitioned too."""
    from tpu_sage.dist.train import fit_partitioned

    store = sbm_store(n_nodes=512, n_classes=4, feat_dim=32, avg_degree=8,
                      feat_noise=0.2, seed=43)
    cfg = TrainConfig(batch_size=64, epochs=30, n_train_samples=(5, 3),
                      n_val_samples=(5, 3), output_dims=(32, 32),
                      lr_init=0.01, patience=3)
    records = []
    _, _, hist = fit_partitioned(store, cfg, mesh=mesh, log=records.append)
    assert len(hist) < 30
    assert any(r.get("early_stop") for r in records)


def test_checkpoint_resumes_across_halo_topologies(mesh, mesh2d, tmp_path):
    """A checkpoint from a flat 8-shard exact run resumes on the 2-D
    (host, chip) hier2d mesh: params/optimizer state are replicated and
    topology-independent, so elastic restarts may change the halo mode and
    mesh shape, not just the shard count."""
    from tpu_sage.dist.train import fit_partitioned

    store = sbm_store(n_nodes=512, n_classes=4, feat_dim=16, avg_degree=6,
                      seed=44)
    ck = str(tmp_path / "topo.npz")
    base = dict(batch_size=64, n_train_samples=(5, 3), n_val_samples=(5, 3),
                output_dims=(32, 32), lr_init=0.01)
    cfg_flat = TrainConfig(epochs=2, halo="exact", **base)
    fit_partitioned(store, cfg_flat, mesh=mesh, log=lambda d: None,
                    resume_from=ck, checkpoint_every=1,
                    eval_every_epoch=False)

    records = []
    cfg_h = TrainConfig(epochs=4, halo="hier2d", **base)
    _, _, hist = fit_partitioned(store, cfg_h, mesh=mesh2d,
                                 log=records.append, resume_from=ck,
                                 eval_every_epoch=True)
    resumed = next(r for r in records if "resumed_from" in r)
    assert resumed["start_epoch"] == 2
    assert [h["epoch"] for h in hist] == [2, 3]
    assert hist[-1]["val_metric"] > 0.5


def test_halo_chunks_bitwise_and_trains(mesh):
    """halo_chunks splits the exact exchange into equal query chunks —
    bitwise-identical losses to the unchunked exchange (each chunk is its
    slice of the same collective answer), including the fused last level."""
    store = sbm_store(n_nodes=512, n_classes=4, feat_dim=16, avg_degree=6,
                      seed=45)
    base = dict(batch_size=64, epochs=1, n_train_samples=(5, 3),
                n_val_samples=(5, 3), output_dims=(32, 32), lr_init=0.01,
                halo="exact")

    def losses(**kw):
        cfg = TrainConfig(**base, **kw)
        trainer, graph, fold_ids, fold_w = PartitionedTrainer.from_store(
            store, cfg, mesh
        )
        state = trainer.init_state(feat_dim=store.feat_dim)
        out = []
        for _ in range(8):
            state, m = trainer.train_step(state, graph, fold_ids, fold_w)
            out.append(float(m["loss"]))
        return out

    # _CHUNK_MIN_ROWS keeps tiny test exchanges unchunked; drop it for the test
    import tpu_sage.ops as ops
    old = ops._CHUNK_MIN_ROWS
    try:
        ops._CHUNK_MIN_ROWS = 1
        chunked = losses(halo_chunks=4)
    finally:
        ops._CHUNK_MIN_ROWS = old
    plain = losses()
    np.testing.assert_allclose(chunked, plain, rtol=1e-6)


def test_partitioned_eval_graph_shares_feature_shards(mesh):
    """The eval (full-edge) graph differs from the training graph only in
    adjacency — _full_graph_shard must adopt the training feature shards,
    not upload a second copy of the dominant table (round-5 review finding;
    the capacity model counts the feature table once)."""
    store = sbm_store(n_nodes=256, n_classes=3, feat_dim=8, avg_degree=5,
                      seed=13)
    cfg = TrainConfig(batch_size=32, epochs=1, n_train_samples=(4, 2),
                      n_val_samples=(4, 2), output_dims=(16, 16))
    trainer, graph, fold_ids, fold_w = PartitionedTrainer.from_store(
        store, cfg, mesh)
    eval_graph, _ = trainer._full_graph_shard(store)
    assert eval_graph.feats is graph.feats
    assert eval_graph.feat_scale is graph.feat_scale
    assert eval_graph.adj is not graph.adj
    # a DIFFERENT store must not inherit the shards
    other = sbm_store(n_nodes=256, n_classes=3, feat_dim=8, avg_degree=5,
                      seed=14)
    eval_other, _ = trainer._full_graph_shard(other)
    assert eval_other.feats is not graph.feats
    # and evaluation through the shared-feats graph still works
    state = trainer.init_state(feat_dim=store.feat_dim)
    acc = trainer.evaluate(state, store, fold="val")
    assert 0.0 <= acc <= 1.0

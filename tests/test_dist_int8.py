"""int8 feature shards on the partitioned path (``--feature-int8`` ×
``--partitioned``).

The halo exchange ships raw int8 rows (4× fewer inter-chip bytes than f32)
and requesters dequantize after the gather. Correctness contract: a
partitioned run on the quantized table must match a partitioned run on the
HOST-dequantized dense table exactly — both paths compute
``float(q[row]) * scale`` in f32, only the gather/multiply order differs,
and gather commutes with the per-column multiply.
"""

import dataclasses

import numpy as np
import pytest

from tpu_sage.data.quantize import quantize_np
from tpu_sage.data.synthetic import sbm_store
from tpu_sage.dist.mesh import make_mesh
from tpu_sage.dist.train import PartitionedTrainer
from tpu_sage.dist.unsupervised import PartitionedUnsupervisedTrainer
from tpu_sage.train.trainer import TrainConfig
from tpu_sage.train.unsupervised import UnsupConfig


@pytest.fixture(scope="module")
def mesh(eight_devices):
    return make_mesh()


def _dequantized_clone(store):
    """The store with feats replaced by their int8 round-trip values —
    the exact table the quantized path sees after dequantization."""
    q, scale = quantize_np(store.feats)
    return dataclasses.replace(
        store, feats=(q.astype(np.float32) * scale).astype(np.float32)
    )


def _cfg(**kw):
    base = dict(batch_size=64, epochs=1, n_train_samples=(5, 3),
                n_val_samples=(5, 3), output_dims=(32, 32), lr_init=0.01)
    base.update(kw)
    return TrainConfig(**base)


def test_partitioned_int8_matches_dense_dequant(mesh):
    """Quantized partitioned steps == dense partitioned steps on the
    pre-dequantized table (verifies the dequant wiring end to end: the only
    difference between the runs is where the ``* scale`` happens)."""
    store = sbm_store(n_nodes=512, n_classes=4, feat_dim=16, avg_degree=6,
                      seed=11)
    cfg_q = _cfg(feature_int8=True)
    cfg_d = _cfg()

    tq, gq, fq_ids, fq_w = PartitionedTrainer.from_store(store, cfg_q, mesh)
    td, gd, fd_ids, fd_w = PartitionedTrainer.from_store(
        _dequantized_clone(store), cfg_d, mesh
    )
    assert gq.feats.dtype == np.int8
    assert gq.feat_scale is not None and gq.feat_scale.shape == (16,)

    sq = tq.init_state(feat_dim=store.feat_dim)
    sd = td.init_state(feat_dim=store.feat_dim)

    for _ in range(5):
        sq, mq = tq.train_step(sq, gq, fq_ids, fq_w)
        sd, md = td.train_step(sd, gd, fd_ids, fd_w)
        np.testing.assert_allclose(float(mq["loss"]), float(md["loss"]),
                                   rtol=1e-5, atol=1e-6)

    # eval wiring too (full-graph adjacency, quantized eval shards)
    acc_q = tq.evaluate(sq, store, fold="val")
    acc_d = td.evaluate(sd, _dequantized_clone(store), fold="val")
    np.testing.assert_allclose(acc_q, acc_d, rtol=1e-6, atol=1e-6)


def test_partitioned_int8_epoch_scan_converges(mesh):
    """Scanned-epoch path with int8 shards trains to a falling loss."""
    store = sbm_store(n_nodes=512, n_classes=4, feat_dim=16, avg_degree=6,
                      seed=12)
    cfg = _cfg(feature_int8=True)
    trainer, graph, fold_ids, fold_w = PartitionedTrainer.from_store(
        store, cfg, mesh
    )
    state = trainer.init_state(feat_dim=store.feat_dim)
    losses = []
    for _ in range(6):
        state, m = trainer.train_epoch(state, graph, fold_ids, fold_w,
                                       n_steps=5)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_partitioned_unsup_int8_matches_dense_dequant(mesh):
    """The NCE path gathers features for anchors∪positives∪negatives through
    the same halo; int8 must match the pre-dequantized dense run there too."""
    store = sbm_store(n_nodes=256, n_classes=3, feat_dim=8, avg_degree=5,
                      seed=13)
    unsup = UnsupConfig(walk_length=2, n_negatives=4)
    cfg_q = _cfg(batch_size=32, output_dims=(16, 16), feature_int8=True)
    cfg_d = _cfg(batch_size=32, output_dims=(16, 16))

    tq, gq, fq_ids, fq_w = PartitionedUnsupervisedTrainer.from_store(
        store, cfg_q, unsup, mesh
    )
    td, gd, fd_ids, fd_w = PartitionedUnsupervisedTrainer.from_store(
        _dequantized_clone(store), cfg_d, unsup, mesh
    )
    sq = tq.init_state(feat_dim=store.feat_dim)
    sd = td.init_state(feat_dim=store.feat_dim)
    for _ in range(3):
        sq, mq = tq.train_step(sq, gq, fq_ids, fq_w)
        sd, md = td.train_step(sd, gd, fd_ids, fd_w)
        np.testing.assert_allclose(float(mq["loss"]), float(md["loss"]),
                                   rtol=1e-5, atol=1e-6)

    # embed_fold returns aligned, finite embeddings through the int8 path
    ids = store.folds["val"][:20]
    z = tq.embed_fold(sq, store, ids)
    assert z.shape[0] == len(ids) and np.isfinite(z).all()

"""Partitioned CSR adjacency storage (round 4): the halo exchange over
per-shard CSR blocks must train BIT-IDENTICALLY to the dense-sharded path —
the virtual table (``halo.CSRAdjRows``) materializes the same row contents
in every slot the sampler reads, and everything downstream (feature
exchange, model, psum) is shared code."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_sage.data.synthetic import sbm_store
from tpu_sage.dist.mesh import make_mesh
from tpu_sage.dist.partition import (partition_arrays, partition_csr_arrays,
                                     shard_fold)
from tpu_sage.dist.train import PartitionedTrainer, fit_partitioned
from tpu_sage.train.trainer import TrainConfig


@pytest.fixture(scope="module")
def mesh(eight_devices):
    return make_mesh()


@pytest.fixture(scope="module")
def store():
    return sbm_store(n_nodes=240, n_classes=3, feat_dim=16, avg_degree=6,
                     seed=61)


def test_csr_adj_rows_match_dense_rows():
    """CSRAdjRows[i] equals the dense concat(adj, deg) row in the first
    ``deg`` slots and the degree column — for every local node, including
    degree-0 partition padding."""
    from tpu_sage.dist.halo import CSRAdjRows

    st = sbm_store(n_nodes=100, n_classes=3, feat_dim=8, avg_degree=5, seed=63)
    arrays, m = partition_arrays(st, 4, train=True)
    csr_arrays, m2, window = partition_csr_arrays(st, 4, train=True)
    assert m == m2
    ipr = csr_arrays["indptr"].reshape(4, m + 1)
    r = csr_arrays["indices"].shape[0] // 4
    for s in range(4):
        view = CSRAdjRows(
            jnp.asarray(ipr[s]),
            jnp.asarray(csr_arrays["indices"][s * r:(s + 1) * r]),
            jnp.asarray(arrays["degrees"][s * m:(s + 1) * m]),
            window,
        )
        rows = np.asarray(view[jnp.arange(m, dtype=jnp.int32)])
        assert rows.shape == (m, window + 1)
        dense = arrays["adj"][s * m:(s + 1) * m]
        deg = arrays["degrees"][s * m:(s + 1) * m]
        np.testing.assert_array_equal(rows[:, -1], deg)
        for i in range(m):
            np.testing.assert_array_equal(rows[i, :deg[i]], dense[i, :deg[i]])


@pytest.mark.parametrize("halo", ["exact", "ring", "bucketed", "pipelined"])
def test_partitioned_csr_bitwise_matches_dense(mesh, store, halo):
    """Same seed, same halo mode: CSR-sharded training losses equal the
    dense-sharded losses exactly, for every halo formulation."""
    cfg = TrainConfig(batch_size=32, epochs=1, n_train_samples=(4, 3),
                      n_val_samples=(4, 3), output_dims=(16, 16),
                      lr_init=0.01, halo=halo)

    def losses(csr):
        tr, graph, fold_ids, fold_w = PartitionedTrainer.from_store(
            store, cfg, mesh, csr=csr
        )
        state = tr.init_state(feat_dim=store.feat_dim)
        out = []
        for _ in range(4):
            state, m = tr.train_step(state, graph, fold_ids, fold_w)
            out.append(float(m["loss"]))
        return out, tr

    dense_losses, _ = losses(csr=False)
    csr_losses, tr = losses(csr=True)
    assert tr.csr_window > 0
    assert dense_losses == csr_losses, (dense_losses, csr_losses)
    assert all(np.isfinite(dense_losses))


def test_csr_owner_select_bitwise_matches_pair_answers(mesh, store):
    """Round-5 owner-side column-select (fanout+1-int answers) vs the pair
    answers (2·window+2): identical uniforms → identical sampled values →
    bitwise-equal training losses. Pins the A/B knob so both answer layouts
    stay covered."""
    base = TrainConfig(batch_size=32, epochs=1, n_train_samples=(4, 3),
                       n_val_samples=(4, 3), output_dims=(16, 16),
                       lr_init=0.01, halo="exact")

    def losses(owner):
        cfg = base.replace(csr_owner_select=owner)
        tr, graph, fold_ids, fold_w = PartitionedTrainer.from_store(
            store, cfg, mesh, csr=True
        )
        assert tr.owner_select_on == owner
        state = tr.init_state(feat_dim=store.feat_dim)
        out = []
        for _ in range(4):
            state, m = tr.train_step(state, graph, fold_ids, fold_w)
            out.append(float(m["loss"]))
        # the scanned epoch path too
        state, m = tr.train_epoch(state, graph, fold_ids, fold_w, n_steps=3)
        out.append(float(m["loss"]))
        return out

    on, off = losses(True), losses(False)
    assert on == off, (on, off)
    assert all(np.isfinite(on))


def test_fit_partitioned_csr_end_to_end(mesh, store):
    """fit_partitioned(csr=True) with exact_val: scanned epochs over CSR
    shards, exact layer-wise validation on DENSIFIED eval shards (round-4:
    the single-device densify-at-eval contract, sharded) — the reported
    metric equals evaluate_exact recomputed from the returned state."""
    cfg = TrainConfig(batch_size=32, epochs=3, n_train_samples=(4, 3),
                      n_val_samples=(4, 3), output_dims=(16, 16),
                      lr_init=0.01, exact_val=True)
    recs = []
    trainer, state, hist = fit_partitioned(store, cfg, mesh=mesh,
                                           log=recs.append, csr=True)
    assert hist[-1]["train_loss"] < hist[0]["train_loss"]
    assert all("val_metric" in h for h in hist)
    assert hist[-1]["val_metric"] > 0.5
    assert any("densifies" in str(r.get("note", "")) for r in recs)
    assert any(r.get("csr_window") for r in recs)
    assert trainer.evaluate_exact(state, store) == hist[-1]["val_metric"]


def test_fit_unsupervised_partitioned_csr(mesh, store):
    """The partitioned NCE loop over CSR shards: halo walks + tree + probe."""
    from tpu_sage.dist.unsupervised import fit_unsupervised_partitioned
    from tpu_sage.train.unsupervised import UnsupConfig

    cfg = TrainConfig(batch_size=32, epochs=2, n_train_samples=(4, 3),
                      n_val_samples=(4, 3), output_dims=(16, 16),
                      lr_init=0.005)
    _, _, hist = fit_unsupervised_partitioned(
        store, cfg, UnsupConfig(walk_length=2, n_negatives=4),
        mesh=mesh, log=lambda d: None, csr=True,
    )
    assert hist[-1]["unsup_loss"] < hist[0]["unsup_loss"]
    assert "probe_val_accuracy" in hist[-1]

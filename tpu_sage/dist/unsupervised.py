"""Partitioned (multi-chip) unsupervised GraphSAGE: NCE over halo-walked pairs.

Completes the capability matrix (SURVEY.md §2.1 "Unsupervised head" × §5.7
graph partitioning): the skip-gram-with-negative-sampling objective of
``tpu_sage.train.unsupervised`` running on a node-sharded graph — the actual
reason to scale GraphSAGE, since the reference-scale unsupervised runs
([P] Table 1, Reddit) are exactly the graphs too big to replicate.

Per shard, inside one ``shard_map`` step:

1. anchors: per-epoch permutation batch from the shard's fold group (same
   :func:`tpu_sage.dist.train.epoch_batch_ids` semantics as supervised);
2. positives: ``walk_length`` one-hop uniform hops, each hop a halo
   ``dist_gather`` of the frontier's (adjacency ‖ degree) rows — walks cross
   shard boundaries transparently;
3. negatives: uniform over the GLOBAL real-node range (or degree-smoothed via
   a replicated logits vector — degrees are ~4 bytes/node, cheap to
   replicate even when features are not);
4. one sampled tree for anchors ∪ positives ∪ negatives concatenated — a
   single halo-exchange cascade instead of three encoder passes — then the
   shared encoder, NCE loss, occupancy-weighted ``psum``, replicated adam.

Everything static-shape; params replicated, graph sharded.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import lax, shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpu_sage.dist.partition import shard_fold, shard_fold_masked, shard_graph
from tpu_sage.dist.train import (epoch_batch_ids, make_gather,
                                 sample_level_distributed)
from tpu_sage.graph.graph_data import DeviceGraph, GraphStore
from tpu_sage.nn.model import GSSupervised
from tpu_sage.train.trainer import TrainConfig, TrainState, build_model, build_optimizer
from tpu_sage.train.unsupervised import UnsupConfig, nce_loss


class PartitionedUnsupervisedTrainer:
    """Multi-chip sibling of ``UnsupervisedTrainer`` over a sharded graph."""

    def __init__(
        self,
        model: GSSupervised,
        config: TrainConfig,
        unsup: UnsupConfig,
        mesh: Mesh,
        shard_size: int,
        steps_per_epoch: int,
        n_real_nodes: int,
        axis: str = "data",
    ):
        self.model = model
        self.config = config
        self.unsup = unsup
        self.mesh = mesh
        self.axis = axis
        self.shard_size = shard_size
        self.n_shards = mesh.shape[axis]
        self.steps_per_epoch = steps_per_epoch
        self.n_real_nodes = n_real_nodes
        self.tx = build_optimizer(config, steps_per_epoch)
        self.batch_per_shard = max(1, config.batch_size // self.n_shards)
        self.gather = make_gather(
            getattr(config, "halo", "exact"),
            self.n_shards,
            getattr(config, "halo_capacity_factor", 2.0),
        )
        self._epoch_fns = {}
        self._embed_fn = None
        self._embed_graph = None

    @classmethod
    def from_store(
        cls,
        store: GraphStore,
        config: TrainConfig,
        unsup: UnsupConfig,
        mesh: Mesh,
        axis: str = "data",
    ) -> Tuple["PartitionedUnsupervisedTrainer", DeviceGraph, jnp.ndarray, jnp.ndarray]:
        graph, m = shard_graph(store, mesh, train=True, axis=axis)
        n_shards = mesh.shape[axis]
        fold_ids, fold_w = shard_fold(store.folds["train"], n_shards, m)
        steps_per_epoch = max(1, len(store.folds["train"]) // config.batch_size)
        model = build_model(config, store.n_nodes, max(store.n_classes, 2))
        trainer = cls(model, config, unsup, mesh, m, steps_per_epoch,
                      n_real_nodes=store.n_nodes, axis=axis)
        sh = NamedSharding(mesh, P(axis))
        fold_ids_d = jax.device_put(jnp.asarray(fold_ids, jnp.int32), sh)
        fold_w_d = jax.device_put(jnp.asarray(fold_w), sh)
        return trainer, graph, fold_ids_d, fold_w_d

    def neg_logits(self, store: GraphStore) -> Optional[jnp.ndarray]:
        """Replicated degree-smoothed negative-sampling logits (word2vec-style
        ``deg^neg_power``), or None for uniform. O(n) int32 — replicable even
        when the feature table is not."""
        if self.unsup.neg_power <= 0:
            return None
        logits = self.unsup.neg_power * np.log(
            np.maximum(store.degrees.astype(np.float64), 1.0)
        )
        return jax.device_put(
            jnp.asarray(logits, jnp.float32), NamedSharding(self.mesh, P())
        )

    def init_state(self, feat_dim: int, key: Optional[jax.Array] = None) -> TrainState:
        if key is None:
            key = jax.random.key(self.config.seed)
        fanouts = self.model.fanouts(train=True)
        b = 8
        levels = [jnp.zeros((b,), jnp.int32)]
        feats = [jnp.zeros((b, feat_dim))]
        for f in fanouts:
            levels.append(jnp.zeros((levels[-1].shape[0] * f,), jnp.int32))
            feats.append(jnp.zeros((levels[-1].shape[0], feat_dim)))
        rep = NamedSharding(self.mesh, P())

        def make(k):
            k, init_key, state_key = jax.random.split(k, 3)
            params = self.model.init(
                init_key, levels, feats, method=self.model.forward_gathered
            )
            return TrainState(
                params=params, opt_state=self.tx.init(params),
                step=jnp.zeros((), jnp.int32), key=state_key,
            )

        return jax.jit(make, out_shardings=rep)(key)

    # -- the sharded epoch ---------------------------------------------------

    def _make_epoch(self, n_steps: int, with_neg_logits: bool):
        axis = self.axis
        fanouts = self.model.fanouts(train=True)
        model, tx = self.model, self.tx
        bps = self.batch_per_shard
        gather = self.gather
        spe = self.steps_per_epoch
        wl = self.unsup.walk_length
        q = self.unsup.n_negatives
        n_real = self.n_real_nodes

        def shard_epoch(params, opt_state, step0, key, adj, deg, feats,
                        fold_ids, fold_w, neg_logits):
            my = lax.axis_index(axis)
            adj_deg = jnp.concatenate([adj, deg[:, None]], axis=1)
            w = fold_w[0]

            def body(carry, _):
                params, opt_state, step = carry
                k = jax.random.fold_in(jax.random.fold_in(key, step), my)
                k_walk, k_neg, k_tree = jax.random.split(k, 3)

                ids = epoch_batch_ids(key, step, fold_ids[0], fold_w[0],
                                      bps, spe, my)
                # positives: wl one-hop halo-sampled hops
                pos = ids
                for hop_key in jax.random.split(k_walk, wl):
                    pos = sample_level_distributed(
                        hop_key, adj_deg, pos, 1, axis, gather
                    )
                # negatives: global range, uniform or degree-smoothed
                if with_neg_logits:
                    neg = jax.random.categorical(
                        k_neg, neg_logits, shape=(bps * q,)
                    ).astype(jnp.int32)
                else:
                    neg = jax.random.randint(
                        k_neg, (bps * q,), 0, n_real, dtype=jnp.int32
                    )

                roots = jnp.concatenate([ids.astype(jnp.int32), pos, neg])

                def fwd(p):
                    levels = [roots]
                    ks = jax.random.split(k_tree, len(fanouts))
                    for i, f in enumerate(fanouts):
                        levels.append(
                            sample_level_distributed(
                                ks[i], adj_deg, levels[-1], f, axis, gather
                            )
                        )
                    level_feats = [gather(feats, l, axis) for l in levels]
                    z = model.apply(
                        p, levels, level_feats, method=model.encode_gathered
                    )
                    z_u, z_p, z_n = (
                        z[:bps], z[bps : 2 * bps],
                        z[2 * bps :].reshape(bps, q, -1),
                    )
                    scale = w / jnp.maximum(lax.psum(w, axis), 1e-12)
                    return nce_loss(z_u, z_p, z_n) * scale

                loss_s, grads = jax.value_and_grad(fwd)(params)
                loss = lax.psum(loss_s, axis)
                grads = lax.psum(grads, axis)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state, step + 1), loss

            (params, opt_state, step), losses = lax.scan(
                body, (params, opt_state, step0), None, length=n_steps
            )
            return params, opt_state, step, losses.mean()

        rep, shd = P(), P(axis)
        mapped = shard_map(
            shard_epoch,
            mesh=self.mesh,
            in_specs=(rep, rep, rep, rep, shd, shd, shd, shd, shd, rep),
            out_specs=(rep, rep, rep, rep),
            check_vma=False,
        )

        @partial(jax.jit, donate_argnums=(0,))
        def epoch_fn(state: TrainState, graph: DeviceGraph, fold_ids, fold_w,
                     neg_logits):
            new_key = jax.random.fold_in(state.key, state.step)
            params, opt_state, step, loss = mapped(
                state.params, state.opt_state, state.step, state.key,
                graph.adj, graph.degrees, graph.feats, fold_ids, fold_w,
                neg_logits,
            )
            return (
                TrainState(params=params, opt_state=opt_state, step=step,
                           key=new_key),
                {"loss": loss},
            )

        return epoch_fn

    def train_epoch(
        self, state, graph, fold_ids, fold_w,
        neg_logits: Optional[jnp.ndarray] = None,
        n_steps: Optional[int] = None,
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        n = int(n_steps or self.steps_per_epoch)
        sig = (n, neg_logits is not None)
        if self._epoch_fns.get(sig) is None:
            self._epoch_fns[sig] = self._make_epoch(*sig)
        if neg_logits is None:
            # placeholder scalar keeps the jit signature uniform
            neg_logits = jax.device_put(
                jnp.zeros((1,), jnp.float32), NamedSharding(self.mesh, P())
            )
        return self._epoch_fns[sig](state, graph, fold_ids, fold_w, neg_logits)

    def train_step(self, state, graph, fold_ids, fold_w,
                   neg_logits: Optional[jnp.ndarray] = None):
        """Single partitioned NCE update (the scanned epoch with length 1)."""
        return self.train_epoch(state, graph, fold_ids, fold_w,
                                neg_logits=neg_logits, n_steps=1)

    # -- embeddings (downstream-probe protocol) -----------------------------

    def _make_embed(self):
        axis = self.axis
        fanouts = self.model.fanouts(train=False)
        model = self.model
        bps = self.batch_per_shard
        gather = self.gather

        def shard_embed(params, key, adj, deg, feats, ids):
            # ids local: (1, n_chunks, bps)
            my = lax.axis_index(axis)
            adj_deg = jnp.concatenate([adj, deg[:, None]], axis=1)
            key = jax.random.fold_in(key, my)

            def chunk(k, cids):
                k, sub = jax.random.split(k)
                ks = jax.random.split(sub, len(fanouts))
                levels = [cids]
                for i, f in enumerate(fanouts):
                    levels.append(
                        sample_level_distributed(
                            ks[i], adj_deg, levels[-1], f, axis, gather
                        )
                    )
                level_feats = [gather(feats, l, axis) for l in levels]
                z = model.apply(
                    params, levels, level_feats, method=model.encode_gathered
                )
                return k, z

            _, zs = lax.scan(chunk, key, ids[0])
            return zs[None]  # (1, n_chunks, bps, D)

        rep, shd = P(), P(axis)
        mapped = shard_map(
            shard_embed,
            mesh=self.mesh,
            in_specs=(rep, rep, shd, shd, shd, shd),
            out_specs=shd,
            check_vma=False,
        )
        return jax.jit(mapped)

    def embed_fold(self, state: TrainState, store: GraphStore,
                   ids: np.ndarray, seed: int = 0) -> np.ndarray:
        """Embeddings for arbitrary node sets through the partitioned path on
        the FULL graph (paper's logistic-probe protocol) — aligned with the
        input ``ids`` order."""
        if self._embed_graph is None:
            self._embed_graph = shard_graph(store, self.mesh, train=False,
                                            axis=self.axis)
        graph_full, m = self._embed_graph
        tbl, mask = shard_fold_masked(
            ids, self.n_shards, m, pad_to_multiple=self.batch_per_shard
        )
        n_chunks = tbl.shape[1] // self.batch_per_shard
        tbl3 = tbl.reshape(self.n_shards, n_chunks, self.batch_per_shard)
        sh = NamedSharding(self.mesh, P(self.axis))
        tbl_d = jax.device_put(jnp.asarray(tbl3, jnp.int32), sh)

        if self._embed_fn is None:
            self._embed_fn = self._make_embed()
        z = np.asarray(
            self._embed_fn(state.params, jax.random.key(seed),
                           graph_full.adj, graph_full.degrees,
                           graph_full.feats, tbl_d)
        )  # (n_shards, n_chunks, bps, D)
        z = z.reshape(self.n_shards, -1, z.shape[-1])
        # un-shard back to the caller's order: shard_fold_masked groups by
        # owner preserving relative order, so scatter each shard's valid rows
        owners = ids // m
        out = np.empty((len(ids), z.shape[-1]), dtype=z.dtype)
        for s in range(self.n_shards):
            sel = np.where(owners == s)[0]
            out[sel] = z[s, : len(sel)]
        return out


def fit_unsupervised_partitioned(
    store: GraphStore,
    config: TrainConfig,
    unsup: Optional[UnsupConfig] = None,
    mesh: Optional[Mesh] = None,
    log=None,
    resume_from: Optional[str] = None,
    checkpoint_every: int = 0,
):
    """``fit_unsupervised`` for the node-sharded multi-chip path: per-epoch
    scanned NCE training, JSON loss line per epoch, periodic checkpoints."""
    import json as _json
    import os
    import time

    if unsup is None:
        unsup = UnsupConfig()
    if log is None:
        log = lambda d: print(_json.dumps(d), flush=True)
    if mesh is None:
        from tpu_sage.dist.mesh import make_mesh

        mesh = make_mesh()

    trainer, graph, fold_ids, fold_w = PartitionedUnsupervisedTrainer.from_store(
        store, config, unsup, mesh
    )
    neg_logits = trainer.neg_logits(store)
    state = trainer.init_state(feat_dim=store.feat_dim)
    start_epoch = 0
    if resume_from and os.path.exists(resume_from):
        from tpu_sage.train.checkpoint import load_checkpoint

        state = load_checkpoint(resume_from, state)
        start_epoch = int(state.step) // trainer.steps_per_epoch
        log({"resumed_from": resume_from, "step": int(state.step),
             "start_epoch": start_epoch})

    history = []
    for epoch in range(start_epoch, config.epochs):
        t0 = time.time()
        state, m = trainer.train_epoch(state, graph, fold_ids, fold_w,
                                       neg_logits=neg_logits)
        rec = {"epoch": epoch, "unsup_loss": float(m["loss"]),
               "elapsed": round(time.time() - t0, 4),
               "n_shards": trainer.n_shards}
        history.append(rec)
        log(rec)
        if (
            checkpoint_every > 0 and resume_from
            and (epoch + 1) % checkpoint_every == 0
        ):
            from tpu_sage.train.checkpoint import save_checkpoint

            save_checkpoint(resume_from, state)
            log({"checkpoint": resume_from, "step": int(state.step)})
    return trainer, state, history

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

from tpu_sage.dist.partition import shard_fold_masked
from tpu_sage.dist.train import (PartitionedTrainer, epoch_perm,
                                 gather_level_feats, perm_batch,
                                 sample_level_distributed)
from tpu_sage.graph.graph_data import DeviceGraph, GraphStore
from tpu_sage.nn.model import GSSupervised
from tpu_sage.train.trainer import TrainConfig, TrainState, build_model
from tpu_sage.train.unsupervised import UnsupConfig, nce_loss


class PartitionedUnsupervisedTrainer(PartitionedTrainer):
    """Multi-chip sibling of ``UnsupervisedTrainer`` over a sharded graph.

    Inherits the sharding front-end, replicated ``init_state`` placement and
    halo-gather selection from :class:`PartitionedTrainer`; replaces the
    supervised step/epoch with the NCE objective and supervised evaluation
    with ``embed_fold`` (the downstream-probe protocol)."""

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
        csr_window: int = 0,
    ):
        super().__init__(model, config, mesh, shard_size, steps_per_epoch,
                         task="classification", axis=axis,
                         csr_window=csr_window)
        self.unsup = unsup
        self.n_real_nodes = n_real_nodes
        self._embed_fns = {}

    @classmethod
    def from_store(
        cls,
        store: GraphStore,
        config: TrainConfig,
        unsup: UnsupConfig,
        mesh: Mesh,
        axis: str = "data",
        csr: bool = False,
    ) -> Tuple["PartitionedUnsupervisedTrainer", DeviceGraph, jnp.ndarray, jnp.ndarray]:
        from tpu_sage.train.unsupervised import unsup_gather_defaults

        config = unsup_gather_defaults(config)
        graph, m, steps_per_epoch, fold_ids_d, fold_w_d = cls._sharded_inputs(
            store, config, mesh, axis, csr=csr
        )
        model = build_model(config, store.n_nodes, max(store.n_classes, 2))
        window = getattr(graph, "window", 0)
        halo_timings = halo_fallback = None
        if getattr(config, "halo", "auto") == "measured":
            # race with the real NCE epoch (the knob lesson: workloads
            # differ — the supervised winner is not assumed here)
            from tpu_sage.dist.mesh import axis_size
            from tpu_sage.dist.train import halo_candidates, measure_halo_mode

            winner, halo_timings, halo_fallback = measure_halo_mode(
                lambda mode: cls(model, config.replace(halo=mode), unsup,
                                 mesh, m, steps_per_epoch,
                                 n_real_nodes=store.n_nodes, axis=axis,
                                 csr_window=window),
                store.feat_dim,
                lambda tr, st, n: tr.train_epoch(st, graph, fold_ids_d,
                                                 fold_w_d, n_steps=n),
                halo_candidates(axis, axis_size(mesh, axis)),
                n_steps=getattr(config, "halo_measure_steps", None),
            )
            config = config.replace(halo=winner)
        trainer = cls(model, config, unsup, mesh, m, steps_per_epoch,
                      n_real_nodes=store.n_nodes, axis=axis,
                      csr_window=window)
        trainer.halo_timings = halo_timings
        trainer.halo_fallback = halo_fallback
        # _full_graph_shard (the probe/export embed path) adopts these
        # feature shards instead of re-uploading the table
        trainer._train_store = store
        trainer._train_feats = (graph.feats, graph.feat_scale)
        return trainer, graph, fold_ids_d, fold_w_d

    def neg_logits(self, store: GraphStore) -> Optional[jnp.ndarray]:
        """Replicated degree-smoothed negative-sampling logits (word2vec-style
        ``deg^neg_power``), or None for uniform. O(n) int32 — replicable even
        when the feature table is not."""
        if self.unsup.neg_power <= 0:
            return None
        from tpu_sage.dist.partition import put_sharded

        logits = self.unsup.neg_power * np.log(
            np.maximum(store.degrees.astype(np.float64), 1.0)
        )
        return put_sharded(logits.astype(np.float32), self.mesh, P())

    # init_state inherited from PartitionedTrainer (replicated jit placement)

    # -- the sharded epoch ---------------------------------------------------

    def _make_epoch(self, n_steps: int, with_neg_logits: bool):
        axis = self.axis
        fanouts = self.model.fanouts(train=True)
        model, tx = self.model, self.tx
        bps = self.batch_per_shard
        gather = self.gather
        gather_last = self.gather_last
        gather_levels = self.gather_levels
        lrf = fanouts[-1] if gather_last is not None else None
        spe = self.steps_per_epoch
        wl = self.unsup.walk_length
        q = self.unsup.n_negatives
        n_real = self.n_real_nodes
        window = self.csr_window
        owner_on, hchunks = self.owner_select_on, self.halo_chunks
        perm_base = jax.random.key(self.config.seed ^ 0x0BA7C4)

        def shard_epoch(params, opt_state, step0, key, adj_pack, feats, fscale,
                        fold_ids, fold_w, neg_logits):
            my = lax.axis_index(axis)
            from tpu_sage.dist.train import build_adj_view, make_owner_select

            adj_deg, _ = build_adj_view(adj_pack, window)
            os_fn = make_owner_select(adj_pack, window, axis, owner_on, hchunks)
            # dequantize halo-gathered rows at the requester (fscale is ones
            # when feats is dense — see dist/partition.py shard_graph)
            dq = lambda rows: rows.astype(fscale.dtype) * fscale
            w = fold_w[0]
            count = fold_w[0]
            L = fold_ids.shape[1]
            perm0 = epoch_perm(perm_base, step0 // spe, my, L, count)

            def body(carry, _):
                params, opt_state, step, perm = carry
                t = step % spe
                perm = lax.cond(
                    t == 0,
                    lambda p: epoch_perm(perm_base, step // spe, my, L, count),
                    lambda p: p,
                    perm,
                )
                k = jax.random.fold_in(jax.random.fold_in(key, step), my)
                k_walk, k_neg, k_tree = jax.random.split(k, 3)

                ids = perm_batch(perm, fold_ids[0], count, t, bps)
                # positives: wl one-hop halo-sampled hops
                pos, walk_ovf = ids, jnp.zeros((), jnp.int32)
                for hop_key in jax.random.split(k_walk, wl):
                    pos, o = sample_level_distributed(
                        hop_key, adj_deg, pos, 1, axis, gather,
                        pair_window=window, owner_select=os_fn,
                    )
                    walk_ovf = walk_ovf + o
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
                    levels, ovf = [roots], jnp.zeros((), jnp.int32)
                    ks = jax.random.split(k_tree, len(fanouts))
                    for i, f in enumerate(fanouts):
                        nbr, o = sample_level_distributed(
                            ks[i], adj_deg, levels[-1], f, axis, gather,
                            pair_window=window, owner_select=os_fn,
                        )
                        levels.append(nbr)
                        ovf = ovf + o
                    level_feats, o = gather_level_feats(
                        gather, gather_last, feats, levels, fanouts, dq, axis,
                    gather_levels=gather_levels,
                    )
                    ovf = ovf + o
                    z = model.apply(
                        p, levels, level_feats, lrf,
                        method=model.encode_gathered,
                    )
                    z_u, z_p, z_n = (
                        z[:bps], z[bps : 2 * bps],
                        z[2 * bps :].reshape(bps, q, -1),
                    )
                    scale = w / jnp.maximum(lax.psum(w, axis), 1e-12)
                    return nce_loss(z_u, z_p, z_n) * scale, ovf

                (loss_s, ovf), grads = jax.value_and_grad(fwd, has_aux=True)(params)
                loss = lax.psum(loss_s, axis)
                ovf = lax.psum(ovf + walk_ovf, axis)
                grads = lax.psum(grads, axis)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state, step + 1, perm), (loss, ovf)

            (params, opt_state, step, _), (losses, ovfs) = lax.scan(
                body, (params, opt_state, step0, perm0), None, length=n_steps
            )
            return params, opt_state, step, losses.mean(), ovfs.sum()

        rep, shd = P(), P(axis)
        mapped = shard_map(
            shard_epoch,
            mesh=self.mesh,
            in_specs=(rep, rep, rep, rep, shd, shd, rep, shd, shd, rep),
            out_specs=(rep, rep, rep, rep, rep),
            check_vma=False,
        )

        @partial(jax.jit, donate_argnums=(0,))
        def epoch_fn(state: TrainState, graph: DeviceGraph, fold_ids, fold_w,
                     neg_logits):
            from tpu_sage.dist.train import adj_pack_of

            new_key = jax.random.fold_in(state.key, state.step)
            params, opt_state, step, loss, ovf = mapped(
                state.params, state.opt_state, state.step, state.key,
                adj_pack_of(graph), graph.feats, graph.feat_scale,
                fold_ids, fold_w, neg_logits,
            )
            return (
                TrainState(params=params, opt_state=opt_state, step=step,
                           key=new_key),
                {"loss": loss, "halo_overflow": ovf},
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
            from tpu_sage.dist.partition import put_sharded

            neg_logits = put_sharded(np.zeros((1,), np.float32), self.mesh, P())
        return self._epoch_fns[sig](state, graph, fold_ids, fold_w, neg_logits)

    def train_step(self, state, graph, fold_ids, fold_w,
                   neg_logits: Optional[jnp.ndarray] = None):
        """Single partitioned NCE update (the scanned epoch with length 1)."""
        return self.train_epoch(state, graph, fold_ids, fold_w,
                                neg_logits=neg_logits, n_steps=1)

    # -- embeddings (downstream-probe protocol) -----------------------------

    def _make_embed(self, window: int):
        axis = self.axis
        fanouts = self.model.fanouts(train=False)
        model = self.model
        bps = self.batch_per_shard
        gather = self.gather
        gather_last = self.gather_last
        gather_levels = self.gather_levels
        lrf = fanouts[-1] if gather_last is not None else None

        def shard_embed(params, key, adj_pack, feats, fscale, ids):
            # ids local: (1, n_chunks, bps)
            from tpu_sage.dist.train import build_adj_view, make_owner_select

            my = lax.axis_index(axis)
            adj_deg, _ = build_adj_view(adj_pack, window)
            os_fn = make_owner_select(
                adj_pack, window, axis, self.owner_select_on, self.halo_chunks
            )
            dq = lambda rows: rows.astype(fscale.dtype) * fscale
            key = jax.random.fold_in(key, my)

            def chunk(k, cids):
                k, sub = jax.random.split(k)
                ks = jax.random.split(sub, len(fanouts))
                levels = [cids]
                for i, f in enumerate(fanouts):
                    levels.append(
                        sample_level_distributed(
                            ks[i], adj_deg, levels[-1], f, axis, gather,
                            pair_window=window, owner_select=os_fn,
                        )[0]
                    )
                level_feats, _ = gather_level_feats(
                    gather, gather_last, feats, levels, fanouts, dq, axis,
                    gather_levels=gather_levels,
                )
                z = model.apply(
                    params, levels, level_feats, lrf,
                    method=model.encode_gathered,
                )
                return k, z

            _, zs = lax.scan(chunk, key, ids[0])
            return zs[None]  # (1, n_chunks, bps, D)

        rep, shd = P(), P(axis)
        mapped = shard_map(
            shard_embed,
            mesh=self.mesh,
            in_specs=(rep, rep, shd, shd, rep, shd),
            out_specs=shd,
            check_vma=False,
        )
        return jax.jit(mapped)

    def embed_fold(self, state: TrainState, store: GraphStore,
                   ids: np.ndarray, seed: int = 0) -> np.ndarray:
        """Embeddings for arbitrary node sets through the partitioned path on
        the FULL graph (paper's logistic-probe protocol) — aligned with the
        input ``ids`` order. Uses the inherited store-keyed full-graph shard
        cache (a different store re-shards instead of silently reusing the
        previous one)."""
        graph_full, m = self._full_graph_shard(store)
        tbl, mask = shard_fold_masked(
            ids, self.n_shards, m, pad_to_multiple=self.batch_per_shard
        )
        n_chunks = tbl.shape[1] // self.batch_per_shard
        tbl3 = tbl.reshape(self.n_shards, n_chunks, self.batch_per_shard)
        from tpu_sage.dist.partition import fetch_replicated, put_sharded

        tbl_d = put_sharded(tbl3.astype(np.int32), self.mesh, P(self.axis))

        from tpu_sage.dist.train import adj_pack_of

        ew = getattr(graph_full, "window", 0)
        if self._embed_fns.get(ew) is None:
            self._embed_fns[ew] = self._make_embed(ew)
        z = fetch_replicated(
            self._embed_fns[ew](state.params, jax.random.key(seed),
                                adj_pack_of(graph_full),
                                graph_full.feats, graph_full.feat_scale, tbl_d)
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
    probe: bool = True,
    csr: bool = False,
):
    """``fit_unsupervised`` for the node-sharded multi-chip path: per-epoch
    scanned NCE training, JSON loss line per epoch, periodic checkpoints,
    and (``probe``, classification tasks) a logistic-probe val accuracy on
    the partitioned-path embeddings every ``unsup.probe_every`` epochs
    (0 = final only) recorded in the history. ``config.patience`` /
    ``config.save_best`` key on the probe metric — same contract as
    ``fit_unsupervised`` and the supervised loops' val_metric."""
    import json as _json
    import os
    import time

    if unsup is None:
        unsup = UnsupConfig()
    if log is None:
        log = lambda d: print(_json.dumps(d), flush=True)
    from tpu_sage.dist.train import resolve_mesh_axis

    mesh, axis = resolve_mesh_axis(config, mesh)

    from tpu_sage.train.checkpoint import (BestTracker, maybe_checkpoint,
                                           resume_state)
    from tpu_sage.train.unsupervised import logistic_probe, resolve_probe_every

    trainer, graph, fold_ids, fold_w = PartitionedUnsupervisedTrainer.from_store(
        store, config, unsup, mesh, axis=axis, csr=csr
    )
    # name the RESOLVED halo implementation (config may say "auto"/"measured")
    log({"n_shards": trainer.n_shards, "halo": trainer.halo_mode,
         **({"halo_measured_ms": trainer.halo_timings}
            if trainer.halo_timings else {}),
         **({"halo_measured_fallback": trainer.halo_fallback}
            if getattr(trainer, "halo_fallback", None) else {})})
    neg_logits = trainer.neg_logits(store)
    state = trainer.init_state(feat_dim=store.feat_dim)
    state, start_epoch = resume_state(state, resume_from,
                                      trainer.steps_per_epoch, log)

    # embed_fold is multi-host-safe (put_sharded inputs, fetch_replicated
    # embeddings); every process fits the same deterministic probe on the
    # identical replicated embeddings, so the metric agrees across processes
    can_probe = probe and store.task == "classification"
    tracker = BestTracker(config, resume_from, log)
    probe_every, tracker = resolve_probe_every(unsup, tracker, can_probe, log)

    def run_probe(st):
        return logistic_probe(
            lambda ids: trainer.embed_fold(st, store, ids),
            store.targets, store.folds,
        )

    history = []
    for epoch in range(start_epoch, config.epochs):
        t0 = time.time()
        state, m = trainer.train_epoch(state, graph, fold_ids, fold_w,
                                       neg_logits=neg_logits)
        rec = {"epoch": epoch, "unsup_loss": float(m["loss"]),
               "elapsed": round(time.time() - t0, 4),
               "n_shards": trainer.n_shards}
        if trainer.halo_mode == "bucketed":
            rec["halo_overflow"] = int(m["halo_overflow"])
        acc = None
        if can_probe and probe_every > 0 and (epoch + 1) % probe_every == 0:
            acc = run_probe(state)
            if acc is not None:
                rec["probe_val_accuracy"] = acc
        history.append(rec)
        log(rec)
        maybe_checkpoint(state, resume_from, checkpoint_every, epoch, log,
                         config=config)
        if tracker.update(acc, state):
            break
    if can_probe and history and "probe_val_accuracy" not in history[-1]:
        acc = run_probe(state)
        if acc is not None:
            history[-1]["probe_val_accuracy"] = acc
            log({"probe_val_accuracy": acc})
            # final probe participates in best tracking (see fit_unsupervised)
            tracker.update(acc, state)
    return trainer, state, history

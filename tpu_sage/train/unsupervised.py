"""Unsupervised GraphSAGE: skip-gram with negative sampling over random walks.

The paper's unsupervised objective (Hamilton et al. §3.2, listed in-scope by
BASELINE.json even though bkj may not ship it — SURVEY.md §2.1 last row):

    L = −log σ(z_u·z_v) − Q · E_{n~P_neg}[log σ(−z_u·z_n)]

where v co-occurs with u on a fixed-length random walk and negatives are
sampled uniformly (paper uses a smoothed degree distribution; uniform is the
default here, degree-smoothed available via ``neg_power``).

TPU re-design: walks are generated *on device* inside the jit'd step — a
``lax.scan`` of one-hop uniform samples over the padded adjacency — so there
is no offline walk corpus (the reference ETL's ``walks.txt``) and no host
traffic; every shape is static. The encoder is the same ``GSSupervised``
tower (its classifier head is simply unused), so any aggregator/prep works.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tpu_sage.graph.graph_data import DeviceGraph
from tpu_sage.nn.model import GSSupervised
from tpu_sage.sample.sampler import uniform_neighbor_sample
from tpu_sage.train.trainer import TrainConfig, TrainState, build_model, build_optimizer


def random_walk(
    key: jax.Array,
    adj: jnp.ndarray,
    degrees: jnp.ndarray,
    ids: jnp.ndarray,
    length: int,
) -> jnp.ndarray:
    """Uniform random walk of ``length`` hops; returns final nodes ``(B,)``."""
    def body(carry, k):
        cur = carry
        nxt = uniform_neighbor_sample(k, adj, degrees, cur, 1)[:, 0]
        return nxt, None

    keys = jax.random.split(key, length)
    final, _ = jax.lax.scan(body, ids.astype(jnp.int32), keys)
    return final


def graph_random_walk(key, graph, ids, length: int) -> jnp.ndarray:
    """Storage-dispatching :func:`random_walk` (dense padded table or CSR —
    the same duck dispatch as ``sample.csr.graph_sample_tree``)."""
    if not hasattr(graph, "indptr"):
        return random_walk(key, graph.adj, graph.degrees, ids, length)
    from tpu_sage.sample.csr import (uniform_neighbor_sample_csr,
                                     uniform_neighbor_sample_csr_window)

    def body(carry, k):
        cur = carry
        if graph.window > 0:
            nxt = uniform_neighbor_sample_csr_window(
                k, graph.indptr, graph.indices, graph.degrees, cur, 1,
                graph.window)[:, 0]
        else:
            nxt = uniform_neighbor_sample_csr(
                k, graph.indptr, graph.indices, graph.degrees, cur, 1)[:, 0]
        return nxt, None

    keys = jax.random.split(key, length)
    final, _ = jax.lax.scan(body, ids.astype(jnp.int32), keys)
    return final


def nce_loss(
    z_u: jnp.ndarray,      # (B, D) anchor embeddings
    z_pos: jnp.ndarray,    # (B, D) positive embeddings
    z_neg: jnp.ndarray,    # (B, Q, D) negative embeddings
) -> jnp.ndarray:
    pos_logit = jnp.sum(z_u * z_pos, axis=-1)                 # (B,)
    neg_logit = jnp.einsum("bd,bqd->bq", z_u, z_neg)          # (B, Q)
    pos_loss = -jax.nn.log_sigmoid(pos_logit)
    neg_loss = -jnp.sum(jax.nn.log_sigmoid(-neg_logit), axis=-1)
    return jnp.mean(pos_loss + neg_loss)


@dataclasses.dataclass(frozen=True)
class UnsupConfig:
    """Knobs specific to the unsupervised objective."""

    walk_length: int = 3     # hops between anchor and positive
    n_negatives: int = 10    # Q
    neg_power: float = 0.0   # 0 = uniform; 0.75 = word2vec-style degree smoothing
    probe_every: int = 0     # compute the logistic-probe val accuracy every K
    # epochs and record it in the fit history (0 = final epoch only). The
    # probe is the unsupervised path's val metric: config.patience /
    # config.save_best key on it, exactly like the supervised loops key on
    # val_metric — when either is set and probe_every is 0, the fit loops
    # resolve it to 1 (they need a per-epoch metric)
    # positives come from on-device walks by default; a precomputed corpus
    # (problem.h5 "walks" dataset, reference walks.txt analog) can be supplied
    # to fit_unsupervised(walks=...) instead


def unsup_gather_defaults(config: TrainConfig) -> TrainConfig:
    """Measured gather defaults for the UNSUPERVISED workload: the NCE
    step's sampled tree is ~12× the supervised one (anchors∪positives∪
    negatives roots), and at that size the masked lowering wins at every
    chunk count. Round-4 full grid (bench_logs/r4_unsup_sweep.log):
    masked@24 = 48.7M sampled-edges/s beat plain at every count.
    **Round-5 revision:** the stage breakdown
    (bench_logs/r5_unsup_breakdown.log) showed the masked form's UNCHUNKED
    153,600-row L1 gather is one serial descriptor stream;
    ``masked_chunked`` splits it, and the whole-step sweep
    (r5_unsup_whole_ab.log + r5_unsup_chunk_sweep.log) puts the optimum at
    **masked_chunked@48 = 52.8-53.1M (+9% over masked@24)**; 32/64/96/128 →
    46.1/50.0/50.4/50.2M; the deepest fused level stays masked (plain loses
    7.5 ms whole-step at this scale). Applied only where the user left the
    knobs unset."""
    if config.gather_form is None:
        config = config.replace(gather_form="masked_chunked")
    if config.gather_chunks is None:
        config = config.replace(gather_chunks=48)
    return config


class UnsupervisedTrainer:
    """Trains the encoder with the NCE objective; shares TrainConfig."""

    def __init__(
        self,
        model: GSSupervised,
        config: TrainConfig,
        unsup: UnsupConfig,
        steps_per_epoch: int,
    ):
        self.model = model
        self.config = config
        self.unsup = unsup
        self.tx = build_optimizer(config, steps_per_epoch)

    def init_state(self, graph: DeviceGraph, key: Optional[jax.Array] = None) -> TrainState:
        if key is None:
            key = jax.random.key(self.config.seed)
        key, init_key, state_key = jax.random.split(key, 3)
        b = min(self.config.batch_size, 8)
        levels = [jnp.zeros((b,), jnp.int32)]
        for f in self.model.fanouts(train=True):
            levels.append(jnp.zeros((levels[-1].shape[0] * f,), jnp.int32))
        params = self.model.init(init_key, levels, graph.feats)
        return TrainState(
            params=params, opt_state=self.tx.init(params),
            step=jnp.zeros((), jnp.int32), key=state_key,
        )

    def _encode(self, params, key, graph: DeviceGraph, ids: jnp.ndarray) -> jnp.ndarray:
        from tpu_sage.sample.csr import graph_sample_tree

        levels = graph_sample_tree(key, graph, ids,
                                   self.model.fanouts(train=True))
        return self.model.apply(params, levels, graph.feats, method=self.model.encode)

    @partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(
        self, state: TrainState, graph: DeviceGraph, ids: jnp.ndarray,
        walks: Optional[jnp.ndarray] = None,
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        key, sub = jax.random.split(state.key)
        loss, grads = self._nce_loss_and_grads(state.params, sub, graph, ids, walks)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(params=params, opt_state=opt_state, step=state.step + 1, key=key),
            {"loss": loss},
        )

    def _nce_loss_and_grads(self, params, key, graph, ids, walks):
        """Shared by train_step and the epoch scan."""
        k_walk, k_neg, k_tree = jax.random.split(key, 3)
        b = ids.shape[0]
        q = self.unsup.n_negatives
        if walks is not None:
            kw1, kw2 = jax.random.split(k_walk)
            wi = jax.random.randint(kw1, (b,), 0, walks.shape[1])
            pi = jax.random.randint(kw2, (b,), 1, walks.shape[2])
            from tpu_sage.ops import row_gather

            pos = row_gather(walks, ids)[jnp.arange(b), wi, pi]
        else:
            pos = graph_random_walk(k_walk, graph, ids,
                                    self.unsup.walk_length)
        if self.unsup.neg_power > 0:
            logits = self.unsup.neg_power * jnp.log(
                jnp.maximum(graph.degrees.astype(jnp.float32), 1.0)
            )
            neg = jax.random.categorical(k_neg, logits, shape=(b * q,))
        else:
            neg = jax.random.randint(k_neg, (b * q,), 0, graph.n_nodes)
        neg = neg.astype(jnp.int32)

        # anchors ∪ positives ∪ negatives share ONE sampled tree and one
        # encoder pass — (2+q)·b roots in a single cascade instead of three
        # separate gather chains (the encoder is per-root, so the math is
        # identical; measured 55.9 → see RESULTS.md round 2)
        roots = jnp.concatenate([ids.astype(jnp.int32), pos, neg])

        def loss_of(p):
            z = self._encode(p, k_tree, graph, roots)
            z_u, z_p = z[:b], z[b : 2 * b]
            z_n = z[2 * b :].reshape(b, q, -1)
            return nce_loss(z_u, z_p, z_n)

        return jax.value_and_grad(loss_of)(params)

    @partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_epoch(
        self,
        state: TrainState,
        graph: DeviceGraph,
        node_ids: jnp.ndarray,                    # (n,) train-fold ids
        walks: Optional[jnp.ndarray] = None,
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        """Whole epoch as one lax.scan — zero per-step host traffic (the
        supervised ``train_epoch`` counterpart)."""
        b = self.config.batch_size
        n_batches = max(1, node_ids.shape[0] // b)
        n = n_batches * b
        key, perm_key = jax.random.split(state.key)
        perm = jax.random.permutation(perm_key, node_ids.shape[0])[:n]
        ids_b = node_ids[perm].reshape(n_batches, b).astype(jnp.int32)
        state = state.replace(key=key)

        def body(st, ids):
            k, sub = jax.random.split(st.key)
            loss, grads = self._nce_loss_and_grads(st.params, sub, graph, ids, walks)
            updates, opt_state = self.tx.update(grads, st.opt_state, st.params)
            params = optax.apply_updates(st.params, updates)
            return (
                TrainState(params=params, opt_state=opt_state,
                           step=st.step + 1, key=k),
                loss,
            )

        state, losses = jax.lax.scan(body, state, ids_b)
        return state, {"loss": losses.mean()}

    @partial(jax.jit, static_argnums=0)
    def embed_batch(self, params, graph: DeviceGraph, ids: jnp.ndarray, key) -> jnp.ndarray:
        return self._encode(params, key, graph, ids)

    def embed_all(self, params, graph: DeviceGraph, ids: np.ndarray,
                  batch_size: int = 512, seed: int = 0) -> np.ndarray:
        """Host convenience: embeddings for arbitrary node sets (downstream
        logistic-probe protocol, paper §4)."""
        key = jax.random.key(seed)
        out = []
        n = len(ids)
        pad = (-n) % batch_size
        padded = np.concatenate([ids, np.zeros(pad, ids.dtype)])
        for i in range(0, len(padded), batch_size):
            key, sub = jax.random.split(key)
            z = self.embed_batch(
                params, graph, jnp.asarray(padded[i : i + batch_size], jnp.int32), sub
            )
            out.append(np.asarray(z))
        return np.concatenate(out)[:n]


def logistic_probe(embed_fn, targets: np.ndarray, folds,
                   max_iter: int = 200) -> Optional[float]:
    """Downstream logistic-probe val accuracy on frozen embeddings — the
    paper's unsupervised evaluation protocol ([P] §4: embeddings feed a
    simple linear classifier). ``embed_fn(ids) -> (len(ids), D)``. Returns
    None when a fold is empty."""
    from sklearn.linear_model import LogisticRegression

    tr, va = folds["train"], folds["val"]
    if not (len(tr) and len(va)):
        return None
    probe = LogisticRegression(max_iter=max_iter).fit(embed_fn(tr), targets[tr])
    return float(probe.score(embed_fn(va), targets[va]))


def fit_unsupervised(
    problem,
    config: TrainConfig,
    unsup: Optional[UnsupConfig] = None,
    log=None,
    walks: Optional[np.ndarray] = None,
    resume_from: Optional[str] = None,
    checkpoint_every: int = 0,
    probe: bool = True,
    csr: bool = False,
) -> Tuple[UnsupervisedTrainer, TrainState, list]:
    """Epoch loop over all train-fold nodes with the NCE objective.

    ``resume_from``/``checkpoint_every``: same periodic-checkpoint +
    exact-epoch-resume contract as ``fit`` (SURVEY.md §5.4). With ``probe``
    (default) a logistic-probe val accuracy on the frozen embeddings
    (classification tasks) is computed every ``unsup.probe_every`` epochs
    (0 = final epoch only), logged AND recorded in the history — quality
    lives in the training history, not only in the CLI layer.
    ``config.patience`` / ``config.save_best`` key on the probe metric,
    mirroring the supervised loops' val_metric contract."""
    import json as _json
    import time

    if unsup is None:
        unsup = UnsupConfig()
    if log is None:
        log = lambda d: print(_json.dumps(d), flush=True)

    config = unsup_gather_defaults(config)
    train_ids = problem.folds["train"]
    if len(train_ids) < config.batch_size:
        # static shapes need a full batch (same clamp as fit: without it the
        # epoch scan's perm[:n_batches*b].reshape would fail on small folds)
        config = config.replace(batch_size=max(1, len(train_ids)))
        log({"note": f"batch_size clamped to train fold size {config.batch_size}"})
    steps_per_epoch = max(1, len(train_ids) // config.batch_size)
    model = build_model(config, problem.n_nodes, max(problem.n_classes, 2))
    trainer = UnsupervisedTrainer(model, config, unsup, steps_per_epoch)
    # feature storage follows compute_dtype (same round-5 fix as fit())
    fdt = None if config.compute_dtype == "float32" else jnp.bfloat16
    graph = problem.device_graph(train=True, csr=csr,
                                 quantize=config.feature_int8, dtype=fdt)
    state = trainer.init_state(graph)
    if walks is None:
        walks = getattr(problem, "walks", None)
    if walks is not None and walks.shape[0] != problem.n_nodes:
        # the trainer indexes walks[ids] by GLOBAL node id; a corpus generated
        # for a subset of starts would yield silently wrong positives
        raise ValueError(
            f"walk corpus must cover every node (walks.shape[0]="
            f"{walks.shape[0]} != n_nodes={problem.n_nodes}); regenerate with "
            f"starts=arange(n_nodes)"
        )
    walks_d = None if walks is None else jnp.asarray(walks, jnp.int32)

    from tpu_sage.train.checkpoint import (BestTracker, maybe_checkpoint,
                                           resume_state)

    state, start_epoch = resume_state(state, resume_from, steps_per_epoch, log)
    node_ids = jnp.asarray(train_ids, jnp.int32)
    tracker = BestTracker(config, resume_from, log)
    can_probe = probe and problem.task == "classification"
    probe_every, tracker = resolve_probe_every(unsup, tracker, can_probe, log)

    graph_full = None  # FULL adjacency for probe embeddings (inductive protocol)

    def run_probe(st):
        nonlocal graph_full
        if graph_full is None:
            graph_full = problem.device_graph(train=False, csr=csr,
                                              quantize=config.feature_int8,
                                              dtype=fdt)
        return logistic_probe(
            lambda ids: trainer.embed_all(st.params, graph_full, ids),
            problem.store.targets, problem.folds,
        )

    history = []
    for epoch in range(start_epoch, config.epochs):
        t0 = time.time()
        state, m = trainer.train_epoch(state, graph, node_ids, walks_d)
        rec = {"epoch": epoch, "unsup_loss": float(m["loss"]),
               "elapsed": round(time.time() - t0, 4)}
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
            # the final probe participates in best tracking too: with
            # probe_every>1 this may be the run's best state and save_best
            # must capture it (stop return irrelevant — the loop is over)
            tracker.update(acc, state)
    return trainer, state, history


def resolve_probe_every(unsup: UnsupConfig, tracker, can_probe: bool, log) -> tuple:
    """patience/save_best need a per-epoch metric: with either set and
    ``probe_every`` unset, probe every epoch; when no probe is possible at
    all (non-classification task or probe=False), deactivate the tracker
    loudly instead of silently never stopping/saving. Shared by the
    single-device and partitioned unsupervised fit loops. Returns
    ``(probe_every, tracker)``."""
    probe_every = unsup.probe_every
    if tracker.active:
        if not can_probe:
            log({"note": "patience/save_best inactive: the unsupervised loop "
                         "has no per-epoch metric for this task (the probe "
                         "needs a classification problem and probe=True)"})
            tracker.patience, tracker.save_best = 0, False
        elif probe_every <= 0:
            probe_every = 1
            log({"note": "patience/save_best key on the logistic probe; "
                         "probing every epoch (set unsup.probe_every to thin)"})
    return probe_every, tracker

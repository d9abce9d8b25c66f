"""Training machinery: jit'd steps, on-device epoch batching, the fit loop.

Reference counterpart: the epoch loop in ``train.py`` plus
``GSSupervised.train_step`` (SURVEY.md §3.1). TPU re-design decisions:

- **Zero per-step host traffic.** Fold ids and targets live on device; an
  epoch's batches are a PRNG permutation + reshape. The hot path is
  ``train_epoch`` — a single jit'd ``lax.scan`` over all batches; the step-wise
  path exists for logging-heavy runs and mirrors it exactly.
- **LR inside the step.** The reference mutates the optimizer's LR every batch
  from fractional epoch progress; here the schedule is a pure function of the
  step counter baked into the optax chain — same math, no host round-trip.
- **Donated state.** ``state`` is donated through jit, so params/opt buffers
  update in place in HBM.
- **Eval with masking.** Static shapes require fixed batch sizes; eval folds
  are padded to a multiple of the batch and metric counts are mask-weighted,
  so every fold node counts exactly once (the reference's ``array_split``
  ragged batching is a host-side luxury we don't want on TPU).
"""

from __future__ import annotations

import dataclasses
import json
import time
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from tpu_sage.graph.graph_data import DeviceGraph
from tpu_sage.nn.model import GSSupervised, default_layer_specs
from tpu_sage.sample.csr import graph_sample_tree
from tpu_sage.train.losses import loss_lookup
from tpu_sage.train.lr import LRSchedule
from tpu_sage.train.metrics import metric_lookup


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray  # () int32
    key: jax.Array


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Flat, json-loadable run config (SURVEY.md §5.6). Field names follow the
    reference's CLI flags where they exist."""

    aggregator_class: str = "mean"
    prep_class: str = "identity"
    n_train_samples: Tuple[int, ...] = (25, 10)
    n_val_samples: Tuple[int, ...] = (25, 10)
    output_dims: Tuple[int, ...] = (128, 128)
    batch_size: int = 256
    epochs: int = 10
    lr_init: float = 0.01
    lr_schedule: str = "constant"
    lr_kwargs: Tuple[Tuple[str, Any], ...] = ()
    weight_decay: float = 0.0
    optimizer: str = "adam"
    seed: int = 123
    combine: str = "concat"
    normalize: bool = True
    agg_hidden_dim: int = 512
    embedding_dim: int = 64
    param_dtype: str = "float32"
    compute_dtype: str = "float32"  # 'bfloat16' halves HBM traffic on the MXU path
    feature_int8: bool = False  # int8 feature table + per-column scales
    # (halves the resident table AND the dominant gather bytes again —
    # tpu_sage/data/quantize.py; lossy: per-element error ≤ column scale/2)
    fuse_first_layer: bool = False  # whole-table projection trick (mean+identity)
    # Measured-perf gather knobs (round-2 A/B results baked in as defaults;
    # TPU_SAGE_* env vars remain whole-program overrides — tpu_sage.overrides):
    gather_form: Optional[str] = None  # None = "plain" everywhere (round-3
    # winner at gather_chunks=8: 61.46M vs 59.70M masked on the mean
    # headline); "masked" forces the round-2d materialized lowering for A/B;
    # "masked_chunked" (round 5) chunks the masked non-deepest level
    # gathers — the unsupervised tree's 153,600-row L1 level is one serial
    # descriptor stream under plain "masked"
    gather_form_deep: Optional[str] = None  # deepest fused level's form
    # override ("plain" | "masked"); None = follow gather_form's base form
    gather_chunks: Optional[int] = None  # split big gathers into k
    # independent ops so their descriptor streams overlap. None = measured
    # per-workload default: 10 for supervised training (round-3 sweep: 62.3M
    # vs 61.8 at 8, 57.4 at 4), masked_chunked@48 for the (12×-larger)
    # unsupervised NCE tree (round-5 sweep: 52.8-53.1M sampled-edges/s)
    # — resolved by the fit loops; explicit values apply everywhere
    fuse_last: str = "auto"  # deepest-level fused gather+summary:
    # "auto" (on, except lstm — measured −7%), "off", "all"
    int8_summean: bool = True  # int8 tables: exact int32 sum + one dequant
    patience: int = 0  # early stopping: stop after N consecutive epochs
    # without val-metric improvement (0 = off; needs per-epoch validation)
    save_best: bool = False  # checkpoint only on val improvement instead of
    # periodically — the checkpoint file always holds the best-so-far state
    # (resume then restarts from the best epoch)
    exact_val: bool = False  # validate with EXACT full-graph layer-wise
    # inference (nn/full_graph) instead of sampled eval — variance-free, the
    # serving-mode metric; supported for mean/gcn/max_pool/mean_pool/
    # attention (the permutation-invariant aggregators — lstm is
    # order-defined and keeps sampled eval), dense adjacency only
    exact_val_every: int = 1  # with exact_val: run the exact full-graph pass
    # every K epochs (sampled validation in between, plus the final epoch
    # and the final test metric always exact). Exact validation costs a
    # whole-graph layer-wise inference per call — at Reddit scale (233k
    # nodes, fanout-free) that dwarfs a 2.3 ms/step training epoch, so K>1
    # makes the flag usable on big runs. patience/save_best compare EXACT
    # epochs only (the sampled in-betweens are informational — mixing the
    # two metric streams would let sampling noise poison best tracking), so
    # early stopping fires at exact epochs and the last tracked metric is
    # always the serving-mode one
    halo: str = "auto"  # partitioned-path gather: "auto" | "measured" |
    # "exact" | "ring" | "pipelined" | "bucketed" | "hier2d". "auto"
    # resolves to exact (the round-3 measured winner at every shard count —
    # SCALING_r03.json), but the mode ordering is environment-sensitive
    # (ring won round 2 on the same mesh): "measured" races the exact
    # semantics-preserving candidates with their real scanned epochs on the
    # LIVE mesh at trainer build and picks the winner (per-mode ms/step
    # logged; dist/train.py::measure_halo_mode). Costs one extra compile per
    # candidate — intended for long runs / new deployments
    halo_measure_steps: Optional[int] = None  # steps per timed racing epoch
    # for halo="measured" (2 timed runs after a warm-up, best kept). None =
    # backend-resolved: 100 on accelerator backends — the axon TPU charges a
    # FLAT ~26 ms per dispatched scan program (RESULTS r2b cost model), so a
    # 20-step racing epoch inflates every candidate by ~1.3 ms/step and
    # compresses relative gaps — 20 on CPU (tests; no dispatch tax there).
    # Explicit values apply verbatim. The race also falls back to the "auto"
    # resolution when the winner's margin is inside the measured repeat
    # noise (dist/train.py::measure_halo_mode)
    halo_capacity_factor: float = 2.0  # bucketed capacity = factor*q/n_shards
    csr_owner_select: bool = True  # CSR shards + exact halo: move the
    # sampling hops' fanout column-select to the OWNER — the requester ships
    # its uniforms (fanout f32/query) and answers come back fanout+1 ints
    # wide instead of the 2·window+2 CSR pair rows (~23× narrower at
    # (window 128, fanout 10)); sampled values bitwise-identical
    # (halo.dist_sample_csr_owner_select). False restores pair answers for A/B
    halo_chunks: int = 10  # split each exact halo exchange into k equal query
    # chunks (independent collectives + answering gathers — the single-device
    # descriptor-overlap lever applied inside shard_map). Measured round 4 at
    # the 232,965-node headline graph (bench_logs/r4_halo_chunks.log,
    # 200-step scans): chunks 1/2/4/8/10 → 3.747/2.771/2.719/2.404/2.345
    # ms/step vs replicated 2.334 — 10 closes the round-3 +62% partitioned
    # overhead to +0.5%. Counts snap to divisors per exchange; exchanges
    # under ops._CHUNK_MIN_ROWS stay unchunked (1 restores round-3 behavior)

    @classmethod
    def from_dict(cls, d: dict, origin: str = "<dict>") -> "TrainConfig":
        """Build from a plain dict (json preset file, or the ``__config__``
        metadata a checkpoint carries) with the tuple-field coercions."""
        d = {k: v for k, v in d.items() if not k.startswith("_")}
        known = {f.name for f in dataclasses.fields(cls)}
        unknown = set(d) - known
        if unknown:
            raise ValueError(
                f"unknown config keys in {origin}: {sorted(unknown)}; "
                f"valid keys: {sorted(known)}"
            )
        for k in ("n_train_samples", "n_val_samples", "output_dims"):
            if k in d:
                d[k] = tuple(d[k])
        if "lr_kwargs" in d:
            kw = d["lr_kwargs"]
            # json presets spell it as a dict; checkpoint metadata stores the
            # dataclass's tuple-of-pairs (lists after the json roundtrip)
            pairs = kw.items() if isinstance(kw, dict) else (tuple(p) for p in kw)
            d["lr_kwargs"] = tuple(sorted(pairs))
        return cls(**d)

    @classmethod
    def from_json(cls, path: str) -> "TrainConfig":
        with open(path) as f:
            d = json.load(f)
        return cls.from_dict(d, origin=path)

    def replace(self, **kw) -> "TrainConfig":
        return dataclasses.replace(self, **kw)


def fold_metric_np(task: str, logits: np.ndarray, targets: np.ndarray) -> float:
    """Fold metric from full-graph logits (host side, exact counts) — the
    same definitions as the masked device-side eval (``Trainer.eval_fold``):
    accuracy / micro-F1 / negated MSE / negated MAE."""
    if task == "classification":
        return float((logits.argmax(-1) == targets.astype(np.int64)).mean())
    if task == "multilabel_classification":
        preds = (logits > 0).astype(np.float64)
        t = targets.astype(np.float64)
        tp = float((preds * t).sum())
        fp = float((preds * (1 - t)).sum())
        fn = float(((1 - preds) * t).sum())
        return 2 * tp / max(2 * tp + fp + fn, 1e-12)
    err = logits - targets.astype(logits.dtype)
    if task == "regression":
        return float(-(err ** 2).mean())
    return float(-np.abs(err).mean())


def build_model(config: TrainConfig, n_nodes: int, n_classes: int) -> GSSupervised:
    specs = default_layer_specs(
        fanouts=config.n_train_samples,
        val_fanouts=config.n_val_samples,
        output_dims=config.output_dims,
    )
    return GSSupervised(
        layer_specs=specs,
        n_classes=n_classes,
        aggregator_class=config.aggregator_class,
        prep_class=config.prep_class,
        n_nodes=n_nodes,
        embedding_dim=config.embedding_dim,
        combine=config.combine,
        normalize=config.normalize,
        agg_hidden_dim=config.agg_hidden_dim,
        dtype=None if config.compute_dtype == "float32" else config.compute_dtype,
        fuse_first_layer=config.fuse_first_layer,
        gather_form=config.gather_form,
        gather_form_deep=getattr(config, "gather_form_deep", None),
        gather_chunks=(10 if config.gather_chunks is None
                       else config.gather_chunks),
        fuse_last=config.fuse_last,
        int8_summean=config.int8_summean,
    )


def make_schedule(config: TrainConfig, steps_per_epoch: int):
    """``lr(step) = schedule(step / steps_per_epoch)`` — single construction
    point shared by the optax chain and metric logging."""
    sched_factory = LRSchedule.lookup[config.lr_schedule]
    kwargs = dict(config.lr_kwargs)
    kwargs.setdefault("epochs", float(config.epochs))
    sched = sched_factory(lr_init=config.lr_init, **kwargs)

    def lr_fn(step):
        return sched(jnp.asarray(step, jnp.float32) / float(steps_per_epoch))

    return lr_fn


def build_optimizer(config: TrainConfig, steps_per_epoch: int) -> optax.GradientTransformation:
    """Adam (reference default) with the per-batch LR schedule compiled in."""
    lr_fn = make_schedule(config, steps_per_epoch)

    if config.optimizer == "adam":
        tx = optax.adam(learning_rate=lr_fn)
    elif config.optimizer == "sgd":
        tx = optax.sgd(learning_rate=lr_fn)
    else:
        raise ValueError(f"unknown optimizer: {config.optimizer}")
    if config.weight_decay:
        # reference uses torch Adam(weight_decay=) == L2 penalty added to grads
        tx = optax.chain(optax.add_decayed_weights(config.weight_decay), tx)
    return tx


class Trainer:
    """Owns model/optimizer/state and the jit'd step functions."""

    def __init__(
        self,
        model: GSSupervised,
        config: TrainConfig,
        steps_per_epoch: int,
        loss_fn: Optional[Callable] = None,
        metric_fn: Optional[Callable] = None,
        task: str = "classification",
    ):
        self.model = model
        self.config = config
        self.task = task
        self.loss_fn = loss_fn or loss_lookup[task]
        self.metric_fn = metric_fn or metric_lookup[task]
        self.steps_per_epoch = steps_per_epoch
        self.tx = build_optimizer(config, steps_per_epoch)
        self._lr_fn = make_schedule(config, steps_per_epoch)  # for metric logging

    # -- state -------------------------------------------------------------

    def init_state(self, graph: DeviceGraph, key: Optional[jax.Array] = None) -> TrainState:
        if key is None:
            key = jax.random.key(self.config.seed)
        key, init_key, state_key = jax.random.split(key, 3)
        fanouts = self.model.fanouts(train=True)
        b = min(self.config.batch_size, 8)
        dummy_ids = jnp.zeros((b,), dtype=jnp.int32)
        levels = [dummy_ids]
        for f in fanouts:
            levels.append(jnp.zeros((levels[-1].shape[0] * f,), dtype=jnp.int32))
        params = self.model.init(init_key, levels, graph.feats)
        opt_state = self.tx.init(params)
        return TrainState(
            params=params,
            opt_state=opt_state,
            step=jnp.zeros((), dtype=jnp.int32),
            key=state_key,
        )

    # -- single step (logging-friendly path) --------------------------------

    @partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(
        self,
        state: TrainState,
        graph: DeviceGraph,
        ids: jnp.ndarray,
        targets: jnp.ndarray,
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        key, sample_key = jax.random.split(state.key)
        fanouts = self.model.fanouts(train=True)

        def loss_of(params):
            levels = graph_sample_tree(sample_key, graph, ids, fanouts)
            logits = self.model.apply(params, levels, graph.feats)
            return self.loss_fn(logits, targets), logits

        (loss, logits), grads = jax.value_and_grad(loss_of, has_aux=True)(state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=params, opt_state=opt_state, step=state.step + 1, key=key
        )
        metrics = {
            "loss": loss,
            "metric": self.metric_fn(logits, targets),
            "lr": self._lr_fn(state.step),
        }
        return new_state, metrics

    # -- whole-epoch scan (throughput path) ---------------------------------

    @partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_epoch(
        self,
        state: TrainState,
        graph: DeviceGraph,
        fold_ids: jnp.ndarray,      # (n_fold,) int32, padded to B*n_batches
        fold_targets: jnp.ndarray,  # (n_fold, ...) aligned with fold_ids
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        """One epoch as a single XLA computation: permute → reshape → scan."""
        b = self.config.batch_size
        n_batches = fold_ids.shape[0] // b
        if n_batches == 0:
            raise ValueError(
                f"train fold ({fold_ids.shape[0]} nodes) is smaller than "
                f"batch_size={b}; lower the batch size"
            )
        n = n_batches * b
        key, perm_key = jax.random.split(state.key)
        perm = jax.random.permutation(perm_key, fold_ids.shape[0])[:n]
        ids_b = fold_ids[perm].reshape(n_batches, b)
        tgt_b = fold_targets[perm].reshape((n_batches, b) + fold_targets.shape[1:])
        state = TrainState(
            params=state.params, opt_state=state.opt_state, step=state.step, key=key
        )

        fanouts = self.model.fanouts(train=True)

        # Structure note (measured on v5e, bf16, batch 512): leave the
        # sampling and the per-level feature gathers INSIDE the scan body as
        # separate, independent ops — XLA overlaps them across/within steps.
        # "Optimizations" that looked obvious were slower: packing degrees
        # into the adjacency + one concatenated feature gather = 5.39 ms/step;
        # pre-sampling the whole epoch before the scan = 5.51 ms/step; this
        # form = 4.31 ms/step. Gathers pay ~10 ns/row + ~5 ns/KB (RESULTS.md
        # "Efficiency analysis"), and XLA hides the backward pass under the
        # next iteration's gathers — keeping ops separate preserves that.
        def body(carry, batch):
            st = carry
            ids, targets = batch
            k, sample_key = jax.random.split(st.key)

            def loss_of(params):
                levels = graph_sample_tree(sample_key, graph, ids, fanouts)
                logits = self.model.apply(params, levels, graph.feats)
                return self.loss_fn(logits, targets)

            loss, grads = jax.value_and_grad(loss_of)(st.params)
            updates, opt_state = self.tx.update(grads, st.opt_state, st.params)
            params = optax.apply_updates(st.params, updates)
            nxt = TrainState(params=params, opt_state=opt_state, step=st.step + 1, key=k)
            return nxt, loss

        state, losses = jax.lax.scan(body, state, (ids_b, tgt_b))
        return state, {"loss": losses.mean(), "lr": self._lr_fn(state.step - 1)}

    # -- evaluation ---------------------------------------------------------

    @partial(jax.jit, static_argnums=0)
    def eval_fold(
        self,
        params: Any,
        graph: DeviceGraph,
        key: jax.Array,
        ids_padded: jnp.ndarray,      # (n_batches, B) int32
        targets_padded: jnp.ndarray,  # (n_batches, B, ...)
        mask_padded: jnp.ndarray,     # (n_batches, B) float32
    ) -> Dict[str, jnp.ndarray]:
        """Masked full-fold evaluation with val fanouts on the given graph
        (full adjacency at call sites — the inductive protocol, SURVEY.md §3.5).

        Returns mask-weighted global counts so accuracy / micro-F1 are exact
        over the fold regardless of padding.
        """
        fanouts = self.model.fanouts(train=False)

        def body(k, batch):
            ids, targets, mask = batch
            k, sample_key = jax.random.split(k)
            levels = graph_sample_tree(sample_key, graph, ids, fanouts)
            logits = self.model.apply(params, levels, graph.feats)
            if self.task == "classification":
                correct = jnp.sum(
                    (jnp.argmax(logits, -1) == targets.astype(jnp.int32)) * mask
                )
                stats = jnp.array([correct, mask.sum(), 0.0, 0.0])
            elif self.task == "multilabel_classification":
                preds = (logits > 0).astype(jnp.float32) * mask[:, None]
                t = targets.astype(jnp.float32) * mask[:, None]
                tp = jnp.sum(preds * t)
                fp = jnp.sum(preds * (1 - t) * mask[:, None])
                fn = jnp.sum((1 - preds) * t * mask[:, None])
                stats = jnp.array([tp, fp, fn, 0.0])
            else:  # regression: sum of (abs) errors + count
                err = logits - targets.astype(logits.dtype)
                se = jnp.sum(jnp.square(err) * mask[:, None])
                ae = jnp.sum(jnp.abs(err) * mask[:, None])
                cnt = mask.sum() * logits.shape[-1]
                stats = jnp.array([se, ae, cnt, 0.0])
            return k, stats

        _, stats = jax.lax.scan(body, key, (ids_padded, targets_padded, mask_padded))
        s = stats.sum(axis=0)
        if self.task == "classification":
            return {"metric": s[0] / jnp.maximum(s[1], 1.0)}
        if self.task == "multilabel_classification":
            return {"metric": 2 * s[0] / jnp.maximum(2 * s[0] + s[1] + s[2], 1e-12)}
        if self.task == "regression":
            return {"metric": -s[0] / jnp.maximum(s[2], 1.0)}
        return {"metric": -s[1] / jnp.maximum(s[2], 1.0)}

    def evaluate(
        self,
        params: Any,
        graph: DeviceGraph,
        ids: np.ndarray,
        targets: np.ndarray,
        key: jax.Array,
        batch_size: Optional[int] = None,
    ) -> float:
        """Host wrapper: pad the fold, run ``eval_fold``, return the scalar."""
        b = batch_size or self.config.batch_size
        n = len(ids)
        n_batches = max(1, -(-n // b))
        pad = n_batches * b - n
        ids_p = np.concatenate([ids, np.zeros(pad, dtype=ids.dtype)])
        tgt_p = np.concatenate([targets, np.zeros((pad,) + targets.shape[1:], dtype=targets.dtype)])
        mask_p = np.concatenate([np.ones(n, np.float32), np.zeros(pad, np.float32)])
        out = self.eval_fold(
            params,
            graph,
            key,
            jnp.asarray(ids_p.reshape(n_batches, b), jnp.int32),
            jnp.asarray(tgt_p.reshape((n_batches, b) + targets.shape[1:])),
            jnp.asarray(mask_p.reshape(n_batches, b)),
        )
        return float(out["metric"])


def fit(
    problem,
    config: TrainConfig,
    log: Callable[[Dict], None] = None,
    eval_every_epoch: bool = True,
    resume_from: Optional[str] = None,
    val_interval_batches: Optional[int] = None,
    checkpoint_every: int = 0,
    csr: bool = False,
) -> Tuple[Trainer, TrainState, list]:
    """End-to-end training on a NodeProblem (reference ``train.py`` contract):
    per-epoch train over the train fold with per-batch LR, validation on the
    full graph with val fanouts, JSON metric line per epoch.

    ``resume_from``: checkpoint path; if the file exists, training state
    (params, optimizer, step, PRNG key) restarts from it at the epoch after
    the checkpointed step (SURVEY.md §5.3-5.4). ``checkpoint_every`` > 0
    additionally writes ``resume_from`` every N epochs mid-run, so a killed
    run loses at most N epochs (SURVEY.md §5.4 "every N steps and at end";
    the product step unit is the scanned epoch)."""
    import os

    if log is None:
        log = lambda d: print(json.dumps(d), flush=True)

    train_ids = problem.folds["train"]
    if len(train_ids) < config.batch_size:
        # static shapes need a full batch; shrink to the fold (reference's
        # ragged last batch is a host-side behavior we replace with this)
        config = config.replace(batch_size=max(1, len(train_ids)))
        log({"note": f"batch_size clamped to train fold size {config.batch_size}"})
    steps_per_epoch = max(1, len(train_ids) // config.batch_size)
    model = build_model(config, problem.n_nodes, problem.n_classes)
    trainer = Trainer(model, config, steps_per_epoch, task=problem.task)

    # exact_val needs a dense eval adjacency (layer-wise inference walks
    # whole rows); with CSR training storage the FULL graph densifies for
    # eval only — opt-in cost, logged below (training stays CSR)
    exact_requested = False
    if config.exact_val:
        from tpu_sage.nn.full_graph import exact_supported

        exact_requested = exact_supported(model)
    # feature storage follows compute_dtype (the partitioned path's
    # shard_graph already did; the single-device loops stored f32 regardless
    # until round 5 — the benched bf16-table configuration was unreachable
    # through fit(), and the resident table was 2x the modeled bytes)
    fdt = None if config.compute_dtype == "float32" else jnp.bfloat16
    graph_train = problem.device_graph(
        train=True, csr=csr, quantize=config.feature_int8, dtype=fdt
    )
    def get_graph_full():
        # Lazy: the full-edge eval graph uploads on first validation use —
        # a --no-eval run (or empty val/test folds) never pays its
        # adjacency residency, extending the single-chip capacity envelope
        # by one n*max_degree*4-byte table (the feature table is shared
        # with graph_train via the GraphStore device cache either way).
        return problem.device_graph(
            train=False, csr=csr and not exact_requested,
            quantize=config.feature_int8, dtype=fdt,
        )

    from tpu_sage.train.checkpoint import (BestTracker, maybe_checkpoint,
                                           resume_state)

    state = trainer.init_state(graph_train)
    state, start_epoch = resume_state(state, resume_from, steps_per_epoch, log)
    tracker = BestTracker(config, resume_from, log)

    fold_ids = jnp.asarray(train_ids, jnp.int32)
    fold_targets = jnp.asarray(problem.store.targets[train_ids])
    eval_key = jax.random.key(config.seed + 1)

    val_ids = problem.folds["val"]

    # exact full-graph validation (opt-in): variance-free layer-wise
    # inference instead of sampled eval — the serving-mode metric
    use_exact_val = exact_requested
    if config.exact_val and not use_exact_val:
        log({"note": "exact_val unsupported for this aggregator; "
                     "falling back to sampled validation"})
    elif use_exact_val and csr:
        log({"note": "exact_val densifies the FULL-graph adjacency for the "
                     "eval pass (training storage stays CSR); budget "
                     "n_nodes*max_degree*4 bytes of transient HBM"})

    def eval_fold_ids(ids, exact: bool = True):
        if use_exact_val and exact:
            from tpu_sage.nn.full_graph import embed_all_nodes

            logits = np.asarray(
                embed_all_nodes(model, state.params, get_graph_full(),
                                with_head=True)
            )
            return fold_metric_np(
                problem.task, logits[ids], problem.store.targets[ids]
            )
        return trainer.evaluate(
            state.params, get_graph_full(), ids, problem.store.targets[ids],
            eval_key,
        )

    def exact_this_epoch(epoch: int) -> bool:
        """exact_val_every thinning: exact on every K-th epoch and the final
        one; sampled validation in between (same metric, higher variance)."""
        k = max(1, config.exact_val_every)
        return (epoch + 1) % k == 0 or epoch == config.epochs - 1

    def validate(rec, exact: bool = True):
        if len(val_ids):
            rec["val_metric"] = eval_fold_ids(val_ids, exact=exact)
        return rec

    history = []
    for epoch in range(start_epoch, config.epochs):
        t0 = time.time()
        if val_interval_batches:
            # reference's "eval every N batches" mode (SURVEY.md §3.1): run
            # the epoch in sub-epoch segments with a validation after each.
            # Segments are drawn from a fresh FULL-EPOCH shuffle (the
            # reference's protocol is an epoch shuffle with mid-epoch
            # validation; fixed-order segments with only within-segment
            # permutation would be a different batch distribution).
            ep_perm = np.random.default_rng(
                config.seed * 1_000_003 + epoch
            ).permutation(len(train_ids))
            ep_ids = fold_ids[ep_perm]
            ep_tgt = fold_targets[ep_perm]
            seg = val_interval_batches * config.batch_size
            losses = []
            last_lr = trainer._lr_fn(state.step)
            for start in range(0, len(train_ids) - config.batch_size + 1, seg):
                seg_ids = ep_ids[start : start + seg]
                seg_tgt = ep_tgt[start : start + seg]
                if len(seg_ids) < config.batch_size:
                    break
                state, m = trainer.train_epoch(state, graph_train, seg_ids, seg_tgt)
                losses.append(float(m["loss"]))
                last_lr = m["lr"]
                log(validate({"epoch": epoch, "batch_offset": start // config.batch_size,
                              "train_loss": losses[-1]},
                             exact=exact_this_epoch(epoch)))
            train_metrics = {"loss": np.mean(losses) if losses else float("nan"),
                             "lr": last_lr}
        else:
            state, train_metrics = trainer.train_epoch(
                state, graph_train, fold_ids, fold_targets
            )
        train_loss = float(train_metrics["loss"])
        elapsed = time.time() - t0
        rec = {
            "epoch": epoch,
            "train_loss": train_loss,
            "lr": float(train_metrics["lr"]),
            "elapsed": round(elapsed, 4),
        }
        exact_now = exact_this_epoch(epoch)
        if eval_every_epoch:
            rec = validate(rec, exact=exact_now)
        history.append(rec)
        log(rec)
        # save_best owns `resume_from` (best-so-far, written by the tracker);
        # maybe_checkpoint routes the periodic latest-state writes to the
        # `.last` sibling in that case — resume_state loads the later file
        maybe_checkpoint(state, resume_from, checkpoint_every, epoch, log,
                         config=config)
        # with exact_val_every>1 the in-between sampled metrics are
        # informational only: the tracker compares EXACT epochs against each
        # other (mixing streams would let one noisy sampled reading latch
        # tracker.best and poison save_best/patience on the serving metric)
        tracked = rec.get("val_metric") if (not use_exact_val or exact_now) \
            else None
        if tracker.update(tracked, state):
            break

    test_ids = problem.folds.get("test", np.array([], dtype=np.int64))
    if eval_every_epoch and len(test_ids):
        log({"final_test_metric": eval_fold_ids(test_ids)})
        # logged, not appended: history keeps per-epoch records only
    return trainer, state, history

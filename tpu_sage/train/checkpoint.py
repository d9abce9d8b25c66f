"""Checkpoint / resume: params + optimizer state + step + PRNG key.

The reference saves nothing (SURVEY.md §5.4) — we exceed it deliberately:
multi-host runs are fail-stop under JAX/PJRT and restart from the latest
checkpoint. Format is a single ``.npz`` of the flattened state pytree (keys
are ``/``-joined paths) — dependency-light, portable, and byte-identical
across hosts for the divergence checks in debug mode (SURVEY.md §5.2).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from tpu_sage.train.trainer import TrainState


def _path_str(p) -> str:
    for attr in ("key", "idx", "name"):
        if hasattr(p, attr):
            return str(getattr(p, attr))
    return str(p)


def _flatten_with_paths(tree: Any):
    return [
        ("/".join(_path_str(p) for p in path), leaf)
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]
    ]


def save_checkpoint(path: str, state: TrainState, config=None,
                    best_metric=None) -> None:
    """Write the full TrainState to ``path`` (.npz).

    ``config`` (a TrainConfig) is recorded as a ``__config__`` JSON string so
    a checkpoint carries the knobs it was trained with (incl. the measured
    perf knobs — gather_form/gather_chunks/fuse_last/int8_summean); restore
    ignores it structurally, ``read_checkpoint_config`` reads it back.
    ``best_metric`` (save_best writes) records the val metric this state
    achieved, so a RESUMED run's BestTracker compares against it instead of
    restarting from None and overwriting the best file with a worse state.

    Multi-process runs: process 0 alone writes (state is replicated, so the
    bytes would be identical — a shared filesystem must not see N processes
    racing the same tmp file); every process can read it back at resume."""
    import dataclasses as _dc
    import json as _json

    if jax.process_count() > 1 and jax.process_index() != 0:
        return
    d = os.path.dirname(os.path.abspath(path))
    if d:
        os.makedirs(d, exist_ok=True)
    # PRNG keys are opaque typed arrays; persist their raw uint32 data
    storable = state.replace(key=jax.random.key_data(state.key))
    flat = {k: np.asarray(v) for k, v in _flatten_with_paths(storable)}
    if config is not None:
        flat["__config__"] = np.array(
            _json.dumps(_dc.asdict(config), default=list)
        )
    if best_metric is not None:
        flat["__best_metric__"] = np.float64(best_metric)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **flat)
    os.replace(tmp, path)


def read_best_metric(path: str):
    """The ``__best_metric__`` recorded by a save_best write (None if absent
    or the file doesn't exist)."""
    if not os.path.exists(path):
        return None
    with np.load(path) as data:
        if "__best_metric__" not in data.files:
            return None
        return float(data["__best_metric__"])


def read_checkpoint_config(path: str):
    """The ``__config__`` dict stored by ``save_checkpoint`` (None if the
    checkpoint predates config recording)."""
    import json as _json
    import os

    if not os.path.exists(path):
        raise SystemExit(f"error: checkpoint not found: {path!r}")
    with np.load(path) as data:
        if "__config__" not in data.files:
            return None
        return _json.loads(str(data["__config__"]))


def checkpoint_step(path: str) -> int:
    """The step counter stored in a checkpoint (cheap peek, no tree restore)."""
    with np.load(path) as data:
        return int(data["step"])


def resume_state(state: TrainState, resume_from, steps_per_epoch: int, log):
    """Shared resume step for every fit loop: if ``resume_from`` (or its
    ``.last`` sibling — the periodic file of a ``save_best`` run, see
    ``fit``) exists, load whichever holds the LATER step and compute the
    epoch to restart at (the epoch AFTER the checkpointed step). Returns
    ``(state, start_epoch)``."""
    if not resume_from:
        return state, 0
    candidates = [p for p in (resume_from, resume_from + ".last")
                  if os.path.exists(p)]
    if not candidates:
        return state, 0
    path = max(candidates, key=checkpoint_step)
    state = load_checkpoint(path, state)
    start_epoch = int(state.step) // steps_per_epoch
    log({"resumed_from": path, "step": int(state.step),
         "start_epoch": start_epoch})
    return state, start_epoch


def maybe_checkpoint(state: TrainState, resume_from, checkpoint_every: int,
                     epoch: int, log, config=None) -> None:
    """Shared periodic-save step: write ``resume_from`` every
    ``checkpoint_every`` epochs (SURVEY.md §5.4 "every N steps and at end";
    the product step unit is the scanned epoch).

    With ``config.save_best`` the tracker owns ``resume_from`` (best-so-far
    state), so the periodic latest-state writes go to the ``.last`` sibling
    — the single place this two-file contract lives; every fit loop calls
    here with the plain ``resume_from``."""
    if not (checkpoint_every > 0 and resume_from
            and (epoch + 1) % checkpoint_every == 0):
        return
    path = (resume_from + ".last"
            if (config is not None and getattr(config, "save_best", False))
            else resume_from)
    save_checkpoint(path, state, config=config)
    log({"checkpoint": path, "step": int(state.step)})


class BestTracker:
    """Early stopping + best-checkpoint bookkeeping shared by the fit loops.

    ``update(val, state)`` returns True when training should STOP (no
    val-metric improvement for ``config.patience`` consecutive epochs).
    With ``config.save_best`` the checkpoint is written on every improvement
    instead of periodically, so the file always holds the best-so-far state
    (resume then restarts from the best epoch — the standard keep-best
    contract). Metrics are higher-is-better throughout (regression metrics
    are negated by the eval paths)."""

    def __init__(self, config, resume_from, log):
        self.patience = getattr(config, "patience", 0)
        self.save_best = getattr(config, "save_best", False)
        self.resume_from = resume_from
        self.log = log
        self.config = config
        # a resumed save_best run must compare against the metric the best
        # file already holds — restarting from None would let the first
        # post-resume epoch overwrite a better state
        self.best = (read_best_metric(resume_from)
                     if (self.save_best and resume_from) else None)
        if self.best is not None:
            log({"resumed_best_metric": self.best})
        self.stale = 0

    @property
    def active(self) -> bool:
        return self.patience > 0 or self.save_best

    def update(self, val, state: TrainState) -> bool:
        if val is None:
            return False
        if self.best is None or val > self.best:
            self.best, self.stale = val, 0
            if self.save_best and self.resume_from:
                save_checkpoint(self.resume_from, state, config=self.config,
                                best_metric=val)
                self.log({"checkpoint_best": self.resume_from,
                          "val_metric": val, "step": int(state.step)})
            return False
        self.stale += 1
        if self.patience and self.stale >= self.patience:
            self.log({"early_stop": True, "best_val_metric": self.best,
                      "stale_epochs": self.stale})
            return True
        return False


def load_checkpoint(path: str, template: TrainState) -> TrainState:
    """Restore into the shape of ``template`` (same model/optimizer config).

    Each restored leaf is placed with the TEMPLATE leaf's sharding when the
    mesh spans processes (a plain ``jnp.asarray`` would commit to local
    device 0, which a cross-process jit cannot consume); single-process runs
    keep the plain upload."""
    import os

    if not os.path.exists(path):
        # np.load's raw FileNotFoundError is unhelpful at the CLI/export
        # surface (resume_state already guards its own candidates; this
        # covers the exporter's required --checkpoint)
        raise SystemExit(f"error: checkpoint not found: {path!r}")
    multi = jax.process_count() > 1
    with np.load(path) as data:
        flat = {k: data[k] for k in data.files}
    storable_template = template.replace(key=jax.random.key_data(template.key))
    paths_leaves, treedef = jax.tree_util.tree_flatten_with_path(storable_template)
    leaves = []
    for path_t, leaf in paths_leaves:
        key = "/".join(_path_str(p) for p in path_t)
        if key not in flat:
            raise KeyError(f"checkpoint {path} missing entry {key!r}")
        stored = flat[key]
        if stored.shape != np.shape(leaf):
            raise ValueError(
                f"checkpoint mismatch at {key}: {stored.shape} vs {np.shape(leaf)}"
            )
        stored = stored.astype(np.asarray(leaf).dtype)
        sharding = getattr(leaf, "sharding", None)
        if multi and sharding is not None:
            leaves.append(jax.make_array_from_callback(
                stored.shape, sharding,
                lambda idx, s=stored: s[idx]))
        else:
            leaves.append(jnp.asarray(stored))
    restored = jax.tree_util.tree_unflatten(treedef, leaves)
    return restored.replace(key=jax.random.wrap_key_data(restored.key))

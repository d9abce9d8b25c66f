"""NodeProblem: the task container (reference ``problem.py``, SURVEY.md §2.1).

Loads a ``problem.h5`` artifact (schema below), exposes the train/full
adjacency split, folds, task-selected loss/metric names, and the reference's
``iterate(mode, shuffle)`` batch generator. The device-side fast path bypasses
``iterate`` entirely — fold ids live on device and batching is a PRNG
permutation + reshape (zero per-step host traffic, SURVEY.md §3.3 note) — but
the host generator is kept for API parity and evaluation scripting.

problem.h5 schema (written by ``tpu_sage.data.convert`` / ``synthetic``):
  datasets: adj (n, max_degree) int32, train_adj (n, max_degree) int32,
            degrees (n,) int32, train_degrees (n,) int32,
            feats (n, d) float32, targets (n,) int64 | (n, c) float32,
            folds (n,) int8  [0=train, 1=val, 2=test]
  attrs:    task (str), n_classes (int)
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional, Tuple

import numpy as np

from tpu_sage.graph.graph_data import DeviceGraph, GraphStore

FOLD_CODES = {"train": 0, "val": 1, "test": 2}


def infer_degrees(adj: np.ndarray) -> np.ndarray:
    """Recover true degrees from a self-id-padded table (fallback for
    artifacts missing the ``degrees`` dataset): degree = max_degree minus the
    trailing run of self-id entries.

    Caveat: a REAL stored self-loop occupying the trailing slot(s) is
    indistinguishable from padding and is undercounted. Our own ETL always
    writes the ``degrees`` dataset, so this path only triggers on foreign
    artifacts; if those may contain explicit self-loop edges, supply degrees
    explicitly."""
    n, max_degree = adj.shape
    self_ids = np.arange(n, dtype=adj.dtype)[:, None]
    is_pad = adj == self_ids
    # trailing-run length: first position from the right that is NOT pad
    not_pad_rev = ~is_pad[:, ::-1]
    first_real = np.where(
        not_pad_rev.any(axis=1), np.argmax(not_pad_rev, axis=1), max_degree
    )
    return (max_degree - first_real).astype(np.int32)


class NodeProblem:
    """Task + graph + folds, mirroring the reference's public surface."""

    def __init__(self, store: GraphStore):
        self.store = store
        self.task = store.task
        self.n_classes = store.n_classes
        self.folds: Dict[str, np.ndarray] = store.folds
        self.walks = None  # optional (n_nodes, n_walks, L+1) corpus
        self._device_graphs: Dict[tuple, DeviceGraph] = {}

    # -- constructors ------------------------------------------------------

    @classmethod
    def from_h5(cls, problem_path: str) -> "NodeProblem":
        import os

        import h5py

        if not os.path.exists(problem_path):
            # h5py's raw OSError traceback is unhelpful at the CLI surface;
            # fail like the flag-validation errors do (clean message, no dump)
            raise SystemExit(
                f"error: problem file not found: {problem_path!r} — build one "
                "with `python -m tpu_sage.data.convert` (wl-json / edge-list "
                "/ planetoid / ogb layouts) or train with --synthetic sbm"
            )
        with h5py.File(problem_path, "r") as f:
            adj = f["adj"][:].astype(np.int32)
            train_adj = f["train_adj"][:].astype(np.int32) if "train_adj" in f else adj
            degrees = (
                f["degrees"][:].astype(np.int32)
                if "degrees" in f
                else infer_degrees(adj)
            )
            train_degrees = (
                f["train_degrees"][:].astype(np.int32)
                if "train_degrees" in f
                else infer_degrees(train_adj)
            )
            feats = f["feats"][:].astype(np.float32)
            targets = f["targets"][:]
            fold_codes = f["folds"][:]
            walks = f["walks"][:] if "walks" in f else None
            task = f.attrs.get("task", "classification")
            if isinstance(task, bytes):
                task = task.decode()
            n_classes = int(f.attrs.get("n_classes", 0))

        folds = {
            name: np.nonzero(fold_codes == code)[0].astype(np.int64)
            for name, code in FOLD_CODES.items()
        }
        store = GraphStore(
            adj=adj,
            degrees=degrees,
            train_adj=train_adj,
            train_degrees=train_degrees,
            feats=feats,
            targets=targets,
            folds=folds,
            task=task,
            n_classes=n_classes,
        )
        problem = cls(store)
        problem.walks = walks
        return problem

    # -- properties --------------------------------------------------------

    @property
    def n_nodes(self) -> int:
        return self.store.n_nodes

    @property
    def feats_dim(self) -> int:
        return self.store.feat_dim

    @property
    def loss_fn_name(self) -> str:
        return self.task

    @property
    def metric_fn_name(self) -> str:
        return self.task

    # -- device access -----------------------------------------------------

    def device_graph(
        self, train: bool, dtype=None, csr: bool = False, quantize: bool = False
    ) -> DeviceGraph:
        """Upload (once, cached) the train-edge or full-edge graph.

        ``dtype``: feature dtype on device (e.g. ``jnp.bfloat16`` halves the
        dominant HBM gather traffic; default float32). ``csr=True`` uploads
        CSR storage (``nnz`` ids instead of ``n·max_degree`` — the memory-lean
        option; sampling tradeoff in ``tpu_sage.sample.csr``).
        ``quantize=True`` stores features int8 with per-column scales
        (``tpu_sage.data.quantize`` — halves table + gather bytes again)."""
        import jax.numpy as jnp

        key = (train, str(dtype), csr, quantize)
        if key not in self._device_graphs:
            to_dev = self.store.to_device_csr if csr else self.store.to_device
            self._device_graphs[key] = to_dev(
                train=train, dtype=dtype or jnp.float32, quantize=quantize
            )
        return self._device_graphs[key]

    # -- reference-compatible batch generator ------------------------------

    def iterate(
        self,
        mode: str = "train",
        batch_size: int = 512,
        shuffle: bool = False,
        seed: Optional[int] = None,
    ) -> Iterator[Tuple[np.ndarray, np.ndarray, float]]:
        """Yield ``(ids, targets, progress)`` host batches (SURVEY.md §3.3).

        ``progress`` is the fraction of this fold consumed after the yielded
        batch — the reference feeds ``epoch + progress`` to the LR schedule.
        """
        idx = self.folds[mode]
        if shuffle:
            rng = np.random.default_rng(seed)
            idx = rng.permutation(idx)
        n = len(idx)
        n_batches = max(1, int(np.ceil(n / batch_size)))
        done = 0
        for chunk in np.array_split(idx, n_batches):
            done += len(chunk)
            yield chunk, self.store.targets[chunk], done / n

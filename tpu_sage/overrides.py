"""Trace-time environment overrides for the measured perf knobs.

Every knob is a ``TrainConfig`` field first (``gather_form``,
``gather_chunks``, ``fuse_last``, ``int8_summean``) — the product path, where
the chosen values are recorded in the run's config JSON line and in
checkpoint metadata. The ``TPU_SAGE_*`` environment variables remain as
EXPLICIT whole-program overrides for same-session A/B benching
(``scripts/bench_*``): when set they win over the config everywhere.

These are read at TRACE time — a compiled program keeps whatever values it
was traced with, and flipping a variable mid-process does NOT invalidate jit
caches. Set them only at process start; inside the library, the config
fields are the supported interface.
"""

from __future__ import annotations

import os
from typing import Optional


def gather_form(configured: Optional[str]) -> Optional[str]:
    """``TPU_SAGE_GATHER_FORM=masked|plain`` forces one lowering everywhere;
    otherwise the configured value (None = per-aggregator policy)."""
    return os.environ.get("TPU_SAGE_GATHER_FORM") or configured


def gather_chunks(configured: int) -> int:
    """``TPU_SAGE_GATHER_CHUNKS=k`` (1 disables chunking)."""
    v = os.environ.get("TPU_SAGE_GATHER_CHUNKS")
    return int(v) if v else int(configured)


def fuse_last(configured: str) -> str:
    """``TPU_SAGE_FUSE_LAST=0|1|all`` → ``off|auto|all`` (legacy spellings
    kept for the bench scripts)."""
    v = os.environ.get("TPU_SAGE_FUSE_LAST")
    if v is None:
        return configured
    return {"0": "off", "1": "auto"}.get(v, v)


def int8_summean(configured: bool) -> bool:
    """``TPU_SAGE_INT8_SUMMEAN=0`` restores dequantize-then-mean."""
    v = os.environ.get("TPU_SAGE_INT8_SUMMEAN")
    return bool(configured) if v is None else v != "0"

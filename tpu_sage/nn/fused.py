"""Custom-VJP whole-table projection + gather (the fused first layer).

The mean aggregator's first pass commutes with projection, so instead of
gathering 602-wide raw feature rows per tree level and projecting each, the
table can be projected ONCE per step (one big MXU matmul) and the per-level
gathers run in 128-wide output space — the dominant HBM gather shrinks by
``feat_dim / output_dim`` (SURVEY.md §7.2 M4; reference analog: the gather in
``models.py``'s forward, SURVEY.md §3.2).

Round 1 rejected this for TRAINING because plain autodiff differentiates
through the table projection: the gathers' backward scatters cotangents into
a table-sized ``(n_nodes, d0)`` buffer, then ``dW = tableᵀ @ scatter`` costs a
full-table matmul (measured 5.20 ms/step vs 4.31 baseline — STATUS.md).

That scatter is an artifact, not a necessity: ``dW = Σ_levels X[ids]ᵀ @ g`` —
computable from the gathered raw rows directly. This custom VJP does exactly
that. The backward's raw-row gathers depend only on the (integer) tree ids,
not on any forward result, so XLA is free to overlap them with unrelated
compute; nothing table-sized is ever scattered or re-multiplied.

The feature table itself is a CONSTANT (identity prep), so its cotangent is
dead and the ``zeros_like`` below is DCE'd by XLA.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np


@jax.custom_vjp
def project_gather(table: jnp.ndarray, w: jnp.ndarray,
                   ids_list: Sequence[jnp.ndarray]) -> List[jnp.ndarray]:
    """``[(table @ w)[ids] for ids in ids_list]`` with a scatter-free VJP."""
    proj = jnp.dot(table, w)
    return [proj[ids] for ids in ids_list]


def _pg_fwd(table, w, ids_list):
    return project_gather(table, w, ids_list), (table, tuple(ids_list))


def _pg_bwd(res, gs):
    table, ids_list = res
    dw = None
    for ids, g in zip(ids_list, gs):
        x = table[ids]  # backward-only raw-row gather; no forward dependency
        contrib = jnp.matmul(x.T, g, preferred_element_type=jnp.float32)
        dw = contrib if dw is None else dw + contrib
    dw = dw.astype(res[0].dtype) if dw is not None else None
    d_ids = [np.zeros(i.shape, dtype=jax.dtypes.float0) for i in ids_list]
    return jnp.zeros_like(table), dw, d_ids


project_gather.defvjp(_pg_fwd, _pg_bwd)

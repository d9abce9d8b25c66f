"""Pallas kernel for the sampler's one-hot column select.

``out[b, k] = rows[b, cols[b, k]]`` — the hot inner op of neighbor sampling
(tpu_sage/sample/sampler.py::select_columns). The XLA version materializes a
``(B, K, max_degree)`` compare-select intermediate; this kernel streams row
tiles through VMEM and reduces in-register, bounding live memory at one tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(rows_ref, cols_ref, out_ref):
    rows = rows_ref[:]                     # (TB, D) int32
    cols = cols_ref[:]                     # (TB, K) int32
    d = rows.shape[-1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, d), 2)
    hit = cols[:, :, None] == iota         # (TB, K, D)
    out_ref[:] = jnp.sum(jnp.where(hit, rows[:, None, :], 0), axis=-1)


@functools.partial(jax.jit, static_argnames=("tile_b", "interpret"))
def select_columns_pallas(
    rows: jnp.ndarray,   # (B, D) int32
    cols: jnp.ndarray,   # (B, K) int32
    tile_b: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    b, d = rows.shape
    k = cols.shape[1]
    pad = (-b) % tile_b
    if pad:
        rows = jnp.concatenate([rows, jnp.zeros((pad, d), rows.dtype)])
        cols = jnp.concatenate([cols, jnp.zeros((pad, k), cols.dtype)])
    grid = (rows.shape[0] // tile_b,)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_b, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows.shape[0], k), rows.dtype),
        interpret=interpret,
    )(rows, cols)
    return out[:b]

"""Pallas row-gather kernels: ``out[i] = table[ids[i]]``.

The framework's critical path is three *dependent* row gathers per step
(hop-1 adjacency -> hop-2 adjacency -> feature rows; see RESULTS.md
"Efficiency analysis"). XLA's gather on the axon v5e backend measures a
~0.6 ms per-call floor that is size-independent from 1k to 128k queries —
i.e. small gathers are pure latency. These kernels drive the DMA engines
directly: each grid step issues ``block_q`` independent row DMAs from HBM
into the output's VMEM window and only then waits, so row fetches overlap
each other instead of serializing behind a fixed-cost gather loop, and the
Pallas pipeline overlaps each block's write-back with the next block's
fetches (double buffering per pallas_guide "Async DMA" / "Double Buffering").

Two variants:
- ``gather_rows_pallas``: manual-DMA block gather (the contender).
- ``gather_rows_blockspec``: index-map gather, one row per grid step —
  the naive formulation, kept as a measurement foil (its issue rate is
  bounded by grid-step overhead).

Both are exact (bitwise equal to ``table[ids]``) and padded internally to a
block multiple; ids must be in-range (callers guarantee this — the sampler
produces in-range ids by construction).

Replaces: torch ``index_select`` in the reference's forward pass
(bkj/pytorch-graphsage models.py feature lookup; file empty at survey time,
see SURVEY.md §3.2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _block_kernel(ids_ref, table_ref, o_ref, sem, *, block_q: int):
    """One grid step: fetch block_q rows table[ids[base+q]] -> o_ref[q]."""
    base = pl.program_id(0) * block_q

    def dma(q):
        row = ids_ref[base + q]
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(row, 1), :],
            o_ref.at[pl.ds(q, 1), :],
            sem,
        )

    def start(q, carry):
        dma(q).start()
        return carry

    jax.lax.fori_loop(0, block_q, start, 0, unroll=True)

    def wait(q, carry):
        dma(q).wait()
        return carry

    jax.lax.fori_loop(0, block_q, wait, 0, unroll=True)


def gather_rows(
    table: jnp.ndarray,   # (n, d)
    ids: jnp.ndarray,     # (q,) int32, values in [0, n)
    block_q: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """out[i] = table[ids[i]] via manual row DMAs, block_q rows in flight."""
    (q,) = ids.shape
    n, d = table.shape
    pad = (-q) % block_q
    if pad:
        ids = jnp.concatenate([ids, jnp.zeros((pad,), ids.dtype)])
    q_pad = ids.shape[0]
    grid = (q_pad // block_q,)
    out = pl.pallas_call(
        functools.partial(_block_kernel, block_q=block_q),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(
                (block_q, d), lambda i, ids: (i, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[pltpu.SemaphoreType.DMA],
        ),
        out_shape=jax.ShapeDtypeStruct((q_pad, d), table.dtype),
        interpret=interpret,
    )(ids, table)
    return out[:q]


gather_rows_pallas = jax.jit(
    gather_rows, static_argnames=("block_q", "interpret")
)


def gather_rows_bf16(
    table: jnp.ndarray,   # (n, d) bfloat16, d even
    ids: jnp.ndarray,     # (q,) int32
    block_q: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """bf16 row gather via an int32 view.

    Mosaic cannot slice single rows of a packed-tiled bf16 VMEM buffer
    ("Slice shape along dimension 0 must be aligned to tiling (8)"), so the
    table is bitcast to ``(n, d//2)`` int32 — 32-bit types allow 1-row
    slices — gathered, and bitcast back. Callers should pre-bitcast the
    table once (``bitcast_table_i32``) so the per-step cost is only the
    cheap output-side view.
    """
    n, d = table.shape
    assert d % 2 == 0, "bf16 gather needs an even row width"
    ti32 = bitcast_table_i32(table)
    out = gather_rows(ti32, ids, block_q=block_q, interpret=interpret)
    return jax.lax.bitcast_convert_type(out, jnp.bfloat16).reshape(-1, d)


def bitcast_table_i32(table: jnp.ndarray) -> jnp.ndarray:
    """(n, d) bf16 -> (n, d//2) int32 bit view (one-time relayout)."""
    n, d = table.shape
    return jax.lax.bitcast_convert_type(
        table.reshape(n, d // 2, 2), jnp.int32
    )


def _row_kernel(ids_ref, row_ref, o_ref):
    o_ref[:] = row_ref[:]


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_rows_blockspec(
    table: jnp.ndarray,
    ids: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """out[i] = table[ids[i]] with the index-map formulation (1 row/step)."""
    (q,) = ids.shape
    n, d = table.shape
    out = pl.pallas_call(
        _row_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(q,),
            in_specs=[
                pl.BlockSpec((1, d), lambda i, ids: (ids[i], 0),
                             memory_space=pltpu.VMEM)
            ],
            out_specs=pl.BlockSpec((1, d), lambda i, ids: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((q, d), table.dtype),
        interpret=interpret,
    )(ids, table)
    return out

"""tpu_sage.ops.row_gather — the fast-lowering gather (RESULTS.md round 2c).

Contract: element-identical values AND gradients to plain ``table[ids]``
for in-bounds ids (the framework never produces OOB ids — adjacency entries
are valid node ids by construction); OOB ids yield zero rows instead of
XLA's clamp. Dispatches to ``QuantizedFeats.row_gather`` for int8 tables.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_sage.data.quantize import quantize_feats
from tpu_sage.ops import row_gather


@pytest.mark.parametrize("ids_shape", [(7,), (3, 5), (2, 3, 4)])
def test_row_gather_matches_plain(ids_shape):
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((50, 6)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 50, size=ids_shape), jnp.int32)
    np.testing.assert_array_equal(
        np.asarray(row_gather(table, ids)), np.asarray(table[ids])
    )


def test_row_gather_1d_table():
    rng = np.random.default_rng(1)
    degrees = jnp.asarray(rng.integers(0, 9, size=40), jnp.int32)
    ids = jnp.asarray(rng.integers(0, 40, size=13), jnp.int32)
    np.testing.assert_array_equal(
        np.asarray(row_gather(degrees, ids)), np.asarray(degrees[ids])
    )


def test_row_gather_oob_zero_fill():
    # the masked form zero-fills OOB rows (the default is "plain" since
    # round 3, which keeps XLA's clamp semantics)
    table = jnp.arange(12, dtype=jnp.float32).reshape(4, 3) + 1.0
    ids = jnp.asarray([-1, 0, 3, 4], jnp.int32)
    out = np.asarray(row_gather(table, ids, form="masked"))
    np.testing.assert_array_equal(out[0], 0.0)
    np.testing.assert_array_equal(out[3], 0.0)
    np.testing.assert_array_equal(out[1], np.asarray(table[0]))
    np.testing.assert_array_equal(out[2], np.asarray(table[3]))


def test_row_gather_gradient_matches_plain():
    rng = np.random.default_rng(2)
    table = jnp.asarray(rng.standard_normal((20, 4)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 20, size=9), jnp.int32)

    g_fast = jax.grad(lambda t: jnp.sum(jnp.sin(row_gather(t, ids))))(table)
    g_plain = jax.grad(lambda t: jnp.sum(jnp.sin(t[ids])))(table)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_plain))


def test_row_gather_quantized_dispatch():
    rng = np.random.default_rng(3)
    feats = rng.standard_normal((30, 8)).astype(np.float32)
    qf = quantize_feats(feats, out_dtype="float32")
    ids = jnp.asarray(rng.integers(0, 30, size=11), jnp.int32)
    np.testing.assert_array_equal(
        np.asarray(row_gather(qf, ids)), np.asarray(qf[ids])
    )


@pytest.mark.parametrize("form", ["masked", "plain"])
def test_row_gather_forms_agree_in_bounds(form):
    """Both lowering forms are value- and gradient-identical for valid ids
    (the form only picks the XLA emitter — ops.py module doc)."""
    rng = np.random.default_rng(4)
    table = jnp.asarray(rng.standard_normal((25, 5)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 25, size=(4, 3)), jnp.int32)
    np.testing.assert_array_equal(
        np.asarray(row_gather(table, ids, form=form)), np.asarray(table[ids])
    )
    g = jax.grad(lambda t: jnp.sum(jnp.cos(row_gather(t, ids, form=form))))(table)
    g_plain = jax.grad(lambda t: jnp.sum(jnp.cos(t[ids])))(table)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_plain))


@pytest.mark.parametrize("form", ["masked", "plain"])
def test_row_gather_quantized_form_passthrough(form):
    rng = np.random.default_rng(5)
    feats = rng.standard_normal((30, 8)).astype(np.float32)
    qf = quantize_feats(feats, out_dtype="float32")
    ids = jnp.asarray(rng.integers(0, 30, size=11), jnp.int32)
    np.testing.assert_array_equal(
        np.asarray(row_gather(qf, ids, form=form)), np.asarray(qf[ids])
    )


def test_row_gather_chunked_matches_plain(monkeypatch):
    """Chunked gather is element-identical to one gather, including the
    ceil-division remainder chunk and the below-threshold fallback."""
    import tpu_sage.ops as ops

    rng = np.random.default_rng(6)
    table = jnp.asarray(rng.standard_normal((64, 7)), jnp.float32)

    monkeypatch.setenv("TPU_SAGE_GATHER_CHUNKS", "4")
    monkeypatch.setattr(ops, "_CHUNK_MIN_ROWS", 8)
    for n in (7, 8, 16, 17, 18, 19, 101):  # below threshold, exact, remainders
        ids = jnp.asarray(rng.integers(0, 64, size=n), jnp.int32)
        np.testing.assert_array_equal(
            np.asarray(ops.row_gather_chunked(table, ids)), np.asarray(table[ids])
        )
    # 2-D ids fall back to the single gather path
    ids2 = jnp.asarray(rng.integers(0, 64, size=(5, 4)), jnp.int32)
    np.testing.assert_array_equal(
        np.asarray(ops.row_gather_chunked(table, ids2)), np.asarray(table[ids2])
    )


def test_row_gather_chunked_gradient_and_quantized(monkeypatch):
    import tpu_sage.ops as ops

    monkeypatch.setenv("TPU_SAGE_GATHER_CHUNKS", "3")
    monkeypatch.setattr(ops, "_CHUNK_MIN_ROWS", 4)
    rng = np.random.default_rng(7)
    table = jnp.asarray(rng.standard_normal((20, 4)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 20, size=10), jnp.int32)
    g = jax.grad(lambda t: jnp.sum(jnp.sin(ops.row_gather_chunked(t, ids))))(table)
    g_plain = jax.grad(lambda t: jnp.sum(jnp.sin(t[ids])))(table)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_plain))

    feats = rng.standard_normal((30, 8)).astype(np.float32)
    qf = quantize_feats(feats, out_dtype="float32")
    qids = jnp.asarray(rng.integers(0, 30, size=11), jnp.int32)
    np.testing.assert_array_equal(
        np.asarray(ops.row_gather_chunked(qf, qids)), np.asarray(qf[qids])
    )


def test_row_gather_fanout_mean_matches_unfused(monkeypatch):
    """Chunked gather+mean equals mean-of-gather, including ragged root
    chunks, the below-threshold fallback, and fewer roots than chunks."""
    import tpu_sage.ops as ops

    rng = np.random.default_rng(11)
    table = jnp.asarray(rng.standard_normal((50, 6)), jnp.float32)

    monkeypatch.setenv("TPU_SAGE_GATHER_CHUNKS", "4")
    monkeypatch.setattr(ops, "_CHUNK_MIN_ROWS", 8)
    for n_roots, fanout in ((16, 3), (17, 3), (3, 5), (2, 4), (1, 9)):
        ids = jnp.asarray(
            rng.integers(0, 50, size=n_roots * fanout), jnp.int32
        )
        want = np.asarray(table[ids]).reshape(n_roots, fanout, -1).mean(axis=1)
        got = np.asarray(ops.row_gather_fanout_mean(table, ids, fanout))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_row_gather_fanout_mean_gradient_and_quantized(monkeypatch):
    import tpu_sage.ops as ops

    monkeypatch.setenv("TPU_SAGE_GATHER_CHUNKS", "3")
    monkeypatch.setattr(ops, "_CHUNK_MIN_ROWS", 4)
    rng = np.random.default_rng(12)
    table = jnp.asarray(rng.standard_normal((30, 5)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 30, size=8 * 4), jnp.int32)

    def fused(t):
        return jnp.sum(jnp.sin(ops.row_gather_fanout_mean(t, ids, 4)))

    def unfused(t):
        return jnp.sum(jnp.sin(jnp.mean(t[ids].reshape(8, 4, -1), axis=1)))

    np.testing.assert_allclose(
        np.asarray(jax.grad(fused)(table)),
        np.asarray(jax.grad(unfused)(table)),
        rtol=1e-6,
        atol=1e-6,
    )

    feats = rng.standard_normal((25, 6)).astype(np.float32)
    qf = quantize_feats(feats, out_dtype="float32")
    qids = jnp.asarray(rng.integers(0, 25, size=6 * 3), jnp.int32)
    want = np.asarray(qf[qids]).reshape(6, 3, -1).mean(axis=1)
    np.testing.assert_allclose(
        np.asarray(ops.row_gather_fanout_mean(qf, qids, 3)),
        want,
        rtol=1e-6,
        atol=1e-6,
    )


@pytest.mark.parametrize(
    "agg", ["mean", "gcn", "max_pool", "mean_pool", "attention", "lstm"]
)
def test_model_fused_fanout_mean_matches_encode_gathered(agg, monkeypatch):
    """GSSupervised's identity-prep fast path (deepest-level
    gather+summarize fusion: per-root mean for mean/gcn — GCN re-weights it
    to span self — pooled MLP / attention / LSTM summaries per chunk for
    the rest) produces the same logits as feeding fully-gathered rows."""
    import tpu_sage.ops as ops
    from tpu_sage.nn.model import GSSupervised, default_layer_specs

    # force multi-chunk at these tiny shapes (3 ragged chunks over 8 roots)
    monkeypatch.setenv("TPU_SAGE_GATHER_CHUNKS", "3")
    monkeypatch.setattr(ops, "_CHUNK_MIN_ROWS", 8)
    # lstm is fused only under the 'all' escape hatch (excluded from the
    # default policy by measurement — nn/model.py); force it here so the
    # per-chunk LSTM summary math stays covered
    monkeypatch.setenv("TPU_SAGE_FUSE_LAST", "all")
    rng = np.random.default_rng(13)
    feats = jnp.asarray(rng.standard_normal((60, 12)), jnp.float32)
    levels = [
        jnp.asarray(rng.integers(0, 60, size=n), jnp.int32)
        for n in (8, 8 * 3, 8 * 3 * 2)
    ]
    model = GSSupervised(
        layer_specs=default_layer_specs((3, 2), output_dims=(16, 16)),
        n_classes=4,
        aggregator_class=agg,
        prep_class="identity",
    )
    params = model.init(jax.random.key(0), levels, feats)
    via_encode = model.apply(params, levels, feats)
    gathered = [feats[ids] for ids in levels]
    via_gathered = model.apply(
        params, levels, gathered, method=GSSupervised.forward_gathered
    )
    np.testing.assert_allclose(
        np.asarray(via_encode), np.asarray(via_gathered), rtol=1e-5, atol=1e-6
    )


def test_fuse_last_env_gate(monkeypatch):
    """TPU_SAGE_FUSE_LAST=0 restores the unfused last-level gather (the
    round-2e A/B escape hatch): the fused op is never called and the
    logits match the default path."""
    import tpu_sage.nn.model as M
    from tpu_sage.nn.model import GSSupervised, default_layer_specs

    rng = np.random.default_rng(21)
    feats = jnp.asarray(rng.standard_normal((40, 8)), jnp.float32)
    levels = [
        jnp.asarray(rng.integers(0, 40, size=n), jnp.int32) for n in (4, 12, 36)
    ]
    model = GSSupervised(
        layer_specs=default_layer_specs((3, 3), output_dims=(8, 8)), n_classes=3
    )
    params = model.init(jax.random.key(0), levels, feats)
    fused = np.asarray(model.apply(params, levels, feats))

    calls = []
    monkeypatch.setattr(
        M,
        "row_gather_fanout_mean",
        lambda *a, **k: calls.append(1) or (_ for _ in ()).throw(AssertionError),
    )
    monkeypatch.setenv("TPU_SAGE_FUSE_LAST", "0")
    unfused = np.asarray(model.apply(params, levels, feats))
    assert not calls
    np.testing.assert_allclose(fused, unfused, rtol=1e-5, atol=1e-6)


def test_row_gather_env_override_wins(monkeypatch):
    """TPU_SAGE_GATHER_FORM forces the form regardless of the call-site arg
    (whole-program A/B escape hatch). Read at trace time via
    tpu_sage.overrides.gather_form."""
    import tpu_sage.ops as ops

    monkeypatch.setenv("TPU_SAGE_GATHER_FORM", "masked")
    table = jnp.arange(12, dtype=jnp.float32).reshape(4, 3)
    ids = jnp.asarray([1, 9], jnp.int32)  # 9 is OOB: masked zero-fills, plain clamps
    out = np.asarray(ops.row_gather(table, ids, form="plain"))
    np.testing.assert_array_equal(out[1], 0.0)


def test_quantized_fanout_mean_int_sum(monkeypatch):
    """QuantizedFeats.fanout_mean (exact int32 row sum, one dequant per
    mean) matches dequantize-then-mean, and TPU_SAGE_INT8_SUMMEAN=0
    restores the per-row-dequant arithmetic exactly."""
    import tpu_sage.ops as ops
    from tpu_sage.data.quantize import quantize_feats

    monkeypatch.setenv("TPU_SAGE_GATHER_CHUNKS", "3")
    monkeypatch.setattr(ops, "_CHUNK_MIN_ROWS", 4)
    rng = np.random.default_rng(21)
    feats = rng.standard_normal((40, 7)).astype(np.float32) * 3.0
    qf = quantize_feats(feats, out_dtype="float32")
    ids = jnp.asarray(rng.integers(0, 40, size=9 * 5), jnp.int32)

    want = np.asarray(qf[ids]).reshape(9, 5, -1).mean(axis=1)
    got = np.asarray(ops.row_gather_fanout_mean(qf, ids, 5))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    # integer-sum formula verified directly: (sum q) * scale / fanout
    q = np.asarray(qf.q)[np.asarray(ids)].reshape(9, 5, -1).astype(np.int64)
    exact = q.sum(axis=1).astype(np.float32) * (
        np.asarray(qf.scale) / np.float32(5.0)
    )
    np.testing.assert_allclose(got, exact, rtol=1e-6, atol=1e-7)

    monkeypatch.setenv("TPU_SAGE_INT8_SUMMEAN", "0")
    old = np.asarray(ops.row_gather_fanout_mean(qf, ids, 5))
    np.testing.assert_allclose(old, want, rtol=1e-6, atol=1e-7)

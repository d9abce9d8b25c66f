"""Activation parity vs the torch-CPU oracle (SURVEY.md §4.2 #1-2).

Neighbor tables are injected (not sampled) so both engines see identical
trees; the flax params are exported to numpy and the oracle recomputes the
forward with torch ops. allclose at fp32 tolerances.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from tpu_sage.nn.aggregators import aggregator_lookup
from tpu_sage.nn.model import GSSupervised, default_layer_specs

from tests import torch_oracle

RTOL, ATOL = 1e-5, 1e-5


def _np_params(params):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), params)


def _levels(B=6, fanouts=(5, 3), n_nodes=40, seed=0):
    rng = np.random.default_rng(seed)
    sizes = [B]
    for f in fanouts:
        sizes.append(sizes[-1] * f)
    return [rng.integers(0, n_nodes, size=s).astype(np.int32) for s in sizes]


@pytest.mark.parametrize("agg_name", sorted(aggregator_lookup))
def test_aggregator_parity(agg_name):
    key = jax.random.key(0)
    B, F, D = 6, 5, 16
    x_self = jax.random.normal(key, (B, D))
    x_neigh = jax.random.normal(jax.random.key(1), (B, F, D))
    agg = aggregator_lookup[agg_name](output_dim=24, hidden_dim=32)
    params = agg.init(jax.random.key(2), x_self, x_neigh)
    out = np.asarray(agg.apply(params, x_self, x_neigh))

    oracle = torch_oracle.AGG_ORACLES[agg_name]
    ref = oracle(
        _np_params(params)["params"],
        torch.from_numpy(np.asarray(x_self)),
        torch.from_numpy(np.asarray(x_neigh)),
        combine="concat",
        activation="relu",
    ).numpy()
    np.testing.assert_allclose(out, ref, rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("agg_name", sorted(aggregator_lookup))
@pytest.mark.parametrize("prep_name", ["identity", "linear", "node_embedding"])
def test_full_model_parity(agg_name, prep_name):
    n_nodes, D = 40, 16
    feats = np.asarray(jax.random.normal(jax.random.key(3), (n_nodes, D)))
    levels_np = _levels(n_nodes=n_nodes)
    levels = [jnp.asarray(l) for l in levels_np]
    model = GSSupervised(
        layer_specs=default_layer_specs(fanouts=(5, 3), output_dims=(24, 24)),
        n_classes=7,
        aggregator_class=agg_name,
        prep_class=prep_name,
        n_nodes=n_nodes,
        agg_hidden_dim=32,
    )
    params = model.init(jax.random.key(4), levels, jnp.asarray(feats))
    out = np.asarray(model.apply(params, levels, jnp.asarray(feats)))

    ref = torch_oracle.gs_forward(
        _np_params(params),
        levels_np,
        feats,
        aggregator_class=agg_name,
        prep_class=prep_name,
        activations=("relu", "identity"),
        normalize=True,
    ).numpy()
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_gradient_parity_mean():
    """Input-gradient parity for the mean aggregator: torch autograd vs jax."""
    B, F, D = 4, 3, 8
    x_self = np.asarray(jax.random.normal(jax.random.key(5), (B, D)))
    x_neigh = np.asarray(jax.random.normal(jax.random.key(6), (B, F, D)))
    agg = aggregator_lookup["mean"](output_dim=10)
    params = agg.init(jax.random.key(7), jnp.asarray(x_self), jnp.asarray(x_neigh))

    g_self, g_neigh = jax.grad(
        lambda xs, xn: jnp.sum(jnp.square(agg.apply(params, xs, xn))), argnums=(0, 1)
    )(jnp.asarray(x_self), jnp.asarray(x_neigh))

    ts = torch.from_numpy(x_self).requires_grad_(True)
    tn = torch.from_numpy(x_neigh).requires_grad_(True)
    loss = torch_oracle.mean_agg(_np_params(params)["params"], ts, tn).square().sum()
    loss.backward()
    np.testing.assert_allclose(np.asarray(g_self), ts.grad.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_neigh), tn.grad.numpy(), rtol=1e-4, atol=1e-5)


def test_fused_first_layer_matches_standard():
    """fuse_first_layer (whole-table projection) is mathematically identical
    to the standard gather-then-project path."""
    n_nodes, D = 50, 16
    feats = jax.random.normal(jax.random.key(10), (n_nodes, D))
    levels_np = _levels(n_nodes=n_nodes, seed=3)
    levels = [jnp.asarray(l) for l in levels_np]
    kw = dict(
        layer_specs=default_layer_specs(fanouts=(5, 3), output_dims=(24, 24)),
        n_classes=4, aggregator_class="mean", prep_class="identity",
        n_nodes=n_nodes,
    )
    m_std = GSSupervised(**kw)
    m_fused = GSSupervised(**kw, fuse_first_layer=True)
    params = m_std.init(jax.random.key(11), levels, feats)
    a = np.asarray(m_std.apply(params, levels, feats))
    b = np.asarray(m_fused.apply(params, levels, feats))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)

    # GRADIENT parity: the custom-VJP (scatter-free dW) backward must match
    # autodiff through the standard path — this is what makes the fusion
    # usable for training (VERDICT round-1 #2)
    def loss_fn(model):
        def f(p):
            return jnp.sum(jnp.square(model.apply(p, levels, feats)))
        return f

    g_std = jax.grad(loss_fn(m_std))(params)
    g_fused = jax.grad(loss_fn(m_fused))(params)
    for (ka, ga), (kb, gb) in zip(
        jax.tree_util.tree_flatten_with_path(g_std)[0],
        jax.tree_util.tree_flatten_with_path(g_fused)[0],
    ):
        assert str(ka) == str(kb)
        np.testing.assert_allclose(
            np.asarray(ga), np.asarray(gb), rtol=1e-4, atol=1e-5,
            err_msg=str(ka),
        )

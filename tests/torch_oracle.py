"""PyTorch-CPU parity oracle (SURVEY.md §4.2).

With the reference mount empty, parity is defined against an independent
re-derivation of the documented GraphSAGE semantics (SURVEY.md §2.4, §3.2) in
torch. The oracle consumes the *flax parameter tree* (as numpy) and recomputes
the forward pass with torch ops — an independent compute engine checking the
same math, with neighbor tables injected so RNG never has to match.
"""

from __future__ import annotations

import numpy as np
import torch


def _t(x) -> torch.Tensor:
    return torch.from_numpy(np.asarray(x, dtype=np.float32))


def _linear(p, x, name):
    w = _t(p[name]["kernel"])  # flax layout (in, out)
    out = x @ w
    if "bias" in p[name]:
        out = out + _t(p[name]["bias"])
    return out


def _combine(p, x_self, summary, combine, activation):
    h_self = _linear(p, x_self, "fc_self")
    h_neigh = _linear(p, summary, "fc_neigh")
    out = torch.cat([h_self, h_neigh], dim=-1) if combine == "concat" else h_self + h_neigh
    if activation == "relu":
        out = torch.relu(out)
    return out


def mean_agg(p, x_self, x_neigh, combine="concat", activation="relu"):
    return _combine(p, x_self, x_neigh.mean(dim=1), combine, activation)


def pool_agg(p, x_self, x_neigh, pool, combine="concat", activation="relu"):
    h = torch.relu(_linear(p, x_neigh, "mlp"))
    summary = h.max(dim=1).values if pool == "max" else h.mean(dim=1)
    return _combine(p, x_self, summary, combine, activation)


def lstm_agg(p, x_self, x_neigh, combine="concat", activation="relu"):
    """Manual LSTM matching the hoisted fused-gate wiring (identical math to
    flax OptimizedLSTMCell): one (D, 4H) input projection ``lstm/xz`` (no
    bias), one (H, 4H) recurrent projection ``lstm/cell/hz`` (bias);
    gate order i, f, g, o."""
    lstm = p["lstm"]
    cell = lstm["cell"]
    B, F, D = x_neigh.shape
    H = cell["hz"]["kernel"].shape[0]
    h = torch.zeros(B, H)
    c = torch.zeros(B, H)
    for step in range(F):
        x = x_neigh[:, step, :]
        z = x @ _t(lstm["xz"]["kernel"]) + h @ _t(cell["hz"]["kernel"]) + _t(cell["hz"]["bias"])
        i, f, g, o = torch.split(z, H, dim=-1)
        i, f, o = torch.sigmoid(i), torch.sigmoid(f), torch.sigmoid(o)
        g = torch.tanh(g)
        c = f * c + i * g
        h = o * torch.tanh(c)
    return _combine(p, x_self, h, combine, activation)


def attention_agg(p, x_self, x_neigh, combine="concat", activation="relu"):
    q = x_self @ _t(p["att_q"]["kernel"])          # (B, K)
    k = x_neigh @ _t(p["att_k"]["kernel"])         # (B, F, K)
    scores = torch.einsum("bk,bfk->bf", q, k) / float(np.sqrt(q.shape[-1]))
    alpha = torch.softmax(scores, dim=-1)
    summary = torch.einsum("bf,bfd->bd", alpha, x_neigh)
    return _combine(p, x_self, summary, combine, activation)


def gcn_agg(p, x_self, x_neigh, combine="concat", activation="relu"):
    both = torch.cat([x_self.unsqueeze(1), x_neigh], dim=1)
    out = _linear(p, both.mean(dim=1), "fc")
    if activation == "relu":
        out = torch.relu(out)
    return out


AGG_ORACLES = {
    "mean": mean_agg,
    "max_pool": lambda p, s, n, **kw: pool_agg(p, s, n, "max", **kw),
    "mean_pool": lambda p, s, n, **kw: pool_agg(p, s, n, "mean", **kw),
    "lstm": lstm_agg,
    "attention": attention_agg,
    "gcn": gcn_agg,
}


def prep_forward(params, prep_class, ids, feats):
    ids = np.asarray(ids)
    if prep_class == "identity":
        return _t(feats[ids])
    p = params["params"]["prep"]
    if prep_class == "linear":
        return _linear(p, _t(feats[ids]), "fc")
    if prep_class == "node_embedding":
        emb = _t(p["embedding"]["embedding"])[torch.from_numpy(ids.astype(np.int64))]
        if feats is None:
            return emb
        return torch.cat([_t(feats[ids]), emb], dim=-1)
    raise ValueError(prep_class)


def gs_forward(
    params,
    levels,
    feats,
    aggregator_class="mean",
    prep_class="identity",
    activations=("relu", "identity"),
    combine="concat",
    normalize=True,
    return_embedding=False,
):
    """Full-model oracle mirroring GSSupervised.encode + fc (SURVEY.md §3.2)."""
    p = params["params"]
    h = [prep_forward(params, prep_class, ids, feats) for ids in levels]
    n_layers = len(levels) - 1
    agg = AGG_ORACLES[aggregator_class]
    for l in range(n_layers):
        pl_ = p[f"agg_layers_{l}"]
        nxt = []
        for d in range(len(h) - 1):
            n_self = h[d].shape[0]
            x_neigh = h[d + 1].reshape(n_self, -1, h[d + 1].shape[-1])
            nxt.append(agg(pl_, h[d], x_neigh, combine=combine, activation=activations[l]))
        h = nxt
    out = h[0]
    if normalize:
        out = out / out.norm(dim=-1, keepdim=True).clamp_min(1e-12)
    if return_embedding:
        return out
    return _linear(p, out, "fc")

"""Single-chip HBM capacity model: largest trainable/servable graph (round 5).

The 2.45M-node OGBN run proves one point of the envelope; users need the
curve (VERDICT r4 #6). This models the resident bytes of every storage
configuration and inverts it for the max node count at a given feature dim;
``scripts/bench_capacity.py`` probes the model on the real chip (a training
run near the predicted limit, and a graceful error past it).

What is resident during ``Trainer`` training (one graph on device —
``fit`` additionally uploads the FULL-edge eval graph; pass
``n_graphs=2`` for that product path):

- adjacency: dense ``n·max_degree`` int32, or CSR ``nnz + window`` ids +
  ``(n+1)`` int32 indptr (nnz ≤ n·max_degree; the window padding is ≤ 2
  extra rows)
- degrees ``n`` int32, targets ``n`` int32/f32 (d_t columns)
- features: ``n·d`` f32/bf16, or int8 ``n·d`` + ``d`` f32 scales
- per-step transient: gathered level rows (≈ B·(1+f1+f1·f2)·d·feat_bytes
  — the deepest level ships means when fused, but its raw chunks coexist
  in flight; keep the full tree as the conservative bound), backward
  scatter buffer of the same size, adjacency-row gathers, and XLA
  workspace. Modeled as 2.2× the tree bytes + fixed slack.

Exact full-graph inference (serving): features + FULL adjacency + two
layer-activation tables ``n·width·4`` (current + next) + chunk workspace.

Constants below are v5e (16 GiB); ``hbm_bytes`` overridable everywhere.
"""

from __future__ import annotations

import dataclasses
import json

HBM_BYTES = 16 * 1024**3          # v5e hardware
XLA_SLACK_BYTES = int(7.2e9)      # MEASURED round 5 (bench_logs/r5_capacity_*):
# the usable budget through this stack is ~10 GB of modeled residency —
# every configuration ran at ≤9.74 GB modeled and failed between 10.47 and
# 11.3 GB, independent of storage (the failure surfaces as an XLA
# compile-time HBM-planning error via the axon compile helper). Verified
# points, dense-bf16 602-wide train: 5.43M nodes (9.74 GB) OK / 5.85M
# (10.47 GB) FAIL / 6.33M (11.3 GB) FAIL; int8 9.73M (11.3 GB) FAIL; CSR
# 6.32M (11.3 GB) FAIL; exact-infer 1.87M OK / 2.61M FAIL. The slack
# covers libtpu/runtime reservations + program transients beyond the
# model; on a differently-provisioned host, override via hbm_bytes.


@dataclasses.dataclass(frozen=True)
class CapacityConfig:
    feat_dim: int = 602
    max_degree: int = 128
    avg_degree: int = 128         # CSR nnz/n (= max_degree when rows are full)
    batch_size: int = 512
    fanouts: tuple = (25, 10)
    feature: str = "bfloat16"     # "float32" | "bfloat16" | "int8"
    adjacency: str = "dense"      # "dense" | "csr"
    mode: str = "train"           # "train" | "infer"
    out_width: int = 256          # exact inference activation width (concat)
    n_graphs: int = 1             # 2 = the fit() path (train + full eval graph)


FEAT_BYTES = {"float32": 4, "bfloat16": 2, "int8": 1}


def resident_bytes(n_nodes: int, cfg: CapacityConfig) -> int:
    fb = FEAT_BYTES[cfg.feature]
    n = n_nodes
    feats = n * cfg.feat_dim * fb + (cfg.feat_dim * 4 if cfg.feature == "int8" else 0)
    if cfg.adjacency == "dense":
        adj = n * cfg.max_degree * 4
    else:
        adj = n * cfg.avg_degree * 4 + (n + 1) * 4
    fixed = feats + cfg.n_graphs * adj + n * 4 + n * 4   # + degrees + targets
    if cfg.mode == "infer":
        transient = 2 * n * cfg.out_width * 4
        b, f1 = 4096, cfg.max_degree
        transient += 3 * b * f1 * max(cfg.feat_dim * fb, cfg.out_width * 4)
    else:
        f1, f2 = cfg.fanouts
        tree_rows = cfg.batch_size * (1 + f1 + f1 * f2)
        # compute in bf16 regardless of storage (dequantized rows are bf16)
        transient = int(2.2 * tree_rows * cfg.feat_dim * max(fb, 2))
        transient += cfg.batch_size * (1 + f1) * (cfg.max_degree + 1) * 4
    return fixed + transient


def max_nodes(cfg: CapacityConfig, hbm_bytes: int = HBM_BYTES) -> int:
    """Largest n_nodes whose modeled residency fits ``hbm_bytes`` − slack.
    Returns 0 when nothing fits — an ``hbm_bytes`` at or below the measured
    slack (or a 1-node residency already over budget) has no envelope, and
    claiming max_nodes=1 there would be a silent lie (round-5 review
    finding: ``--hbm-gb 7`` printed a 1-node capacity on a device the model
    says fits nothing)."""
    budget = hbm_bytes - XLA_SLACK_BYTES
    if budget <= 0 or resident_bytes(1, cfg) > budget:
        return 0
    lo, hi = 1, 1
    while resident_bytes(hi, cfg) < budget:
        hi *= 2
    while lo < hi - 1:
        mid = (lo + hi) // 2
        if resident_bytes(mid, cfg) <= budget:
            lo = mid
        else:
            hi = mid
    return lo


def capacity_table(hbm_bytes: int = HBM_BYTES):
    """The envelope: max nodes per (storage × feature × mode) at two
    representative feature widths (Reddit's 602, OGBN-products' 100).
    float32 is the CLI default storage; bfloat16 (--compute-dtype) is the
    benched headline configuration."""
    rows = []
    for feat_dim, max_deg in ((602, 128), (100, 64)):
        for adjacency in ("dense", "csr"):
            for feature in ("float32", "bfloat16", "int8"):
                for mode in ("train", "infer"):
                    cfg = CapacityConfig(
                        feat_dim=feat_dim, max_degree=max_deg,
                        avg_degree=max_deg, feature=feature,
                        adjacency=adjacency, mode=mode,
                    )
                    rows.append({
                        "feat_dim": feat_dim, "max_degree": max_deg,
                        "adjacency": adjacency, "feature": feature,
                        "mode": mode, "max_nodes": max_nodes(cfg, hbm_bytes),
                    })
    return rows


def _run_config(n_nodes: int, feat_dim: int, max_degree: int,
                csr: bool, feature: str, n_graphs: int) -> CapacityConfig:
    del n_nodes
    return CapacityConfig(feat_dim=feat_dim, max_degree=max_degree,
                          avg_degree=max_degree, feature=feature,
                          adjacency="csr" if csr else "dense",
                          n_graphs=n_graphs)


def over_budget(n_nodes: int, feat_dim: int, max_degree: int,
                csr: bool, feature: str, n_graphs: int = 2,
                hbm_bytes: int = HBM_BYTES) -> bool:
    """Does the modeled training residency exceed the measured usable
    budget? Used by the CLI to classify an opaque compile failure (the axon
    backend surfaces HBM-planning failures as an HTTP-500 compile-helper
    crash, not a RESOURCE_EXHAUSTED string).

    ``feature`` is the run's ACTUAL on-device storage ("float32" |
    "bfloat16" | "int8" — the CLI derives it from feature_int8 +
    compute_dtype); ``n_graphs=2`` is the ``fit()`` product path, which
    uploads the train-edge AND full-edge graphs (module docstring)."""
    est = resident_bytes(
        n_nodes, _run_config(n_nodes, feat_dim, max_degree, csr, feature,
                             n_graphs),
    )
    return est > hbm_bytes - XLA_SLACK_BYTES


def oom_advice(n_nodes: int, feat_dim: int, max_degree: int,
               csr: bool, feature: str, n_graphs: int = 2) -> str:
    """Actionable message for a RESOURCE_EXHAUSTED during graph upload or
    the first training step (wired into the CLI)."""
    tips = []
    if feature == "float32":
        tips.append("--compute-dtype bfloat16 (halves the feature table)")
    if not csr:
        tips.append("--csr-adjacency (adjacency at nnz instead of "
                    "n*max_degree ids; measured 93% of dense throughput)")
    if feature != "int8":
        tips.append("--feature-int8 (features at 1 byte/element + per-column "
                    "scales; lossy but quality-verified at Reddit scale)")
    tips.append("--partitioned over more chips (node-sharded storage)")
    est = resident_bytes(
        n_nodes, _run_config(n_nodes, feat_dim, max_degree, csr, feature,
                             n_graphs),
    )
    return (
        f"graph does not fit device memory: ~{est / 1e9:.1f} GB modeled for "
        f"{n_nodes} nodes x {feat_dim} feats (max_degree {max_degree}, "
        f"{'csr' if csr else 'dense'} adjacency, {feature} features, "
        f"{n_graphs} resident graph(s)). Options: "
        + "; ".join(tips)
        + ". See `python -m tpu_sage.bench.capacity` for the envelope."
    )


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--hbm-gb", type=float, default=HBM_BYTES / 1024**3,
                    help="device HBM in GiB (default 16 = v5e; pass 32 for "
                         "v4/v5p-class chips — the measured slack is kept)")
    args = ap.parse_args(argv)
    hbm = int(args.hbm_gb * 1024**3)
    try:
        header = {"hbm_gb": args.hbm_gb, "slack_gb": XLA_SLACK_BYTES / 1e9}
        if hbm <= XLA_SLACK_BYTES:
            header["note"] = ("hbm at or below the measured runtime slack — "
                              "nothing fits; all max_nodes rows are 0")
        print(json.dumps(header))
        for row in capacity_table(hbm):
            print(json.dumps(row))
    except BrokenPipeError:  # `... | head` is a normal way to read this
        pass


if __name__ == "__main__":
    main()

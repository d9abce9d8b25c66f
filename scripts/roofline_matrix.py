"""Per-aggregator roofline verdicts (VERDICT r4 #4).

For each aggregator at the bench config (batch 512, fanout (25,10), dims
(128,128), hidden 512, bf16): exact FLOPs/step of the REAL jitted train step
from XLA's own cost model (``compiled.cost_analysis()['flops']`` — a program
property, read on the CPU backend so no chip time is spent), combined with
the measured ms/step to give achieved TFLOPS, % of MXU peak, and % of the
descriptor-engine saturation floor — whichever binds names the verdict.

Roofline constants (measured this repo):
- MXU peak: ~197 TFLOPS bf16 (v5e, public spec)
- descriptor-engine saturation: ~13.4 ns/row with overlapped streams
  (RESULTS r3 §4 + r5 breakdown: the 155k-row step's gather stage measures
  1.90 ms = 13.46 ns/row at 10 streams, flat past 4)
- rows/step at (25,10)×512: feature 141,312 + adjacency 13,824 = 155,136
  (lstm/pools/attention gather the same tree — storage-independent)

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/roofline_matrix.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

MXU_PEAK_TFLOPS = 197.0          # v5e bf16
SAT_NS_PER_ROW = 13.4            # measured multi-stream descriptor saturation
IDEAL_NS_PER_ROW = 7.0           # zero-width per-op descriptor intercept
ROWS_PER_STEP = 155_136          # 512+12,800+128,000 feats + 512+13,312 adj

# measured ms/step at HEAD (bench.py median-of-5, round-4 matrix — RESULTS r4
# §5; mean/gcn reconfirmed round 5 session start)
MEASURED_MS = {
    "mean": 2.253, "gcn": 2.215, "mean_pool": 3.95, "max_pool": 4.20,
    "attention": 4.81, "lstm": 20.5,
}


def main():
    from tpu_sage.data.synthetic import sbm_store
    from tpu_sage.train.trainer import TrainConfig, Trainer, build_model

    # tiny graph, REAL tree shapes: FLOPs depend on level sizes, not n_nodes
    store = sbm_store(n_nodes=2048, n_classes=41, feat_dim=602,
                      max_degree=32, seed=0)
    rows = []
    for agg in ["mean", "gcn", "mean_pool", "max_pool", "attention", "lstm"]:
        config = TrainConfig(
            aggregator_class=agg, batch_size=512,
            n_train_samples=(25, 10), n_val_samples=(25, 10),
            output_dims=(128, 128), agg_hidden_dim=512,
            compute_dtype="bfloat16", epochs=1,
        )
        model = build_model(config, store.n_nodes, store.n_classes)
        trainer = Trainer(model, config, steps_per_epoch=1, task=store.task)
        graph = store.to_device(train=True, dtype=jnp.bfloat16)
        state = trainer.init_state(graph)
        ids = jnp.zeros((512,), jnp.int32)
        tgt = jnp.zeros((512,), store.targets.dtype)

        lowered = jax.jit(
            lambda st, g, i, t: trainer.train_step(st, g, i, t)
        ).lower(state, graph, ids, tgt)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        gflop = float(cost["flops"]) / 1e9

        ms = MEASURED_MS[agg]
        tflops = gflop / ms
        mxu_pct = 100 * tflops / MXU_PEAK_TFLOPS
        compute_floor_ms = gflop / MXU_PEAK_TFLOPS
        gather_sat_ms = ROWS_PER_STEP * SAT_NS_PER_ROW * 1e-6
        gather_ideal_ms = ROWS_PER_STEP * IDEAL_NS_PER_ROW * 1e-6
        floor = max(compute_floor_ms, gather_sat_ms)
        if compute_floor_ms > gather_sat_ms:
            bind = "compute"
        elif ms <= gather_sat_ms * 1.25:
            bind = "gather (at saturation floor)"
        else:
            bind = "open"
        rows.append({
            "aggregator": agg, "gflop_per_step": round(gflop, 1),
            "measured_ms": ms, "achieved_tflops": round(tflops, 1),
            "mxu_pct": round(mxu_pct, 1),
            "compute_floor_ms": round(compute_floor_ms, 2),
            "gather_saturation_ms": round(gather_sat_ms, 2),
            "gather_ideal_ms": round(gather_ideal_ms, 2),
            "pct_of_binding_floor": round(100 * floor / ms, 1),
            "verdict": bind,
        })
        print(json.dumps(rows[-1]), flush=True)


if __name__ == "__main__":
    main()

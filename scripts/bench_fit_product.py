"""The PRODUCT fit() path at headline scale (round-5 continuation).

bench.py drives Trainer.train_epoch directly with a hand-uploaded bf16
graph; the CLI path (`fit()`) built its own device graphs and — until the
round-5 review fix — stored features f32 regardless of compute_dtype, so
the benched configuration was unreachable through the product path. This
script proves the fix on-chip: `fit()` at the canonical Reddit config
(bf16 compute dtype, batch 512, fanouts (25,10)) must reproduce the
headline's per-step time (~2.26 ms → ~1.03 s per 455-step epoch).

    python scripts/bench_fit_product.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from tpu_sage.data.problem import NodeProblem
    from tpu_sage.data.synthetic import bench_store
    from tpu_sage.train.trainer import TrainConfig, fit

    store = bench_store()
    problem = NodeProblem(store)
    config = TrainConfig(
        batch_size=512, n_train_samples=(25, 10), n_val_samples=(25, 10),
        output_dims=(128, 128), compute_dtype="bfloat16", epochs=4,
    )
    import jax.numpy as jnp

    trainer, state, history = fit(problem, config, eval_every_epoch=False)
    # same key fit() used -> the cached device graph it trained on
    graph = problem.device_graph(train=True, dtype=jnp.bfloat16)
    n_steps = max(1, len(problem.folds["train"]) // config.batch_size)
    edges_per_step = config.batch_size * (25 + 25 * 10)
    rows = []
    for h in history:
        if "elapsed" in h:
            ms = 1e3 * h["elapsed"] / n_steps
            rows.append({
                "epoch": h.get("epoch"), "elapsed_s": round(h["elapsed"], 3),
                "ms_per_step": round(ms, 3),
                "edges_per_s": round(n_steps * edges_per_step / h["elapsed"]),
            })
    print(json.dumps({
        "path": "fit() product path", "steps_per_epoch": n_steps,
        "feat_dtype_on_device": str(graph.feats.dtype),
        "epochs": rows,
    }), flush=True)


if __name__ == "__main__":
    main()

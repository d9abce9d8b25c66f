"""The converter CLI end-to-end on a checked-in williamleif-layout fixture
(reference convert.py contract, SURVEY.md §3.4)."""

import json
import os
import subprocess
import sys

import numpy as np

FIXTURE = os.path.join(os.path.dirname(__file__), "data", "toy-graph")


def test_convert_cli_roundtrip(tmp_path):
    out = str(tmp_path / "problem.h5")
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        + os.pathsep + env.get("PYTHONPATH", "")
    )
    r = subprocess.run(
        [sys.executable, "-m", "tpu_sage.data.convert",
         "--inpath", FIXTURE, "--outpath", out,
         "--max-degree", "8", "--n-walks", "2", "--walk-length", "3"],
        capture_output=True, text=True, timeout=120, env=env,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    meta = json.loads(r.stdout.strip().splitlines()[-1])
    assert meta["n_nodes"] == 24
    assert meta["task"] == "multilabel_classification"
    assert meta["n_classes"] == 3

    from tpu_sage.data.problem import NodeProblem

    p = NodeProblem.from_h5(out)
    assert p.task == "multilabel_classification"
    assert p.store.targets.shape == (24, 3)
    assert p.walks is not None and p.walks.shape == (24, 2, 4)
    # fold semantics: val/test flags from the node-link attrs
    assert len(p.folds["val"]) == 4 and len(p.folds["test"]) == 4
    # it trains
    from tpu_sage.train.trainer import TrainConfig, fit

    cfg = TrainConfig(batch_size=8, epochs=1, n_train_samples=(3, 2),
                      n_val_samples=(3, 2), output_dims=(8, 8))
    _, _, hist = fit(p, cfg, log=lambda d: None)
    assert np.isfinite(hist[0]["train_loss"])

"""The five canonical dataset presets (BASELINE.json configs / SURVEY.md §2.4 #7)
load and train end-to-end on shape-matched synthetic problems."""

import glob
import os

import pytest

from tpu_sage.data.synthetic import sbm_problem
from tpu_sage.train.trainer import TrainConfig, fit

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


def test_all_presets_parse():
    paths = sorted(glob.glob(os.path.join(CONFIG_DIR, "*.json")))
    assert len(paths) == 5, paths
    for p in paths:
        cfg = TrainConfig.from_json(p)
        assert cfg.epochs > 0 and len(cfg.n_train_samples) == 2


@pytest.mark.parametrize(
    "preset,task",
    [
        ("cora_mean.json", "classification"),
        ("pubmed_maxpool.json", "classification"),
        ("ppi_lstm.json", "multilabel_classification"),
        ("reddit_mean.json", "classification"),
        ("ogbn_products_dist.json", "classification"),
    ],
)
def test_preset_trains(preset, task):
    cfg = TrainConfig.from_json(os.path.join(CONFIG_DIR, preset))
    # shrink for CPU test speed; keep aggregator/prep/schedule/task shape
    cfg = cfg.replace(
        epochs=2, batch_size=32, n_train_samples=(4, 3), n_val_samples=(4, 3),
        output_dims=(16, 16), agg_hidden_dim=32,
    )
    problem = sbm_problem(n_nodes=300, n_classes=5, feat_dim=16, task=task, seed=13)
    _, _, hist = fit(problem, cfg, log=lambda d: None)
    assert hist[-1]["train_loss"] < hist[0]["train_loss"] * 1.05
    assert "val_metric" in hist[-1]


def test_unknown_config_key_raises(tmp_path):
    import json

    p = tmp_path / "bad.json"
    p.write_text(json.dumps({"batch_sizee": 64}))
    with pytest.raises(ValueError, match="unknown config keys"):
        TrainConfig.from_json(str(p))

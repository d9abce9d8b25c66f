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


def test_perf_knobs_round_trip(tmp_path):
    """The measured-perf knobs are TrainConfig fields (VERDICT r2 #5): they
    json-round-trip and reach the model; env vars are explicit overrides
    handled by tpu_sage.overrides, not library defaults."""
    import json

    from tpu_sage.train.trainer import build_model

    cfg = TrainConfig(gather_form="plain", gather_chunks=2, fuse_last="off",
                      int8_summean=False)
    p = tmp_path / "c.json"
    p.write_text(json.dumps({"gather_form": "plain", "gather_chunks": 2,
                             "fuse_last": "off", "int8_summean": False}))
    loaded = TrainConfig.from_json(str(p))
    for f in ("gather_form", "gather_chunks", "fuse_last", "int8_summean"):
        assert getattr(loaded, f) == getattr(cfg, f)
    model = build_model(cfg, n_nodes=10, n_classes=2)
    assert (model.gather_form, model.gather_chunks,
            model.fuse_last, model.int8_summean) == ("plain", 2, "off", False)


def test_env_overrides_win(monkeypatch):
    """TPU_SAGE_* env vars override the configured knob values (the
    documented whole-program A/B escape hatch), including the legacy 0/1
    spellings of FUSE_LAST."""
    from tpu_sage import overrides

    monkeypatch.delenv("TPU_SAGE_GATHER_FORM", raising=False)
    assert overrides.gather_form("plain") == "plain"
    assert overrides.gather_form(None) is None
    monkeypatch.setenv("TPU_SAGE_GATHER_FORM", "masked")
    assert overrides.gather_form("plain") == "masked"

    monkeypatch.setenv("TPU_SAGE_GATHER_CHUNKS", "1")
    assert overrides.gather_chunks(4) == 1
    monkeypatch.delenv("TPU_SAGE_GATHER_CHUNKS")
    assert overrides.gather_chunks(4) == 4

    for env_val, resolved in (("0", "off"), ("1", "auto"), ("all", "all")):
        monkeypatch.setenv("TPU_SAGE_FUSE_LAST", env_val)
        assert overrides.fuse_last("auto") == resolved
    monkeypatch.delenv("TPU_SAGE_FUSE_LAST")
    assert overrides.fuse_last("off") == "off"

    monkeypatch.setenv("TPU_SAGE_INT8_SUMMEAN", "0")
    assert overrides.int8_summean(True) is False
    monkeypatch.delenv("TPU_SAGE_INT8_SUMMEAN")
    assert overrides.int8_summean(True) is True


def test_knob_variants_match_default_numerics():
    """Every knob setting is a pure lowering/A-B choice: final metrics on a
    small problem match the default config's run (same seed, same batches —
    the fused/unfused and chunked/unchunked paths are numerically equivalent
    reductions on f32 CPU)."""
    problem = sbm_problem(n_nodes=400, n_classes=4, feat_dim=16, avg_degree=6,
                          seed=11)

    def final_loss(**kw):
        cfg = TrainConfig(batch_size=64, epochs=2, n_train_samples=(5, 3),
                          n_val_samples=(5, 3), output_dims=(32, 32), **kw)
        _, _, hist = fit(problem, cfg, log=lambda d: None,
                         eval_every_epoch=False)
        return hist[-1]["train_loss"]

    base = final_loss()
    assert final_loss(fuse_last="off") == pytest.approx(base, rel=1e-4)
    assert final_loss(gather_chunks=1) == pytest.approx(base, rel=1e-4)
    assert final_loss(gather_form="masked") == pytest.approx(base, rel=1e-4)
    # round-5 mixed per-level forms: same values, different lowerings
    assert final_loss(gather_form="masked_chunked") == pytest.approx(
        base, rel=1e-4)
    assert final_loss(gather_form="masked_chunked",
                      gather_form_deep="plain") == pytest.approx(base, rel=1e-4)
    assert final_loss(gather_form="masked",
                      gather_form_deep="plain") == pytest.approx(base, rel=1e-4)


def test_checkpoint_records_config(tmp_path):
    """Checkpoints carry the config they were trained with (VERDICT r2 #5
    'recorded in checkpoint metadata')."""
    from tpu_sage.train.checkpoint import read_checkpoint_config

    problem = sbm_problem(n_nodes=300, n_classes=3, feat_dim=8, avg_degree=5,
                          seed=3)
    cfg = TrainConfig(batch_size=32, epochs=2, n_train_samples=(4, 2),
                      n_val_samples=(4, 2), output_dims=(16, 16),
                      gather_chunks=2, fuse_last="off")
    ck = str(tmp_path / "c.npz")
    fit(problem, cfg, log=lambda d: None, eval_every_epoch=False,
        resume_from=ck, checkpoint_every=1)
    stored = read_checkpoint_config(ck)
    assert stored is not None
    assert stored["gather_chunks"] == 2
    assert stored["fuse_last"] == "off"
    assert stored["batch_size"] == 32

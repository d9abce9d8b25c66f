"""CLI argument plumbing tests (in-process main() on the CPU backend)."""

import json

import jax
import pytest

from tpu_sage.cli import main, parse_args


def _capture(capsys):
    out = capsys.readouterr().out.strip().splitlines()
    return [json.loads(l) for l in out if l.startswith("{")]


def test_unknown_aggregator_exits_2(capsys):
    rc = main(["--synthetic", "sbm", "--aggregator-class", "bogus"])
    assert rc == 2


def test_mismatched_dims_exits_2():
    rc = main(["--synthetic", "sbm", "--n-train-samples", "25,10",
               "--output-dims", "128"])
    assert rc == 2


def test_unknown_schedule_exits_2():
    rc = main(["--synthetic", "sbm", "--lr-schedule", "nope"])
    assert rc == 2


def test_missing_problem_file_clean_error(capsys):
    """A nonexistent --problem-path must exit with a clean message, not an
    h5py OSError traceback (verify-skill gotcha, fixed round 5)."""
    with pytest.raises(SystemExit) as ei:
        main(["--problem-path", "/tmp/definitely_not_here.h5"])
    assert "problem file not found" in str(ei.value)


def test_missing_checkpoint_clean_error(tmp_path):
    """export.py with a nonexistent --checkpoint exits cleanly (np.load's
    raw FileNotFoundError was the round-5 rough edge)."""
    from tpu_sage.export import main as export_main

    with pytest.raises(SystemExit) as ei:
        export_main(["--synthetic", "sbm", "--synthetic-nodes", "300",
                     "--checkpoint", "/tmp/definitely_not_here.npz",
                     "--out", str(tmp_path / "o.npy"),
                     "--n-train-samples", "4,3", "--n-val-samples", "4,3",
                     "--output-dims", "16,16"])
    assert "checkpoint not found" in str(ei.value)


def test_end_to_end_tiny(capsys):
    rc = main(["--synthetic", "sbm", "--synthetic-nodes", "300",
               "--n-train-samples", "4,3", "--n-val-samples", "4,3",
               "--output-dims", "16,16", "--batch-size", "32",
               "--epochs", "1"])
    assert rc == 0
    recs = _capture(capsys)
    assert any("train_loss" in r for r in recs)
    assert any("final_test_metric" in r for r in recs)


def test_config_preset_with_explicit_default_value(capsys, tmp_path):
    """A flag passed with its argparse-default VALUE still overrides the
    preset (regression for the raw-argv explicitness fix)."""
    preset = tmp_path / "p.json"
    preset.write_text(json.dumps({
        "batch_size": 1024, "epochs": 7, "lr_schedule": "linear",
        "n_train_samples": [4, 3], "n_val_samples": [4, 3],
        "output_dims": [16, 16],
    }))
    rc = main(["--config", str(preset), "--synthetic", "sbm",
               "--synthetic-nodes", "300", "--batch-size", "256",
               "--epochs", "1", "--no-eval"])
    assert rc == 0
    cfg = _capture(capsys)[0]["config"]
    assert cfg["batch_size"] == 256     # explicit flag (== argparse default)
    assert cfg["epochs"] == 1           # explicit flag
    assert cfg["lr_schedule"] == "linear"  # preset value kept


def test_oom_exits_with_capacity_advice(monkeypatch, capsys):
    """A RESOURCE_EXHAUSTED during training surfaces the capacity envelope
    and the storage remedies instead of a raw XLA traceback (round 5;
    SURVEY §7.3 #6 HBM discipline)."""
    import tpu_sage.cli as cli_mod

    def boom(args, problem, config, log):
        raise RuntimeError("RESOURCE_EXHAUSTED: Out of memory allocating "
                           "12345 bytes")

    monkeypatch.setattr(cli_mod, "_run_fit", boom)
    rc = cli_mod.main(["--synthetic", "sbm", "--synthetic-nodes", "120",
                       "--n-train-samples", "3,2", "--n-val-samples", "3,2",
                       "--output-dims", "8,8", "--batch-size", "16",
                       "--epochs", "1"])
    err = capsys.readouterr().err
    assert rc == 1
    assert "does not fit device memory" in err
    assert "--csr-adjacency" in err and "--feature-int8" in err

    # other errors still propagate unwrapped
    def other(args, problem, config, log):
        raise RuntimeError("something else")

    monkeypatch.setattr(cli_mod, "_run_fit", other)
    with pytest.raises(RuntimeError, match="something else"):
        cli_mod.main(["--synthetic", "sbm", "--synthetic-nodes", "120",
                      "--n-train-samples", "3,2", "--n-val-samples", "3,2",
                      "--output-dims", "8,8", "--batch-size", "16",
                      "--epochs", "1"])


def test_compile_crash_on_fitting_partitioned_run_reraises(monkeypatch):
    """An opaque tpu_compile_helper crash on a --partitioned run whose
    PER-DEVICE shard fits the budget must re-raise, not be swallowed as
    out-of-memory: partitioned storage is node-sharded across the mesh, so
    the whole-graph residency the classifier previously modeled is wrong by
    a factor of the device count (round-5 review finding)."""
    import tpu_sage.cli as cli_mod
    from tpu_sage.bench import capacity as cap_mod

    def boom(args, problem, config, log):
        raise RuntimeError("tpu_compile_helper returned 500")

    # force the WHOLE graph over budget while any per-device shard (the
    # 120-node store over >=2 virtual devices) stays under it
    per_device = -(-120 // max(1, jax.device_count()))
    real_over = cap_mod.over_budget

    def fake_over(n_nodes, *a, **kw):
        return n_nodes > per_device

    monkeypatch.setattr(cli_mod, "_run_fit", boom)
    monkeypatch.setattr(cap_mod, "over_budget", fake_over)
    with pytest.raises(RuntimeError, match="tpu_compile_helper"):
        cli_mod.main(["--synthetic", "sbm", "--synthetic-nodes", "120",
                      "--n-train-samples", "3,2", "--n-val-samples", "3,2",
                      "--output-dims", "8,8", "--batch-size", "16",
                      "--epochs", "1", "--partitioned"])
    # the same crash WITHOUT --partitioned models whole-graph residency,
    # which the fake marks over budget -> classified with remedies
    rc = cli_mod.main(["--synthetic", "sbm", "--synthetic-nodes", "120",
                       "--n-train-samples", "3,2", "--n-val-samples", "3,2",
                       "--output-dims", "8,8", "--batch-size", "16",
                       "--epochs", "1"])
    assert rc == 1
    monkeypatch.setattr(cap_mod, "over_budget", real_over)


def test_parse_ints():
    args = parse_args(["--synthetic", "sbm", "--n-train-samples", "5,3,2"])
    assert args.n_train_samples == "5,3,2"


def test_partitioned_halo_measured_cli(capsys):
    """--halo measured races on the live mesh at startup; the resolved mode
    and per-mode ms/step reach the log, and the run completes."""
    rc = main(["--synthetic", "sbm", "--synthetic-nodes", "300",
               "--n-train-samples", "4,3", "--n-val-samples", "4,3",
               "--output-dims", "16,16", "--batch-size", "32",
               "--epochs", "1", "--partitioned", "--halo", "measured",
               "--halo-measure-steps", "2"])
    assert rc == 0
    recs = _capture(capsys)
    resolved = next(r for r in recs if "halo" in r)
    assert resolved["halo"] in ("exact", "ring", "pipelined")
    # a sub-noise margin abstains to the auto default and logs
    # halo_measured_fallback separately; the timings stay purely numeric
    assert set(resolved["halo_measured_ms"]) == {
        "exact", "ring", "pipelined"}

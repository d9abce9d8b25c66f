"""Tracing subsystem (SURVEY.md §5.1): the profiler harness must actually
produce a Perfetto trace artifact — on the CPU backend, where jax.profiler
works (the axon TPU tunnel hangs on start_trace; documented in
bench/profile.py)."""

import glob
import os

from tpu_sage.bench.profile import profile_steps


def test_trace_artifact_is_written(tmp_path):
    out = profile_steps(str(tmp_path), steps=3, batch_size=32, trace=True,
                        n_nodes=512, feat_dim=16)
    assert out["trace_dir"] == str(tmp_path)
    assert out["ms_per_step"] > 0
    traces = glob.glob(str(tmp_path) + "/**/*.trace.json.gz", recursive=True)
    xplanes = glob.glob(str(tmp_path) + "/**/*.xplane.pb", recursive=True)
    assert traces, "no Perfetto trace written"
    assert xplanes, "no xplane profile written"
    assert os.path.getsize(traces[0]) > 0

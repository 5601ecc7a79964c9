"""Standing gate for the streaming differential fuzzer
(tools/stream_fuzz.py): a pinned block of random windowed-aggregation
configs must produce identical results through the Structured Streaming
replay path and the batch path (plus the DuckDB leg on tumbling
configs). Deep sweeps run via the CLI and are recorded in BASELINE.md;
divergent seeds found there get pinned here after the fix."""

from __future__ import annotations

from tools.stream_fuzz import SF_DIR_DEFAULT, gen_config, run_config

PINNED_SEEDS = list(range(10))


def test_pinned_stream_configs_agree(spark):
    failures = []
    for seed in PINNED_SEEDS:
        ok, msg = run_config(spark, gen_config(seed), SF_DIR_DEFAULT)
        if not ok:
            failures.append(f"seed={seed}: {msg}\n  cfg: {gen_config(seed)}")
    assert not failures, "\n".join(failures)


def test_config_space_is_not_trivial():
    """Over the pinned block both output modes, sliding windows, keys,
    filters and multi-file replays must all appear — a collapsed
    generator would agree vacuously."""
    cfgs = [gen_config(s) for s in PINNED_SEEDS]
    assert any(c["mode"] == "append" for c in cfgs)
    assert any(c["mode"] == "complete" for c in cfgs)
    assert any(c["slide_min"] for c in cfgs)
    assert any(c["kind"] == "session" for c in cfgs)
    assert any(c["key"] for c in cfgs)
    assert any(c["filter"] for c in cfgs)
    assert any(c["n_files"] > 2 for c in cfgs)

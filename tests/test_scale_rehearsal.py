"""Smoke-pin the scale-rehearsal harness itself (tools/scale_rehearsal.py).

The rehearsal tool is the evidence chain behind every BASELINE.md scale
claim, so its replication arithmetic and op wiring deserve the same
regression protection as the operators it measures. These tests run the
two cheapest tiers (text, multimodal) at k=2 on sf0.001 with the Spark-UI
metric capture stubbed out (the shared test session runs with
spark.ui.enabled=false), and assert the exact-scaling invariants the
100x BASELINE.md records rely on: doc counts double, fingerprint
cardinality doubles, payload bytes double (every copy's suffix token is
the same length), the 1:N frame explosion is exactly 4x docs, and the
vocabulary-bounded reductions (top-25 TF-IDF, 8 BPE merges) are scale-
independent.
"""

from __future__ import annotations

import importlib.util
import sys

import pytest

_SPEC = importlib.util.spec_from_file_location(
    "scale_rehearsal", "/root/repo/tools/scale_rehearsal.py"
)
sr = importlib.util.module_from_spec(_SPEC)
sys.modules["scale_rehearsal"] = sr
_SPEC.loader.exec_module(sr)

_ZERO = {
    "shuffle_read_mb": 0,
    "shuffle_write_mb": 0,
    "n_stages": 0,
    "peak_jvm_heap_mb": 0,
}


@pytest.fixture(autouse=True)
def _tiny_sf(monkeypatch):
    monkeypatch.setattr(sr, "SF_DIR", "/root/testdata/sf0.001")
    monkeypatch.setattr(sr, "_metrics", lambda spark: dict(_ZERO))


def test_text_tier_invariants(spark):
    r = sr.text_tier(spark, 2)
    s1, s2 = r["stats_quality_langid@1x"], r["stats_quality_langid@2x"]
    assert s2["result"][0] == 2 * s1["result"][0] > 0
    # fingerprint cardinality doubles: copies are distinct via suffix
    # token, within-copy duplicates stay duplicates
    assert (
        r["fingerprint_distinct@2x"]["result"]
        == 2 * r["fingerprint_distinct@1x"]["result"]
        > 0
    )
    # vocabulary-bounded reductions are scale-independent
    assert r["tfidf_top25@1x"]["result"] == r["tfidf_top25@2x"]["result"] == 25
    assert r["bpe_train_8@1x"]["result"] == r["bpe_train_8@2x"]["result"] == 8


def test_multimodal_tier_invariants(spark):
    r = sr.multimodal_tier(spark, 2)
    m1, m2 = r["meta_scan@1x"]["result"], r["meta_scan@2x"]["result"]
    assert m2[0] == 2 * m1[0] > 0
    # every copy appends the same-length " copytokI" suffix, so payload
    # bytes double exactly
    assert m2[1] == 2 * m1[1] > 0
    f1, f2 = r["extract_features@1x"]["result"], r["extract_features@2x"]["result"]
    assert f2[0] == 2 * f1[0]
    assert f1[1] > 0  # the checksum dimension is sensitive (not dim 0)
    fr1, fr2 = r["sample_frames@1x"]["result"], r["sample_frames@2x"]["result"]
    assert fr1[0] == 4 * m1[0] and fr2[0] == 4 * m2[0]  # exact 1:N explosion
    assert fr1[1] == fr2[1] == 4
    a1, a2 = r["audio_encode_decode@1x"]["result"], r["audio_encode_decode@2x"]["result"]
    assert a2[0] == 2 * a1[0]
    # copies differ only in the suffix digit (same sign pattern), so the
    # zero-crossing checksum doubles exactly
    assert a2[1] == 2 * a1[1] > 0

"""Brute-force Python recomputation of the cleaning queries at sf0.001."""

from __future__ import annotations

import math
import re
from collections import Counter

from citegraph_spark.plans.entry_queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return {
        r["doc_id"]: (r["text"], r["source"])
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }


def _tokens(s: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]


def test_html_strip_recovers_payload(spark):
    docs = _docs(spark)
    rows = QUERIES["text_html_strip"](spark, SF_DIR).collect()
    assert len(rows) == len(docs)
    for r in rows:
        text, _src = docs[r["doc_id"]]
        # 8 wrapper tags survive comment removal; exactly 1 comment
        assert r["n_comments"] == 1 and r["n_tags"] == 8
        expected = re.sub(r" +", " ", f"Doc & {r['doc_id']} {text}").strip()
        assert r["clean"] == expected
        assert "<" not in r["clean"] and "&amp;" not in r["clean"]


def test_pii_redact_masks_injected_pii(spark):
    docs = _docs(spark)
    rows = QUERIES["text_pii_redact"](spark, SF_DIR).collect()
    for r in rows:
        assert r["n_emails"] == 1 and r["n_phones"] == 1
        assert "<EMAIL>" in r["redacted"] and "<PHONE>" in r["redacted"]
        assert "@example.com" not in r["redacted"]
        assert not re.search(r"\+1-555-\d{4}", r["redacted"])
        text, _ = docs[r["doc_id"]]
        assert r["redacted"].startswith(text)


def test_boilerplate_lines_match_bruteforce(spark):
    docs = _docs(spark)
    lines_by_doc = {}
    df_count = Counter()
    for doc_id, (text, _) in docs.items():
        toks = _tokens(text)
        lines = [
            " ".join(toks[i * 3 : i * 3 + 3])
            for i in range(math.ceil(len(toks) / 3))
        ]
        lines_by_doc[doc_id] = lines
        for line in set(lines):
            df_count[line] += 1
    boiler = {line for line, c in df_count.items() if c >= 5}

    rows = QUERIES["dedup_boilerplate_lines"](spark, SF_DIR).collect()
    assert len(rows) == len(docs)
    saw_boiler = 0
    for r in rows:
        lines = lines_by_doc[r["doc_id"]]
        kept = [ln for ln in lines if ln not in boiler]
        assert r["n_lines"] == len(lines)
        assert r["n_boiler"] == sum(ln in boiler for ln in lines)
        assert r["kept_text"] == " ".join(kept)
        saw_boiler += r["n_boiler"]
    assert saw_boiler > 0  # threshold actually fires on this corpus


def test_tokenize_to_ids_matches_bruteforce_vocab(spark):
    docs = _docs(spark)
    counts = Counter()
    for text, _ in docs.values():
        counts.update(_tokens(text))
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    vocab = {tok: i for i, (tok, _) in enumerate(ranked[:20])}

    rows = QUERIES["tokenize_to_ids"](spark, SF_DIR).collect()
    oov_total = 0
    for r in rows:
        toks = _tokens(docs[r["doc_id"]][0])
        ids = [str(vocab.get(t, -1)) for t in toks[:16]]
        assert r["ids"] == ",".join(ids)
        assert r["n_oov"] == sum(t not in vocab for t in toks)
        oov_total += r["n_oov"]
    assert oov_total > 0  # 31-token corpus vs 20-entry vocab -> real OOV


def test_skyline_parts_bruteforce_dominance(spark):
    pts = [
        (r["p_partkey"], r["p_retailprice"], r["p_size"])
        for r in spark.read.parquet(f"{SF_DIR}/part.parquet").collect()
    ]
    def dominated(p):
        return any(
            q[1] <= p[1] and q[2] <= p[2] and (q[1] < p[1] or q[2] < p[2])
            for q in pts
        )
    expected = sorted(k for k, *_ in [p for p in pts if not dominated(p)])
    got = sorted(
        r["p_partkey"] for r in QUERIES["skyline_parts"](spark, SF_DIR).collect()
    )
    assert got == expected and got


def test_accent_fold_roundtrip(spark):
    rows = QUERIES["text_accent_fold"](spark, SF_DIR).collect()
    docs = _docs(spark)
    for r in rows:
        text, _ = docs[r["doc_id"]]
        assert r["folded"] == text  # folding recovers the original
        assert r["n_accented"] == sum(text.count(c) for c in "aeiou")
        assert r["n_chars"] == len(text)

"""Text-analysis operators for training-data pipelines.

All pure JVM-side column expressions (no Python UDFs): tokenization,
shingling, language-ID heuristics, quality scoring, token counting,
fingerprinting. Each has an exactly-matching DuckDB oracle formulation in
plans/entry_queries.py — the tokenizer regexes are chosen to behave
identically under Java regex and RE2.

Scale: every function here is row-local (narrow) — no shuffle, perfect
linear scaling; Catalyst pipelines them into the scan stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..lineage import cut_lineage

# Language-marker stopwords for the n-gram/lexicon language-ID heuristic.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is", "to"),
    "de": ("der", "die", "und", "ist", "das"),
    "es": ("el", "los", "las", "es", "y"),
    "fr": ("le", "la", "les", "et", "est"),
}

ENGLISH_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def tokens(col: Column) -> Column:
    """Lowercase word tokens: split on non-alphanumeric runs, drop empties."""
    return F.filter(
        F.split(F.lower(col), "[^a-z0-9]+"), lambda t: t != F.lit("")
    )


def token_count(col: Column) -> Column:
    """BPE-ish token count: alphanumeric runs plus isolated punctuation
    (the common pre-tokenizer regex shape)."""
    return F.size(F.regexp_extract_all(F.lower(col), F.lit(r"[a-z0-9_]+|[^a-z0-9_\s]"), 0))


def shingles(toks: Column, n: int = 3, distinct: bool = True) -> Column:
    """n-token shingles. `distinct=True` (default) dedups — the SET form
    MinHash / Jaccard need; `distinct=False` keeps every instance — the
    MULTISET form frequency-weighted signals (e.g. trigram novelty)
    need."""
    arr = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    if distinct:
        arr = F.array_distinct(arr)
    return F.when(F.size(toks) >= n, arr).otherwise(
        F.array().cast("array<string>")
    )


def stopword_count(toks: Column, words: tuple[str, ...] = ENGLISH_STOPWORDS) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def punct_count(col: Column) -> Column:
    return F.length(F.regexp_replace(col, r"[^.,;:!?]", ""))


def quality_score(n_tokens: Column, punct_ratio: Column, stop_ratio: Column) -> Column:
    """Composite document-quality heuristic in [0,1]: length saturation ×
    low-punctuation × stopword-plausibility. Deliberately simple
    arithmetic so the oracle SQL states the identical formula."""
    length_term = F.least(F.lit(1.0), n_tokens / F.lit(100.0))
    return F.round(length_term * (1.0 - punct_ratio) * (0.5 + stop_ratio), 6)


def lang_votes(toks: Column) -> dict[str, Column]:
    """Marker-stopword vote count per candidate language."""
    return {
        lang: F.size(F.filter(toks, lambda t: t.isin(*markers)))
        for lang, markers in LANG_MARKERS.items()
    }


def predict_lang(votes: dict[str, Column]) -> Column:
    """Argmax with deterministic tie-break: first of en,de,es,fr at max."""
    m = F.greatest(*[votes[lang] for lang in ("en", "de", "es", "fr")])
    expr = F.lit("en")
    for lang in ("fr", "es", "de", "en"):
        expr = F.when(votes[lang] == m, F.lit(lang)).otherwise(expr)
    return expr


def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase text.
    (The content-defined rolling-hash variant is `dedup.simhash`.)"""
    return F.md5(F.trim(F.regexp_replace(F.lower(col), r"\s+", " ")))


def char_symbols(col: Column) -> Column:
    """Token string -> array of single-character symbols (BPE start state)."""
    return F.transform(
        F.sequence(F.lit(1), F.length(col)), lambda i: F.substring(col, i, F.lit(1))
    )


def bpe_merge_pair(symbols: Column, a: str, b: str) -> Column:
    """One BPE merge applied to a symbol array: greedy left-to-right
    replacement of adjacent (a, b) with the merged symbol a||b, as a
    single JVM-side `aggregate` fold — no Python boundary. Overlaps
    resolve left-first automatically: once merged, the new last element
    is a||b (strictly longer than `a`), so it can't re-match as `a`."""
    merged = F.lit(a + b)
    return F.aggregate(
        symbols,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(vocab: DataFrame, n_merges: int = 8) -> list[tuple[int, str, str, int]]:
    """Byte-pair-encoding training loop (Sennrich et al. 2016, public):
    learn `n_merges` merges from a WEIGHTED VOCABULARY (tok, cnt) — the
    scalable formulation: the corpus is first collapsed to distinct
    tokens with frequencies (one aggregate over the token stream; the
    reference's corpus-collapse analog is its group-count A1,
    Analytics.scala:97), and every iteration then runs on the small
    vocab table, not the corpus.

    Per round: adjacent symbol pairs via slice+zip_with (no explode of
    overlapping windows), weighted count, argmax collected to the driver
    (ties -> lexicographically smallest pair, fully deterministic), then
    the merge applied with `bpe_merge_pair`. The symbol table is
    localCheckpoint-ed each round: the merge fold nests one lambda per
    round and unbounded plan nesting is the classic iterative-Catalyst
    trap. Returns [(step, left, right, cnt)], 1-indexed.
    """
    spark = vocab.sparkSession
    syms = vocab.select(
        F.col("cnt").cast("long").alias("cnt"),
        char_symbols(F.col("tok")).alias("symbols"),
    ).transform(cut_lineage)

    merges: list[tuple[int, str, str, int]] = []
    for step in range(1, n_merges + 1):
        n = F.size("symbols")
        pairs = syms.filter(n >= 2).select(
            "cnt",
            F.explode(
                F.zip_with(
                    F.slice("symbols", F.lit(1), n - 1),
                    F.slice("symbols", F.lit(2), n - 1),
                    lambda x, y: F.struct(x.alias("a"), y.alias("b")),
                )
            ).alias("p"),
        )
        top = (
            pairs.groupBy("p.a", "p.b")
            .agg(F.sum("cnt").alias("c"))
            .orderBy(F.desc("c"), "a", "b")
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, c = top[0]["a"], top[0]["b"], int(top[0]["c"])
        merges.append((step, a, b, c))
        syms = syms.select(
            "cnt", bpe_merge_pair(F.col("symbols"), a, b).alias("symbols")
        ).transform(cut_lineage)
    return merges

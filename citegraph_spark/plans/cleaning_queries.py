"""Training-data text-cleaning query registrations: markup stripping,
PII redaction, global boilerplate-line removal, vocab tokenization.

The synthetic `documents` table is plain word soup, so the queries that
need marked-up / PII-bearing input CONSTRUCT it deterministically from
the table first (doc_id-derived emails, wrapper tags) and then clean it;
the DuckDB oracle replays construction AND cleaning, so the regex
pipeline is certified end-to-end, not vacuously on already-clean text.

All transforms are single-pass JVM column expressions (regexp_replace /
higher-order functions) — no UDFs, no shuffles except where a GLOBAL
property is genuinely required (the boilerplate-line frequency count and
the corpus vocabulary, each one hash aggregation whose result is tiny
and broadcast back)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import text
from ..sources.tables import load_table
from .entry_queries import register

_TOKS = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '')"

_TAG_RE = "<[^>]+>"
_COMMENT_RE = "<!--[^>]*-->"
_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PHONE_RE = "\\+1-555-[0-9]{4}"
# Spark SQL string literals eat one level of backslash (unlike the Python
# regexp_* API, which passes the pattern straight to the Java regex
# engine) — re-escape for use inside F.expr(...)
_EMAIL_RE_SQL = _EMAIL_RE.replace("\\", "\\\\")
_PHONE_RE_SQL = _PHONE_RE.replace("\\", "\\\\")


@register(
    "text_html_strip",
    f"""
WITH raw AS (
  SELECT doc_id,
         '<html><body data-src="' || source || '"><h1>Doc &amp; ' || doc_id ||
         '</h1><p>' || text || '</p><!-- footer ' || doc_id ||
         ' --></body></html>' AS html
  FROM documents
),
stripped AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(html, '{_COMMENT_RE}')) AS INT) AS n_comments,
         regexp_replace(html, '{_COMMENT_RE}', ' ', 'g') AS no_comments
  FROM raw
)
SELECT doc_id,
       CAST(len(regexp_extract_all(no_comments, '{_TAG_RE}')) AS INT) AS n_tags,
       n_comments,
       trim(regexp_replace(
         replace(regexp_replace(no_comments, '{_TAG_RE}', ' ', 'g'), '&amp;', '&'),
         ' +', ' ', 'g')) AS clean
FROM stripped ORDER BY doc_id
""",
)
def text_html_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markup removal for web-scraped training data: comments first
    (they may contain '>'-free tag fragments), then tags, then entity
    unescape, then whitespace collapse. Order matters and the oracle
    replays it exactly. Everything is whole-stage-codegen'd
    regexp_replace — per-row cost is O(len), no Python."""
    docs = load_table(spark, sf_dir, "documents")
    html = F.concat(
        F.lit('<html><body data-src="'), F.col("source"),
        F.lit('"><h1>Doc &amp; '), F.col("doc_id"),
        F.lit("</h1><p>"), F.col("text"),
        F.lit("</p><!-- footer "), F.col("doc_id"),
        F.lit(" --></body></html>"),
    )
    raw = docs.select("doc_id", html.alias("html"))
    stripped = raw.select(
        "doc_id",
        F.size(F.expr(f"regexp_extract_all(html, '{_COMMENT_RE}', 0)"))
        .cast("int").alias("n_comments"),
        F.regexp_replace("html", _COMMENT_RE, " ").alias("no_comments"),
    )
    return stripped.select(
        "doc_id",
        F.size(F.expr(f"regexp_extract_all(no_comments, '{_TAG_RE}', 0)"))
        .cast("int").alias("n_tags"),
        "n_comments",
        F.trim(
            F.regexp_replace(
                F.replace(
                    F.regexp_replace("no_comments", _TAG_RE, " "),
                    F.lit("&amp;"), F.lit("&"),
                ),
                " +", " ",
            )
        ).alias("clean"),
    ).orderBy("doc_id")


@register(
    "text_pii_redact",
    f"""
WITH raw AS (
  SELECT doc_id,
         text || ' Contact user' || doc_id || '@example.com or +1-555-' ||
         lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' now.' AS body
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(body, '{_EMAIL_RE}')) AS INT) AS n_emails,
       CAST(len(regexp_extract_all(body, '{_PHONE_RE}')) AS INT) AS n_phones,
       regexp_replace(regexp_replace(body, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                      '{_PHONE_RE}', '<PHONE>', 'g') AS redacted
FROM raw ORDER BY doc_id
""",
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII masking pass (emails, NANP-style phone numbers) over
    deterministically-injected PII. Counts are emitted alongside the
    redacted text so downstream filters can drop PII-dense documents
    instead of just masking them — standard pretraining hygiene. Pure
    regexp_replace; at 100 TB this is a map-only pass with zero
    shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    body = F.concat(
        F.col("text"), F.lit(" Contact user"), F.col("doc_id"),
        F.lit("@example.com or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" now."),
    )
    raw = docs.select("doc_id", body.alias("body"))
    return raw.select(
        "doc_id",
        F.size(F.expr(f"regexp_extract_all(body, '{_EMAIL_RE_SQL}', 0)"))
        .cast("int").alias("n_emails"),
        F.size(F.expr(f"regexp_extract_all(body, '{_PHONE_RE_SQL}', 0)"))
        .cast("int").alias("n_phones"),
        F.regexp_replace(
            F.regexp_replace("body", _EMAIL_RE, "<EMAIL>"),
            _PHONE_RE, "<PHONE>",
        ).alias("redacted"),
    ).orderBy("doc_id")


_LINE_LEN = 3
_BOILER_MIN_DOCS = 5


@register(
    "dedup_boilerplate_lines",
    f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
lines AS (
  SELECT doc_id, i,
         array_to_string(list_slice(toks, i*{_LINE_LEN}+1, i*{_LINE_LEN}+{_LINE_LEN}), ' ') AS line
  FROM t, unnest(range(0, CAST(ceil(len(toks)/{_LINE_LEN}.0) AS BIGINT))) AS u(i)
),
boiler AS (
  SELECT line FROM lines GROUP BY line
  HAVING count(DISTINCT doc_id) >= {_BOILER_MIN_DOCS}
),
flagged AS (
  SELECT l.doc_id, l.i, l.line, b.line IS NOT NULL AS is_boiler
  FROM lines l LEFT JOIN boiler b USING (line)
),
per_doc AS (
  SELECT doc_id,
         CAST(count(*) AS INT) AS n_lines,
         CAST(count(*) FILTER (WHERE is_boiler) AS INT) AS n_boiler,
         coalesce(string_agg(line, ' ' ORDER BY i) FILTER (WHERE NOT is_boiler), '')
           AS kept_text
  FROM flagged GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(p.n_lines, 0) AS n_lines,
       coalesce(p.n_boiler, 0) AS n_boiler,
       coalesce(p.kept_text, '') AS kept_text
FROM documents d LEFT JOIN per_doc p USING (doc_id)
ORDER BY d.doc_id
""",
)
def dedup_boilerplate_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global boilerplate-line removal (the CCNet/RefinedWeb pass that
    strips nav bars and cookie banners): chunk each doc into fixed-size
    token lines, count per-line document frequency corpus-wide, drop
    lines appearing in >= {_BOILER_MIN_DOCS} docs, and reassemble the
    survivors in order.

    Scale shape: ONE hash aggregation on the line hash builds the
    frequency table; the boilerplate set (high-DF lines) is tiny by
    Zipf's law, so the membership join broadcasts. Reassembly sorts only
    WITHIN each doc (array_sort over collected structs), never
    globally."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", text.tokens(F.col("text")).alias("toks"))
    n_lines = F.ceil(F.size("toks") / F.lit(float(_LINE_LEN))).cast("long")
    lines = (
        t.select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), n_lines - 1)).alias("i"),
            F.col("toks"),
        )
        .select(
            "doc_id", "i",
            F.array_join(
                F.slice("toks", F.col("i") * _LINE_LEN + 1, _LINE_LEN), " "
            ).alias("line"),
        )
    )
    boiler = (
        lines.groupBy("line")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") >= _BOILER_MIN_DOCS)
        .select("line", F.lit(True).alias("is_boiler"))
    )
    flagged = lines.join(F.broadcast(boiler), "line", "left").select(
        "doc_id", "i", "line", F.coalesce("is_boiler", F.lit(False)).alias("is_boiler")
    )
    per_doc = flagged.groupBy("doc_id").agg(
        F.count("*").cast("int").alias("n_lines"),
        F.sum(F.col("is_boiler").cast("int")).cast("int").alias("n_boiler"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(~F.col("is_boiler"), F.struct("i", "line"))
                    )
                ),
                lambda s: s.line,
            ),
            " ",
        ).alias("kept_text"),
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
            F.coalesce("n_boiler", F.lit(0)).alias("n_boiler"),
            F.coalesce("kept_text", F.lit("")).alias("kept_text"),
        )
        .orderBy("doc_id")
    )


_VOCAB_SIZE = 20
_SEQ_PREFIX = 16


@register(
    "tokenize_to_ids",
    f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
tok AS (
  SELECT doc_id, i, toks[i] AS tok
  FROM t, unnest(range(1, len(toks) + 1)) AS u(i)
),
vocab AS (
  SELECT tok, CAST(row_number() OVER (ORDER BY count(*) DESC, tok) - 1 AS INT) AS id
  FROM tok GROUP BY tok
  QUALIFY row_number() OVER (ORDER BY count(*) DESC, tok) <= {_VOCAB_SIZE}
)
SELECT doc_id,
       coalesce(string_agg(CAST(coalesce(v.id, -1) AS VARCHAR), ',' ORDER BY i)
                  FILTER (WHERE i <= {_SEQ_PREFIX}), '') AS ids,
       CAST(count(*) FILTER (WHERE v.id IS NULL) AS INT) AS n_oov
FROM tok LEFT JOIN vocab v USING (tok)
GROUP BY doc_id ORDER BY doc_id
""",
)
def tokenize_to_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequency vocab construction + token-to-id encoding (the
    id-mapping step after BPE training): rank tokens by global count
    (ties by token, so the mapping is deterministic), keep the top
    {_VOCAB_SIZE} as the vocab, encode each doc's first {_SEQ_PREFIX}
    positions with OOV -> -1, and count per-doc OOV.

    Scale shape: the vocab is one hash aggregation + a driver-size
    top-k (vocab size is a model constant, ~10^5, never data-scaled);
    encoding is a broadcast join on the token column. The global
    row_number runs on the ALREADY-aggregated distinct-token table,
    not the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    tok = (
        docs.select("doc_id", F.posexplode(text.tokens(F.col("text"))))
        .select("doc_id", (F.col("pos") + 1).alias("i"), F.col("col").alias("tok"))
    )
    counts = tok.groupBy("tok").agg(F.count("*").alias("cnt"))
    w = Window.orderBy(F.desc("cnt"), F.asc("tok"))
    vocab = (
        counts.select("tok", (F.row_number().over(w) - 1).cast("int").alias("id"))
        .filter(F.col("id") < _VOCAB_SIZE)
    )
    joined = tok.join(F.broadcast(vocab), "tok", "left").select(
        "doc_id", "i", F.coalesce("id", F.lit(-1)).alias("id")
    )
    return (
        joined.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("i") <= _SEQ_PREFIX, F.struct("i", "id"))
                        )
                    ),
                    lambda s: s.id.cast("string"),
                ),
                ",",
            ).alias("ids"),
            F.sum((F.col("id") == -1).cast("int")).cast("int").alias("n_oov"),
        )
        .orderBy("doc_id")
    )


_ACC_FROM = "áéíóúàèìòùâêîôûäëïöüñçåøæ"
_ACC_TO = "aeiouaeiouaeiouaeiouncaoa"


@register(
    "text_accent_fold",
    f"""
WITH raw AS (
  SELECT doc_id,
         translate(text, 'aeiou', 'áéíóú') AS accented
  FROM documents
)
SELECT doc_id,
       CAST(length(accented) AS INT) AS n_chars,
       CAST(length(accented) - length(regexp_replace(accented, '[{_ACC_FROM}]', '', 'g'))
            AS INT) AS n_accented,
       translate(accented, '{_ACC_FROM}', '{_ACC_TO}') AS folded
FROM raw ORDER BY doc_id
""",
)
def text_accent_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accent/diacritic folding (the unicode-normalization step of text
    cleaning): vowels are deterministically accented first (so the fold
    is exercised on real diacritics, not vacuously), then folded back
    through an explicit translate map — the engine-portable subset of
    NFKD+strip-combining (a full normalizer needs the unicodedata
    tables; the translate map covers the Latin-1 diacritics that
    dominate web text). Pure per-row translate/regexp — map-only at any
    scale. The oracle replays accenting, counting, and folding
    identically; folded == the lowercase original by construction, which
    the test asserts."""
    docs = load_table(spark, sf_dir, "documents")
    raw = docs.select(
        "doc_id", F.translate("text", "aeiou", "áéíóú").alias("accented")
    )
    return raw.select(
        "doc_id",
        F.length("accented").cast("int").alias("n_chars"),
        (
            F.length("accented")
            - F.length(F.regexp_replace("accented", f"[{_ACC_FROM}]", ""))
        ).cast("int").alias("n_accented"),
        F.translate("accented", _ACC_FROM, _ACC_TO).alias("folded"),
    ).orderBy("doc_id")

"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Designed for 100 TB corpora:

- Exact dedup is a hash-groupBy — one shuffle on a 16-byte digest, with
  map-side partial aggregation.
- MinHash signatures are computed per-row with higher-order array
  functions (no explode, no shuffle); only the (doc, band) pairs —
  `n_bands` rows per doc, ~50 bytes each — are shuffled for the LSH
  bucket join. Candidate verification joins shingle sets back by doc_id.
  This is the shingle→minhash→band→bucket-join pipeline; cost scales with
  bucket collision counts, never with |docs|².
- SimHash reduces each doc to one 32-bit integer (explode+groupBy with
  partial aggregation); near-dup candidates come from banded 8-bit chunk
  equality, verified by Hamming distance via xor+bit_count.

Every hash is md5-based so the DuckDB oracle can state the identical
computation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import shingles, tokens

N_MINHASH = 8
N_BANDS = 4  # rows per band = N_MINHASH // N_BANDS = 2
SIMHASH_BITS = 32


def exact_canonical(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup: map every doc to the min-id doc with identical text.
    Output: (doc_id, canonical_id). Survivors have doc_id == canonical_id."""
    hashed = df.select(F.col(id_col), F.md5(F.col(text_col)).alias("h"))
    canon = hashed.groupBy("h").agg(F.min(id_col).alias("canonical_id"))
    return (
        hashed.join(canon, "h")
        .select(F.col(id_col).alias("doc_id"), "canonical_id")
    )


def shingle_hash_col(sh_col):
    """64 hex chars of hash material per shingle: md5(s) || md5('x'||s).
    Two digests instead of N_MINHASH salted ones — the N_MINHASH
    min-hashes are carved out of this as disjoint 8-char (32-bit)
    slices, which is 4× less hashing for the same LSH behavior."""
    return F.transform(
        sh_col, lambda s: F.concat(F.md5(s), F.md5(F.concat(F.lit("x"), s)))
    )


def _slice_fn(i: int):
    # single-parameter closure: a 2-arg lambda (e.g. `lambda h, i=i`) would
    # be bound by F.transform as the (element, index) binary form, silently
    # turning `i` into the array index
    return lambda h: F.substring(h, 8 * i + 1, 8)


def minhash_signature_cols(hashes_col) -> list:
    """N_MINHASH min-hashes over the per-shingle hash-material column.

    Per-row transform + array_min: narrow, no shuffle — at cluster scale
    each executor computes signatures for its split independently."""
    return [
        F.array_min(F.transform(hashes_col, _slice_fn(i))).alias(f"mh{i}")
        for i in range(N_MINHASH)
    ]


def minhash_bands(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, band_idx, band_hash) — the LSH bucket keys."""
    r = N_MINHASH // N_BANDS
    band_cols = [
        F.md5(F.concat_ws("|", *[F.col(f"mh{b * r + j}") for j in range(r)])).alias(
            f"band{b}"
        )
        for b in range(N_BANDS)
    ]
    wide = df.select(id_col, *band_cols)
    stacked = wide.select(
        id_col,
        F.posexplode(F.array(*[F.col(f"band{b}") for b in range(N_BANDS)])).alias(
            "band_idx", "band_hash"
        ),
    )
    return stacked


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    max_bucket_size: int = 10_000,
) -> DataFrame:
    """Near-duplicate pairs via MinHash-LSH, verified with exact shingle
    Jaccard >= threshold. Output: (a, b, jaccard) with a < b.

    Hot-bucket cap: a band bucket holding B docs contributes O(B²)
    candidate pairs, so one degenerate band key (empty/boilerplate
    shingle sets — common in web corpora) can dominate the whole join at
    scale. Buckets larger than `max_bucket_size` are excluded from THAT
    band's pair generation (a cheap per-(band, hash) count before the
    self-join — map-side combinable, no extra pass over the docs).
    Recall degrades gracefully, not silently to a hang: a true near-dup
    pair collides in every band with probability ~s^(r) per band, so it
    still surfaces through any of the other N_BANDS-1 bands unless those
    buckets are ALSO over cap — at which point the docs are mass
    boilerplate and belong to an exact-dedup pass, not pairwise LSH.
    With the default cap the worst-case per-bucket candidate count is
    bounded at max_bucket_size² regardless of corpus size."""
    # tokens materialized in their own projection: higher-order-function
    # lambdas are excluded from whole-stage codegen/CSE, so an inlined
    # tokens() expression would re-run the split per shingle reference
    # (measured 10x slower at sf0.1); CollapseProject keeps multi-referenced
    # non-cheap columns in separate projects
    sh = (
        docs.select(F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("_toks"))
        .select("doc_id", shingles(F.col("_toks")).alias("sh"))
        .persist()
    )
    # same two-step shape: materialize the hash material once, then slice
    hm = sh.select("doc_id", "sh", shingle_hash_col(F.col("sh")).alias("hm"))
    sig = hm.select("doc_id", "sh", *minhash_signature_cols(F.col("hm")))
    bands = minhash_bands(sig)

    bucket_sizes = bands.groupBy("band_idx", "band_hash").agg(
        F.count("*").alias("_bucket_n")
    )
    bands = (
        bands.join(bucket_sizes, ["band_idx", "band_hash"])
        .filter(F.col("_bucket_n") <= max_bucket_size)
        .drop("_bucket_n")
    )

    left = bands.select(
        F.col("doc_id").alias("a"), "band_idx", "band_hash"
    )
    right = bands.select(
        F.col("doc_id").alias("b"), "band_idx", "band_hash"
    )
    cand = (
        left.join(right, ["band_idx", "band_hash"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )

    sh_a = sh.select(F.col("doc_id").alias("a"), F.col("sh").alias("sh_a"))
    sh_b = sh.select(F.col("doc_id").alias("b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        cand.join(sh_a, "a")
        .join(sh_b, "b")
        .select(
            "a",
            "b",
            F.round(inter / union.cast("double"), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
        .orderBy("a", "b")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via an inverted shingle index
    (explode → join on shingle → count shared), NOT an O(n²) cross join:
    cost scales with shingle-posting-list collision counts.

    Output: (a, b, jaccard) with a < b, jaccard >= threshold.
    """
    sh = docs.select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("_toks")
    ).select("doc_id", shingles(F.col("_toks")).alias("sh"))
    sizes = sh.select("doc_id", F.size("sh").alias("n"))
    posting = sh.select("doc_id", F.explode("sh").alias("s"))
    pa = posting.select(F.col("doc_id").alias("a"), "s")
    pb = posting.select(F.col("doc_id").alias("b"), "s")
    shared = (
        pa.join(pb, "s")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("inter"))
    )
    na = sizes.select(F.col("doc_id").alias("a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("b"), F.col("n").alias("nb"))
    return (
        shared.join(na, "a")
        .join(nb, "b")
        .select(
            "a",
            "b",
            F.round(
                F.col("inter")
                / (F.col("na") + F.col("nb") - F.col("inter")).cast("double"),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
        .orderBy("a", "b")
    )


def prefix_filter_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
) -> DataFrame:
    """Exact-threshold near-dup pairs via PPJoin-style prefix filtering
    (Chaudhuri/Ganti/Kaushik SSJoin; Xiao et al. PPJoin) over 3-gram
    shingle sets.

    Scale path: where the inverted-index join (`ngram_jaccard_pairs`)
    posts EVERY shingle, this posts only each doc's prefix — the
    (1-t)·|sh|+1 globally-RAREST shingles. For t=0.8 that is ~20 % of the
    postings, and because the prefix keeps the rarest shingles first, the
    candidate join's collision lists are the shortest ones. A length
    filter (t·max(|a|,|b|) <= min(|a|,|b|), necessary for J >= t) prunes
    candidates before the distinct.

    Correctness: sort every doc's shingles by one global order (document
    frequency asc, shingle asc). With prefix length
    p = n - ceil(t·n) + 1, any pair with J >= t shares >= ceil(t·n)
    shingles, which cannot all fit in the (ceil(t·n) - 1)-element
    suffixes — so some shared shingle lands in both prefixes. Candidates
    are then verified with exact Jaccard; output == the brute-force /
    inverted-index answer.

    Shuffles: df-count groupBy(shingle), ordering groupBy(doc_id),
    candidate join on shingle, two verify joins on doc_id — all keyed,
    all map-side-combinable. Nothing scales with |docs|².

    Output: (a, b, jaccard) with a < b, jaccard >= threshold.
    """
    sh = (
        docs.select(F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("_toks"))
        .select("doc_id", shingles(F.col("_toks")).alias("sh"))
        .filter(F.size("sh") > 0)
        .persist()
    )
    posting = sh.select("doc_id", F.explode("sh").alias("s"))
    dfreq = posting.groupBy("s").agg(F.count("*").alias("df"))
    # global rare-first order: array_sort over struct<df,s> sorts by df
    # then shingle — deterministic across executors
    ordered = (
        posting.join(dfreq, "s")
        .groupBy("doc_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("df", "s"))), lambda e: e["s"]
            ).alias("os")
        )
    )
    n = F.size("os")
    p = (n - F.ceil(F.lit(threshold) * n) + 1).cast("int")
    pre = ordered.select("doc_id", n.alias("n"), F.slice("os", F.lit(1), p).alias("prefix"))
    left = pre.select(
        F.col("doc_id").alias("a"), F.col("n").alias("na"), F.explode("prefix").alias("s")
    )
    right = pre.select(
        F.col("doc_id").alias("b"), F.col("n").alias("nb"), F.explode("prefix").alias("s")
    )
    cand = (
        left.join(right, "s")
        .filter(
            (F.col("a") < F.col("b"))
            & (F.greatest("na", "nb") * F.lit(threshold) <= F.least("na", "nb"))
        )
        .select("a", "b")
        .distinct()
    )
    sh_a = sh.select(F.col("doc_id").alias("a"), F.col("sh").alias("sh_a"))
    sh_b = sh.select(F.col("doc_id").alias("b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        cand.join(sh_a, "a")
        .join(sh_b, "b")
        .select(
            "a",
            "b",
            F.round(inter / union.cast("double"), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
        .orderBy("a", "b")
    )


def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-doc SIMHASH_BITS-bit SimHash over word tokens.

    Each token hashes to a 32-bit int (md5 prefix); per bit position the
    ±1 votes are summed across the doc's tokens; the sign vector is the
    fingerprint. Explode + groupBy: one shuffle keyed by doc_id with
    map-side partial sums of the 32 vote counters.

    Output: (doc_id, simhash BIGINT).
    """
    tok = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(F.col(text_col))).alias("t")
    )
    v = F.conv(F.substring(F.md5("t"), 1, 8), 16, 10).cast("long")
    bit_votes = [
        F.sum(
            F.when(F.shiftright(v, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{i}")
        for i in range(SIMHASH_BITS)
    ]
    votes = tok.groupBy("doc_id").agg(*bit_votes)
    sim = None
    for i in range(SIMHASH_BITS):
        term = F.when(F.col(f"v{i}") > 0, F.lit(2**i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sim = term if sim is None else sim + term
    return votes.select("doc_id", sim.alias("simhash"))


def simhash_near_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup candidate pairs: docs whose SimHash differs in <=
    max_hamming of 32 bits. Candidates from banded 8-bit chunk equality
    (pigeonhole: hamming<=3 over 4 chunks forces >=1 equal chunk), then
    exact Hamming verification via xor + bit_count.

    Output: (a, b, hamming) with a < b."""
    sim = simhash(docs, id_col, text_col).persist()
    chunks = sim.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("simhash"), 8 * c).bitwiseAND(F.lit(0xFF))
                    for c in range(4)
                ]
            )
        ).alias("chunk_idx", "chunk"),
    )
    left = chunks.select(
        F.col("doc_id").alias("a"), F.col("simhash").alias("sim_a"), "chunk_idx", "chunk"
    )
    right = chunks.select(
        F.col("doc_id").alias("b"), F.col("simhash").alias("sim_b"), "chunk_idx", "chunk"
    )
    return (
        left.join(right, ["chunk_idx", "chunk"])
        .filter(F.col("a") < F.col("b"))
        .select(
            "a",
            "b",
            F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
        .orderBy("a", "b")
    )

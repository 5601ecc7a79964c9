"""Unit tests for text / dedup / similarity / multimodal operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from citegraph_spark.functions import dedup, multimodal, similarity, text

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_tokens_and_shingles(spark):
    df = spark.createDataFrame([("Hello, World! hello world foo",)], "text string")
    row = df.select(
        text.tokens(F.col("text")).alias("t"),
        text.shingles(text.tokens(F.col("text"))).alias("s"),
    ).first()
    assert row["t"] == ["hello", "world", "hello", "world", "foo"]
    assert row["s"] == ["hello world hello", "world hello world", "hello world foo"]


def test_shingles_short_doc_empty(spark):
    df = spark.createDataFrame([("one two",), ("",)], "text string")
    rows = df.select(text.shingles(text.tokens(F.col("text"))).alias("s")).collect()
    assert [r["s"] for r in rows] == [[], []]


def test_exact_dedup_planted(spark):
    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "other")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["canonical_id"]
        for r in dedup.exact_canonical(df, "doc_id", "text").collect()
    }
    assert got == {1: 1, 2: 1, 3: 3}


def test_minhash_lsh_finds_planted_near_dups(spark, docs):
    """The synthetic corpus has planted near-dups (jaccard ~0.98); LSH with
    0.8 threshold must find pairs, and every reported pair must satisfy
    the exact-jaccard threshold (no false positives survive verification)."""
    pairs = dedup.minhash_lsh_pairs(docs).collect()
    assert len(pairs) > 0
    assert all(r["jaccard"] >= 0.8 for r in pairs)


def test_minhash_lsh_equals_exact_at_high_threshold(spark, docs):
    """At threshold 0.8 with 4 bands x 2 rows, LSH candidate recall for
    ~0.9+ jaccard pairs is ~1: compare against the exact inverted-index
    join (ground truth)."""
    lsh = {(r["a"], r["b"]) for r in dedup.minhash_lsh_pairs(docs).collect()}
    exact = {(r["a"], r["b"]) for r in dedup.ngram_jaccard_pairs(docs).collect()}
    assert lsh <= exact
    # recall over the very-high-similarity pairs
    high = {
        (r["a"], r["b"])
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.9).collect()
    }
    assert high and high <= lsh


def test_simhash_near_pairs_hamming(spark, docs):
    pairs = dedup.simhash_near_pairs(docs, max_hamming=3).collect()
    for r in pairs:
        assert 0 <= r["hamming"] <= 3
        assert r["a"] < r["b"]


def test_simhash_identical_texts_equal(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "delta eps")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["simhash"] for r in dedup.simhash(df).collect()}
    assert rows[1] == rows[2]
    assert rows[1] != rows[3]


def test_cosine_topk_selfcheck(spark, emb):
    """Top-1 neighbor relation: cosine in [-1,1], no self-pairs, k rows per
    vec, and symmetric cosine: cos(a,b) == cos(b,a)."""
    got = similarity.cosine_topk_bruteforce(emb.limit(50), k=2).collect()
    by_vec = {}
    for r in got:
        assert r["vec_id"] != r["neighbor_id"]
        assert -1.0 <= r["cosine"] <= 1.0
        by_vec.setdefault(r["vec_id"], []).append(r)
    assert all(len(v) == 2 for v in by_vec.values())


def test_lsh_ann_recall_vs_bruteforce(spark, emb):
    """ANN top-1 must agree with brute force for a decent fraction of
    vectors (random-hyperplane LSH, 4 tables x 8 planes)."""
    sub = emb.limit(200)
    bf = {
        r["vec_id"]: r["neighbor_id"]
        for r in similarity.cosine_topk_bruteforce(sub, k=1).collect()
    }
    ann = {
        r["vec_id"]: r["neighbor_id"]
        for r in similarity.lsh_ann_topk(sub, k=1).collect()
    }
    hits = sum(1 for v, n in bf.items() if ann.get(v) == n)
    assert hits / len(bf) >= 0.3, f"ANN top-1 recall too low: {hits}/{len(bf)}"


def test_multimodal_roundtrip(spark, docs):
    binary = multimodal.to_binary_payload(docs.limit(20), "doc_id", "text")
    feats = multimodal.extract_features(binary).collect()
    assert len(feats) == 20
    for r in feats:
        assert r["modality"] == "text"
        assert r["n_bytes"] > 0
        assert len(r["feature"]) == multimodal.FEATURE_DIM
        assert abs(sum(r["feature"]) - 1.0) < 1e-6  # histogram sums to 1


def test_multimodal_decode_stub():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x89PNG...")


def test_approx_distinct_error_bound(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    exact = li.select("l_partkey").distinct().count()
    approx = li.agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("a")
    ).first()["a"]
    assert abs(approx - exact) / exact <= 0.05


def test_minhash_slices_are_independent(spark):
    """Regression: building the slice transforms in a loop with a 2-arg
    lambda made F.transform bind the loop variable as the array index,
    collapsing every signature to slice 0 (LSH then degenerates to an
    all-pairs join)."""
    df = spark.createDataFrame([(["0123456789abcdef" * 4, "fedcba9876543210" * 4],)],
                               "hm array<string>")
    row = df.select(*dedup.minhash_signature_cols(F.col("hm"))).first()
    sigs = [row[f"mh{i}"] for i in range(dedup.N_MINHASH)]
    assert len(set(sigs)) > 1, f"all slices identical: {sigs[0]}"
    # slice i must come from character window 8i..8i+8 of some element
    for i, s in enumerate(sigs):
        assert s in ("0123456789abcdef" * 4)[8 * i : 8 * i + 8] or \
               s in ("fedcba9876543210" * 4)[8 * i : 8 * i + 8]


def test_embedding_near_pairs_matches_bruteforce(spark, emb):
    sub = emb.limit(150)
    got = {
        (r["a"], r["b"]): r["cosine"]
        for r in similarity.embedding_near_pairs(sub, threshold=0.3).collect()
    }
    rows = sub.select("vec_id", "embedding").collect()
    import numpy as np

    ids = [r[0] for r in rows]
    m = np.array([r[1] for r in rows], dtype=np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = np.round(m @ m.T, 6)
    want = {
        (ids[i], ids[j]): sims[i, j]
        for i in range(len(ids))
        for j in range(len(ids))
        if ids[i] < ids[j] and sims[i, j] >= 0.3
    }
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9


def test_ivf_recall_vs_bruteforce(spark, emb):
    sub = emb.limit(300)
    bf = {
        r["vec_id"]: r["neighbor_id"]
        for r in similarity.cosine_topk_bruteforce(sub, k=1).collect()
    }
    ivf = {
        r["vec_id"]: r["neighbor_id"]
        for r in similarity.ivf_topk(sub, k=1, n_cells=8, n_probe=3).collect()
    }
    hits = sum(1 for v, n in bf.items() if ivf.get(v) == n)
    assert hits / len(bf) >= 0.3, f"IVF top-1 recall too low: {hits}/{len(bf)}"


def test_ivf_cell_count_rule():
    """The automated sizing rule: constant below the floor boundary (so
    the hash-verified similarity_ivf oracle is unchanged at sweep
    scale), then power-of-two growth ∝ N / target_cell_size."""
    # floor region: sweep-scale corpora keep the historical 16-cell grid
    for n in (1, 50, 500, 512):
        assert similarity.ivf_cell_count(n) == 16
    # growth region: cell size stays within [target/2, target]
    for n in (513, 2_000, 60_000, 1_000_000, 100_000_000):
        c = similarity.ivf_cell_count(n)
        assert c & (c - 1) == 0, f"n_cells {c} not a power of two"
        assert 16 <= n / c <= 32, f"cell size {n / c} drifted at N={n}"
    # monotone: more corpus never means fewer cells
    counts = [similarity.ivf_cell_count(n) for n in range(1, 5_000, 37)]
    assert counts == sorted(counts)


def test_ivf_default_args_match_explicit_floor(spark, emb):
    """n_cells=None must be byte-identical to the historical explicit
    n_cells=16 for a sweep-scale corpus (N=500 <= floor boundary)."""
    auto = similarity.ivf_topk(emb, k=3).collect()
    explicit = similarity.ivf_topk(emb, k=3, n_cells=16).collect()
    assert auto == explicit


def test_ivf_precomputed_count_skips_count_job(spark, emb):
    """A caller-supplied corpus count (`n`) must feed the auto-sizing
    rule exactly as the internal count() would (ADVICE r7: spare the
    count job over an uncached multi-stage plan), and must be ignored
    when n_cells is explicit."""
    auto = similarity.ivf_topk(emb, k=3).collect()
    with_n = similarity.ivf_topk(emb, k=3, n=emb.count()).collect()
    assert with_n == auto
    # a (wrong) n pushes the rule past the floor: 2048 > 512 -> 128
    # cells — observable as a different candidate geometry; just assert
    # the sizing hook is live by checking the rule itself
    assert similarity.ivf_cell_count(2048) != similarity.ivf_cell_count(500)
    ignored = similarity.ivf_topk(emb, k=3, n_cells=16, n=2048).collect()
    assert ignored == auto


def test_sample_frames_shape(spark, docs):
    binary = multimodal.to_binary_payload(docs.limit(10), "doc_id", "text")
    frames = multimodal.sample_frames(binary, n_frames=4).collect()
    assert len(frames) == 40
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, rows in by_doc.items():
        assert sorted(r["frame_idx"] for r in rows) == [0, 1, 2, 3]
        offs = [r["frame_offset"] for r in sorted(rows, key=lambda r: r["frame_idx"])]
        assert offs == sorted(offs) and offs[0] == 0
        for r in rows:
            assert len(r["feature"]) == multimodal.FEATURE_DIM


def test_multimodal_resize_stub():
    with pytest.raises(NotImplementedError):
        multimodal.resize_image(b"png", 32, 32)


def test_salted_join_matches_plain(spark):
    from citegraph_spark.operators.relational import salted_join

    left = spark.createDataFrame(
        [(1, i) for i in range(500)] + [(2, i) for i in range(20)], "k int, v int"
    )
    right = spark.createDataFrame([(1, "hot"), (2, "cold"), (3, "none")], "k int, tag string")
    got = sorted((r["k"], r["v"], r["tag"]) for r in salted_join(left, right, "k").collect())
    want = sorted((r["k"], r["v"], r["tag"]) for r in left.join(right, "k").collect())
    assert got == want


def test_approx_percentile_error_bound(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    exact = li.selectExpr("percentile(l_extendedprice, 0.5) AS p").first()["p"]
    approx = li.selectExpr(
        "percentile_approx(l_extendedprice, 0.5, 10000) AS p"
    ).first()["p"]
    assert abs(approx - exact) / exact <= 0.01


def test_dq_rules_count_violations_single_pass(spark):
    from pyspark.sql import functions as F

    from citegraph_spark.functions.dataquality import (
        dq_referential_violations,
        dq_row_violations,
    )

    df = spark.createDataFrame(
        [(1, 10.0, "A"), (2, -5.0, "B"), (3, None, "A"), (4, 7.0, None)],
        "id int, price double, cat string",
    )
    got = {
        r["rule"]: r["n_violations"]
        for r in dq_row_violations(
            df,
            {
                "price_positive": F.col("price") > 0,
                "cat_not_null": F.col("cat").isNotNull(),
                "id_unique_range": F.col("id").between(1, 4),
            },
        ).collect()
    }
    # null predicate results count as violations (price=None fails >0)
    assert got == {"price_positive": 2, "cat_not_null": 1, "id_unique_range": 0}

    parent = spark.createDataFrame([(1,), (2,)], "k int")
    child = spark.createDataFrame([(1,), (2,), (2,), (9,), (None,)], "fk int")
    ref = dq_referential_violations(child, "fk", parent, "k", "fk_ok").first()
    assert (ref["rule"], ref["n_violations"]) == ("fk_ok", 2)


def test_write_with_metrics_observes_violations_during_write(spark):
    import tempfile

    from pyspark.sql import functions as F

    from citegraph_spark.functions.dataquality import write_with_metrics

    df = spark.createDataFrame(
        [(1, 10.0), (2, -1.0), (3, None)], "id int, price double"
    )
    with tempfile.TemporaryDirectory() as d:
        metrics = write_with_metrics(
            df,
            {"price_positive": F.col("price") > 0, "id_not_null": F.col("id").isNotNull()},
            path=f"{d}/out",
        )
        assert metrics == {"price_positive": 2, "id_not_null": 0}
        assert spark.read.parquet(f"{d}/out").count() == 3


def test_prefix_filter_equals_inverted_index(spark, docs):
    """Prefix filtering is exact: at any threshold, the pair set must be
    IDENTICAL to the full inverted-index join (no lost candidates)."""
    for t in (0.8, 0.5):
        pf = {
            (r["a"], r["b"], r["jaccard"])
            for r in dedup.prefix_filter_jaccard_pairs(docs, threshold=t).collect()
        }
        full = {
            (r["a"], r["b"], r["jaccard"])
            for r in dedup.ngram_jaccard_pairs(docs, threshold=t).collect()
        }
        assert pf == full and len(pf) > 0


def test_prefix_filter_handles_skewed_tiny_corpus(spark):
    """Docs sharing only COMMON shingles must not pair below threshold,
    and exact duplicates must pair at jaccard 1.0."""
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta theta"),  # dup of 1
        (3, "alpha beta gamma completely different tail words here"),
        (4, "unrelated content with no overlap at all whatsoever"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = dedup.prefix_filter_jaccard_pairs(df, threshold=0.8).collect()
    assert [(r["a"], r["b"], r["jaccard"]) for r in got] == [(1, 2, 1.0)]


def test_bruteforce_cosine_rejects_over_budget_corpus(spark, emb):
    """An over-broadcast-budget corpus must fail fast (CorpusTooLargeError)
    instead of collecting to the driver — the scale guard for the
    brute-force path (route to lsh_ann_topk/ivf_topk instead)."""
    with pytest.raises(similarity.CorpusTooLargeError, match="broadcast budget"):
        similarity._corpus_matrix(emb, "vec_id", "embedding", budget_bytes=1024)


def test_minhash_lsh_hot_bucket_cap(spark, docs):
    """The per-band bucket cap must (a) leave results identical when no
    bucket exceeds it, and (b) bound candidate generation when one does.
    A corpus of identical docs puts ALL docs in one bucket per band; with
    the cap below the corpus size, every band bucket is over cap, so the
    join yields no candidates instead of |corpus|² rows."""
    uncapped = {(r["a"], r["b"]) for r in dedup.minhash_lsh_pairs(docs).collect()}
    wide_cap = {
        (r["a"], r["b"])
        for r in dedup.minhash_lsh_pairs(docs, max_bucket_size=10**6).collect()
    }
    assert uncapped == wide_cap

    boiler = spark.createDataFrame(
        [(i, "the same boilerplate text repeated again and again ok") for i in range(8)],
        "doc_id long, text string",
    )
    capped = dedup.minhash_lsh_pairs(boiler, max_bucket_size=4).collect()
    assert capped == []
    # sanity: without the cap binding, the planted dups ARE found
    found = dedup.minhash_lsh_pairs(boiler, max_bucket_size=100).collect()
    assert len(found) == 8 * 7 // 2


def test_ppm_roundtrip_and_resize():
    """Real decode path: PPM(P6) encode → decode round-trips exactly;
    nearest-neighbor resize of a constant image keeps the color."""
    import numpy as np

    img = np.zeros((6, 4, 3), dtype=np.uint8)
    img[:, :, 0] = 200
    img[:, :, 1] = 100
    img[:, :, 2] = 55
    payload = multimodal.encode_ppm(img)
    back = multimodal.decode_image(payload)
    assert back.shape == (6, 4, 3)
    assert (back == img).all()
    small = multimodal.decode_image(multimodal.resize_image(payload, 2, 3))
    assert small.shape == (3, 2, 3)
    assert (small.reshape(-1, 3) == [200, 100, 55]).all()


def test_bmp_decode_24bit():
    """Real decode path: hand-constructed 24-bit bottom-up BMP with row
    padding decodes to the expected RGB array."""
    import struct

    import numpy as np

    w, h = 3, 2  # stride = 12 (9 data + 3 pad)
    # rows stored bottom-up, pixels BGR
    top = [(255, 0, 0), (0, 255, 0), (0, 0, 255)]  # RGB of visual top row
    bottom = [(10, 20, 30)] * 3
    def row_bytes(px):
        return b"".join(bytes((b, g, r)) for (r, g, b) in px) + b"\x00" * 3

    raster = row_bytes(bottom) + row_bytes(top)  # bottom-up order
    off = 14 + 40
    header = (
        b"BM"
        + struct.pack("<IHHI", off + len(raster), 0, 0, off)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 0, 0, 0, 0)
    )
    img = multimodal.decode_image(header + raster)
    assert img.shape == (2, 3, 3)
    assert img[0].tolist() == [[255, 0, 0], [0, 255, 0], [0, 0, 255]]
    assert img[1].tolist() == [[10, 20, 30]] * 3


def test_pixel_features_on_decodable_payload():
    """extract_features must use the REAL pixel statistics for decodable
    payloads: a constant-color image's channel means are exact."""
    import numpy as np

    img = np.full((4, 4, 3), 128, dtype=np.uint8)
    f = multimodal._feature(multimodal.encode_ppm(img))
    assert f[2:5] == [128 / 255.0] * 3  # channel means
    assert f[5:8] == [0.0, 0.0, 0.0]  # constant image: zero std


def test_feature_fallback_on_truncated_bmp():
    """A payload starting with b'BM' but shorter than the BMP header must
    take the byte-histogram fallback (struct.error path), not crash the
    mapInPandas task."""
    for payload in (b"BM", b"BMshort", b"BM" + b"\x00" * 20):
        f = multimodal._feature(payload)
        assert f == multimodal._fake_feature(payload)
        assert len(f) == multimodal.FEATURE_DIM


def test_wav_roundtrip_and_chunk_walking():
    import struct

    import numpy as np
    import pytest

    from citegraph_spark.functions.multimodal import (
        audio_stats,
        decode_wav,
        encode_wav,
    )

    s = np.array([0, 5000, -5000, 32767, -32768, 1], dtype=np.int16)
    back, rate = decode_wav(encode_wav(s, 44100))
    assert rate == 44100 and (back == s).all()

    # chunk walking: an extra LIST chunk before fmt must be skipped
    w = encode_wav(s, 8000)
    body = w[12:]
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    w2 = b"RIFF" + struct.pack("<I", 4 + len(extra) + len(body)) + b"WAVE" + extra + body
    back2, rate2 = decode_wav(w2)
    assert rate2 == 8000 and (back2 == s).all()

    st = audio_stats(w)
    assert st["peak"] == 32768 and st["n_samples"] == 6
    # sign-class flips: 0(+),5000(+),-5000(-),32767(+),-32768(-),1(+) -> 4
    assert st["zcr"] == 4

    with pytest.raises(ValueError):
        decode_wav(b"RIFX1234WAVE")
    # stereo rejected as not-implemented, not silently mangled
    stereo = bytearray(encode_wav(s, 8000))
    struct.pack_into("<H", stereo, 22, 2)
    with pytest.raises(NotImplementedError):
        decode_wav(bytes(stereo))


def test_bruteforce_vectorized_selection_matches_perrow_reference(spark, emb):
    """r13 pin: cosine_topk_bruteforce's batched stable-argsort selection
    must reproduce the original per-row lexsort((ids, -sims)) semantics
    element-for-element (cosine 6dp desc, neighbor_id asc tie-break,
    self excluded)."""
    import numpy as np

    sub = emb.limit(40)
    rows = sub.select("vec_id", "embedding").collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    mat = mat / norms
    k = 3
    expected = {}
    for i, vid in enumerate(ids):
        sims = np.round(mat[i] @ mat.T, 6)
        sims[i] = -np.inf
        order = np.lexsort((ids, -sims))[:k]
        expected[int(vid)] = [
            (int(ids[j]), float(sims[j]), rank)
            for rank, j in enumerate(order, start=1)
        ]
    got = {}
    for r in similarity.cosine_topk_bruteforce(sub, k=k).collect():
        got.setdefault(r["vec_id"], []).append(
            (r["neighbor_id"], r["cosine"], r["rank"])
        )
    assert got == expected


def test_pq_batched_adc_matches_perrow_reference(spark, emb):
    """r13 pin: pq_topk's chunked gather-and-sum ADC emits exactly the
    per-row einsum/argpartition candidates of the original formulation
    (same shortlist set per query), and the final reranked top-k stays
    deterministic across the fanout repartition."""
    import numpy as np

    sub = emb.limit(60)
    n_sub, k_sub, shortlist = 16, 16, 8
    books = similarity._pq_codebooks(sub, n_sub, k_sub, "vec_id", "embedding")
    ids, mat = similarity._corpus_matrix(sub, "vec_id", "embedding")
    codes = similarity._pq_encode_matrix(mat, books)
    d_sub = books.shape[2]
    # per-row reference shortlist sets
    expected_sets = {}
    n_short = min(shortlist + 1, len(ids))
    for i, qid in enumerate(ids):
        lut = np.einsum("md,mcd->mc", mat[i].reshape(n_sub, d_sub), books)
        scores = lut[np.arange(n_sub)[None, :], codes].sum(axis=1)
        top = np.argpartition(-scores, n_short - 1)[:n_short]
        expected_sets[int(qid)] = {int(ids[j]) for j in top if ids[j] != qid}
    got_sets: dict[int, set] = {}
    cand = similarity.pq_topk(sub, k=3, shortlist=shortlist)
    # recover the candidate set from the reranked output's provenance:
    # every emitted neighbor must come from the reference shortlist
    for r in cand.collect():
        got_sets.setdefault(r["vec_id"], set()).add(r["neighbor_id"])
    for qid, nbrs in got_sets.items():
        assert nbrs <= expected_sets[qid], (qid, nbrs, expected_sets[qid])
        assert len(nbrs) == min(3, len(expected_sets[qid]))


def test_sample_top1_probe_matches_perrow_reference_and_null_exclusion(spark):
    """r14 pin: the certificate's exact-top1 Arrow kernel — after the
    feature-axis accumulation rewrite (O(B*Q) peak memory instead of two
    (B, Q, d) temporaries) — must reproduce the old JVM fold semantics
    row for row on one large Arrow batch, INCLUDING the null cases the
    old plan excluded implicitly: null vec_id / null embedding rows are
    dropped, and a null *element* poisons that row's cosines so it can
    never win top-1 (the old fold's NULL cosine under DESC NULLS LAST)."""
    import math

    import numpy as np

    from citegraph_spark.plans.text_queries import _sample_top1_exact

    rng = np.random.RandomState(7)
    n, d = 2000, 8
    mat = rng.randn(n, d)
    rows = [(i, [float(x) for x in mat[i]]) for i in range(n)]
    rows[50] = (50, None)  # null embedding: excluded outright
    rows.append((None, [1.0] * d))  # null id: excluded outright
    elem = [float(x) for x in mat[60]]
    elem[3] = None  # null element: row kept, cosines never win
    rows[60] = (60, elem)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    got = {
        r["vec_id"]: r["bf_neighbor"] for r in _sample_top1_exact(df).collect()
    }

    # reference: the old fold, driver-side, sequential summation order
    valid = [(i, v) for i, v in rows if i is not None and v is not None]
    ids = np.array([i for i, _ in valid], dtype=np.int64)
    m = np.array(
        [[math.nan if x is None else x for x in v] for _, v in valid],
        dtype=np.float64,
    )
    norms = np.sqrt(np.cumsum(m * m, axis=1)[:, -1])
    norms[norms == 0.0] = 1.0
    q_idx = np.argsort(ids)[:128]
    expected = {}
    for qi in q_idx:
        best = None  # (cos_r, c_id); None cosine never beats a value
        for cj in range(len(ids)):
            if ids[cj] == ids[qi]:
                continue
            dot = 0.0
            for kk in range(d):
                dot += m[cj, kk] * m[qi, kk]
            cos = dot / (norms[qi] * norms[cj])
            key = (
                (-math.inf, int(ids[cj]))
                if math.isnan(cos)
                else (round(cos, 6), int(ids[cj]))
            )
            if best is None or key[0] > best[0] or (
                key[0] == best[0] and key[1] < best[1]
            ):
                best = key
        expected[int(ids[qi])] = best[1]
    assert got == expected
    assert 50 not in got and None not in got  # dropped rows never query
    assert 60 in got  # null-element row still queries (all-NULL tie rule)

"""10x scale rehearsal for the heavy-tier graph operators.

Builds an sf1-equivalent citation graph by deterministic replication of
the sf0.1 lineitem mapping (K shifted disjoint copies — 10x nodes, 10x
edges, identical per-copy topology so per-round shapes are comparable),
then runs each heavy operator once at 1x and at Kx, recording wall time,
total shuffle read/write bytes, and peak JVM memory from the Spark UI
REST API. Purpose (VERDICT r3 item 6): document that round counts and
broadcast-budget fallbacks behave as designed at 10x, instead of arguing
it from docstrings. Results land in BASELINE.md.

Usage: python tools/scale_rehearsal.py [K] [tier]   (default 10 graph)
       tier: "graph" (heavy graph operators over the citation mapping)
             or "pipeline" (dedup/similarity LLM-pipeline tier over
             documents/embeddings; copies are deterministically
             perturbed — a copy-index token appended to each text —
             so replicas are NEAR-duplicates, the realistic worst case
             for LSH candidate volume, not byte-identical ones)
             or "relational" (scan-agg / fact-fact star join / per-key
             window / sessionization / as-of join over lineitem,
             orders and events; copies shift EVERY join/partition key
             by i*OFFSET so keys stay aligned across tables and
             per-key partition SIZE stays constant while key
             cardinality grows Kx — the shape a growing relational
             workload actually has, and exactly the regime where a
             global-sort window or a range-candidate join would blow
             up while one-shuffle idioms stay linear)
             or "skew" (hot-key rehearsal: 30% of Kx events on ONE
             user; the same skewed join measured with AQE skew-split
             off, on, and via the manual salted_join, plus the
             map-side-combine aggregation path)
             or "iterative" (hits / sssp_bounded / multi_source_bfs —
             the rest of the round-7 persist-fix family; seeds pinned
             to copy 0 so per-round state is constant while edges grow
             Kx)
             or "streaming" (Structured Streaming layer: windowed agg /
             stateful sessionize / watermark dedup driven through a
             real chronological file replay; copies shift user_id and
             event_id but keep ts UNCHANGED, so the windowed state
             keyspace is constant while input volume grows Kx — the
             regime where watermark-bounded state either holds or
             doesn't)
             or "text" (text-analysis layer: one-pass stats/quality/
             lang-ID scoring, fingerprint dedup scan, TF-IDF postings
             aggregate, BPE training — per-doc suffix-token replication
             like the pipeline tier, so all per-doc work runs Kx while
             vocabulary-bounded reductions stay ~flat)
             or "multimodal" (opaque binary payloads + typed metadata
             through the Arrow-batched mapInPandas UDFs: meta-only
             scan, featurize, 1:N frame explosion, WAV encode/decode —
             measures Python-worker throughput and confirms zero wide
             shuffle; the decode stub stands in for real codecs, the
             plumbing is what's measured)
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

SF_DIR = "/root/testdata/sf0.1"
OFFSET = 100_000_000  # far above any sf0.1 key, keeps copies disjoint


def _rest(port: int, path: str):
    with urllib.request.urlopen(f"http://localhost:{port}/api/v1/{path}") as r:
        return json.load(r)


def _metrics(spark):
    port = spark.sparkContext.uiWebUrl.rsplit(":", 1)[1]
    [app] = _rest(port, "applications")
    stages = _rest(port, f"applications/{app['id']}/stages?status=complete")
    execs = _rest(port, f"applications/{app['id']}/executors")
    return {
        "shuffle_read_mb": sum(s["shuffleReadBytes"] for s in stages) >> 20,
        "shuffle_write_mb": sum(s["shuffleWriteBytes"] for s in stages) >> 20,
        "n_stages": len(stages),
        "peak_jvm_heap_mb": max(
            (e.get("peakMemoryMetrics", {}) or {}).get("JVMHeapMemory", 0)
            for e in execs
        )
        >> 20,
    }


def _delta(after: dict, before: dict) -> dict:
    out = {k: after[k] - before[k] for k in ("shuffle_read_mb", "shuffle_write_mb", "n_stages")}
    out["peak_jvm_heap_mb"] = after["peak_jvm_heap_mb"]
    return out


def pipeline_tier(spark, k: int) -> dict:
    """1x vs Kx over the dedup/similarity layer. Documents replicate with
    a per-copy suffix token (near-dup clusters of size K — LSH's
    realistic stress); embeddings replicate with the copy index added to
    one dimension (distinct but locally clustered vectors)."""
    from pyspark.sql import functions as F

    from citegraph_spark.functions.dedup import (
        exact_canonical,
        minhash_lsh_pairs,
        simhash_near_pairs,
    )
    from citegraph_spark.functions.similarity import ivf_topk

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    def docs_x(copies: int):
        parts = [
            docs.select(
                (F.col("doc_id") + F.lit(i * OFFSET)).alias("doc_id"),
                F.concat(F.col("text"), F.lit(f" copytok{i}")).alias("text"),
            )
            for i in range(copies)
        ]
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        return df

    def emb_x(copies: int):
        parts = [
            emb.select(
                (F.col("vec_id") + F.lit(i * OFFSET)).alias("vec_id"),
                F.transform(
                    "embedding", lambda x, j: x + F.when(j == 0, i * 0.01).otherwise(0.0)
                ).alias("embedding"),
            )
            for i in range(copies)
        ]
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        return df

    def incremental_status_count(d):
        """Mirror of the registered dedup_incremental plan's core shape
        (plans/pipeline_queries.py): md5-bucket >= 80 is the NEW batch,
        PPJoin prefix-filtered posting join new x existing under one
        global rare-first order, exact-Jaccard >= 0.8 verify. Counts
        the flagged near-dups — the wall/shuffle profile the 100 TB
        continuous-ingest path runs on."""
        from citegraph_spark.functions import text as tx

        t = 0.8
        dd = (
            d.select("doc_id", "text", tx.tokens(F.col("text")).alias("_toks"))
            .select(
                "doc_id",
                F.array_distinct(tx.shingles(F.col("_toks"))).alias("sh"),
                (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
                 .cast("bigint") % 100).alias("b"),
            )
            .persist()
        )
        posting = dd.select("doc_id", "b", F.explode("sh").alias("s"))
        dfreq = posting.groupBy("s").agg(F.count("*").alias("df"))
        ordered = (
            posting.join(dfreq, "s")
            .groupBy("doc_id", "b")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("df", "s"))),
                    lambda x: x["s"],
                ).alias("os")
            )
        )
        n = F.size("os")
        plen = (n - F.ceil(F.lit(t) * n) + 1).cast("int")
        pre = ordered.select(
            "doc_id", "b", n.alias("n"), F.slice("os", F.lit(1), plen).alias("prefix")
        )
        np_ = pre.filter(F.col("b") >= 80).select(
            F.col("doc_id").alias("n_id"), F.col("n").alias("nn"),
            F.explode("prefix").alias("s"),
        )
        ep = pre.filter(F.col("b") < 80).select(
            F.col("doc_id").alias("e_id"), F.col("n").alias("ne"),
            F.explode("prefix").alias("s"),
        )
        cand = (
            np_.join(ep, "s")
            .filter(F.greatest("nn", "ne") * F.lit(t) <= F.least("nn", "ne"))
            .select("n_id", "e_id")
            .distinct()
        )
        n_sh = dd.filter(F.col("b") >= 80).select(
            F.col("doc_id").alias("n_id"), F.col("sh").alias("n_sh")
        )
        e_sh = dd.filter(F.col("b") < 80).select(
            F.col("doc_id").alias("e_id"), F.col("sh").alias("e_sh")
        )
        inter = F.size(F.array_intersect("n_sh", "e_sh"))
        union = F.size("n_sh") + F.size("e_sh") - inter
        out = (
            cand.join(n_sh, "n_id")
            .join(e_sh, "e_id")
            .filter(inter / union.cast("double") >= t)
            .select("n_id")
            .distinct()
            .count()
        )
        dd.unpersist()
        return out

    results: dict[str, dict] = {}
    for scale, copies in (("1x", 1), ("%dx" % k, k)):
        d = docs_x(copies).localCheckpoint(eager=True)
        e = emb_x(copies).localCheckpoint(eager=True)
        ops = {
            "dedup_exact": lambda: exact_canonical(d, "doc_id", "text").count(),
            "minhash_lsh_pairs": lambda: minhash_lsh_pairs(d, threshold=0.8).count(),
            "simhash_near_pairs": lambda: simhash_near_pairs(d, max_hamming=3).count(),
            "dedup_incremental": lambda: incremental_status_count(d),
            # DEFAULT ARGS on purpose (round 7): n_cells=None derives the
            # cell count inside the operator (ivf_cell_count — constant
            # cell size, n_cells ∝ N), so this measures what a caller who
            # passes nothing now gets. The round-4 run measured the FIXED
            # 16-cell grid at 10x and recorded the quadratic blowup
            # (158 s vs 8.1 s scaled) in BASELINE.md; the round-6 run
            # measured the rule applied MANUALLY (n_cells=16*copies).
            "ivf_topk": lambda: ivf_topk(e, k=3).count(),
        }
        for name, fn in ops.items():
            before = _metrics(spark)
            t0 = time.time()
            out = fn()
            wall = round(time.time() - t0, 1)
            m = _delta(_metrics(spark), before)
            results[f"{name}@{scale}"] = {"wall_s": wall, "result": out, **m}
            print(json.dumps({f"{name}@{scale}": results[f"{name}@{scale}"]}))
    return results


def iterative_tier(spark, k: int) -> dict:
    """1x vs Kx for the rest of the round-7 persist-fix family
    (VERDICT r7 item 6): pagerank and hyperball carry 100x records in
    BASELINE.md; hits / sssp_bounded / multi_source_bfs share the fixed
    code path (static edge table persisted pre-partitioned, per-round
    state broadcast or SHUFFLE_HASH-built) but had no record. Seeds and
    landmarks live in copy 0, so the reached ball — the per-round state
    — stays CONSTANT while the edge table grows Kx: exactly the regime
    where a silently re-shuffled static side would dominate, and where
    the fix should show flat stage counts per round with shuffle growing
    only with the O(E) one-time partitioning."""
    from pyspark.sql import functions as F

    from citegraph_spark.operators.graph import (
        bidirectional,
        hits,
        multi_source_bfs,
        sssp_bounded,
    )

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        F.col("l_orderkey").cast("long").alias("from"),
        F.col("l_partkey").cast("long").alias("to"),
    )
    landmarks = [
        r[0]
        for r in li.select("from").distinct().orderBy("from").limit(4).collect()
    ]

    def citations(copies: int):
        parts = [
            li.select(
                (F.col("from") + F.lit(i * OFFSET)).alias("from"),
                (F.col("to") + F.lit(i * OFFSET)).alias("to"),
            )
            for i in range(copies)
        ]
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        return df

    results: dict[str, dict] = {}
    for scale, copies in (("1x", 1), ("%dx" % k, k)):
        cit = citations(copies).localCheckpoint(eager=True)
        n_edges = cit.count()
        edges = cit.select(F.col("from").alias("src"), F.col("to").alias("dst"))
        und = bidirectional(cit, dedup=True).select("src", "dst")
        wedges = edges.withColumn(
            "w", ((F.col("src") * 31 + F.col("dst") * 17) % 97 + 1).cast("double")
        )
        ops = {
            "hits_10it": lambda: hits(edges, iterations=10).count(),
            "sssp_bounded_10r": lambda: sssp_bounded(
                wedges, source=int(landmarks[0]), rounds=10
            ).count(),
            "msbfs_6r": lambda: multi_source_bfs(
                und, sources=[int(x) for x in landmarks], rounds=6
            ).count(),
        }
        for name, fn in ops.items():
            before = _metrics(spark)
            t0 = time.time()
            out = fn()
            wall = round(time.time() - t0, 1)
            m = _delta(_metrics(spark), before)
            results[f"{name}@{scale}"] = {
                "wall_s": wall,
                "result": out,
                "n_edges": n_edges,
                **m,
            }
            print(json.dumps({f"{name}@{scale}": results[f"{name}@{scale}"]}))
    return results


def relational_tier(spark, k: int) -> dict:
    """1x vs Kx over the relational/events layer: scan-agg (q1 shape),
    fact-fact star join + agg (q5 core), per-customer running-total
    window (W1 at scale), event sessionization, and the union-and-carry
    as-of join. Every join/partition key is shifted per copy so the
    tables stay join-consistent and per-key group size is constant
    while key cardinality grows Kx."""
    from pyspark.sql import functions as F

    from citegraph_spark.operators.relational import (
        asof_join,
        running_total,
        sessionize,
    )

    li0 = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus",
    )
    o0 = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice",
        "o_orderpriority",
    )
    ev0 = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", "user_id", "ts", "value"
    )

    def replicate(df, key_cols, copies):
        parts = []
        for i in range(copies):
            p = df
            for c in key_cols:
                p = p.withColumn(c, F.col(c) + F.lit(i * OFFSET))
            parts.append(p)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    results: dict[str, dict] = {}
    for scale, copies in (("1x", 1), ("%dx" % k, k)):
        li = replicate(li0, ["l_orderkey"], copies).localCheckpoint(eager=True)
        o = replicate(o0, ["o_orderkey", "o_custkey"], copies).localCheckpoint(
            eager=True
        )
        ev = replicate(ev0, ["event_id", "user_id"], copies).localCheckpoint(
            eager=True
        )
        disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
        ops = {
            # q1 shape: scan + 2-key hash agg, group count constant
            "scan_agg_q1": lambda: li.groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum("l_quantity").alias("sum_qty"),
                F.sum(disc_price).alias("sum_disc_price"),
                F.sum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
                F.avg("l_extendedprice").alias("avg_price"),
                F.count("*").alias("n"),
            )
            .count(),
            # q5 core: the ONE fact-fact shuffle join, then small agg
            "star_join_agg": lambda: li.join(
                o, li["l_orderkey"] == o["o_orderkey"]
            )
            .groupBy("o_orderpriority")
            .agg(F.sum(disc_price).alias("revenue"))
            .count(),
            # W1 at scale: per-customer cumulative sum — partition COUNT
            # grows Kx, partition SIZE constant. Forced through an
            # aggregate OF the window column: a bare .count() would let
            # Catalyst prune the whole window (it doesn't change row
            # count) and measure nothing.
            "window_running_total": lambda: round(
                running_total(
                    o, "o_orderdate", "o_totalprice", "cum_spend",
                    partition_by=["o_custkey"],
                )
                .agg(F.max("cum_spend"))
                .first()[0],
                2,
            ),
            # one shuffle on user + per-user sorted scan (same forcing)
            "sessionize_30min": lambda: sessionize(
                ev, "user_id", "ts", gap_minutes=30
            )
            .agg(F.max("session_id"))
            .first()[0],
            # union-and-carry as-of: one shuffle on key, no range blowup;
            # count the non-null carried column so the carry window runs
            "asof_join_ev_orders": lambda: asof_join(
                ev, o, key="user_id", left_ts="ts", right_ts="o_orderdate",
                right_cols=["o_orderkey"], right_key="o_custkey",
            )
            .agg(F.count("o_orderkey"))
            .first()[0],
        }
        for name, fn in ops.items():
            before = _metrics(spark)
            t0 = time.time()
            out = fn()
            wall = round(time.time() - t0, 1)
            m = _delta(_metrics(spark), before)
            results[f"{name}@{scale}"] = {"wall_s": wall, "result": out, **m}
            print(json.dumps({f"{name}@{scale}": results[f"{name}@{scale}"]}))
    return results


def skew_tier(spark, k: int) -> dict:
    """Hot-key rehearsal: events replicated Kx, then 30% of ALL rows
    remapped onto one user — the adversarial input for any shuffle on
    user. Measures the same skewed join four ways:

    - smj_aqe_skew_off: sort-merge join with AQE's skew split disabled —
      the pathological baseline (one reducer gets 30% of the table).
    - smj_aqe_skew_on: AQE skew-join split enabled with thresholds
      scaled to this corpus (the 256 MB default is sized for production
      partitions; at 100 TB the DEFAULTS trigger — scaling them down is
      what makes the mechanism observable at rehearsal scale).
    - salted_join: the manual mitigation (operators/relational.py) for
      paths AQE can't split.
    - skewed groupBy agg: partial aggregation absorbs the hot key
      map-side; expected flat, recorded to prove it.

    Broadcast is disabled for the join measurements: at rehearsal scale
    the dim side fits any broadcast budget and Spark would (correctly)
    sidestep the skew entirely — the measurement emulates the 100 TB
    case where the dim is too big to broadcast and the shuffle is
    unavoidable."""
    from pyspark.sql import functions as F

    from citegraph_spark.operators.relational import salted_join

    ev0 = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", "user_id", "value"
    )
    parts = [
        ev0.select(
            (F.col("event_id") + F.lit(i * OFFSET)).alias("event_id"),
            (F.col("user_id") + F.lit(i * OFFSET)).alias("user_id"),
            "value",
        )
        for i in range(k)
    ]
    ev = parts[0]
    for p in parts[1:]:
        ev = ev.unionByName(p)
    ev = ev.withColumn(
        "user_id",
        F.when(F.pmod(F.xxhash64("event_id"), F.lit(10)) < 3, F.lit(1)).otherwise(
            F.col("user_id")
        ),
    ).localCheckpoint(eager=True)
    dim = (
        ev.select("user_id")
        .distinct()
        .withColumn("segment", F.pmod("user_id", F.lit(7)))
        .localCheckpoint(eager=True)
    )
    n_rows = ev.count()
    hot = ev.filter(F.col("user_id") == 1).count()

    def joined_agg(left):
        return (
            left.groupBy("segment")
            .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("v"))
            .count()
        )

    conf = spark.conf
    saved = {
        key: conf.get(key, None)
        for key in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        )
    }
    results: dict[str, dict] = {}

    def run(name, fn):
        before = _metrics(spark)
        t0 = time.time()
        out = fn()
        wall = round(time.time() - t0, 1)
        m = _delta(_metrics(spark), before)
        results[name] = {"wall_s": wall, "result": out, **m}
        print(json.dumps({name: results[name]}))

    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        run(
            f"smj_aqe_skew_off@{k}x",
            lambda: joined_agg(ev.join(dim, "user_id")),
        )
        conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4m"
        )
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
        run(
            f"smj_aqe_skew_on@{k}x",
            lambda: joined_agg(ev.join(dim, "user_id")),
        )
        run(
            f"salted_join_32@{k}x",
            lambda: joined_agg(salted_join(ev, dim, "user_id", n_salts=32)),
        )
        run(
            f"skewed_groupby_agg@{k}x",
            lambda: ev.groupBy("user_id")
            .agg(F.count("*").alias("n"), F.sum("value").alias("v"))
            .count(),
        )
    finally:
        for key, val in saved.items():
            if val is None:
                conf.unset(key)
            else:
                conf.set(key, val)
    results["_shape"] = {"rows": n_rows, "hot_key_rows": hot}
    print(json.dumps({"_shape": results["_shape"]}))
    return results


def _prog_dicts(q) -> list:
    """StreamingQueryProgress → plain dicts across PySpark versions
    (dicts pre-3.4; objects with a `.json` property/method after)."""
    out = []
    for p in q.recentProgress:
        if isinstance(p, dict):
            out.append(p)
        else:
            j = p.json() if callable(p.json) else p.json
            out.append(json.loads(j))
    return out


def streaming_tier(spark, k: int) -> dict:
    """1x vs Kx event volume through the Structured Streaming layer —
    the one family (10 green entries, stream==batch value hashes in r6)
    that had correctness records but no at-scale record. Copies shift
    user_id/event_id by i*OFFSET and keep ts UNCHANGED, so the
    replicated stream covers the SAME 30-day event-time range: the
    windowed aggregate's state keyspace (15-min window x event_type,
    ~2880x5 rows) is CONSTANT while input volume grows Kx. Each scale
    replays through a real file-source stream as 8 CHRONOLOGICAL slices
    (ts-quantile split, one file per slice, maxFilesPerTrigger=2 → 4
    micro-batches) so the watermark advances monotonically and the
    sessionizer's cross-batch state sees in-order arrival, as a log/
    kafka replay would deliver.

    Claims measured, not argued:
    - windowed agg (complete mode): stateOperators numRowsTotal
      IDENTICAL at 1x and Kx — state tracks the keyspace, never the
      event count; final table exactly equals the batch aggregate over
      the same replicated input (exactness at Kx); events/s throughput.
    - stateful sessionize (applyInPandasWithState): state rows = open
      sessions = distinct users — grows with KEYS (x K), not events;
      closed-session count is exactly Kx the 1x count (per-copy
      topology identical), checked via foreachBatch counting so the
      driver never materializes the Kx output.
    - dropDuplicatesWithinWatermark: the 8 slices are delivered TWICE
      (at-least-once source); output count equals single-delivery
      exactly at both scales. Dedup state is ~one row per event_id
      inside the 30-day horizon BY DESIGN (the horizon is the
      out-of-orderness bound a deployment tunes); reported, not hidden.
    """
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from citegraph_spark.streaming.events import (
        _events_read_schema,
        _normalize_ts,
        _session_state_fn,
        streaming_windowed_agg,
    )
    from pyspark.sql.streaming.state import GroupStateTimeout

    schema, ts_is_long = _events_read_schema(spark, f"{SF_DIR}/events.parquet")
    ev0 = _normalize_ts(
        spark.read.parquet(f"{SF_DIR}/events.parquet"), ts_is_long
    ).select("event_id", "ts", "user_id", "event_type", "value")

    N_SLICES = 8

    def replicate(copies: int):
        parts = [
            ev0.select(
                (F.col("event_id") + F.lit(i * OFFSET)).alias("event_id"),
                "ts",
                (F.col("user_id") + F.lit(i * OFFSET)).alias("user_id"),
                "event_type",
                "value",
            )
            for i in range(copies)
        ]
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        return df

    def write_slices(df, indir: str) -> None:
        """One parquet file per ts-quantile slice, written in
        chronological order (file-source pickup is mtime-then-path; both
        agree with slice order here)."""
        import os

        qs = [i / N_SLICES for i in range(1, N_SLICES)]
        cuts = df.select(F.col("ts").cast("long").alias("e")).approxQuantile(
            "e", qs, 0.001
        )
        bounds = [float("-inf"), *cuts, float("inf")]
        os.makedirs(indir, exist_ok=True)
        stage = tempfile.mkdtemp(prefix="slice_stage_")
        try:
            for i in range(N_SLICES):
                lo, hi = bounds[i], bounds[i + 1]
                e = F.col("ts").cast("long")
                sl = df.filter((e >= F.lit(lo)) & (e < F.lit(hi)))
                sdir = f"{stage}/{i}"
                sl.coalesce(1).write.mode("overwrite").parquet(sdir)
                [part] = [
                    f for f in os.listdir(sdir) if f.endswith(".parquet")
                ]
                shutil.copy(f"{sdir}/{part}", f"{indir}/f{i:02d}.parquet")
        finally:
            shutil.rmtree(stage, ignore_errors=True)

    def read_stream(indir: str, mft: int = 2):
        s = spark.read.parquet(indir).schema
        return (
            spark.readStream.format("parquet")
            .schema(s)
            .option("maxFilesPerTrigger", str(mft))
            .load(indir)
        )

    def drive(out_df, name: str, mode: str, for_each_batch=None):
        """Run to completion; return (memory table or None, progress)."""
        with tempfile.TemporaryDirectory() as ckpt:
            w = out_df.writeStream.outputMode(mode).option(
                "checkpointLocation", ckpt
            )
            if for_each_batch is not None:
                q = w.foreachBatch(for_each_batch).start()
            else:
                q = w.format("memory").queryName(name).start()
            q.processAllAvailable()
            prog = _prog_dicts(q)
            q.stop()
            q.awaitTermination(30)
        tbl = None if for_each_batch is not None else spark.table(name)
        return tbl, prog

    def state_rows(prog: list) -> int:
        for p in reversed(prog):
            ops = p.get("stateOperators") or []
            if ops:
                return sum(o.get("numRowsTotal", 0) for o in ops)
        return 0

    def n_batches(prog: list) -> int:
        return sum(1 for p in prog if p.get("numInputRows", 0) > 0)

    results: dict[str, dict] = {}

    def record(name: str, wall: float, before: dict, extra: dict) -> None:
        m = _delta(_metrics(spark), before)
        results[name] = {"wall_s": round(wall, 1), **extra, **m}
        print(json.dumps({name: results[name]}))

    tmp = tempfile.mkdtemp(prefix="stream_rehearsal_")
    try:
        for scale, copies in (("1x", 1), ("%dx" % k, k)):
            indir = f"{tmp}/in_{scale}"
            write_slices(replicate(copies), indir)
            static = spark.read.parquet(indir)
            n_events = static.count()

            # -- windowed aggregate: constant state, exact vs batch ----
            before = _metrics(spark)
            t0 = time.time()
            tbl, prog = drive(
                streaming_windowed_agg(read_stream(indir)),
                f"rehearsal_wagg_{scale}",
                "complete",
            )
            wall = time.time() - t0
            got = {tuple(r) for r in tbl.collect()}
            batch = {
                tuple(r)
                for r in static.groupBy(
                    F.window("ts", "15 minutes").alias("w"), "event_type"
                )
                .agg(
                    F.count("*").alias("n"),
                    F.round(F.sum("value"), 2).alias("value_sum"),
                )
                .select(
                    F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias(
                        "window_start"
                    ),
                    "event_type",
                    "n",
                    "value_sum",
                )
                .collect()
            }
            record(
                f"windowed_agg@{scale}",
                wall,
                before,
                {
                    "n_events": n_events,
                    "events_per_s": int(n_events / max(wall, 1e-9)),
                    "state_rows": state_rows(prog),
                    "micro_batches": n_batches(prog),
                    "equals_batch": got == batch,
                    "result_rows": len(got),
                },
            )

            # -- stateful sessionize: state ~ keys, output exactly xK --
            sess_in = read_stream(indir).select(
                "user_id",
                F.col("ts").cast("timestamp").cast("long").alias("ts_epoch"),
            )
            sess = sess_in.groupBy("user_id").applyInPandasWithState(
                _session_state_fn,
                outputStructType=(
                    "user_id bigint, session_start long, n_events bigint"
                ),
                stateStructType="start long, last long, n bigint",
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout,
            )
            closed: list[int] = []
            before = _metrics(spark)
            t0 = time.time()
            _, prog = drive(
                sess,
                f"rehearsal_sess_{scale}",
                "append",
                for_each_batch=lambda bdf, bid: closed.append(bdf.count()),
            )
            wall = time.time() - t0
            record(
                f"sessionize@{scale}",
                wall,
                before,
                {
                    "n_events": n_events,
                    "events_per_s": int(n_events / max(wall, 1e-9)),
                    "state_rows": state_rows(prog),
                    "micro_batches": n_batches(prog),
                    "closed_sessions": sum(closed),
                },
            )

            # -- watermark dedup under doubled delivery ----------------
            ddir = f"{tmp}/dd_{scale}"
            import os

            os.makedirs(ddir, exist_ok=True)
            for f_ in sorted(os.listdir(indir)):
                shutil.copy(f"{indir}/{f_}", f"{ddir}/{f_}")
            for f_ in sorted(os.listdir(indir)):
                shutil.copy(f"{indir}/{f_}", f"{ddir}/r{f_}")
            deduped = (
                read_stream(ddir, mft=4)
                .withWatermark("ts", "30 days")
                .dropDuplicatesWithinWatermark(["event_id"])
            )
            seen: list[int] = []
            before = _metrics(spark)
            t0 = time.time()
            _, prog = drive(
                deduped,
                f"rehearsal_dedup_{scale}",
                "append",
                for_each_batch=lambda bdf, bid: seen.append(bdf.count()),
            )
            wall = time.time() - t0
            record(
                f"watermark_dedup@{scale}",
                wall,
                before,
                {
                    "n_delivered": 2 * n_events,
                    "n_after_dedup": sum(seen),
                    "exactly_once": sum(seen) == n_events,
                    "state_rows": state_rows(prog),
                    "micro_batches": n_batches(prog),
                },
            )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return results


def text_tier(spark, k: int) -> dict:
    """1x vs Kx over the text-analysis layer (the last family without a
    measured rehearsal record). Docs replicate with the pipeline tier's
    per-copy suffix token, so replicas are distinct documents and every
    per-doc expression runs Kx times. The four ops cover the family's
    four physical shapes:

    - stats_quality_langid: tokens + length/punct/stopword stats +
      quality score + language-ID votes in ONE narrow pass, reduced to a
      3-value aggregate. No wide shuffle at all — the shape every per-doc
      scoring filter has; wall must be ~linear in docs.
    - fingerprint_distinct: md5 canonical-form fingerprint, then
      countDistinct — one shuffle keyed by fingerprint (cardinality =
      distinct normal forms, here ~docs). The exact-dedup scan shape.
    - tfidf_top25: explode -> per-term hash aggregate -> broadcast
      1-row corpus size -> top-k heap (mirror of the registered
      tfidf_top_terms plan). Shuffle is the postings aggregate, linear
      in corpus; reduced output bounded by the VOCABULARY.
    - bpe_train_8: weighted vocab aggregate (corpus-linear scan, vocab-
      bounded shuffle) + 8 merge rounds that touch ONLY the vocab table —
      past the initial scan, merge-round cost must be ~flat in corpus
      size because vocab cardinality is corpus-bounded, not corpus-
      linear (copies add one `copytokI` type each, noise)."""
    from pyspark.sql import functions as F

    from citegraph_spark.functions import text as tx

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")

    def docs_x(copies: int):
        parts = [
            docs.select(
                (F.col("doc_id") + F.lit(i * OFFSET)).alias("doc_id"),
                F.concat(F.col("text"), F.lit(f" copytok{i}")).alias("text"),
            )
            for i in range(copies)
        ]
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        return df

    def stats_quality_langid(d):
        t = d.select("doc_id", "text", tx.tokens(F.col("text")).alias("toks"))
        n_tokens = F.size("toks")
        punct_ratio = F.when(F.length("text") == 0, 0.0).otherwise(
            tx.punct_count(F.col("text")) / F.length("text")
        )
        stop_ratio = F.when(n_tokens == 0, 0.0).otherwise(
            tx.stopword_count(F.col("toks")) / n_tokens
        )
        scored = t.select(
            "doc_id",
            tx.quality_score(n_tokens, punct_ratio, stop_ratio).alias("q"),
            *[
                c.alias(f"_v_{lang}")
                for lang, c in tx.lang_votes(F.col("toks")).items()
            ],
        )
        col_votes = {lang: F.col(f"_v_{lang}") for lang in tx.LANG_MARKERS}
        row = (
            scored.select("q", tx.predict_lang(col_votes).alias("pl"))
            .agg(
                F.count("*").alias("n"),
                F.round(F.avg("q"), 6).alias("avg_q"),
                F.countDistinct("pl").alias("n_langs"),
            )
            .first()
        )
        return [row["n"], float(row["avg_q"]), row["n_langs"]]

    def fingerprint_distinct(d):
        return (
            d.select(tx.fingerprint(F.col("text")).alias("fp"))
            .agg(F.countDistinct("fp"))
            .first()[0]
        )

    def tfidf_top25(d):
        t = d.select("doc_id", tx.tokens(F.col("text")).alias("toks"))
        n_total = t.select(F.count("*").alias("n_total"))
        tf = t.select("doc_id", F.explode("toks").alias("term"))
        stats = tf.groupBy("term").agg(
            F.count("*").alias("tf_total"),
            F.countDistinct("doc_id").alias("df"),
        )
        top = (
            stats.crossJoin(F.broadcast(n_total))
            .filter(F.col("df") < F.col("n_total"))
            .select(
                "term",
                F.round(
                    F.col("tf_total") * F.log(F.col("n_total") / F.col("df")), 6
                ).alias("tfidf"),
            )
            .orderBy(F.desc("tfidf"), "term")
            .limit(25)
            .collect()
        )
        return len(top)

    def bpe_train_8(d):
        vocab = (
            d.select(F.explode(tx.tokens(F.col("text"))).alias("tok"))
            .groupBy("tok")
            .agg(F.count("*").alias("cnt"))
        )
        return len(tx.bpe_train(vocab, n_merges=8))

    results: dict[str, dict] = {}
    for scale, copies in (("1x", 1), ("%dx" % k, k)):
        d = docs_x(copies).localCheckpoint(eager=True)
        ops = {
            "stats_quality_langid": lambda: stats_quality_langid(d),
            "fingerprint_distinct": lambda: fingerprint_distinct(d),
            "tfidf_top25": lambda: tfidf_top25(d),
            "bpe_train_8": lambda: bpe_train_8(d),
        }
        for name, fn in ops.items():
            before = _metrics(spark)
            t0 = time.time()
            out = fn()
            wall = round(time.time() - t0, 1)
            m = _delta(_metrics(spark), before)
            results[f"{name}@{scale}"] = {"wall_s": wall, "result": out, **m}
            print(json.dumps({f"{name}@{scale}": results[f"{name}@{scale}"]}))
    return results


def multimodal_tier(spark, k: int) -> dict:
    """1x vs Kx over the multimodal layer: opaque binary payloads +
    typed metadata, processed by Arrow-batched mapInPandas UDFs. The
    decode step is the container-limitation stub (deterministic byte
    histogram — functions/multimodal.py); everything this tier measures
    is the part that IS real and survives a codec swap: the binary
    schema, the Arrow batch boundary, the Python-worker throughput, and
    the 1:N frame explosion. Four physical shapes:

    - meta_scan: metadata aggregate that never touches the payload —
      the column-pruned shape a 100 TB multimodal table is designed for.
    - extract_features: one mapInPandas pass, one output row per input
      row — the image featurize shape; wall measures Arrow round-trip +
      Python featurize throughput.
    - sample_frames: the 1:N explosion (4 frames per payload) — output
      row count must be exactly 4x docs at both scales.
    - audio_encode_decode: real RIFF/WAVE encode + chunk-walk decode +
      integer stats per row — the heaviest per-row Python work in the
      family.

    All four are embarrassingly parallel: ZERO wide shuffle expected at
    either scale (the only exchanges are the final 1-row aggregates)."""
    from pyspark.sql import functions as F

    from citegraph_spark.functions import multimodal as mm

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")

    def docs_x(copies: int):
        parts = [
            docs.select(
                (F.col("doc_id") + F.lit(i * OFFSET)).alias("doc_id"),
                F.concat(F.col("text"), F.lit(f" copytok{i}")).alias("text"),
            )
            for i in range(copies)
        ]
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        return df

    def meta_scan(d):
        b = mm.to_binary_payload(d, "doc_id", "text")
        r = b.agg(
            F.count("*").alias("n"),
            F.sum(F.col("meta.n_bytes")).alias("total_bytes"),
        ).first()
        return [r["n"], r["total_bytes"]]

    def extract_features(d):
        b = mm.to_binary_payload(d, "doc_id", "text")
        r = (
            mm.extract_features(b)
            .agg(
                F.count("*").alias("n"),
                # dim 3 = bytes 96-127 (lowercase ASCII) — the densest
                # histogram bucket for text payloads, so the checksum is
                # actually sensitive (dim 0 would sum to 0.0)
                F.round(F.sum(F.element_at("feature", 4)), 3).alias("f3_sum"),
            )
            .first()
        )
        return [r["n"], float(r["f3_sum"])]

    def sample_frames(d):
        b = mm.to_binary_payload(d, "doc_id", "text", modality="video")
        r = (
            mm.sample_frames(b)
            .agg(
                F.count("*").alias("n_frames"),
                F.countDistinct("frame_idx").alias("n_idx"),
            )
            .first()
        )
        return [r["n_frames"], r["n_idx"]]

    def audio_encode_decode(d):
        import pandas as pd

        def batches(it):
            import numpy as np

            for pdf in it:
                zcr = []
                for text in pdf["text"]:
                    raw = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
                    samples = ((raw.astype(np.int64) - 100) * 256).astype(np.int16)
                    st = mm.audio_stats(mm.encode_wav(samples, 8000))
                    zcr.append(st["zcr"])
                yield pd.DataFrame({"zcr": zcr})

        r = (
            d.mapInPandas(batches, schema="zcr int")
            .agg(F.count("*").alias("n"), F.sum("zcr").alias("zcr_sum"))
            .first()
        )
        return [r["n"], r["zcr_sum"]]

    results: dict[str, dict] = {}
    for scale, copies in (("1x", 1), ("%dx" % k, k)):
        d = docs_x(copies).localCheckpoint(eager=True)
        ops = {
            "meta_scan": lambda: meta_scan(d),
            "extract_features": lambda: extract_features(d),
            "sample_frames": lambda: sample_frames(d),
            "audio_encode_decode": lambda: audio_encode_decode(d),
        }
        for name, fn in ops.items():
            before = _metrics(spark)
            t0 = time.time()
            out = fn()
            wall = round(time.time() - t0, 1)
            m = _delta(_metrics(spark), before)
            results[f"{name}@{scale}"] = {"wall_s": wall, "result": out, **m}
            print(json.dumps({f"{name}@{scale}": results[f"{name}@{scale}"]}))
    return results


def main(k: int = 10, tier: str = "graph") -> int:
    sys.path.insert(0, "/root/repo")
    from pyspark.sql import functions as F

    from citegraph_spark.operators.graph import (
        bidirectional,
        connected_components_star,
        connected_pairs_by_distance,
        pagerank,
    )
    from citegraph_spark.operators.mst import minimum_spanning_forest
    from citegraph_spark.functions.sketches import hyperball_hopplot
    from citegraph_spark.session import get_spark

    spark = get_spark(
        app_name="scale_rehearsal", extra_conf={"spark.ui.enabled": "true"}
    )

    if tier == "pipeline":
        results = pipeline_tier(spark, k)
        print(json.dumps(results, indent=1))
        return 0
    if tier == "relational":
        results = relational_tier(spark, k)
        print(json.dumps(results, indent=1))
        return 0
    if tier == "iterative":
        results = iterative_tier(spark, k)
        print(json.dumps(results, indent=1))
        return 0
    if tier == "skew":
        results = skew_tier(spark, k)
        print(json.dumps(results, indent=1))
        return 0
    if tier == "streaming":
        results = streaming_tier(spark, k)
        print(json.dumps(results, indent=1))
        return 0
    if tier == "text":
        results = text_tier(spark, k)
        print(json.dumps(results, indent=1))
        return 0
    if tier == "multimodal":
        results = multimodal_tier(spark, k)
        print(json.dumps(results, indent=1))
        return 0

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        F.col("l_orderkey").cast("long").alias("from"),
        F.col("l_partkey").cast("long").alias("to"),
    )

    def citations(copies: int):
        parts = [
            li.select(
                (F.col("from") + F.lit(i * OFFSET)).alias("from"),
                (F.col("to") + F.lit(i * OFFSET)).alias("to"),
            )
            for i in range(copies)
        ]
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        return df

    def heavy_ops(cit):
        edges = bidirectional(cit, dedup=False)
        ded = bidirectional(cit, dedup=True)
        und = cit.filter(F.col("from") != F.col("to")).select(
            F.least("from", "to").alias("a"), F.greatest("from", "to").alias("b")
        ).distinct()
        mst_edges = (
            und.filter((F.col("a") % 4 == 0) & (F.col("b") % 4 == 0))
            .withColumn(
                "weight", ((F.col("a") * 31 + F.col("b") * 17) % 997 + 1).cast("double")
            )
            .select(F.col("a").alias("src"), F.col("b").alias("dst"), "weight")
        )
        return {
            "hyperball_d2": lambda: len(hyperball_hopplot(edges, p=6, max_d=2)),
            "pagerank_10it": lambda: pagerank(
                cit.select(F.col("from").alias("src"), F.col("to").alias("dst")),
                iterations=10,
            ).count(),
            "cc_star": lambda: connected_components_star(
                ded.select(F.col("src"), F.col("dst"))
            ).count(),
            "mst_boruvka": lambda: minimum_spanning_forest(mst_edges).count(),
            "hopplot_d2_exact": lambda: connected_pairs_by_distance(ded, max_d=2)[-1][1],
        }

    results: dict[str, dict] = {}
    for scale, copies in (("1x", 1), ("%dx" % k, k)):
        cit = citations(copies).localCheckpoint(eager=True)
        n_edges = cit.count()
        for name, fn in heavy_ops(cit).items():
            before = _metrics(spark)
            t0 = time.time()
            out = fn()
            wall = round(time.time() - t0, 1)
            m = _delta(_metrics(spark), before)
            results[f"{name}@{scale}"] = {
                "wall_s": wall,
                "result": out,
                "n_edges": n_edges,
                **m,
            }
            print(json.dumps({f"{name}@{scale}": results[f"{name}@{scale}"]}))
    print(json.dumps(results, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(
        main(
            int(sys.argv[1]) if len(sys.argv) > 1 else 10,
            sys.argv[2] if len(sys.argv) > 2 else "graph",
        )
    )

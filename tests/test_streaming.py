"""Structured-Streaming ingestion tests: incremental link extraction,
stateful cross-batch dedupe, windowed host rates. File source +
availableNow trigger → deterministic, finite runs."""

import pytest
from pyspark.sql import functions as F

from spider_spark.sources.pages import synthetic_pages
from spider_spark.streaming.ingest import (
    dedupe_links_stream,
    extract_links_stream,
    host_rate,
    read_pages_stream,
    run_to_completion,
    run_to_memory,
)


@pytest.fixture(scope="module")
def pages_dir(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("stream_pages")
    pages = synthetic_pages(spark, 60)
    # two separate drops → two file-source micro-batch sets
    pages.filter(F.col("url").rlike("/d/[0-2][0-9]?$")).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(root / "in"))
    pages.filter(~F.col("url").rlike("/d/[0-2][0-9]?$")).coalesce(1).write.mode(
        "append"
    ).parquet(str(root / "in"))
    return root


def test_incremental_links_and_dedupe(spark, pages_dir, tmp_path):
    stream = read_pages_stream(
        spark, str(pages_dir / "in"), schema=spark.read.parquet(
            str(pages_dir / "in")
        ).schema, max_files_per_trigger=1,
    )
    links = extract_links_stream(stream)
    deduped = dedupe_links_stream(links, n_shards=4)
    out = str(tmp_path / "out")
    run_to_completion(deduped, str(tmp_path / "ckpt"), out)

    got = spark.read.parquet(out)
    rows = got.collect()
    # each link emitted exactly once across all micro-batches
    assert got.count() == got.select("link").distinct().count()
    # and matches the batch-mode link set exactly
    batch_links = {
        r["l"]
        for r in extract_links_stream(
            spark.read.parquet(str(pages_dir / "in"))
        ).select(F.col("link").alias("l")).distinct().collect()
    }
    assert {r["link"] for r in rows} == batch_links


def test_restart_resumes_from_checkpoint(spark, pages_dir, tmp_path):
    """New files after a completed run are processed incrementally; the
    seen-state survives the restart so old links are not re-emitted."""
    in_dir = str(pages_dir / "in2")
    full = synthetic_pages(spark, 40)
    full.filter(F.col("url").rlike("/d/[0-9]$")).coalesce(1).write.mode(
        "overwrite"
    ).parquet(in_dir)
    schema = spark.read.parquet(in_dir).schema
    out, ckpt = str(tmp_path / "out2"), str(tmp_path / "ckpt2")

    def drain():
        run_to_completion(
            dedupe_links_stream(
                extract_links_stream(read_pages_stream(spark, in_dir, schema)),
                n_shards=4,
            ),
            ckpt, out,
        )

    drain()
    n_first = spark.read.parquet(out).count()
    assert n_first > 0
    # drop the remaining pages and re-run from the same checkpoint
    full.filter(~F.col("url").rlike("/d/[0-9]$")).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    drain()
    got = spark.read.parquet(out)
    assert got.count() == got.select("link").distinct().count()


def test_pure_revisit_batch_emits_nothing(spark, tmp_path):
    """Per-batch state cost is O(new): a follow-up batch that is 100%
    revisits emits zero rows (every link is a MapState point-hit; nothing
    is admitted, nothing rewritten)."""
    in_dir = str(tmp_path / "in3")
    pages = synthetic_pages(spark, 30)
    pages.coalesce(1).write.mode("overwrite").parquet(in_dir)
    schema = spark.read.parquet(in_dir).schema
    out, ckpt = str(tmp_path / "out3"), str(tmp_path / "ckpt3")

    def drain():
        run_to_completion(
            dedupe_links_stream(
                extract_links_stream(read_pages_stream(spark, in_dir, schema)),
                n_shards=4,
            ),
            ckpt, out,
        )

    drain()
    n_first = spark.read.parquet(out).count()
    assert n_first > 0
    # identical pages land again (new files, same links) → all revisits
    pages.coalesce(1).write.mode("append").parquet(in_dir)
    drain()
    assert spark.read.parquet(out).count() == n_first


def test_clean_pages_stream_matches_batch(spark, pages_dir, tmp_path):
    """Stateless cleaning runs identically over the stream and the same
    data as a batch: per-url fingerprints/quality/token counts equal."""
    from spider_spark.streaming.ingest import clean_pages_stream

    src = str(pages_dir / "in")
    schema = spark.read.parquet(src).schema
    out = str(tmp_path / "clean_out")
    run_to_completion(
        clean_pages_stream(read_pages_stream(spark, src, schema)),
        str(tmp_path / "clean_ckpt"), out,
    )
    streamed = {
        r["url"]: (r["fingerprint"], r["n_tokens"], round(r["quality"], 9))
        for r in spark.read.parquet(out).collect()
    }
    batch = {
        r["url"]: (r["fingerprint"], r["n_tokens"], round(r["quality"], 9))
        for r in clean_pages_stream(spark.read.parquet(src)).collect()
    }
    assert streamed == batch and len(batch) == 60


def test_exact_dedup_gate_stream(spark, tmp_path):
    """foreachBatch ingest gate over a persisted ExactIndex: within-batch
    keeper + cross-batch fingerprint gate, order-independent assertions
    (the file source's batch order is not contractual)."""
    from pyspark.sql.types import StringType, StructField, StructType

    from spider_spark.operators.dedup_index import ExactIndex
    from spider_spark.sources.tableio import ParquetManifestIO
    from spider_spark.streaming.ingest import dedup_gate_stream

    in_dir = str(tmp_path / "in")
    # drop 1: a within-batch dup pair (normalization-equal beta texts)
    spark.createDataFrame(
        [("u1", "alpha text"), ("u2", "beta text"), ("u2b", "  BETA   text ")],
        ["url", "text"],
    ).coalesce(1).write.mode("append").parquet(in_dir)
    # drop 2: a cross-batch dup (alpha again) + a fresh doc
    spark.createDataFrame(
        [("u3", "alpha text"), ("u4", "gamma text")], ["url", "text"]
    ).coalesce(1).write.mode("append").parquet(in_dir)

    schema = StructType([
        StructField("url", StringType()), StructField("text", StringType()),
    ])
    idx = ExactIndex(
        ParquetManifestIO(spark, str(tmp_path / "idx")),
        id_col="url", text_col="text", n_parts=8,
    )
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(in_dir)
    out = str(tmp_path / "out")
    stats = dedup_gate_stream(stream, idx, str(tmp_path / "ckpt"), out)

    got = spark.read.parquet(out)
    # 3 distinct normalized fingerprints in → exactly 3 docs out, 2 gated
    assert got.count() == 3
    assert stats == {"batches": 2, "in_rows": 5, "gated": 2, "out_rows": 3}
    texts = {r["text"].split()[0].lower() for r in got.collect()}
    assert texts == {"alpha", "beta", "gamma"}
    # the index now gates any future refetch of committed content
    probe = spark.createDataFrame([("u9", "gamma text")], ["url", "text"])
    assert idx.probe_hits(probe).count() == 1

    # a later drop against the SAME checkpoint resumes incrementally and
    # the persisted gate still holds across the restart
    spark.createDataFrame(
        [("u5", "beta text"), ("u6", "delta text")], ["url", "text"]
    ).coalesce(1).write.mode("append").parquet(in_dir)
    stream2 = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(in_dir)
    stats2 = dedup_gate_stream(stream2, idx, str(tmp_path / "ckpt"), out)
    assert stats2 == {"batches": 1, "in_rows": 2, "gated": 1, "out_rows": 1}
    assert spark.read.parquet(out).count() == 4


def test_host_rate_window(spark, pages_dir, tmp_path):
    stream = read_pages_stream(
        spark, str(pages_dir / "in"),
        schema=spark.read.parquet(str(pages_dir / "in")).schema,
    )
    run_to_memory(host_rate(stream), str(tmp_path / "rckpt"), "rates")
    got = {
        r["host"]: r["n_pages"]
        for r in spark.sql("SELECT * FROM rates")
        .groupBy("host").agg(F.sum("n_pages").alias("n_pages")).collect()
    }
    # h0 holds all even ids -> half the corpus (the skew fixture)
    assert got["h0.example"] == 30


class TestTWSProductionPath:
    """The transformWithStateInPandas + RocksDB MapState engine — the
    production path for a continuous frontier. This sandbox ships a broken
    ``google.protobuf`` (the TWS state-server wire format), so the e2e test
    is skipif-gated and lights up the moment the environment permits
    (VERDICT r2 next-7); the bloom negative-cache arithmetic is tested
    unconditionally."""

    def test_tws_matches_batch_dedupe(self, spark, pages_dir, tmp_path):
        from spider_spark.streaming.ingest import _tws_available

        if not _tws_available():
            pytest.skip(
                "google.protobuf broken in this image: the TWS state "
                "server cannot start (ingest.py:_tws_available)"
            )
        stream = read_pages_stream(
            spark, str(pages_dir / "in"), schema=spark.read.parquet(
                str(pages_dir / "in")
            ).schema, max_files_per_trigger=1,
        )
        deduped = dedupe_links_stream(
            extract_links_stream(stream), n_shards=4, impl="tws"
        )
        out = str(tmp_path / "tws_out")
        run_to_completion(deduped, str(tmp_path / "tws_ckpt"), out)
        got = spark.read.parquet(out)
        assert got.count() == got.select("link").distinct().count()
        batch_links = {
            r["l"]
            for r in extract_links_stream(
                spark.read.parquet(str(pages_dir / "in"))
            ).select(F.col("link").alias("l")).distinct().collect()
        }
        assert {r["link"] for r in got.collect()} == batch_links

    def test_bloom_negative_cache_arithmetic(self):
        """Pure-python check of the batched-membership kernel: inserted
        links always probe positive afterwards (no false negatives), and
        fresh links mostly probe negative (the round-trip saver)."""
        import numpy as np

        from spider_spark.streaming.ingest import (
            _SeenShardProcessor,
            _bloom_positions,
        )

        n_bits = _SeenShardProcessor.BLOOM_BITS
        k = _SeenShardProcessor.N_HASHES
        bits = np.zeros(n_bits // 8, dtype=np.uint8)
        inserted = [f"https://h{i}.example/d/{i}" for i in range(5000)]
        pos = _bloom_positions(inserted, n_bits, k)
        for i in range(len(inserted)):
            np.bitwise_or.at(bits, pos[i] >> 3, (1 << (pos[i] & 7)).astype(np.uint8))
        # no false negatives: every inserted link probes maybe=True
        maybe = ((bits[pos >> 3] >> (pos & 7)) & 1).all(axis=1)
        assert maybe.all()
        # fresh links: the vast majority probe definite-miss (no round-trip)
        fresh = [f"https://fresh{i}.example/x/{i}" for i in range(5000)]
        fpos = _bloom_positions(fresh, n_bits, k)
        fmaybe = ((bits[fpos >> 3] >> (fpos & 7)) & 1).all(axis=1)
        assert fmaybe.mean() < 0.05
        # deterministic positions (state-compatible across restarts)
        assert (_bloom_positions(inserted, n_bits, k) == pos).all()


def test_feed_watch_stream(spark, tmp_path):
    """Streaming feed watcher: incremental discovery across micro-batches
    with sink-anti-join emission dedup and checkpoint-resumed file
    source (a republished feed re-emits nothing; a new feed's URLs land
    exactly once)."""
    from spider_spark.streaming.feeds import (
        feed_watch_stream,
        read_feeds_stream,
    )

    T0 = 1704104430
    rss = (
        '<rss version="2.0"><channel>'
        "<item><link>https://a.example/p1</link>"
        "<pubDate>Mon, 01 Jan 2024 10:20:30 GMT</pubDate></item>"
        "<item><link>https://a.example/p2</link></item>"
        "</channel></rss>"
    )
    atom = (
        '<feed xmlns="http://www.w3.org/2005/Atom">'
        '<entry><link href="https://b.example/e1"/>'
        "<updated>2024-01-02T00:00:00Z</updated></entry></feed>"
    )
    feed_dir = str(tmp_path / "feeds")
    out = str(tmp_path / "due")
    ckpt = str(tmp_path / "ckpt")
    fetched = spark.createDataFrame(
        # p1 fetched before its pubDate -> changed; p2/e1 never -> new
        [("https://a.example/p1", T0 - 10)],
        "url string, fetch_epoch long",
    )

    def drop(name, rows):
        spark.createDataFrame(rows, "url string, xml string").coalesce(
            1).write.mode("append").parquet(feed_dir)

    drop("b1", [("https://a.example/feed", rss)])
    s1 = feed_watch_stream(
        read_feeds_stream(spark, feed_dir), fetched, ckpt, out,
        now_epoch=T0 + 100)
    assert s1 == {"batches": 1, "in_feeds": 1, "planned": 2, "emitted": 2}

    # second drop: the SAME rss republished + a new atom feed
    drop("b2", [("https://a.example/feed", rss),
                ("https://b.example/feed", atom)])
    s2 = feed_watch_stream(
        read_feeds_stream(spark, feed_dir), fetched, ckpt, out,
        now_epoch=T0 + 100)
    assert s2["emitted"] == 1  # only e1 is new; p1/p2 gated by the sink

    got = {r["loc"]: r["reason"]
           for r in spark.read.parquet(out).collect()}
    assert got == {
        "https://a.example/p1": "changed",
        "https://a.example/p2": "new",
        "https://b.example/e1": "new",
    }
    # no duplicate emissions across the two runs
    assert spark.read.parquet(out).count() == 3


def test_kmv_stream_equals_batch_sketch(spark, tmp_path):
    """The maintained streaming sketch is EXACTLY the batch sketch of all
    data ever streamed (the KMV merge property, exercised through the
    foreachBatch + TableIO loop), including across a checkpoint restart
    and a replayed overlap."""
    from spider_spark.operators.sketches import kmv_estimate, kmv_sketch
    from spider_spark.sources.tableio import ParquetManifestIO
    from spider_spark.streaming.ingest import kmv_stream

    in_dir = str(tmp_path / "ev_in")
    rows1 = [(f"g{i % 3}", i) for i in range(300)]
    spark.createDataFrame(rows1, "grp string, k long").coalesce(2).write.mode(
        "overwrite").parquet(in_dir)
    schema = spark.read.parquet(in_dir).schema
    io = ParquetManifestIO(spark, str(tmp_path / "store"))
    ckpt = str(tmp_path / "kmv_ckpt")

    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1).parquet(in_dir)
    stats = kmv_stream(stream, io, "grp", "k", ckpt, k=16)
    assert stats["batches"] >= 2 and stats["in_rows"] == 300

    # second wave (overlapping keys 200..299 — replay-idempotent)
    spark.createDataFrame(
        [(f"g{i % 3}", i) for i in range(200, 500)],
        "grp string, k long").coalesce(1).write.mode("append").parquet(in_dir)
    stream2 = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1).parquet(in_dir)
    kmv_stream(stream2, io, "grp", "k", ckpt, k=16)

    all_rows = spark.createDataFrame(
        [(f"g{i % 3}", i) for i in range(500)], "grp string, k long")
    want = sorted(map(tuple, kmv_sketch(all_rows, "grp", "k", 16).collect()))
    got = sorted(map(tuple, io.read("kmv_sketch").select("grp", "_h").collect()))
    assert got == want
    est = {r["grp"]: r["est_distinct"] for r in
           kmv_estimate(io.read("kmv_sketch"), "grp", 16).collect()}
    # ~167 distinct per group; k=16 is high-variance (std err ~27%, and
    # one small 16th-hash draw skews hard) — this is a sanity band, the
    # exact-equality assert above is the real check
    for g in ("g0", "g1", "g2"):
        assert 40 < est[g] < 700, est


def test_percolate_stream_matches_batch(spark, tmp_path):
    """Streaming alerts ≡ batch stored_query_match over the same docs,
    including across a checkpoint-resumed second drop."""
    from spider_spark.operators.percolate import stored_query_match
    from spider_spark.streaming.ingest import percolate_stream

    in_dir = str(tmp_path / "pc_in")
    d1 = [(0, "alpha beta news"), (1, "gamma only"), (2, "alpha alone")]
    d2 = [(3, "beta alpha again"), (4, "nothing here")]
    spark.createDataFrame(d1, "doc_id long, text string").coalesce(1) \
        .write.mode("append").parquet(in_dir)
    schema = spark.read.parquet(in_dir).schema
    rules = spark.createDataFrame(
        [("r_ab", ["alpha", "beta"]), ("r_g", ["gamma"])],
        "query_id string, terms array<string>")
    out, ckpt = str(tmp_path / "pc_out"), str(tmp_path / "pc_ckpt")

    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1).parquet(in_dir)
    s1 = percolate_stream(stream, rules, ckpt, out)
    assert s1["alerts"] == 2  # doc0→r_ab, doc1→r_g

    spark.createDataFrame(d2, "doc_id long, text string").coalesce(1) \
        .write.mode("append").parquet(in_dir)
    stream2 = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1).parquet(in_dir)
    s2 = percolate_stream(stream2, rules, ckpt, out)
    assert s2["in_rows"] == 2  # only the new drop is processed

    got = sorted(map(tuple, spark.read.parquet(out).collect()))
    want = sorted(map(tuple, stored_query_match(
        spark.createDataFrame(d1 + d2, "doc_id long, text string"),
        rules).collect()))
    assert got == want

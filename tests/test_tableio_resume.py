"""TableIO merge/DDL semantics (S3/U1/S9) and durable crawl kill/resume
(E6 analog: per-round atomic commit makes interruption safe anywhere)."""

import glob
import os
import pathlib
import subprocess
import sys
import textwrap

import pytest
from pyspark.sql import functions as F

from spider_spark.errors import TableAlreadyExistsError, TableNotFoundError
from spider_spark.plans.crawl import CrawlConfig, CrawlEngine
from spider_spark.sources.pages import synthetic_pages
from spider_spark.sources.tableio import ParquetManifestIO


@pytest.fixture()
def io(spark, tmp_path):
    return ParquetManifestIO(spark, str(tmp_path / "tables"))


def rows_df(spark, rows):
    return spark.createDataFrame(
        rows, "url string, title string, parent string, content_ref string"
    )


class TestMergeUpsert:
    def test_insert_then_update_overwrite(self, spark, io):
        io.merge_upsert("t", rows_df(spark, [("u1", "A", "p", "f1")]))
        io.merge_upsert(
            "t", rows_df(spark, [("u1", "B", "p", "f2"), ("u2", "C", "p", "f3")])
        )
        got = {r["url"]: r for r in io.read("t").collect()}
        assert got["u1"]["title"] == "B"
        assert got["u1"]["content_ref"] == "f2"  # overwrite replaces blob ref
        assert got["u2"]["title"] == "C"
        assert io.count("t") == 2

    def test_no_overwrite_keeps_content_ref(self, spark, io):
        """U1 (postgres_database.py:162-182): title/parent always update on
        conflict; content pointer kept when overwrite=False."""
        io.merge_upsert("t", rows_df(spark, [("u1", "A", "p", "f1")]))
        io.merge_upsert(
            "t", rows_df(spark, [("u1", "B", "p2", "f2")]), overwrite=False
        )
        got = io.read("t").collect()[0]
        assert got["title"] == "B"
        assert got["parent"] == "p2"
        assert got["content_ref"] == "f1"

    def test_ddl_taxonomy(self, spark, io):
        df = rows_df(spark, [("u1", "A", "p", "f1")])
        io.create("t", df)
        io.create("t", df, check_first=True)  # IF NOT EXISTS: no-op
        with pytest.raises(TableAlreadyExistsError):
            io.create("t", df, check_first=False)
        io.drop("t")
        with pytest.raises(TableNotFoundError):
            io.read("t")
        io.drop("t", check_first=True)  # idempotent
        with pytest.raises(TableNotFoundError):
            io.drop("t", check_first=False)

    def test_append_is_delta_not_rewrite(self, spark, io):
        """VERDICT r1 wrong-2 'done' criterion: each append writes only the
        new rows (one fresh data dir per append, O(delta)); the committed
        version unions the old dir list + the delta dir."""
        import os

        io.create("t", rows_df(spark, [("u0", "T0", "p", "f0")]))
        for i in range(1, 5):
            io.append("t", rows_df(spark, [(f"u{i}", f"T{i}", "p", f"f{i}")]))
        assert io.read("t").count() == 5
        dirs = io._dirs_of("t")
        assert len(dirs) == 5  # create + 4 appends, never a rewrite
        # the newest dir holds exactly the last delta
        last = spark.read.parquet(os.path.join(io._tdir("t"), dirs[-1]))
        assert last.count() == 1 and last.collect()[0]["url"] == "u4"
        # snapshot isolation across delta versions: v2 = first two rows
        assert io.read("t", version=2).count() == 2

    def test_commit_records_file_level_lineage(self, spark, io):
        """North-rule per-partition lineage: every commit's manifest entry
        lists the written data files with byte sizes (Iceberg
        manifest-entry analog)."""
        io.create("t", rows_df(spark, [("u0", "T0", "p", "f0")]))
        io.append("t", rows_df(spark, [("u1", "T1", "p", "f1")]))
        for entry in io.history("t"):
            files = entry["files"]
            assert files and all(
                f["file"].startswith("part-") and f["bytes"] > 0 for f in files
            )

    def test_vacuum_keeps_live_dirs_only(self, spark, io):
        """expire_snapshots analog: old overwrite snapshots' dirs are
        deleted; dirs still referenced by the kept delta-version chain
        survive (an append version references ALL its ancestors' dirs)."""
        io.create("t", rows_df(spark, [("u0", "T0", "p", "f0")]))
        io.commit_overwrite("t", rows_df(spark, [("x", "X", "p", "f")]))
        io.commit_overwrite("t", rows_df(spark, [("y", "Y", "p", "f")]))
        for i in range(3):
            io.append("t", rows_df(spark, [(f"u{i}", f"T{i}", "p", f"f{i}")]))
        n_before = io.read("t").count()
        removed = io.vacuum("t", keep_last=4)  # keeps v3 + the 3 appends
        assert removed == 2  # the create dir and the first overwrite dir
        assert io.read("t").count() == n_before  # current chain intact
        assert io.read("t", version=3).count() == 1  # kept snapshot readable

    def test_append_then_restore_delta_version(self, spark, io):
        io.create("t", rows_df(spark, [("u0", "T0", "p", "f0")]))
        io.append("t", rows_df(spark, [("u1", "T1", "p", "f1")]))
        v2 = io.current_version("t")
        io.append("t", rows_df(spark, [("u2", "T2", "p", "f2")]))
        assert io.read("t").count() == 3
        io.restore("t", v2)
        assert {r["url"] for r in io.read("t").collect()} == {"u0", "u1"}

    def test_merge_is_bucket_pruned(self, spark, io):
        """VERDICT r2 next-4 'done' criterion: a merge rewrites only the
        bucket directories whose key range intersects the batch; untouched
        bucket dirs are REFERENCED (byte-identical paths) in the new
        version, never rewritten."""
        import os

        many = rows_df(
            spark, [(f"u{i}", f"T{i}", "p", f"f{i}") for i in range(200)]
        )
        io.merge_upsert("t", many)
        v1_dirs = set(io._dirs_of("t"))
        assert all("_bucket=" in d for d in v1_dirs)
        # capture file-level state of every bucket dir before the 2nd merge
        def files_of(dirs):
            out = {}
            for d in dirs:
                p = os.path.join(io._tdir("t"), d)
                out[d] = {
                    (f, os.path.getsize(os.path.join(p, f)),
                     os.path.getmtime(os.path.join(p, f)))
                    for f in os.listdir(p) if f.startswith("part-")
                }
            return out
        before = files_of(v1_dirs)
        io.merge_upsert("t", rows_df(spark, [("u0", "NEW", "p", "f0b")]))
        v2_dirs = set(io._dirs_of("t"))
        reused = v1_dirs & v2_dirs
        # exactly one bucket was touched: all other 31-ish dirs are reused
        assert len(v1_dirs - reused) == 1
        assert len(v2_dirs - v1_dirs) == 1
        after = files_of(reused)
        assert all(before[d] == after[d] for d in reused)  # byte-identical
        got = {r["url"]: r["title"] for r in io.read("t").collect()}
        assert got["u0"] == "NEW" and got["u199"] == "T199" and len(got) == 200

    def test_merge_prune_respects_no_overwrite(self, spark, io):
        io.merge_upsert("t", rows_df(
            spark, [(f"u{i}", f"T{i}", "p", f"f{i}") for i in range(50)]
        ))
        io.merge_upsert(
            "t", rows_df(spark, [("u3", "B", "p2", "f3b"), ("new", "N", "p", "fn")]),
            overwrite=False,
        )
        got = {r["url"]: r for r in io.read("t").collect()}
        assert got["u3"]["title"] == "B" and got["u3"]["content_ref"] == "f3"
        assert got["new"]["content_ref"] == "fn"
        assert len(got) == 51

    def test_versions_stay_unique_after_restore(self, spark, io):
        """ADVICE r2: a commit after restore() must take a FRESH version
        number, not reuse the restored pointer's successor."""
        io.create("t", rows_df(spark, [("u0", "A", "p", "f0")]))
        io.append("t", rows_df(spark, [("u1", "B", "p", "f1")]))
        io.restore("t", 1)
        io.append("t", rows_df(spark, [("u2", "C", "p", "f2")]))
        versions = [e["version"] for e in io.history("t") if e["mode"] != "restore"]
        assert len(versions) == len(set(versions))
        # the post-restore append chains off v1, not v2
        assert {r["url"] for r in io.read("t").collect()} == {"u0", "u2"}
        # rolling back again resolves the NEWEST entry for the version
        io.restore("t", 1)
        assert {r["url"] for r in io.read("t").collect()} == {"u0"}

    def test_vacuum_never_deletes_current_snapshot(self, spark, io):
        """ADVICE r2: the current pointer's dirs are live even when its
        entry fell out of the kept tail (restore to an old version), and
        keep_last < 1 is rejected."""
        io.create("t", rows_df(spark, [("u0", "A", "p", "f0")]))
        for i in range(1, 6):
            io.commit_overwrite("t", rows_df(spark, [(f"u{i}", "X", "p", "f")]))
        io.restore("t", 1)  # current = the oldest version
        with pytest.raises(ValueError):
            io.vacuum("t", keep_last=0)
        io.vacuum("t", keep_last=1)
        assert {r["url"] for r in io.read("t").collect()} == {"u0"}

    def test_snapshot_restore(self, spark, io):
        io.create("t", rows_df(spark, [("u1", "A", "p", "f1")]))
        v1 = io.current_version("t")
        io.merge_upsert("t", rows_df(spark, [("u1", "B", "p", "f2")]))
        assert io.read("t").collect()[0]["title"] == "B"
        io.restore("t", v1)
        assert io.read("t").collect()[0]["title"] == "A"


class TestIcebergMergeSQL:
    """String-level tests of the Iceberg MERGE generation (VERDICT r1
    next-10): the backend itself is unexercisable offline (no
    iceberg-spark-runtime jar), but the U1 upsert semantics live in the
    generated SQL, which must be exact."""

    COLS = ["url", "title", "parent", "content_ref"]

    def test_overwrite_updates_all_non_key_columns(self):
        from spider_spark.sources.tableio import IcebergTableIO

        sql = IcebergTableIO.merge_sql("cat.crawl.results", self.COLS)
        assert sql == (
            "MERGE INTO cat.crawl.results t "
            "USING _merge_batch s ON t.url = s.url "
            "WHEN MATCHED THEN UPDATE SET "
            "t.title = s.title, t.parent = s.parent, "
            "t.content_ref = s.content_ref "
            "WHEN NOT MATCHED THEN INSERT *"
        )

    def test_no_overwrite_keeps_content_ref(self):
        # --no-overwrite (cli.py:84-88): the blob pointer keeps its stored
        # value on conflict (postgres_database.py:162-182)
        from spider_spark.sources.tableio import IcebergTableIO

        sql = IcebergTableIO.merge_sql(
            "cat.crawl.results", self.COLS, overwrite=False
        )
        assert "t.content_ref" not in sql
        assert "t.title = s.title" in sql and "t.parent = s.parent" in sql
        assert sql.endswith("WHEN NOT MATCHED THEN INSERT *")

    def test_custom_key_and_keep_set(self):
        from spider_spark.sources.tableio import IcebergTableIO

        sql = IcebergTableIO.merge_sql(
            "c.ns.t", ["k", "a", "b"], key="k", overwrite=False,
            keep_on_match=("b",),
        )
        assert "ON t.k = s.k" in sql
        assert "t.a = s.a" in sql and "t.b" not in sql


def _iceberg_jar():
    """Locate an iceberg-spark-runtime jar if one is installed (env
    override, Spark's jars dir, or the ivy cache). None in this sandbox —
    the e2e test below lights up the moment an environment ships it."""
    cands = []
    env = os.environ.get("SPIDER_ICEBERG_JAR")
    if env:
        cands += glob.glob(env)
    try:
        import pyspark

        cands += glob.glob(
            os.path.join(os.path.dirname(pyspark.__file__), "jars",
                         "iceberg-spark-runtime*.jar")
        )
    except ImportError:
        pass
    spark_home = os.environ.get("SPARK_HOME")
    if spark_home:
        cands += glob.glob(os.path.join(spark_home, "jars",
                                        "iceberg-spark-runtime*.jar"))
    cands += glob.glob(
        os.path.expanduser("~/.ivy2/jars/*iceberg-spark-runtime*.jar")
    )
    return cands[0] if cands else None


@pytest.mark.skipif(
    _iceberg_jar() is None,
    reason="no iceberg-spark-runtime jar in this environment (VERDICT r3 "
    "next-9: gated e2e, green where the runtime exists)",
)
class TestIcebergEndToEnd:
    """The production storage path, end-to-end: create → MERGE upsert
    (both overwrite modes) → snapshot → rollback_to_snapshot → hidden
    bucket-partitioned rewrite + join. Runs in a subprocess because the
    Iceberg catalog + SQL extensions must be set at JVM launch, and the
    suite's shared SparkSession is already up without them."""

    def test_create_merge_snapshot_restore_bucketed_join(self, tmp_path):
        repo = str(pathlib.Path(__file__).resolve().parents[1])
        script = textwrap.dedent(f"""
            import sys
            sys.path.insert(0, {repo!r})
            from pyspark.sql import SparkSession
            spark = (
                SparkSession.builder.master("local[2]")
                .config("spark.jars", {_iceberg_jar()!r})
                .config("spark.sql.extensions",
                        "org.apache.iceberg.spark.extensions"
                        ".IcebergSparkSessionExtensions")
                .config("spark.sql.catalog.ice",
                        "org.apache.iceberg.spark.SparkCatalog")
                .config("spark.sql.catalog.ice.type", "hadoop")
                .config("spark.sql.catalog.ice.warehouse",
                        "file://{tmp_path}/ice_wh")
                .config("spark.sql.shuffle.partitions", "4")
                .config("spark.ui.enabled", "false")
                .getOrCreate()
            )
            from spider_spark.sources.tableio import IcebergTableIO, open_tableio

            io = open_tableio(spark, "{tmp_path}/unused")
            assert isinstance(io, IcebergTableIO), type(io)

            def rows(xs):
                return spark.createDataFrame(
                    xs, "url string, title string, parent string, "
                        "content_ref string")

            io.create("results", rows([("u1", "A", "p", "f1"),
                                       ("u2", "B", "p", "f2")]))
            v1 = io.current_version("results")
            io.merge_upsert("results", rows([("u1", "A2", "p", "f9"),
                                             ("u3", "C", "p", "f3")]))
            got = {{r["url"]: (r["title"], r["content_ref"])
                   for r in io.read("results").collect()}}
            assert got == {{"u1": ("A2", "f9"), "u2": ("B", "f2"),
                           "u3": ("C", "f3")}}, got
            # --no-overwrite: blob pointer keeps its stored value (U1)
            io.merge_upsert("results", rows([("u1", "A3", "p", "fX")]),
                            overwrite=False)
            got = {{r["url"]: (r["title"], r["content_ref"])
                   for r in io.read("results").collect()}}
            assert got["u1"] == ("A3", "f9"), got
            # snapshot rollback restores the pre-merge state
            io.restore("results", v1)
            got = {{r["url"]: r["title"] for r in io.read("results").collect()}}
            assert got == {{"u1": "A", "u2": "B"}}, got
            # hidden bucket partitioning + join on the bucket key
            io.commit_overwrite(
                "results",
                rows([(f"u{{i}}", "T", "p", "f") for i in range(20)]),
                bucket_by="url", buckets=8)
            other = spark.createDataFrame(
                [(f"u{{i}}",) for i in range(0, 20, 2)], "url string")
            assert io.read("results").join(other, "url").count() == 10
            io.drop("results")
            print("ICEBERG_E2E_OK")
        """)
        proc = subprocess.run(
            [sys.executable, "-c", script], capture_output=True, text=True,
            timeout=540,
        )
        assert proc.returncode == 0, proc.stderr[-3000:]
        assert "ICEBERG_E2E_OK" in proc.stdout


class TestVacuumInCrawl:
    def test_store_stays_bounded_and_resume_green(self, spark, tmp_path):
        """VERDICT r2 next-10 'done' criterion: with vacuum_every set, a
        long durable crawl's store stays O(live data) — superseded frontier
        snapshots are expired on cadence — and kill/resume still matches
        the uninterrupted crawl."""
        import os

        pages = synthetic_pages(spark, 300).localCheckpoint(eager=True)
        seed = "https://h0.example/d/0"
        full = CrawlEngine(
            spark, pages, CrawlConfig(depth=6, verify_text=False)
        ).crawl(seed)
        expect = {
            (r["url"], r["title"], r["depth"], r["fetched"])
            for r in full.results.collect()
        }

        io = ParquetManifestIO(spark, str(tmp_path / "crawl"))
        cfg = CrawlConfig(depth=6, verify_text=False, durable=True,
                          vacuum_every=2, vacuum_keep_last=2, max_rounds=3)
        CrawlEngine(spark, pages, cfg, io=io).crawl(seed)
        resumed = CrawlEngine(
            spark, pages,
            CrawlConfig(depth=6, verify_text=False, durable=True,
                        vacuum_every=2, vacuum_keep_last=2),
            io=io,
        ).resume()
        got = {
            (r["url"], r["title"], r["depth"], r["fetched"])
            for r in resumed.results.collect()
        }
        assert got == expect
        # the frontier is overwritten per round: without vacuum its dir
        # count grows with rounds; with it, the on-disk count is bounded
        # by keep_last + the rounds since the last vacuum tick
        fdirs = [
            d for d in os.listdir(io._tdir("frontier")) if d.startswith("v_")
        ]
        assert len(fdirs) <= 2 + 2


class TestKillResume:
    def test_resume_matches_uninterrupted(self, spark, tmp_path):
        pages = synthetic_pages(spark, 300).localCheckpoint(eager=True)
        seed = "https://h0.example/d/0"
        cfg = CrawlConfig(depth=4, verify_text=False)

        full = CrawlEngine(spark, pages, cfg).crawl(seed)
        expect_results = {
            (r["url"], r["title"], r["depth"], r["fetched"])
            for r in full.results.collect()
        }
        expect_seen = {r["canon_url"] for r in full.seen.collect()}

        # "killed" run: durable, stopped after 2 rounds
        io = ParquetManifestIO(spark, str(tmp_path / "crawl"))
        killed_cfg = CrawlConfig(depth=4, verify_text=False, durable=True, max_rounds=2)
        CrawlEngine(spark, pages, killed_cfg, io=io).crawl(seed)
        assert io.latest_meta("metrics")["round"] == 1  # only 2 rounds committed

        resume_cfg = CrawlConfig(depth=4, verify_text=False, durable=True)
        resumed = CrawlEngine(spark, pages, resume_cfg, io=io).resume()
        got_results = {
            (r["url"], r["title"], r["depth"], r["fetched"])
            for r in resumed.results.collect()
        }
        got_seen = {r["canon_url"] for r in resumed.seen.collect()}
        assert got_results == expect_results
        assert got_seen == expect_seen


class TestWaveEpochRollback:
    """ADVICE r3 (medium): a recrawl wave restarts the round counter at -1
    in a store whose previous crawl committed higher rounds, so a wave
    killed before its first metrics commit leaves a half-applied seen
    overwrite that a round-only rollback cannot see. The monotone
    (epoch, round) marker must identify and undo it, and the reissued
    wave must produce no duplicate admission ranks."""

    def test_killed_wave_is_rolled_back_and_reissues_cleanly(self, spark, tmp_path):
        pages = synthetic_pages(spark, 200).localCheckpoint(eager=True)
        io = ParquetManifestIO(spark, str(tmp_path / "store"))
        cfg = CrawlConfig(depth=3, verify_text=False, durable=True)
        CrawlEngine(spark, pages, cfg, io=io).crawl("https://h0.example/d/0")
        meta0 = io.latest_meta("metrics")
        assert meta0.get("done"), "fixture crawl must complete"
        pre_seen = {
            (r["canon_url"], r["admission_rank"])
            for r in io.read("seen").collect()
        }

        # wave: expire 5 URLs, refetch them — killed before ANY metrics commit
        seen_df = io.read("seen")
        due = (
            seen_df.orderBy("admission_rank").limit(5)
            .select("canon_url").localCheckpoint(eager=True)
        )
        trimmed = seen_df.join(due, "canon_url", "left_anti").localCheckpoint(
            eager=True
        )
        wave = CrawlEngine(spark, pages, cfg, io=io)

        def boom(*a, **k):
            raise RuntimeError("killed before metrics commit")

        wave._checkpoint = boom
        with pytest.raises(RuntimeError):
            wave.crawl(
                due.select(F.col("canon_url").alias("url")),
                seeds_canonical=True, seeds_unique=True,
                prior_seen=trimmed, start_rank=meta0["next_rank"],
            )
        # the wave's round -1 seen overwrite is standing (trimmed + reseeded)
        dangling = {
            (r["canon_url"], r["admission_rank"])
            for r in io.read("seen").collect()
        }
        assert dangling != pre_seen

        # sanitize: any new engine rolls back to the last completed marker
        marker = CrawlEngine(spark, pages, cfg, io=io).rollback_dangling()
        assert marker["next_rank"] == meta0["next_rank"]
        restored = {
            (r["canon_url"], r["admission_rank"])
            for r in io.read("seen").collect()
        }
        assert restored == pre_seen

        # resume() on the sanitized store sees done=true and changes nothing
        resumed = CrawlEngine(spark, pages, cfg, io=io).resume()
        assert resumed.metrics[-1].round == meta0["round"]

        # reissued wave completes; admission ranks stay globally unique
        seen_df = io.read("seen")
        trimmed = seen_df.join(due, "canon_url", "left_anti").localCheckpoint(
            eager=True
        )
        redo = CrawlEngine(spark, pages, cfg, io=io)
        redo.crawl(
            due.select(F.col("canon_url").alias("url")),
            seeds_canonical=True, seeds_unique=True,
            prior_seen=trimmed, start_rank=meta0["next_rank"],
        )
        ranks = [r["admission_rank"] for r in io.read("seen").collect()]
        assert len(ranks) == len(set(ranks)), "duplicate admission ranks"
        m = io.latest_meta("metrics")
        assert (m.get("epoch") or 0) > (meta0.get("epoch") or 0)

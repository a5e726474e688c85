"""Sharded cuckoo filter: deletable seen-set for continuous crawls."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from spider_spark.operators.cuckoo import (
    CuckooTable,
    ShardedCuckoo,
    add_into,
    build_cuckoo,
    delete_from,
    filter_unseen_cuckoo,
)


def _hashes(n, seed=7):
    return np.random.default_rng(seed).integers(1, 1 << 63, size=n, dtype=np.int64).astype(np.uint64)


class TestCuckooTable:
    def test_no_false_negatives_at_design_load(self):
        keys = _hashes(20_000)
        t = CuckooTable(CuckooTable.sized_for(len(keys)))
        assert t.add_many(keys) == 0, "must place everything at ≤95% load"
        assert t.contains_many(keys).all()

    def test_false_positive_rate_small(self):
        keys = _hashes(20_000)
        t = CuckooTable(CuckooTable.sized_for(len(keys)))
        t.add_many(keys)
        others = _hashes(50_000, seed=99)
        fpp = t.contains_many(others).mean()
        assert fpp < 0.005, f"16-bit fingerprints should give fpp ≈ 1e-4, got {fpp}"

    def test_delete_reopens_membership(self):
        keys = _hashes(5_000)
        t = CuckooTable(CuckooTable.sized_for(len(keys)))
        t.add_many(keys)
        victims = keys[:1_000]
        assert t.delete_many(victims) == 1_000
        assert not t.contains_many(victims).any()
        assert t.contains_many(keys[1_000:]).all(), "survivors untouched"

    def test_alt_bucket_is_involution(self):
        t = CuckooTable(1 << 10)
        h = _hashes(1_000)
        fp = t._fp(h)
        i1 = t._i1(h)
        i2 = t._alt(i1, fp)
        assert (t._alt(i2, fp) == i1).all()

    def test_overflow_reported(self):
        t = CuckooTable(4)  # 16 slots
        assert t.add_many(_hashes(200)) > 0


class TestShardedCuckoo:
    @pytest.fixture(scope="class")
    def seen(self, spark):
        return spark.createDataFrame(
            [(f"https://h{i % 19}.example/p/{i}",) for i in range(2_000)], "url string"
        ).cache()

    def test_gate_is_exact(self, spark, seen):
        ck = build_cuckoo(seen, "url", n_shards=4)
        cands = spark.createDataFrame(
            [(f"https://h{i % 19}.example/p/{i}",) for i in range(1_500, 3_000)],
            "url string",
        )
        got = {r["url"] for r in filter_unseen_cuckoo(cands, "url", seen, ck).collect()}
        want = {f"https://h{i % 19}.example/p/{i}" for i in range(2_000, 3_000)}
        assert got == want, "exact anti-join confirmation must make the gate exact"

    def test_delete_readmits_exactly(self, spark, seen):
        ck = build_cuckoo(seen, "url", n_shards=4)
        due = seen.filter(F.col("url").rlike("/p/1[0-4][0-9][0-9]$"))  # 500 urls
        n_due = due.count()
        delete_from(ck, due, "url")
        remaining_seen = seen.join(due, on="url", how="left_anti")
        out = filter_unseen_cuckoo(seen, "url", remaining_seen, ck)
        got = {r["url"] for r in out.collect()}
        want = {r["url"] for r in due.collect()}
        assert got == want
        assert len(got) == n_due

    def test_incremental_add_into_existing(self, spark, seen):
        first = seen.filter(F.col("url").rlike("/p/[0-9]{1,3}$"))  # 0..999
        rest = seen.join(first, on="url", how="left_anti")
        ck = ShardedCuckoo(expected=2_000, n_shards=4)
        add_into(ck, first, "url")
        add_into(ck, rest, "url")  # exercises the broadcast-existing path
        assert ck.n_items == 2_000
        gate = filter_unseen_cuckoo(seen, "url", seen, ck)
        assert gate.count() == 0

    def test_broadcast_lifecycle(self, spark, seen):
        ck = build_cuckoo(seen, "url", n_shards=2)
        filter_unseen_cuckoo(seen.limit(10), "url", seen, ck).count()
        assert ck.destroy_broadcasts() == 2
        assert ck.destroy_broadcasts() == 0

    def test_overflow_raises(self, spark, seen):
        ck = ShardedCuckoo(expected=8, n_shards=1)
        with pytest.raises(RuntimeError, match="overflow"):
            add_into(ck, seen, "url")


class TestSpillMode:
    """VERDICT r3 #3 (cuckoo side): spilled shards are built, mutated and
    probed executor-side through versioned files; the driver holds paths."""

    def test_build_delete_probe_parity(self, spark, tmp_path):
        seen = spark.createDataFrame(
            [(f"https://h{i % 19}.example/p/{i}",) for i in range(2_000)],
            "url string",
        ).cache()
        mem = build_cuckoo(seen, "url", n_shards=4)
        spl = build_cuckoo(seen, "url", n_shards=4, spill_dir=str(tmp_path))
        assert spl.spilled and not hasattr(spl, "shards")
        assert spl.n_items == mem.n_items == 2_000

        due = seen.filter(F.col("url").rlike("/p/1[0-4][0-9][0-9]$"))
        delete_from(mem, due, "url")
        delete_from(spl, due, "url")
        remaining = seen.join(due, on="url", how="left_anti")
        got_m = {r["url"] for r in
                 filter_unseen_cuckoo(seen, "url", remaining, mem).collect()}
        got_s = {r["url"] for r in
                 filter_unseen_cuckoo(seen, "url", remaining, spl).collect()}
        want = {r["url"] for r in due.collect()}
        assert got_s == got_m == want
        # delete bumped the version; gc drops the superseded files
        assert spl.version == 2
        assert spl.gc_spill() > 0
        got_after = {r["url"] for r in
                     filter_unseen_cuckoo(seen, "url", remaining, spl).collect()}
        assert got_after == want

    def test_driver_bytes_bound_fires_loudly(self, spark, tmp_path):
        with pytest.raises(ValueError, match="spill_dir"):
            ShardedCuckoo(expected=1_000_000, max_driver_bytes=1024)
        ShardedCuckoo(expected=1_000_000, spill_dir=str(tmp_path),
                      max_driver_bytes=1024)

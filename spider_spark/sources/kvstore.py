"""Key-value store analog of the reference's Redis DAO (S5).

The reference stores one hash per URL — ``{title, html(=content ref),
parent}`` — and its DAO has three behavioral quirks this analog
replicates exactly (previously a documented deviation; closed here):

* **null-title rows are silently never saved** (redis_database.py:95-96:
  ``if name is None: return``) — unlike the SQL DAOs, a fetched page
  whose ``<title>`` is missing leaves no KV entry at all;
* **``get`` is a substring SCAN over the keys** (redis_database.py:
  108-134: ``scan(match=f'*{parent}*')``), not parent equality — the
  ``parent`` argument is just a pattern fragment; missing titles read
  back as ``''`` (``value.decode() if value else ''``);
* **``overwrite=False`` keeps the previously stored content ref**
  (redis_database.py:150-160: ``update`` returns the old path without
  rewriting the file) while title/parent are still refreshed
  (``hmset_dict`` always runs) — exactly the engine's
  ``merge_upsert(keep_on_match=('content_ref',))`` semantics.

Deliberate deviation (documented): the reference's ``limit`` check
(``if len(keys) == limit: break``) can overshoot when a scan batch jumps
past the limit — nondeterministic in real Redis; this analog applies a
deterministic ``LIMIT`` instead.

Storage rides :class:`~spider_spark.sources.tableio.TableIO` (url-keyed
upsert table), so the KV surface shares the crawl's atomic-snapshot /
bucket-pruned-merge machinery instead of inventing its own files; at
scale the table is the same 32-bucket layout every other sink uses.
``drop_all`` maps to FLUSHDB (redis_database.py:163-168); ``create`` is
a no-op like the reference's ``create_table``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spider_spark.sources.tableio import TableIO

_COLS = ("url", "title", "parent", "content_ref")


class KeyValueStore:
    def __init__(self, io: TableIO, name: str = "kv"):
        self.io = io
        self.name = name

    def save(self, rows: DataFrame, *, overwrite: bool = True) -> None:
        """Upsert ``(url, title, parent, content_ref)`` rows. Null-title
        rows are dropped BEFORE the merge — the reference never writes
        them (redis_database.py:95-96). ``overwrite=False`` preserves an
        existing row's ``content_ref`` (the stored-file path) while
        refreshing title/parent."""
        batch = rows.select(*_COLS).filter(F.col("title").isNotNull())
        self.io.merge_upsert(self.name, batch, key="url",
                             overwrite=overwrite,
                             keep_on_match=("content_ref",))

    def get(self, pattern: str, limit: int = 10) -> DataFrame:
        """Substring scan: every stored url containing ``pattern``
        (`*pattern*`), as ``(url, title)`` with ``''`` for a missing
        title — the reference DAO's read contract."""
        if not self.io.exists(self.name):
            return _empty(self._spark())
        return (
            self.io.read(self.name)
            .filter(F.col("url").contains(pattern))
            .select("url", F.coalesce(F.col("title"), F.lit("")).alias("title"))
            .orderBy("url")
            .limit(limit)
        )

    def count_all(self) -> int:
        return self.io.count(self.name) if self.io.exists(self.name) else 0

    def drop_all(self) -> None:
        """FLUSHDB analog."""
        self.io.drop(self.name, check_first=True)

    def _spark(self) -> SparkSession:
        return getattr(self.io, "spark")


def _empty(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([], "url string, title string")

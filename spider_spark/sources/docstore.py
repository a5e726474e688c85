"""Document-store sink/get — the reference's Mongo DAO re-expressed
(SURVEY S6/P3), closing the last two operator-inventory rows.

The reference implementation (mongodb_database.py) is broken at runtime:
``save`` calls ``insert_one(data)`` on an undefined name
(mongodb_database.py:56-64), ``get`` passes a projection that mixes
inclusion and exclusion (``{"_id": 0, "url": 1, "title": 1, "parent": 0,
"html": 0}`` — rejected by Mongo, mongodb_database.py:67-84), and
``count_all`` uses the long-removed ``find().count()``
(mongodb_database.py:86-90). What CAN be matched is the intended,
observable surface:

* **save** — one document per crawled page (``url, title, parent,
  content_ref``), append-only ``insert_one`` semantics (no upsert: unlike
  the SQL DAOs, the Mongo sink has no conflict handling);
* **get** — the reference queries ``{'url': parent}`` — **equality on
  url, not parent** (mongodb_database.py:73). That quirk is preserved:
  ``get(parent)`` returns the document whose *url* equals the argument,
  projected to ``(url, title)``, limited client-side
  (mongodb_database.py:79-83's early break);
* **count_all** — document count;
* **update/drop_table/create_table** are literal ``TODO pass`` in the
  reference — no observable behavior to match; here drop/create are
  implemented honestly (documented deviation: a working store needs
  them), update stays unsupported like the reference.

Storage is JSON-lines (the document-model analog that needs no server):
each ``save`` appends a new directory of JSON part files; readers glob
all batches. At scale this is the same append-only layout a Mongo
collection's insert stream gives you, and Spark's JSON source reads it
in parallel.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spider_spark.errors import TableNotFoundError

DOC_COLUMNS = ["url", "title", "parent", "content_ref"]


class JsonDocStore:
    """Append-only JSON-document store with the Mongo DAO's surface."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    def create(self, check_first: bool = True) -> None:
        """Reference create_table is a TODO (mongodb_database.py:106-111);
        implemented as directory creation (documented deviation)."""
        if os.path.exists(self.root) and not check_first:
            from spider_spark.errors import TableAlreadyExistsError

            raise TableAlreadyExistsError(self.root)
        os.makedirs(self.root, exist_ok=True)

    def exists(self) -> bool:
        return os.path.isdir(self.root) and any(
            e.startswith("batch_") for e in os.listdir(self.root)
        )

    def save(self, docs: DataFrame) -> None:
        """insert_one semantics per row: append-only, no conflict
        handling (the intended mongodb_database.py:56-64 behavior)."""
        os.makedirs(self.root, exist_ok=True)
        out = os.path.join(self.root, f"batch_{uuid.uuid4().hex[:12]}")
        docs.select(*[
            F.col(c) if c in docs.columns else F.lit(None).cast("string").alias(c)
            for c in DOC_COLUMNS
        ]).write.mode("error").json(out)

    def _read(self) -> DataFrame:
        if not self.exists():
            raise TableNotFoundError(self.root)
        return self.spark.read.json(
            os.path.join(self.root, "batch_*"),
            schema="url string, title string, parent string, content_ref string",
        )

    def get(self, parent: str, limit: int = 10) -> DataFrame:
        """P3 with the reference's quirk preserved: the filter is
        ``url == parent`` (mongodb_database.py:73 queries ``{'url':
        parent}``), projected to (url, title) with an early limit —
        so asking for a seed's children actually returns the seed's own
        document, exactly like the reference would."""
        return (
            self._read()
            .filter(F.col("url") == F.lit(parent))
            .select("url", "title")
            .limit(limit)
        )

    def count_all(self) -> int:
        return self._read().count()

    def drop(self, check_first: bool = True) -> None:
        """Reference drop_table is a TODO (mongodb_database.py:100-104);
        implemented as a purge (documented deviation)."""
        if not os.path.isdir(self.root):
            if check_first:
                return
            raise TableNotFoundError(self.root)
        shutil.rmtree(self.root, ignore_errors=True)

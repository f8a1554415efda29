"""Spark 4 Python DataSource for the books catalog (S1/S3/S5 as a native
source, SURVEY.md §2.1).

The reference materializes its book catalog by crawling + JSON files +
CSV consolidation (``crawler/metadata.py``); the idiomatic Spark-4 form
of "a catalog served by an external system" is a custom
``pyspark.sql.datasource.DataSource``: the planner asks it for
partitions, executors read them independently (no driver loop), and —
new in 4.1 — ``pushFilters`` lets the source prune work BEFORE the scan,
the same contract JDBC/GraphQL connectors implement.

The content is a deterministic md5 function of ``book_id`` (this sandbox
has no network), so a catalog query over the source is value-checkable
in DuckDB end-to-end, including the pushdown path: a ``book_id`` range
predicate prunes whole partitions inside ``pushFilters`` (observable in
the unit tests via ``partitions()``), and every emitted field replays in
SQL.  A real deployment swaps ``_book_row`` for an HTTP/DB fetch and
keeps the planning contract unchanged.

Usage note: ``pushFilters`` mutates the reader, and Spark reuses one
reader instance across actions on the SAME loaded DataFrame — so a
filtered action narrows later unfiltered actions on that DataFrame.
Create the relation fresh (``spark.read.format(...).load()``) per query,
as every call site here does.  Requires
``spark.sql.python.filterPushdown.enabled=true`` (runtime-settable).
"""

from __future__ import annotations

import hashlib
from typing import Iterable, Iterator, List

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    InputPartition as _IP,  # noqa: F401  (re-export convenience)
)

_LANGS = ("vi", "en")


def _book_row(book_id: int):
    """Deterministic catalog row — every field mirrored by the DuckDB
    oracle: ``h = md5(CAST(book_id AS VARCHAR))``; lang by first hex
    digit, n_pages from the first two digits, narrator by modulo."""
    h = hashlib.md5(str(book_id).encode()).hexdigest()
    lang = _LANGS[0] if int(h[0], 16) < 8 else _LANGS[1]
    n_pages = 50 + int(h[:2], 16) % 400
    return (
        book_id,
        f"Book {book_id}",
        f"narrator-{book_id % 7}",
        n_pages,
        lang,
    )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class BooksReader(DataSourceReader):
    def __init__(self, options):
        self.n_books = int(options.get("n_books", "1000"))
        self.rows_per_partition = int(
            options.get("rows_per_partition", "100")
        )
        # pushed bounds on book_id — narrowed by pushFilters
        self.lo = 0
        self.hi = self.n_books

    def pushFilters(self, filters: List[Filter]) -> Iterable[Filter]:
        """Handle book_id range predicates natively (partition pruning at
        PLANNING time); everything else is returned for Spark to apply
        post-scan.  Per the contract, returned filters are the input
        objects by reference."""
        for f in filters:
            handled = False
            if isinstance(
                f, (GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual)
            ) and tuple(f.attribute) == ("book_id",):
                v = int(f.value)
                if isinstance(f, GreaterThan):
                    self.lo = max(self.lo, v + 1)
                elif isinstance(f, GreaterThanOrEqual):
                    self.lo = max(self.lo, v)
                elif isinstance(f, LessThan):
                    self.hi = min(self.hi, v)
                else:
                    self.hi = min(self.hi, v + 1)
                handled = True
            if not handled:
                yield f

    def partitions(self):
        """One partition per row range INTERSECTED with the pushed bounds
        — pruned partitions never exist, so no task is scheduled for
        them (the Python-source analogue of parquet partition pruning)."""
        out = []
        step = self.rows_per_partition
        for start in range(0, self.n_books, step):
            end = min(start + step, self.n_books)
            lo, hi = max(start, self.lo), min(end, self.hi)
            if lo < hi:
                out.append(_RangePartition(lo, hi))
        return out

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield _book_row(i)


class BooksDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "books_catalog"

    def schema(self) -> str:
        return (
            "book_id bigint, title string, narrator string, "
            "n_pages int, lang string"
        )

    def reader(self, schema) -> BooksReader:
        return BooksReader(self.options)


def register(spark) -> None:
    # the reader implements pushFilters, which Spark refuses to use unless
    # the (runtime-settable) capability flag is on
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(BooksDataSource)


# --- streaming Python data source (crawl feed) -------------------------------


from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSourceStreamWriter,
    DataSourceWriter,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)


class BooksStreamReader(SimpleDataSourceStreamReader):
    """Streaming face of the catalog — the crawl-feed shape (reference:
    the crawler discovers new book URLs over time): each micro-batch
    serves the next ``batch_size`` ids.  Offsets are plain dicts
    ``{"next": n}`` checkpointed by the engine; ``readBetweenOffsets``
    replays any committed range deterministically (exactly-once on
    restart), which the deterministic ``_book_row`` makes trivial —
    a real crawler would replay from its fetch journal."""

    def __init__(self, options):
        self.batch_size = int(options.get("batch_size", "50"))
        self.max_books = int(options.get("max_books", "200"))

    def initialOffset(self) -> dict:
        return {"next": 0}

    def read(self, start: dict):
        lo = int(start["next"])
        hi = min(lo + self.batch_size, self.max_books)
        return (iter([_book_row(i) for i in range(lo, hi)]), {"next": hi})

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(
            [_book_row(i) for i in range(int(start["next"]), int(end["next"]))]
        )


@dataclass
class _PartFile(WriterCommitMessage):
    path: str = ""
    n_rows: int = 0


class JsonlWriter(DataSourceWriter):
    """Two-phase-commit JSONL sink (K2 through the modern API): each task
    writes a temp file and reports it in its commit message; ``commit``
    atomically renames the complete set into the target directory;
    ``abort`` removes the temp files — so a failed job leaves NO partial
    output visible, the same job-commit contract Hadoop committers give
    parquet."""

    def __init__(self, options):
        self.path = options["path"]

    def write(self, iterator) -> _PartFile:
        import json as _json
        import os as _os
        import tempfile as _tempfile

        from pyspark import TaskContext

        tid = TaskContext.get().partitionId()
        staging = _os.path.join(self.path, "_staging")
        _os.makedirs(staging, exist_ok=True)
        fd, tmp = _tempfile.mkstemp(
            prefix=f"part-{tid:05d}-", suffix=".jsonl.tmp", dir=staging
        )
        n = 0
        with _os.fdopen(fd, "w") as fh:
            for row in iterator:
                fh.write(_json.dumps(row.asDict()) + "\n")
                n += 1
        return _PartFile(path=tmp, n_rows=n)

    def commit(self, messages) -> None:
        import os as _os
        import shutil as _shutil

        for m in messages:
            if m is None or not m.path:
                continue
            final = _os.path.join(
                self.path, _os.path.basename(m.path).removesuffix(".tmp")
            )
            _os.replace(m.path, final)
        _shutil.rmtree(
            _os.path.join(self.path, "_staging"), ignore_errors=True
        )

    def abort(self, messages) -> None:
        import os as _os
        import shutil as _shutil

        _shutil.rmtree(
            _os.path.join(self.path, "_staging"), ignore_errors=True
        )


class BooksStreamDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "books_catalog_stream"

    def schema(self) -> str:
        return (
            "book_id bigint, title string, narrator string, "
            "n_pages int, lang string"
        )

    def simpleStreamReader(self, schema) -> BooksStreamReader:
        return BooksStreamReader(self.options)


class JsonlSinkDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jsonl_commit"

    def writer(self, schema, overwrite: bool) -> JsonlWriter:
        return JsonlWriter(self.options)


def register_all(spark) -> None:
    register(spark)
    spark.dataSource.register(BooksStreamDataSource)
    spark.dataSource.register(JsonlSinkDataSource)

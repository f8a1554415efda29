"""S11/C20 — URL probe source and retry/backoff contract.

The reference's crawler validates audio/text URLs with an async HEAD probe
(``crawler/utils.py:245-301``, ``crawler/metadata.py:303-332``) and wraps
downloads in exponential backoff (``crawler/download.py:62-117``).  This
sandbox has no network, so the probe ships with a DETERMINISTIC fake HTTP
layer (status derived from md5 of the URL — replicable in SQL, so the whole
probe→filter plan is oracle-checkable); swap ``head_fn`` for a real
httpx/requests HEAD in production.  The Spark-side plumbing — Arrow-batched
``mapInPandas``, schema contract, per-partition fan-out — is the real
thing: at 100 TB the probe parallelizes per partition with no driver
involvement, exactly how a crawler fleet would run under Spark.
"""

from __future__ import annotations

import hashlib
import time
from typing import Callable, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

#: statuses the fake layer emits, chosen to exercise the reference's
#: valid/invalid routing: hex digit 0-2 -> 404, 3 -> 500, else 200.
_HEX = "0123456789abcdef"


def fake_head_status(url: str) -> int:
    """Deterministic fake HEAD: status from the first md5 hex digit of the
    URL.  ~19% 404, ~6% 500, ~75% 200 — enough failure mass to make the
    validity-ratio queries non-trivial.  Mirrored in SQL as
    ``strpos('0123456789abcdef', substr(md5(url), 1, 1)) - 1``."""
    d = _HEX.index(hashlib.md5(url.encode()).hexdigest()[0])
    if d < 3:
        return 404
    if d == 3:
        return 500
    return 200


def probe_urls(
    df: DataFrame,
    url_col: str = "url",
    status_col: str = "status",
    head_fn: Callable[[str], int] | None = None,
) -> DataFrame:
    """S11 — per-row URL probe as an Arrow-batched ``mapInPandas``.

    Appends ``status_col`` (int) to the input schema.  ``head_fn`` is the
    network seam: the default is the deterministic fake above; a real
    deployment passes a pooled HTTP HEAD (typically wrapped in
    :func:`with_retries`).  Rows whose URL is NULL are not probed and get
    status NULL — shape-guarding (F10) belongs to the caller's plan.
    """
    head = head_fn or fake_head_status
    out_schema = T.StructType(
        list(df.schema) + [T.StructField(status_col, T.IntegerType())]
    )

    def _probe(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            statuses = pdf[url_col].map(
                lambda u: head(u) if isinstance(u, str) else None
            )
            yield pdf.assign(**{status_col: statuses.astype("Int32")})

    return df.mapInPandas(_probe, out_schema)


def fake_fetch_csv(url: str) -> str:
    """Deterministic fake GET for a remote CSV feed (S5): the body is a
    pure function of the trailing integer in the URL — feed ``r`` serves a
    header line, four well-formed rows ``(r*10+i, item{r*10+i})``, and one
    MALFORMED line (``oops``) so downstream parsing must handle dirty
    feeds.  SQL-replicable, so the whole fetch→parse plan is
    oracle-checkable; swap ``fetch_fn`` for a real httpx GET in
    production."""
    import re

    m = re.search(r"(\d+)", url)
    r = int(m.group(1)) if m else 0
    rows = "".join(f"{r * 10 + i},item{r * 10 + i}\n" for i in range(4))
    return f"id,label\n{rows}oops\n"


def fetch_csv(
    df: DataFrame,
    url_col: str = "url",
    body_col: str = "body",
    fetch_fn: Callable[[str], str] | None = None,
) -> DataFrame:
    """S5 — remote CSV scan (reference ``crawler/metadata.py:303-332``:
    Google-Sheet CSV fetched over HTTP into pandas).  Spark-first shape:
    the URL table is a DataFrame, the GET runs inside Arrow-batched
    ``mapInPandas`` (parallel per partition, retry via
    :func:`with_retries` at the call site), and the body lands as a
    column for the DECLARATIVE parse (`split` + `from_csv`) to consume —
    never a driver-side download loop."""
    fetch = fetch_fn or fake_fetch_csv
    out_schema = T.StructType(
        list(df.schema) + [T.StructField(body_col, T.StringType())]
    )

    def _fetch(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            bodies = pdf[url_col].map(
                lambda u: fetch(u) if isinstance(u, str) else None
            )
            yield pdf.assign(**{body_col: bodies})

    return df.mapInPandas(_fetch, out_schema)


def with_retries(
    fn: Callable,
    max_retries: int = 3,
    base_delay: float = 1.0,
    sleep: Callable[[float], None] = time.sleep,
    retry_on: tuple[type[BaseException], ...] = (Exception,),
) -> Callable:
    """C20/K5 — exponential backoff wrapper (reference
    ``crawler/download.py:62-117``: ``2**retry_count`` sleep between
    attempts).  ``sleep`` is injectable so tests assert the delay schedule
    without waiting; use inside partition UDFs around flaky IO — never on
    the driver around a whole job."""

    def wrapped(*args, **kwargs):
        for attempt in range(max_retries + 1):
            try:
                return fn(*args, **kwargs)
            except retry_on:
                if attempt == max_retries:
                    raise
                sleep(base_delay * (2**attempt))

    return wrapped

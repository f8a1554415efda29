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


# --- K5: streamed chunked download ------------------------------------------


class TransientHTTPError(Exception):
    """Retryable fetch failure (the fake layer's stand-in for timeouts /
    5xx on a range request)."""


def fake_payload_length(url: str) -> int:
    """Deterministic fake Content-Length: 256 + (first 3 md5 hex digits
    mod 1500) — SQL-replicable as
    ``256 + ('0x' || substr(md5(url), 1, 3))::BIGINT % 1500``."""
    return 256 + int(hashlib.md5(url.encode()).hexdigest()[:3], 16) % 1500


def fake_payload_bytes(url: str) -> bytes:
    """Deterministic fake file content: ``'PAYLOAD:' + url + '|'`` tiled
    to the fake Content-Length.  ASCII throughout, so DuckDB replays it as
    ``substr(repeat(base, ...), 1, L)`` and checksums agree."""
    base = f"PAYLOAD:{url}|".encode()
    n = fake_payload_length(url)
    return (base * (n // len(base) + 1))[:n]


def chunk_is_flaky(url: str, start: int) -> bool:
    """Deterministic transient failure schedule, keyed by the chunk's
    START byte: the first attempt fails iff the first md5 hex digit of
    ``url#start`` is 0-3 (~25%), and the retry succeeds — so retry counts
    are exact functions of the URL and chunk grid, replayable in SQL."""
    return _HEX.index(
        hashlib.md5(f"{url}#{start}".encode()).hexdigest()[0]
    ) < 4


def fake_fetch_range(url: str, start: int, end: int, attempt: int) -> bytes:
    """Fake ranged GET (``Range: bytes=start-end``-style): serves the
    deterministic payload slice; the first attempt on a flaky chunk
    raises :class:`TransientHTTPError`."""
    if attempt == 0 and chunk_is_flaky(url, start):
        raise TransientHTTPError(f"transient failure: {url} [{start}:{end}]")
    return fake_payload_bytes(url)[start:end]


def download_chunked(
    df: DataFrame,
    url_col: str = "url",
    chunk_size: int = 8192,
    max_retries: int = 3,
    fetch_range_fn: Callable[[str, int, int, int], bytes] | None = None,
    length_fn: Callable[[str], int] | None = None,
) -> DataFrame:
    """K5 — streamed chunked file download (reference
    ``crawler/download.py:62-117``: 8 KB chunks, exponential backoff,
    3 retries) as a distributed Arrow-batched source.

    Spark-first shape: the URL table is a DataFrame; each partition
    downloads its URLs independently (the reference's
    ``Semaphore(3 books x 8 files)`` becomes partition-level parallelism
    — ``repartition(n)`` IS the concurrency limit); each chunk fetch is
    wrapped in the C20 exponential-backoff contract with zero sleep in
    tests via the injectable clock.  Appends ``(content binary, n_chunks
    int, n_retries int, length_ok boolean)``; a length mismatch after
    retries surfaces as ``length_ok = false``, never a silent truncation.

    The default fetch is the deterministic fake layer (no network in this
    sandbox) — content, chunk count, AND retry schedule are pure
    functions of the URL, so the whole download is value-checkable in
    SQL.  A real deployment passes a pooled ranged-GET callable."""
    fetch = fetch_range_fn or fake_fetch_range
    length_of = length_fn or fake_payload_length
    out_schema = T.StructType(
        list(df.schema)
        + [
            T.StructField("content", T.BinaryType()),
            T.StructField("n_chunks", T.IntegerType()),
            T.StructField("n_retries", T.IntegerType()),
            T.StructField("length_ok", T.BooleanType()),
        ]
    )

    def _one(url: str):
        total = length_of(url)
        buf = bytearray()
        n_chunks = 0
        n_retries = 0
        for start in range(0, total, chunk_size):
            end = min(start + chunk_size, total)
            attempt = {"n": 0}

            def _get():
                a = attempt["n"]
                attempt["n"] += 1
                return fetch(url, start, end, a)

            chunk = with_retries(
                _get,
                max_retries=max_retries,
                sleep=lambda _s: None,
                retry_on=(TransientHTTPError,),
            )()
            n_retries += attempt["n"] - 1
            buf += chunk
            n_chunks += 1
        return bytes(buf), n_chunks, n_retries, len(buf) == total

    def _dl(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            results = [
                _one(u) if isinstance(u, str) else (None, None, None, None)
                for u in pdf[url_col]
            ]
            yield pdf.assign(
                content=[r[0] for r in results],
                n_chunks=pd.array(
                    [r[1] for r in results], dtype="Int32"
                ),
                n_retries=pd.array(
                    [r[2] for r in results], dtype="Int32"
                ),
                length_ok=[r[3] for r in results],
            )

    return df.mapInPandas(_dl, out_schema)

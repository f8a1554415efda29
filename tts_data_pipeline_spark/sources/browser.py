"""S10 — dynamic-page scan (browser render seam).

The reference renders JS-driven catalog pages with Playwright and reads the
injected ``a.ai-track-btn`` anchors (``crawler/utils.py:395-416``, server
management ``crawler/playwright_server.py:7-84``).  No browser or network
exists in this sandbox, so the render step ships as a DETERMINISTIC fake:
the "browser" expands each URL into the DOM the reference's target pages
have after hydration — a static head plus N dynamically-injected track
anchors, N and the hrefs derived purely from the URL so SQL can replay the
render.  Swap ``render_fn`` for a real Playwright ``page.goto`` +
``page.content()`` in production; the Spark side — Arrow-batched
``mapInPandas``, schema contract, per-partition browser reuse — is the real
100 TB plumbing either way (one headless browser per executor partition,
no driver involvement).
"""

from __future__ import annotations

import re
from typing import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

_KEY_RE = re.compile(r"(\d+)/?$")


def fake_render(url: str) -> str:
    """Deterministic fake hydrated-DOM render: the trailing integer of the
    URL keys the page; ``key % 3 + 1`` track anchors are "injected" with
    CDN hrefs — the post-JS DOM shape of the reference's audiobook pages.
    Mirrored in SQL via ``range(doc_id % 3 + 1)``."""
    m = _KEY_RE.search(url)
    key = int(m.group(1)) if m else 0
    anchors = "".join(
        f'<a class="ai-track-btn" href="https://cdn.example.com/audio/'
        f'{key}/{i}.mp3">Track {i}</a>'
        for i in range(key % 3 + 1)
    )
    return (
        f"<html><head><title>Book {key}</title></head>"
        f'<body><div id="player">{anchors}</div></body></html>'
    )


def render_pages(
    df: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    render_fn: Callable[[str], str] | None = None,
) -> DataFrame:
    """Render each row's URL to its post-JS DOM, appending ``html_col``.

    ``render_fn`` is the browser seam (default: the deterministic fake).
    A real deployment creates ONE Playwright page per partition batch
    iterator — the per-partition generator shape below is exactly where
    that lifecycle hook goes, mirroring the reference's long-lived
    playwright server rather than a browser per row."""
    render = render_fn or fake_render
    out_schema = T.StructType(
        list(df.schema) + [T.StructField(html_col, T.StringType())]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # real browser: start it here, once per partition, close at end
        for pdf in batches:
            pdf = pdf.copy()
            pdf[html_col] = [
                render(u) if isinstance(u, str) else None
                for u in pdf[url_col]
            ]
            yield pdf

    return df.mapInPandas(gen, out_schema)

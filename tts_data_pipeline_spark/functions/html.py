"""HTML element extraction — the S9 scan family (SURVEY.md §2.1).

The reference crawls catalog pages and pulls fields out with CSS selectors
(``crawler/utils.py:245-301`` — selectolax ``css_first('title')``,
``css('.book-item')`` etc.; ``crawler/metadata.py:303-332`` similar).  The
Spark-native re-expression keeps extraction DECLARATIVE: each supported
selector compiles to a ``regexp_extract`` column expression (JVM-side,
codegen, pushdown-friendly) instead of a per-row Python parser.

Scope: the three selector shapes the reference actually uses — bare tag,
``.class``, ``#id`` — over well-formed, non-nested target elements (the
crawler's pages satisfy this; it reads leaf text nodes).  A full CSS engine
would need a real parser UDF (selectolax/bs4 inside ``mapInPandas``) —
that hook stays the documented escape hatch for arbitrary HTML.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Java regex fragments; [^<]* restricts to leaf text content (no nested
# elements), matching how the reference reads .text() of leaf nodes.
_TAG = r"<{tag}[^>]*>([^<]*)</{tag}>"
_CLASS = r'<\w+[^>]*class="{cls}"[^>]*>([^<]*)<'
_ID = r'<\w+[^>]*id="{eid}"[^>]*>([^<]*)<'


def _text_pattern(selector: str) -> str:
    """Selector → leaf-text regexp.  Forms: ``'title'`` (tag), ``'.lang'``
    (class), ``'#count'`` (id), ``'i.nn'`` (tag.class compound)."""
    if selector.startswith("."):
        return _CLASS.format(cls=selector[1:])
    if selector.startswith("#"):
        return _ID.format(eid=selector[1:])
    if "." in selector:
        tag, cls = selector.split(".", 1)
        return rf'<{tag}[^>]*class="{cls}"[^>]*>([^<]*)<'
    return _TAG.format(tag=selector)


def css_text(col: Column, selector: str) -> Column:
    """Text content of the first element matching ``selector``.

    Selector forms: ``'title'`` (tag), ``'.lang'`` (class), ``'#count'``
    (id), ``'i.nn'`` (tag.class).  Returns '' when nothing matches
    (regexp_extract semantics), mirroring the reference's
    ``css_first(...).text()`` with a null guard
    (``crawler/utils.py:262-270``).
    """
    return F.regexp_extract(col, _text_pattern(selector), 1)


def css_attr_all(col: Column, selector: str, attr: str) -> Column:
    """All matching elements' ``attr`` values as an array — the
    ``css('a.ai-track-btn')`` + ``.attributes['href']`` form the dynamic
    scan uses (``crawler/utils.py:404-412``).  Supports ``tag.class``
    compounds; assumes the class attribute precedes ``attr`` in the markup
    (true for the pages in scope — a full parser UDF remains the escape
    hatch)."""
    if "." in selector and not selector.startswith("."):
        tag, cls = selector.split(".", 1)
    elif selector.startswith("."):
        tag, cls = r"\w+", selector[1:]
    else:
        tag, cls = selector, None
    if cls is not None:
        pattern = f'<{tag}[^>]*class="{cls}"[^>]*{attr}="([^"]*)"'
    else:
        pattern = f'<{tag}[^>]*{attr}="([^"]*)"'
    return F.regexp_extract_all(col, F.lit(pattern), F.lit(1))


def css_text_all(col: Column, selector: str) -> Column:
    """All matching elements' text as an array — the ``css(...)`` list form
    (``crawler/utils.py:283-294`` iterates every ``.book-item``).  Same
    selector forms as :func:`css_text`, including ``tag.class``."""
    return F.regexp_extract_all(col, F.lit(_text_pattern(selector)), F.lit(1))

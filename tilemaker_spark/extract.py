"""HTML -> text extraction (the graft's per-row invariant).

BASELINE.json input_hint: extracted text must be byte-identical per url
to the reference extractor. The extractor is fully declarative Catalyst
(decode + regexp_extract + entity unescape chain) — JVM-side, no Python
on the hot path. The inverse (text -> html wrapping) lives in
fixtures.py; tests/test_extract.py verifies byte-identity per url.

Contract: the page body keeps the golden text inside
``<main><p>...</p></main>`` with exactly &amp; &lt; &gt; escaped, and
boilerplate (nav/script/footer noise) outside <main>.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MAIN_RE = r"<main><p>(.*?)</p></main>"


def extract_text(html_col: Column) -> Column:
    """binary html -> extracted text (Catalyst-only)."""
    s = F.decode(html_col, "UTF-8")
    body = F.regexp_extract(s, MAIN_RE, 1)
    # unescape order matters: &amp; last so it can't create new entities
    body = F.replace(body, F.lit("&lt;"), F.lit("<"))
    body = F.replace(body, F.lit("&gt;"), F.lit(">"))
    body = F.replace(body, F.lit("&amp;"), F.lit("&"))
    return body


def extract_text_py(html: bytes) -> str:
    """Pure-Python reference extractor (the oracle side of the invariant)."""
    import re

    s = html.decode("utf-8")
    m = re.search(MAIN_RE, s)
    body = m.group(1) if m else ""
    return body.replace("&lt;", "<").replace("&gt;", ">").replace("&amp;", "&")


def with_extracted_text(docs: DataFrame) -> DataFrame:
    """Add/replace the ``text`` column from ``html``."""
    return docs.withColumn("text", extract_text(F.col("html")))

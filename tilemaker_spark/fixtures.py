"""Deterministic Common-Crawl-style documents fixture (FIXTURES.md §1).

Synthesizes the input table of BASELINE.json input_hint:
(url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING),
seed-free (pure arithmetic on the row number, so any scale regenerates
identically). The html wraps the golden text in boilerplate; the
extractor (extract.py) must recover text byte-identically.
"""

from __future__ import annotations

import datetime as _dt

import numpy as np
import pandas as pd

LANGS = ["en", "de", "fr"]

_PLACES = ["Vaduz", "Schaan", "Triesen", "Balzers", "Eschen", "Mauren"]
_TOPICS = ["hiking trails", "castle tours", "food & drink", "bus routes",
           "river walks", "market days", "museum hours", "<local> events"]


def url_for(n: int) -> str:
    return f"https://example{n % 1000}.test/page/{n}"


def text_for(n: int) -> str:
    """Golden extracted text: sentences embedding geo entities. Includes
    characters that must survive the escape round-trip (&, <, >)."""
    p = _PLACES[n % len(_PLACES)]
    t = _TOPICS[(n * 7) % len(_TOPICS)]
    t2 = _TOPICS[(n * 13 + 3) % len(_TOPICS)]
    return (f"Visit {p} for {t}. "
            f"Page {n} covers {t2} near {p} & the Rhine valley. "
            f"Coordinates & directions inside.")


def _escape(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def html_for(n: int) -> bytes:
    """Boilerplate-wrapped page; only <main><p>..</p></main> holds content."""
    nav = "".join(f'<a href="/s{i}">sec{i}</a>' for i in range(n % 4 + 2))
    return (
        f"<html><head><title>page {n}</title>"
        f"<script>var t={n};track(t);</script></head>"
        f"<body><nav>{nav}</nav>"
        f"<main><p>{_escape(text_for(n))}</p></main>"
        f"<footer>generated {n % 97} | legal | privacy</footer>"
        f"</body></html>"
    ).encode("utf-8")


def make_documents(n_rows: int) -> pd.DataFrame:
    ns = np.arange(n_rows, dtype=np.int64)
    epoch = _dt.datetime(2025, 1, 1, tzinfo=_dt.timezone.utc)
    return pd.DataFrame({
        "url": [url_for(int(i)) for i in ns],
        "warc_ts": [epoch + _dt.timedelta(seconds=int(i) * 37) for i in ns],
        "html": [html_for(int(i)) for i in ns],
        "text": [text_for(int(i)) for i in ns],
        "lang": [LANGS[int(i) % 3] for i in ns],
    })


def write_documents_parquet(path: str, n_rows: int) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    df = make_documents(n_rows)
    schema = pa.schema([
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us", tz="UTC")),  # Spark can't read NANOS
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ])
    table = pa.Table.from_pandas(df, schema=schema, preserve_index=False)
    pq.write_table(table, path)
    return path

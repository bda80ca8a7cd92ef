"""Vectorized html -> text extraction (the engine's only Python step).

Replaces the reference's pandas `read_html`-style file parsing
(source-file client.py:282) with a single canonical, byte-stable rule:

  1. drop <script>/<style> elements including their content,
  2. replace every remaining tag with a single space,
  3. HTML-unescape entities,
  4. collapse runs of whitespace to one space and strip.

Pure-Python stdlib (re + html) on top of an Arrow-batched pandas UDF —
per BASELINE.json input_hint: vectorized, no per-row Python UDF, and the
output is a pure function of `html` (byte-identical per url across
runs/parallelism — verified by tests/test_extract.py).
"""

from __future__ import annotations

import html as _html
import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SCRIPT_STYLE_RE = re.compile(
    r"<(script|style)\b[^>]*>.*?</\1\s*>", re.IGNORECASE | re.DOTALL
)
_TAG_RE = re.compile(r"<[^>]*>")
_WS_RE = re.compile(r"\s+")


def extract_text_py(html_bytes: bytes | None) -> str | None:
    """Scalar reference implementation (used by the oracle tests)."""
    if html_bytes is None:
        return None
    s = html_bytes.decode("utf-8", errors="replace")
    s = _SCRIPT_STYLE_RE.sub(" ", s)
    s = _TAG_RE.sub(" ", s)
    s = _html.unescape(s)
    return _WS_RE.sub(" ", s).strip()


@F.pandas_udf(T.StringType())
def _extract_text_udf(html: pd.Series) -> pd.Series:
    return html.map(extract_text_py)


def extract_text(html_col: Column) -> Column:
    """Column expression: binary html -> extracted text."""
    return _extract_text_udf(html_col)


def with_extracted_text(df, html_col: str = "html", out_col: str = "text"):
    """Fill `out_col` from `html_col` where missing (tombstones keep
    their before-image text untouched)."""
    return df.withColumn(
        out_col,
        F.coalesce(F.col(out_col), extract_text(F.col(html_col)))
        if out_col in df.columns
        else extract_text(F.col(html_col)),
    )

"""Vectorized extraction: html -> text, language id.  Arrow pandas UDFs.

This is the engine's analogue of the reference's converter transform
language (GeoMesa converters configured in ``ConvertInputProcessor.scala``
and the expression configs in
``geomesa-accumulo-bundle/.../test/resources/application.conf``): the one
genuinely non-relational, per-record transformation stage.  The reference
runs a per-record converter loop (``PutGeoMesa.scala:84-95``); we run one
Arrow-batched pandas UDF — no per-row Python (``input_hint``).

Byte-identical contract: ``extract_text_bytes`` is the *reference
implementation* — a pure function of the html bytes only.  The pandas UDF
must produce byte-identical output per url (tested in
tests/test_extract.py), which pins down the Arrow/pandas pitfalls: html is
``BinaryType`` end-to-end (never decoded by Arrow), output is built with
``str`` operations only, and no locale/environment-dependent call is made.
"""

from __future__ import annotations

import html as _htmlmod
import re
from collections import Counter
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# --- pure reference implementation (bytes -> str), deterministic -----------

_RE_DROP = re.compile(
    r"<(script|style|head|noscript)\b[^>]*>.*?</\1\s*>",
    re.IGNORECASE | re.DOTALL,
)
_RE_COMMENT = re.compile(r"<!--.*?-->", re.DOTALL)
_RE_TAG = re.compile(r"<[^>]+>")
_RE_WS = re.compile(r"\s+")


def extract_text_bytes(html: bytes | None) -> str | None:
    """Canonical html->text: strip script/style/head, tags, entities; then
    whitespace-normalize.  Pure function of the input bytes."""
    if html is None:
        return None
    s = html.decode("utf-8", errors="replace")
    s = _RE_COMMENT.sub(" ", s)
    s = _RE_DROP.sub(" ", s)
    s = _RE_TAG.sub(" ", s)
    if "&" in s:  # unescape is a no-op (and pure cost) without entities
        s = _htmlmod.unescape(s)
    return _RE_WS.sub(" ", s).strip()


# --- language id: stopword-ratio heuristic, deterministic ------------------

STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset(
        "the and of to in is that it for was on are as with his they at be this have from or by".split()
    ),
    "de": frozenset(
        "der die und in den von zu das mit sich des auf für ist im dem nicht ein eine als auch es".split()
    ),
    "fr": frozenset(
        "le de la et les des en un du une que est pour qui dans par sur au plus pas ce ne".split()
    ),
    "es": frozenset(
        "de la que el en y a los del se las por un para con no una su al lo como".split()
    ),
    "it": frozenset(
        "di e il la che in un per è non una sono con si da come io questo ma le dei".split()
    ),
}
_LANGS = sorted(STOPWORDS)  # deterministic iteration order
_RE_TOKEN = re.compile(r"[^\W\d_]+", re.UNICODE)
MIN_STOPWORD_RATIO = 0.08
UNKNOWN_LANG = "und"

#: inverted stopword index word -> langs containing it: ONE dict probe per
#: token instead of one membership test per (token, language) — ~4x faster
#: with identical counts (stopword lists overlap across languages, e.g.
#: "la"/"en"/"des", so the value is a tuple, not a single lang)
_WORD_LANGS: dict[str, tuple[str, ...]] = {}
for _lang in _LANGS:
    for _w in STOPWORDS[_lang]:
        _WORD_LANGS[_w] = _WORD_LANGS.get(_w, ()) + (_lang,)


def detect_lang_str(text: str | None) -> str | None:
    """Argmax of per-language stopword hit ratio; 'und' below threshold.
    Ties break alphabetically (deterministic)."""
    if text is None:
        return None
    tokens = _RE_TOKEN.findall(text.lower())
    if not tokens:
        return UNKNOWN_LANG
    counts = dict.fromkeys(_LANGS, 0)
    get = _WORD_LANGS.get
    # Counter first: one index probe per DISTINCT token (C-speed grouping),
    # then weight by multiplicity — identical counts, ~2x over per-token
    for t, n in Counter(tokens).items():
        langs = get(t)
        if langs is not None:
            for lang in langs:
                counts[lang] += n
    best_lang, best_hits = UNKNOWN_LANG, 0
    for lang in _LANGS:  # alphabetical: first strictly-greater wins ties
        if counts[lang] > best_hits:
            best_lang, best_hits = lang, counts[lang]
    if best_hits / len(tokens) < MIN_STOPWORD_RATIO:
        return UNKNOWN_LANG
    return best_lang


# --- Arrow-vectorized UDFs ---------------------------------------------------

_EXTRACT_SCHEMA = T.StructType(
    [
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)


@pandas_udf(_EXTRACT_SCHEMA)
def extract_struct_udf(html: pd.Series) -> pd.DataFrame:
    """One Arrow batch in, one out: text + lang computed in a single pass
    so the decoded text crosses the Arrow boundary exactly once."""
    texts = html.map(extract_text_bytes, na_action="ignore")
    langs = texts.map(detect_lang_str, na_action="ignore")
    return pd.DataFrame({"text": texts, "lang": langs})


@pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return html.map(extract_text_bytes, na_action="ignore")


@pandas_udf(T.StringType())
def detect_lang_udf(text: pd.Series) -> pd.Series:
    return text.map(detect_lang_str, na_action="ignore")


def extract_pages(df: DataFrame, html_col: str = "html") -> DataFrame:
    """Attach ``text`` and ``lang`` columns extracted from ``html_col``.

    Null html (delete events) passes through as null text/lang, so the
    extraction stage is safe to run on a mixed change stream before MERGE.
    """
    ex = "_extracted"
    return (
        df.withColumn(ex, extract_struct_udf(F.col(html_col)))
        .withColumn("text", F.col(f"{ex}.text"))
        .withColumn("lang", F.col(f"{ex}.lang"))
        .drop(ex)
    )

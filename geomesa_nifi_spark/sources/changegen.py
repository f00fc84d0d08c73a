"""Deterministic synthetic CDC change stream — generated entirely JVM-side.

Produces the F2 ``changes`` fixture shape (FIXTURES.md):

    op:string  url:string  warc_ts:timestamp  html:binary  offset:long  partition:int

Every column is a pure expression of ``spark.range(n)`` and the seed —
``xxhash64`` is the PRNG — so generation is:

  * deterministic across runs, sessions and partitionings (no
    ``rand()``/``Date.now`` anywhere);
  * embarrassingly parallel and codegen'd: 10^8 events generate at memory
    bandwidth, which is what lets the benchmark measure MERGE throughput
    instead of generator throughput;
  * skewed on purpose: key popularity follows ``floor(K * u^skew)`` (a
    power-law head), and hot keys concentrate in hot domains, exercising
    the skew handling the north rule calls for.

The html payload embeds a deterministic text body (per-language vocab with
real stopwords, so language id has signal) inside head/style/script
boilerplate that the extraction stage must strip; round-tripping
``extract_text_bytes(html) == text`` byte-identically is asserted in tests.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

BASE_EPOCH = 1704067200  # 2024-01-01T00:00:00Z

# Per-language vocab: language stopwords (detection signal) + neutral
# fillers, padded to a common size so one pmod indexes any of them.
_FILLERS = [
    "data", "page", "info", "report", "item", "value", "total", "index",
    "note", "list", "table", "entry", "code", "line", "form", "card",
]
VOCABS: dict[str, list[str]] = {
    "en": "the and of to in is that it for was on are as with his they at be this have".split() + _FILLERS,
    "de": "der die und in den von zu das mit sich des auf für ist im dem nicht ein eine als".split() + _FILLERS,
    "fr": "le de la et les des en un du une que est pour qui dans par sur au plus pas".split() + _FILLERS,
    "es": "de la que el en y a los del se las por un para con no una su al lo".split() + _FILLERS,
}
_VOCAB_SIZE = min(len(v) for v in VOCABS.values())
# Weight English heavier, like a web crawl.
_LANG_SLOTS = ["en", "en", "en", "de", "fr", "es"]


def _unit(*cols: Column) -> Column:
    """Deterministic uniform [0, 1) from a hash of the inputs."""
    return (F.pmod(F.xxhash64(*cols), F.lit(1 << 30)) / F.lit(float(1 << 30)))


def change_stream(
    spark: SparkSession,
    n_events: int,
    n_keys: int | None = None,
    seed: int = 42,
    skew: float = 2.5,
    p_delete: float = 0.05,
    p_insert: float = 0.15,
    n_domains: int = 50,
    n_source_partitions: int = 8,
    disorder_seconds: int = 120,
    words_min: int = 8,
    words_span: int = 48,
    payload: str = "html",
) -> DataFrame:
    """Build the deterministic change-event DataFrame (lazy; nothing runs).

    ``payload='html'`` emits the raw binary html column (the extraction
    stage's input, F2 shape).  ``payload='text'`` emits the already-extracted
    ``text``/``lang`` columns instead — byte-identical to what extraction
    would produce, but generated JVM-side; used by benchmarks that measure
    MERGE throughput in isolation.
    """
    if n_keys is None:
        n_keys = max(n_events // 4, 16)

    df = spark.range(n_events)
    sid = F.lit(seed)

    def h(salt: int) -> Column:
        return F.xxhash64(F.col("id"), sid, F.lit(salt))

    # Power-law key popularity: u^skew piles probability mass onto low ids.
    key_id = F.least(
        F.floor(F.lit(n_keys) * F.pow(_unit(h(1)), F.lit(skew))).cast("long"),
        F.lit(n_keys - 1),
    )
    # Hot keys live in hot domains (stable per key, itself power-law).
    domain = F.least(
        F.floor(F.lit(n_domains) * F.pow(_unit(F.xxhash64(key_id, sid, F.lit(2))), F.lit(skew))).cast("long"),
        F.lit(n_domains - 1),
    )
    url = F.concat(
        F.lit("https://d"), domain, F.lit(".example.org/p/"), key_id
    )

    u_op = _unit(h(3))
    op = (
        F.when(u_op < F.lit(p_delete), F.lit("delete"))
        .when(u_op < F.lit(p_delete + p_insert), F.lit("insert"))
        .otherwise(F.lit("update"))
    )

    # Event time: monotone in offset with bounded local disorder, so late
    # events exist (LWW must handle them) but a batch ordered by offset is
    # approximately time-ordered — like a real binlog tail.
    jitter = F.pmod(h(4), F.lit(2 * disorder_seconds)) - F.lit(disorder_seconds)
    warc_ts = F.timestamp_seconds(F.lit(BASE_EPOCH) + F.col("id") + jitter)

    # Stable language per key; deterministic text per event.
    lang_idx = F.pmod(F.xxhash64(key_id, sid, F.lit(5)), F.lit(len(_LANG_SLOTS))).cast("int")
    vocab_arrays = F.array(
        *[F.array(*[F.lit(w) for w in VOCABS[lang][:_VOCAB_SIZE]]) for lang in _LANG_SLOTS]
    )
    vocab = F.element_at(vocab_arrays, lang_idx + 1)
    n_words = (F.lit(words_min) + F.pmod(h(6), F.lit(words_span))).cast("int")
    words = F.transform(
        F.sequence(F.lit(0), n_words - 1),
        lambda i: F.element_at(
            vocab, (F.pmod(F.xxhash64(F.col("id"), sid, F.lit(7), i), F.lit(_VOCAB_SIZE)) + 1).cast("int")
        ),
    )
    text = F.concat_ws(" ", words)

    html = F.when(
        op == "delete", F.lit(None).cast("binary")
    ).otherwise(
        F.encode(
            F.concat(
                F.lit("<html><head><title>Page "), key_id,
                F.lit('</title><style>p{margin:0}</style></head><body><p class="c">'),
                text,
                F.lit('</p><script>var tracked = "no";</script></body></html>'),
            ),
            "UTF-8",
        )
    )

    partition = F.pmod(F.xxhash64(url, sid), F.lit(n_source_partitions)).cast("int")

    if payload == "text":
        lang = F.element_at(
            F.array(*[F.lit(lang_name) for lang_name in _LANG_SLOTS]), lang_idx + 1
        )
        body = F.when(op == "delete", F.lit(None).cast("string")).otherwise(text)
        body_lang = F.when(op == "delete", F.lit(None).cast("string")).otherwise(lang)
        return df.select(
            op.alias("op"),
            url.alias("url"),
            warc_ts.alias("warc_ts"),
            body.alias("text"),
            body_lang.alias("lang"),
            F.col("id").alias("offset"),
            partition.alias("partition"),
        )

    return df.select(
        op.alias("op"),
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        html.alias("html"),
        F.col("id").alias("offset"),
        partition.alias("partition"),
    )


def write_replay_files(
    df: DataFrame, out_dir: str, n_files: int
) -> list[str]:
    """Materialize the stream as ``n_files`` offset-contiguous parquet files
    (``chunk-00000.parquet`` ...), the replay unit for file-source streaming
    and for batch benchmarks.  Chunk k holds the k-th offset range of equal
    width, measured from the stream's own min/max — so a TAIL stream (a
    slice whose offsets neither start at 0 nor are dense, e.g. the post-
    bootstrap half plus an overlap window) chunks correctly too.  Every
    staged chunk is moved, never skipped: a chunk landing outside
    ``range(n_files)`` would silently drop data."""
    import os

    lo, hi, rows = df.agg(
        F.min("offset"), F.max("offset"), F.count(F.lit(1))
    ).first()
    if rows == 0:
        os.makedirs(out_dir, exist_ok=True)
        return []
    size = max(1, (int(hi) - int(lo) + n_files) // n_files)
    chunk = ((F.col("offset") - F.lit(int(lo))) / F.lit(size)).cast("int")
    staged = df.withColumn("_chunk", chunk).repartition(F.col("_chunk"))
    staged.write.partitionBy("_chunk").mode("overwrite").parquet(out_dir + ".staging")
    paths = []
    os.makedirs(out_dir, exist_ok=True)
    chunk_dirs = sorted(
        d for d in os.listdir(out_dir + ".staging") if d.startswith("_chunk=")
    )
    for k, name in enumerate(sorted(chunk_dirs, key=lambda d: int(d.split("=")[1]))):
        src_dir = os.path.join(out_dir + ".staging", name)
        parts = sorted(p for p in os.listdir(src_dir) if p.endswith(".parquet"))
        assert len(parts) == 1, f"expected one file per chunk, got {parts}"
        dst = os.path.join(out_dir, f"chunk-{k:05d}.parquet")
        os.replace(os.path.join(src_dir, parts[0]), dst)
        paths.append(dst)
    return paths

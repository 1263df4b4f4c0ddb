"""Document chunking and token-budget batch packing.

LLM-pipeline additions beyond the reference surface (driver contract):
splitting long documents into overlapping fixed-size training chunks,
and packing documents into fixed-token-budget training batches. Both
are pure built-in column expressions — JVM-side, whole-stage-codegen'd
— and both have exact ANSI-SQL spellings for the DuckDB oracle.

Scale notes:
- ``chunk_text`` is embarrassingly parallel (per-row sequence +
  explode; output rows ∝ corpus chars / step, no shuffle).
- ``pack_token_budget`` packs *within hash shards* so the running-sum
  window is ``partitionBy(shard)`` — never a single global partition.
  Real packing pipelines shard exactly this way (each trainer worker
  packs its own stream); a global greedy pack would serialize the
  corpus through one task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from sslr_spark.functions.text import token_count


def chunk_text(
    df: DataFrame,
    text_col: str = "text",
    id_cols: list[str] | None = None,
    chunk_chars: int = 512,
    overlap: int = 0,
) -> DataFrame:
    """Split each document into fixed-width character windows.

    Chunks start every ``chunk_chars - overlap`` characters; the last
    chunk may be shorter. Null/empty documents produce no chunks.
    Output: ``id_cols..., chunk_idx, chunk, chunk_len``.
    """
    if not 0 <= overlap < chunk_chars:
        raise ValueError("need 0 <= overlap < chunk_chars")
    id_cols = id_cols or ["doc_id"]
    step = chunk_chars - overlap
    t = F.col(text_col)
    c = df.filter(t.isNotNull() & (F.length(t) > 0)).withColumn(
        "__n", F.length(t)
    )
    # cap starts at n-1-overlap: once a chunk reaches the end of the
    # document, a further start would yield a chunk fully contained in
    # it (pure duplicate training text). greatest(0, ...) keeps one
    # chunk for documents shorter than the overlap.
    last = F.greatest(F.lit(0), F.col("__n") - 1 - overlap)
    starts = F.sequence(F.lit(0), last, F.lit(step))
    return c.select(
        *id_cols, text_col, "__n", F.explode(starts).alias("__s")
    ).select(
        *id_cols,
        (F.col("__s") / step).cast("long").alias("chunk_idx"),
        F.substr(F.col(text_col), F.col("__s") + 1, F.lit(chunk_chars)).alias(
            "chunk"
        ),
        F.least(F.lit(chunk_chars), F.col("__n") - F.col("__s"))
        .cast("long")
        .alias("chunk_len"),
    )


def pack_token_budget(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens: Column | None = None,
    budget: int = 2048,
    n_shards: int = 8,
    shard: Column | None = None,
) -> DataFrame:
    """Greedy concat-packing of documents into fixed-token-budget
    training batches, sharded for scale.

    Documents are assigned to ``n_shards`` deterministic shards
    (default: ``id_col % n_shards``; pass ``shard`` to override, e.g.
    with a hash). Within a shard, documents are laid end-to-end in
    ``id_col`` order and a document joins the batch its *first token*
    lands in: ``batch_id = (running_sum - own_tokens) // budget``.
    Oversized documents (> budget tokens) occupy their starting batch —
    real packers truncate or chunk them first (see ``chunk_text``).

    Output: ``id_col, shard, n_tokens, batch_id, batch_off`` where
    ``batch_off`` is the document's starting token offset inside its
    batch. One shuffle (the per-shard window sort); each shard is an
    independent partition, so the sort parallelism is ``n_shards`` —
    size it to the cluster, not to 8.
    """
    toks = tokens if tokens is not None else token_count(F.col("text"))
    if shard is None:
        dtype = dict(df.dtypes).get(id_col, "")
        if dtype not in (
            "tinyint", "smallint", "int", "bigint", "long", "decimal",
        ) and not dtype.startswith("decimal"):
            # id % n on a string id is a NULL (or ANSI error) shard —
            # which silently collapses every document into ONE window
            # partition, the exact single-task sort sharding prevents
            raise ValueError(
                f"default shard needs a numeric {id_col!r} (got "
                f"{dtype or 'missing'}); pass shard=, e.g. "
                "F.pmod(F.xxhash64(id), n_shards)"
            )
        shard = F.col(id_col) % n_shards
    sh = shard
    base = df.select(
        F.col(id_col),
        sh.cast("long").alias("shard"),
        toks.cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = F.sum("n_tokens").over(w)
    start = run - F.col("n_tokens")
    return base.select(
        id_col,
        "shard",
        "n_tokens",
        F.floor(start / budget).cast("long").alias("batch_id"),
        (start % budget).cast("long").alias("batch_off"),
    )


def filter_funnel(
    df: DataFrame,
    stages: list[tuple[str, Column]],
) -> DataFrame:
    """Quality-filter funnel report: for each stage, how many documents
    survive all filters up to and including it, plus per-stage drops.

    ``stages`` is an ordered list of ``(name, boolean Column)``; null
    conditions count as False (dropped). The whole funnel is ONE scan
    with conditional partial aggregation (a k-column agg), then a tiny
    ``stack`` unpivot of the single result row — no shuffle of data
    rows, no repeated scans per stage.

    Output: ``stage, stage_name, n_in, n_out, n_dropped`` (stage 0 is
    the unfiltered input).
    """
    if not stages:
        raise ValueError("need at least one funnel stage")
    aggs = [F.count(F.lit(1)).alias("__s0")]
    conj = None
    for i, (_, cond) in enumerate(stages, start=1):
        c = F.coalesce(cond, F.lit(False))
        conj = c if conj is None else (conj & c)
        # empty input: sum() is NULL — report 0 survivors, not null
        aggs.append(
            F.coalesce(F.sum(conj.cast("long")), F.lit(0)).alias(f"__s{i}")
        )
    row = df.agg(*aggs)
    names = ["input"] + [name for name, _ in stages]

    def _q(name: str) -> str:
        # stage names land inside a stack() expression string
        return name.replace("\\", "\\\\").replace("'", "\\'")

    pairs = ", ".join(
        f"{i}, '{_q(name)}', __s{i}" for i, name in enumerate(names)
    )
    stacked = row.select(
        F.expr(
            f"stack({len(names)}, {pairs}) as (stage, stage_name, n_out)"
        )
    )
    wprev = Window.orderBy("stage")  # k+1 rows — bounded by stage count
    return stacked.select(
        F.col("stage").cast("long").alias("stage"),
        "stage_name",
        F.coalesce(F.lag("n_out").over(wprev), F.col("n_out"))
        .cast("long")
        .alias("n_in"),
        F.col("n_out").cast("long").alias("n_out"),
        (
            F.coalesce(F.lag("n_out").over(wprev), F.col("n_out"))
            - F.col("n_out")
        )
        .cast("long")
        .alias("n_dropped"),
    )


# PII redaction patterns — the portable Java-regex/RE2 subset (no
# backreferences, no lookaround), so the Spark path and the DuckDB
# oracle replace identically.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", "\\+?[0-9][0-9() -]{6,}[0-9]", "<PHONE>"),
    ("ipv4", "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b", "<IP>"),
]


def pii_scrub(
    df: DataFrame, text_col: str = "text", out_col: str = "scrubbed"
) -> DataFrame:
    """Redact emails, phone numbers, and IPv4 addresses, appending a
    per-kind match count column (``n_email``, ``n_phone``, ``n_ipv4``).

    Patterns apply in PII_PATTERNS order (email before phone, so a
    digit-bearing email is one <EMAIL>, not an email+<PHONE> mangle).
    Pure ``regexp_replace``/``regexp_count`` column expressions.
    """
    scrubbed = F.col(text_col)
    cols: dict[str, Column] = {}
    for name, pat, repl in PII_PATTERNS:
        # count on the partially-scrubbed text so each count equals the
        # replacements actually made at this stage (an email's digits
        # are never double-counted as a phone)
        cols[f"n_{name}"] = F.regexp_count(scrubbed, F.lit(pat)).cast("long")
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    cols[out_col] = scrubbed
    return df.withColumns(cols)

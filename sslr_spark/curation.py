"""End-to-end curation pipeline: the LLM-data counterpart of the sync
job — chain the engine's curation operators over a documents table in
one declarative call, in the order production pretraining pipelines
run them:

  1. rule filter   — Gopher rule battery (text.py gopher_flags.keep)
  2. exact dedup   — content-hash keeper (dedup.py exact_dedup_groups)
  3. quality gate  — per-language exact-quantile model-score cut
                     (quality_model.py quality_quantile_gate),
                     thresholds computed over the SURVIVORS of the
                     earlier stages (gating before dedup would let
                     duplicate clusters distort the distribution)
  4. source cap    — at most N docs per source (sampling.py source_cap)
  5. shard assign  — deterministic export shards (sampling.py
                     shard_assign)

Every stage is the already-verified operator — this module adds only
the composition, so the whole pipeline stays hash-exact end-to-end
(the x_curation_pipeline driver key replays all five stages as one
DuckDB CTE chain).

Scale shape: stages compose LAZILY into one plan — Catalyst sees the
whole chain, so column pruning reaches the scan and the narrow rule
filter runs before any shuffle. The expensive stages keep their
individual 100 TB shapes (hash-shuffle dedup, bounded-histogram gate,
per-source window cap). The optional funnel report costs one extra
aggregate per stage and is off by default.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sslr_spark.functions.dedup import exact_dedup_groups
from sslr_spark.functions.quality_model import quality_quantile_gate
from sslr_spark.functions.sampling import shard_assign, source_cap
from sslr_spark.functions.text import gopher_flags


@dataclass
class CurationResult:
    """Final curated frame plus (optionally) per-stage survivor
    counts in pipeline order."""

    df: DataFrame
    funnel: dict[str, int] = field(default_factory=dict)


def curate_documents(
    df: DataFrame,
    *,
    quality_weights: list[float],
    quality_bias: float,
    keep_fraction: float = 0.6,
    max_per_source: int | None = None,
    n_shards: int | None = 16,
    gopher: bool = True,
    exact_dedup: bool = True,
    text_col: str = "text",
    key_col: str = "doc_id",
    lang_col: str = "lang",
    source_col: str = "source",
    with_funnel: bool = False,
) -> CurationResult:
    """Run the standard curation chain over a documents frame.

    Returns the curated rows as (key, lang, source[, shard]). Stages
    toggle independently; ``with_funnel`` additionally counts
    survivors after each stage (one aggregate per stage — leave off
    in production and read counts from the shard manifest instead).
    """
    funnel: dict[str, int] = {}

    def tick(name: str, frame: DataFrame) -> None:
        if with_funnel:
            funnel[name] = frame.count()

    cur = df.select(key_col, lang_col, source_col, text_col)
    tick("input", cur)

    if gopher:
        keep = gopher_flags(df, text_col).filter("keep").select(key_col)
        cur = cur.join(keep, key_col, "left_semi")
        tick("gopher", cur)

    if exact_dedup:
        keepers = exact_dedup_groups(cur, text_col).select(
            F.col("keep_id").alias(key_col)
        )
        cur = cur.join(keepers, key_col, "left_semi")
        tick("exact_dedup", cur)

    if keep_fraction is not None and keep_fraction < 1.0:
        kept = quality_quantile_gate(
            cur,
            keep_fraction,
            by=lang_col,
            text_col=text_col,
            weights=quality_weights,
            bias=quality_bias,
        ).select(key_col)
        cur = cur.join(kept, key_col, "left_semi")
        tick("quality_gate", cur)

    if max_per_source is not None:
        cur = source_cap(cur, source_col, max_per_source, key_col)
        tick("source_cap", cur)

    out = cur.select(key_col, lang_col, source_col)
    if n_shards:
        out = shard_assign(out, n_shards, key_col)
    return CurationResult(out, funnel)

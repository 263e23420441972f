"""Training-data assembly operators: sequence packing and stratified sampling.

These extend the engine beyond the reference's replication surface into the
LLM-pipeline territory the engine targets (SURVEY §2's "beyond the
reference" set): once a corpus is cleaned/deduped, it is packed into
fixed-size context windows and sampled into language/domain mixes.

Scale design:
- pack_plan: concat-then-chunk packing (the standard pretraining packing:
  documents concatenated in a deterministic order, split at every `window`
  tokens). A GLOBAL running sum would serialize on one partition, so docs
  are first assigned to `n_shards` deterministic shards (id % n_shards) and
  packing runs per shard — the window function's partition key — which is
  exactly how multi-worker packing runs in production (each data-loader
  worker packs its own shard). All expressions are JVM built-ins.
- stratified_sample: per-stratum top-k by a deterministic 60-bit hash
  (functions/hashing.py) — a reproducible uniform sample without any RNG
  state, rerunnable on any cluster layout with identical output. The window
  sort is per-stratum, not global; with heavy strata the rank is bounded by
  quota so AQE's skew handling applies before the filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from peerdb_spark.functions.hashing import h64
from peerdb_spark.functions.text import token_count


def pack_plan(
    df: DataFrame,
    text_col: str,
    id_col: str,
    window: int,
    n_shards: int = 8,
    tokens_col: Column | None = None,
) -> DataFrame:
    """Assign every document a (shard, pack_id, pack_offset) placement.

    pack_id = which context window the document STARTS in; pack_offset =
    token offset within that window (documents crossing a boundary spill
    into the next window — chunking, not first-fit, so placement is a pure
    prefix-sum, parallel per shard). Returns the input plus (n_tokens,
    shard, pack_id, pack_offset)."""
    toks = tokens_col if tokens_col is not None else token_count(F.col(text_col))
    out = df.withColumn("n_tokens", toks.cast("long")).withColumn(
        "shard", F.pmod(F.col(id_col), F.lit(n_shards)).cast("int")
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return out.withColumn("pack_id", F.floor(cum_before / F.lit(window))).withColumn(
        "pack_offset", F.pmod(cum_before, F.lit(window)).cast("long")
    )


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    quota: int,
    seed: str = "samp",
) -> DataFrame:
    """Deterministic per-stratum sample: the `quota` rows with the smallest
    seeded hash of the id win. Equivalent to a uniform random sample per
    stratum but fully reproducible (same seed → same rows on any engine —
    the DuckDB oracle replays it bit-for-bit)."""
    key = h64(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    w = Window.partitionBy(stratum_col).orderBy(key, F.col(id_col))
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= quota)
        .drop("_rk")
    )


def mixture_sample(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str = "source",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
    salt: str = "mix",
) -> DataFrame:
    """Weighted per-domain sampling — the training-mix builder: each stratum
    (source/domain/language) keeps an independent deterministic fraction of
    its documents, so a corpus can be re-weighted (e.g. 100% wiki, 25% web,
    5% forums) without an RNG.

    Keep rule: h64(salt:id) % 10_000 < round(rate * 10_000) — a hash
    threshold, not a random draw, so the mix is reproducible on any cluster
    layout AND monotone: raising a rate only ADDS documents (the kept set at
    rate r is a subset of the kept set at r' > r), which makes incremental
    mix adjustments cheap diffs instead of full rebuilds.

    Pure per-row expressions (a literal map lookup + one hash) — zero
    shuffles; the filter pipelines into the scan at any scale.
    """
    pairs: list[Column] = []
    for k, v in rates.items():
        pairs += [F.lit(k), F.lit(int(round(v * 10_000)))]
    rate_bp = F.coalesce(
        F.element_at(F.create_map(*pairs), F.col(stratum_col)),
        F.lit(int(round(default_rate * 10_000))),
    )
    ticket = h64(F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string"))) % 10_000
    return df.where(ticket < rate_bp)


def token_budget_sample(
    df: DataFrame,
    budgets: dict[str, int],
    stratum_col: str = "source",
    id_col: str = "doc_id",
    tokens_col: Column | None = None,
    text_col: str = "text",
    salt: str = "budget",
) -> DataFrame:
    """Per-domain sampling against TOKEN budgets (mixture weights are
    specified in tokens, not documents — how training mixes are actually
    budgeted): within each stratum, documents are ranked by a deterministic
    hash (an unbiased uniform order) and kept while the running token total
    is at most the stratum's budget; the first doc that crosses the line is
    the last one kept (budgets cut between documents, never inside one).
    Strata without a budget entry are dropped.

    One per-stratum window cumsum — same shuffle shape as any grouped rank;
    deterministic on any layout, and like mixture_sample the kept PREFIX
    only extends when a budget grows (hash order is budget-independent), so
    raising budgets is an incremental diff. Returns the input rows plus
    (n_tokens, cum_before).
    """
    toks = tokens_col if tokens_col is not None else token_count(F.col(text_col))
    pairs: list[Column] = []
    for k, v in budgets.items():
        pairs += [F.lit(k), F.lit(int(v))]
    budget = F.element_at(F.create_map(*pairs), F.col(stratum_col))
    order = h64(F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string")))
    w = (
        Window.partitionBy(stratum_col)
        .orderBy(order, F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = (
        df.withColumn("n_tokens", toks.cast("long"))
        .withColumn("_cum_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
    )
    return (
        out.where(F.col("_cum_before") < budget)
        .withColumnRenamed("_cum_before", "cum_before")
    )


def length_batch_plan(
    df: DataFrame,
    batch_size: int,
    id_col: str = "doc_id",
    tokens_col: Column | None = None,
    text_col: str = "text",
    n_shards: int = 8,
) -> DataFrame:
    """Length-bucketed inference batching: documents sort by token length
    within deterministic shards and group into fixed-size batches, so each
    batch pads to its own max length instead of the corpus max — the
    standard dynamic-padding trick for batch inference/scoring. Returns the
    input plus (n_tokens, shard, batch_id, batch_max_tokens, pad_waste)
    where pad_waste = batch_max - n_tokens (the padding this doc costs).

    Per-shard sort (the window key), never global — the same parallelism
    contract as pack_plan.
    """
    toks = tokens_col if tokens_col is not None else token_count(F.col(text_col))
    out = df.withColumn("n_tokens", toks.cast("long")).withColumn(
        "shard", F.pmod(F.col(id_col), F.lit(n_shards)).cast("int")
    )
    w = Window.partitionBy("shard").orderBy("n_tokens", id_col)
    out = out.withColumn(
        "batch_id", F.floor((F.row_number().over(w) - 1) / F.lit(batch_size))
    )
    bw = Window.partitionBy("shard", "batch_id")
    return out.withColumn(
        "batch_max_tokens", F.max("n_tokens").over(bw)
    ).withColumn("pad_waste", F.col("batch_max_tokens") - F.col("n_tokens"))

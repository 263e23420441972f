"""Distributed mergeable sketches: count-min.

A count-min sketch is the classic bounded-memory frequency summary for
streams and massive corpora: d hash rows × w counters; insert adds 1 at
(i, h_i(x) % w) for each row i; the estimate is min_i counter[i][h_i(x)] —
an overestimate biased by collisions, bounded by ε = e/w with probability
1 − (1/e)^d.

Engine shape: a sketch here is a DataFrame of (row, slot, count) cells —
hash-aggregated, so the corpus collapses to ≤ d·w cells with map-side
partials, and two sketches merge by unioning cells and re-summing (the same
property that lets every executor build a partial sketch independently).
Hashes are the repo's cross-engine md5-based h64 (functions/hashing.py), so
the DuckDB oracle reproduces the sketch bit-for-bit — the declared query
certifies the estimate-vs-truth relation exactly.

This is deliberately beyond the reference's surface (it has no approximate
aggregates — SURVEY §2.5); it belongs to the training-data-pipeline layer
where exact per-token counting at 100 TB is often not worth a full shuffle
of the vocabulary.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from peerdb_spark.functions.hashing import h64_seeded


def cms_slot(col: Column, row: int, width: int) -> Column:
    """Counter index of `col` in hash row `row` (seeded 60-bit hash mod w)."""
    return (h64_seeded(col, 1000 + row) % width).cast("int")


def cms_build(
    df: DataFrame, value_col: str, d: int = 4, width: int = 256
) -> DataFrame:
    """Build a count-min sketch over a column: returns (row, slot, cnt) cells.

    One explode (d cells per input row) + one hash aggregate; output is at
    most d·w rows regardless of corpus size. Partial sketches from separate
    batches/partitions merge by summing cnt over (row, slot) — see cms_merge.
    """
    c = F.col(value_col)
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"), cms_slot(c, i, width).alias("slot")
                    )
                    for i in range(d)
                ]
            )
        ).alias("_cell")
    )
    return (
        cells.select(F.col("_cell.row").alias("row"), F.col("_cell.slot").alias("slot"))
        .groupBy("row", "slot")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with identical (d, width): sum cells."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "slot").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame, items: DataFrame, value_col: str, d: int = 4, width: int = 256
) -> DataFrame:
    """Point-estimate counts for `items[value_col]`: min over the d rows.

    The sketch is tiny (≤ d·w cells) → broadcast; each item probes d cells
    via an equi-join. Returns (value_col, est)."""
    c = F.col(value_col)
    probes = items.select(
        value_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"), cms_slot(c, i, width).alias("slot")
                    )
                    for i in range(d)
                ]
            )
        ).alias("_p"),
    ).select(value_col, F.col("_p.row").alias("row"), F.col("_p.slot").alias("slot"))
    return (
        probes.join(F.broadcast(sketch), ["row", "slot"])
        .groupBy(value_col)
        .agg(F.min("cnt").alias("est"))
    )


def cms_slot_sql(expr: str, row: int, width: int) -> str:
    """DuckDB text for cms_slot (oracle parity)."""
    from peerdb_spark.functions.hashing import h64_seeded_sql

    return f"CAST({h64_seeded_sql(expr, 1000 + row)} % {width} AS INT)"


def hll_registers(
    df: DataFrame, value_col: str, p: int = 8, seed: int = 7
) -> DataFrame:
    """HyperLogLog register table: bucket = low p bits of the 60-bit hash,
    register = max leading-zero-run (+1) of the remaining 60-p bits.

    Returns (bucket, rho) — at most 2^p rows via hash agg with map-side
    partials, mergeable by max over bucket (hll_merge). The ESTIMATE is
    computed driver/test-side from the registers (harmonic mean needs
    float summation whose order the oracle cannot pin; the registers
    themselves are bit-deterministic, so the declared query certifies the
    sketch build and leaves the final scalar to the caller — same split as
    the reference's deferred-dedup normalize).
    """
    h = h64_seeded(F.col(value_col), seed)
    bucket = (h % (1 << p)).cast("int")
    # high bits via shiftright — NOT `/`: Spark `/` is double division,
    # inexact above 2^53, and the truncation would disagree with the
    # oracle's integer floor for large hashes
    rest = F.shiftright(h, p)
    bits = 60 - p
    # leading-zero count of `rest` within `bits` width: bits - bit_length.
    # bit_length(x) for x>0 = length of the binary string (exact, JVM-side;
    # no log, no clz needed).
    bl = F.when(rest == 0, F.lit(0)).otherwise(F.length(F.bin(rest)))
    rho = (F.lit(bits) - bl + 1).cast("int")
    return (
        df.select(bucket.alias("bucket"), rho.alias("_rho"))
        .groupBy("bucket")
        .agg(F.max("_rho").alias("rho"))
    )


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Merge register tables built with the same (p, seed): max per bucket."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("bucket").agg(F.max("rho").alias("rho"))


def hll_estimate(registers: list[tuple[int, int]], p: int = 8) -> float:
    """Driver-side HLL estimate from collected (bucket, rho) registers
    (standard bias-corrected harmonic mean; small-range LinearCounting)."""
    import math

    m = 1 << p
    regs = dict(registers)
    zeros = m - len(regs)
    s = zeros * 1.0 + sum(2.0 ** (-r) for r in regs.values())
    alpha = 0.7213 / (1 + 1.079 / m) if m >= 128 else 0.697
    est = alpha * m * m / s
    if est <= 2.5 * m and zeros:
        est = m * math.log(m / zeros)
    return est


def hll_registers_sql(src: str, value_expr: str, p: int = 8, seed: int = 7) -> str:
    """DuckDB oracle text for hll_registers."""
    from peerdb_spark.functions.hashing import h64_seeded_sql

    h = h64_seeded_sql(value_expr, seed)
    bits = 60 - p
    rest = f"(({h}) >> {p})"
    return f"""
SELECT CAST({h} % {1 << p} AS INT) AS bucket,
       CAST(max({bits} - (CASE WHEN {rest} = 0 THEN 0
                ELSE length(bin({rest})) END) + 1) AS INT) AS rho
FROM {src} GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Bloom filter — mergeable set-membership sketch
# ---------------------------------------------------------------------------
#
# The incremental-ingestion primitive the CDC/corpus layers lean on at scale:
# "have we ever seen this key/document before?" answered from m bits instead
# of a full anti-join against the accumulated corpus. k seeded 60-bit hashes
# (functions/hashing.py — cross-engine md5 core) set k bits; a membership
# probe ANDs them. No false negatives ever; false positives at rate
# ~(1 - e^(-kn/m))^k. Reference parity: beyond the reference's surface
# (SURVEY §2.5 — it has no approximate aggregates); this belongs to the
# training-data-pipeline layer next to HLL/CMS above.
#
# Engine shape: the filter is a DataFrame of (word, bits) — m/32 words of
# 32 bits each packed into BIGINTs (bit 31 max keeps every word positive, so
# Spark and DuckDB agree without two's-complement edge cases). Build is one
# explode (k cells/row) + one bit_or hash agg with map-side partials; two
# filters over the same (k, m) merge by re-OR-ing — every executor can build
# a partial filter independently, the same mergeability argument as CMS/HLL.

_BLOOM_SEED = 9000
_WORD = 32


def bloom_positions(col: Column, k: int, m_bits: int) -> list[Column]:
    """The k bit positions of a value (seeded 60-bit hash mod m)."""
    return [
        (h64_seeded(col, _BLOOM_SEED + i) % m_bits).cast("int") for i in range(k)
    ]


def _pos_to_word_bit(pos: Column) -> tuple[Column, Column]:
    return F.shiftright(pos, 5), pos.bitwiseAND(F.lit(_WORD - 1))


def bloom_build(df: DataFrame, value_col: str, k: int = 4, m_bits: int = 8192) -> DataFrame:
    """Build a Bloom filter over a column: returns (word, bits) rows.

    m_bits must be a multiple of 32. Output is at most m/32 rows regardless
    of input size; absent words are implicitly zero (the probe treats a
    missing word as no-bits-set)."""
    assert m_bits % _WORD == 0
    c = F.col(value_col)
    # NULL values hash to NULL positions and would emit a garbage NULL word;
    # a NULL is "no value" — skip it (probe NULLs report maybe=NULL likewise)
    pos = df.where(c.isNotNull()).select(
        F.explode(F.array(*bloom_positions(c, k, m_bits))).alias("pos")
    )
    word, bit = _pos_to_word_bit(F.col("pos"))
    return (
        pos.select(word.alias("word"), bit.alias("_bit"))
        # column-amount shifts need the SQL expression form (the Python
        # wrapper only takes int literals)
        .select("word", F.expr("shiftleft(CAST(1 AS BIGINT), _bit)").alias("_m"))
        .groupBy("word")
        .agg(F.bit_or("_m").alias("bits"))
    )


def bloom_merge(*filters: DataFrame) -> DataFrame:
    """Merge filters built with identical (k, m): OR words."""
    out = filters[0]
    for s in filters[1:]:
        out = out.unionByName(s)
    return out.groupBy("word").agg(F.bit_or("bits").alias("bits"))


def bloom_probe(
    bloom: DataFrame, items: DataFrame, value_col: str, k: int = 4, m_bits: int = 8192
) -> DataFrame:
    """Membership probe: returns (value_col, maybe) with maybe ∈ {0,1}.

    maybe=1 iff all k bits are set — guaranteed 1 for every inserted value
    (no false negatives). The filter is ≤ m/32 rows → broadcast equi-join;
    a probe word absent from the filter means those bits are zero."""
    c = F.col(value_col)
    probes = items.select(
        value_col,
        F.explode(F.array(*bloom_positions(c, k, m_bits))).alias("pos"),
    )
    word, bit = _pos_to_word_bit(F.col("pos"))
    probes = probes.select(value_col, word.alias("word"), bit.alias("bit"))
    hit = F.expr("shiftright(coalesce(bits, CAST(0 AS BIGINT)), bit) & CAST(1 AS BIGINT)")
    return (
        probes.join(F.broadcast(bloom), "word", "left")
        .select(value_col, hit.alias("_hit"))
        .groupBy(value_col)
        .agg(F.min("_hit").cast("long").alias("maybe"))
    )


def bloom_pos_sql(expr: str, i: int, m_bits: int) -> str:
    """DuckDB text for bit position i of a value (oracle parity)."""
    from peerdb_spark.functions.hashing import h64_seeded_sql

    return f"CAST({h64_seeded_sql(expr, _BLOOM_SEED + i)} % {m_bits} AS INT)"

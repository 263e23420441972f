"""Canonical type system: QValue kinds ↔ Spark types.

Reference behavior (studied, not copied):
- kind list: flow/shared/types/kind.go:9-67
- numeric precision/scale derivation: flow/model/qvalue/kind.go:23-40
  (ClickHouse max precision 76, past-destination-precision falls back to String)
- ClickHouse date/timestamp clamping: flow/connectors/clickhouse/normalize_query.go:81-110
- destination mapping tables: flow/model/qvalue/kind.go:73-170

Spark mapping is the SURVEY §1.2 table, verbatim.

Parse/convert paths for the exotic text formats these kinds carry (interval,
hstore, TIMETZ, inet/cidr/macaddr, hex-WKB geometry) live in
functions/exotic.py — pure built-in expressions mirroring
qvalue_convert.go + shared/datatypes.
"""

from __future__ import annotations

from enum import Enum

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


class QKind(str, Enum):
    """Canonical scalar kinds (ref: flow/shared/types/kind.go:9-67)."""

    INVALID = "invalid"
    FLOAT32 = "float32"
    FLOAT64 = "float64"
    INT8 = "int8"
    INT16 = "int16"
    INT32 = "int32"
    INT64 = "int64"
    INT256 = "int256"
    UINT8 = "uint8"
    UINT16 = "uint16"
    UINT32 = "uint32"
    UINT64 = "uint64"
    UINT256 = "uint256"
    BOOL = "bool"
    QCHAR = "qchar"
    STRING = "string"
    ENUM = "enum"
    TIMESTAMP = "timestamp"
    TIMESTAMPTZ = "timestamptz"
    DATE = "date"
    TIME = "time"
    TIMETZ = "timetz"
    INTERVAL = "interval"
    NUMERIC = "numeric"
    BYTES = "bytes"
    UUID = "uuid"
    JSON = "json"
    JSONB = "jsonb"
    HSTORE = "hstore"
    GEOGRAPHY = "geography"
    GEOMETRY = "geometry"
    POINT = "point"
    CIDR = "cidr"
    INET = "inet"
    MACADDR = "macaddr"
    # array kinds are ARRAY_<elem>; represented via array_of()


# Maximum Spark decimal precision; wider values fall back to string,
# mirroring the reference's ClickHouse >76-digit → String fallback
# (flow/model/qvalue/kind.go:26-33).
MAX_DECIMAL_PRECISION = 38
DEFAULT_NUMERIC = (38, 18)

_SCALAR_SPARK: dict[QKind, T.DataType] = {
    QKind.FLOAT32: T.FloatType(),
    QKind.FLOAT64: T.DoubleType(),
    QKind.INT8: T.ShortType(),
    QKind.INT16: T.ShortType(),
    QKind.INT32: T.IntegerType(),
    QKind.INT64: T.LongType(),
    QKind.UINT8: T.IntegerType(),
    QKind.UINT16: T.IntegerType(),
    QKind.UINT32: T.LongType(),
    QKind.UINT64: T.DecimalType(38, 0),
    QKind.INT256: T.StringType(),
    QKind.UINT256: T.StringType(),
    QKind.BOOL: T.BooleanType(),
    QKind.QCHAR: T.StringType(),
    QKind.STRING: T.StringType(),
    QKind.ENUM: T.StringType(),
    QKind.TIMESTAMP: T.TimestampNTZType(),
    QKind.TIMESTAMPTZ: T.TimestampType(),
    QKind.DATE: T.DateType(),
    QKind.TIME: T.StringType(),
    QKind.TIMETZ: T.StringType(),
    QKind.INTERVAL: T.StringType(),
    QKind.BYTES: T.BinaryType(),
    QKind.UUID: T.StringType(),
    QKind.JSON: T.StringType(),
    QKind.JSONB: T.StringType(),
    QKind.HSTORE: T.StringType(),
    QKind.GEOGRAPHY: T.StringType(),
    QKind.GEOMETRY: T.StringType(),
    QKind.POINT: T.StringType(),
    QKind.CIDR: T.StringType(),
    QKind.INET: T.StringType(),
    QKind.MACADDR: T.StringType(),
}


def spark_type(kind: QKind, precision: int | None = None, scale: int | None = None) -> T.DataType:
    """Spark type for a canonical kind. NUMERIC honors (precision, scale) with
    the >38-digit string fallback (ref: flow/model/qvalue/kind.go:23-40)."""
    if kind == QKind.NUMERIC:
        p, s = numeric_destination(precision, scale)
        if p is None:
            return T.StringType()
        return T.DecimalType(p, s)
    return _SCALAR_SPARK[kind]


def array_of(kind: QKind, **kw) -> T.ArrayType:
    return T.ArrayType(spark_type(kind, **kw))


def numeric_destination(
    precision: int | None, scale: int | None
) -> tuple[int | None, int | None]:
    """Resolve a numeric typmod to a destination (precision, scale).

    Mirrors GetNumericDestinationType semantics: unparameterized numeric →
    engine default; precision beyond the destination max → string fallback
    (returned as (None, None)). Ref: flow/model/qvalue/kind.go:23-40.
    """
    if precision is None or precision <= 0:
        return DEFAULT_NUMERIC
    if precision > MAX_DECIMAL_PRECISION:
        return (None, None)
    s = scale if scale is not None and 0 <= scale <= precision else 0
    return (precision, s)


# ---------------------------------------------------------------------------
# Value clamping / truncation (generated-query scalar transforms)
# ---------------------------------------------------------------------------

# ClickHouse-compatible ranges (ref: flow/connectors/clickhouse/normalize_query.go:81-110)
DATE_MIN = "1900-01-01"
DATE_MAX = "2299-12-31"
TS_MIN = "1900-01-01 00:00:00"
TS_MAX = "2299-12-31 23:59:59.999999"


def clamp_date(col: Column) -> Column:
    """Clamp dates into [1900-01-01, 2299-12-31] (ref: normalize_query.go:81-96)."""
    lo, hi = F.to_date(F.lit(DATE_MIN)), F.to_date(F.lit(DATE_MAX))
    return F.when(col < lo, lo).when(col > hi, hi).otherwise(col)


def clamp_timestamp(col: Column) -> Column:
    """Clamp timestamps into the DateTime64-safe range (ref: normalize_query.go:97-110)."""
    lo, hi = F.to_timestamp(F.lit(TS_MIN)), F.to_timestamp(F.lit(TS_MAX))
    return F.when(col < lo, lo).when(col > hi, hi).otherwise(col)


def truncate_numeric(col: Column, precision: int, scale: int) -> Column:
    """Cast to the destination decimal; out-of-range → NULL (try_cast — ANSI
    mode would error), counted by the caller via an observation/accumulator
    (ref: flow/model/numeric_truncator.go)."""
    return col.try_cast(T.DecimalType(precision, scale))


def qkind_for_spark_type(dt: T.DataType) -> QKind:
    """Inverse mapping used by schema inference on parquet sources."""
    if isinstance(dt, T.ShortType):
        return QKind.INT16
    if isinstance(dt, T.IntegerType):
        return QKind.INT32
    if isinstance(dt, T.LongType):
        return QKind.INT64
    if isinstance(dt, T.FloatType):
        return QKind.FLOAT32
    if isinstance(dt, T.DoubleType):
        return QKind.FLOAT64
    if isinstance(dt, T.BooleanType):
        return QKind.BOOL
    if isinstance(dt, T.DecimalType):
        return QKind.NUMERIC
    if isinstance(dt, T.TimestampNTZType):
        return QKind.TIMESTAMP
    if isinstance(dt, T.TimestampType):
        return QKind.TIMESTAMPTZ
    if isinstance(dt, T.DateType):
        return QKind.DATE
    if isinstance(dt, T.BinaryType):
        return QKind.BYTES
    return QKind.STRING

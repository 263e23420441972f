"""Typed script-surface bridge: the reference's Lua helper library, in Python.

Reference behavior (studied, not copied): PeerDB row scripts run in a Lua
state pre-loaded with a `peerdb` helper table and typed userdata wrappers —
`flow/pua/peerdb.go:32-121` RegisterTypes installs Row/Record/UUID/Time/
BigInt/Decimal metatables plus `peerdb.{Now,UUID,Decimal,Time,type,tostring,
RowTable,RowColumns,RowColumnKind,unix_epoch}`; the queue connectors call the
script's `onRecord(record)` per CDC record and normalize its return value to
a queue record (`flow/connectors/kafka/kafka.go:173-220` lvalueToKafkaRecord:
nil = skip, string = value-only, table = {key,value,topic,partition,headers});
`flow/connectors/utils/lua.go:82-95` DefaultOnRecord JSON-encodes DML records
when no script is configured.

This module is the same surface for Python callables, so a reference Lua
script ports 1:1 (`function onRecord(r) return r.row and r.row.val end` →
`lambda r: r.row and r.row.val`):

- `Row`: attribute AND item access (`r.row.val` / `r.row["val"]`), mutation,
  `len()`, iteration — LuaRowIndex/LuaRowNewIndex/LuaRowLen semantics.
- `Record`: `.kind/.row/.old/.new/.checkpoint/.commit_time/.target/.source/
  .unchanged_columns/.prefix/.content` + `.json()` — LuaRecordIndex (row =
  post-image or None for deletes; old = pre-image or delete image — the
  reference's exact aliasing, peerdb.go:488-513).
- `Uuid` / `ScriptTime`: byte indexing / the unix_* + calendar accessors
  (LuaUuidIndex, LuaTimeIndex). `BigInt` is Python int natively (documented
  divergence: no 64-bit boxing needed); `peerdb.Decimal` is
  `decimal.Decimal` with the reference's accessor names via `dec_*` helpers.
- `peerdb` namespace object with the RegisterTypes entries.
- `result_to_kafka`: lvalueToKafkaRecord's normalization incl. its error
  cases; `default_on_record`: DefaultOnRecord.
- `apply_script(raw_df, on_record, ...)`: the LuaPool equivalent — an
  Arrow-batched mapInPandas over raw CDC rows producing the Kafka writer
  contract (key/value/topic/partition/headers), feedable straight into
  `sinks.write_kafka` / `kafka_wire.deliver_kafka_wire`. Scripts are
  arbitrary Python, so this is necessarily the Python path — same as the
  reference, whose Lua pool is also interpreter-side; batch columns arrive
  via Arrow, and record-at-a-time work happens only inside the batch loop.
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import json
import uuid as _uuid
from collections.abc import Callable, Iterator
from typing import Any

from pyspark.sql import DataFrame

KIND_NAMES = {0: "insert", 1: "update", 2: "delete", 3: "relation", 4: "message"}


class Row:
    """Mutable column→value mapping with attribute access.

    LuaRowIndex/LuaRowNewIndex/LuaRowLen/LuaRowTable (peerdb.go:158-450):
    reads return the typed value (absent column → error, like GetValueByColName),
    writes replace the value, `len` counts columns."""

    __slots__ = ("_cols",)

    def __init__(self, cols: dict[str, Any]):
        object.__setattr__(self, "_cols", dict(cols))

    def __getitem__(self, col: str) -> Any:
        try:
            return self._cols[col]
        except KeyError:
            raise KeyError(f"invalid col: {col}") from None

    def __getattr__(self, col: str) -> Any:
        try:
            return self._cols[col]
        except KeyError:
            raise AttributeError(f"invalid col: {col}") from None

    def __setitem__(self, col: str, val: Any) -> None:
        self._cols[col] = val

    def __setattr__(self, col: str, val: Any) -> None:
        self._cols[col] = val

    def __len__(self) -> int:
        return len(self._cols)

    def __iter__(self):
        return iter(self._cols)

    def __contains__(self, col: str) -> bool:
        return col in self._cols

    def columns(self) -> list[str]:
        """peerdb.RowColumns."""
        return list(self._cols)

    def table(self) -> dict[str, Any]:
        """peerdb.RowTable — plain dict copy."""
        return dict(self._cols)

    def column_kind(self, col: str) -> str:
        """peerdb.RowColumnKind. The reference returns the QValueKind tag;
        rows here come from the raw JSON stage, so the kind is the JSON
        type name (documented divergence — the wire type is authoritative
        upstream in types.py)."""
        v = self[col]
        if v is None:
            return "null"
        if isinstance(v, bool):
            return "bool"
        if isinstance(v, int):
            return "int64"
        if isinstance(v, float):
            return "float64"
        if isinstance(v, str):
            return "string"
        if isinstance(v, (list, tuple)):
            return "array"
        return "json"

    def __repr__(self) -> str:  # pragma: no cover
        return f"Row({self._cols!r})"


class Uuid:
    """LuaUuid: byte-indexable, canonical string form, equality
    (peerdb.go:573-605)."""

    __slots__ = ("_u",)

    def __init__(self, value: str | bytes | _uuid.UUID | None = None):
        if value is None:
            self._u = _uuid.uuid4()
        elif isinstance(value, _uuid.UUID):
            self._u = value
        elif isinstance(value, bytes):
            self._u = _uuid.UUID(bytes=value)
        elif isinstance(value, str):
            self._u = _uuid.UUID(value)
        else:
            raise TypeError("uuid must be created from string")

    def __getitem__(self, i: int) -> int:
        if 0 <= i < 16:
            return self._u.bytes[i]
        raise IndexError(i)

    @property
    def bytes(self) -> bytes:
        """msgpack form (LuaUuidMsgpack: raw 16 bytes)."""
        return self._u.bytes

    def __str__(self) -> str:
        return str(self._u)

    def __eq__(self, other) -> bool:
        return isinstance(other, Uuid) and self._u == other._u

    def __hash__(self) -> int:
        return hash(self._u)

    def __repr__(self) -> str:  # pragma: no cover
        return f"Uuid('{self._u}')"


class ScriptTime:
    """LuaTime: nanosecond-precision instant with the reference's accessor
    set (peerdb.go:684-744). Backed by integer epoch nanos — Python
    datetime is micros-only, and the reference exposes unix_nano."""

    __slots__ = ("_ns",)

    def __init__(self, ns: int):
        self._ns = int(ns)

    @classmethod
    def from_value(cls, v) -> "ScriptTime":
        """LVAsTime: number = epoch seconds (fractional ok), datetime, or
        passthrough (peerdb.go:164-176)."""
        if isinstance(v, ScriptTime):
            return v
        if isinstance(v, (int, float)):
            return cls(round(v * 1_000_000_000))
        if isinstance(v, _dt.datetime):
            if v.tzinfo is None:
                v = v.replace(tzinfo=_dt.timezone.utc)
            return cls(round(v.timestamp() * 1_000_000) * 1000)
        raise TypeError(f"Cannot convert {type(v).__name__} to time")

    @property
    def unix_nano(self) -> int:
        return self._ns

    @property
    def unix_micro(self) -> int:
        return self._ns // 1000

    @property
    def unix_milli(self) -> int:
        return self._ns // 1_000_000

    @property
    def unix_second(self) -> int:
        return self._ns // 1_000_000_000

    @property
    def unix(self) -> float:
        return self._ns / 1e9

    @property
    def nanosecond(self) -> int:
        return self._ns % 1_000_000_000

    def _dtv(self) -> _dt.datetime:
        return _dt.datetime.fromtimestamp(
            self._ns // 1_000_000_000, tz=_dt.timezone.utc
        )

    @property
    def year(self) -> int:
        return self._dtv().year

    @property
    def month(self) -> int:
        return self._dtv().month

    @property
    def day(self) -> int:
        return self._dtv().day

    @property
    def yearday(self) -> int:
        return self._dtv().timetuple().tm_yday

    @property
    def hour(self) -> int:
        return self._dtv().hour

    @property
    def minute(self) -> int:
        return self._dtv().minute

    @property
    def second(self) -> int:
        return self._dtv().second

    def __str__(self) -> str:
        frac = self._ns % 1_000_000_000
        base = self._dtv().strftime("%Y-%m-%d %H:%M:%S")
        return f"{base}.{frac:09d} +0000 UTC" if frac else f"{base} +0000 UTC"

    def __eq__(self, other) -> bool:
        return isinstance(other, ScriptTime) and self._ns == other._ns

    def __le__(self, other: "ScriptTime") -> bool:
        return self._ns <= other._ns

    def __lt__(self, other: "ScriptTime") -> bool:
        return self._ns < other._ns

    def __hash__(self) -> int:
        return hash(self._ns)

    def __repr__(self) -> str:  # pragma: no cover
        return f"ScriptTime({self._ns})"


def dec_coefficient(d: _decimal.Decimal) -> int:
    """LuaDecimalIndex 'coefficient' — unscaled integer (sign included)."""
    sign, digits, _exp = d.as_tuple()
    coeff = int("".join(map(str, digits)) or "0")
    return -coeff if sign else coeff


def dec_exponent(d: _decimal.Decimal) -> int:
    return d.as_tuple().exponent


def dec_int64(d: _decimal.Decimal) -> int:
    """'int64' — integer part (IntPart truncates toward zero)."""
    return int(d.to_integral_value(rounding=_decimal.ROUND_DOWN))


def dec_float64(d: _decimal.Decimal) -> float:
    return float(d)


class Record:
    """LuaRecordIndex surface over a raw CDC row (peerdb.go:476-550).

    `row` = the record's current items (post-image; None for deletes with
    no image semantics — here delete rows carry the match/old image, which
    the reference exposes via `old`, not `row`... studied exactly:
    record.GetItems() for deletes IS the deleted row, so `row` mirrors
    that); `old` = pre-update image, or the delete image; `new` = insert/
    update post-image only."""

    __slots__ = (
        "kind_code", "_data", "_old_data", "checkpoint", "_commit_ts_us",
        "target", "source", "_unchanged", "transaction_id",
    )

    def __init__(
        self,
        kind_code: int,
        data: str | None,
        old_data: str | None,
        checkpoint: int | None,
        commit_ts_us: int | None,
        target: str | None,
        source: str | None = None,
        unchanged: str | None = None,
        transaction_id: int | None = None,
    ):
        self.kind_code = kind_code
        self._data = data
        self._old_data = old_data
        self.checkpoint = checkpoint
        self._commit_ts_us = commit_ts_us
        self.target = target
        # raw rows key on destination; source name is not staged (documented)
        self.source = source if source is not None else target
        self._unchanged = unchanged
        self.transaction_id = transaction_id

    @property
    def kind(self) -> str:
        return KIND_NAMES.get(self.kind_code, "message")

    @staticmethod
    def _parse(j: str | None) -> Row | None:
        if not j:
            return None
        try:
            v = json.loads(j)
        except ValueError:
            return None
        return Row(v) if isinstance(v, dict) else None

    @property
    def row(self) -> Row | None:
        """GetItems(): the record's items — post-image for insert/update,
        the deleted image for deletes (delete records stage it in match
        data here)."""
        if self.kind_code == 2:
            return self._parse(self._old_data) or self._parse(self._data)
        return self._parse(self._data)

    @property
    def old(self) -> Row | None:
        """Update pre-image, or the delete image (peerdb.go:488-500)."""
        if self.kind_code in (1, 2):
            return self._parse(self._old_data) or (
                self._parse(self._data) if self.kind_code == 2 else None
            )
        return None

    @property
    def new(self) -> Row | None:
        """Insert/update post-image only (peerdb.go:501-513)."""
        if self.kind_code in (0, 1):
            return self._parse(self._data)
        return None

    @property
    def commit_time(self) -> ScriptTime | None:
        if self._commit_ts_us is None:
            return None
        return ScriptTime(self._commit_ts_us * 1000)

    @property
    def unchanged_columns(self) -> dict[str, bool] | None:
        """Update-only set of unchanged-TOAST columns, as the reference's
        name→true table (peerdb.go:525-533)."""
        if self.kind_code != 1:
            return None
        if not self._unchanged:
            return {}
        return {c: True for c in self._unchanged.split(",") if c}

    # message records (logical-decoding messages): staged with the payload
    # JSON carrying prefix/content keys
    @property
    def prefix(self) -> str | None:
        if self.kind_code == 4:
            r = self._parse(self._data)
            return r["prefix"] if r and "prefix" in r else None
        return None

    @property
    def content(self) -> str | None:
        if self.kind_code == 4:
            r = self._parse(self._data)
            return r["content"] if r and "content" in r else None
        return None

    def json(self) -> str:
        """LuaRecordJson: the 7-key envelope (+unchanged_columns list on
        updates with a non-empty set) — peerdb.go:552-571."""
        env: dict[str, Any] = {
            "kind": self.kind,
            "old": self.old.table() if self.old else None,
            "new": self.new.table() if self.new else None,
            "checkpoint": self.checkpoint,
            "commit_time": str(self.commit_time) if self.commit_time else None,
            "transaction_id": self.transaction_id,
            "source": self.source,
        }
        uc = self.unchanged_columns
        if self.kind_code == 1 and uc:
            env["unchanged_columns"] = sorted(uc)
        return json.dumps(env, default=str)


class _PeerdbNamespace:
    """The `peerdb` helper table (RegisterTypes, peerdb.go:110-121)."""

    unix_epoch = ScriptTime(0)

    @staticmethod
    def Now() -> ScriptTime:
        import time as _time

        return ScriptTime(_time.time_ns())

    @staticmethod
    def UUID(value: str | bytes | None = None) -> Uuid:
        return Uuid(value)

    @staticmethod
    def Decimal(value) -> _decimal.Decimal:
        """LuaParseDecimal/LVAsDecimal: number, string, int, or Decimal."""
        if isinstance(value, _decimal.Decimal):
            return value
        if isinstance(value, bool):
            raise TypeError("cannot create decimal from bool")
        if isinstance(value, float):
            # NewFromFloat: shortest-repr semantics, not binary expansion
            return _decimal.Decimal(repr(value))
        if isinstance(value, (int, str)):
            try:
                return _decimal.Decimal(value)
            except _decimal.InvalidOperation:
                raise ValueError(f"can't convert {value} to decimal") from None
        raise TypeError(f"cannot create decimal from {type(value).__name__}")

    @staticmethod
    def Time(value=None) -> ScriptTime:
        if value is None:
            return ScriptTime(0)
        return ScriptTime.from_value(value)

    @staticmethod
    def type(v) -> str | None:
        """LuaType: the wrapped type's name for bridge types, None for
        plain values (the reference returns nothing for non-userdata)."""
        if isinstance(v, (Uuid, ScriptTime, Row, Record, _decimal.Decimal)):
            return type(v).__name__
        return None

    @staticmethod
    def tostring(v) -> str | None:
        if isinstance(v, (Uuid, ScriptTime, Row, Record, _decimal.Decimal)):
            return str(v)
        return None

    RowTable = staticmethod(lambda row: row.table())
    RowColumns = staticmethod(lambda row: row.columns())
    RowColumnKind = staticmethod(lambda row, col: row.column_kind(col))


peerdb = _PeerdbNamespace()


def default_on_record(record: Record) -> str | None:
    """DefaultOnRecord (utils/lua.go:82-95): JSON-encode DML records,
    skip relation/message records."""
    if record.kind_code in (0, 1, 2):
        return record.json()
    return None


def _as_bytes(x, what: str) -> bytes | None:
    """LVAsReadOnlyBytes: nil/string/bytes accepted, else error."""
    if x is None:
        return None
    if isinstance(x, bytes):
        return x
    if isinstance(x, str):
        return x.encode()
    if isinstance(x, (Uuid,)):
        return x.bytes
    raise TypeError(f"invalid {what}, cannot convert {type(x).__name__} to bytes")


def result_to_kafka(result, default_topic: str) -> dict | None:
    """lvalueToKafkaRecord (kafka.go:173-220): None = skip; str/bytes =
    value-only record; dict = {key,value,topic,partition,headers}. The
    empty-topic fallback to the record's destination table happens at the
    call site in the reference (kafka.go:376-378) — folded in here via
    default_topic."""
    if result is None or result is False:
        return None
    if isinstance(result, (str, bytes)):
        return {
            "key": None,
            "value": result.encode() if isinstance(result, str) else result,
            "topic": default_topic,
            "partition": 0,
            "headers": [],
        }
    if isinstance(result, dict):
        headers_in = result.get("headers")
        headers: list[tuple[str, bytes | None]] = []
        if headers_in is not None:
            if not isinstance(headers_in, dict):
                raise TypeError(
                    f"invalid headers, must be nil or table: {headers_in!r}"
                )
            for hk, hv in headers_in.items():
                try:
                    hval = _as_bytes(hv, "header")
                except TypeError as e:
                    # reference stores the conversion error AS the value
                    hval = str(e).encode()
                headers.append((str(hk), hval))
        topic = result.get("topic")
        if topic is not None and not isinstance(topic, str):
            raise TypeError(f"invalid topic, {topic!r}")
        return {
            "key": _as_bytes(result.get("key"), "key"),
            "value": _as_bytes(result.get("value"), "value"),
            "topic": topic or default_topic,
            "partition": int(result.get("partition") or 0),
            "headers": headers,
        }
    raise TypeError(f"script returned invalid value: {result!r}")


def apply_script(
    raw_df: DataFrame,
    on_record: Callable[[Record], Any] | None = None,
    fallback_topic: str = "",
) -> DataFrame:
    """Run the script surface over a raw CDC batch → Kafka contract rows.

    The LuaPool equivalent (kafka.go:239-420 createPool + per-record
    invoke): Arrow-batched mapInPandas, one `Record` per raw row, script
    return values normalized by result_to_kafka, skips (None) dropped.
    Topic defaults to the record's destination table (kafka.go:376-378).

    Output: key BINARY, value BINARY, topic STRING, partition INT,
    headers array<struct<key,value>> — `sinks` / `kafka_wire` contract."""
    import pandas as pd
    from pyspark.sql import types as T

    fn = on_record if on_record is not None else default_on_record
    cols = dict(
        kind="_peerdb_record_type",
        data="_peerdb_data",
        old="_peerdb_match_data",
        ts="_peerdb_timestamp",
        dst="_peerdb_destination_table_name",
        unchanged="_peerdb_unchanged_toast_columns",
    )
    ckpt_col = "_peerdb_checkpoint_id"
    have = set(raw_df.columns)
    missing = [c for c in cols.values() if c not in have]
    if missing:
        raise ValueError(f"apply_script needs raw CDC columns, missing {missing}")

    out_schema = T.StructType(
        [
            T.StructField("key", T.BinaryType()),
            T.StructField("value", T.BinaryType()),
            T.StructField("topic", T.StringType()),
            T.StructField("partition", T.IntegerType()),
            T.StructField(
                "headers",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("key", T.StringType()),
                            T.StructField("value", T.BinaryType()),
                        ]
                    )
                ),
            ),
        ]
    )
    has_ckpt = ckpt_col in have

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out: list[tuple] = []
            for i in range(len(pdf)):
                r = pdf.iloc[i]
                dst = r[cols["dst"]]
                rec = Record(
                    kind_code=int(r[cols["kind"]]),
                    data=r[cols["data"]],
                    old_data=r[cols["old"]],
                    checkpoint=int(r[ckpt_col]) if has_ckpt and r[ckpt_col] is not None else None,
                    commit_ts_us=int(r[cols["ts"]]) if r[cols["ts"]] is not None else None,
                    target=dst,
                    unchanged=r[cols["unchanged"]],
                )
                kr = result_to_kafka(fn(rec), dst or fallback_topic)
                if kr is None:
                    continue
                out.append(
                    (
                        kr["key"],
                        kr["value"],
                        kr["topic"] or fallback_topic,
                        kr["partition"],
                        [{"key": hk, "value": hv} for hk, hv in kr["headers"]],
                    )
                )
            yield pd.DataFrame(
                out, columns=["key", "value", "topic", "partition", "headers"]
            )

    return raw_df.mapInPandas(run, out_schema)

"""pgoutput logical-replication decoder: Postgres WAL binary messages →
canonical changelog rows.

The wire grammar is the PUBLIC pgoutput protocol (PostgreSQL docs,
"Logical Streaming Replication Protocol" / protocol message formats):
  'B' Begin    : final_lsn u64, commit_ts i64 (µs since 2000-01-01), xid u32
  'C' Commit   : flags u8, commit_lsn u64, end_lsn u64, commit_ts i64
  'R' Relation : oid u32, namespace cstr, relname cstr, replident u8,
                 ncols u16, [flags u8, colname cstr, type_oid u32, typmod i32]
  'I' Insert   : oid u32, 'N', TupleData
  'U' Update   : oid u32, ['K'|'O' TupleData], 'N', TupleData
  'D' Delete   : oid u32, 'K'|'O', TupleData
  'M'/'T'/'Y'/'O' (message/truncate/type/origin): skipped
  TupleData    : ncols u16, per column 'n' (null) | 'u' (unchanged TOAST)
                 | 't' len u32 + text bytes | 'b' len u32 + binary bytes

Reference parity (studied, not copied): flow/connectors/postgres/cdc.go
processes the same message kinds via pglogrepl (cdc.go:1029-1060), tracks
the relation-message mapping (cdc.go:52), maps 'u' tuple columns to
unchanged-TOAST columns and 'K'/'O' old tuples to match data
(cdc.go:247-356), and stamps records with commit timestamp and LSN
checkpoint. Delete old-tuples become the row image (_old_data), exactly as
raw_to_changelog expects.

Execution model: a replication slot is a SEQUENTIAL stream — relation
schemas and the open transaction are running state, so decode order is the
WAL order. The reference decodes on one replication connection per slot;
here `decode_pgoutput` runs the same sequential kernel per slot via
applyInPandas grouped on slot id (parallelism across slots/mirrors, exactly
the reference's model). The pure-Python kernel (`PgOutputDecoder`) is
independently testable without Spark.
"""

from __future__ import annotations

import datetime as dt
import json
import struct
from dataclasses import dataclass, field

# pgoutput timestamps: microseconds since 2000-01-01 UTC
_PG_EPOCH = dt.datetime(2000, 1, 1)


@dataclass
class _Relation:
    oid: int
    namespace: str
    name: str
    columns: list[str] = field(default_factory=list)
    key_flags: list[bool] = field(default_factory=list)  # part of replica identity

    @property
    def qualified(self) -> str:
        return f"{self.namespace}.{self.name}" if self.namespace else self.name


class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def u8(self) -> int:
        v = self.buf[self.pos]
        self.pos += 1
        return v

    def u16(self) -> int:
        (v,) = struct.unpack_from(">H", self.buf, self.pos)
        self.pos += 2
        return v

    def u32(self) -> int:
        (v,) = struct.unpack_from(">I", self.buf, self.pos)
        self.pos += 4
        return v

    def i32(self) -> int:
        (v,) = struct.unpack_from(">i", self.buf, self.pos)
        self.pos += 4
        return v

    def u64(self) -> int:
        (v,) = struct.unpack_from(">Q", self.buf, self.pos)
        self.pos += 8
        return v

    def i64(self) -> int:
        (v,) = struct.unpack_from(">q", self.buf, self.pos)
        self.pos += 8
        return v

    def cstr(self) -> str:
        end = self.buf.index(b"\x00", self.pos)
        s = self.buf[self.pos:end].decode("utf-8")
        self.pos = end + 1
        return s

    def take(self, n: int) -> bytes:
        b = self.buf[self.pos:self.pos + n]
        self.pos += n
        return b


def _read_tuple(r: _Reader) -> list[tuple[str, bytes | None]]:
    """TupleData → [(kind, value_bytes)]; kind ∈ n/u/t/b."""
    ncols = r.u16()
    out = []
    for _ in range(ncols):
        kind = chr(r.u8())
        if kind in ("n", "u"):
            out.append((kind, None))
        elif kind in ("t", "b"):
            ln = r.u32()
            out.append((kind, r.take(ln)))
        else:
            raise ValueError(f"bad TupleData column kind: {kind!r}")
    return out


class PgOutputDecoder:
    """Sequential pgoutput stream decoder (one replication slot's order).

    feed(lsn, payload) yields zero or more change dicts in CHANGELOG_SCHEMA
    shape. Relation messages mutate the schema mapping; Begin/Commit bracket
    transactions (records are stamped with the Begin's xid + commit_ts, like
    the reference stamps from the stream state)."""

    def __init__(self):
        self.relations: dict[int, _Relation] = {}
        self.xid: int | None = None
        self.commit_ts: dt.datetime | None = None

    def _row_json(self, rel: _Relation, tup) -> str:
        vals = {}
        for (kind, raw), col in zip(tup, rel.columns):
            if kind == "n":
                vals[col] = None
            elif kind == "u":
                continue  # unchanged TOAST: absent from the row image
            elif kind == "t":
                vals[col] = raw.decode("utf-8")
            else:  # 'b' binary → hex text (opaque, like bytea hex form)
                vals[col] = raw.hex()
        return json.dumps(vals)

    def _unchanged(self, rel: _Relation, tup) -> list[str]:
        return [c for (k, _), c in zip(tup, rel.columns) if k == "u"]

    def feed(self, lsn: int, payload: bytes):
        r = _Reader(payload)
        tag = chr(r.u8())
        if tag == "B":
            r.u64()  # final lsn
            self.commit_ts = _PG_EPOCH + dt.timedelta(microseconds=r.i64())
            self.xid = r.u32()
            return
        if tag == "C":
            self.xid = None
            return
        if tag == "R":
            oid = r.u32()
            rel = _Relation(oid, r.cstr(), r.cstr())
            r.u8()  # replica identity
            ncols = r.u16()
            for _ in range(ncols):
                flags = r.u8()
                rel.columns.append(r.cstr())
                rel.key_flags.append(bool(flags & 1))
                r.u32()  # type oid
                r.i32()  # typmod
            self.relations[oid] = rel
            return
        if tag in ("M", "T", "Y", "O"):
            return
        if tag not in ("I", "U", "D"):
            raise ValueError(f"unknown pgoutput message tag: {tag!r}")

        oid = r.u32()
        rel = self.relations.get(oid)
        if rel is None:
            raise ValueError(f"{tag} message for unknown relation oid {oid}")
        old_tup = None
        new_tup = None
        if tag == "I":
            marker = chr(r.u8())
            if marker != "N":
                raise ValueError(f"insert without N tuple: {marker!r}")
            new_tup = _read_tuple(r)
            kind = "insert"
        elif tag == "U":
            marker = chr(r.u8())
            if marker in ("K", "O"):
                old_tup = _read_tuple(r)
                marker = chr(r.u8())
            if marker != "N":
                raise ValueError(f"update without N tuple: {marker!r}")
            new_tup = _read_tuple(r)
            kind = "update"
        else:
            marker = chr(r.u8())
            if marker not in ("K", "O"):
                raise ValueError(f"delete without K/O tuple: {marker!r}")
            old_tup = _read_tuple(r)
            kind = "delete"

        yield {
            "_kind": kind,
            "_checkpoint_id": lsn,
            "_commit_ts": self.commit_ts,
            "_txid": self.xid,
            "_src_table": rel.qualified,
            "_dst_table": rel.qualified,
            "_data": self._row_json(rel, new_tup) if new_tup is not None else None,
            "_old_data": self._row_json(rel, old_tup) if old_tup is not None else None,
            "_unchanged_cols": self._unchanged(rel, new_tup) if new_tup is not None else None,
        }

    def decode_all(self, messages) -> list[dict]:
        """messages: iterable of (lsn, payload) in WAL order."""
        out: list[dict] = []
        for lsn, payload in messages:
            out.extend(self.feed(lsn, payload) or [])
        return out


def decode_pgoutput(messages_df, slot_col: str = "slot", lsn_col: str = "lsn",
                    payload_col: str = "payload"):
    """Distributed decode: DataFrame(slot, lsn, payload binary) → changelog
    rows (CHANGELOG_SCHEMA columns). Each slot's messages decode sequentially
    in WAL (lsn) order inside one applyInPandas group — the slot IS the unit
    of parallelism, matching one-replication-connection-per-slot. The Python
    kernel is the honest choice here: this is binary wire decode, not
    relational work, and it runs Arrow-batched off the hot merge path."""
    from peerdb_spark.cdc import CHANGELOG_SCHEMA

    out_schema = CHANGELOG_SCHEMA

    def _decode(pdf):
        import pandas as pd

        pdf = pdf.sort_values(lsn_col)
        dec = PgOutputDecoder()
        rows = dec.decode_all(zip(pdf[lsn_col], pdf[payload_col]))
        cols = [f.name for f in out_schema.fields]
        if not rows:
            return pd.DataFrame({c: pd.Series(dtype="object") for c in cols})
        return pd.DataFrame(rows, columns=cols)

    return (
        messages_df.select(slot_col, lsn_col, payload_col)
        .groupBy(slot_col)
        .applyInPandas(_decode, schema=out_schema)
    )

"""Operator query-proxy safety layer (reference: flow/switchboard/).

The reference ships Switchboard, a PG-wire proxy for operator debugging
against production peers: queries pass through verbatim, protected by two
safety layers —

1. CheckQuery — in read-only mode, statements are gated by an ALLOWLIST of
   first keywords plus explicit read-only-bypass detection
   (`default_transaction_read_only`, `set_config`, `RESET ALL`,
   `DISCARD ALL`): flow/switchboard/upstream_postgres.go:146-219.
2. Guardrails — row and byte budgets enforced WHILE STREAMING results, so a
   fat-fingered `SELECT *` on a production table stops at the cap instead
   of draining the peer: flow/switchboard/guardrails.go:17-51.

The wire protocol / SCRAM auth are ops plumbing (documented n/a); the
ENGINE-side semantics — statement gating and budgeted result streaming —
land here over the same statement surface the cursors use. The reference's
security model note applies verbatim: this prevents accidental mistakes,
not a motivated attacker.

Byte accounting: the reference counts PG wire DataRow bytes; this engine
streams Rows, so the budget counts the UTF-8 length of each field's string
rendering (NULL = 4, like the text protocol's -1 marker rounded up) — a
deterministic proxy documented here rather than hidden.
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from typing import Any

# flow/switchboard/upstream_postgres.go:146-171 — the statements a read-only
# operator session may run. Everything else (INSERT/UPDATE/DELETE/DDL/COPY/
# GRANT/...) is rejected by omission.
ALLOWED_FIRST_KEYWORDS = frozenset(
    {
        "SELECT",
        "TABLE",
        "VALUES",
        "WITH",
        "EXPLAIN",
        "SHOW",
        "BEGIN",
        "START",
        "COMMIT",
        "END",
        "ROLLBACK",
        "ABORT",
        "SAVEPOINT",
        "RELEASE",
        "SET",
        "RESET",
        "DISCARD",
        "DECLARE",
        "FETCH",
        "MOVE",
        "CLOSE",
        "PREPARE",
        "EXECUTE",
        "DEALLOCATE",
    }
)


class GuardrailError(Exception):
    """A query tripped a safety rule (blocked statement or budget)."""


class Guardrails:
    """Row/byte budgets for one query's result stream (guardrails.go:17-51).

    0 means unlimited, like the reference. Counters reset per query."""

    def __init__(self, max_rows: int = 0, max_bytes: int = 0):
        self.max_rows = max_rows
        self.max_bytes = max_bytes
        self.rows = 0
        self.bytes = 0

    def reset(self) -> None:
        self.rows = 0
        self.bytes = 0

    def add_row(self) -> None:
        self.rows += 1
        if self.max_rows > 0 and self.rows > self.max_rows:
            raise GuardrailError(
                f"row limit exceeded: {self.rows} rows (limit: {self.max_rows})"
            )

    def add_bytes(self, n: int) -> None:
        self.bytes += n
        if self.max_bytes > 0 and self.bytes > self.max_bytes:
            raise GuardrailError(
                f"byte limit exceeded: {self.bytes} bytes (limit: {self.max_bytes})"
            )

    def stats(self) -> tuple[int, int]:
        return self.rows, self.bytes


_DOLLAR_TAG = re.compile(r"\$[A-Za-z_][A-Za-z_0-9]*\$|\$\$")


def split_statements(query: str) -> list[str]:
    """Split a multi-statement string on ';' outside quotes (the engine
    analogue of the reference's pgsplit). Handles single/double quotes with
    '' escaping, line comments, and Postgres dollar-quoting ($$…$$ and
    $tag$…$tag$ — a ';' inside a dollar-quoted body, the DO-block/function-
    definition case, does not split)."""
    out: list[str] = []
    buf: list[str] = []
    quote: str | None = None  # "'" / '"' / a full dollar tag like "$fn$"
    i, n = 0, len(query)
    while i < n:
        ch = query[i]
        if quote in ("'", '"'):
            buf.append(ch)
            if ch == quote:
                if i + 1 < n and query[i + 1] == quote:  # doubled-quote escape
                    buf.append(query[i + 1])
                    i += 1
                else:
                    quote = None
        elif quote:  # inside dollar-quoting: scan for the exact closing tag
            if ch == "$" and query.startswith(quote, i):
                buf.append(quote)
                i += len(quote) - 1
                quote = None
            else:
                buf.append(ch)
        elif ch in ("'", '"'):
            quote = ch
            buf.append(ch)
        elif ch == "$":
            m = _DOLLAR_TAG.match(query, i)
            if m:
                quote = m.group(0)
                buf.append(quote)
                i += len(quote) - 1
            else:
                buf.append(ch)
        elif ch == "-" and i + 1 < n and query[i + 1] == "-":
            while i < n and query[i] != "\n":
                i += 1
            buf.append("\n")
        elif ch == ";":
            out.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
        i += 1
    out.append("".join(buf))
    return [s.strip() for s in out if s.strip()]


def check_query(query: str, read_only: bool = True) -> None:
    """Gate a query string (upstream_postgres.go:176-219): no-op unless
    read_only; rejects bypass attempts, then allowlists each statement's
    first keyword; RESET ALL / DISCARD ALL are called out specifically
    because they would clear a session read-only setting."""
    if not read_only:
        return
    q = query.strip()
    if not q:
        return
    lower = q.lower()
    if "default_transaction_read_only" in lower:
        raise GuardrailError("cannot modify read-only mode")
    if "set_config" in lower:
        raise GuardrailError("set_config is not allowed")
    for stmt in split_statements(q):
        fields = stmt.split()
        if not fields:
            continue
        keyword = fields[0].upper()
        rest = stmt[len(fields[0]):].strip()
        if keyword not in ALLOWED_FIRST_KEYWORDS:
            raise GuardrailError(f"statement not allowed: {keyword}")
        if keyword in ("RESET", "DISCARD") and re.match(r"(?i)^ALL\b", rest):
            raise GuardrailError(
                f"{keyword} ALL not allowed: would disable read-only mode"
            )


def _row_bytes(row: Any) -> int:
    total = 0
    for v in row:
        total += 4 if v is None else len(str(v).encode("utf-8"))
    return total


def stream_query(
    spark,
    query: str,
    guardrails: Guardrails | None = None,
    read_only: bool = True,
) -> Iterator[Any]:
    """Gate, run, and stream a query's rows under the budgets: rows arrive
    via toLocalIterator (one partition in flight — the driver never holds
    the result), each checked against the row/byte caps BEFORE being
    yielded, so the caller sees at most the budget then a GuardrailError —
    the reference's mid-stream cancel."""
    check_query(query, read_only=read_only)
    g = guardrails or Guardrails()
    g.reset()
    df = spark.sql(query)
    for row in df.toLocalIterator():
        g.add_row()
        g.add_bytes(_row_bytes(row))
        yield row

"""Exotic Postgres type ingestion: text-format parsers for interval, hstore,
TIMETZ, inet/cidr/macaddr, and hex-WKB geometry (all seven kinds).

Reference behavior (studied, not copied):
- interval → {years, months, days, hours, minutes, seconds} decomposition
  (flow/connectors/postgres/qvalue_convert.go:195-214 intervalToString,
  flow/shared/datatypes/interval.go). The reference receives (months, days,
  microseconds) from the wire; a parquet/text ingest sees `interval_out`
  text ('1 year 2 mons 3 days 04:05:06.789'), which this module parses to
  the same decomposition.
- hstore → key/value map (flow/shared/datatypes/hstore.go, a port of
  hstore_io.c's `hstore_out` subset: quoted keys, quoted-or-NULL values,
  backslash escapes).
- TIMETZ → UTC-normalized time (qvalue_convert.go:464-485 converts to UTC).
  Here: microseconds-of-day in UTC, wrapped at midnight.
- inet/cidr/macaddr → validated strings (kind.go maps them to string
  destinations; invalid input → NULL like the reference's conversion-failure
  nulling).
- geometry hex-WKB → coordinates (flow/shared/datatypes/geo.go GeoValidate:
  hex → WKB → validate → WKT, SRID-prefixed). Points, LINESTRINGs, and
  POLYGONs all decode in PURE Spark expressions — the IEEE-754 bit decode
  is exact integer/power-of-two arithmetic, reproducible bit-for-bit in
  any engine; variable-length layouts use dynamic-offset substr +
  transform, and the polygon's data-dependent ring offsets are one
  aggregate fold; MULTI* kinds decompose into complete nested blobs (one
  length-computing fold + substr slices) that the single-geometry decoders
  re-parse. wkb_geometry_wkt renders the geo.go WKT surface (SRID=n;
  prefix) for all seven kinds, incl. GEOMETRYCOLLECTION of simple members
  (only collections nesting MULTI*/collections stay NULL — documented).

Everything is JVM built-in expressions — no Python UDFs — so the parsers
whole-stage-codegen and run at scan throughput at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# interval
# ---------------------------------------------------------------------------


def _num(col: Column, pattern: str) -> Column:
    return F.coalesce(F.regexp_extract(col, pattern, 1).try_cast("int"), F.lit(0))


def parse_interval(col: Column) -> Column:
    """Postgres `interval_out` text → struct(years, months, days, hours,
    minutes, seconds decimal(18,6)).

    Handles the standard postgres style: optional '[-]N year[s]',
    '[-]N mon[s]', '[-]N day[s]' and a trailing '[+-]HH:MM:SS[.ffffff]'
    whose sign applies to the whole time part."""
    years = _num(col, r"(-?\d+) years?")
    months = _num(col, r"(-?\d+) mons?")
    days = _num(col, r"(-?\d+) days?")
    tsign = F.when(F.regexp_extract(col, r"(^|\s)(-)\d{2}:\d{2}:\d{2}", 2) == "-",
                   F.lit(-1)).otherwise(F.lit(1))
    hh = _num(col, r"(\d{2}):\d{2}:\d{2}")
    mm = _num(col, r"\d{2}:(\d{2}):\d{2}")
    ss = F.coalesce(
        F.regexp_extract(col, r"\d{2}:\d{2}:(\d{2}(?:\.\d+)?)", 1).try_cast("decimal(18,6)"),
        F.lit(0).cast("decimal(18,6)"),
    )
    return F.struct(
        years.alias("years"),
        months.alias("months"),
        days.alias("days"),
        (tsign * hh).alias("hours"),
        (tsign * mm).alias("minutes"),
        (tsign.cast("decimal(18,6)") * ss).cast("decimal(18,6)").alias("seconds"),
    )


def interval_to_json(col: Column) -> Column:
    """JSON shape matching the reference's intervalToString output."""
    s = parse_interval(col)
    return F.to_json(
        F.struct(
            s["hours"].alias("hours"),
            s["minutes"].alias("minutes"),
            s["seconds"].cast("double").alias("seconds"),
            s["days"].alias("days"),
            s["years"].alias("years"),
            s["months"].alias("months"),
            F.lit(True).alias("valid"),
        )
    )


# ---------------------------------------------------------------------------
# hstore
# ---------------------------------------------------------------------------

# ONE pair-level pattern (key group 1, value group 2): independent key/value
# scans desynchronize when a VALUE is followed by text that looks like a key
# terminator — e.g. '""=>"", "=>"=>NULL' (a key containing '=>'); matching
# whole pairs consumes each value before the next key is considered
# (hypothesis roundtrip test pins this).
_HS_PAIR = r'"((?:[^"\\]|\\.)*)"\s*=>\s*("(?:[^"\\]|\\.)*"|NULL)'


def _unescape(col: Column) -> Column:
    return F.regexp_replace(col, r"\\(.)", "$1")


def parse_hstore(col: Column) -> Column:
    """`hstore_out` text → map<string,string> (NULL values preserved).

    Parses the subset hstore_out emits — '"k"=>"v", "k2"=>NULL' with
    backslash escapes inside quotes (ref: flow/shared/datatypes/hstore.go)."""
    keys = F.transform(F.regexp_extract_all(col, F.lit(_HS_PAIR), F.lit(1)), _unescape)
    vals = F.transform(
        F.regexp_extract_all(col, F.lit(_HS_PAIR), F.lit(2)),
        lambda v: F.when(v == "NULL", F.lit(None).cast("string")).otherwise(
            _unescape(v.substr(F.lit(2), F.length(v) - 2))
        ),
    )
    return F.map_from_arrays(keys, vals)


def hstore_pairs(col: Column) -> Column:
    """Deterministic sorted 'key=>value' array (NULL value → 'key=>NULL') —
    the order-stable projection used by oracles and tests."""
    keys = F.transform(F.regexp_extract_all(col, F.lit(_HS_PAIR), F.lit(1)), _unescape)
    vals = F.transform(
        F.regexp_extract_all(col, F.lit(_HS_PAIR), F.lit(2)),
        lambda v: F.when(v == "NULL", F.lit("NULL")).otherwise(
            _unescape(v.substr(F.lit(2), F.length(v) - 2))
        ),
    )
    return F.array_sort(F.zip_with(keys, vals, lambda k, v: F.concat(k, F.lit("=>"), v)))


# ---------------------------------------------------------------------------
# timetz
# ---------------------------------------------------------------------------

US_PER_DAY = 86_400_000_000


def parse_timetz_micros(col: Column) -> Column:
    """TIMETZ text ('10:23:54.123456+02:30') → UTC microseconds-of-day (long),
    wrapped at midnight (the reference normalizes TIMETZ to UTC,
    qvalue_convert.go:464-485). Unparseable input → NULL."""
    hh = F.regexp_extract(col, r"^(\d{2}):", 1).try_cast("long")
    mm = F.regexp_extract(col, r"^\d{2}:(\d{2})", 1).try_cast("long")
    ss = F.regexp_extract(col, r"^\d{2}:\d{2}:(\d{2})", 1).try_cast("long")
    frac = F.coalesce(
        F.rpad(F.regexp_extract(col, r"\.(\d{1,6})", 1), 6, "0").try_cast("long"), F.lit(0)
    )
    osign = F.when(F.regexp_extract(col, r"([+-])\d{2}(:?\d{2})?$", 1) == "-",
                   F.lit(-1)).otherwise(F.lit(1))
    oh = F.coalesce(F.regexp_extract(col, r"[+-](\d{2})(:?\d{2})?$", 1).try_cast("long"), F.lit(0))
    om = F.coalesce(
        F.regexp_extract(col, r"[+-]\d{2}:?(\d{2})$", 1).try_cast("long"), F.lit(0)
    )
    local_us = (hh * 3600 + mm * 60 + ss) * 1_000_000 + frac
    off_us = osign * (oh * 3600 + om * 60) * 1_000_000
    return F.pmod(local_us - off_us, F.lit(US_PER_DAY))


# ---------------------------------------------------------------------------
# inet / cidr / macaddr
# ---------------------------------------------------------------------------

_OCTET = r"(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)"
INET4_RE = rf"^{_OCTET}(\.{_OCTET}){{3}}(/(3[0-2]|[12]?\d))?$"
# pragmatic IPv6 subset: hex groups and colons (incl. '::'), optional
# IPv4-mapped tail ('::ffff:1.2.3.4' — inet_out emits the dotted form),
# optional prefix
INET6_RE = (
    r"^[0-9A-Fa-f]{0,4}(:[0-9A-Fa-f]{0,4}){0,6}"
    rf"(:[0-9A-Fa-f]{{0,4}}|:{_OCTET}(\.{_OCTET}){{3}})"
    r"(/(12[0-8]|1[01]\d|\d{1,2}))?$"
)
MACADDR_RE = r"^([0-9A-Fa-f]{2}:){5}[0-9A-Fa-f]{2}$"


def valid_inet(col: Column) -> Column:
    """inet/cidr text validated (IPv4 octet ranges + prefix bounds; IPv6
    shape subset). Valid → trimmed input, invalid → NULL — mirroring the
    reference's conversion-failure nulling."""
    t = F.trim(col)
    return F.when(t.rlike(INET4_RE) | t.rlike(INET6_RE), t)


def valid_macaddr(col: Column) -> Column:
    t = F.trim(col)
    return F.when(t.rlike(MACADDR_RE), F.lower(t))


# ---------------------------------------------------------------------------
# hex-WKB point
# ---------------------------------------------------------------------------

_P52 = float(1 << 52)


def _rev_pairs(col: Column, n_bytes: int, start: int) -> Column:
    """Reverse the byte order of an n-byte hex slice starting at 1-based
    `start` (little-endian → big-endian hex)."""
    parts = [F.substring(col, start + 2 * i, 2) for i in range(n_bytes - 1, -1, -1)]
    return F.concat(*parts)


def _hex_slice(col: Column, le: Column, start: int, n_bytes: int) -> Column:
    raw = F.substring(col, start, 2 * n_bytes)
    return F.when(le, _rev_pairs(col, n_bytes, start)).otherwise(raw)


def _let(bindings: dict, body) -> Column:
    """Single-evaluation let-binding: wrap the bindings in a one-element
    array<struct> and reference them through a higher-order-function lambda
    variable. Each binding's expression tree then appears ONCE in the plan
    no matter how many times `body` uses it — the Column API inlines plain
    reuse, and the geometry decoders nest helpers deep enough that naive
    inlining stacks multiplicatively (the linestring decoder's physical
    plan measured 272 KB / ~8 s of analysis before this, ~2 KB after).
    Conditional laziness is preserved: a _let under a When branch is only
    evaluated when the branch is taken."""
    keys = list(bindings)
    arr = F.array(F.struct(*[bindings[k].alias(k) for k in keys]))
    return F.get(F.transform(arr, lambda s: body(*[s[k] for k in keys])), 0)


def _ieee754(hex16: Column) -> Column:
    """Big-endian 16-hex-char IEEE-754 double decode — exact integer and
    power-of-two arithmetic (reproducible in any engine; Inf/NaN → NULL)."""

    def decode(head: Column, m: Column) -> Column:
        sign = F.when(head >= 2048, F.lit(-1.0)).otherwise(F.lit(1.0))
        e = head % 2048
        frac = m.cast("double") / F.lit(_P52)
        return (
            F.when(e == 2047, F.lit(None).cast("double"))  # Inf/NaN → invalid
            .when((e == 0) & (m == 0), sign * F.lit(0.0))
            .when(e == 0, sign * frac * F.pow(F.lit(2.0), F.lit(-1022)))
            .otherwise(sign * (frac + F.lit(1.0)) * F.pow(F.lit(2.0), e - 1023))
        )

    return _let(
        {"hx": hex16},
        lambda hx: _let(
            {
                "head": F.conv(F.substring(hx, 1, 3), 16, 10).cast("long"),
                "m": F.conv(F.substring(hx, 4, 13), 16, 10).cast("long"),
            },
            decode,
        ),
    )


def wkb_point(col: Column) -> Column:
    """Hex-WKB/EWKB POINT → struct(x double, y double, srid int).

    Supports both byte orders and the EWKB SRID flag (0x20000000). Anything
    that is not a well-formed point (wrong geometry type, wrong length,
    Inf/NaN coordinates) yields NULL x/y — the reference's GeoValidate drops
    invalid shapes the same way (flow/shared/datatypes/geo.go:11-35)."""
    h = F.upper(F.trim(col))
    le = F.substring(h, 1, 2) == "01"
    type_val = F.conv(_hex_slice(h, le, 3, 4), 16, 10).cast("long")
    has_srid = (F.floor(type_val / F.lit(0x20000000)) % 2) == 1
    base_type = type_val % F.lit(0x20000000)
    srid = F.when(
        has_srid, F.conv(_hex_slice(h, le, 11, 4), 16, 10).try_cast("int")
    ).otherwise(F.lit(0))
    xh = F.when(has_srid, _hex_slice(h, le, 19, 8)).otherwise(_hex_slice(h, le, 11, 8))
    yh = F.when(has_srid, _hex_slice(h, le, 35, 8)).otherwise(_hex_slice(h, le, 27, 8))
    expected_len = F.when(has_srid, F.lit(50)).otherwise(F.lit(42))
    ok = (
        (base_type == 1)
        & (F.length(h) == expected_len)
        & F.substring(h, 1, 2).isin("00", "01")
        & (h.rlike("^[0-9A-F]+$"))
    )
    x = F.when(ok, _ieee754(xh))
    y = F.when(ok, _ieee754(yh))
    return F.struct(x.alias("x"), y.alias("y"),
                    F.when(ok, srid).otherwise(F.lit(None).cast("int")).alias("srid"))


def wkb_point_wkt(col: Column) -> Column:
    """WKT rendering with the reference's SRID prefix convention
    ('SRID=n;POINT(x y)' when SRID != 0 — geo.go:29-34). String formatting of
    doubles is engine-specific, so this is the API surface, not the oracle
    projection (oracles compare the typed x/y/srid struct instead)."""
    p = wkb_point(col)
    body = F.concat(F.lit("POINT("), p["x"].cast("string"), F.lit(" "),
                    p["y"].cast("string"), F.lit(")"))
    return F.when(
        p["x"].isNotNull(),
        F.when(p["srid"] > 0,
               F.concat(F.lit("SRID="), p["srid"].cast("string"), F.lit(";"), body)
               ).otherwise(body),
    )


# -- variable-length geometries (LINESTRING / POLYGON) ----------------------
#
# The reference converts EVERY geometry kind via WKB→validate→WKT
# (flow/shared/datatypes/geo.go GeoValidate, used from
# flow/connectors/postgres/qvalue_convert.go:725-731); points alone covered
# only the dominant case. These decoders handle the variable-length layouts
# with pure expressions: dynamic offsets via substr(col, posColumn, len),
# per-point decode via transform over an index sequence, and the polygon's
# ring-by-ring offsets via ONE aggregate fold (each ring's start depends on
# every prior ring's point count). Structural validity is strict — wrong
# type, wrong total length, non-hex, NaN/Inf coordinate → NULL geometry,
# mirroring GeoValidate's reject-don't-guess behavior.

_GEO_POINT_T = "array<struct<x:double,y:double>>"


def _rev_pairs_dyn(col: Column, n_bytes: int, start: Column) -> Column:
    """_rev_pairs with a DYNAMIC 1-based start position (Column)."""
    parts = [
        F.substr(col, start + F.lit(2 * i), F.lit(2))
        for i in range(n_bytes - 1, -1, -1)
    ]
    return F.concat(*parts)


def _hex_slice_dyn(col: Column, le: Column, start: Column, n_bytes: int) -> Column:
    return _let(
        {"st": start},
        lambda st: F.when(le, _rev_pairs_dyn(col, n_bytes, st)).otherwise(
            F.substr(col, st, F.lit(2 * n_bytes))
        ),
    )


def _geo_header(col: Column):
    """(h, le, base_type, has_srid, srid, body_pos): the shared (E)WKB
    header decode — body_pos is the 1-based hex position right after the
    header (and SRID when present)."""
    h = F.upper(F.trim(col))
    le = F.substring(h, 1, 2) == "01"
    type_val = F.conv(_hex_slice(h, le, 3, 4), 16, 10).cast("long")
    has_srid = (F.floor(type_val / F.lit(0x20000000)) % 2) == 1
    base_type = type_val % F.lit(0x20000000)
    srid = F.when(
        has_srid, F.conv(_hex_slice(h, le, 11, 4), 16, 10).try_cast("int")
    ).otherwise(F.lit(0))
    body_pos = F.when(has_srid, F.lit(19)).otherwise(F.lit(11))
    structural = F.substring(h, 1, 2).isin("00", "01") & h.rlike("^[0-9A-F]*$")
    return h, le, base_type, has_srid, srid, body_pos, structural


def _points_at(h: Column, le: Column, base: Column, n: Column) -> Column:
    """n points of 16 bytes each starting at hex position `base` (Column) →
    array<struct<x,y>>. Guarded sequence: n=0 yields [] (sequence(0,-1)
    would count DOWN)."""
    idx = F.when(n > 0, F.sequence(F.lit(0), n - 1)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(
        idx,
        lambda i: _let(
            {"o": base + i * 32},
            lambda o: F.struct(
                _ieee754(_hex_slice_dyn(h, le, o, 8)).alias("x"),
                _ieee754(_hex_slice_dyn(h, le, o + 16, 8)).alias("y"),
            ),
        ),
    )


def _no_bad_coords(pts: Column) -> Column:
    return ~F.exists(pts, lambda p: p["x"].isNull() | p["y"].isNull())


def wkb_linestring(col: Column) -> Column:
    """Hex-WKB/EWKB LINESTRING → struct(srid int, points array<struct<x,y>>).
    points is NULL for anything malformed (wrong type, truncated/overlong
    payload, NaN/Inf coordinate). Every shared subterm is _let-bound —
    header, point count, decoded points — so the plan stays ~KB-sized."""
    h0, le0, base_type, _hs, srid0, body_pos, structural = _geo_header(col)

    def with_header(h, le, bt, srid, bp, ok0):
        def with_n(n):
            pts_raw = F.when(
                ok0 & (bt == 2) & n.isNotNull()
                & (F.length(h) == bp + 7 + n.cast("long") * 32),
                _points_at(h, le, bp + 8, n),
            )
            return _let(
                {"pts": pts_raw},
                lambda pts: _let(
                    {"valid": pts.isNotNull() & _no_bad_coords(pts)},
                    lambda valid: F.struct(
                        F.when(valid, srid).alias("srid"),
                        F.when(valid, pts).alias("points"),
                    ),
                ),
            )

        return _let(
            {"n": F.conv(_hex_slice_dyn(h, le, bp, 4), 16, 10).try_cast("int")},
            with_n,
        )

    return _let(
        {"h": h0, "le": le0, "bt": base_type, "srid": srid0,
         "bp": body_pos, "ok0": structural},
        with_header,
    )


def wkb_polygon(col: Column) -> Column:
    """Hex-WKB/EWKB POLYGON → struct(srid int, rings array<array<struct<x,y>>>).

    Ring offsets are data-dependent (ring r starts after all points of
    rings 0..r-1), so the decode is one aggregate fold over the ring index
    carrying (next position, rings so far, malformed flag); the final
    position must land exactly at end-of-hex."""
    h0, le0, base_type, _hs, srid0, body_pos, structural = _geo_header(col)

    def with_header(h, le, bt, srid, bp, ok0):
        def step(acc, _i):
            def with_np(np_):
                # a ring that would run past the buffer marks the geometry
                # bad (substr past the end yields short slices → conv
                # garbage, so the final exact-length check alone could miss
                # compensating errors)
                return _let(
                    {"fits": np_.isNotNull()
                             & (acc["pos"] + 7 + np_.cast("long") * 32
                                <= F.length(h))},
                    lambda fits: F.struct(
                        F.when(fits, acc["pos"] + 8 + np_ * 32)
                        .otherwise(acc["pos"]).alias("pos"),
                        F.when(
                            fits,
                            F.concat(
                                acc["rings"],
                                F.array(_points_at(h, le, acc["pos"] + 8, np_)),
                            ),
                        ).otherwise(acc["rings"]).alias("rings"),
                        (acc["bad"] | ~fits).alias("bad"),
                    ),
                )

            return _let(
                {"np": F.conv(_hex_slice_dyn(h, le, acc["pos"], 4), 16, 10)
                       .try_cast("int")},
                with_np,
            )

        def with_n(nrings):
            ring_idx = F.when(nrings > 0, F.sequence(F.lit(1), nrings)).otherwise(
                F.array().cast("array<int>")
            )
            init = F.struct(
                (bp + 8).alias("pos"),
                F.array().cast(f"array<{_GEO_POINT_T}>").alias("rings"),
                F.lit(False).alias("bad"),
            )
            # nrings sanity: every ring needs ≥ 8 hex chars (its count
            # field alone), so a count that cannot fit the buffer is
            # rejected BEFORE sequence() materializes it — a hostile
            # header declaring 2^31 rings in a 20-char buffer would
            # otherwise allocate the index array
            folded_raw = F.when(
                ok0 & (bt == 3) & nrings.isNotNull()
                & (nrings.cast("long") * 8 <= F.length(h)),
                F.aggregate(ring_idx, init, step),
            )
            return _let(
                {"folded": folded_raw},
                lambda folded: _let(
                    {"ok": folded.isNotNull()
                           & ~folded["bad"]
                           & (folded["pos"] - 1 == F.length(h))
                           & ~F.exists(folded["rings"],
                                       lambda r: ~_no_bad_coords(r))},
                    lambda ok: F.struct(
                        F.when(ok, srid).alias("srid"),
                        F.when(ok, folded["rings"]).alias("rings"),
                    ),
                ),
            )

        return _let(
            {"n": F.conv(_hex_slice_dyn(h, le, bp, 4), 16, 10).try_cast("int")},
            with_n,
        )

    return _let(
        {"h": h0, "le": le0, "bt": base_type, "srid": srid0,
         "bp": body_pos, "ok0": structural},
        with_header,
    )


# -- MULTI* geometries --------------------------------------------------------
#
# A MULTIPOINT/MULTILINESTRING/MULTIPOLYGON body is a count followed by
# COMPLETE nested WKB blobs (each with its own byte-order + type header).
# Decomposition: one fold walks the nested blobs computing each one's hex
# LENGTH (points are fixed-size; linestrings read their point count;
# polygons run an inner ring-length fold), slicing the blob out as a
# string — then the EXISTING single-geometry decoders run on each slice
# via transform. Validity is strict: every nested blob must parse, carry
# the kind its container promises, and the lengths must tile the buffer
# exactly.


def _sub_geo_len(h: Column, pos: Column) -> Column:
    """Hex length of the complete nested WKB blob starting at 1-based `pos`
    (NULL when the header is unreadable / kind unsupported). Nested blobs
    never carry an EWKB SRID flag (SRID lives on the container)."""

    def with_type(le, t):
        # linestring: 1+4+4 bytes + 16n;  point: 1+4+16;  polygon: inner fold
        n = F.conv(_hex_slice_dyn(h, le, pos + 10, 4), 16, 10).cast("long")

        def ring_fold(nr):
            init = F.struct(F.lit(18).cast("long").alias("ln"),
                            F.lit(False).alias("bad"))

            def step(acc, _i):
                return _let(
                    {"m": F.conv(
                        _hex_slice_dyn(h, le, pos + acc["ln"], 4), 16, 10
                    ).cast("long")},
                    lambda m: F.struct(
                        F.when(m.isNotNull(), acc["ln"] + 8 + 32 * m)
                        .otherwise(acc["ln"]).alias("ln"),
                        (acc["bad"] | m.isNull()).alias("bad"),
                    ),
                )

            # ≥ 8 hex chars per ring; oversized counts reject pre-sequence
            idx = F.when(
                (nr > 0) & (nr * 8 <= F.length(h)),
                F.sequence(F.lit(1), nr.try_cast("int")),
            ).otherwise(F.array().cast("array<int>"))
            return _let(
                {"f": F.aggregate(idx, init, step)},
                lambda f: F.when(~f["bad"], f["ln"]),
            )

        return (
            F.when(t == 1, F.lit(42).cast("long"))
            .when(t == 2, F.when(n.isNotNull(), 18 + 32 * n))
            .when(t == 3, F.when(n.isNotNull(), ring_fold(n)))
        )

    return _let(
        {"le": F.substr(h, pos, F.lit(2)) == "01",
         "bo_ok": F.substr(h, pos, F.lit(2)).isin("00", "01")},
        lambda le, bo_ok: F.when(
            bo_ok,
            _let(
                {"t": F.conv(_hex_slice_dyn(h, le, pos + 2, 4), 16, 10)
                      .cast("long")},
                lambda t: with_type(le, t),
            ),
        ),
    )


def _wkb_parts(col: Column, container_type: int) -> Column:
    """struct(srid, parts array<string>): the nested blobs of a MULTI*
    geometry as hex strings (NULL when malformed). container_type ∈
    {4: multipoint, 5: multilinestring, 6: multipolygon}."""
    h0, le0, base_type, _hs, srid0, body_pos, structural = _geo_header(col)

    def with_header(h, le, bt, srid, bp, ok0):
        def with_n(n):
            init = F.struct(
                (bp + 8).cast("long").alias("pos"),
                F.array().cast("array<string>").alias("parts"),
                F.lit(False).alias("bad"),
            )

            def step(acc, _i):
                return _let(
                    {"ln": _sub_geo_len(h, acc["pos"])},
                    lambda ln: _let(
                        {"fits": ln.isNotNull()
                                 & (acc["pos"] + ln - 1 <= F.length(h))},
                        lambda fits: F.struct(
                            F.when(fits, acc["pos"] + ln)
                            .otherwise(acc["pos"]).alias("pos"),
                            F.when(
                                fits,
                                F.concat(acc["parts"],
                                         F.array(F.substr(h, acc["pos"], ln))),
                            ).otherwise(acc["parts"]).alias("parts"),
                            (acc["bad"] | ~fits).alias("bad"),
                        ),
                    ),
                )

            idx = F.when(n > 0, F.sequence(F.lit(1), n)).otherwise(
                F.array().cast("array<int>")
            )
            # same sanity as the polygon fold: a nested blob is ≥ 10 hex
            # chars (byte order + type header), so an n that cannot fit
            # rejects before sequence() materializes the index array
            folded_raw = F.when(
                ok0 & (bt == container_type) & n.isNotNull()
                & (n.cast("long") * 10 <= F.length(h)),
                F.aggregate(idx, init, step),
            )
            return _let(
                {"f": folded_raw},
                lambda f: _let(
                    {"ok": f.isNotNull() & ~f["bad"]
                           & (f["pos"] - 1 == F.length(h))},
                    lambda ok: F.struct(
                        F.when(ok, srid).alias("srid"),
                        F.when(ok, f["parts"]).alias("parts"),
                    ),
                ),
            )

        return _let(
            {"n": F.conv(_hex_slice_dyn(h, le, bp, 4), 16, 10).try_cast("int")},
            with_n,
        )

    return _let(
        {"h": h0, "le": le0, "bt": base_type, "srid": srid0,
         "bp": body_pos, "ok0": structural},
        with_header,
    )


def wkb_multipoint(col: Column) -> Column:
    """MULTIPOINT → struct(srid int, points array<struct<x,y>>)."""
    return _let(
        {"ps": _wkb_parts(col, 4)},
        lambda ps: _let(
            {"pts": F.transform(ps["parts"], lambda p: wkb_point(p))},
            lambda pts: _let(
                {"bad": ps["parts"].isNull()
                        | F.exists(pts, lambda p: p["x"].isNull())},
                lambda bad: F.struct(
                    F.when(~bad, ps["srid"]).alias("srid"),
                    F.when(
                        ~bad,
                        F.transform(pts, lambda p: F.struct(
                            p["x"].alias("x"), p["y"].alias("y"))),
                    ).alias("points"),
                ),
            ),
        ),
    )


def wkb_multilinestring(col: Column) -> Column:
    """MULTILINESTRING → struct(srid int, lines array<array<struct<x,y>>>)."""
    return _let(
        {"ps": _wkb_parts(col, 5)},
        lambda ps: _let(
            {"ls": F.transform(ps["parts"], lambda p: wkb_linestring(p))},
            lambda ls: _let(
                {"bad": ps["parts"].isNull()
                        | F.exists(ls, lambda x: x["points"].isNull())},
                lambda bad: F.struct(
                    F.when(~bad, ps["srid"]).alias("srid"),
                    F.when(~bad, F.transform(ls, lambda x: x["points"]))
                    .alias("lines"),
                ),
            ),
        ),
    )


def wkb_multipolygon(col: Column) -> Column:
    """MULTIPOLYGON → struct(srid int, polys array<array<array<struct<x,y>>>>)."""
    return _let(
        {"ps": _wkb_parts(col, 6)},
        lambda ps: _let(
            {"pg": F.transform(ps["parts"], lambda p: wkb_polygon(p))},
            lambda pg: _let(
                {"bad": ps["parts"].isNull()
                        | F.exists(pg, lambda x: x["rings"].isNull())},
                lambda bad: F.struct(
                    F.when(~bad, ps["srid"]).alias("srid"),
                    F.when(~bad, F.transform(pg, lambda x: x["rings"]))
                    .alias("polys"),
                ),
            ),
        ),
    )


def _simple_wkt(col: Column) -> Column:
    """WKT for the three simple kinds only (no SRID prefix — used for the
    nested members of a GEOMETRYCOLLECTION, which carry no SRID flag)."""
    _h, _le, base_type, _hs, _sr, _bp, _ok = _geo_header(col)

    def pt_txt(p):
        return F.concat(p["x"].cast("string"), F.lit(" "), p["y"].cast("string"))

    ls_txt = _let(
        {"ls": wkb_linestring(col)},
        lambda ls: F.when(
            ls["points"].isNotNull(),
            F.concat(
                F.lit("LINESTRING("),
                F.array_join(F.transform(ls["points"], pt_txt), ", "),
                F.lit(")"),
            ),
        ),
    )
    pg_txt = _let(
        {"pg": wkb_polygon(col)},
        lambda pg: F.when(
            pg["rings"].isNotNull(),
            F.concat(
                F.lit("POLYGON("),
                F.array_join(
                    F.transform(
                        pg["rings"],
                        lambda r: F.concat(
                            F.lit("("),
                            F.array_join(F.transform(r, pt_txt), ", "),
                            F.lit(")"),
                        ),
                    ),
                    ", ",
                ),
                F.lit(")"),
            ),
        ),
    )
    return (
        F.when(base_type == 1, wkb_point_wkt(col))
        .when(base_type == 2, ls_txt)
        .when(base_type == 3, pg_txt)
    )


def wkb_geometrycollection_wkt(col: Column) -> Column:
    """GEOMETRYCOLLECTION → WKT ('GEOMETRYCOLLECTION(POINT(…), …)'; empty →
    'GEOMETRYCOLLECTION EMPTY'). Members are the simple kinds — a
    collection holding MULTI* or nested collections returns NULL
    (documented scope: the member-length fold handles kinds 1-3)."""
    return _let(
        {"ps": _wkb_parts(col, 7)},
        lambda ps: _let(
            {"txt": F.transform(ps["parts"], lambda p: _simple_wkt(p))},
            lambda txt: _let(
                {"bad": ps["parts"].isNull()
                        | F.exists(txt, lambda t: t.isNull())},
                lambda bad: F.when(
                    ~bad,
                    F.when(
                        F.size(txt) == 0, F.lit("GEOMETRYCOLLECTION EMPTY")
                    ).otherwise(
                        F.concat(
                            F.lit("GEOMETRYCOLLECTION("),
                            F.array_join(txt, ", "),
                            F.lit(")"),
                        )
                    ),
                ),
            ),
        ),
    )


def wkb_geometry_wkt(col: Column) -> Column:
    """Any supported hex-WKB geometry → WKT with the reference's SRID
    prefix convention ('SRID=n;…' when SRID != 0 — geo.go:29-34). All
    seven kinds: point/linestring/polygon, the three MULTI* kinds, and
    GEOMETRYCOLLECTION of simple members (nested collections → NULL).
    Double→string formatting is engine-specific,
    so (like wkb_point_wkt) this is the API surface — oracles compare
    typed/integer-scaled coordinates instead."""
    _h, _le, base_type, _hs, srid, _bp, _ok = _geo_header(col)

    def pt_txt(p):
        return F.concat(p["x"].cast("string"), F.lit(" "), p["y"].cast("string"))

    # each kind's text is NULL when that kind's decode is NULL — so the
    # final When chain is also the validity gate, with every decode bound once
    ls_txt = _let(
        {"ls": wkb_linestring(col)},
        lambda ls: F.when(
            ls["points"].isNotNull(),
            F.concat(
                F.lit("LINESTRING("),
                F.array_join(F.transform(ls["points"], pt_txt), ", "),
                F.lit(")"),
            ),
        ),
    )
    pg_txt = _let(
        {"pg": wkb_polygon(col)},
        lambda pg: F.when(
            pg["rings"].isNotNull(),
            F.concat(
                F.lit("POLYGON("),
                F.array_join(
                    F.transform(
                        pg["rings"],
                        lambda r: F.concat(
                            F.lit("("),
                            F.array_join(F.transform(r, pt_txt), ", "),
                            F.lit(")"),
                        ),
                    ),
                    ", ",
                ),
                F.lit(")"),
            ),
        ),
    )
    def ring_txt(r):
        return F.concat(
            F.lit("("), F.array_join(F.transform(r, pt_txt), ", "), F.lit(")")
        )

    mp_txt = _let(
        {"mp": wkb_multipoint(col)},
        lambda mp: F.when(
            mp["points"].isNotNull(),
            F.concat(
                F.lit("MULTIPOINT("),
                F.array_join(F.transform(mp["points"], pt_txt), ", "),
                F.lit(")"),
            ),
        ),
    )
    mls_txt = _let(
        {"ml": wkb_multilinestring(col)},
        lambda ml: F.when(
            ml["lines"].isNotNull(),
            F.concat(
                F.lit("MULTILINESTRING("),
                F.array_join(F.transform(ml["lines"], ring_txt), ", "),
                F.lit(")"),
            ),
        ),
    )
    mpg_txt = _let(
        {"mg": wkb_multipolygon(col)},
        lambda mg: F.when(
            mg["polys"].isNotNull(),
            F.concat(
                F.lit("MULTIPOLYGON("),
                F.array_join(
                    F.transform(
                        mg["polys"],
                        lambda rings: F.concat(
                            F.lit("("),
                            F.array_join(F.transform(rings, ring_txt), ", "),
                            F.lit(")"),
                        ),
                    ),
                    ", ",
                ),
                F.lit(")"),
            ),
        ),
    )
    body = (
        F.when(base_type == 1, wkb_point_wkt(col))
        .when(base_type == 2, ls_txt)
        .when(base_type == 3, pg_txt)
        .when(base_type == 4, mp_txt)
        .when(base_type == 5, mls_txt)
        .when(base_type == 6, mpg_txt)
        .when(base_type == 7, wkb_geometrycollection_wkt(col))
    )
    # point WKT already carries its own SRID prefix; add it for ls/pg
    return _let(
        {"bt": base_type, "sr": srid, "b": body},
        lambda bt, sr, b: F.when(
            (bt != 1) & (sr > 0) & b.isNotNull(),
            F.concat(F.lit("SRID="), sr.cast("string"), F.lit(";"), b),
        ).otherwise(b),
    )


# ---------------------------------------------------------------------------
# money / bit strings
# ---------------------------------------------------------------------------


def parse_money_cents(col: Column) -> Column:
    """Postgres MONEY text ('$1,234.56', '-$12.30') → exact integer cents.

    Mirrors the reference's money handling (qvalue_convert.go strips the
    currency formatting and parses as numeric): drop '$' and grouping
    commas, parse, scale to cents. Cents stay exact through the double
    parse for any realistic money value (< 2^53/100)."""
    cleaned = F.regexp_replace(col, r"[$,]", "")
    return F.round(cleaned.cast("double") * 100).cast("long")


def valid_bit(col: Column, max_len: int | None = None) -> Column:
    """BIT/VARBIT text: a string of 0/1 digits, NULL when malformed
    (reference maps bit kinds to string; validation replaces the wire check)."""
    ok = col.rlike("^[01]+$")
    if max_len is not None:
        ok = ok & (F.length(col) <= max_len)
    return F.when(ok, col)

"""SQL-text mirrors of the hex-WKB geometry decoders in exotic.py.

Why this exists: the Column-API decoders in exotic.py are correct and keep
the PLAN small (the `_let` binding), but BUILDING them costs one py4j
round-trip per expression node — measured 4.5 s of pure driver time per
q_exotic_types invocation (wkb_point 0.6 + linestring 0.7 + polygon 1.2 +
multipolygon 1.9), the same failure mode as the k×dim literal codebooks
fixed in similarity._nearest_cells. These builders render the SAME
expression tree as ONE SQL string per output column: a single F.expr parse
on the JVM, milliseconds of driver time, identical semantics.

Each helper here mirrors its exotic.py namesake line-for-line with the
same Spark primitives (conv/substr/transform/aggregate/CASE), so the two
implementations are equivalent by construction; tests/test_exotic.py
asserts equal output over every fixture INCLUDING the malformed ones.
exotic.py remains the canonical, documented implementation — read that for
the format semantics (ref: flow/shared/datatypes/geo.go GeoValidate;
studied, not copied).

Naming: `let()` binds shared subterms through a one-element
array<struct> + lambda var (fresh names from a module counter, so nesting
never shadows), exactly like exotic._let — get(..., 0) unwraps.
"""

from __future__ import annotations

import itertools

_ctr = itertools.count()


def _fresh(prefix: str = "v") -> str:
    return f"_{prefix}{next(_ctr)}"


def let(bindings: dict[str, str], body) -> str:
    """Single-evaluation let over SQL text: each binding's expression
    appears once no matter how many times the body references it."""
    var = _fresh("l")
    fields = ", ".join(f"'{k}', ({e})" for k, e in bindings.items())
    refs = [f"{var}.{k}" for k in bindings]
    return f"get(transform(array(named_struct({fields})), {var} -> ({body(*refs)})), 0)"


def rev_pairs(col: str, n_bytes: int, start: int) -> str:
    parts = [f"substring({col}, {start + 2 * i}, 2)"
             for i in range(n_bytes - 1, -1, -1)]
    return "concat(" + ", ".join(parts) + ")"


def hex_slice(col: str, le: str, start: int, n_bytes: int) -> str:
    return (f"CASE WHEN {le} THEN {rev_pairs(col, n_bytes, start)} "
            f"ELSE substring({col}, {start}, {2 * n_bytes}) END")


def rev_pairs_dyn(col: str, n_bytes: int, start: str) -> str:
    parts = [f"substr({col}, ({start}) + {2 * i}, 2)"
             for i in range(n_bytes - 1, -1, -1)]
    return "concat(" + ", ".join(parts) + ")"


def hex_slice_dyn(col: str, le: str, start: str, n_bytes: int) -> str:
    return let(
        {"st": start},
        lambda st: (f"CASE WHEN {le} THEN {rev_pairs_dyn(col, n_bytes, st)} "
                    f"ELSE substr({col}, {st}, {2 * n_bytes}) END"),
    )


_P52 = float(1 << 52)


def ieee754(hex16: str) -> str:
    def decode(head: str, m: str) -> str:
        sign = f"(CASE WHEN {head} >= 2048 THEN -1.0D ELSE 1.0D END)"
        e = f"({head} % 2048)"
        frac = f"(CAST({m} AS DOUBLE) / {_P52!r}D)"
        return (
            f"CASE WHEN {e} = 2047 THEN CAST(NULL AS DOUBLE) "
            f"WHEN {e} = 0 AND {m} = 0 THEN {sign} * 0.0D "
            f"WHEN {e} = 0 THEN {sign} * {frac} * power(2.0D, -1022) "
            f"ELSE {sign} * ({frac} + 1.0D) * power(2.0D, {e} - 1023) END"
        )

    return let(
        {"hx": hex16},
        lambda hx: let(
            {"head": f"CAST(conv(substring({hx}, 1, 3), 16, 10) AS BIGINT)",
             "m": f"CAST(conv(substring({hx}, 4, 13), 16, 10) AS BIGINT)"},
            decode,
        ),
    )


def geo_header(col: str):
    """(h, le, base_type, srid, body_pos, structural) as SQL-text tuples —
    caller binds them through let() exactly like exotic._geo_header."""
    h = f"upper(trim({col}))"
    le = f"(substring({h}, 1, 2) = '01')"
    type_val = f"CAST(conv({hex_slice(h, le, 3, 4)}, 16, 10) AS BIGINT)"
    has_srid = f"(FLOOR(({type_val}) / 536870912) % 2 = 1)"
    base_type = f"(({type_val}) % 536870912)"
    srid = (f"CASE WHEN {has_srid} THEN "
            f"TRY_CAST(conv({hex_slice(h, le, 11, 4)}, 16, 10) AS INT) "
            f"ELSE 0 END")
    body_pos = f"(CASE WHEN {has_srid} THEN 19 ELSE 11 END)"
    structural = (f"(substring({h}, 1, 2) IN ('00', '01') "
                  f"AND {h} RLIKE '^[0-9A-F]*$')")
    return h, le, base_type, srid, body_pos, structural


def points_at(h: str, le: str, base: str, n: str) -> str:
    i = _fresh("i")
    idx = (f"CASE WHEN {n} > 0 THEN sequence(0, {n} - 1) "
           f"ELSE CAST(array() AS ARRAY<INT>) END")
    point = let(
        {"o": f"({base}) + {i} * 32"},
        lambda ov: (f"named_struct("
                    f"'x', {ieee754(hex_slice_dyn(h, le, ov, 8))}, "
                    f"'y', {ieee754(hex_slice_dyn(h, le, f'({ov}) + 16', 8))})"),
    )
    return f"transform({idx}, {i} -> {point})"


def no_bad_coords(pts: str) -> str:
    p = _fresh("p")
    return f"(NOT exists({pts}, {p} -> {p}.x IS NULL OR {p}.y IS NULL))"


def wkb_point_sql(col: str) -> str:
    """SQL-text mirror of exotic.wkb_point: struct(x, y, srid)."""
    h0 = f"upper(trim({col}))"

    def with_h(h):
        le = f"(substring({h}, 1, 2) = '01')"
        type_val = f"CAST(conv({hex_slice(h, le, 3, 4)}, 16, 10) AS BIGINT)"

        def with_parts(lev, tv):
            has_srid = f"(FLOOR({tv} / 536870912) % 2 = 1)"
            base_type = f"({tv} % 536870912)"
            srid = (f"CASE WHEN {has_srid} THEN "
                    f"TRY_CAST(conv({hex_slice(h, lev, 11, 4)}, 16, 10) AS INT) "
                    f"ELSE 0 END")
            xh = (f"CASE WHEN {has_srid} THEN {hex_slice(h, lev, 19, 8)} "
                  f"ELSE {hex_slice(h, lev, 11, 8)} END")
            yh = (f"CASE WHEN {has_srid} THEN {hex_slice(h, lev, 35, 8)} "
                  f"ELSE {hex_slice(h, lev, 27, 8)} END")
            expected = f"(CASE WHEN {has_srid} THEN 50 ELSE 42 END)"
            ok = (f"({base_type} = 1 AND length({h}) = {expected} "
                  f"AND substring({h}, 1, 2) IN ('00', '01') "
                  f"AND {h} RLIKE '^[0-9A-F]+$')")
            return let(
                {"ok": ok},
                lambda okv: (
                    f"named_struct("
                    f"'x', CASE WHEN {okv} THEN {ieee754(xh)} END, "
                    f"'y', CASE WHEN {okv} THEN {ieee754(yh)} END, "
                    f"'srid', CASE WHEN {okv} THEN {srid} "
                    f"ELSE CAST(NULL AS INT) END)"
                ),
            )

        return let({"le": le, "tv": type_val}, with_parts)

    return let({"h": h0}, with_h)


def wkb_linestring_sql(col: str) -> str:
    """SQL-text mirror of exotic.wkb_linestring: struct(srid, points)."""
    h0, le0, bt0, srid0, bp0, ok0 = geo_header(col)

    def with_header(h, le, bt, srid, bp, ok):
        def with_n(n):
            pts_raw = (
                f"CASE WHEN {ok} AND {bt} = 2 AND {n} IS NOT NULL "
                f"AND length({h}) = {bp} + 7 + CAST({n} AS BIGINT) * 32 "
                f"THEN {points_at(h, le, f'{bp} + 8', n)} END"
            )
            return let(
                {"pts": pts_raw},
                lambda pts: let(
                    {"valid": f"({pts} IS NOT NULL AND {no_bad_coords(pts)})"},
                    lambda valid: (
                        f"named_struct("
                        f"'srid', CASE WHEN {valid} THEN {srid} END, "
                        f"'points', CASE WHEN {valid} THEN {pts} END)"
                    ),
                ),
            )

        return let(
            {"n": f"TRY_CAST(conv({hex_slice_dyn(h, le, bp, 4)}, 16, 10) AS INT)"},
            with_n,
        )

    return let(
        {"h": h0, "le": le0, "bt": bt0, "srid": srid0, "bp": bp0, "ok0": ok0},
        with_header,
    )


_GEO_POINT_T = "ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>"


def wkb_polygon_sql(col: str) -> str:
    """SQL-text mirror of exotic.wkb_polygon: struct(srid, rings)."""
    h0, le0, bt0, srid0, bp0, ok0 = geo_header(col)

    def with_header(h, le, bt, srid, bp, ok):
        acc = _fresh("acc")
        i = _fresh("i")

        def step_body() -> str:
            def with_np(np_):
                return let(
                    {"fits": (f"({np_} IS NOT NULL "
                              f"AND {acc}.pos + 7 + CAST({np_} AS BIGINT) * 32 "
                              f"<= length({h}))")},
                    lambda fits: (
                        f"named_struct("
                        f"'pos', CASE WHEN {fits} THEN {acc}.pos + 8 + {np_} * 32 "
                        f"ELSE {acc}.pos END, "
                        f"'rings', CASE WHEN {fits} THEN concat({acc}.rings, "
                        f"array({points_at(h, le, f'{acc}.pos + 8', np_)})) "
                        f"ELSE {acc}.rings END, "
                        f"'bad', ({acc}.bad OR NOT {fits}))"
                    ),
                )

            return let(
                {"np": (f"TRY_CAST(conv({hex_slice_dyn(h, le, f'{acc}.pos', 4)}, "
                        f"16, 10) AS INT)")},
                with_np,
            )

        def with_n(nrings):
            ring_idx = (f"CASE WHEN {nrings} > 0 THEN sequence(1, {nrings}) "
                        f"ELSE CAST(array() AS ARRAY<INT>) END")
            init = (f"named_struct('pos', {bp} + 8, "
                    f"'rings', CAST(array() AS ARRAY<{_GEO_POINT_T}>), "
                    f"'bad', false)")
            folded_raw = (
                f"CASE WHEN {ok} AND {bt} = 3 AND {nrings} IS NOT NULL "
                f"AND CAST({nrings} AS BIGINT) * 8 <= length({h}) THEN "
                f"aggregate({ring_idx}, {init}, "
                f"({acc}, {i}) -> {step_body()}) END"
            )
            r = _fresh("r")
            return let(
                {"folded": folded_raw},
                lambda folded: let(
                    {"ok2": (f"({folded} IS NOT NULL AND NOT {folded}.bad "
                             f"AND {folded}.pos - 1 = length({h}) "
                             f"AND NOT exists({folded}.rings, "
                             f"{r} -> NOT {no_bad_coords(r)}))")},
                    lambda ok2: (
                        f"named_struct("
                        f"'srid', CASE WHEN {ok2} THEN {srid} END, "
                        f"'rings', CASE WHEN {ok2} THEN {folded}.rings END)"
                    ),
                ),
            )

        return let(
            {"n": f"TRY_CAST(conv({hex_slice_dyn(h, le, bp, 4)}, 16, 10) AS INT)"},
            with_n,
        )

    return let(
        {"h": h0, "le": le0, "bt": bt0, "srid": srid0, "bp": bp0, "ok0": ok0},
        with_header,
    )


def _sub_geo_len_sql(h: str, pos: str) -> str:
    """SQL-text mirror of exotic._sub_geo_len."""

    def with_bo(le, bo_ok):
        def with_type(t):
            n = (f"CAST(conv({hex_slice_dyn(h, le, f'({pos}) + 10', 4)}, "
                 f"16, 10) AS BIGINT)")

            def ring_fold(nr: str) -> str:
                acc = _fresh("acc")
                i = _fresh("i")
                step = let(
                    {"m": (f"CAST(conv("
                           f"{hex_slice_dyn(h, le, f'({pos}) + {acc}.ln', 4)}, "
                           f"16, 10) AS BIGINT)")},
                    lambda m: (
                        f"named_struct("
                        f"'ln', CASE WHEN {m} IS NOT NULL "
                        f"THEN {acc}.ln + 8 + 32 * {m} ELSE {acc}.ln END, "
                        f"'bad', ({acc}.bad OR {m} IS NULL))"
                    ),
                )
                idx = (f"CASE WHEN {nr} > 0 AND {nr} * 8 <= length({h}) "
                       f"THEN sequence(1, TRY_CAST({nr} AS INT)) "
                       f"ELSE CAST(array() AS ARRAY<INT>) END")
                init = "named_struct('ln', CAST(18 AS BIGINT), 'bad', false)"
                return let(
                    {"f": f"aggregate({idx}, {init}, ({acc}, {i}) -> {step})"},
                    lambda f: f"CASE WHEN NOT {f}.bad THEN {f}.ln END",
                )

            return let(
                {"n": n},
                lambda nv: (
                    f"CASE WHEN {t} = 1 THEN CAST(42 AS BIGINT) "
                    f"WHEN {t} = 2 THEN CASE WHEN {nv} IS NOT NULL "
                    f"THEN 18 + 32 * {nv} END "
                    f"WHEN {t} = 3 THEN CASE WHEN {nv} IS NOT NULL "
                    f"THEN {ring_fold(nv)} END END"
                ),
            )

        return (
            f"CASE WHEN {bo_ok} THEN "
            + let(
                {"t": (f"CAST(conv({hex_slice_dyn(h, le, f'({pos}) + 2', 4)}, "
                       f"16, 10) AS BIGINT)")},
                with_type,
            )
            + " END"
        )

    return let(
        {"le": f"(substr({h}, {pos}, 2) = '01')",
         "bo_ok": f"(substr({h}, {pos}, 2) IN ('00', '01'))"},
        with_bo,
    )


def _wkb_parts_sql(col: str, container_type: int) -> str:
    """SQL-text mirror of exotic._wkb_parts: struct(srid, parts)."""
    h0, le0, bt0, srid0, bp0, ok0 = geo_header(col)

    def with_header(h, le, bt, srid, bp, ok):
        acc = _fresh("acc")
        i = _fresh("i")

        def step_body() -> str:
            return let(
                {"ln": _sub_geo_len_sql(h, f"{acc}.pos")},
                lambda ln: let(
                    {"fits": (f"({ln} IS NOT NULL "
                              f"AND {acc}.pos + {ln} - 1 <= length({h}))")},
                    lambda fits: (
                        f"named_struct("
                        f"'pos', CASE WHEN {fits} THEN {acc}.pos + {ln} "
                        f"ELSE {acc}.pos END, "
                        f"'parts', CASE WHEN {fits} THEN concat({acc}.parts, "
                        f"array(substr({h}, {acc}.pos, {ln}))) "
                        f"ELSE {acc}.parts END, "
                        f"'bad', ({acc}.bad OR NOT {fits}))"
                    ),
                ),
            )

        def with_n(n):
            idx = (f"CASE WHEN {n} > 0 THEN sequence(1, {n}) "
                   f"ELSE CAST(array() AS ARRAY<INT>) END")
            init = (f"named_struct('pos', CAST({bp} + 8 AS BIGINT), "
                    f"'parts', CAST(array() AS ARRAY<STRING>), "
                    f"'bad', false)")
            folded_raw = (
                f"CASE WHEN {ok} AND {bt} = {container_type} "
                f"AND {n} IS NOT NULL "
                f"AND CAST({n} AS BIGINT) * 10 <= length({h}) THEN "
                f"aggregate({idx}, {init}, ({acc}, {i}) -> {step_body()}) END"
            )
            return let(
                {"f": folded_raw},
                lambda f: let(
                    {"ok2": (f"({f} IS NOT NULL AND NOT {f}.bad "
                             f"AND {f}.pos - 1 = length({h}))")},
                    lambda ok2: (
                        f"named_struct("
                        f"'srid', CASE WHEN {ok2} THEN {srid} END, "
                        f"'parts', CASE WHEN {ok2} THEN {f}.parts END)"
                    ),
                ),
            )

        return let(
            {"n": f"TRY_CAST(conv({hex_slice_dyn(h, le, bp, 4)}, 16, 10) AS INT)"},
            with_n,
        )

    return let(
        {"h": h0, "le": le0, "bt": bt0, "srid": srid0, "bp": bp0, "ok0": ok0},
        with_header,
    )


def wkb_multipolygon_sql(col: str) -> str:
    """SQL-text mirror of exotic.wkb_multipolygon: struct(srid, polys)."""
    p = _fresh("p")
    x = _fresh("x")
    return let(
        {"ps": _wkb_parts_sql(col, 6)},
        lambda ps: let(
            {"pg": f"transform({ps}.parts, {p} -> {wkb_polygon_sql(p)})"},
            lambda pg: let(
                {"bad": (f"({ps}.parts IS NULL OR "
                         f"exists({pg}, {x} -> {x}.rings IS NULL))")},
                lambda bad: (
                    f"named_struct("
                    f"'srid', CASE WHEN NOT {bad} THEN {ps}.srid END, "
                    f"'polys', CASE WHEN NOT {bad} THEN "
                    f"transform({pg}, {x} -> {x}.rings) END)"
                ),
            ),
        ),
    )


# -- canonical text renderings for the gate query -----------------------------
#
# Mirrors of q_exotic_types' _let-bound canon wrappers: SRID + quantized
# coordinates (exact: fixture coords are multiples of 1/1024) joined with
# ','/'|'/'/' per nesting level. One SQL string per output column.


def _qtext(c: str) -> str:
    return f"CAST(CAST(round(({c}) * 1024) AS BIGINT) AS STRING)"


def _pt_txt(p: str) -> str:
    return f"concat({_qtext(f'{p}.x')}, ' ', {_qtext(f'{p}.y')})"


def _ring_txt(r: str) -> str:
    p = _fresh("p")
    return f"array_join(transform({r}, {p} -> {_pt_txt(p)}), ',')"


def linestring_canon_sql(col: str) -> str:
    return let(
        {"ls": wkb_linestring_sql(col)},
        lambda ls: (f"CASE WHEN {ls}.points IS NOT NULL THEN concat("
                    f"CAST({ls}.srid AS STRING), ':', "
                    f"{_ring_txt(f'{ls}.points')}) END"),
    )


def polygon_canon_sql(col: str) -> str:
    r = _fresh("r")
    return let(
        {"pg": wkb_polygon_sql(col)},
        lambda pg: (f"CASE WHEN {pg}.rings IS NOT NULL THEN concat("
                    f"CAST({pg}.srid AS STRING), ':', "
                    f"array_join(transform({pg}.rings, "
                    f"{r} -> {_ring_txt(r)}), '|')) END"),
    )


def multipolygon_canon_sql(col: str) -> str:
    rings = _fresh("rs")
    r = _fresh("r")
    return let(
        {"mg": wkb_multipolygon_sql(col)},
        lambda mg: (f"CASE WHEN {mg}.polys IS NOT NULL THEN concat("
                    f"CAST({mg}.srid AS STRING), ':', "
                    f"array_join(transform({mg}.polys, {rings} -> "
                    f"array_join(transform({rings}, {r} -> {_ring_txt(r)}), "
                    f"'|')), '/')) END"),
    )

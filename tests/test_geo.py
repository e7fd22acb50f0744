"""ES 1.x geo queries vs DuckDB oracles (SURVEY §2.5): geo_distance
filter+sort, geo_bounding_box, geo_distance agg, over deterministic
hash-derived coordinates (bit-identical cross-engine, like random_score)."""

from __future__ import annotations

import duckdb
import pytest

from flume_elasticsearch_2_spark.operators.geo import (
    geo_bbox_hits,
    geo_bbox_hits_sql,
    geo_distance_agg,
    geo_distance_agg_sql,
    geo_distance_hits,
    geo_distance_hits_sql,
    geo_enrich,
    parse_distance,
)

CENTER = (48.8566, 2.3522)  # somewhere specific, any point works


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    return con


@pytest.fixture(scope="module")
def geo_docs(documents):
    return geo_enrich(documents)


def test_coordinates_bit_identical(geo_docs, duck):
    got = {
        r["doc_id"]: (r["lat"], r["lon"])
        for r in geo_docs.select("doc_id", "lat", "lon").collect()
    }
    from flume_elasticsearch_2_spark.operators.geo import geo_enrich_sql

    want = {
        i: (la, lo)
        for i, la, lo in duck.execute(
            f"SELECT doc_id, lat, lon FROM ({geo_enrich_sql()})"
        ).fetchall()
    }
    assert got == want  # exact float equality, no rounding


def test_geo_distance_matches_duckdb(geo_docs, duck):
    got = [
        tuple(r)
        for r in geo_distance_hits(geo_docs, *CENTER, "2000km", k=20).collect()
    ]
    want = [
        tuple(r)
        for r in duck.execute(
            geo_distance_hits_sql(*CENTER, "2000km", k=20)
        ).fetchall()
    ]
    assert got == want and got
    assert all(d <= 2000 for _, d in got)
    assert got == sorted(got, key=lambda x: (x[1], x[0]))


def test_geo_bbox_matches_duckdb(geo_docs, duck):
    tl, br = (60.0, -30.0), (20.0, 40.0)
    got = [tuple(r) for r in geo_bbox_hits(geo_docs, tl, br, k=25).collect()]
    want = [tuple(r) for r in duck.execute(geo_bbox_hits_sql(tl, br, k=25)).fetchall()]
    assert got == want and got


def test_geo_distance_agg_matches_duckdb(geo_docs, duck):
    ranges = [(None, 2000.0), (2000.0, 8000.0), (8000.0, None)]
    got = [
        tuple(r) for r in geo_distance_agg(geo_docs, *CENTER, ranges).collect()
    ]
    want = [
        tuple(r)
        for r in duck.execute(geo_distance_agg_sql(*CENTER, ranges)).fetchall()
    ]
    assert got == want
    # rings partition the corpus: counts sum to n_docs
    n = geo_docs.count()
    assert sum(c for _, c in got) == n


def test_distance_parsing():
    assert parse_distance(100) == 100.0
    assert parse_distance("100km") == 100.0
    assert parse_distance("5000m") == 5.0
    assert parse_distance("1mi") == pytest.approx(1.609344)
    with pytest.raises(ValueError):
        parse_distance("3ly")


def test_bbox_validation(geo_docs):
    with pytest.raises(ValueError):
        geo_bbox_hits(geo_docs, (10.0, 40.0), (20.0, -30.0), k=5)
    with pytest.raises(ValueError):
        geo_bbox_hits_sql((10.0, 170.0), (20.0, -170.0))


def test_geo_distance_band_prefilter_is_lossless(geo_docs, duck):
    """The sargable lat-band pre-filter must not drop true hits: compare
    against an unbanded oracle."""
    from flume_elasticsearch_2_spark.operators.geo import (
        geo_enrich_sql,
        haversine_sql,
    )

    r = 3000.0
    d = haversine_sql("lat", "lon", *CENTER)
    brute = duck.execute(f"""
        WITH geo AS ({geo_enrich_sql()})
        SELECT doc_id, round({d}, 6) AS dist_km FROM geo
        WHERE {d} <= {r!r} ORDER BY {d} ASC, doc_id ASC LIMIT 50
    """).fetchall()
    got = [
        tuple(x)
        for x in geo_distance_hits(geo_docs, *CENTER, r, k=50).collect()
    ]
    assert got == [tuple(x) for x in brute] and got


# -- geohash_grid + geo_polygon (round-3 continuation) ---------------------------


def _ref_geohash(lat: float, lon: float, prec: int) -> str:
    """Textbook geohash encoder (successive halving) — the independent
    reference the bit-interleave expression is pinned against."""
    from flume_elasticsearch_2_spark.operators.geo import GEOHASH_ALPHABET

    lat_rng, lon_rng = [-90.0, 90.0], [-180.0, 180.0]
    even, out, ch, nbits = True, "", 0, 0
    while len(out) < prec:
        rng = lon_rng if even else lat_rng
        v = lon if even else lat
        mid = (rng[0] + rng[1]) / 2
        ch <<= 1
        if v >= mid:
            ch |= 1
            rng[0] = mid
        else:
            rng[1] = mid
        even = not even
        nbits += 1
        if nbits == 5:
            out += GEOHASH_ALPHABET[ch]
            ch, nbits = 0, 0
    return out


@pytest.mark.parametrize("prec", [1, 3, 5])
def test_geohash_matches_reference_implementation(geo_docs, prec):
    from flume_elasticsearch_2_spark.operators.geo import geohash_col

    rows = (
        geo_docs.select("lat", "lon", geohash_col("lat", "lon", prec).alias("gh"))
        .limit(100)
        .collect()
    )
    assert rows
    for r in rows:
        assert r.gh == _ref_geohash(r.lat, r.lon, prec), (r.lat, r.lon, prec)


@pytest.mark.parametrize("prec", [2, 5])
def test_geohash_grid_matches_duckdb(geo_docs, duck, prec):
    from flume_elasticsearch_2_spark.operators.geo import (
        geohash_grid_agg,
        geohash_grid_agg_sql,
    )

    got = sorted(
        tuple(r) for r in geohash_grid_agg(geo_docs, precision=prec, size=12).collect()
    )
    want = sorted(duck.execute(geohash_grid_agg_sql(precision=prec, size=12)).fetchall())
    assert got == want and got


def test_geohash_precision_validated(geo_docs):
    from flume_elasticsearch_2_spark.operators.geo import geohash_col

    with pytest.raises(ValueError, match="precision"):
        geohash_col("lat", "lon", 9)


POLY = [(-60.0, -120.0), (70.0, -100.0), (60.0, 80.0), (-40.0, 60.0)]


def test_geo_polygon_matches_duckdb(geo_docs, duck):
    from flume_elasticsearch_2_spark.operators.geo import (
        geo_polygon_hits,
        geo_polygon_hits_sql,
    )

    got = [tuple(r) for r in geo_polygon_hits(geo_docs, POLY, k=25).collect()]
    want = duck.execute(geo_polygon_hits_sql(POLY, k=25)).fetchall()
    assert got == want and got


def test_geo_polygon_semantics_pinned(spark):
    """Ray casting on a hand-checkable square: inside in, outside out,
    concave polygon handled (the even-odd rule, not winding)."""
    from flume_elasticsearch_2_spark.operators.geo import geo_polygon_hits

    pts = [
        (0, 0.0, 0.0), (1, 5.0, 5.0), (2, 20.0, 5.0), (3, 5.0, 20.0),
        (4, -5.0, 5.0), (5, 9.9, 9.9),
    ]
    df = spark.createDataFrame(pts, "doc_id long, lat double, lon double")
    square = [(-10.0, -10.0), (10.0, -10.0), (10.0, 10.0), (-10.0, 10.0)]
    ids = [r.doc_id for r in geo_polygon_hits(df, square, k=10).collect()]
    assert ids == [0, 1, 4, 5]
    # concave "notch": square minus a wedge cut to the center
    notch = [(-10.0, -10.0), (10.0, -10.0), (10.0, 10.0), (0.0, 0.0), (-10.0, 10.0)]
    ids = [r.doc_id for r in geo_polygon_hits(df, notch, k=10).collect()]
    assert 1 not in ids  # (5, 5) sits in the cut wedge
    assert 0 not in ids or True  # boundary vertex — not asserted
    with pytest.raises(ValueError, match="at least 3"):
        geo_polygon_hits(df, [(0.0, 0.0), (1.0, 1.0)])


def test_geo_bounds_matches_duckdb(geo_docs, duck):
    from flume_elasticsearch_2_spark.operators.geo import (
        geo_bounds_agg,
        geo_bounds_agg_sql,
    )

    for q in (None, "window filter"):
        got = [tuple(r) for r in geo_bounds_agg(geo_docs, q).collect()]
        want = [tuple(r) for r in duck.execute(geo_bounds_agg_sql(q)).fetchall()]
        assert got == want, q
    (top, left, bottom, right), = got
    assert bottom <= top and left <= right


def test_geohash_encode_pinned_to_jvm_expression(geo_docs):
    """The pure-Python query-point encoder must equal the JVM doc-side
    expression on real coordinates (three-engine consistency anchor)."""
    from flume_elasticsearch_2_spark.operators.geo import geohash_col, geohash_encode

    rows = geo_docs.select(
        "lat", "lon", geohash_col("lat", "lon", 5).alias("gh")
    ).limit(50).collect()
    for r in rows:
        assert geohash_encode(r["lat"], r["lon"], 5) == r["gh"], (r["lat"], r["lon"])


def test_geohash_cell_matches_duckdb(geo_docs, duck):
    from flume_elasticsearch_2_spark.operators.geo import (
        geohash_cell_hits,
        geohash_cell_hits_sql,
        geohash_encode,
    )

    # anchor the probe on a real doc's position so the cell is non-empty
    p = geo_docs.select("lat", "lon").first()
    for prec in (2, 3):
        got = [tuple(r) for r in
               geohash_cell_hits(geo_docs, p["lat"], p["lon"], prec, k=50).collect()]
        want = duck.execute(
            geohash_cell_hits_sql(p["lat"], p["lon"], prec, k=50)
        ).fetchall()
        assert got == want and got, prec
        cell = geohash_encode(p["lat"], p["lon"], prec)
        ids = {i for i, _, _ in got}
        # membership property: exactly the docs whose own geohash prefixes match
        from flume_elasticsearch_2_spark.operators.geo import geohash_col as _gc
        member = {r["doc_id"] for r in geo_docs
                  .where(_gc("lat", "lon", prec) == cell).collect()}
        assert ids <= member


def test_geo_distance_range_matches_duckdb(geo_docs, duck):
    from flume_elasticsearch_2_spark.operators.geo import (
        geo_distance_range_hits,
        geo_distance_range_hits_sql,
    )

    got = [tuple(r) for r in
           geo_distance_range_hits(geo_docs, *CENTER, "800km", "2500km", k=20).collect()]
    want = [tuple(r) for r in duck.execute(
        geo_distance_range_hits_sql(*CENTER, "800km", "2500km", k=20)).fetchall()]
    assert got == want and got


def test_geo_distance_range_annulus_bounds(geo_docs):
    """gte inclusive / lt exclusive: the ring's hits are exactly the outer
    disk minus the inner OPEN disk (d < gte drops, d >= lt drops)."""
    from flume_elasticsearch_2_spark.operators.geo import geo_distance_range_hits

    ring = geo_distance_range_hits(geo_docs, *CENTER, 800.0, 2500.0, k=10_000).collect()
    assert ring and all(800.0 <= r.dist_km < 2500.0 for r in ring)
    outer = {r.doc_id for r in
             geo_distance_hits(geo_docs, *CENTER, 2500.0, k=10_000).collect()
             if r.dist_km < 2500.0 and r.dist_km >= 800.0}
    assert {r.doc_id for r in ring} == outer
    with pytest.raises(ValueError, match="gte < lt"):
        geo_distance_range_hits(geo_docs, *CENTER, 2500.0, 800.0)


# -- round-5 geo_shape query ---------------------------------------------------

SHAPE_ENV = {"type": "envelope", "coordinates": [[-30.0, 60.0], [40.0, 20.0]]}
SHAPE_POLY = {"type": "polygon", "coordinates": [
    [[-30.0, 20.0], [40.0, 20.0], [40.0, 60.0], [-30.0, 60.0], [-30.0, 20.0]]
]}
SHAPE_PT = {"type": "point", "coordinates": [10.0, 45.0]}


@pytest.fixture(scope="module")
def shape_docs(documents):
    from flume_elasticsearch_2_spark.operators.geo import geo_shape_enrich

    return geo_shape_enrich(documents)


def test_geo_shape_envelope_relations_match_duckdb(shape_docs, duck):
    from flume_elasticsearch_2_spark.operators.geo import (
        geo_shape_hits,
        geo_shape_hits_sql,
    )

    for rel in ("intersects", "disjoint", "within"):
        got = [tuple(r) for r in geo_shape_hits(shape_docs, SHAPE_ENV, rel, k=20).collect()]
        want = [tuple(r) for r in duck.execute(geo_shape_hits_sql(SHAPE_ENV, rel, k=20)).fetchall()]
        assert got == want and got, rel
    # a point query shape is a zero-area envelope
    got = [tuple(r) for r in geo_shape_hits(shape_docs, SHAPE_PT, "intersects", k=20).collect()]
    want = [tuple(r) for r in duck.execute(geo_shape_hits_sql(SHAPE_PT, "intersects", k=20)).fetchall()]
    assert got == want


def test_geo_shape_relations_partition_the_corpus(shape_docs):
    """intersects + disjoint partition all docs; within is a subset of
    intersects (a doc envelope inside the query envelope overlaps it)."""
    from flume_elasticsearch_2_spark.operators.geo import geo_shape_envelope_pred

    n = shape_docs.count()
    ni = shape_docs.where(geo_shape_envelope_pred(SHAPE_ENV, "intersects")).count()
    nd = shape_docs.where(geo_shape_envelope_pred(SHAPE_ENV, "disjoint")).count()
    nw = shape_docs.where(geo_shape_envelope_pred(SHAPE_ENV, "within")).count()
    both = shape_docs.where(
        geo_shape_envelope_pred(SHAPE_ENV, "within")
        & ~geo_shape_envelope_pred(SHAPE_ENV, "intersects")
    ).count()
    assert ni + nd == n and 0 < nw < ni and both == 0


def test_geo_shape_polygon_over_points_matches_duckdb_and_kernel(geo_docs, duck):
    from flume_elasticsearch_2_spark.operators.geo import (
        geo_polygon_hits,
        geo_shape_point_hits,
        geo_shape_point_hits_sql,
    )

    for rel in ("intersects", "disjoint"):
        got = [tuple(r) for r in geo_shape_point_hits(geo_docs, SHAPE_POLY, rel, k=20).collect()]
        want = [tuple(r) for r in duck.execute(
            geo_shape_point_hits_sql(SHAPE_POLY, rel, k=20)
        ).fetchall()]
        assert got == want and got, rel
    # the polygon path IS the geo_polygon even-odd kernel (same edge terms)
    a = [tuple(r) for r in geo_shape_point_hits(geo_docs, SHAPE_POLY, "intersects", k=20).collect()]
    b = [tuple(r) for r in geo_polygon_hits(
        geo_docs, [(20.0, -30.0), (20.0, 40.0), (60.0, 40.0), (60.0, -30.0)], k=20
    ).collect()]
    assert a == b


def test_geo_shape_refusals(shape_docs, geo_docs):
    from flume_elasticsearch_2_spark.operators.geo import (
        geo_shape_hits,
        geo_shape_point_hits,
    )

    with pytest.raises(ValueError, match="polygon query shape over envelope"):
        geo_shape_hits(shape_docs, SHAPE_POLY)
    with pytest.raises(ValueError, match="measure-zero"):
        geo_shape_point_hits(geo_docs, SHAPE_PT)
    with pytest.raises(ValueError, match="relation"):
        geo_shape_hits(shape_docs, SHAPE_ENV, "contains")
    with pytest.raises(ValueError, match="minLon"):
        geo_shape_hits(shape_docs, {"type": "envelope",
                                    "coordinates": [[40.0, 20.0], [-30.0, 60.0]]})
    with pytest.raises(ValueError, match="type"):
        geo_shape_hits(shape_docs, {"coordinates": []})

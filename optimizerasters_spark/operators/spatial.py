"""Spatial operators: tile assignment, cell-cover point-in-polygon join,
radius-bounded kNN.

Scale notes (100 TB design):
  * tile/cell assignment is pure column arithmetic — no shuffle, folds into
    the scan stage (whole-stage codegen).
  * PIP join is the classic theta-join made EQUI by grid-cover
    discretization (the reference's pixel->512-block idea,
    OptimizeRasters.py:3992-3998): each polygon is expanded (driver-side,
    dimension is small) into the set of coarse grid cells its bbox covers,
    that cover table is BROADCAST, pages equi-join on their coarse cell,
    and the exact predicate refines. Pages never shuffle.
  * kNN is radius-bounded: candidates = pages whose coarse cell is in the
    query point's k-ring (broadcast), then window row_number per query.
    Integer millidegree distances -> no float tie ambiguity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from optimizerasters_spark import tiling
from optimizerasters_spark.pages import WORLD_H, WORLD_W

# Coarse cell resolution for cover joins (millidegree domain).
COVER_CELL_MD = 10000  # 10-degree-ish cells -> 36 x 17 grid


def with_tiles(pages: DataFrame, world_w: int = WORLD_W,
               world_h: int = WORLD_H,
               block: int = tiling.DEFAULT_BLOCK_SIZE) -> DataFrame:
    """Assign level-0 tile coords on the declared world raster. Pure
    projection — no shuffle."""
    px_x = F.floor(F.col("lon_md") * world_w / 360000)
    px_y = F.floor(F.col("lat_md") * world_h / 170000)
    return (pages
            .withColumn("tile_x", F.floor(px_x / block).cast("int"))
            .withColumn("tile_y", F.floor(px_y / block).cast("int")))


def tile_counts_at_levels(pages_with_tiles: DataFrame,
                          levels: list[int]) -> DataFrame:
    """Page counts per tile per pyramid level.

    Scale-first, two shuffles total regardless of level count:
      1. aggregate level 0 ONCE — the only shuffle proportional to page
         count (map-side partial combine does most of the work);
      2. explode the (tiny) level-0 tile table across the level list and
         re-aggregate with the per-level bit shift.
    gdaladdo's N-from-(N-1) iteration (OptimizeRasters.py:5060-5143) is
    semantically identical because counts are associative; a union of
    chained reductions would re-execute the shared prefix per branch."""
    return levels_from_l0(tile_counts_l0(pages_with_tiles), levels)


def tile_counts_l0(pages_with_tiles: DataFrame) -> DataFrame:
    """Level-0 tile counts — the ASSOCIATIVE base table: counts from
    disjoint page batches merge additively (union + re-sum), which is
    what makes the engine's finalize incremental."""
    return (pages_with_tiles
            .groupBy("tile_x", "tile_y")
            .agg(F.count(F.lit(1)).alias("page_count")))


def merge_l0(base: DataFrame, delta: DataFrame) -> DataFrame:
    """Additive merge of level-0 count tables (counts are associative).
    Shuffle is proportional to the TILE table, never to pages."""
    return (base.unionByName(delta)
            .groupBy("tile_x", "tile_y")
            .agg(F.sum("page_count").alias("page_count")))


def levels_from_l0(l0: DataFrame, levels: list[int]) -> DataFrame:
    """Explode the (tiny) level-0 tile table across the level list and
    re-aggregate with the per-level bit shift."""
    lv = F.explode(F.array(*[F.lit(int(x)) for x in sorted(levels)]))
    return (l0.select(lv.alias("level"), "tile_x", "tile_y", "page_count")
            .groupBy("level",
                     F.expr("shiftright(tile_x, level)").alias("tile_x"),
                     F.expr("shiftright(tile_y, level)").alias("tile_y"))
            .agg(F.sum("page_count").alias("page_count")))


def zorder_key(x, y, bits: int = 16) -> F.Column:
    """Morton/Z-order interleave of two non-negative grid coordinates
    (x bit b -> key bit 2b, y bit b -> key bit 2b+1) — the
    space-filling-curve sort key that makes RANGE partitioning
    spatially local: neighboring tiles land in the same file/partition,
    so bbox queries prune most of a 100 TB table instead of scanning
    it (the Iceberg/Delta 'z-ordering' layout lever, computed here as
    a pure column expression — literal shifts only, whole-stage
    codegen, no UDF)."""
    total = F.lit(0).cast("bigint")
    for b in range(bits):
        total = (total
                 + F.shiftleft(F.shiftright(x, b).bitwiseAND(1)
                               .cast("bigint"), 2 * b)
                 + F.shiftleft(F.shiftright(y, b).bitwiseAND(1)
                               .cast("bigint"), 2 * b + 1))
    return total


def polyfill_ring(polys: DataFrame, res_md: int = 1000,
                  id_col: str = "polygon_id",
                  v_col: str = "vertices") -> DataFrame:
    """H3/S2-``polyfill`` analog on the integer millidegree grid:
    every res_md-cell whose CENTER lies inside the arbitrary simple
    ring, by the same pure-Catalyst even-odd ray cast as
    pip_join_ring. Candidate cells explode DISTRIBUTED from each
    polygon's vertex bbox (sequence + explode — never a driver loop),
    centers stay integer-exact (cell*res + res/2, res even). Output
    (polygon_id, cell_x, cell_y) — the materialized cover a tile job
    plans from; compact_cells shrinks it to the minimal multi-level
    form."""
    xs = F.transform(F.col(v_col), lambda p: p["x"])
    ys = F.transform(F.col(v_col), lambda p: p["y"])
    cx0 = F.floor(F.array_min(xs) / res_md).cast("bigint")
    cx1 = F.floor(F.array_max(xs) / res_md).cast("bigint")
    cy0 = F.floor(F.array_min(ys) / res_md).cast("bigint")
    cy1 = F.floor(F.array_max(ys) / res_md).cast("bigint")
    cand = (polys
            .select(id_col, v_col,
                    F.explode(F.sequence(cx0, cx1)).alias("cell_x"),
                    cy0.alias("_cy0"), cy1.alias("_cy1"))
            .select(id_col, v_col, "cell_x",
                    F.explode(F.sequence("_cy0", "_cy1"))
                    .alias("cell_y")))
    half = res_md // 2
    inside = _inside_ring(F.col("cell_x") * res_md + half,
                          F.col("cell_y") * res_md + half,
                          F.col(v_col))
    return cand.where(inside).select(id_col, "cell_x", "cell_y")


def segment_cells(segments: DataFrame, id_col: str = "seg_id"
                  ) -> DataFrame:
    """Line -> cells: the grid cells a segment traverses, by exact
    half-cell-step sampling — 2·max(|dx|,|dy|)+1 evenly spaced points
    interpolated in INTEGER arithmetic (floor((p0·(2n−k)+p1·k)/2n),
    non-negative domain), distinct cells kept. Completes the
    vector->raster matrix (points: rasterize_tiles, polygons:
    polyfill_ring, LINES: here) — trajectory/route binning for
    road-network or movement data at corpus scale. Half-cell sampling
    yields a connected, deterministic trace (the documented contract;
    a corner-clipped cell whose intersection is shorter than half a
    cell may be skipped — the supercover variant slots in behind the
    same output columns). One explode, no shuffle until the caller
    aggregates."""
    dx = F.abs(F.col("x1") - F.col("x0"))
    dy = F.abs(F.col("y1") - F.col("y0"))
    n2 = F.greatest(dx, dy) * 2
    ks = F.explode(F.sequence(F.lit(0), n2))
    cand = segments.select(id_col, "x0", "y0", "x1", "y1",
                           n2.alias("_n2"), ks.alias("k"))
    # integer div == floor on the non-negative grid (matches DuckDB //)
    interp = lambda a, b: F.when(  # noqa: E731
        F.col("_n2") == 0, F.col(a).cast("bigint")).otherwise(
        F.expr(f"({a} * (_n2 - k) + {b} * k) div _n2").cast("bigint"))
    return (cand.select(id_col,
                        interp("x0", "x1").alias("cell_x"),
                        interp("y0", "y1").alias("cell_y"))
            .distinct())


def compact_cells(cells: DataFrame, max_level: int = 3,
                  x_col: str = "tile_x", y_col: str = "tile_y"
                  ) -> DataFrame:
    """Quadtree compaction — H3/S2 ``compact`` semantics on the tile
    grid: every COMPLETE 2x2 sibling quadruple is replaced by its
    parent, recursively up to ``max_level``, yielding the minimal
    multi-level cover of an occupied cell set (coverage manifests,
    tile-job planning, polygon covers). Returns (level, tile_x,
    tile_y) with level 0 = input resolution; coords at level L are the
    level-0 coords shifted right L bits (non-negative world grid).

    Scale shape: page→cell assignment stayed in the scan stage
    upstream; every round here shuffles only the CELL table (tiny vs
    pages) keyed on the parent cell, and the table shrinks
    monotonically — max_level rounds of vanishing aggregations."""
    cur = (cells.select(F.col(x_col).alias("tile_x"),
                        F.col(y_col).alias("tile_y"))
           .distinct())
    out = None
    for lvl in range(max_level):
        full = (cur.groupBy(F.expr("shiftright(tile_x, 1)").alias("px"),
                            F.expr("shiftright(tile_y, 1)").alias("py"))
                .agg(F.count(F.lit(1)).alias("nchild"))
                .where(F.col("nchild") == 4)
                .select("px", "py"))
        kept = cur.join(
            full,
            (F.expr("shiftright(tile_x, 1)") == full["px"]) &
            (F.expr("shiftright(tile_y, 1)") == full["py"]),
            "left_anti")
        part = kept.select(F.lit(lvl).cast("int").alias("level"),
                           "tile_x", "tile_y")
        out = part if out is None else out.unionByName(part)
        cur = full.select(F.col("px").alias("tile_x"),
                          F.col("py").alias("tile_y"))
    top = cur.select(F.lit(max_level).cast("int").alias("level"),
                     "tile_x", "tile_y")
    return out.unionByName(top) if out is not None else top


def pyramid_reduce_iterative(l0: DataFrame, max_level: int,
                             value_col: str = "val") -> DataFrame:
    """gdaladdo-faithful ITERATIVE pyramid: each level L+1 tile derives
    from its (up to 4) level-L children, like createaOverview builds
    level N from N-1 (OptimizeRasters.py:5060-5143) — required for the
    non-associative resamplers, where a single jump from level 0 gives
    different answers than the level-by-level chain:

      * ``avg_val``  — PyramidSampling average/avg: floor(sum/count)
        over the PRESENT children (integer-exact; floors compound per
        level exactly as repeated integer resampling does);
      * ``near_val`` — PyramidSampling nearest: the top-left present
        child's value (min (y, x) — deterministic tie-free pick).

    Count-like SUM pyramids don't need this (associative — see
    levels_from_l0); value rasters (mean quality per tile, elevation
    bins) do. Cost: max_level small shuffles over the TILE table, each
    a quarter the size of the last — a geometric series bounded by 2x
    the level-1 shuffle."""
    cur = l0.select(
        "tile_x", "tile_y",
        F.col(value_col).cast("bigint").alias("avg_val"),
        F.col(value_col).cast("bigint").alias("near_val"))
    out = cur.withColumn("level", F.lit(0).cast("int"))
    for lv in range(1, max_level + 1):
        child_key = (F.col("tile_y").cast("bigint") * F.lit(1 << 31) +
                     F.col("tile_x"))
        cur = (cur.groupBy(
                   F.expr("shiftright(tile_x, 1)").alias("tile_x"),
                   F.expr("shiftright(tile_y, 1)").alias("tile_y"))
               .agg(F.expr("sum(avg_val) div count(1)").alias("avg_val"),
                    F.min_by("near_val", child_key).alias("near_val")))
        out = out.unionByName(
            cur.withColumn("level", F.lit(lv).cast("int")))
    return out.select("level", "tile_x", "tile_y", "avg_val", "near_val")


def polygon_cover_df(boundaries: DataFrame,
                     cell_md: int = COVER_CELL_MD) -> DataFrame:
    """Distributed cover expansion: polygons -> (polygon_id, cell) rows
    via explode(sequence) on the bbox — no driver collect, so the
    polygon side can itself be a large table (county/parcel scale).
    Output size = sum of covered cells per polygon; still broadcast-able
    whenever it fits, and Catalyst decides."""
    cx = F.explode(F.sequence(
        F.floor(F.col("lon_lo_md") / cell_md),
        F.floor((F.col("lon_hi_md") - 1) / cell_md))).alias("cx")
    with_cx = boundaries.select("polygon_id", "lat_lo_md", "lat_hi_md", cx)
    cy = F.explode(F.sequence(
        F.floor(F.col("lat_lo_md") / cell_md),
        F.floor((F.col("lat_hi_md") - 1) / cell_md))).alias("cy")
    return (with_cx.select("polygon_id", "cx", cy)
            .select("polygon_id",
                    tiling.pack_cell_col(F.col("cx"), F.col("cy"))
                    .alias("cell")))


def pip_join(pages: DataFrame, boundaries: DataFrame,
             cell_md: int = COVER_CELL_MD, how: str = "inner") -> DataFrame:
    """Point-in-polygon equi-join via broadcast cell cover.

    Emits one row per (page, containing polygon); half-open box semantics
    [lo, hi). ``how='left'`` keeps pages matching no polygon (polygon_id
    NULL) — the reference's raster/non-raster split analog.

    The cover table is built DISTRIBUTED (polygon_cover_df) and
    broadcast; the pages side never shuffles. The inner path carries
    the polygon's FULL row (bbox included) through the cover explode,
    so refinement needs ONE broadcast probe per page instead of a
    second polygon_id join over the whole page table (r06: two
    BroadcastHashJoin -> one; the cover stays tiny — cells-per-polygon
    x the dimension row)."""
    if how == "inner":
        cx = F.explode(F.sequence(
            F.floor(F.col("lon_lo_md") / cell_md),
            F.floor((F.col("lon_hi_md") - 1) / cell_md))).alias("cx")
        cy = F.explode(F.sequence(
            F.floor(F.col("lat_lo_md") / cell_md),
            F.floor((F.col("lat_hi_md") - 1) / cell_md))).alias("cy")
        cover = (boundaries.select(*boundaries.columns, cx)
                 .select(*boundaries.columns, "cx", cy)
                 .select(*boundaries.columns,
                         tiling.pack_cell_col(F.col("cx"), F.col("cy"))
                         .alias("cell")))
        cands = pages.withColumn(
            "cell",
            tiling.pack_cell_col(F.floor(F.col("lon_md") / cell_md),
                                 F.floor(F.col("lat_md") / cell_md)),
        ).join(F.broadcast(cover), "cell", "inner")
        return cands.where((F.col("lon_md") >= F.col("lon_lo_md")) &
                           (F.col("lon_md") < F.col("lon_hi_md")) &
                           (F.col("lat_md") >= F.col("lat_lo_md")) &
                           (F.col("lat_md") < F.col("lat_hi_md")))
    cover = polygon_cover_df(boundaries, cell_md)
    cands = pages.withColumn(
        "cell",
        tiling.pack_cell_col(F.floor(F.col("lon_md") / cell_md),
                             F.floor(F.col("lat_md") / cell_md)),
    ).join(F.broadcast(cover), "cell", "left")
    # left: ZERO page shuffle, single scan. The cover table pre-aggregates
    # per cell into cell -> array<struct(polygon_id, bbox)> (one tiny
    # Exchange on the DIMENSION side, under the broadcast), the pages
    # join it 1:1 on cell — each page stays ONE row through the join —
    # and refinement is a map-side filter() over the broadcast array;
    # explode re-emits one row per match, or exactly one NULL row when
    # no polygon refines. The round-2 shape recovered non-hits with a
    # groupBy(doc_id) collect_list, which shuffled every page WITH its
    # payload — the corpus text — once; this shape shuffles nothing on
    # the pages side (mirror of the inner path's plan guarantee,
    # asserted in tests/test_plans.py).
    cell_polys = (cover.join(boundaries, "polygon_id")
                  .groupBy("cell")
                  .agg(F.sort_array(F.collect_list(F.struct(
                      "polygon_id", "lon_lo_md", "lon_hi_md",
                      "lat_lo_md", "lat_hi_md"))).alias("_cands")))
    joined = pages.withColumn(
        "cell",
        tiling.pack_cell_col(F.floor(F.col("lon_md") / cell_md),
                             F.floor(F.col("lat_md") / cell_md)),
    ).join(F.broadcast(cell_polys), "cell", "left")
    lon, lat = F.col("lon_md"), F.col("lat_md")
    hits = F.transform(
        F.filter(
            "_cands",
            lambda p: (lon >= p["lon_lo_md"]) & (lon < p["lon_hi_md"]) &
                      (lat >= p["lat_lo_md"]) & (lat < p["lat_hi_md"])),
        lambda p: p["polygon_id"])
    polys_or_null = F.when(F.size(hits) > 0, hits) \
        .otherwise(F.array(F.lit(None).cast("bigint")))
    return joined.select(
        *pages.columns,
        F.explode(polys_or_null).alias("polygon_id"))


def polygon_vertices_cover(polys: DataFrame,
                           cell_md: int = COVER_CELL_MD) -> DataFrame:
    """Vertex-list polygons -> (polygon_id, cell) cover rows via the
    bbox of the vertex array (min/max are pure array aggregates) —
    distributed exactly like polygon_cover_df."""
    vx = F.transform(F.col("vertices"), lambda v: v["x"])
    vy = F.transform(F.col("vertices"), lambda v: v["y"])
    boxed = polys.select(
        "polygon_id", "vertices",
        F.array_min(vx).alias("lon_lo_md"),
        (F.array_max(vx) + 1).alias("lon_hi_md"),
        F.array_min(vy).alias("lat_lo_md"),
        (F.array_max(vy) + 1).alias("lat_hi_md"))
    cx = F.explode(F.sequence(
        F.floor(F.col("lon_lo_md") / cell_md),
        F.floor((F.col("lon_hi_md") - 1) / cell_md))).alias("cx")
    with_cx = boxed.select("polygon_id", "vertices",
                           "lat_lo_md", "lat_hi_md", cx)
    cy = F.explode(F.sequence(
        F.floor(F.col("lat_lo_md") / cell_md),
        F.floor((F.col("lat_hi_md") - 1) / cell_md))).alias("cy")
    return (with_cx.select("polygon_id", "vertices", "cx", cy)
            .select("polygon_id", "vertices",
                    tiling.pack_cell_col(F.col("cx"), F.col("cy"))
                    .alias("cell")))


def _inside_convex(lon, lat, vertices) -> F.Column:
    """Point strictly-or-boundary inside a CCW convex polygon: the cross
    product (v2-v1) x (p-v1) is >= 0 for every edge. Integer millidegree
    coords -> exact arithmetic, no epsilon, oracle-identical on any
    engine."""
    n = F.size(vertices)
    edges = F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: F.struct(
            F.get(vertices, i).alias("a"),
            F.get(vertices, F.pmod(i + 1, n)).alias("b")))
    return F.forall(
        edges,
        lambda e: ((e["b"]["x"] - e["a"]["x"]) * (lat - e["a"]["y"]) -
                   (e["b"]["y"] - e["a"]["y"]) * (lon - e["a"]["x"]))
        >= 0)


def pip_join_convex(pages: DataFrame, polys: DataFrame,
                    cell_md: int = COVER_CELL_MD) -> DataFrame:
    """Point-in-polygon join against REAL (convex, CCW, integer-vertex)
    polygons — the shape beyond the half-open-bbox form: cover equi-join
    on the bbox grid cells (broadcast, pages never shuffle), exact
    refinement by the all-edges cross-product test, entirely in Catalyst
    (forall over the vertex array — no UDF, no epsilon). Non-convex
    polygons decompose into convex pieces upstream (standard practice);
    a shapely-backed pandas-UDF refiner slots into the same candidate
    stream when arbitrary rings are needed (the UDF-boundary parity of
    that slot is proven by cell_encode's twin test)."""
    cover = polygon_vertices_cover(polys, cell_md)
    cands = pages.withColumn(
        "cell",
        tiling.pack_cell_col(F.floor(F.col("lon_md") / cell_md),
                             F.floor(F.col("lat_md") / cell_md)),
    ).join(F.broadcast(cover), "cell")
    return cands.where(_inside_convex(F.col("lon_md"), F.col("lat_md"),
                                      F.col("vertices"))) \
        .drop("cell", "vertices")


def _inside_ring(lon, lat, vertices) -> F.Column:
    """Point inside an ARBITRARY simple ring (convexity not required) by
    the even-odd ray cast: shoot a +x horizontal ray from the point and
    count edges that straddle its y and cross strictly to the right.
    Integer-exact: the crossing-x comparison is the sign of the
    edge-point cross product matched against the edge's y direction —
    no division, no epsilon, oracle-identical on any engine. Boundary
    semantics are the half-open convention of the classic PNPOLY test
    (deterministic; a point exactly on an edge lands consistently)."""
    n = F.size(vertices)
    edges = F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: F.struct(
            F.get(vertices, i).alias("a"),
            F.get(vertices, F.pmod(i + 1, n)).alias("b")))

    def crossing(e):
        a, b = e["a"], e["b"]
        straddle = (a["y"] > lat) != (b["y"] > lat)
        cross = ((b["x"] - a["x"]) * (lat - a["y"]) -
                 (b["y"] - a["y"]) * (lon - a["x"]))
        right = F.when(b["y"] > a["y"], cross > 0).otherwise(cross < 0)
        return straddle & right

    return F.size(F.filter(edges, crossing)) % 2 == 1


def pip_join_ring(pages: DataFrame, polys: DataFrame,
                  cell_md: int = COVER_CELL_MD) -> DataFrame:
    """Point-in-polygon join against ARBITRARY simple rings (non-convex
    admin boundaries — the real-boundary shape SURVEY §2.3 J4 calls
    for; the reference delegates the equivalent grid containment to
    GDAL georeferencing, OptimizeRasters.py:1404-1416). Same plan as
    pip_join_convex: bbox-cell cover equi-join (broadcast — pages never
    shuffle), then exact even-odd ray-cast refinement entirely in
    Catalyst (filter + size over the vertex array — no UDF). A
    shapely-backed pandas-UDF refiner slots into the same candidate
    stream (functions/geo.make_ring_pip_udf is the Arrow twin, held
    value-equal by test)."""
    cover = polygon_vertices_cover(polys, cell_md)
    cands = pages.withColumn(
        "cell",
        tiling.pack_cell_col(F.floor(F.col("lon_md") / cell_md),
                             F.floor(F.col("lat_md") / cell_md)),
    ).join(F.broadcast(cover), "cell")
    return cands.where(_inside_ring(F.col("lon_md"), F.col("lat_md"),
                                    F.col("vertices"))) \
        .drop("cell", "vertices")


def knn_per_query(pages: DataFrame, query_points: list[tuple[int, int, int]],
                  k: int = 5, radius_md: int = 1000) -> DataFrame:
    """Radius-bounded kNN: for each (query_id, qlon_md, qlat_md) return the
    k nearest pages within ``radius_md`` (squared integer millidegree
    distance; ties broken by doc_id — fully deterministic).

    Scale path: the query side is broadcast; pages are scanned once and
    pre-filtered by the bbox predicate BEFORE the shuffle, so the window
    only sorts candidate rows (tiny) rather than the full table."""
    spark = pages.sparkSession
    q = spark.createDataFrame(query_points,
                              "query_id BIGINT, qlon_md BIGINT, qlat_md BIGINT")
    cand = pages.join(
        F.broadcast(q),
        (F.col("lon_md") >= F.col("qlon_md") - radius_md) &
        (F.col("lon_md") <= F.col("qlon_md") + radius_md) &
        (F.col("lat_md") >= F.col("qlat_md") - radius_md) &
        (F.col("lat_md") <= F.col("qlat_md") + radius_md),
    ).withColumn(
        "dist2",
        (F.col("lon_md") - F.col("qlon_md")) *
        (F.col("lon_md") - F.col("qlon_md")) +
        (F.col("lat_md") - F.col("qlat_md")) *
        (F.col("lat_md") - F.col("qlat_md")),
    ).where(F.col("dist2") <= radius_md * radius_md)
    w = Window.partitionBy("query_id").orderBy(F.col("dist2").asc(),
                                               F.col("doc_id").asc())
    return (cand.withColumn("knn_rank", F.row_number().over(w))
            .where(F.col("knn_rank") <= k)
            .select("query_id", F.col("knn_rank").cast("int").alias("knn_rank"),
                    "doc_id", F.col("dist2").cast("bigint").alias("dist2")))


def knn_kring_df(pages: DataFrame, queries: DataFrame, k: int = 5,
                 cell_md: int = 1000, ring: int = 1) -> DataFrame:
    """DataFrame-native k-ring kNN: the query side is a TABLE
    (query_id, qlon_md, qlat_md) and its (2*ring+1)^2 ring cells expand
    DISTRIBUTED via explode(sequence) — no driver-side loop, so the
    query set can itself be large (the reference's batch-of-AOIs case).
    Identical semantics to knn_kring; pages equi-join the ring table on
    their existing cell column and never shuffle when the ring table
    broadcasts."""
    dx = F.explode(F.sequence(F.lit(-ring), F.lit(ring))).alias("dx")
    with_dx = queries.select("query_id", "qlon_md", "qlat_md", dx)
    dy = F.explode(F.sequence(F.lit(-ring), F.lit(ring))).alias("dy")
    ring_df = (with_dx.select("query_id", "qlon_md", "qlat_md", "dx", dy)
               .select("query_id", "qlon_md", "qlat_md",
                       tiling.pack_cell_col(
                           F.floor(F.col("qlon_md") / cell_md) + F.col("dx"),
                           F.floor(F.col("qlat_md") / cell_md) + F.col("dy"))
                       .alias("cell")))
    radius = ring * cell_md
    cand = (pages.withColumn(
                "cell",
                tiling.pack_cell_col(F.floor(F.col("lon_md") / cell_md),
                                     F.floor(F.col("lat_md") / cell_md)))
            .join(F.broadcast(ring_df), "cell")
            .withColumn(
                "dist2",
                (F.col("lon_md") - F.col("qlon_md")) *
                (F.col("lon_md") - F.col("qlon_md")) +
                (F.col("lat_md") - F.col("qlat_md")) *
                (F.col("lat_md") - F.col("qlat_md")))
            .where(F.col("dist2") <= radius * radius))
    w = Window.partitionBy("query_id").orderBy(F.col("dist2").asc(),
                                               F.col("doc_id").asc())
    return (cand.withColumn("knn_rank", F.row_number().over(w))
            .where(F.col("knn_rank") <= k)
            .select("query_id",
                    F.col("knn_rank").cast("int").alias("knn_rank"),
                    "doc_id", F.col("dist2").cast("bigint").alias("dist2")))


def knn_kring(pages: DataFrame, query_points: list[tuple[int, int, int]],
              k: int = 5, cell_md: int = 1000, ring: int = 1) -> DataFrame:
    """Cell-bucketed kNN (SURVEY.md J5): pages carry their grid cell;
    each query point expands to its (2*ring+1)^2 k-ring of cells
    (driver-side — query set is small), the ring table is broadcast, and
    candidates equi-join on cell. Identical results to the bbox form for
    radius = ring * cell_md (every point within that radius lies in the
    ring; the dist2 filter trims corners).

    At scale this is the shape that wins: the big side never shuffles —
    it equi-joins an existing integer column against a broadcast ring
    table, and the per-query window sorts only candidate cells'
    contents."""
    spark = pages.sparkSession
    rows = []
    for (qid, qlon, qlat) in query_points:
        cx0, cy0 = qlon // cell_md, qlat // cell_md
        for dx in range(-ring, ring + 1):
            for dy in range(-ring, ring + 1):
                rows.append((qid, qlon, qlat,
                             tiling.pack_cell(cx0 + dx, cy0 + dy)))
    ring_df = spark.createDataFrame(
        rows, "query_id BIGINT, qlon_md BIGINT, qlat_md BIGINT, cell BIGINT")
    radius = ring * cell_md
    cand = (pages.withColumn(
                "cell",
                tiling.pack_cell_col(F.floor(F.col("lon_md") / cell_md),
                                     F.floor(F.col("lat_md") / cell_md)))
            .join(F.broadcast(ring_df), "cell")
            .withColumn(
                "dist2",
                (F.col("lon_md") - F.col("qlon_md")) *
                (F.col("lon_md") - F.col("qlon_md")) +
                (F.col("lat_md") - F.col("qlat_md")) *
                (F.col("lat_md") - F.col("qlat_md")))
            .where(F.col("dist2") <= radius * radius))
    w = Window.partitionBy("query_id").orderBy(F.col("dist2").asc(),
                                               F.col("doc_id").asc())
    return (cand.withColumn("knn_rank", F.row_number().over(w))
            .where(F.col("knn_rank") <= k)
            .select("query_id",
                    F.col("knn_rank").cast("int").alias("knn_rank"),
                    "doc_id", F.col("dist2").cast("bigint").alias("dist2")))


def ring_stats(polys: DataFrame) -> DataFrame:
    """Shoelace area + winding order for vertex-array rings: area2 =
    sum of edge cross products (TWICE the signed area — kept doubled so
    it stays an exact integer; positive = counter-clockwise). The
    upstream normalizer for both PIP refiners: _inside_convex requires
    CCW input, and real-world boundary files mix winding freely, so a
    100 TB ingest runs this first and flips CW rings (reverse the
    array). Pure aggregate over the vertex array — codegen, no
    shuffle."""
    vs = F.col("vertices")
    n = F.size(vs)
    area2 = F.aggregate(
        F.sequence(F.lit(0), n - 1),
        F.lit(0).cast("bigint"),
        lambda acc, i: acc +
        (F.get(vs, i)["x"] * F.get(vs, F.pmod(i + 1, n))["y"] -
         F.get(vs, F.pmod(i + 1, n))["x"] * F.get(vs, i)["y"]))
    return polys.select(
        "polygon_id",
        area2.alias("area2"),
        (area2 > 0).alias("is_ccw"),
        n.cast("int").alias("n_vertices"))

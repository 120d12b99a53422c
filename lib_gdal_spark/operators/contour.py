"""Contour generation: marching squares over the cell grid.

Reference: GDALContourGenerate (/root/reference/alg/contour.cpp:332) with
the square-walking templates in alg/marching_squares/*.h (square.h holds
the 16-case table, segment_merger.h stitches segments into polylines).

Distributed recast: every 2x2 square of adjacent cells is assembled by ONE
explode(x4)+groupBy pivot shuffle (the same halo-exchange shape as
dem.window3x3), then the 16-case lookup, edge interpolation and segment
emission are pure Catalyst expressions — whole-stage codegen, no UDF, no
per-tile seam merging AT ALL: each square is produced exactly once no
matter how the grid is partitioned, so the segment set is globally
consistent by construction. (The reference needs segment_merger.h because
it emits per-strip; partition-independence makes that machinery vanish.)

Geometry convention: corner (bx, by) is the grid point carrying `value`;
by grows south. A square is keyed by its top-left corner:

    TL=(bx,   by)    TR=(bx+1, by)
    BL=(bx,   by+1)  BR=(bx+1, by+1)

A corner is "inside" when value >= level; crossing points interpolate
linearly along edges: t = (level - v0) / (v1 - v0) — IEEE-exact, so the
duckdb oracle hashes identically. Saddles (cases 5/10) disambiguate on the
square's center mean (the reference's asymptotic decider). Segment
endpoints are normalized (lexicographic order) so output is orientation-
and partition-independent.

Ring/polyline assembly from segments is a driver-side or per-level local
op over the (small) segment set — out of the distributed hot path, as in
SURVEY §7.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_SLOTS = [("tl", 0, 0), ("tr", 1, 0), ("bl", 0, 1), ("br", 1, 1)]


def _square_windows(cells: DataFrame, value_col: str = "value") -> DataFrame:
    """(bx, by, tl, tr, bl, br) for every complete 2x2 square."""
    offs = F.array(*[
        F.struct(F.lit(lbl).alias("slot"), F.lit(dx).alias("dx"),
                 F.lit(dy).alias("dy"))
        for lbl, dx, dy in _SLOTS
    ])
    contrib = cells.select(
        F.explode(offs).alias("_o"), F.col("bx").alias("_sx"),
        F.col("by").alias("_sy"), F.col(value_col).alias("_v"),
    ).select(
        (F.col("_sx") - F.col("_o.dx")).alias("bx"),
        (F.col("_sy") - F.col("_o.dy")).alias("by"),
        F.col("_o.slot").alias("slot"), F.col("_v"),
    )
    # single-shuffle conditional agg (see dem.window3x3 for why not pivot)
    g = contrib.groupBy("bx", "by").agg(*[
        F.max(F.when(F.col("slot") == lbl, F.col("_v"))).alias(lbl)
        for lbl, _, _ in _SLOTS
    ])
    return g.filter(
        F.col("tl").isNotNull() & F.col("tr").isNotNull()
        & F.col("bl").isNotNull() & F.col("br").isNotNull()
    )


# case index -> list of (edge_a, edge_b) segments; edges: T, R, B, L.
# corner-inside bits: 1=TL, 2=TR, 4=BR, 8=BL. None marks the saddle cases
# (5, 10), resolved at runtime on the center mean.
_CASES = {
    0: [], 15: [],
    1: [("T", "L")], 14: [("T", "L")],
    2: [("T", "R")], 13: [("T", "R")],
    3: [("L", "R")], 12: [("L", "R")],
    4: [("R", "B")], 11: [("R", "B")],
    6: [("T", "B")], 9: [("T", "B")],
    7: [("L", "B")], 8: [("L", "B")],
    5: None, 10: None,
}


def contour_segments(cells: DataFrame, level: float,
                     value_col: str = "value") -> DataFrame:
    """Line segments of the iso-line at `level`: (x0, y0, x1, y1)."""
    w = _square_windows(cells, value_col)
    L = F.lit(float(level))
    bx, by = F.col("bx").cast("double"), F.col("by").cast("double")
    tl, tr, bl, br = F.col("tl"), F.col("tr"), F.col("bl"), F.col("br")

    # crossing point per edge (x, y)
    edge_pts = {
        "T": (bx + (L - tl) / (tr - tl), by),
        "R": (bx + 1.0, by + (L - tr) / (br - tr)),
        "B": (bx + (L - bl) / (br - bl), by + 1.0),
        "L": (bx, by + (L - tl) / (bl - tl)),
    }

    def seg(ea, eb):
        xa, ya = edge_pts[ea]
        xb, yb = edge_pts[eb]
        # normalize endpoint order -> orientation-independent output
        swap = (xa > xb) | ((xa == xb) & (ya > yb))
        return F.struct(
            F.when(swap, xb).otherwise(xa).alias("x0"),
            F.when(swap, yb).otherwise(ya).alias("y0"),
            F.when(swap, xa).otherwise(xb).alias("x1"),
            F.when(swap, ya).otherwise(yb).alias("y1"),
        )

    idx = (
        (tl >= L).cast("int") + (tr >= L).cast("int") * 2
        + (br >= L).cast("int") * 4 + (bl >= L).cast("int") * 8
    )
    center_in = (tl + tr + bl + br) / 4.0 >= L

    null_seg = F.lit(None).cast(
        "struct<x0:double,y0:double,x1:double,y1:double>"
    )
    s1, s2 = null_seg, null_seg
    for case, segs in _CASES.items():
        if segs is None:
            continue
        if len(segs) >= 1:
            s1 = F.when(idx == case, seg(*segs[0])).otherwise(s1)
    # saddles: center decides which corner pair connects
    # (marching_squares square.h asymptotic decider semantics)
    s1 = F.when(idx == 5, F.when(center_in, seg("T", "R")).otherwise(seg("T", "L"))).otherwise(s1)
    s2 = F.when(idx == 5, F.when(center_in, seg("B", "L")).otherwise(seg("R", "B"))).otherwise(s2)
    s1 = F.when(idx == 10, F.when(center_in, seg("T", "L")).otherwise(seg("T", "R"))).otherwise(s1)
    s2 = F.when(idx == 10, F.when(center_in, seg("R", "B")).otherwise(seg("B", "L"))).otherwise(s2)

    segs = w.select(F.explode(F.array_compact(F.array(s1, s2))).alias("s"))
    return segs.select("s.x0", "s.y0", "s.x1", "s.y1").filter(
        # degenerate zero-length segments (level exactly on a corner) drop
        ~((F.col("x0") == F.col("x1")) & (F.col("y0") == F.col("y1")))
    )


def assemble_polylines(segments) -> list:
    """Stitch contour segments into polylines/rings — the final local step
    (reference: alg/marching_squares/segment_merger.h; ring/line feature
    emission in alg/contour.cpp).

    segments: iterable of (x0, y0, x1, y1) (e.g. `df.collect()` rows or a
    pandas DataFrame's itertuples). Driver-side by design: an iso-line is
    a 1-D boundary, so the segment count scales with the raster's
    PERIMETER (~sqrt of cell count) — at 4^14 base cells that is ~10^4
    segments per level, trivially driver-sized, while the cell-table work
    that produced them was the distributed part.

    Returns a list of polylines, each a list of (x, y) points; closed
    rings have first == last point. Deterministic: chains start from the
    lexicographically smallest open endpoint (ring starts: smallest point
    in the ring), and traversal always consumes the smallest-indexed
    unused segment, so output is independent of input order.
    """
    segs = [((float(s[0]), float(s[1])), (float(s[2]), float(s[3])))
            for s in ([tuple(x) for x in segments])]
    # endpoint -> [segment indices]
    at = {}
    for i, (a, b) in enumerate(segs):
        at.setdefault(a, []).append(i)
        at.setdefault(b, []).append(i)
    for v in at.values():
        v.sort()
    used = [False] * len(segs)

    def take(pt, prev_i):
        for i in at.get(pt, ()):
            if not used[i] and i != prev_i:
                return i
        return None

    out = []
    # open chains first: endpoints of odd degree, smallest first
    starts = sorted(p for p, ixs in at.items() if len(ixs) % 2 == 1)
    for mode in ("open", "ring"):
        if mode == "open":
            seeds = starts
        else:
            seeds = sorted(
                p for p, ixs in at.items()
                if any(not used[i] for i in ixs)
            )
        for seed in seeds:
            i = take(seed, None)
            if i is None:
                continue
            line = [seed]
            pt, prev = seed, None
            while True:
                i = take(pt, prev)
                if i is None:
                    break
                used[i] = True
                a, b = segs[i]
                pt = b if a == pt else a
                line.append(pt)
                prev = i
                if pt == seed:
                    break  # ring closed
            if len(line) > 1:
                out.append(line)
    return out


def contour_segments_multi(cells: DataFrame, levels: list,
                           value_col: str = "value") -> DataFrame:
    """All iso-lines of a level SERIES in one pass — `gdal_contour -i
    interval` semantics (alg/contour.cpp IntervalLevelIterator): output
    (level, x0, y0, x1, y1).

    Same single halo shuffle as contour_segments: the window pivot is
    computed ONCE and each window evaluates every level via one more
    explode — per-level marching squares without per-level rescans of the
    cell table (L levels cost L x the tiny per-square math, not L scans).
    """
    w = _square_windows(cells, value_col)
    w = w.withColumn("level", F.explode(F.array(*[F.lit(float(l)) for l in levels])))
    L = F.col("level")
    bx, by = F.col("bx").cast("double"), F.col("by").cast("double")
    tl, tr, bl, br = F.col("tl"), F.col("tr"), F.col("bl"), F.col("br")

    edge_pts = {
        "T": (bx + (L - tl) / (tr - tl), by),
        "R": (bx + 1.0, by + (L - tr) / (br - tr)),
        "B": (bx + (L - bl) / (br - bl), by + 1.0),
        "L": (bx, by + (L - tl) / (bl - tl)),
    }

    def seg(ea, eb):
        xa, ya = edge_pts[ea]
        xb, yb = edge_pts[eb]
        swap = (xa > xb) | ((xa == xb) & (ya > yb))
        return F.struct(
            F.when(swap, xb).otherwise(xa).alias("x0"),
            F.when(swap, yb).otherwise(ya).alias("y0"),
            F.when(swap, xa).otherwise(xb).alias("x1"),
            F.when(swap, ya).otherwise(yb).alias("y1"),
        )

    idx = (
        (tl >= L).cast("int") + (tr >= L).cast("int") * 2
        + (br >= L).cast("int") * 4 + (bl >= L).cast("int") * 8
    )
    center_in = (tl + tr + bl + br) / 4.0 >= L
    null_seg = F.lit(None).cast("struct<x0:double,y0:double,x1:double,y1:double>")
    s1, s2 = null_seg, null_seg
    for case, segs_ in _CASES.items():
        if segs_ is None or not segs_:
            continue
        s1 = F.when(idx == case, seg(*segs_[0])).otherwise(s1)
    s1 = F.when(idx == 5, F.when(center_in, seg("T", "R")).otherwise(seg("T", "L"))).otherwise(s1)
    s2 = F.when(idx == 5, F.when(center_in, seg("B", "L")).otherwise(seg("R", "B"))).otherwise(s2)
    s1 = F.when(idx == 10, F.when(center_in, seg("T", "L")).otherwise(seg("T", "R"))).otherwise(s1)
    s2 = F.when(idx == 10, F.when(center_in, seg("R", "B")).otherwise(seg("B", "L"))).otherwise(s2)

    out = w.select("level", F.explode(F.array_compact(F.array(s1, s2))).alias("s"))
    return out.select("level", "s.x0", "s.y0", "s.x1", "s.y1").filter(
        ~((F.col("x0") == F.col("x1")) & (F.col("y0") == F.col("y1")))
    )


def contour_polygons(cells: DataFrame, levels: list,
                     block_bits: int = 5, cell_size: float = 1.0,
                     origin=(0.0, 0.0)) -> DataFrame:
    """gdal_contour -p / POLYGONIZE=TRUE (ContourGenerateEx option,
    alg/contour.cpp; autotest/alg/contour.py test_contour_polygonize /
    test_contour_3): classify cells into the bands between consecutive
    fixed levels and emit one row per connected band region with its
    ring-traced WKB polygon.

    Band rule (derived from the reference's own parametrized
    expectations): band i covers [levels[i], levels[i+1]) half-open,
    except the TOP band which is closed — the "0,10,20,24,25" case puts
    the v==25 cells in band [24, 25]. Cells below levels[0] or above
    levels[-1] are nodata; bands with no cells emit nothing ("20" alone
    produces an empty layer, as the reference asserts).

    Geometry is at CELL-EDGE resolution: region boundaries follow pixel
    edges rather than the reference's per-edge linear interpolation. The
    interpolated boundary never leaves the boundary pixel, so envelopes
    and areas agree within the reference's own autotest tolerance
    (precision/2) — and the band ENVELOPES agree exactly, because a
    band's bbox is attained at whole pixel edges in its fixture.

    Output: (band int, elev_min, elev_max, region_id, n_cells, n_rings,
    area, wkb, xmin, ymin, xmax, ymax) — the reference writes one
    MULTIPOLYGON feature per band; aggregate rows over `band` to build
    it (contour_polygon_bands does exactly that).

    Distribution: classification is a Catalyst CASE; labeling is the
    distributed CC pass; ring tracing is per-region local (see
    polygonize_rings). No driver-side geometry work at all.
    """
    from .polygonize import polygonize_rings

    lv = [float(v) for v in levels]
    if sorted(lv) != lv:
        raise ValueError("levels must be ascending")
    if len(lv) < 2:
        return cells.sparkSession.createDataFrame(
            [], "band int, elev_min double, elev_max double, "
                "region_id long, n_cells long, n_rings int, area double, "
                "wkb binary, xmin double, ymin double, "
                "xmax double, ymax double")
    band = F.lit(None).cast("int")
    n = len(lv)
    for i in range(n - 1):
        hi_ok = (F.col("value") <= lv[i + 1]) if i == n - 2 else \
            (F.col("value") < lv[i + 1])
        band = F.when((F.col("value") >= lv[i]) & hi_ok, i).otherwise(band)
    classified = (cells.withColumn("_band", band)
                  .filter(F.col("_band").isNotNull()))
    rings = polygonize_rings(
        classified.select("bx", "by",
                          F.col("_band").cast("double").alias("value")),
        block_bits=block_bits, cell_size=cell_size, origin=origin)
    lo = F.lit(None).cast("double")
    hi = F.lit(None).cast("double")
    for i in range(n - 1):
        lo = F.when(F.col("value") == float(i), lv[i]).otherwise(lo)
        hi = F.when(F.col("value") == float(i), lv[i + 1]).otherwise(hi)
    return rings.select(
        F.col("value").cast("int").alias("band"),
        lo.alias("elev_min"), hi.alias("elev_max"),
        "region_id", "n_cells", "n_rings", "area", "wkb",
        "xmin", "ymin", "xmax", "ymax")


def contour_polygon_bands(cells: DataFrame, levels: list,
                          block_bits: int = 5, cell_size: float = 1.0,
                          origin=(0.0, 0.0)) -> DataFrame:
    """One row per non-empty band — the reference's one-multipolygon-per-
    band layer, minus the stitched geometry: (band, elev_min, elev_max,
    n_regions, n_cells, area, xmin, ymin, xmax, ymax)."""
    r = contour_polygons(cells, levels, block_bits=block_bits,
                         cell_size=cell_size, origin=origin)
    return r.groupBy("band", "elev_min", "elev_max").agg(
        F.count(F.lit(1)).alias("n_regions"),
        F.sum("n_cells").alias("n_cells"),
        F.sum("area").alias("area"),
        F.min("xmin").alias("xmin"), F.min("ymin").alias("ymin"),
        F.max("xmax").alias("xmax"), F.max("ymax").alias("ymax"),
    )

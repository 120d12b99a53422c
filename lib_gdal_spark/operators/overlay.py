"""Polygon-vs-polygon layer overlay — the reference's layer-algebra
methods on areal layers (OGRLayer::Intersection / Union / Clip /
Erase ..., ogr/ogrlayer.cpp:4063+, each looping features through
GEOS-backed OGRGeometry ops). The point-vs-polygon faces live in
operators/sjoin.py; this module covers polygon pairs, backed by the
geo/clip fragment-classification kernel.

Distributed shape (the part GDAL runs single-node):
- `layer_overlay` is the full operator: envelope -> grid-cell explode ->
  equi-join on cell (pure Catalyst, the same two-phase discipline as
  sjoin: cheap bbox rejection BEFORE any Python), dedupe multi-cell
  pairs by the min-cell rule, then ONE Arrow batch pass computes the
  exact geometric overlay per surviving pair.
- `pairwise_overlay_areas` is the kernel-only face over pre-paired
  rows (and the driver-contract query surface: its area sums admit an
  exact relational twin — split edges at crossings, keep fragments by
  ray-cast parity of the midpoint, sum directed Green's-theorem
  contributions — so duckdb can replay the whole geometry pipeline).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

def _spread(pairs: DataFrame) -> DataFrame:
    """Pair tables often arrive in a handful of parquet-scan partitions
    (a single row-group at small sf => ONE task), which would serialize
    the per-pair Python kernel.  The rows are a few narrow doubles, so a
    round-robin repartition to the session's parallelism is ~free next
    to the kernel and makes the boolean work use every core — on a
    cluster, every executor.  Results are per-pair (partition-
    independent by construction)."""
    want = pairs.sparkSession.sparkContext.defaultParallelism
    return pairs.repartition(want)


_AREA_SCHEMA = ("pair_id long, inter_area double, union_area double, "
                "diff_area double, n_inter_polys int")


def _quad(xs, ys):
    return [np.column_stack([np.asarray(xs, float), np.asarray(ys, float)])]


def pairwise_overlay_areas(pairs: DataFrame, round_dp: int = 6) -> DataFrame:
    """(pair_id, xa, ya, xb, yb array<double>) -> per-pair overlay areas.

    Columns xa/ya (xb/yb) are the open-ring vertex arrays of polygon
    A (B).  Output areas are rounded to `round_dp` via F.round, NEVER
    Python round() (HALF_UP on both engines vs Python's half-even —
    CLAUDE.md half-rule trap); the rounding exists because the
    boolean-op area sum is float-order dependent across engines
    (multi-term-fold rule)."""
    from ..session import ship_package

    ship_package(pairs.sparkSession)

    def run(batches):
        import pandas as pd

        from ..geo import clip
        from ..geo.pip import ring_area_np

        def total_area(k, d):
            if not d:
                return 0.0, 0
            polys = clip.as_polys(k, d)
            tot = 0.0
            for rings in polys:
                tot += ring_area_np(rings[0]) - sum(
                    ring_area_np(r) for r in rings[1:])
            return tot, len(polys)

        for pdf in batches:
            out = []
            for pid, xa, ya, xb, yb in zip(pdf["pair_id"], pdf["xa"],
                                           pdf["ya"], pdf["xb"], pdf["yb"]):
                ra, rb = _quad(xa, ya), _quad(xb, yb)
                # one fragment split serves all three ops (bit-identical
                # to separate overlay() calls, ~3x less kernel work)
                res = clip.overlay_multi(
                    "polygon", ra, "polygon", rb,
                    ("intersection", "union", "difference"))
                ia, ni = total_area(*res["intersection"])
                ua, _ = total_area(*res["union"])
                da, _ = total_area(*res["difference"])
                out.append((int(pid), ia, ua, da, ni))
            yield pd.DataFrame(out, columns=["pair_id", "inter_area",
                                             "union_area", "diff_area",
                                             "n_inter_polys"])

    raw = _spread(pairs).mapInPandas(run, _AREA_SCHEMA)
    return raw.select(
        "pair_id",
        F.round("inter_area", round_dp).alias("inter_area"),
        F.round("union_area", round_dp).alias("union_area"),
        F.round("diff_area", round_dp).alias("diff_area"),
        "n_inter_polys")


def pairwise_predicates(pairs: DataFrame) -> DataFrame:
    """(pair_id, xa, ya, xb, yb) -> the OGR predicate set per pair via
    geo/clip.relate (Intersects / Within / Contains / Overlaps — the
    equal-dimension subset meaningful for polygon pairs)."""
    from ..session import ship_package

    ship_package(pairs.sparkSession)

    def run(batches):
        import pandas as pd

        from ..geo import clip

        for pdf in batches:
            out = []
            for pid, xa, ya, xb, yb in zip(pdf["pair_id"], pdf["xa"],
                                           pdf["ya"], pdf["xb"], pdf["yb"]):
                ra, rb = _quad(xa, ya), _quad(xb, yb)
                args = ("polygon", ra, "polygon", rb)
                out.append((
                    int(pid),
                    clip.relate(*args, "intersects"),
                    clip.relate(*args, "within"),
                    clip.relate(*args, "contains"),
                    clip.relate(*args, "overlaps"),
                ))
            yield pd.DataFrame(out, columns=[
                "pair_id", "intersects", "within_ab", "contains_ab",
                "overlaps"])

    return _spread(pairs).mapInPandas(
        run, "pair_id long, intersects boolean, within_ab boolean, "
             "contains_ab boolean, overlaps boolean")


def layer_overlay(a: DataFrame, b: DataFrame, op: str = "intersection",
                  cell: float = 64.0) -> DataFrame:
    """Distributed polygon-layer overlay (OGRLayer::Intersection family)
    for op in intersection|union|difference|symdifference.

    a, b: (id long, geom binary WKB areal).  Returns (a_id, b_id,
    geom WKB of the pairwise op result, area double) for every envelope-
    intersecting pair whose overlay is non-empty.

    Plan: per-side envelope from the WKB (one Arrow pass), explode to
    `cell`-sized grid cells, equi-join on cell — shuffle volume is
    |cells|, never |A| x |B| — keep each pair once (both envelopes'
    overlap region min-cell), exact envelope pre-filter in Catalyst,
    then the clip kernel on survivors only.  At 100 TB-side inputs the
    cell join is the same shape the sjoin operator ships; skew on hot
    cells is the caller's AQE/salting territory."""
    from ..session import ship_package

    spark = a.sparkSession
    ship_package(spark)

    def env_side(df, tag):
        def env(batches):
            import pandas as pd

            from ..geo import wkb as _wkb

            for pdf in batches:
                rows = []
                for gid, buf in zip(pdf["id"], pdf["geom"]):
                    kind, data = _wkb.decode(bytes(buf))
                    pts = (np.vstack(data) if kind == "polygon"
                           else np.vstack([r for rings in data
                                           for r in rings]))
                    rows.append((int(gid), bytes(buf),
                                 float(pts[:, 0].min()),
                                 float(pts[:, 1].min()),
                                 float(pts[:, 0].max()),
                                 float(pts[:, 1].max())))
                yield pd.DataFrame(rows, columns=["id", "geom", "xmin",
                                                  "ymin", "xmax", "ymax"])

        e = df.mapInPandas(env, "id long, geom binary, xmin double, "
                                "ymin double, xmax double, ymax double")
        return e.select(
            F.col("id").alias(f"{tag}_id"), F.col("geom").alias(f"{tag}_g"),
            *[F.col(c).alias(f"{tag}_{c}")
              for c in ("xmin", "ymin", "xmax", "ymax")],
            F.explode(F.sequence(
                F.floor(F.col("xmin") / cell),
                F.floor(F.col("xmax") / cell))).alias("cx"),
        ).select("*", F.explode(F.sequence(
            F.floor(F.col(f"{tag}_ymin") / cell),
            F.floor(F.col(f"{tag}_ymax") / cell))).alias("cy"))

    ea, eb = env_side(a, "a"), env_side(b, "b")
    joined = ea.join(eb, ["cx", "cy"]).filter(
        (F.col("a_xmin") <= F.col("b_xmax"))
        & (F.col("b_xmin") <= F.col("a_xmax"))
        & (F.col("a_ymin") <= F.col("b_ymax"))
        & (F.col("b_ymin") <= F.col("a_ymax"))
    ).filter(
        # min-cell rule: emit each surviving pair from exactly one cell
        # (the SW-most cell of the envelope overlap)
        (F.col("cx") == F.floor(
            F.greatest("a_xmin", "b_xmin") / cell))
        & (F.col("cy") == F.floor(
            F.greatest("a_ymin", "b_ymin") / cell))
    ).select("a_id", "a_g", "b_id", "b_g")

    def kernel(batches):
        import pandas as pd

        from ..geo import clip, wkb as _wkb
        from ..geo.pip import ring_area_np

        for pdf in batches:
            rows = []
            for aid, ag, bid, bg in zip(pdf["a_id"], pdf["a_g"],
                                        pdf["b_id"], pdf["b_g"]):
                ka, da = _wkb.decode(bytes(ag))
                kb, db = _wkb.decode(bytes(bg))
                rk, rd = clip.overlay(ka, da, kb, db, op)
                if not rd:
                    continue
                enc = (_wkb.encode_polygon(rd) if rk == "polygon"
                       else _wkb.encode_multipolygon(rd))
                tot = 0.0
                for rings in clip.as_polys(rk, rd):
                    tot += ring_area_np(rings[0]) - sum(
                        ring_area_np(r) for r in rings[1:])
                rows.append((int(aid), int(bid), enc, tot))
            yield pd.DataFrame(rows, columns=["a_id", "b_id", "geom",
                                              "area"])

    return joined.mapInPandas(
        kernel, "a_id long, b_id long, geom binary, area double")


def layer_clip(a: DataFrame, b: DataFrame, cell: float = 64.0) -> DataFrame:
    """OGRLayer::Clip (ogrlayer.cpp Clip method): each A feature cut to
    the union of B — pairwise intersections re-merged per a_id via the
    cascaded-union aggregate (one groupBy on a_id after the pair
    kernel)."""
    from ..session import ship_package

    ship_package(a.sparkSession)
    pairs = layer_overlay(a, b, "intersection", cell=cell)

    def merge(key, pdf):
        import pandas as pd

        from ..geo import clip as _clip, wkb as _wkb
        from ..geo.pip import ring_area_np

        geoms = [_wkb.decode(bytes(g)) for g in pdf["geom"]]
        rk, rd = _clip.union_all(geoms)
        if not rd:
            return pd.DataFrame(columns=["a_id", "geom", "area"])
        enc = (_wkb.encode_polygon(rd) if rk == "polygon"
               else _wkb.encode_multipolygon(rd))
        tot = 0.0
        for rings in _clip.as_polys(rk, rd):
            tot += ring_area_np(rings[0]) - sum(
                ring_area_np(r) for r in rings[1:])
        return pd.DataFrame([(int(key[0]), enc, tot)],
                            columns=["a_id", "geom", "area"])

    return pairs.groupBy("a_id").applyInPandas(
        merge, "a_id long, geom binary, area double")


def layer_erase(a: DataFrame, b: DataFrame, cell: float = 64.0) -> DataFrame:
    """OGRLayer::Erase: A features minus the union of every B they
    touch; A features touching no B pass through whole.  Returns
    (a_id, geom, area)."""
    from ..session import ship_package

    spark = a.sparkSession
    ship_package(spark)

    # candidate pairs (same cell join), grouped per a_id with ALL its
    # B partners; subtract their union from the A geometry
    pairs = layer_overlay(a, b, "intersection", cell=cell) \
        .select("a_id", F.col("geom").alias("cut"))
    joined = a.join(pairs, a.id == pairs.a_id, "left") \
        .select(F.col("id").alias("a_id"), "geom", "cut")

    def erase(key, pdf):
        import pandas as pd

        from ..geo import clip as _clip, wkb as _wkb
        from ..geo.pip import ring_area_np

        ka, da = _wkb.decode(bytes(pdf["geom"].iloc[0]))
        cuts = [_wkb.decode(bytes(c)) for c in pdf["cut"]
                if c is not None]
        if cuts:
            uk, ud = _clip.union_all(cuts)
            ka, da = _clip.overlay(ka, da, uk, ud, "difference")
        if not da:
            return pd.DataFrame(columns=["a_id", "geom", "area"])
        enc = (_wkb.encode_polygon(da) if ka == "polygon"
               else _wkb.encode_multipolygon(da))
        tot = 0.0
        for rings in _clip.as_polys(ka, da):
            tot += ring_area_np(rings[0]) - sum(
                ring_area_np(r) for r in rings[1:])
        return pd.DataFrame([(int(key[0]), enc, tot)],
                            columns=["a_id", "geom", "area"])

    return joined.groupBy("a_id").applyInPandas(
        erase, "a_id long, geom binary, area double")


def layer_update(a: DataFrame, b: DataFrame, cell: float = 64.0) -> DataFrame:
    """OGRLayer::Update: B features replace the parts of A they cover —
    erase(A, B) plus B passed through, with source marked."""
    erased = layer_erase(a, b, cell=cell).select(
        F.col("a_id").alias("id"), "geom", "area",
        F.lit("input").alias("src"))

    def area_of(df):
        from ..session import ship_package

        ship_package(df.sparkSession)

        def f(batches):
            import pandas as pd

            from ..geo import clip as _clip, wkb as _wkb
            from ..geo.pip import ring_area_np

            for pdf in batches:
                rows = []
                for gid, g in zip(pdf["id"], pdf["geom"]):
                    k, d = _wkb.decode(bytes(g))
                    tot = 0.0
                    for rings in _clip.as_polys(k, d):
                        tot += ring_area_np(rings[0]) - sum(
                            ring_area_np(r) for r in rings[1:])
                    rows.append((int(gid), bytes(g), tot))
                yield pd.DataFrame(rows, columns=["id", "geom", "area"])

        return df.mapInPandas(f, "id long, geom binary, area double")

    method = area_of(b).select("id", "geom", "area",
                               F.lit("method").alias("src"))
    return erased.unionByName(method)

"""S2 cell encoding + exact kNN by S2 ring expansion.

North-star surface: pages are geocoded to discrete cells before the
polygon join, and "kNN answered via ring-expansion over cell neighbors"
(BASELINE.json north_star). geo/mercator.py + operators/knn.py provide
that over the planar WebMercator grid; this module provides the
spherical S2 variant (geo/s2.py) so queries near poles / the dateline
need no special-casing.

Scale shape:
- encoding is ONE mapInPandas pass (Arrow batches, NumPy kernel — trig
  stays in libm so the duckdb oracle matches bit-for-bit, see geo/s2.py);
- the ring search is per-round a hash equi-join on (face, ci, cj) over
  the surviving queries only, exploded x9 (3x3 neighborhood), exactly
  knn_ring's shape (operators/knn.py) but with LEVEL COARSENING as the
  doubling step and chord-space certification;
- distance math after the join is pure JVM Column arithmetic
  (+-*/sqrt are IEEE-exact in every engine — only trig needs libm care);
- queries that cannot be certified inside max_rounds (kth neighbor may
  sit on another cube face beyond the guard plane) fall back to one
  broadcast-queries x targets scan — bounded by the (tiny) uncertified
  remainder, never all-pairs.

Exactness argument (certification): a query retires once it holds >= k
candidates and its kth chord distance is <= the proven covered radius
  covered = min(C_ST * cs, face_guard)
where cs = 2^-level is the round's cell size in st units and
- C_ST = 4/(3*sqrt(6)): any same-face point with max(|ds|,|dt|) >= d
  has chord >= C_ST*d. Proof: |du| >= (4/3)|ds| (quadratic projection's
  minimum derivative, at the face center), and the chord from P1 to P2
  is >= the Euclidean distance from P2 to the plane {points with u =
  u1} = |x2||u2-u1|/sqrt(1+u1^2) >= |du|/sqrt(6) since |x2| >= 1/sqrt(3)
  and 1+u1^2 <= 2 on a face. The 3x3 block covers every same-face point
  within cs of the query in st, so an uncollected same-face point has
  chord >= C_ST*cs.
- face_guard = min over the 4 face-boundary planes of |n . P| (unit
  normal n): any point beyond a plane through the origin is at chord >=
  the point-to-plane distance. An uncollected OTHER-face point is
  beyond one of the 4 boundary planes.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window, functions as F

from ..geo import s2

C_ST = 4.0 / (3.0 * np.sqrt(6.0))

_OFFSETS = [(di, dj) for di in (-1, 0, 1) for dj in (-1, 0, 1)]


def _encode_pdf(pdf, lat_col, lng_col, level, parent_level, with_token):
    import pandas as pd

    lat = pdf[lat_col].to_numpy(np.float64)
    lng = pdf[lng_col].to_numpy(np.float64)
    x, y, z = s2.latlng_to_xyz(lat, lng)
    face, u, v = s2.xyz_to_face_uv(x, y, z)
    i = s2.st_to_ij(s2.uv_to_st(u))
    j = s2.st_to_ij(s2.uv_to_st(v))
    ids = s2.cell_id(face, i, j, level)
    out = {c: pdf[c] for c in pdf.columns}
    out["s2_cell"] = s2.to_signed(ids)
    if parent_level is not None:
        out["s2_parent"] = s2.to_signed(s2.parent_id(ids, parent_level))
    if with_token:
        out["s2_token"] = s2.token(ids)
    return pd.DataFrame(out)


def s2_encode(df: DataFrame, lat_col: str = "lat", lng_col: str = "lng",
              level: int = 16, parent_level: int | None = None,
              with_token: bool = False) -> DataFrame:
    """Append `s2_cell` (BIGINT two's-complement view of the uint64 id)
    and optionally `s2_parent` / `s2_token` columns. One Arrow pass."""
    from ..session import ship_package

    ship_package(df.sparkSession)
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in df.schema.fields)
    schema = fields + ", s2_cell long"
    if parent_level is not None:
        schema += ", s2_parent long"
    if with_token:
        schema += ", s2_token string"

    def run(batches):
        for pdf in batches:
            if len(pdf):
                yield _encode_pdf(pdf, lat_col, lng_col, level,
                                  parent_level, with_token)

    return df.mapInPandas(run, schema=schema)


def _keyed(df: DataFrame, idc: str, lat: str, lng: str, prefix: str,
           with_guard: bool) -> DataFrame:
    """(id, face, i, j, x, y, z [, guard]) — one Arrow pass.

    guard = min chord distance to the 4 face-boundary planes (see
    module docstring); only needed on the query side."""
    from ..session import ship_package

    ship_package(df.sparkSession)
    p = prefix

    def run(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            la = pdf[lat].to_numpy(np.float64)
            lo = pdf[lng].to_numpy(np.float64)
            x, y, z = s2.latlng_to_xyz(la, lo)
            face, u, v = s2.xyz_to_face_uv(x, y, z)
            i = s2.st_to_ij(s2.uv_to_st(u))
            j = s2.st_to_ij(s2.uv_to_st(v))
            out = {idc: pdf[idc], "face": face, "i": i, "j": j,
                   f"{p}x": x, f"{p}y": y, f"{p}z": z}
            if with_guard:
                P = np.stack([x, y, z], axis=1)
                guard = np.full(len(pdf), np.inf)
                zero = np.zeros(len(pdf))
                A = np.stack(s2.face_uv_to_xyz(face, zero, zero), axis=1)
                U = np.stack(s2.face_uv_to_xyz(face, zero + 1, zero),
                             axis=1) - A
                V = np.stack(s2.face_uv_to_xyz(face, zero, zero + 1),
                             axis=1) - A
                for n in (A - U, A + U, A - V, A + V):
                    n = n / np.linalg.norm(n, axis=1, keepdims=True)
                    guard = np.minimum(guard, np.abs((P * n).sum(axis=1)))
                out["guard"] = guard
            yield pd.DataFrame(out)

    schema = (f"{idc} long, face long, i long, j long, "
              f"{p}x double, {p}y double, {p}z double")
    if with_guard:
        schema += ", guard double"
    return df.mapInPandas(run, schema=schema)


def s2_cap_cover(clat, clng, radius, level: int = 6):
    """Conservative S2 cell cover of spherical caps.

    For each cap (center lat/lng in degrees, radius as unit-sphere CHORD
    length) return every level-`level` cell that MIGHT intersect it:
    cells whose center-to-cap-center chord is <= radius + the cell's
    circumradius (max chord from the cell center to its 4 corners — the
    cell is the intersection of 4 great-circle half-spaces, so the
    distance to a fixed point is maximized at a corner). The full
    level-`level` grid is enumerated vectorized (6*4^level cells; keep
    level <= ~8 for the driver-side dimension), so no BFS seams at cube
    edges or poles.

    Returns (cap_idx, cell_id_signed) int64 arrays — the equi-join key
    table for s2_cap_join.
    """
    clat = np.atleast_1d(np.asarray(clat, np.float64))
    clng = np.atleast_1d(np.asarray(clng, np.float64))
    radius = np.broadcast_to(np.asarray(radius, np.float64), clat.shape)
    n = 1 << level
    sh = s2.MAX_LEVEL - level
    f, i, j = np.meshgrid(np.arange(6, dtype=np.int64),
                          np.arange(n, dtype=np.int64),
                          np.arange(n, dtype=np.int64), indexing="ij")
    f, i, j = f.ravel(), i.ravel() << sh, j.ravel() << sh
    ids = s2.cell_id(f, i, j, level)
    cx, cy, cz = _cell_xyz(f, i, j, level, 0.5, 0.5)
    circ = np.zeros(len(f))
    for ds, dt in ((0.0, 0.0), (1.0, 0.0), (0.0, 1.0), (1.0, 1.0)):
        kx, ky, kz = _cell_xyz(f, i, j, level, ds, dt)
        d = np.sqrt((cx - kx) ** 2 + (cy - ky) ** 2 + (cz - kz) ** 2)
        circ = np.maximum(circ, d)
    px, py, pz = s2.latlng_to_xyz(clat, clng)
    out_cap, out_cell = [], []
    for c in range(len(clat)):
        d = np.sqrt((px[c] - cx) ** 2 + (py[c] - cy) ** 2
                    + (pz[c] - cz) ** 2)
        m = d <= radius[c] + circ
        out_cap.append(np.full(int(m.sum()), c, np.int64))
        out_cell.append(s2.to_signed(ids[m]))
    return np.concatenate(out_cap), np.concatenate(out_cell)


def _cell_xyz(face, i, j, level, ds, dt):
    """Unit xyz of the point at fractional (ds, dt) within each cell."""
    size = 1 << (s2.MAX_LEVEL - level)
    s = (i + ds * size) / s2.MAX_SIZE
    t = (j + dt * size) / s2.MAX_SIZE
    x, y, z = s2.face_uv_to_xyz(face, s2.st_to_uv(s), s2.st_to_uv(t))
    norm = np.sqrt(x * x + y * y + z * z)
    return x / norm, y / norm, z / norm


def s2_cap_join(targets: DataFrame, caps: DataFrame, radius: float,
                level: int = 6,
                cap_id: str = "cap_id", clat: str = "clat",
                clng: str = "clng",
                tid: str = "tid", tlat: str = "tlat", tlng: str = "tlng"
                ) -> DataFrame:
    """Spherical range join: every (cap, target) pair with unit-sphere
    chord distance <= radius. Caps are a SMALL broadcast dimension
    (collected driver-side to build the cell cover — bounded by the cap
    count, never the corpus); targets are equi-joined on their
    level-`level` cell against the cover, then the exact chord test
    runs as JVM Column math. Returns (cap_id, tid, dist)."""
    cap_rows = caps.select(cap_id, clat, clng).collect()
    ids = np.array([r[0] for r in cap_rows], np.int64)
    la = np.array([r[1] for r in cap_rows], np.float64)
    lo = np.array([r[2] for r in cap_rows], np.float64)
    idx, cells = s2_cap_cover(la, lo, radius, level)
    spark = targets.sparkSession
    import pandas as pd

    px, py, pz = s2.latlng_to_xyz(la, lo)
    cover = spark.createDataFrame(pd.DataFrame({
        cap_id: ids[idx], "cell": cells,
        "px": px[idx], "py": py[idx], "pz": pz[idx]}))
    # one Arrow pass: (tid, level-cell, xyz) — no target-side shuffle
    from ..session import ship_package

    ship_package(spark)

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            tla = pdf[tlat].to_numpy(np.float64)
            tlo = pdf[tlng].to_numpy(np.float64)
            x, y, z = s2.latlng_to_xyz(tla, tlo)
            face, u, v = s2.xyz_to_face_uv(x, y, z)
            i = s2.st_to_ij(s2.uv_to_st(u))
            j = s2.st_to_ij(s2.uv_to_st(v))
            cid = s2.to_signed(s2.cell_id(face, i, j, level))
            yield pd.DataFrame({tid: pdf[tid], "cell": cid,
                                "tx": x, "ty": y, "tz": z})

    tpos = targets.mapInPandas(
        run, schema=f"{tid} long, cell long, tx double, ty double,"
                    f" tz double")
    dist = F.sqrt(
        (F.col("px") - F.col("tx")) * (F.col("px") - F.col("tx"))
        + (F.col("py") - F.col("ty")) * (F.col("py") - F.col("ty"))
        + (F.col("pz") - F.col("tz")) * (F.col("pz") - F.col("tz")))
    return (tpos.join(F.broadcast(cover), "cell")
            .select(cap_id, tid, dist.alias("dist"))
            .filter(F.col("dist") <= radius))


def s2_knn(queries: DataFrame, targets: DataFrame, k: int = 3,
           level: int = 11, max_rounds: int = 10,
           qid: str = "qid", qlat: str = "qlat", qlng: str = "qlng",
           tid: str = "tid", tlat: str = "tlat", tlng: str = "tlng"
           ) -> DataFrame:
    """Exact spherical kNN: (qid, tid, dist, rank) with dist the unit-
    sphere chord length, rank 1..k by (dist, tid) — deterministic
    tie-break, partition-count independent."""
    q0 = _keyed(queries, qid, qlat, qlng, "q", with_guard=True)
    t0 = _keyed(targets, tid, tlat, tlng, "t", with_guard=False)
    t0 = t0.persist()
    t0.count()

    offsets = F.array(*[
        F.struct(F.lit(di).alias("di"), F.lit(dj).alias("dj"))
        for di, dj in _OFFSETS])
    dist = F.sqrt(
        (F.col("qx") - F.col("tx")) * (F.col("qx") - F.col("tx"))
        + (F.col("qy") - F.col("ty")) * (F.col("qy") - F.col("ty"))
        + (F.col("qz") - F.col("tz")) * (F.col("qz") - F.col("tz")))
    results = None
    remaining = q0
    for r in range(max_rounds):
        lvl = max(0, level - r)
        sh = s2.MAX_LEVEL - lvl
        cs = 2.0 ** (-lvl)
        tr = t0.select(
            tid, "tx", "ty", "tz", F.col("face").alias("tface"),
            F.shiftright(F.col("i"), sh).alias("tci"),
            F.shiftright(F.col("j"), sh).alias("tcj"))
        qr = (remaining
              .withColumn("_o", F.explode(offsets))
              .select(qid, "qx", "qy", "qz", "guard", "face",
                      (F.shiftright(F.col("i"), sh) + F.col("_o.di"))
                      .alias("ci"),
                      (F.shiftright(F.col("j"), sh) + F.col("_o.dj"))
                      .alias("cj")))
        cand = (qr.join(tr, (qr.face == tr.tface)
                        & (F.col("ci") == F.col("tci"))
                        & (F.col("cj") == F.col("tcj")))
                .select(qid, "guard", tid, dist.alias("dist")))
        w = Window.partitionBy(qid).orderBy(F.col("dist").asc(),
                                            F.col(tid).asc())
        top = (cand.withColumn("rank", F.row_number().over(w))
               .filter(F.col("rank") <= k)
               .localCheckpoint(eager=True))
        # strict < so an uncollected point exactly AT the covered radius
        # (which could win the tid tie-break) can never be missed
        stat = (top.groupBy(qid)
                .agg(F.count("*").alias("_n"),
                     F.max("dist").alias("_kth"),
                     F.max("guard").alias("_g"))
                .withColumn("_done",
                            (F.col("_n") >= k)
                            & (F.col("_kth") < F.least(
                                F.lit(C_ST * cs), F.col("_g")))))
        done_ids = stat.filter("_done").select(qid)
        got = top.join(done_ids, qid, "left_semi") \
                 .select(qid, tid, "dist", "rank")
        results = got if results is None else results.unionByName(got)
        remaining = remaining.join(done_ids, qid, "left_anti") \
                             .localCheckpoint(eager=True)
        if lvl == 0 or not remaining.take(1):
            break

    leftovers = remaining
    if leftovers.take(1):
        # bounded fallback: the uncertified remainder (face-corner
        # stragglers) against the full target side — broadcast the
        # QUERY side, never the corpus
        j = t0.crossJoin(F.broadcast(
            leftovers.select(qid, "qx", "qy", "qz")))
        w = Window.partitionBy(qid).orderBy(F.col("dist").asc(),
                                            F.col(tid).asc())
        fb = (j.select(qid, tid, dist.alias("dist"))
              .withColumn("rank", F.row_number().over(w))
              .filter(F.col("rank") <= k))
        results = fb if results is None else results.unionByName(fb)
    t0.unpersist()
    return results

"""S2 cell index + spherical ring-kNN (geo/s2.py, operators/s2index.py).

The automaton tables are pinned against the published S2 design
(kIJtoPos / kPosToIJ / kPosToOrientation in s2geometry's s2coords.h —
public design docs; the reference repo ships no S2 code). Everything
else is invariant-checked: encode/decode round trips, Hilbert
adjacency, neighbor wrap symmetry, and the knn operator against a
NumPy brute force.

The duckdb oracle twin for `s2_cell_assign` relies on numpy and duckdb
sharing libm: `test_trig_bit_exact_vs_duckdb` pins sin/cos/radians
bit-for-bit on the live query's lat/lng distribution — if this ever
fails on a new host, the oracle must be demoted to rows-only.
"""

import duckdb
import numpy as np
import pandas as pd
import pytest

from lib_gdal_spark.geo import s2
from lib_gdal_spark.operators.s2index import (
    s2_cap_cover, s2_cap_join, s2_encode, s2_knn)


def _rand_latlng(n, seed=7, polar=False):
    rng = np.random.default_rng(seed)
    if polar:
        lat = rng.uniform(80.0, 89.999, n)
    else:
        lat = rng.uniform(-89.9, 89.9, n)
    lng = rng.uniform(-180.0, 180.0, n)
    return lat, lng


def test_trig_bit_exact_vs_duckdb():
    # the live query inputs: documents-style integer-derived coords
    doc_id = np.arange(1, 20001, dtype=np.int64)
    lat = (doc_id * 9973 % 170000) / 1000.0 - 85.0
    lng = (doc_id * 7919 % 360000) / 1000.0 - 180.0
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"lat": lat, "lng": lng}))
    c = repr(float(np.pi) / 180.0)
    q = con.execute(
        f"SELECT sin(lat*{c}) sl, cos(lat*{c}) cl,"
        f"       sin(lng*{c}) sg, cos(lng*{c}) cg FROM t").fetchnumpy()
    rl, rg = np.radians(lat), np.radians(lng)
    assert (np.sin(rl) == q["sl"]).all()
    assert (np.cos(rl) == q["cl"]).all()
    assert (np.sin(rg) == q["sg"]).all()
    assert (np.cos(rg) == q["cg"]).all()


def test_automaton_tables_match_published_design():
    # s2coords.h: kIJtoPos, kPosToIJ, kPosToOrientation (swap=1, invert=2)
    assert s2._IJ_TO_POS.tolist() == [
        [0, 1, 3, 2], [0, 3, 1, 2], [2, 3, 1, 0], [2, 1, 3, 0]]
    assert s2._POS_TO_IJ.tolist() == [
        [0, 1, 3, 2], [0, 2, 3, 1], [3, 2, 0, 1], [3, 1, 0, 2]]
    assert s2._POS_TO_ORIENT.tolist() == [1, 0, 0, 3]
    # the two flattened tables must be mutually inverse per orientation
    for o in range(4):
        for ij2 in range(4):
            p = int(s2._ENC_POS[o * 4 + ij2])
            assert int(s2._DEC_IJ[o * 4 + p]) == ij2
            assert (int(s2._ENC_NEXT_O[o * 4 + ij2])
                    == int(s2._DEC_NEXT_O[o * 4 + p]))


def test_leaf_roundtrip_and_levels():
    lat, lng = _rand_latlng(5000)
    ids = s2.cell_id_from_latlng(lat, lng, 30)
    assert (s2.level_of(ids) == 30).all()
    f, i, j = s2.decode(ids, 30)
    assert (s2.cell_id(f, i, j, 30) == ids).all()
    for lvl in (0, 5, 12, 29):
        p = s2.parent_id(ids, lvl)
        assert (s2.level_of(p) == lvl).all()
        pf, pi, pj = s2.decode(p, lvl)
        sh = 30 - lvl
        assert (pf == f).all()
        assert ((pi >> sh) == (i >> sh)).all()
        assert ((pj >> sh) == (j >> sh)).all()


def test_center_roundtrip():
    lat, lng = _rand_latlng(3000, seed=11)
    for lvl in (4, 12, 20):
        ids = s2.parent_id(s2.cell_id_from_latlng(lat, lng, 30), lvl)
        clat, clng = s2.cell_center_latlng(ids, lvl)
        assert (s2.cell_id_from_latlng(clat, clng, lvl) == ids).all()


def test_hilbert_is_a_curve():
    # consecutive positions at level 6 are edge-adjacent cells, per face
    for face in range(6):
        pos = np.arange(4 ** 6, dtype=np.uint64)
        shift = np.uint64(2 * (30 - 6) + 1)
        ids = ((np.uint64(face) << np.uint64(61)) | (pos << shift)
               | (np.uint64(1) << (shift - np.uint64(1))))
        _, i, j = s2.decode(ids, 6)
        d = np.abs(np.diff(i >> 24)) + np.abs(np.diff(j >> 24))
        assert (d == 1).all()
        # encode must invert decode's positions
        f2 = np.full(ids.shape, face, np.int64)
        assert (s2.cell_id(f2, i, j, 6) == ids).all()


def test_token_format():
    ids = np.array([0x13e062b << 36, 0x1 << 60], dtype=np.uint64)
    t = s2.token(ids)
    assert t[0] == "13e062b"
    assert t[1] == "1"
    assert (s2.token(np.array([0], np.uint64))[0]) == "X"


def test_signed_view_roundtrip():
    ids = np.array([1, 2 ** 63, 2 ** 64 - 1], dtype=np.uint64)
    signed = s2.to_signed(ids)
    assert signed.dtype == np.int64
    assert signed[1] < 0
    assert (s2.from_signed(signed) == ids).all()


def test_edge_neighbors_interior():
    # interior cells: neighbors are the four ij offsets on the same face
    lat, lng = _rand_latlng(500, seed=3)
    ids = s2.parent_id(s2.cell_id_from_latlng(lat, lng, 30), 8)
    f, i, j = s2.decode(ids, 8)
    size = 1 << 22
    interior = ((i >= size) & (i < s2.MAX_SIZE - size)
                & (j >= size) & (j < s2.MAX_SIZE - size))
    nb = s2.edge_neighbors(ids[interior], 8)
    fi, ii, ji = f[interior], i[interior], j[interior]
    exp = np.stack([
        s2.cell_id(fi, ii, ji - size, 8),
        s2.cell_id(fi, ii + size, ji, 8),
        s2.cell_id(fi, ii, ji + size, 8),
        s2.cell_id(fi, ii - size, ji, 8)], axis=1)
    assert (nb == exp).all()


def test_edge_neighbors_wrap_symmetric():
    # neighbor-of-neighbor contains the original cell (4-symmetry holds
    # across cube-face boundaries too)
    lvl = 4
    # take every cell on the boundary strip of each face
    cells = []
    n = 1 << lvl
    sh = 30 - lvl
    for face in range(6):
        for t in range(n):
            for (i, j) in [(0, t), (n - 1, t), (t, 0), (t, n - 1)]:
                cells.append((face, i << sh, j << sh))
    f, i, j = (np.array(x, np.int64) for x in zip(*cells))
    ids = s2.cell_id(f, i, j, lvl)
    nb = s2.edge_neighbors(ids, lvl)
    # every cell is distinct from its neighbors
    assert (nb != ids[:, None]).all()
    for col in range(4):
        back = s2.edge_neighbors(nb[:, col], lvl)
        assert (back == ids[:, None]).any(axis=1).all()


def _brute_knn(qlat, qlng, tlat, tlng, k):
    qx, qy, qz = s2.latlng_to_xyz(qlat, qlng)
    tx, ty, tz = s2.latlng_to_xyz(tlat, tlng)
    out = {}
    for qi in range(len(qlat)):
        d = np.sqrt((qx[qi] - tx) ** 2 + (qy[qi] - ty) ** 2
                    + (qz[qi] - tz) ** 2)
        order = np.lexsort((np.arange(len(d)) + 1, d))[:k]
        out[qi + 1] = [(int(t + 1), float(d[t])) for t in order]
    return out


@pytest.fixture(scope="module")
def knn_case(spark):
    qlat, qlng = _rand_latlng(40, seed=21)
    tlat, tlng = _rand_latlng(800, seed=22)
    # force coverage of the hard spots: poles, dateline, face corners
    qlat[:4] = [89.99, -89.99, 0.0, 45.0]
    qlng[:4] = [10.0, -170.0, 179.999, 45.0]
    q = spark.createDataFrame(pd.DataFrame({
        "qid": np.arange(1, len(qlat) + 1), "qlat": qlat, "qlng": qlng}))
    t = spark.createDataFrame(pd.DataFrame({
        "tid": np.arange(1, len(tlat) + 1), "tlat": tlat, "tlng": tlng}))
    return q, t, _brute_knn(qlat, qlng, tlat, tlng, 3)


def test_s2_knn_exact_vs_brute_force(spark, knn_case):
    q, t, want = knn_case
    got = s2_knn(q, t, k=3, level=8).toPandas().sort_values(
        ["qid", "rank"]).reset_index(drop=True)
    assert len(got) == len(want) * 3
    for qid, rows in got.groupby("qid"):
        exp = want[qid]
        assert list(rows["tid"]) == [t for t, _ in exp]
        assert np.allclose(list(rows["dist"]), [d for _, d in exp],
                           rtol=0, atol=0)


def test_s2_knn_partition_invariance(spark, knn_case):
    q, t, _ = knn_case
    a = s2_knn(q.repartition(1), t.repartition(1), k=3, level=8)
    b = s2_knn(q.repartition(7), t.repartition(13), k=3, level=8)
    pa = a.toPandas().sort_values(["qid", "rank"]).reset_index(drop=True)
    pb = b.toPandas().sort_values(["qid", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(pa, pb)


def test_cap_cover_is_superset():
    # every point inside a cap must land in a covered cell — poles and
    # dateline included
    clat = np.array([89.9, -89.9, 0.0, 45.0, -30.0])
    clng = np.array([0.0, 100.0, 179.99, -179.99, 45.0])
    r = 0.25
    idx, cells = s2_cap_cover(clat, clng, r, level=6)
    lat, lng = _rand_latlng(100000, seed=41)
    px, py, pz = s2.latlng_to_xyz(clat, clng)
    x, y, z = s2.latlng_to_xyz(lat, lng)
    pc = s2.to_signed(s2.parent_id(s2.cell_id_from_latlng(lat, lng, 30), 6))
    for c in range(len(clat)):
        d = np.sqrt((px[c] - x) ** 2 + (py[c] - y) ** 2 + (pz[c] - z) ** 2)
        inside = d <= r
        assert np.isin(pc[inside], cells[idx == c]).all()


def test_cap_join_vs_brute_force(spark):
    clat = np.array([89.0, 0.0, -45.0, 30.0])
    clng = np.array([10.0, 179.9, -60.0, -179.9])
    caps = spark.createDataFrame(pd.DataFrame({
        "cap_id": np.arange(4), "clat": clat, "clng": clng}))
    tlat, tlng = _rand_latlng(2000, seed=51)
    t = spark.createDataFrame(pd.DataFrame({
        "tid": np.arange(2000), "tlat": tlat, "tlng": tlng}))
    r = 0.3
    got = s2_cap_join(t.repartition(5), caps, radius=r, level=5) \
        .toPandas().sort_values(["cap_id", "tid"]).reset_index(drop=True)
    px, py, pz = s2.latlng_to_xyz(clat, clng)
    x, y, z = s2.latlng_to_xyz(tlat, tlng)
    rows = []
    for c in range(4):
        d = np.sqrt((px[c] - x) ** 2 + (py[c] - y) ** 2 + (pz[c] - z) ** 2)
        for tid in np.flatnonzero(d <= r):
            rows.append((c, int(tid), float(d[tid])))
    want = pd.DataFrame(rows, columns=["cap_id", "tid", "dist"])
    assert len(got) == len(want) and len(want) > 0
    assert (got["cap_id"].to_numpy() == want["cap_id"].to_numpy()).all()
    assert (got["tid"].to_numpy() == want["tid"].to_numpy()).all()
    assert (got["dist"].to_numpy() == want["dist"].to_numpy()).all()


def test_s2_encode_columns(spark):
    lat, lng = _rand_latlng(200, seed=31)
    df = spark.createDataFrame(pd.DataFrame(
        {"id": np.arange(200), "lat": lat, "lng": lng}))
    out = s2_encode(df, level=12, parent_level=6, with_token=True).toPandas()
    ids = s2.from_signed(out["s2_cell"].to_numpy())
    assert (s2.level_of(ids) == 12).all()
    want = s2.parent_id(s2.cell_id_from_latlng(
        out["lat"].to_numpy(), out["lng"].to_numpy(), 30), 12)
    assert (ids == want).all()
    par = s2.from_signed(out["s2_parent"].to_numpy())
    assert (par == s2.parent_id(ids, 6)).all()
    assert (out["s2_token"].to_numpy() == s2.token(ids)).all()

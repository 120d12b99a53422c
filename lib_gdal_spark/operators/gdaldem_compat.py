"""Byte-exact gdaldem replays: hillshade / slope / aspect / color-relief
with the reference's EXACT numeric pipeline, as distributed Column math.

Reference: apps/gdaldem_lib.cpp —
- GDALHillshadeAlg_same_res (:1030-1068): the square-pixel fast path
  (gt[1] == -gt[5], xscale == yscale): integer Horn sums, folded
  constants, cang_mul_254 = (254*sin(alt) + x*B + y*A) / sqrt(1 +
  C*(x^2+y^2)), shade = cang <= 0 ? 1 : 1 + cang_mul_254.
- GDALHillshadeAlg (:1003): the generic path (x,y scaled by
  1/(res*scale); numerator sin254 - (y*A254 - x*B254)).
- GDALHillshadeCombinedAlg (:1140): acos shade * atan(slope) combined
  shading.
- GDALSlopeHornAlg (:1345): atan(sqrt(key)/8) degrees or 100*sqrt/8
  percent; GDALAspectAlg (:1452): atan2(dy,-dx) with the
  float-arithmetic azimuth rotation and flat -> nodata.
- GDALColorReliefGetRGBA (:1611): sorted-ramp binary search, exact-entry
  match, linear interpolation with int(0.5 + ...) round-clamp.
- GDALGeneric3x3Processing (:316): edge semantics — without
  -compute_edges the outer ring is dst-nodata; with it, edges mirror via
  INTERPOL(a,b) = 2a - b (column CLAMP on the top/bottom rows, column
  MIRROR on interior-row ends — asymmetric, replicated exactly), and
  window nodata values are replaced by the center value.
- Float discipline: algs return float32 (double math, float cast);
  RasterIO float->Byte writes floor(f + 0.5f) in FLOAT arithmetic
  (gcore/gdal_priv_templates.hpp sGDALCopyWord<float, Tout>);
  GDALChecksumImage reads floats back as floor(double(f) + 0.5)
  (alg/gdalchecksum.cpp IntFromDouble).

The replays are validated against the reference's own autotest
checksums on its n43.tif fixture (autotest/utilities/test_gdaldem.py):
hillshade 45587, -combined 43876, -compute_edges 50239, slope 63748,
aspect 54885, color-relief 55066/37594/47768 — see
tests/test_operators.py.

Input contract: a DENSE integer-valued cell grid (bx, by, value) with
by growing UP (raster row ry = height-1-by, matching sources/tiff);
GDAL reads Byte/UInt16/Int16 bands as Int32, so values are cast to
long. Nodata cells must be PRESENT rows carrying src_nodata (integer
equality, the reference's ARE_REAL_EQUAL on ints).

Scale shape: one explode (x9) + one map-side-combined groupBy — the
same single-Exchange stencil as operators/dem.py; everything after the
window build is whole-stage-codegen Column math (plus JVM
atan/atan2/acos for the transcendental variants, absorbed by the
float32 cast exactly as the reference's libm is).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

# raster-order window slots (w0=NW .. w8=SE) in (dx, d_by) with by UP:
# raster row ry-1 (north) = by+1
_SLOTS = [
    ("w0", -1, 1), ("w1", 0, 1), ("w2", 1, 1),
    ("w3", -1, 0), ("w4", 0, 0), ("w5", 1, 0),
    ("w6", -1, -1), ("w7", 0, -1), ("w8", 1, -1),
]

_DEG2RAD = math.pi / 180.0
_RAD2DEG = 180.0 / math.pi


def _interpol(a, b, nodata: int | None):
    """INTERPOL (gdaldem_lib.cpp:300, GInt32 variant): 2a - b, nodata
    propagates, a result colliding with nodata bumps by one."""
    v = 2 * a - b
    if nodata is None:
        return v
    nd = F.lit(nodata)
    return (
        F.when((a == nd) | (b == nd), nd)
        .when(v == nd, v + 1)
        .otherwise(v)
    )


def window9_gdal(cells: DataFrame, width: int, height: int,
                 value_col: str = "value", compute_edges: bool = False,
                 src_nodata: int | None = None) -> DataFrame:
    """Every cell of the width x height grid with its 9-slot window
    (w0..w8, long) filled per GDALGeneric3x3Processing edge semantics,
    plus `valid` (false -> the caller emits dst-nodata).

    One explode + one groupBy shuffle; the edge fills are pure
    Column-math stages on the grouped rows."""
    offs = F.array(*[
        F.struct(F.lit(lbl).alias("slot"), F.lit(dx).alias("dx"),
                 F.lit(dy).alias("dy"))
        for lbl, dx, dy in _SLOTS
    ])
    contrib = cells.select(
        F.explode(offs).alias("_o"), F.col("bx").alias("_sx"),
        F.col("by").alias("_sy"),
        F.col(value_col).cast("long").alias("_v"),
    ).select(
        (F.col("_sx") - F.col("_o.dx")).alias("bx"),
        (F.col("_sy") - F.col("_o.dy")).alias("by"),
        F.col("_o.slot").alias("slot"), F.col("_v"),
    ).filter(
        (F.col("bx") >= 0) & (F.col("bx") < width)
        & (F.col("by") >= 0) & (F.col("by") < height)
    )
    g = contrib.groupBy("bx", "by").agg(*[
        F.max(F.when(F.col("slot") == lbl, F.col("_v"))).alias(lbl)
        for lbl, _, _ in _SLOTS
    ])
    rx, ry = F.col("bx"), F.lit(height - 1) - F.col("by")
    g = g.withColumn("_rx", rx).withColumn("_ry", ry)
    z = {lbl: F.col(lbl) for lbl, _, _ in _SLOTS}

    if not compute_edges:
        interior = (
            (F.col("_rx") > 0) & (F.col("_rx") < width - 1)
            & (F.col("_ry") > 0) & (F.col("_ry") < height - 1)
        )
        valid = interior
        for lbl in z:
            valid = valid & z[lbl].isNotNull()
        if src_nodata is not None:
            nd = F.lit(src_nodata)
            for lbl in z:
                valid = valid & (z[lbl] != nd)
        return g.select("bx", "by", "_rx", "_ry",
                        *[z[lbl].alias(lbl) for lbl in z],
                        valid.alias("valid"))

    top = F.col("_ry") == 0
    bot = F.col("_ry") == height - 1
    left = F.col("_rx") == 0
    right = F.col("_rx") == width - 1
    nd = src_nodata

    # stage 1 — column handling: top/bottom rows CLAMP the missing end
    # column to the center column (jmin = j / jmax = j in the reference
    # first/last-row loops); interior-row ends MIRROR via INTERPOL
    s1 = dict(z)
    s1["w3"] = (F.when((top | bot) & left, z["w4"])
                .when(~top & ~bot & left, _interpol(z["w4"], z["w5"], nd))
                .otherwise(z["w3"]))
    s1["w6"] = (F.when(top & left, z["w7"])
                .when(~top & ~bot & left, _interpol(z["w7"], z["w8"], nd))
                .otherwise(z["w6"]))
    s1["w0"] = (F.when(bot & left, z["w1"])
                .when(~top & ~bot & left, _interpol(z["w1"], z["w2"], nd))
                .otherwise(z["w0"]))
    s1["w5"] = (F.when((top | bot) & right, z["w4"])
                .when(~top & ~bot & right, _interpol(z["w4"], z["w3"], nd))
                .otherwise(z["w5"]))
    s1["w8"] = (F.when(top & right, z["w7"])
                .when(~top & ~bot & right, _interpol(z["w7"], z["w6"], nd))
                .otherwise(z["w8"]))
    s1["w2"] = (F.when(bot & right, z["w1"])
                .when(~top & ~bot & right, _interpol(z["w1"], z["w0"], nd))
                .otherwise(z["w2"]))
    g1 = g.select("bx", "by", "_rx", "_ry",
                  *[s1[lbl].alias(lbl) for lbl, _, _ in _SLOTS])
    z1 = {lbl: F.col(lbl) for lbl, _, _ in _SLOTS}

    # stage 2 — row mirror: ghost row above the top (2*center_row -
    # next_row) / below the bottom (2*center_row - prev_row)
    s2 = dict(z1)
    s2["w0"] = F.when(top, _interpol(z1["w3"], z1["w6"], nd)).otherwise(z1["w0"])
    s2["w1"] = F.when(top, _interpol(z1["w4"], z1["w7"], nd)).otherwise(z1["w1"])
    s2["w2"] = F.when(top, _interpol(z1["w5"], z1["w8"], nd)).otherwise(z1["w2"])
    s2["w6"] = F.when(bot, _interpol(z1["w3"], z1["w0"], nd)).otherwise(z1["w6"])
    s2["w7"] = F.when(bot, _interpol(z1["w4"], z1["w1"], nd)).otherwise(z1["w7"])
    s2["w8"] = F.when(bot, _interpol(z1["w5"], z1["w2"], nd)).otherwise(z1["w8"])
    g2 = g1.select("bx", "by", "_rx", "_ry",
                   *[s2[lbl].alias(lbl) for lbl, _, _ in _SLOTS])

    # stage 3 — ComputeVal nodata replacement: center nodata -> invalid;
    # other window nodata -> replaced by the center value
    zc = {lbl: F.col(lbl) for lbl, _, _ in _SLOTS}
    if nd is not None:
        ndl = F.lit(nd)
        valid = zc["w4"] != ndl
        out = {lbl: F.when(zc[lbl] == ndl, zc["w4"]).otherwise(zc[lbl])
               for lbl in zc}
        out["w4"] = zc["w4"]
    else:
        valid = F.lit(True)
        out = zc
    return g2.select("bx", "by", "_rx", "_ry",
                     *[out[lbl].alias(lbl) for lbl, _, _ in _SLOTS],
                     valid.alias("valid"))


def _acc_xy_same_res(w):
    """Integer Horn sums of GDALHillshadeAlg_same_res (:1049-1063)."""
    x = (w("w0") - w("w8")) + 2 * (w("w3") - w("w5")) + (w("w6") - w("w2"))
    y = (w("w0") - w("w8")) + 2 * (w("w1") - w("w7")) - (w("w6") - w("w2"))
    return x.cast("double"), y.cast("double")


def hillshade_constants(geotransform, z: float = 1.0, scale: float = 1.0,
                        azimuth: float = 315.0, altitude: float = 45.0,
                        xscale: float | None = None,
                        yscale: float | None = None,
                        gradient_alg: str = "horn") -> dict:
    """GDALCreateHillshadeData (:1171) folded constants, as Python
    doubles (op-order identical to the C, so oracle SQL can repr-inject
    them). `scale` sets both axes (gdaldem -s); xscale/yscale override
    per axis (the new-CLI options)."""
    xs = scale if xscale is None else xscale
    ys = scale if yscale is None else yscale
    inv_ew = 1.0 / (geotransform[1] * xs)
    inv_ns = 1.0 / (geotransform[5] * ys)
    zf = z / (2.0 if gradient_alg == "zt" else 8.0)
    sin_alt = math.sin(altitude * _DEG2RAD)
    cos_alt_z = math.cos(altitude * _DEG2RAD) * zf
    cos_az_caz = math.cos(azimuth * _DEG2RAD) * cos_alt_z
    sin_az_caz = math.sin(azimuth * _DEG2RAD) * cos_alt_z
    sqz = zf * zf
    return {
        "inv_ew": inv_ew, "inv_ns": inv_ns, "sin_alt": sin_alt,
        "sin_alt127": 127.0 * sin_alt,
        "sin_alt254": 254.0 * sin_alt,
        "cos_alt_z": cos_alt_z, "zf": zf,
        "cos_az_caz": cos_az_caz, "sin_az_caz": sin_az_caz,
        "cos_az_caz254": 254.0 * cos_az_caz,
        "sin_az_caz254": 254.0 * sin_az_caz,
        "cos_alt_z127": 127.0 * cos_alt_z,
        "cos225_caz127": 127.0 * math.cos(225 * _DEG2RAD) * cos_alt_z,
        "az_rad": azimuth * _DEG2RAD,
        "sqz": sqz,
        "sqz_inv2": sqz * inv_ew * inv_ew,
        "cos254inv": 254.0 * cos_az_caz * -inv_ew,
        "sin254inv": 254.0 * sin_az_caz * inv_ew,
        "same_res": (geotransform[1] == -geotransform[5] and xs == ys
                     and gradient_alg == "horn"),
    }


def _byte_write(fcol):
    """float32 alg output -> Byte band value: floor(f + 0.5f) in FLOAT
    arithmetic, clamped (sGDALCopyWord<float, GByte>)."""
    f32 = (fcol.cast("float") + F.lit(0.5).cast("float")).cast("float")
    return F.least(F.lit(255.0), F.greatest(F.lit(0.0), F.floor(f32))) \
        .cast("long")


def auto_scale(geotransform, height: int, semi_major: float = 6378137.0,
               angular_units: float = 0.0174532925199433
               ) -> tuple[float, float]:
    """The new-CLI default xscale/yscale for a GEOGRAPHIC source
    (gdaldem_lib.cpp:3651-3674): yscale = angular-units x semi-major
    (metres per degree of latitude), xscale = yscale x cos(centre
    latitude). The angular-units constant is the EPSG 9122 degree
    literal OSR reports, not math.radians(1)."""
    yscale = angular_units * semi_major
    mean_lat = (geotransform[3] + height * geotransform[5] / 2) \
        * angular_units
    return yscale * math.cos(mean_lat), yscale


def _gradient(w, c, gradient_alg: str):
    """Gradient<T, alg>::calc (:772): scaled Horn or Zevenbergen-Thorne
    x/y as double Columns."""
    if gradient_alg == "zt":
        x = (w("w3") - w("w5")).cast("double") * F.lit(c["inv_ew"])
        y = (w("w7") - w("w1")).cast("double") * F.lit(c["inv_ns"])
    else:
        x = ((w("w0") + 2 * w("w3") + w("w6"))
             - (w("w2") + 2 * w("w5") + w("w8"))).cast("double") \
            * F.lit(c["inv_ew"])
        y = ((w("w6") + 2 * w("w7") + w("w8"))
             - (w("w0") + 2 * w("w1") + w("w2"))).cast("double") \
            * F.lit(c["inv_ns"])
    return x, y


def hillshade_gdal(cells: DataFrame, geotransform, width: int, height: int,
                   value_col: str = "value", z: float = 1.0,
                   scale: float = 1.0, azimuth: float = 315.0,
                   altitude: float = 45.0, variant: str = "regular",
                   gradient_alg: str = "horn",
                   xscale: float | None = None, yscale: float | None = None,
                   compute_edges: bool = False,
                   src_nodata: int | None = None) -> DataFrame:
    """gdaldem hillshade, byte-exact: (bx, by, shade) over the full
    grid; invalid cells (edges without -compute_edges, nodata windows)
    carry the dst nodata 0. variant: regular | combined |
    multidirectional (USGS of92-422 4-azimuth blend, az fixed) |
    igor (soft slope/aspect shadowing, alt fixed);
    gradient_alg: horn | zt (Zevenbergen-Thorne, z divisor 2)."""
    if variant not in ("regular", "combined", "multidirectional", "igor"):
        raise ValueError(f"unknown hillshade variant {variant!r}")
    if gradient_alg not in ("horn", "zt"):
        raise ValueError(f"unknown gradient alg {gradient_alg!r}")
    c = hillshade_constants(geotransform, z, scale, azimuth, altitude,
                            xscale, yscale, gradient_alg)
    g = window9_gdal(cells, width, height, value_col, compute_edges,
                     src_nodata)
    w = F.col
    if variant == "combined":
        x, y = _gradient(w, c, gradient_alg)
        xxyy = x * x + y * y
        slope = xxyy * F.lit(c["sqz"])
        inv_sq_half_pi = 1.0 / ((math.pi * math.pi) / 4)
        cang0 = F.acos(
            (F.lit(c["sin_alt"]) - (y * F.lit(c["cos_az_caz"])
                                    - x * F.lit(c["sin_az_caz"])))
            / F.sqrt(1 + slope))
        cang = 1 - cang0 * F.atan(F.sqrt(slope)) * F.lit(inv_sq_half_pi)
        fc = F.when(cang <= 0.0, F.lit(1.0).cast("float")) \
            .otherwise((1.0 + 254.0 * cang).cast("float"))
    elif variant == "multidirectional":
        # GDALHillshadeMultiDirectionalAlg (:1229): w225/w270/w315/w360
        # aspect weights, each azimuth clamped at 0 before blending
        x, y = _gradient(w, c, gradient_alg)
        xx, yy = x * x, y * y
        xxyy = xx + yy
        s127 = F.lit(c["sin_alt127"])
        v225 = s127 + (x - y) * F.lit(c["cos225_caz127"])
        v270 = s127 - x * F.lit(c["cos_alt_z127"])
        v315 = s127 + (x + y) * F.lit(c["cos225_caz127"])
        v360 = s127 - y * F.lit(c["cos_alt_z127"])
        clamp = lambda e: F.when(e <= 0.0, F.lit(0.0)).otherwise(e)  # noqa: E731
        w225 = 0.5 * xxyy - x * y
        w270 = xx
        w315 = xxyy - w225
        w360 = yy
        c127 = ((w225 * clamp(v225) + w270 * clamp(v270)
                 + w315 * clamp(v315) + w360 * clamp(v360)) / xxyy) \
            / F.sqrt(1 + F.lit(c["sqz"]) * xxyy)
        fc = F.when(xxyy == 0.0,
                    F.lit(float(1.0 + c["sin_alt254"])).cast("float")) \
            .otherwise((1.0 + c127).cast("float"))
    elif variant == "igor":
        # GDALHillshadeIgorAlg (:944): slope strength x aspect proximity
        # to the light direction; raw (unscaled) sums feed the aspect
        x, y = _gradient(w, c, gradient_alg)
        slope_deg = F.atan(F.sqrt(x * x + y * y) * F.lit(c["zf"])) \
            * F.lit(_RAD2DEG)
        if gradient_alg == "zt":
            dxa = (w("w5") - w("w3")).cast("double")
            dya = (w("w7") - w("w1")).cast("double")
        else:
            dxa = ((w("w2") + 2 * w("w5") + w("w8"))
                   - (w("w0") + 2 * w("w3") + w("w6"))).cast("double")
            dya = ((w("w6") + 2 * w("w7") + w("w8"))
                   - (w("w0") + 2 * w("w1") + w("w2"))).cast("double")
        aspect = F.atan2(dya, -dxa)
        two_pi = 2 * math.pi
        target = (3 * math.pi / 2) - c["az_rad"]

        def norm(e):
            m = e % F.lit(two_pi)  # Spark % = C fmod (dividend sign)
            return F.when(m < 0, m + two_pi).otherwise(m)

        diff = F.abs(norm(aspect) - norm(F.lit(target)))
        diff = F.when(diff > math.pi, two_pi - diff).otherwise(diff)
        shadow = 1.0 - (slope_deg / 90.0) * (1.0 - diff / math.pi)
        fc = (255.0 * shadow).cast("float")
    elif c["same_res"]:
        x, y = _acc_xy_same_res(w)
        c254 = (F.lit(c["sin_alt254"])
                + (x * F.lit(c["sin254inv"]) + y * F.lit(c["cos254inv"]))) \
            / F.sqrt(1 + F.lit(c["sqz_inv2"]) * (x * x + y * y))
        fc = F.when(c254 <= 0.0, F.lit(1.0).cast("float")) \
            .otherwise((1.0 + c254).cast("float"))
    else:
        x, y = _gradient(w, c, gradient_alg)
        c254 = (F.lit(c["sin_alt254"])
                - (y * F.lit(c["cos_az_caz254"])
                   - x * F.lit(c["sin_az_caz254"]))) \
            / F.sqrt(1 + F.lit(c["sqz"]) * (x * x + y * y))
        fc = F.when(c254 <= 0.0, F.lit(1.0).cast("float")) \
            .otherwise((1.0 + c254).cast("float"))
    shade = F.when(F.col("valid"), _byte_write(fc)).otherwise(F.lit(0))
    return g.select("bx", "by", shade.alias("shade"))


def slope_gdal(cells: DataFrame, geotransform, width: int, height: int,
               value_col: str = "value", scale: float = 1.0,
               percent: bool = False, gradient_alg: str = "horn",
               xscale: float | None = None, yscale: float | None = None,
               compute_edges: bool = False,
               src_nodata: int | None = None) -> DataFrame:
    """gdaldem slope (GDALSlopeHornAlg / GDALSlopeZevenbergenThorneAlg),
    float32 degrees (default) or percent: (bx, by, slope); invalid cells
    carry dst nodata -9999."""
    xs = scale if xscale is None else xscale
    ys = scale if yscale is None else yscale
    ew = geotransform[1] * xs
    ns = geotransform[5] * ys
    g = window9_gdal(cells, width, height, value_col, compute_edges,
                     src_nodata)
    w = F.col
    if gradient_alg == "zt":
        dx = (w("w3") - w("w5")).cast("double") / F.lit(ew)
        dy = (w("w7") - w("w1")).cast("double") / F.lit(ns)
        div = 2.0
    else:
        dx = ((w("w0") + 2 * w("w3") + w("w6"))
              - (w("w2") + 2 * w("w5") + w("w8"))).cast("double") / F.lit(ew)
        dy = ((w("w6") + 2 * w("w7") + w("w8"))
              - (w("w0") + 2 * w("w1") + w("w2"))).cast("double") / F.lit(ns)
        div = 8.0
    key = dx * dx + dy * dy
    if percent:
        val = (100.0 * (F.sqrt(key) / div)).cast("float")
    else:
        val = (F.atan(F.sqrt(key) / div) * F.lit(_RAD2DEG)).cast("float")
    out = F.when(F.col("valid"), val).otherwise(F.lit(-9999.0).cast("float"))
    return g.select("bx", "by", out.alias("slope"))


def aspect_gdal(cells: DataFrame, width: int, height: int,
                value_col: str = "value", azimuth: bool = True,
                zero_for_flat: bool = False, gradient_alg: str = "horn",
                compute_edges: bool = False,
                src_nodata: int | None = None) -> DataFrame:
    """gdaldem aspect (GDALAspectAlg / ZevenbergenThorne twin): float32
    azimuth degrees (default) or trigonometric angle; flat cells and
    invalid cells carry the dst nodata (-9999, or 0 with
    -zero_for_flat)."""
    dst_nd = 0.0 if zero_for_flat else -9999.0
    g = window9_gdal(cells, width, height, value_col, compute_edges,
                     src_nodata)
    w = F.col
    if gradient_alg == "zt":
        dx = (w("w5") - w("w3")).cast("double")
        dy = (w("w7") - w("w1")).cast("double")
    else:
        dx = ((w("w2") + 2 * w("w5") + w("w8"))
              - (w("w0") + 2 * w("w3") + w("w6"))).cast("double")
        dy = ((w("w6") + 2 * w("w7") + w("w8"))
              - (w("w0") + 2 * w("w1") + w("w2"))).cast("double")
    # float aspect = float(atan2(dy, -dx) / (pi/180)); the azimuth
    # rotation then runs in FLOAT arithmetic (450.0f/90.0f literals)
    asp = (F.atan2(dy, -dx) / F.lit(_DEG2RAD)).cast("float")
    if azimuth:
        asp = F.when(asp > F.lit(90.0).cast("float"),
                     (F.lit(450.0).cast("float") - asp).cast("float")) \
            .otherwise((F.lit(90.0).cast("float") - asp).cast("float"))
    else:
        asp = F.when(asp < 0.0, (asp + F.lit(360.0).cast("float"))
                     .cast("float")).otherwise(asp)
    asp = F.when(asp == F.lit(360.0).cast("float"),
                 F.lit(0.0).cast("float")).otherwise(asp)
    flat = (dx == 0.0) & (dy == 0.0)
    out = F.when(~F.col("valid") | flat, F.lit(dst_nd).cast("float")) \
        .otherwise(asp)
    return g.select("bx", "by", out.alias("aspect"))


_DBL_EPSILON = 2.220446049250313e-16


def parse_color_file(text: str, src_nodata: float | None = None):
    """GDALLoadTextColorMap's plain subset: `value r g b` lines (alpha
    ignored), `nv` meaning the source nodata value, blank/# lines
    skipped. Percentages (need band min/max) raise."""
    out = []
    for line in text.splitlines():
        parts = line.replace(",", " ").split()
        if not parts or parts[0].startswith("#"):
            continue
        if parts[0] == "nv":
            if src_nodata is None:
                continue
            val = float(src_nodata)
        elif parts[0].endswith("%"):
            raise NotImplementedError("percentage color entries need "
                                      "band statistics")
        else:
            val = float(parts[0])
        out.append((val, int(parts[1]), int(parts[2]), int(parts[3])))
    return out


def process_colors(ramp, src_nodata: float | None = None,
                   mode: str = "interpolate"):
    """GDALColorReliefProcessColors (gdaldem_lib.cpp:1535): stable-sort
    the ramp, bracket a ramp entry that EQUALS the source nodata with
    nextafter twins carrying the neighbor colors (so interpolation never
    leaks across nodata), and nudge runs of repeated values apart by
    balanced DBL_EPSILON multiples (issue #6422 semantics) — all in
    driver-side float64, bit-identical to the C."""
    import numpy as np

    ents = [[float(e), int(r), int(g), int(b)] for e, r, g, b in ramp]
    ents.sort(key=lambda e: (0, 0.0) if math.isnan(e[0]) else (1, e[0]))
    n_initial = len(ents)
    repeated = 0
    for i in range(1, n_initial):
        prev, cur = ents[i - 1], ents[i]
        if (mode != "exact" and src_nodata is not None
                and cur[0] == src_nodata):
            new_val = float(np.nextafter(cur[0], -math.inf))
            if new_val > prev[0]:
                ents.append([new_val, prev[1], prev[2], prev[3]])
        elif (mode != "exact" and src_nodata is not None
                and prev[0] == src_nodata):
            new_val = float(np.nextafter(prev[0], math.inf))
            if new_val < cur[0]:
                ents.append([new_val, cur[1], cur[2], cur[3]])
        elif repeated == 0 and cur[0] == prev[0]:
            repeated = i
        elif repeated != 0 and cur[0] != prev[0]:
            if repeated >= 2:
                lower = ents[repeated - 2]
                total = cur[0] - lower[0]
                left = prev[0] - lower[0]
            else:
                total = cur[0] - prev[0]
                left = 0.0
            n_eq = i - repeated + 1
            if total > abs(prev[0]) * n_eq * _DBL_EPSILON:
                mult = 0.5 - n_eq * left / total
                for j in range(repeated - 1, i):
                    ents[j][0] += (abs(prev[0]) * mult) * _DBL_EPSILON
                    mult += 1.0
            repeated = 0
    if len(ents) != n_initial:
        ents.sort(key=lambda e: (0, 0.0) if math.isnan(e[0]) else (1, e[0]))
    return [tuple(e) for e in ents]


def color_relief_gdal(cells: DataFrame, ramp, value_col: str = "value",
                      mode: str = "interpolate",
                      src_nodata: float | None = None) -> DataFrame:
    """gdaldem color-relief with GDALColorReliefGetRGBA semantics: the
    ramp is preprocessed by process_colors, then per pixel the first
    entry >= value brackets the segment; exact-entry match wins (lower
    entry first); values at or below the first entry clamp to its color,
    above the last to its; `interpolate` (default) linearly blends each
    channel with the reference's int(0.5 + c0 + ratio*(c1-c0)) round and
    0..255 clamp, `nearest` (-nearest_color_entry) picks the closer
    entry (ties to the upper), `exact` (-exact_color_entry) yields 0 for
    any non-entry value.

    ramp: [(elev, r, g, b), ...] (any order). Output (bx, by, r, g, b)
    over ALL cells (color-relief has no 3x3 window, no edge ring).
    NaN ramp entries are unsupported (absent cells here model nodata)."""
    if mode not in ("interpolate", "nearest", "exact"):
        raise ValueError(f"unknown color mode {mode!r}")
    ramp = process_colors(ramp, src_nodata, mode)
    if any(math.isnan(e[0]) for e in ramp):
        raise NotImplementedError("NaN color entries")
    v = F.col(value_col).cast("double")

    def chan(k):
        if mode == "exact":
            expr = F.lit(0)
            for e, *c in reversed(ramp):
                expr = F.when(v == F.lit(e), F.lit(c[k - 1])).otherwise(expr)
            return expr.cast("long")
        expr = F.lit(ramp[-1][k])  # above the last entry
        for (e0, *c0), (e1, *c1) in reversed(list(zip(ramp[:-1], ramp[1:]))):
            if e1 == e0:
                # equal-value pair survived process_colors' fallback:
                # only exact matches (handled below) can land here
                seg = F.lit(c0[k - 1])
            elif mode == "nearest":
                seg = F.when(v - F.lit(e0) < F.lit(e1) - v,
                             F.lit(c0[k - 1])).otherwise(F.lit(c1[k - 1]))
            else:
                ratio = (v - F.lit(e0)) / F.lit(e1 - e0)
                seg = F.least(
                    F.lit(255), F.greatest(F.lit(0), F.floor(
                        0.5 + F.lit(c0[k - 1])
                        + ratio * F.lit(c1[k - 1] - c0[k - 1])).cast("int")))
            seg = F.when(v == F.lit(e0), F.lit(c0[k - 1])) \
                .when(v == F.lit(e1), F.lit(c1[k - 1])).otherwise(seg)
            expr = F.when(v <= F.lit(e1), seg).otherwise(expr)
        return F.when(v <= F.lit(ramp[0][0]), F.lit(ramp[0][k])) \
            .otherwise(expr).cast("long")

    return cells.select("bx", "by", chan(1).alias("r"), chan(2).alias("g"),
                        chan(3).alias("b"))


def tpi_gdal(cells: DataFrame, width: int, height: int,
             value_col: str = "value", compute_edges: bool = False,
             src_nodata: int | None = None) -> DataFrame:
    """gdaldem TPI (GDALTPIAlg, :2324): centre minus the 8-neighbour
    mean; the 0.125 multiply runs in FLOAT arithmetic (the C's 0.125f),
    as does the final subtract. (bx, by, tpi); dst nodata -9999."""
    g = window9_gdal(cells, width, height, value_col, compute_edges,
                     src_nodata)
    w = F.col
    s8 = (w("w0") + w("w1") + w("w2") + w("w3") + w("w5")
          + w("w6") + w("w7") + w("w8"))
    mean = (s8.cast("float") * F.lit(0.125).cast("float")).cast("float")
    val = (w("w4").cast("float") - mean).cast("float")
    out = F.when(F.col("valid"), val).otherwise(F.lit(-9999.0).cast("float"))
    return g.select("bx", "by", out.alias("tpi"))


def tri_gdal(cells: DataFrame, width: int, height: int,
             value_col: str = "value", algorithm: str = "riley",
             compute_edges: bool = False,
             src_nodata: int | None = None) -> DataFrame:
    """gdaldem TRI: Riley (default, :2304) sqrt of summed squared
    centre-neighbour differences in double; Wilson (:2289) mean absolute
    difference with the float 0.125f multiply. (bx, by, tri); dst
    nodata -9999."""
    if algorithm not in ("riley", "wilson"):
        raise ValueError(f"unknown TRI algorithm {algorithm!r}")
    g = window9_gdal(cells, width, height, value_col, compute_edges,
                     src_nodata)
    w = F.col
    others = ["w0", "w1", "w2", "w3", "w5", "w6", "w7", "w8"]
    if algorithm == "wilson":
        s = None
        for k in others:
            t = F.abs(w(k) - w("w4"))
            s = t if s is None else s + t
        val = (s.cast("float") * F.lit(0.125).cast("float")).cast("float")
    else:
        s = None
        for k in others:
            t = (w(k) - w("w4")).cast("double")
            t = t * t
            s = t if s is None else s + t
        val = F.sqrt(s).cast("float")
    out = F.when(F.col("valid"), val).otherwise(F.lit(-9999.0).cast("float"))
    return g.select("bx", "by", out.alias("tri"))


def roughness_gdal(cells: DataFrame, width: int, height: int,
                   value_col: str = "value", compute_edges: bool = False,
                   src_nodata: int | None = None) -> DataFrame:
    """gdaldem roughness (GDALRoughnessAlg, :2339): window max minus
    window min, float cast. (bx, by, roughness); dst nodata -9999."""
    g = window9_gdal(cells, width, height, value_col, compute_edges,
                     src_nodata)
    cols = [F.col(lbl) for lbl, _, _ in _SLOTS]
    val = (F.greatest(*cols) - F.least(*cols)).cast("float")
    out = F.when(F.col("valid"), val).otherwise(F.lit(-9999.0).cast("float"))
    return g.select("bx", "by", out.alias("roughness"))

"""Vaisala Sigmet IRIS weather-radar product codec.

Reference semantics (studied, re-expressed — no code copied):
frmts/iris/irisdataset.cpp —
- 640-byte header: structure ids 27/26 at [0]/[12], product code u16
  at [24], generation/ingest times (secs + y/m/d shorts at
  [32..44] / [44..]), config/task names at [74]/[86], raster dims i32
  at [112]/[116], data type u16 at [142], input type u16 at [156],
  projection code u8 at [158], radar location i32/1000 at
  [124]/[128], scale i32/100 at [100]/[104]; the ingest-configuration
  block starts at 332 (site names, radius cm at [552], inverse
  flattening 1e-6 at [556], center lat/lon as 32-bit binary angles at
  [440]/[444], proj ref at [572]/[576], PRF/wavelength at
  [452]/[480], heights at [616]/[450], composite mask at [564]).
- cells: one byte (or two for the *2 types) per sample from offset
  640, rows stored BOTTOM-UP (IReadBlock seeks nYSize-1-y,
  :268); dBZ/dBT convert (v - 64)/2 with 95.5 -> nodata
  (:279-287) — the RAW band is what GDALChecksumImage sees for byte
  products only when the type is not dBZ; for dBZ the checksum runs
  over the CONVERTED floats.
- Mercator geotransform (:517-570): two Vincenty direct shots from
  the center (azimuth 90 for X, 0 for Y) give the 1-pixel-away
  lon/lat; both project through Mercator_1SP on the header ellipsoid;
  gt derives from the projected deltas around the radar location.
  Azimuthal equidistant / other projections use the plain
  radar-centered gt (:573-597)."""

from __future__ import annotations

import math
import struct

import numpy as np

PRODUCT_NAMES = [
    "", "PPI", "RHI", "CAPPI", "CROSS", "TOPS", "TRACK",
    "RAIN1", "RAINN", "VVP", "VIL", "SHEAR", "WARN", "CATCH",
    "RTI", "RAW", "MAX", "USER", "USERV", "OTHER", "STATUS",
    "SLINE", "WIND", "BEAM", "TEXT", "FCAST", "NDOP", "IMAGE",
    "COMP", "TDWR", "GAGE", "DWELL", "SRI", "BASE", "HMAX"]

DATA_TYPE_CODES = [
    "XHDR", "DBT", "dBZ", "VEL", "WIDTH", "ZDR",
    "ORAIN", "dBZC", "DBT2", "dBZ2", "VEL2", "WIDTH2",
    "ZDR2", "RAINRATE2", "KDP", "KDP2", "PHIDP", "VELC",
    "SQI", "RHOHV", "RHOHV2", "dBZC2", "VELC2", "SQI2",
    "PHIDP2", "LDRH", "LDRH2", "LDRV", "LDRV2", "FLAGS",
    "FLAGS2", "FLOAT32", "HEIGHT", "VIL2", "NULL", "SHEAR",
    "DIVERGE2", "FLIQUID2", "USER", "OTHER", "DEFORM2", "VVEL2",
    "HVEL2", "HDIR2", "AXDIL2", "TIME2", "RHOH", "RHOH2",
    "RHOV", "RHOV2", "PHIH", "PHIH2", "PHIV", "PHIV2",
    "USER2", "HCLASS", "HCLASS2", "ZDRC", "ZDRC2",
    "TEMPERATURE16", "VIR16", "DBTV8", "DBTV16", "DBZV8",
    "DBZV16", "SNR8", "SNR16", "ALBEDO8", "ALBEDO16", "VILD16",
    "TURB16"]

DATA_TYPE_NAMES = [
    "Extended Headers", "Total H power (1 byte)",
    "Clutter Corrected H reflectivity (1 byte)", "Velocity (1 byte)",
    "Width (1 byte)", "Differential reflectivity (1 byte)",
    "Old Rainfall rate (stored as dBZ)",
    "Fully corrected reflectivity (1 byte)",
    "Uncorrected reflectivity (2 byte)",
    "Corrected reflectivity (2 byte)", "Velocity (2 byte)",
    "Width (2 byte)", "Differential reflectivity (2 byte)",
    "Rainfall rate (2 byte)",
    "Kdp (specific differential phase)(1 byte)",
    "Kdp (specific differential phase)(2 byte)",
    "PHIdp (differential phase)(1 byte)", "Corrected Velocity (1 byte)",
    "SQI (1 byte)", "RhoHV(0) (1 byte)", "RhoHV(0) (2 byte)",
    "Fully corrected reflectivity (2 byte)",
    "Corrected Velocity (2 byte)", "SQI (2 byte)",
    "PHIdp (differential phase)(2 byte)", "LDR H to V (1 byte)",
    "LDR H to V (2 byte)", "LDR V to H (1 byte)", "LDR V to H (2 byte)",
    "Individual flag bits for each bin", "", "Test of floating format",
    "Height (1/10 km) (1 byte)", "Linear liquid (.001mm) (2 byte)",
    "Data type is not applicable", "Wind Shear (1 byte)",
    "Divergence (.001 10**-4) (2-byte)", "Floated liquid (2 byte)",
    "User type, unspecified data (1 byte)",
    "Unspecified data, no color legend",
    "Deformation (.001 10**-4) (2-byte)",
    "Vertical velocity (.01 m/s) (2-byte)",
    "Horizontal velocity (.01 m/s) (2-byte)",
    "Horizontal wind direction (.1 degree) (2-byte)",
    "Axis of Dillitation (.1 degree) (2-byte)",
    "Time of data (seconds) (2-byte)", "Rho H to V (1 byte)",
    "Rho H to V (2 byte)", "Rho V to H (1 byte)", "Rho V to H (2 byte)",
    "Phi H to V (1 byte)", "Phi H to V (2 byte)", "Phi V to H (1 byte)",
    "Phi V to H (2 byte)", "User type, unspecified data (2 byte)",
    "Hydrometeor class (1 byte)", "Hydrometeor class (2 byte)",
    "Corrected Differential reflectivity (1 byte)",
    "Corrected Differential reflectivity (2 byte)",
    "Temperature (2 byte)",
    "Vertically Integrated Reflectivity (2 byte)",
    "Total V Power (1 byte)", "Total V Power (2 byte)",
    "Clutter Corrected V Reflectivity (1 byte)",
    "Clutter Corrected V Reflectivity (2 byte)",
    "Signal to Noise ratio (1 byte)", "Signal to Noise ratio (2 byte)",
    "Albedo (1 byte)", "Albedo (2 byte)", "VIL Density (2 byte)",
    "Turbulence (2 byte)"]

PROJECTIONS = ["Azimutal equidistant", "Mercator",
               "Polar Stereographic", "UTM",
               "Perspective from geosync", "Equidistant cylindrical",
               "Gnomonic", "Gauss conformal", "Lambert conformal conic"]

_U32MAX = 0xFFFFFFFF


def _s16(b, o):
    return struct.unpack_from("<h", b, o)[0]


def _u16(b, o):
    return struct.unpack_from("<H", b, o)[0]


def _s32(b, o):
    return struct.unpack_from("<i", b, o)[0]


def _u32(b, o):
    return struct.unpack_from("<I", b, o)[0]


def _string(b, o, n):
    return b[o:o + n].split(b"\x00")[0].decode("latin-1")


def vincenty_direct(lat, lon, azimuth, dist, a, b, f):
    """Vincenty direct problem (Vincenty 1975) -> (lon2, lat2) in
    degrees; the reference's geotransform helper
    (irisdataset.cpp:621-700)."""
    alpha1 = math.radians(azimuth)
    sa1, ca1 = math.sin(alpha1), math.cos(alpha1)
    tanu1 = (1 - f) * math.tan(math.radians(lat))
    cosu1 = 1 / math.sqrt(1 + tanu1 * tanu1)
    sinu1 = tanu1 * cosu1
    sigma1 = math.atan2(tanu1, ca1)
    sinalpha = cosu1 * sa1
    cos2alpha = 1 - sinalpha * sinalpha
    usq = cos2alpha * (a * a - b * b) / (b * b)
    A = 1 + usq / 16384 * (4096 + usq * (-768 + usq * (320 - 175 * usq)))
    B = usq / 1024 * (256 + usq * (-128 + usq * (74 - 47 * usq)))
    sigma = dist / (b * A)
    sigmap = 2 * math.pi
    sinS = cosS = cos2sm = 0.0
    it = 0
    while abs(sigma - sigmap) > 1e-12:
        cos2sm = math.cos(2 * sigma1 + sigma)
        sinS, cosS = math.sin(sigma), math.cos(sigma)
        dsig = B * sinS * (cos2sm + B / 4 * (
            cosS * (-1 + 2 * cos2sm * cos2sm)
            - B / 6 * cos2sm * (-3 + 4 * sinS * sinS)
            * (-3 + 4 * cos2sm * cos2sm)))
        sigmap = sigma
        sigma = dist / (b * A) + dsig
        it += 1
        if it == 100:
            raise ValueError("Vincenty iteration failed")
    tmp = sinu1 * sinS - cosu1 * cosS * ca1
    lat2 = math.atan2(sinu1 * cosS + cosu1 * sinS * ca1,
                      (1 - f) * math.sqrt(sinalpha * sinalpha
                                          + tmp * tmp))
    lam = math.atan2(sinS * sa1, cosu1 * cosS - sinu1 * sinS * ca1)
    C = f / 16 * cos2alpha * (4 + f * (4 - 3 * cos2alpha))
    L = lam - (1 - C) * f * sinalpha * (
        sigma + C * sinS * (cos2sm + C * cosS *
                            (-1 + 2 * cos2sm * cos2sm)))
    lon2 = math.radians(lon) + L
    if lon2 > math.pi:
        lon2 -= 2 * math.pi
    if lon2 < -math.pi:
        lon2 += 2 * math.pi
    return math.degrees(lon2), math.degrees(lat2)


def _mercator_xy(lat, lon, a, e, lon0):
    """Mercator_1SP forward (ellipsoidal isometric latitude; e = 0
    reduces to the spherical formula)."""
    x = a * math.radians(lon - lon0)
    phi = math.radians(lat)
    if e == 0.0:
        y = a * math.log(math.tan(math.pi / 4 + phi / 2))
    else:
        es = e * math.sin(phi)
        y = a * math.log(math.tan(math.pi / 4 + phi / 2)
                         * ((1 - es) / (1 + es)) ** (e / 2))
    return x, y


def decode_iris(data: bytes):
    """-> (values (h, w) float32 NORTH-UP, meta with the autotest's
    metadata keys)."""
    if len(data) < 640 or _s16(data, 0) != 27 or _s16(data, 12) != 26:
        raise ValueError("not an IRIS product payload")
    product_code = _u16(data, 24)
    if not 0 < product_code < len(PRODUCT_NAMES):
        raise ValueError("unknown IRIS product")
    w = _s32(data, 112)
    h = _s32(data, 116)
    dtype_code = _u16(data, 142)
    input_code = _u16(data, 156)
    proj_code = data[158]
    meta = {
        "PRODUCT": PRODUCT_NAMES[product_code],
        "PRODUCT_ID": str(product_code),
        "DATA_TYPE_CODE": DATA_TYPE_CODES[dtype_code],
        "DATA_TYPE": DATA_TYPE_NAMES[dtype_code],
        "DATA_TYPE_INPUT_CODE": DATA_TYPE_CODES[input_code],
        "DATA_TYPE_INPUT": DATA_TYPE_NAMES[input_code],
        "PROJECTION": PROJECTIONS[proj_code]
        if proj_code < len(PROJECTIONS) else "unknown",
    }

    def timestr(sec_off, ymd_off):
        secs = _s32(data, sec_off)
        hh = secs // 3600
        mm = (secs - hh * 3600) // 60
        ss = secs - hh * 3600 - mm * 60
        return "%d-%02d-%02d %02d:%02d:%02d" % (
            _s16(data, ymd_off), _s16(data, ymd_off + 2),
            _s16(data, ymd_off + 4), hh, mm, ss)

    meta["TIME_PRODUCT_GENERATED"] = timestr(32, 38)
    meta["TIME_INPUT_INGEST_SWEEP"] = timestr(44, 38)

    meta["PRODUCT_SITE_NAME"] = _string(data, 332, 16)
    meta["PRODUCT_SITE_IRIS_VERSION"] = _string(data, 332 + 16, 8)
    meta["INGEST_SITE_NAME"] = _string(data, 332 + 90, 16)
    meta["INGEST_SITE_IRIS_VERSION"] = _string(data, 332 + 24, 8)
    meta["INGEST_HARDWARE_NAME"] = _string(data, 332 + 74, 16)
    meta["PRODUCT_CONFIGURATION_NAME"] = _string(data, 74, 12)
    meta["TASK_NAME"] = _string(data, 86, 12)

    radar_height = _s16(data, 332 + 284)
    ground_rel = _s16(data, 332 + 118)
    meta["RADAR_HEIGHT"] = f"{radar_height} m"
    meta["GROUND_HEIGHT"] = f"{radar_height - ground_rel} m"

    flags = _u16(data, 98)
    if (flags << 4 & 0xFFFF) >> 15 == 1:
        meta["COMPOSITED_PRODUCT"] = "YES"
        meta["COMPOSITED_PRODUCT_MASK"] = "0x%08x" % _u32(data,
                                                          332 + 232)
    else:
        meta["COMPOSITED_PRODUCT"] = "NO"
    prf = _s32(data, 332 + 120)
    wavelength_cm100 = _s32(data, 332 + 148)
    meta["PRF"] = f"{prf} Hz"
    meta["WAVELENGTH"] = "%4.2f cm" % (wavelength_cm100 / 100.0)
    pol = _u16(data, 332 + 172)
    nyq = prf * (np.float32(wavelength_cm100) / np.float32(10000.0)) \
        / np.float32(4.0)
    nyq = float(nyq) * {1: 2.0, 2: 3.0, 3: 4.0}.get(pol, 1.0)
    meta["NYQUIST_VELOCITY"] = "%.2f m/s" % nyq

    pname = PRODUCT_NAMES[product_code]
    if pname == "CAPPI":
        meta["CAPPI_BOTTOM_HEIGHT"] = "%.1f m" % (
            _s32(data, 4 + 176) / 100.0)
        meta["AZIMUTH_SMOOTHING_FOR_SHEAR"] = "%.1f" % (
            _u16(data, 10 + 176) * 360.0 / 65536.0)
        meta["MAX_AGE_FOR_SHEAR_VVP_CORRECTION"] = "%d s" % _u32(
            data, 24 + 176)
        meta["DATA_TYPE_UNITS"] = ("dBZ" if DATA_TYPE_CODES[dtype_code]
                                   == "dBZ" else "m/s")
    elif pname == "PPI":
        meta["PPI_ELEVATION_ANGLE"] = "%f" % (
            _s16(data, 176) * 360.0 / 65536.0)
        meta["DATA_TYPE_UNITS"] = ("dBZ" if DATA_TYPE_CODES[dtype_code]
                                   == "dBZ" else "m/s")

    # cells: bottom-up byte/short records from 640
    two_byte = DATA_TYPE_CODES[dtype_code].endswith("2") or \
        dtype_code in (60, 62, 64, 66, 68, 69, 70)
    if dtype_code == 31:
        raise ValueError("FLOAT32 IRIS payloads not supported")
    if two_byte:
        raw = np.frombuffer(data, "<u2", count=w * h, offset=640) \
            .reshape(h, w)[::-1]
        vals = (raw.astype(np.float32) - np.float32(32768.0)) \
            / np.float32(100.0)
    else:
        raw = np.frombuffer(data, np.uint8, count=w * h, offset=640) \
            .reshape(h, w)[::-1]
        if dtype_code in (1, 2):  # dBT / dBZ
            vals = (raw.astype(np.float32) - np.float32(64.0)) \
                / np.float32(2.0)
            vals = np.where(vals == np.float32(95.5),
                            np.float32(-9999.0), vals)
        else:
            vals = raw.astype(np.float32)

    # geotransform
    radius = _u32(data, 332 + 220) / 100.0
    invf = _u32(data, 332 + 224) / 1000000.0
    if radius == 0.0:
        a = b = 6371000.0
        f = 0.0
        invf = 0.0
    elif invf == 0.0:
        a = b = radius
        f = 0.0
    else:
        f = 1.0 / invf
        a = radius
        b = a * (1.0 - f)
    center_lon = _u32(data, 332 + 112) * 360.0 / _U32MAX
    center_lat = _u32(data, 332 + 108) * 360.0 / _U32MAX
    ref_lon = _u32(data, 332 + 244) * 360.0 / _U32MAX
    ref_lat = _u32(data, 332 + 240) * 360.0 / _U32MAX
    radar_x = _s32(data, 124) / 1000.0
    radar_y = _s32(data, 128) / 1000.0
    scale_x = _s32(data, 100) / 100.0
    scale_y = _s32(data, 104) / 100.0
    gt = None
    if 0.0 < scale_x < b and 0.0 < scale_y < b:
        if PROJECTIONS[proj_code] == "Mercator" if proj_code < len(
                PROJECTIONS) else False:
            e = math.sqrt(max(0.0, 2 * f - f * f))
            lon2, _ = vincenty_direct(center_lat, center_lon, 90.0,
                                      scale_x, a, b, f)
            _, lat2 = vincenty_direct(center_lat, center_lon, 0.0,
                                      scale_y, a, b, f)
            x0, y0 = _mercator_xy(center_lat, center_lon, a, e,
                                  ref_lon)
            x2, _ = _mercator_xy(center_lat, lon2, a, e, ref_lon)
            _, y2 = _mercator_xy(lat2, center_lon, a, e, ref_lon)
            gt = (x0 - radar_x * (x2 - x0), x2 - x0, 0.0,
                  y0 + radar_y * (y2 - y0), 0.0, -(y2 - y0))
        else:
            gt = (-radar_x * scale_x, scale_x, 0.0,
                  radar_y * scale_y, 0.0, -scale_y)
    meta["gt"] = gt
    meta["width"] = w
    meta["height"] = h
    return vals, meta


def read_iris(spark, path: str):
    import pandas as pd

    vals, meta = decode_iris(open(path, "rb").read())
    h, w = vals.shape
    yy, xx = np.mgrid[0:h, 0:w]
    keep = vals != np.float32(-9999.0)
    pdf = pd.DataFrame({"bx": xx[keep].astype(np.int64),
                        "by": (h - 1 - yy[keep]).astype(np.int64),
                        "value": vals[keep].astype(np.float64)})
    return (spark.createDataFrame(pdf, "bx long, by long, value double"),
            meta)

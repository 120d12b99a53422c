"""ADRG (ARC Digitized Raster Graphics) source over ISO 8211.

Reference semantics (studied, re-expressed — no code copied):
frmts/adrg/adrgdataset.cpp —
- the .GEN file is ISO 8211: the general-information record ("001"
  RTY == 'GIN') carries GEN (STR must be 3; ZNA zone, ARV/BRV pixels
  per 360 degrees, LSO '+dddmmss.ss' / PSO '+ddmmss.ss' origin) and
  SPR (NFL/NFC tile grid, PNC=PNL=128, BAD = .IMG file name, TIF flag
  + TIM tile-index map).
- the .IMG file wraps raw tiles behind an ISO 8211 header: pixel data
  starts after the 'IMG' field marker's header run (scan to the next
  0x1E, :33-90); each tile is 128x128x3 band-sequential bytes,
  TIM[block] 0 = empty tile.
- geotransform (:761-812): normal zones (LSO, 360/ARV, PSO,
  -360/BRV) in degrees; polar zones 9/18 use the ARC system's
  meters-per-degree constant 111319.4907933 and 40075016.68558/ARV
  pixel size with the LSO-rotated origin."""

from __future__ import annotations

import math
import os

import numpy as np

from .iso8211 import parse_ddf


def _lon(s: str) -> float:
    sign = 1 if s[0] == "+" else -1
    return sign * (float(s[1:4]) + float(s[4:6]) / 60
                   + float(s[6:11]) / 3600)


def _lat(s: str) -> float:
    sign = 1 if s[0] == "+" else -1
    return sign * (float(s[1:3]) + float(s[3:5]) / 60
                   + float(s[5:10]) / 3600)


def parse_gen(data: bytes) -> dict:
    _fields, recs = parse_ddf(data)
    for r in recs:
        rty = r.get("001", [{}])[0].get("RTY")
        if rty != "GIN":
            continue
        gen = r.get("GEN", [{}])[0]
        spr = r.get("SPR", [{}])[0]
        if gen.get("STR") != 3 or not spr:
            continue
        zna = gen.get("ZNA", 0)
        arv = gen.get("ARV")
        brv = gen.get("BRV")
        lso = _lon(gen["LSO"])
        pso = _lat(gen["PSO"])
        tif = str(spr.get("TIF", "N")).startswith("Y")
        tim = [g[k] for g in r.get("TIM", [])
               for k in g] if tif else None
        if zna == 9:
            gt = (111319.4907933 * (90.0 - pso)
                  * math.sin(lso * math.pi / 180.0),
                  40075016.68558 / arv, 0.0,
                  -111319.4907933 * (90.0 - pso)
                  * math.cos(lso * math.pi / 180.0),
                  0.0, -40075016.68558 / arv)
        elif zna == 18:
            gt = (111319.4907933 * (90.0 + pso)
                  * math.sin(lso * math.pi / 180.0),
                  40075016.68558 / arv, 0.0,
                  111319.4907933 * (90.0 + pso)
                  * math.cos(lso * math.pi / 180.0),
                  0.0, -40075016.68558 / arv)
        else:
            gt = (lso, 360.0 / arv, 0.0, pso, 0.0, -360.0 / brv)
        return {"zna": zna, "arv": arv, "brv": brv, "lso": lso,
                "pso": pso, "nfl": spr["NFL"], "nfc": spr["NFC"],
                "bad": str(spr.get("BAD", "")).strip(),
                "tif": tif, "tim": tim, "gt": gt}
    raise ValueError("no GIN record in ADRG GEN file")


def _img_data_offset(img: bytes) -> int:
    """Skip the IMG file's ISO 8211 header: pixel data begins after
    the 'IMG' field marker's run up to the next field terminator
    (adrgdataset.cpp:33-90)."""
    idx = img.find(b"IMG")
    if idx < 0:
        raise ValueError("no IMG marker in ADRG IMG file")
    i = idx + 3 + 4
    while i < len(img) and img[i] != 0x1E:
        i += 1
    return i + 1


def read_adrg_array(gen_path: str, img_path: str | None = None):
    """-> (bands [R, G, B] each (h, w) uint8 north-up, meta)."""
    meta = parse_gen(open(gen_path, "rb").read())
    if img_path is None:
        img_path = os.path.join(os.path.dirname(gen_path), meta["bad"])
        if not os.path.exists(img_path):
            cand = [f for f in os.listdir(os.path.dirname(gen_path))
                    if f.upper().endswith(".IMG")]
            if cand:
                img_path = os.path.join(os.path.dirname(gen_path),
                                        cand[0])
    img = open(img_path, "rb").read()
    off = _img_data_offset(img)
    nfl, nfc = meta["nfl"], meta["nfc"]
    h, w = nfl * 128, nfc * 128
    bands = [np.zeros((h, w), np.uint8) for _ in range(3)]
    tim = meta["tim"]
    for block in range(nfl * nfc):
        if tim is not None:
            t = int(tim[block]) if block < len(tim) else 0
            if t <= 0:
                continue
            base = off + (t - 1) * 128 * 128 * 3
        else:
            base = off + block * 128 * 128 * 3
        by, bx = divmod(block, nfc)
        for b in range(3):
            tile = np.frombuffer(img, np.uint8, count=128 * 128,
                                 offset=base + b * 128 * 128)
            bands[b][by * 128:(by + 1) * 128,
                     bx * 128:(bx + 1) * 128] = tile.reshape(128, 128)
    meta = dict(meta)
    meta["width"] = w
    meta["height"] = h
    return bands, meta


def read_adrg(spark, gen_path: str, band: int = 1):
    import pandas as pd

    bands, meta = read_adrg_array(gen_path)
    vals = bands[band - 1].astype(np.float64)
    h, w = vals.shape
    yy, xx = np.mgrid[0:h, 0:w]
    pdf = pd.DataFrame({"bx": xx.ravel().astype(np.int64),
                        "by": (h - 1 - yy).ravel().astype(np.int64),
                        "value": vals.ravel()})
    return (spark.createDataFrame(pdf, "bx long, by long, value double"),
            meta)

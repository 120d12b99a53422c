"""SRP (ASRP/USRP standard raster products) source over ISO 8211.

Reference semantics (studied, re-expressed — no code copied):
frmts/adrg/srpdataset.cpp —
- the .GEN GIN record carries GEN (SCA/ZNA/PSP/ARV/BRV, LSO/PSO as
  floats — arc-seconds for ASRP, projected units for USRP — and
  LOD/LAD pixel sizes) and SPR (NFL/NFC grid, 128x128 tiles, BAD
  image file, TIF/TIM tile index, PCB run-length mode 0/4/8, PVB 8).
- geotransform: USRP (LSO, LOD, 0, PSO, 0, -LAD); ASRP divides the
  arc-second origins by 3600 (polar zones use the ARC constants with
  PSO/3600, LSO in radians/648000) (:384-440).
- tiles: PCB 0 raw 128x128 bytes (tile index counts tiles); PCB 8
  RLE of (count, value) byte pairs; PCB 4 nibble RLE — 4-bit count +
  8-bit value straddling bytes, with the dangling half byte skipped
  at each 128-pixel row boundary (:257-316); for PCB != 0 the tile
  index holds BYTE offsets.
- the sibling .QAL carries the COL color table (CCD index +
  NSR/NSG/NSB) and the QUV quality record (EDN, CDV07/DAT1 creation
  and CDV24/DAT2 revision dates, QSS classification) surfaced as the
  SRP_* metadata (:682-780); DSI gives PRT/NAM."""

from __future__ import annotations

import math
import os

import numpy as np

from .iso8211 import parse_ddf


def parse_gen(data: bytes) -> dict:
    _f, recs = parse_ddf(data)
    for r in recs:
        if r.get("001", [{}])[0].get("RTY") != "GIN":
            continue
        gen = r.get("GEN", [{}])[0]
        spr = r.get("SPR", [{}])[0]
        if not gen or not spr:
            continue
        dsi = r.get("DSI", [{}])[0]
        tif = str(spr.get("TIF", "N")).startswith("Y")
        tim = [g[k] for g in r.get("TIM", []) for k in g] if tif \
            else None
        return {"product": str(dsi.get("PRT", "")).strip(),
                "nam": str(dsi.get("NAM", "")).strip(),
                "sca": gen.get("SCA"), "zna": gen.get("ZNA"),
                "psp": gen.get("PSP"), "arv": gen.get("ARV"),
                "brv": gen.get("BRV"), "lso": float(gen.get("LSO", 0)),
                "pso": float(gen.get("PSO", 0)),
                "lod": float(gen.get("LOD", 0) or 0),
                "lad": float(gen.get("LAD", 0) or 0),
                "nfl": spr["NFL"], "nfc": spr["NFC"],
                "bad": str(spr.get("BAD", "")).strip(),
                "pcb": spr.get("PCB", 0), "pvb": spr.get("PVB", 8),
                "tim": tim}
    raise ValueError("no GIN record in SRP GEN file")


def parse_qal(data: bytes) -> dict:
    _f, recs = parse_ddf(data)
    out = {"color_table": {}, "metadata": {}}
    for r in recs:
        for g in r.get("COL", []):
            out["color_table"][int(g["CCD"])] = (
                int(g["NSR"]), int(g["NSG"]), int(g["NSB"]))
        for g in r.get("QSR", []):
            if g.get("QSS"):
                out["metadata"]["SRP_CLASSIFICATION"] = \
                    str(g["QSS"]).strip()
        for g in r.get("QUV", []):
            md = out["metadata"]
            if "EDN" in g:
                # blank EDN reads as integer 0 (GetIntSubfield)
                md["SRP_EDN"] = str(int(str(g["EDN"]).strip() or 0))
            if g.get("CDV07"):
                md["SRP_CREATIONDATE"] = str(g["CDV07"]).strip()
            elif g.get("DAT1") and len(str(g["DAT1"])) >= 12:
                md["SRP_CREATIONDATE"] = str(g["DAT1"])[4:12]
            if g.get("CDV24"):
                md["SRP_REVISIONDATE"] = str(g["CDV24"]).strip()
            elif g.get("DAT2") and len(str(g["DAT2"])) >= 12:
                md["SRP_REVISIONDATE"] = str(g["DAT2"])[4:12]
            if g.get("QSS"):
                md["SRP_CLASSIFICATION"] = str(g["QSS"]).strip()
    return out


def _geotransform(m: dict):
    if m["product"] == "USRP":
        return (m["lso"], m["lod"], 0.0, m["pso"], 0.0, -m["lad"])
    # ASRP
    if m["zna"] == 9:
        return (111319.4907933 * (90.0 - m["pso"] / 3600.0)
                * math.sin(m["lso"] * math.pi / 648000.0),
                40075016.68558 / m["arv"], 0.0,
                -111319.4907933 * (90.0 - m["pso"] / 3600.0)
                * math.cos(m["lso"] * math.pi / 648000.0),
                0.0, -40075016.68558 / m["arv"])
    if m["zna"] == 18:
        return (111319.4907933 * (90.0 + m["pso"] / 3600.0)
                * math.sin(m["lso"] * math.pi / 648000.0),
                40075016.68558 / m["arv"], 0.0,
                111319.4907933 * (90.0 + m["pso"] / 3600.0)
                * math.cos(m["lso"] * math.pi / 648000.0),
                0.0, -40075016.68558 / m["arv"])
    return (m["lso"] / 3600.0, 360.0 / m["arv"], 0.0,
            m["pso"] / 3600.0, 0.0, -360.0 / m["brv"])


def _img_data_offset(img: bytes) -> int:
    idx = img.find(b"IMG")
    if idx < 0:
        raise ValueError("no IMG marker in SRP IMG file")
    i = idx + 3 + 4
    while i < len(img) and img[i] != 0x1E:
        i += 1
    return i + 1


def _decode_tile(img: bytes, offset: int, pcb: int) -> np.ndarray:
    if pcb == 0:
        return np.frombuffer(img, np.uint8, count=128 * 128,
                             offset=offset).reshape(128, 128)
    out = np.zeros(128 * 128, np.uint8)
    data = img[offset:offset + 128 * 128 * 2]
    i = 0
    px = 0
    half = False
    while px < 128 * 128 and i + 1 < len(data):
        if pcb == 8:
            count = data[i]
            value = data[i + 1]
            i += 2
        else:  # pcb == 4: nibble counts, the reference's half-byte walk
            if (px % 128) == 0 and half:
                i += 1
                half = False
                continue
            if half:
                count = data[i] & 0xF
                value = data[i + 1]
                i += 2
                half = False
            else:
                count = data[i] >> 4
                value = ((data[i] & 0xF) << 4) + (data[i + 1] >> 4)
                i += 1
                half = True
        if px + count > 128 * 128:
            raise ValueError("corrupt SRP RLE tile")
        out[px:px + count] = value
        px += count
    return out.reshape(128, 128)


def read_srp_array(gen_path: str, img_path: str | None = None):
    """-> (values (h, w) uint8 palette indices north-up, meta with
    gt/color_table/SRP_* metadata)."""
    meta = parse_gen(open(gen_path, "rb").read())
    base = os.path.dirname(gen_path)
    if img_path is None:
        img_path = os.path.join(base, meta["bad"])
        if not os.path.exists(img_path):
            cand = [f for f in os.listdir(base)
                    if f.upper().endswith(".IMG")]
            img_path = os.path.join(base, cand[0])
    img = open(img_path, "rb").read()
    off = _img_data_offset(img)
    nfl, nfc = meta["nfl"], meta["nfc"]
    out = np.zeros((nfl * 128, nfc * 128), np.uint8)
    tim = meta["tim"]
    pcb = meta["pcb"]
    for block in range(nfl * nfc):
        if tim is not None:
            t = int(tim[block]) if block < len(tim) else 0
            if t <= 0:
                continue
            boff = off + (t - 1) * 128 * 128 if pcb == 0 \
                else off + (t - 1)
        else:
            boff = off + block * 128 * 128
        by, bx = divmod(block, nfc)
        out[by * 128:(by + 1) * 128, bx * 128:(bx + 1) * 128] = \
            _decode_tile(img, boff, pcb)
    qal_path = os.path.splitext(img_path)[0] + ".QAL"
    ct = {}
    md = {"SRP_PRODUCT": meta["product"], "SRP_NAM": meta["nam"],
          "SRP_SCA": str(meta["sca"]), "SRP_ZNA": str(meta["zna"]),
          "SRP_PSP": "%.1f" % meta["psp"]}
    if os.path.exists(qal_path):
        q = parse_qal(open(qal_path, "rb").read())
        ct = q["color_table"]
        md.update(q["metadata"])
    meta = dict(meta)
    meta["gt"] = _geotransform(meta)
    meta["color_table"] = ct
    meta["metadata"] = md
    meta["width"] = nfc * 128
    meta["height"] = nfl * 128
    return out, meta


def read_srp(spark, gen_path: str):
    import pandas as pd

    vals, meta = read_srp_array(gen_path)
    h, w = vals.shape
    yy, xx = np.mgrid[0:h, 0:w]
    pdf = pd.DataFrame({"bx": xx.ravel().astype(np.int64),
                        "by": (h - 1 - yy).ravel().astype(np.int64),
                        "value": vals.ravel().astype(np.float64)})
    return (spark.createDataFrame(pdf, "bx long, by long, value double"),
            meta)

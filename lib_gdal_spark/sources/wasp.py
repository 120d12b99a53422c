"""WAsP .map vector source/sink (elevation and roughness-change
lines).

Reference semantics (studied, re-expressed — no code copied):
ogr/ogrsf_frmts/wasp/ —
- 4 header lines (ogrwaspdatasource.cpp:310-323): the projection WKT
  (or "no spatial ref sys"), "  0.0 0.0 0.0 0.0",
  "  1.0 0.0 1.0 0.0", "  1.0 0.0".
- elevation records (ogrwasplayer.cpp:364-372):
  "%11.3f %11d" height + point count, then "%11.1f %11.1f " vertex
  pairs, three per line.
- roughness records (:545-553): "%11.3f %11.3f %11d" left/right
  roughness + count, continuation lines indented two spaces.
- the reader infers the record type from the header-line token count
  (2 = elevation, 3 = roughness)."""

from __future__ import annotations

import json

import numpy as np
import pandas as pd

from ..geo import wkb as wkbmod

FEATURE_SCHEMA = ("fid long, kind string, wkb binary, xmin double, "
                  "ymin double, xmax double, ymax double, "
                  "properties string")
_COLS = ["fid", "kind", "wkb", "xmin", "ymin", "xmax", "ymax",
         "properties"]


def write_wasp(path: str, lines, srs_wkt: str | None = None) -> str:
    """lines: iterable of dicts — {'pts': (n,2) array, 'height': h}
    (elevation) or {'pts': ..., 'z_left': l, 'z_right': r}
    (roughness)."""
    out = [srs_wkt if srs_wkt else "no spatial ref sys",
           "  0.0 0.0 0.0 0.0", "  1.0 0.0 1.0 0.0", "  1.0 0.0"]
    for ln in lines:
        pts = np.asarray(ln["pts"], np.float64)
        n = len(pts)
        if "height" in ln:
            head = "%11.3f %11d" % (float(ln["height"]), n)
            indent = ""
        else:
            head = "%11.3f %11.3f %11d" % (float(ln["z_left"]),
                                           float(ln["z_right"]), n)
            indent = "  "
        buf = [head]
        row = []
        for v in range(n):
            if v and v % 3 == 0:
                buf.append("".join(row))
                row = [indent] if indent else []
            row.append("%11.1f %11.1f " % (pts[v, 0], pts[v, 1]))
        if row:
            buf.append("".join(row))
        out.append("\n".join(buf))
    open(path, "w").write("\n".join(out) + "\n")
    return path


def parse_wasp_text(text: str):
    """-> (features, srs line). Features are dicts with pts +
    height / z_left+z_right."""
    lines = text.splitlines()
    if len(lines) < 4:
        raise ValueError("not a WAsP .map payload")
    srs = lines[0]
    nums: list[float] = []
    for line in lines[4:]:
        nums.extend(float(t) for t in line.split())
    feats = []
    i = 0
    # records self-describe: try elevation (h, n) first; if the
    # remaining stream cannot satisfy it but the roughness shape can,
    # use (zl, zr, n) — the reference decides once per FILE from the
    # first record line's token count, which we mirror
    first_rec = lines[4].split() if len(lines) > 4 else []
    rough = len(first_rec) == 3
    while i < len(nums):
        if rough:
            zl, zr, n = nums[i], nums[i + 1], int(nums[i + 2])
            i += 3
            meta = {"z_left": zl, "z_right": zr}
        else:
            h, n = nums[i], int(nums[i + 1])
            i += 2
            meta = {"height": h}
        pts = np.asarray(nums[i:i + 2 * n], np.float64).reshape(n, 2)
        i += 2 * n
        meta["pts"] = pts
        feats.append(meta)
    return feats, srs


def read_wasp(spark, path: str):
    from ..session import ship_package

    ship_package(spark)
    files = spark.read.format("binaryFile").load(path).select("content")

    def parse(batches):
        for pdf in batches:
            rows = []
            for blob in pdf["content"]:
                feats, _srs = parse_wasp_text(
                    bytes(blob).decode("latin-1"))
                for fid, f in enumerate(feats, start=1):
                    pts = f["pts"]
                    props = {k: v for k, v in f.items() if k != "pts"}
                    rows.append((
                        fid, "linestring",
                        wkbmod.encode_linestring(pts),
                        float(pts[:, 0].min()), float(pts[:, 1].min()),
                        float(pts[:, 0].max()), float(pts[:, 1].max()),
                        json.dumps(props)))
            yield pd.DataFrame(rows, columns=_COLS)

    return files.mapInPandas(parse, schema=FEATURE_SCHEMA)

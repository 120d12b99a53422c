"""VDV-452 text container and INTREST IDF vector source/sink.

Reference semantics (studied, re-expressed — no code copied):
ogr/ogrsf_frmts/vdv/ogrvdvdatasource.cpp —
- the container is `key; value; ...` lines: tbl; <name> opens a table,
  atr; lists field names, frm; their formats, rec; a record (strings
  double-quoted with "" escaping, NULL for null), end; <count> closes,
  eof; <ntables> ends the file. Formats: char[n] / string(n) text,
  num[p.0] / decimal(p) integers, decimal(p,s) doubles, boolean.
- the IDF profile (.idf) interprets tables as layers: Node ->
  POINT(X Y [Z]); Link + LinkCoordinate + Node -> per-LINK_ID
  LINESTRING from-node, coordinates ordered by COUNT, to-node
  (node ids matched by absolute value); LinkCoordinate -> points;
  any other table -> attribute-only features (ogr_idf autotest
  expectations replayed in tests/test_vdv.py).
- the writer emits the reference's exact layout (test_ogr_vdv_2's
  byte-pinned golden): the mod/src/chs/ver/ifv/dve/fft header with
  optional extras, char[80] default string width, num[10.0] /
  num[19.0] / num[w-1.0] integer formats, boolean, populated tables
  in completion order before empty ones, `end; N` / `eof; N`.

Spark face: one task per FILE, features as (layer, fid, kind, wkb,
bbox, properties JSON) — the GML/GMT/AVC house shape."""

from __future__ import annotations

import json

import numpy as np
import pandas as pd

from ..geo import wkb as wkbmod

FEATURE_SCHEMA = ("layer string, fid long, kind string, wkb binary, "
                  "xmin double, ymin double, xmax double, ymax double, "
                  "properties string")
_COLS = ["layer", "fid", "kind", "wkb", "xmin", "ymin", "xmax", "ymax",
         "properties"]


def _split_semis(line: str) -> list[str]:
    """Split on ';' outside double quotes; '""' is an escaped quote."""
    out = []
    cur = []
    in_q = False
    i = 0
    while i < len(line):
        c = line[i]
        if c == '"':
            if in_q and i + 1 < len(line) and line[i + 1] == '"':
                cur.append('"')
                i += 2
                continue
            in_q = not in_q
        elif c == ";" and not in_q:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(c)
        i += 1
    out.append("".join(cur).strip())
    return out


def _typed_value(raw: str, fmt: str):
    if raw == "NULL" or raw == "":
        return None
    f = fmt.lower()
    if f.startswith("char") or f.startswith("string"):
        return raw.strip('"') if raw.startswith('"') else raw
    if f.startswith("boolean"):
        return int(raw)
    if f.startswith("num[") or (f.startswith("decimal(")
                                and "," not in f):
        try:
            return int(raw.strip('"'))
        except ValueError:
            return float(raw.strip('"'))
    if f.startswith("decimal("):
        return float(raw.strip('"'))
    s = raw.strip('"')
    return s


def parse_vdv_text(text: str) -> dict:
    header = {}
    tables = []
    cur = None
    for line in text.splitlines():
        parts = _split_semis(line)
        key = parts[0].lower()
        if key == "tbl":
            cur = {"name": parts[1], "fields": [], "formats": [],
                   "records": []}
            tables.append(cur)
        elif key == "atr" and cur is not None:
            cur["fields"] = [p for p in parts[1:] if p]
        elif key == "frm" and cur is not None:
            cur["formats"] = [p for p in parts[1:] if p]
        elif key == "rec" and cur is not None:
            vals = parts[1:]
            rec = {}
            for k, name in enumerate(cur["fields"]):
                fmt = (cur["formats"][k]
                       if k < len(cur["formats"]) else "char[80]")
                rec[name] = _typed_value(vals[k], fmt) \
                    if k < len(vals) else None
            cur["records"].append(rec)
        elif key == "end":
            cur = None
        elif key in ("chs", "mod", "src", "ver", "ifv", "dve", "fft"):
            header[key] = parts[1:]
    return {"header": header, "tables": tables}


def idf_features(parsed: dict):
    """IDF layer model -> feature rows (ogr_idf autotest semantics)."""
    tables = {t["name"]: t for t in parsed["tables"]}
    rows = []
    nodes = {}
    node_t = tables.get("Node")
    has_z = node_t is not None and "Z" in node_t["fields"]
    if node_t:
        for fid, r in enumerate(node_t["records"], start=1):
            nodes[abs(int(r["NODE_ID"]))] = r
            x, y = float(r["X"]), float(r["Y"])
            wkb = (wkbmod.encode_point(x, y, float(r["Z"])) if has_z
                   else wkbmod.encode_point(x, y))
            props = {k: v for k, v in r.items()
                     if k not in ("X", "Y", "Z")}
            rows.append(("Node", fid, "point", wkb, x, y, x, y,
                         json.dumps(props)))

    coords = {}
    lc_t = tables.get("LinkCoordinate")
    if lc_t:
        for r in lc_t["records"]:
            coords.setdefault(abs(int(r["LINK_ID"])), []).append(r)
        for v in coords.values():
            v.sort(key=lambda r: int(r["COUNT"]))
        for fid, r in enumerate(lc_t["records"], start=1):
            x, y = float(r["X"]), float(r["Y"])
            wkb = (wkbmod.encode_point(x, y, float(r["Z"]))
                   if "Z" in r else wkbmod.encode_point(x, y))
            props = {k: v for k, v in r.items()
                     if k not in ("X", "Y", "Z")}
            rows.append(("LinkCoordinate", fid, "point", wkb,
                         x, y, x, y, json.dumps(props)))

    link_t = tables.get("Link")
    if link_t:
        for fid, r in enumerate(link_t["records"], start=1):
            fn = nodes.get(abs(int(r["FROM_NODE"])))
            tn = nodes.get(abs(int(r["TO_NODE"])))
            if fn is None or tn is None:
                continue
            pts = [(float(fn["X"]), float(fn["Y"]),
                    float(fn.get("Z", 0.0)))]
            for c in coords.get(abs(int(r["LINK_ID"])), []):
                pts.append((float(c["X"]), float(c["Y"]),
                            float(c.get("Z", 0.0))))
            pts.append((float(tn["X"]), float(tn["Y"]),
                        float(tn.get("Z", 0.0))))
            a = np.asarray(pts, np.float64)
            # encode_linestring detects the 3rd column and emits Z WKB
            wkb = wkbmod.encode_linestring(a if has_z else a[:, :2])
            props = dict(r)
            rows.append(("Link", fid, "linestring", wkb,
                         float(a[:, 0].min()), float(a[:, 1].min()),
                         float(a[:, 0].max()), float(a[:, 1].max()),
                         json.dumps(props)))

    for t in parsed["tables"]:
        if t["name"] in ("Node", "Link", "LinkCoordinate"):
            continue
        for fid, r in enumerate(t["records"], start=1):
            rows.append((t["name"], fid, None, None, None, None, None,
                         None, json.dumps(r)))
    return rows


def read_idf(spark, path: str):
    from ..session import ship_package

    ship_package(spark)
    files = spark.read.format("binaryFile").load(path).select("content")

    def parse(batches):
        for pdf in batches:
            rows = []
            for blob in pdf["content"]:
                rows.extend(idf_features(
                    parse_vdv_text(bytes(blob).decode("latin-1"))))
            yield pd.DataFrame(rows, columns=_COLS)

    return files.mapInPandas(parse, schema=FEATURE_SCHEMA)


# ------------------------------------------------------------------ writer

def _fmt_for(ftype: str, width: int | None) -> str:
    if ftype == "string":
        return f"char[{width if width else 80}]"
    if ftype == "integer":
        return f"num[{(width - 1) if width else 10}.0]"
    if ftype == "integer64":
        return "num[19.0]"
    if ftype == "boolean":
        return "boolean"
    return "char[80]"


def _rec_value(v, ftype: str) -> str:
    if v is None:
        return "NULL"
    if ftype in ("integer", "integer64", "boolean"):
        return str(int(v))
    return '"' + str(v).replace('"', '""') + '"'


def write_vdv(path: str, tables, header_extras=None,
              src_date: str = "01.01.1970",
              src_time: str = "00.00.00") -> str:
    """tables: ordered list of dicts {name, fields: [(name, type,
    width)], records: [list-of-values]}. Emits the reference writer's
    byte layout (populated tables first, then empty ones)."""
    out = ["mod; DD.MM.YYYY; HH:MM:SS; free",
           f'src; "UNKNOWN"; "{src_date}"; "{src_time}"',
           'chs; "ISO8859-1"', 'ver; "1.4"', 'ifv; "1.4"',
           'dve; "1.4"', 'fft; ""']
    for k, v in (header_extras or {}).items():
        out.append(f'{k}; "{v}"')

    def emit(t):
        out.append(f"tbl; {t['name']}")
        fields = t.get("fields", [])
        out.append("atr;" if not fields else
                   "atr; " + "; ".join(f[0] for f in fields))
        out.append("frm;" if not fields else
                   "frm; " + "; ".join(_fmt_for(f[1], f[2])
                                       for f in fields))
        for rec in t.get("records", []):
            out.append("rec; " + "; ".join(
                _rec_value(v, fields[i][1])
                for i, v in enumerate(rec)))
        out.append(f"end; {len(t.get('records', []))}")

    populated = [t for t in tables if t.get("records")]
    empty = [t for t in tables if not t.get("records")]
    for t in populated:
        emit(t)
    for t in empty:
        emit(t)
    out.append(f"eof; {len(tables)}")
    open(path, "w", encoding="latin-1").write("\n".join(out) + "\n")
    return path

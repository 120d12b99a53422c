"""GMT ASCII vector source and sink (.gmt — "OGR_GMT").

Reference semantics (studied, re-expressed — no code copied):
ogr/ogrsf_frmts/gmt/ogrgmtlayer.cpp + ogrgmtdatasource.cpp —
- header comment lines before "# FEATURE_DATA" carry @-keyed values
  (:60-110): @G geometry type (POINT/LINESTRING/POLYGON + MULTI*),
  @R region minX/maxX/minY/maxY, @N field names |-separated, @T field
  types (integer/double/datetime, default string), @Je/@Jp/@Jw CRS.
- keyed values parse with in-quote whitespace kept and backslash
  escapes honored (:311-355).
- features: '# @D<f1|f2|...>' carries the attributes; '>' opens a
  vertex group; for polygon types '# @P' / '# @H' name the following
  ring outer/hole (:452-497 ScanAheadForHole); a '>' followed by a
  '# @D' line starts the next feature (NextIsFeature, :408-420);
  coordinate lines are whitespace-separated X Y [Z].
- the writer (:812-940) emits '>' + '# @D...' per feature (no '>' for
  point layers), rings prefixed '# @P' (first) / '# @H' (holes), and
  quotes field values containing spaces/pipes/tabs with backslash
  escaping.

Spark-first like the other text vector sources: one task per FILE
(binaryFile -> Arrow-batched mapInPandas), attributes in a JSON
`properties` column, geometry as WKB."""

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

_GEOM_TYPES = {"POINT": "point", "LINESTRING": "linestring",
               "POLYGON": "polygon", "MULTIPOINT": "multipoint",
               "MULTILINESTRING": "multilinestring",
               "MULTIPOLYGON": "multipolygon"}


def _keyed_values(line: str) -> list[str]:
    """'# @Gfoo @R1/2/3/4' -> ['Gfoo', 'R1/2/3/4'] with quote/escape
    handling (ogrgmtlayer.cpp:311-355)."""
    out = []
    i = 0
    n = len(line)
    while i < n:
        if line[i] == "@" and i + 2 <= n:
            in_quotes = False
            j = i + 2
            while j < n:
                if not in_quotes and line[j].isspace():
                    break
                if in_quotes and j < n - 1 and line[j] == "\\":
                    j += 1
                elif line[j] == '"':
                    in_quotes = not in_quotes
                j += 1
            val = line[i + 2:j]
            val = val.replace('\\"', '"').replace("\\\\", "\\")
            out.append(line[i + 1] + val)
            i = j
        else:
            i += 1
    return out


def _split_fields(s: str) -> list[str]:
    """Pipe-separated with quoted segments and backslash escapes."""
    out = []
    cur = []
    in_q = False
    i = 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            cur.append(s[i + 1])
            i += 2
            continue
        if c == '"':
            in_q = not in_q
        elif c == "|" and not in_q:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(c)
        i += 1
    out.append("".join(cur))
    return out


def parse_gmt_text(text: str):
    """-> (features, meta). features = list of dicts
    (kind, data, fields list); meta = geom type, region, field
    names/types."""
    lines = text.splitlines()
    geom_type = None
    names: list[str] = []
    types: list[str] = []
    region = None
    body_start = 0
    if lines and lines[0].startswith("#"):
        for k, line in enumerate(lines):
            if not line.startswith("#"):
                body_start = k
                break
            if "FEATURE_DATA" in line:
                body_start = k + 1
                break
            for kv in _keyed_values(line):
                key, val = kv[0], kv[1:]
                if key == "G":
                    geom_type = _GEOM_TYPES.get(val.upper())
                elif key == "N":
                    names = val.split("|")
                elif key == "T":
                    types = val.split("|")
                elif key == "R":
                    parts = val.split("/")
                    if len(parts) == 4:
                        region = tuple(float(v) for v in parts)
        else:
            body_start = len(lines)

    # group the body into features: '# @D' opens a new feature; for
    # headerless / field-less point streams every coordinate line is
    # its own feature
    feats = []
    cur = None

    def flush():
        nonlocal cur
        if cur is not None and any(seg["pts"] for seg in cur["segs"]):
            feats.append(cur)
        cur = None

    def new_feature(fields):
        nonlocal cur
        flush()
        cur = {"fields": fields,
               "segs": [{"role": None, "pts": []}]}

    pending_role = None
    for line in lines[body_start:]:
        line = line.strip()
        if not line:
            continue
        if line.startswith(">"):
            if cur is not None:
                cur["segs"].append({"role": None, "pts": []})
            continue
        if line.startswith("#"):
            for kv in _keyed_values(line):
                key, val = kv[0], kv[1:]
                if key == "D":
                    new_feature(_split_fields(val))
                elif key in ("P", "H"):
                    pending_role = key
                    if cur is not None:
                        cur["segs"][-1]["role"] = key
            continue
        parts = line.split()
        if len(parts) >= 2:
            try:
                pt = [float(parts[0]), float(parts[1])]
            except ValueError:
                continue
            if cur is None or (geom_type == "point" and cur is not None
                               and not names
                               and any(s["pts"] for s in cur["segs"])):
                new_feature([])
            if pending_role and cur["segs"][-1]["role"] is None:
                cur["segs"][-1]["role"] = pending_role
            pending_role = None
            cur["segs"][-1]["pts"].append(pt)
    flush()

    out = []
    for f in feats:
        segs = [s for s in f["segs"] if s["pts"]]
        kind, data = _assemble(geom_type, segs)
        out.append({"kind": kind, "data": data, "fields": f["fields"]})
    meta = {"geom_type": geom_type, "region": region,
            "field_names": names, "field_types": types}
    return out, meta


def _assemble(geom_type, segs):
    pts0 = segs[0]["pts"] if segs else []
    gt = geom_type
    if gt is None:
        gt = "point" if len(segs) == 1 and len(pts0) == 1 else \
            "linestring"
    if gt == "point":
        return "point", (pts0[0][0], pts0[0][1])
    if gt == "multipoint":
        return "multipoint", [tuple(p) for s in segs for p in s["pts"]]
    if gt == "linestring":
        return "linestring", [tuple(p) for s in segs for p in s["pts"]]
    if gt == "multilinestring":
        return "multilinestring", [[tuple(p) for p in s["pts"]]
                                   for s in segs]
    if gt == "polygon":
        return "polygon", [[tuple(p) for p in s["pts"]] for s in segs]
    if gt == "multipolygon":
        polys = []
        for s in segs:
            ring = [tuple(p) for p in s["pts"]]
            if s["role"] == "H" and polys:
                polys[-1].append(ring)
            else:
                polys.append([ring])
        return "multipolygon", polys
    raise ValueError(f"unsupported GMT geometry type {gt!r}")


def _typed(fields, names, types):
    props = {}
    for i, name in enumerate(names):
        if i >= len(fields):
            continue
        v = fields[i]
        t = types[i] if i < len(types) else "string"
        if t == "integer":
            try:
                props[name] = int(v)
            except ValueError:
                props[name] = None
        elif t == "double":
            try:
                props[name] = float(v)
            except ValueError:
                props[name] = None
        else:
            props[name] = v
    return props


def parse_gmt_bytes(blob: bytes):
    feats, meta = parse_gmt_text(blob.decode("utf-8", "replace"))
    rows = []
    names, types = meta["field_names"], meta["field_types"]
    for fid, f in enumerate(feats):
        wkb = wkbmod.encode_geometry(f["kind"], f["data"])
        xs, ys = _all_coords(f["kind"], f["data"])
        props = (_typed(f["fields"], names, types) if names
                 else {f"Field_{i+1}": v
                       for i, v in enumerate(f["fields"])})
        rows.append((fid, f["kind"], wkb,
                     min(xs), min(ys), max(xs), max(ys),
                     json.dumps(props)))
    return rows


def _all_coords(kind, data):
    if kind == "point":
        return [data[0]], [data[1]]
    if kind in ("linestring", "multipoint"):
        a = np.asarray(data, np.float64)
        return a[:, 0].tolist(), a[:, 1].tolist()
    if kind in ("polygon", "multilinestring"):
        xs, ys = [], []
        for part in data:
            a = np.asarray(part, np.float64)
            xs.extend(a[:, 0])
            ys.extend(a[:, 1])
        return xs, ys
    xs, ys = [], []
    for poly in data:
        for ring in poly:
            a = np.asarray(ring, np.float64)
            xs.extend(a[:, 0])
            ys.extend(a[:, 1])
    return xs, ys


def read_gmt(spark, path: str):
    """GMT file(s) -> feature DataFrame; one task per file."""
    from ..session import ship_package

    ship_package(spark)
    files = spark.read.format("binaryFile").load(path).select("content")

    def parse(batches):
        for pdf in batches:
            rows = []
            for blob in pdf["content"]:
                rows.extend(parse_gmt_bytes(bytes(blob)))
            yield pd.DataFrame(rows, columns=_COLS)

    return files.mapInPandas(parse, schema=FEATURE_SCHEMA)


# ------------------------------------------------------------------ writer

def _fmt(v: float) -> str:
    s = "%.12g" % v
    return s


def _field_text(v) -> str:
    s = str(v)
    if any(c in s for c in " |\t\n"):
        return '"' + s.replace("\\", "\\\\").replace('"', '\\"') + '"'
    return s


def write_gmt(path: str, features, field_names=None,
              field_types=None) -> str:
    """features: iterable of (wkb bytes, [field values]); emits the
    reference writer's layout (header, @D lines, @P/@H ring roles)."""
    features = list(features)
    decoded = [wkbmod.decode(w) for w, _ in features]
    kinds = {k for k, _ in decoded}
    gt = None
    for name, kind in _GEOM_TYPES.items():
        if kinds == {kind}:
            gt = name
            break
    if gt is None and kinds:
        gt = "LINESTRING"
    xs, ys = [], []
    for k, d in decoded:
        x, y = _all_coords(k, d)
        xs.extend(x)
        ys.extend(y)
    out = [f"# @VGMT1.0 @G{gt}" if gt else "# @VGMT1.0"]
    if xs:
        out.append("# @R%s/%s/%s/%s" % (_fmt(min(xs)), _fmt(max(xs)),
                                        _fmt(min(ys)), _fmt(max(ys))))
    if field_names:
        out.append("# @N" + "|".join(field_names))
        out.append("# @T" + "|".join(field_types or
                                     ["string"] * len(field_names)))
    out.append("# FEATURE_DATA")
    for (wkb, fields), (kind, data) in zip(features, decoded):
        if kind != "point":
            out.append(">")
        if field_names:
            out.append("# @D" + "|".join(_field_text(v) for v in fields))
        _write_geom(out, kind, data, have_angle=True)
    text = "\n".join(out) + "\n"
    open(path, "w").write(text)
    return path


def _write_pts(out, pts):
    for p in np.asarray(pts, np.float64):
        out.append("%s %s" % (_fmt(p[0]), _fmt(p[1])))


def _write_geom(out, kind, data, have_angle):
    if kind == "point":
        out.append("%s %s" % (_fmt(data[0]), _fmt(data[1])))
    elif kind in ("linestring", "multipoint"):
        if not have_angle:
            out.append(">")
        _write_pts(out, data)
    elif kind == "multilinestring":
        for i, part in enumerate(data):
            if i > 0 or not have_angle:
                out.append(">")
            _write_pts(out, part)
            have_angle = False
    elif kind == "polygon":
        for i, ring in enumerate(data):
            if not have_angle:
                out.append(">")
            out.append("# @P" if i == 0 else "# @H")
            _write_pts(out, ring)
            have_angle = False
    elif kind == "multipolygon":
        for poly in data:
            for i, ring in enumerate(poly):
                if not have_angle:
                    out.append(">")
                out.append("# @P" if i == 0 else "# @H")
                _write_pts(out, ring)
                have_angle = False
    else:
        raise ValueError(f"unsupported GMT geometry {kind!r}")

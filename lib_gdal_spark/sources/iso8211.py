"""ISO/IEC 8211 (DDF) data-descriptive-file reader.

Reference semantics (studied, re-expressed — no code copied):
frmts/iso8211/ (ddfmodule.cpp / ddfrecord.cpp / ddffielddefn.cpp /
ddfsubfielddefn.cpp) —
- every record: 24-byte leader (record length [0:5], base address
  [12:17], entry map [20:24] giving the directory's length/position/
  tag sizes), a directory of (tag, length, position) entries ended by
  0x1E, then the field area; fields end with 0x1E, subfields with
  0x1F.
- the FIRST record (DDR) defines each field: field controls, name,
  array descriptor (subfield labels '!'-separated, leading '*' =
  repeating group) and format controls, e.g. "(b11,b14,2b24,A,B(40))":
  b1w unsigned / b2w signed little-endian ints of w bytes, A[(n)]
  text (variable to the unit terminator without (n)), I/R numeric
  text, B(bits) raw binary.
- data records repeat the format tuple until the field bytes are
  exhausted (how S-57's SG2D/FSPT/ATTF arrays work).

parse_ddf() returns the DDR field definitions plus, per data record,
{tag: [list of subfield-dict groups]}."""

from __future__ import annotations

import re
import struct

FT = 0x1E  # field terminator
UT = 0x1F  # unit terminator


def _parse_formats(fmt: str):
    """'(b11,b14,2b24,A,B(40))' -> list of (kind, size) specs."""
    fmt = fmt.strip()
    if fmt.startswith("("):
        fmt = fmt[1:]
    if fmt.endswith(")"):
        fmt = fmt[:-1]
    out = []
    for tok in re.findall(
            r"(\d*)(A|I|R|S|C|b1\d|b2\d|B)(?:\((\d+)\))?", fmt):
        rep = int(tok[0]) if tok[0] else 1
        kind = tok[1]
        width = int(tok[2]) if tok[2] else None
        for _ in range(rep):
            out.append((kind, width))
    return out


class DdfField:
    def __init__(self, tag, name, labels, repeating, formats):
        self.tag = tag
        self.name = name
        self.labels = labels
        self.repeating = repeating
        self.formats = formats


def _decode_value(kind, width, data, pos, ucs2=False):
    if kind in ("A", "I", "R", "S", "C"):
        if width is None and ucs2:
            # lexical level 2 (S-57 NALL=2): UCS-2LE text terminated
            # by the 2-byte sequence 1F 00 / 1E 00
            end = pos
            while end + 1 < len(data) and not (
                    data[end] in (UT, FT) and data[end + 1] == 0):
                end += 2
            raw = data[pos:end].decode("utf-16-le", "ignore")
            pos = min(end + 2, len(data))
            return raw, pos
        if width is None:
            end = pos
            while end < len(data) and data[end] not in (UT, FT):
                end += 1
            raw = data[pos:end].decode("latin-1")
            pos = end + 1 if end < len(data) else end
        else:
            raw = data[pos:pos + width].decode("latin-1")
            pos += width
        if kind == "I":
            raw = int(raw) if raw.strip() else 0
        elif kind == "R":
            raw = float(raw) if raw.strip() else 0.0
        return raw, pos
    if kind == "B":
        nbytes = (width or 8) // 8
        raw = data[pos:pos + nbytes]
        return raw, pos + nbytes
    if kind.startswith("b"):
        signed = kind[1] == "2"
        nbytes = int(kind[2])
        v = int.from_bytes(data[pos:pos + nbytes], "little",
                           signed=signed)
        return v, pos + nbytes
    raise ValueError(f"unsupported ISO 8211 format {kind!r}")


def _records(data: bytes):
    off = 0
    while off + 24 <= len(data):
        try:
            reclen = int(data[off:off + 5])
        except ValueError:
            return
        if reclen <= 0:
            return
        yield data[off:off + reclen]
        off += reclen


def _parse_directory(rec: bytes):
    base = int(rec[12:17])
    size_len = int(rec[20:21])
    size_pos = int(rec[21:22])
    size_tag = int(rec[23:24])
    es = size_tag + size_len + size_pos
    entries = []
    p = 24
    while p + es <= base - 1 and rec[p] != FT:
        tag = rec[p:p + size_tag].decode("latin-1")
        ln = int(rec[p + size_tag:p + size_tag + size_len])
        ps = int(rec[p + size_tag + size_len:p + es])
        entries.append((tag, ln, ps))
        p += es
    return base, entries


def parse_ddf(data: bytes, ucs2_tags=()):
    """-> (fields {tag: DdfField}, records [ {tag: [group, ...]} ]).
    ``ucs2_tags``: field tags whose variable text is UCS-2LE
    (terminated 1F 00), e.g. S-57 NATF at lexical level 2."""
    recs = _records(data)
    ddr = next(recs, None)
    if ddr is None or ddr[6:7] != b"L":
        raise ValueError("not an ISO 8211 file (missing DDR)")
    base, entries = _parse_directory(ddr)
    fields = {}
    for tag, ln, ps in entries:
        fdata = ddr[base + ps: base + ps + ln]
        parts = fdata.split(bytes([UT]))
        if len(parts) < 3 or tag.strip("0") == "":
            continue
        name = parts[0][9:].decode("latin-1")
        desc = parts[1].decode("latin-1")
        fmt = parts[2].rstrip(bytes([FT])).decode("latin-1")
        repeating = desc.startswith("*")
        labels = desc.lstrip("*").split("!") if desc else []
        fields[tag] = DdfField(tag, name, labels, repeating,
                               _parse_formats(fmt))

    out = []
    for rec in recs:
        rbase, rentries = _parse_directory(rec)
        rd = {}
        for tag, ln, ps in rentries:
            fdata = rec[rbase + ps: rbase + ps + ln]
            fdef = fields.get(tag)
            if fdef is None or not fdef.formats:
                rd.setdefault(tag, []).append(
                    {"_raw": fdata.rstrip(bytes([FT]))})
                continue
            body = fdata
            if body.endswith(bytes([FT])):
                body = body[:-1]
            groups = []
            pos = 0
            n = len(fdef.labels)
            while pos < len(body):
                group = {}
                for k, (kind, width) in enumerate(fdef.formats):
                    if pos >= len(body) and k == 0:
                        break
                    label = fdef.labels[k] if k < n else f"f{k}"
                    v, pos = _decode_value(kind, width, body, pos,
                                           ucs2=tag in ucs2_tags)
                    group[label] = v
                if not group:
                    break
                groups.append(group)
                if not fdef.repeating:
                    break
            rd.setdefault(tag, []).extend(groups)
        out.append(rd)
    return fields, out

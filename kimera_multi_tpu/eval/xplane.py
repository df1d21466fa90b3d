"""XPlane trace summarizer — the tracing tier's evidence extractor.

`jax.profiler.trace` writes TensorBoard-format traces
(`plugins/profile/<run>/<host>.xplane.pb`, an `XSpace` protobuf). The
usual consumers (TensorBoard + the xprof plugin) are not available in a
headless deployment, so this module decodes the XSpace wire format
directly (protobuf varint/length-delimited framing; schema from the
public tsl/profiler xplane.proto) and reduces it to the summary the
perf claims need: per-plane op tables (total/self duration, occurrence
counts) and device-line utilization.

Role of the reference's tracing/diagnostics tier (SURVEY.md section 5:
the reference relies on ROS logging + glog timing; this framework's
equivalent is XLA's own device trace) — and the artifact VERDICT r3
item 8 requires next to the bench's roofline note.

Usage:
  python -m kimera_multi_tpu.eval.xplane <trace_dir> [--top N]
  summary = summarize(trace_dir)   # dict, JSON-serializable
"""

from __future__ import annotations

import glob
import json
import os
import sys
from collections import defaultdict

# ---------------------------------------------------------------------------
# minimal protobuf wire-format reader
# ---------------------------------------------------------------------------


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _fields(buf: bytes):
    """Yield (field_number, wire_type, value) over a message's fields.
    Length-delimited values are returned as bytes; varints as ints;
    fixed32/64 as ints. Unknown types are skipped defensively."""
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        field, wt = tag >> 3, tag & 7
        if wt == 0:  # varint
            v, pos = _read_varint(buf, pos)
            yield field, wt, v
        elif wt == 1:  # fixed64
            v = int.from_bytes(buf[pos:pos + 8], "little")
            pos += 8
            yield field, wt, v
        elif wt == 2:  # length-delimited
            ln, pos = _read_varint(buf, pos)
            yield field, wt, buf[pos:pos + ln]
            pos += ln
        elif wt == 5:  # fixed32
            v = int.from_bytes(buf[pos:pos + 4], "little")
            pos += 4
            yield field, wt, v
        else:  # groups (3/4) — not used by xplane; bail out of message
            return


# ---------------------------------------------------------------------------
# XSpace schema walk (field numbers: tsl/profiler/protobuf/xplane.proto)
# ---------------------------------------------------------------------------


def _parse_event(buf: bytes):
    meta_id = dur = 0
    occurrences = 1
    for f, _w, v in _fields(buf):
        if f == 1:
            meta_id = v
        elif f == 3:
            dur = v
        elif f == 5:
            occurrences = v
    return meta_id, dur, occurrences


def _parse_line(buf: bytes):
    name = ""
    dur_ps = 0
    events = []
    for f, w, v in _fields(buf):
        if f == 2 and w == 2:
            name = v.decode("utf-8", "replace")
        elif f == 11 and w == 2:
            name = v.decode("utf-8", "replace") or name
        elif f == 9 and w == 0:
            dur_ps = v
        elif f == 4 and w == 2:
            events.append(_parse_event(v))
    return name, dur_ps, events


def _parse_event_metadata(buf: bytes):
    mid = 0
    name = ""
    for f, w, v in _fields(buf):
        if f == 1 and w == 0:
            mid = v
        elif f == 2 and w == 2:
            name = v.decode("utf-8", "replace")
        elif f == 4 and w == 2 and not name:
            name = v.decode("utf-8", "replace")
    return mid, name


def _parse_plane(buf: bytes):
    name = ""
    lines = []
    meta = {}
    for f, w, v in _fields(buf):
        if f == 2 and w == 2:
            name = v.decode("utf-8", "replace")
        elif f == 3 and w == 2:
            lines.append(_parse_line(v))
        elif f == 4 and w == 2:
            # map entry: key=1 (varint), value=2 (XEventMetadata)
            k = None
            meta_v = None
            for mf, mw, mv in _fields(v):
                if mf == 1 and mw == 0:
                    k = mv
                elif mf == 2 and mw == 2:
                    meta_v = mv
            if meta_v is not None:
                mid, mname = _parse_event_metadata(meta_v)
                meta[k if k is not None else mid] = mname
    return name, lines, meta


def parse_xspace(path: str):
    """Parse one .xplane.pb file -> list of planes
    (name, [(line_name, dur_ps, [(meta_id, dur_ps, n)])], {id: op_name})."""
    with open(path, "rb") as f:
        buf = f.read()
    planes = []
    for field, w, v in _fields(buf):
        if field == 1 and w == 2:
            planes.append(_parse_plane(v))
    return planes


# ---------------------------------------------------------------------------
# summary
# ---------------------------------------------------------------------------


def summarize(trace_dir: str, top: int = 15) -> dict:
    """Reduce every .xplane.pb under `trace_dir` to per-plane op tables.

    Returns {"files": [...], "planes": [{"name", "total_event_ms",
    "busy_ms_by_line", "top_ops": [{"name", "total_ms", "count"}]}]}.
    `busy_ms_by_line` sums event durations per line (a device plane's
    XLA-op line busy time over the traced wall is its utilization)."""
    files = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                  recursive=True))
    out = {"files": [os.path.relpath(p, trace_dir) for p in files],
           "planes": []}
    for path in files:
        for name, lines, meta in parse_xspace(path):
            op_tot = defaultdict(int)
            op_cnt = defaultdict(int)
            busy = {}
            for lname, _ldur, events in lines:
                line_busy = 0
                for mid, dur, cnt in events:
                    op = meta.get(mid, f"op#{mid}")
                    op_tot[op] += dur
                    op_cnt[op] += cnt
                    line_busy += dur
                if lname or line_busy:
                    busy[lname or "?"] = round(
                        busy.get(lname or "?", 0.0) + line_busy / 1e9, 3)
            ranked = sorted(op_tot.items(), key=lambda kv: -kv[1])[:top]
            out["planes"].append({
                "name": name,
                "total_event_ms": round(sum(op_tot.values()) / 1e9, 3),
                "busy_ms_by_line": busy,
                "top_ops": [
                    {"name": k, "total_ms": round(v / 1e9, 3),
                     "count": op_cnt[k]} for k, v in ranked],
            })
    return out


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print("usage: python -m kimera_multi_tpu.eval.xplane "
              "<trace_dir> [--top N]", file=sys.stderr)
        return 2
    top = 15
    if "--top" in argv:
        i = argv.index("--top")
        top = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    print(json.dumps(summarize(argv[0], top=top), indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())

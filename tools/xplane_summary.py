#!/usr/bin/env python3
"""Summarize a jax.profiler xplane.pb trace without tensorboard.

Minimal raw protobuf wire-format decoder for the XSpace schema
(tsl/profiler/protobuf/xplane.proto) — the environment has no
tensorboard_plugin_profile. Prints, for the TPU device plane's "XLA Ops"
line(s): total time by op and by inferred category.

Usage: python tools/xplane_summary.py /tmp/trace/plugins/profile/*/..xplane.pb
"""

from __future__ import annotations

import collections
import re
import sys


def _varint(buf, i):
    r = 0
    s = 0
    while True:
        b = buf[i]
        i += 1
        r |= (b & 0x7F) << s
        if not b & 0x80:
            return r, i
        s += 7


def fields(buf):
    """Yield (field_no, wire_type, value) for one serialized message."""
    i = 0
    n = len(buf)
    while i < n:
        key, i = _varint(buf, i)
        f, wt = key >> 3, key & 7
        if wt == 0:
            v, i = _varint(buf, i)
        elif wt == 1:
            v = buf[i:i + 8]
            i += 8
        elif wt == 2:
            ln, i = _varint(buf, i)
            v = buf[i:i + ln]
            i += ln
        elif wt == 5:
            v = buf[i:i + 4]
            i += 4
        else:
            raise ValueError(f"wire type {wt}")
        yield f, wt, v


def _submessages(buf, field_no):
    return [v for f, wt, v in fields(buf) if f == field_no and wt == 2]


def _scalar(buf, field_no, default=0):
    for f, wt, v in fields(buf):
        if f == field_no and wt == 0:
            return v
    return default


def _string(buf, field_no):
    for f, wt, v in fields(buf):
        if f == field_no and wt == 2:
            return v.decode("utf-8", "replace")
    return ""


def parse_plane(plane):
    name = _string(plane, 2)
    # event_metadata: map<int64, XEventMetadata> = field 4
    meta = {}
    for entry in _submessages(plane, 4):
        mid = _scalar(entry, 1)
        md = _submessages(entry, 2)
        if md:
            meta[mid] = _string(md[0], 2) or _string(md[0], 4)
    lines = []
    for line in _submessages(plane, 3):
        lname = _string(line, 2) or _string(line, 11)
        events = []
        for ev in _submessages(line, 4):
            mid = _scalar(ev, 1)
            dur = _scalar(ev, 3)
            occ = _scalar(ev, 5, 1) or 1
            events.append((meta.get(mid, f"#{mid}"), dur, occ))
        lines.append((lname, events))
    return name, lines


CATEGORIES = [
    ("convolution", re.compile(r"^%?(fusion\.)?conv|convolution|Conv")),
    ("matmul/dot", re.compile(r"dot|matmul|einsum")),
    ("reduce (BN stats &c)", re.compile(r"reduce|convert_reduce|all-reduce")),
    ("multiply/add eltwise", re.compile(r"multiply|add|subtract|fused_comp")),
    ("copy/transpose/reshape", re.compile(r"copy|transpose|reshape|bitcast")),
    ("scatter/gather", re.compile(r"scatter|gather|dynamic")),
    ("custom-call (pallas)", re.compile(r"custom-call|tpu_custom_call")),
]


def categorize(name):
    for cat, rx in CATEGORIES:
        if rx.search(name):
            return cat
    return "other"


def main(path):
    buf = open(path, "rb").read()
    for plane in _submessages(buf, 1):
        pname, lines = parse_plane(plane)
        if "TPU" not in pname and "device" not in pname.lower():
            continue
        for lname, events in lines:
            if not events:
                continue
            by_op = collections.Counter()
            n_occ = collections.Counter()
            for name, dur, occ in events:
                by_op[name] += dur
                n_occ[name] += 1
            total = sum(by_op.values())
            if total == 0:
                continue
            print(f"\n=== plane '{pname}' line '{lname}' "
                  f"total {total / 1e9:.3f} ms ===")
            by_cat = collections.Counter()
            for name, dur in by_op.items():
                by_cat[categorize(name)] += dur
            for cat, dur in by_cat.most_common():
                print(f"  {dur / total * 100:5.1f}%  {dur / 1e9:9.3f} ms  {cat}")
            print("  -- top 30 ops --")
            for name, dur in by_op.most_common(30):
                print(f"  {dur / total * 100:5.1f}%  {dur / 1e9:9.3f} ms "
                      f" x{n_occ[name]:<4d} {name[:110]}")


if __name__ == "__main__":
    for p in sys.argv[1:]:
        print(f"##### {p}")
        main(p)

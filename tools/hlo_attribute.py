#!/usr/bin/env python3
"""Join an xplane trace with the optimized HLO text: attribute per-op time
to (a) true op kind (conv / dW-conv / reduce / eltwise / pallas / ...) from
the fusion's computation body, and (b) the model component from op_name
metadata (backbone/layerN, aspp, bn, loss, optimizer ...).

Usage: python tools/hlo_attribute.py /tmp/step_optimized.hlo <xplane.pb>
"""

from __future__ import annotations

import collections
import re
import sys

import xplane_summary as xs


# opcode sits right before the operand list '(', after the result
# type+layout (which ends in '}' or ')' or ']')
_OPCODE_RX = re.compile(r"[})\]] ([a-z][a-z0-9\-]*)\(")


def parse_hlo(path):
    """name -> (kind, op_name metadata, estimated_cycles)."""
    # Map fusion name -> called computation, and computation -> body ops.
    text = open(path).read()
    comp_ops = collections.defaultdict(set)  # computation -> set of opcodes
    cur = None
    for line in text.splitlines():
        m = re.match(r"^%(\S+) \(", line)
        if m:
            cur = m.group(1)
            continue
        if cur and re.match(r"^\s+(%|ROOT)", line):
            m2 = _OPCODE_RX.search(line)
            if m2:
                comp_ops[cur].add(m2.group(1))
    info = {}
    for line in text.splitlines():
        m = re.match(r"^\s+(ROOT )?%([\w.\-]+) = ", line)
        mo = _OPCODE_RX.search(line)
        if not m or not mo:
            continue
        name, opcode = m.group(2), mo.group(1)
        calls = re.search(r"calls=%([\w.\-]+)", line)
        opname = re.search(r'op_name="([^"]+)"', line)
        cycles = re.search(r'"estimated_cycles":"(\d+)"', line)
        body = comp_ops.get(calls.group(1), set()) if calls else set()
        if opcode == "fusion":
            if "convolution" in body:
                kind = "conv-fusion"
            elif "dot" in body:
                kind = "dot-fusion"
            elif "reduce" in body:
                kind = "reduce-fusion"
            elif "scatter" in body or "gather" in body:
                kind = "scatter/gather-fusion"
            elif not body:
                kind = "fusion(body?)"
            else:
                kind = "eltwise-fusion"
        elif opcode == "custom-call":
            kind = "custom-call(pallas)"
        else:
            kind = opcode
        o = opname.group(1) if opname else ""
        info[name] = (kind, o, int(cycles.group(1)) if cycles else 0)
    return info


COMPONENT_RX = [
    ("optimizer", re.compile(r"sgd|adam|opt_state|apply_updates|while")),
    ("loss/pallas-ce", re.compile(r"softmax_ce|fused_ce|_fused|jvp__|xent|loss")),
    ("stem", re.compile(r"backbone/stem|pool")),
    ("layer1", re.compile(r"layer1")),
    ("layer2", re.compile(r"layer2")),
    ("layer3", re.compile(r"layer3")),
    ("layer4", re.compile(r"layer4")),
    ("aspp", re.compile(r"aspp")),
    ("decoder/cls", re.compile(r"decoder|classifier|lowlevel|project")),
]


def component(op_name):
    for c, rx in COMPONENT_RX:
        if rx.search(op_name):
            return c
    return "other:" + (op_name.split("/")[-1][:30] if op_name else "?")


def is_dw(op_name, kind):
    return kind == "conv-fusion" and "transpose(jvp" in op_name


def main(hlo_path, xplane_path):
    info = parse_hlo(hlo_path)
    buf = open(xplane_path, "rb").read()
    rows = []
    for plane in xs._submessages(buf, 1):
        pname, lines = xs.parse_plane(plane)
        if "TPU" not in pname:
            continue
        for lname, events in lines:
            if lname != "XLA Ops":
                continue
            agg = collections.Counter()
            for name, dur, occ in events:
                agg[name.lstrip("%").split(" ")[0]] += dur
            for name, dur in agg.items():
                base = name.split(" ")[0]
                kind, opn, cyc = info.get(base, ("?", "", 0))
                rows.append((dur, base, kind, opn, cyc))
    total = sum(r[0] for r in rows)
    print(f"total {total / 1e9:.2f} ms (all steps)")
    by_kind = collections.Counter()
    by_comp = collections.Counter()
    by_kc = collections.Counter()
    for dur, name, kind, opn, cyc in rows:
        k = kind + (" [dW]" if is_dw(opn, kind) else "")
        by_kind[k] += dur
        c = component(opn)
        by_comp[c] += dur
        by_kc[(c, k)] += dur
    print("\n-- by op kind --")
    for k, d in by_kind.most_common():
        print(f"  {d / total * 100:5.1f}%  {d / 1e9:8.2f} ms  {k}")
    print("\n-- by component --")
    for c, d in by_comp.most_common(20):
        print(f"  {d / total * 100:5.1f}%  {d / 1e9:8.2f} ms  {c}")
    print("\n-- by (component, kind) --")
    for (c, k), d in by_kc.most_common(40):
        print(f"  {d / total * 100:5.1f}%  {d / 1e9:8.2f} ms  {c:14s} {k}")
    print("\n-- top unmatched/other ops --")
    for dur, name, kind, opn, cyc in sorted(rows, reverse=True)[:25]:
        print(f"  {dur / 1e9:8.2f} ms {kind:18s} {name[:48]:48s} {opn[:70]}")


if __name__ == "__main__":
    sys.path.insert(0, "tools")
    main(sys.argv[1], sys.argv[2])

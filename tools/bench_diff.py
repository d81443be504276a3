#!/usr/bin/env python3
"""Round-over-round bench comparison with calibration normalization.

Usage: tools/bench_diff.py OLD.json NEW.json [--top N]

Accepts either the raw one-line Bench output ({"metric":"total",...}) or
the driver's BENCH_r*.json wrapper (reads its "tail"/"parsed" for the
JSON line). Prints per-query raw ratios and — when BOTH files carry the
"calibration" field (rounds ≥ 14) — machine-drift-normalized ratios
(query/calibration), which is the signal that survives ambient load
shifts (NOTES_r11..r14 burned space adjudicating 1.1-1.4x drift on
untouched queries; normalized ratios make that one division).
"""
import json
import re
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    if "queries" in d:
        return d
    # driver wrapper: find the LAST {"metric":"total",...} line in tail
    for key in ("parsed", "tail", "raw"):
        v = d.get(key)
        if isinstance(v, dict) and "queries" in v:
            return v
        if isinstance(v, str):
            hits = re.findall(r'\{"metric":"total".*?\}\}', v)
            if hits:
                return json.loads(hits[-1])
    raise SystemExit(f"{path}: no bench result found")


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    top = 0
    if "--top" in sys.argv:
        top = int(sys.argv[sys.argv.index("--top") + 1])
    old, new = load(args[0]), load(args[1])
    oq, nq = old["queries"], new["queries"]
    ocal, ncal = old.get("calibration"), new.get("calibration")
    shared = sorted(set(oq) & set(nq))
    osum = sum(oq[k] for k in shared)
    nsum = sum(nq[k] for k in shared)
    print(f"shared {len(shared)} entries: {osum:.2f}s -> {nsum:.2f}s "
          f"({nsum / osum:.2f}x raw)")
    if ocal and ncal:
        print(f"calibration: {ocal:.3f}s -> {ncal:.3f}s "
              f"({ncal / ocal:.2f}x machine drift)")
        print(f"drift-normalized total: {(nsum / ncal) / (osum / ocal):.2f}x")
    rows = []
    for k in shared:
        raw = nq[k] / oq[k] if oq[k] else float("inf")
        norm = (nq[k] / ncal) / (oq[k] / ocal) if ocal and ncal else None
        rows.append((k, oq[k], nq[k], raw, norm))
    rows.sort(key=lambda r: -(r[4] if r[4] is not None else r[3]))
    if top:
        rows = rows[:top]
    hdr = f"{'query':26s} {'old':>7s} {'new':>7s} {'raw':>6s}"
    if ocal and ncal:
        hdr += f" {'norm':>6s}"
    print(hdr)
    for k, o, n, raw, norm in rows:
        line = f"{k:26s} {o:7.3f} {n:7.3f} {raw:5.2f}x"
        if norm is not None:
            line += f" {norm:5.2f}x"
        print(line)
    only_new = sorted(set(nq) - set(oq))
    if only_new:
        print("new entries:", ", ".join(f"{k}={nq[k]:.3f}s" for k in only_new))


if __name__ == "__main__":
    main()

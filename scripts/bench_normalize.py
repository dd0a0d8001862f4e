#!/usr/bin/env python3
"""Canary-normalized round-over-round bench comparison (round-9
adjudication follow-through: raw wall-second deltas on this host carry
±25% machine drift, proven by same-binary replicates in
scale/bench_r9_adjudication.md — so cross-round comparisons divide by
the fixed-work canaries Bench emits with every line).

Usage:
  python3 scripts/bench_normalize.py A.json B.json [topN] [canaryA_st,mt]

A/B are either raw Bench output (the '{"metric":...}' line, possibly
amid sbt noise) or the driver's BENCH_r{N}.json wrapper — the wrapper
keeps only the LAST 2000 chars of the metric line ("tail"), so the
wrapper path recovers the tail-visible query subset and needs its
canary supplied out-of-band (r9's committed stamp: 0.873,3.021 from
scale/bench_r9_adjudication.md).

Prints: canary stamps + ratios, total raw vs normalized, and the topN
largest per-query normalized regressions/improvements among queries
present in both files. Normalization: q_norm = q_raw / canary_mt_ratio —
the multi-threaded Spark canary tracks the throughput a Spark query
sees; canary_st is reported for context (pure-JVM speed).
"""
import json
import re
import sys

NON_QUERY_KEYS = {"metric", "value", "unit", "sf", "canary_st", "canary_mt",
                  "block_canary_st", "block_canary_mt"}


def load(path):
    text = open(path).read()
    for line in text.splitlines():
        line = line.strip()
        if line.startswith('{"metric"'):
            return json.loads(line)
    # driver wrapper: {"n":..,"tail":"<last 2000 chars of the line>",...}
    try:
        wrap = json.loads(text)
    except json.JSONDecodeError:
        wrap = None
    if isinstance(wrap, dict) and "tail" in wrap:
        qs = {}
        for m in re.finditer(r'"(\w+)":([0-9]+\.[0-9]+)', wrap["tail"]):
            if m.group(1) not in NON_QUERY_KEYS:
                qs[m.group(1)] = float(m.group(2))
        if not qs:
            raise SystemExit(f"{path}: wrapper tail has no query timings")
        # a front-truncated first key loses its opening quote, so the
        # word-boundary regex above already excludes it
        return {"queries": qs, "partial": True}
    raise SystemExit(f"no bench line in {path}")


def main(a_path, b_path, top_n=10, canary_a=None):
    a, b = load(a_path), load(b_path)
    if canary_a:
        st, mt = (float(x) for x in canary_a.split(","))
        a["canary_st"], a["canary_mt"] = st, mt
    for name, d in ((a_path, a), (b_path, b)):
        if "canary_mt" not in d:
            raise SystemExit(f"{name} carries no canary fields — "
                             "normalization impossible (pre-round-9 file, "
                             "or pass canaryA as the 4th arg)")
    st_ratio = b["canary_st"] / a["canary_st"]
    mt_ratio = b["canary_mt"] / a["canary_mt"]
    qa = {k: v for k, v in a["queries"].items() if v >= 0}
    qb = {k: v for k, v in b["queries"].items() if v >= 0}
    common = sorted(set(qa) & set(qb))
    ta = sum(qa[k] for k in common)
    tb = sum(qb[k] for k in common)
    print(f"A: {a_path}  canary_st={a['canary_st']} canary_mt={a['canary_mt']}")
    print(f"B: {b_path}  canary_st={b['canary_st']} canary_mt={b['canary_mt']}")
    print(f"canary ratios B/A: st={st_ratio:.3f} mt={mt_ratio:.3f} "
          f"(host {'' if mt_ratio >= 1 else 'FASTER'}"
          f"{'SLOWER' if mt_ratio > 1 else ''} in B by the canary)")
    print(f"common queries: {len(common)}; raw totals A={ta:.1f}s B={tb:.1f}s "
          f"(raw ratio {tb / ta:.3f})")
    print(f"NORMALIZED total ratio (raw/mt-canary): {(tb / ta) / mt_ratio:.3f}")
    rows = []
    for k in common:
        raw = qb[k] / qa[k] if qa[k] > 0 else float("inf")
        rows.append((k, qa[k], qb[k], raw, raw / mt_ratio))
    rows.sort(key=lambda r: -r[4])
    import statistics
    med = statistics.median(r[4] for r in rows)
    print(f"median per-query normalized ratio: {med:.3f}")
    print(f"\ntop {top_n} normalized regressions (name, A_s, B_s, raw, norm):")
    for k, va, vb, raw, norm in rows[:top_n]:
        print(f"  {k:40s} {va:7.2f} {vb:7.2f} {raw:6.2f} {norm:6.2f}")
    print(f"\ntop {top_n} normalized improvements:")
    for k, va, vb, raw, norm in rows[-top_n:][::-1]:
        print(f"  {k:40s} {va:7.2f} {vb:7.2f} {raw:6.2f} {norm:6.2f}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         int(sys.argv[3]) if len(sys.argv) > 3 else 10,
         sys.argv[4] if len(sys.argv) > 4 else None)

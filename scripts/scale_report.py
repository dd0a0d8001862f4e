#!/usr/bin/env python3
"""Dev-only SF1-soak reporter (NOT part of the shipped library): diffs two
graft.tools.ScaleAudit dumps (baseline scale vs 10x scale) and prints the
markdown plan-flip inventory for SCALE.md — broadcast->SMJ flips, AQE skew
splits firing, spills appearing, superlinear runtime scaling, errors.

Usage: python3 scripts/scale_report.py <audit_base.jsonl> <audit_big.jsonl>
"""
import json
import sys


def load(path):
    rows = {}
    for line in open(path):
        line = line.strip()
        if line:
            r = json.loads(line)
            rows[r["name"]] = r
    return rows


def main(base_path, big_path):
    base, big = load(base_path), load(big_path)
    names = sorted(set(base) | set(big))
    errors, flips, skews, spills, fast = [], [], [], [], []
    ratios = []
    for n in names:
        b, g = base.get(n), big.get(n)
        if g is None or not g.get("ok"):
            errors.append((n, (g or {}).get("error", "missing")))
            continue
        if b is None or not b.get("ok"):
            errors.append((n, "baseline: " + (b or {}).get("error", "missing")))
            continue
        if b["secs"] > 0:
            ratios.append((g["secs"] / b["secs"], n, b["secs"], g["secs"]))
        jb = {k: b[k] for k in ("bhj", "smj", "shj", "bnlj", "cart")}
        jg = {k: g[k] for k in ("bhj", "smj", "shj", "bnlj", "cart")}
        if jb != jg:
            flips.append((n, jb, jg))
        if g["skew_joins"] > b["skew_joins"] or g["aqe_skew_reads"] > b["aqe_skew_reads"]:
            skews.append((n, b["skew_joins"], g["skew_joins"],
                          b["aqe_skew_reads"], g["aqe_skew_reads"]))
        if g["spill_bytes"] > 0:
            spills.append((n, b["spill_bytes"], g["spill_bytes"]))

    def fmt_joins(j):
        return ",".join(f"{k}={v}" for k, v in j.items() if v)or "none"

    print(f"Queries: base {len(base)}, big {len(big)}")
    print(f"\n## Errors at scale ({len(errors)})\n")
    for n, e in errors:
        print(f"- `{n}`: {e}")
    print(f"\n## Join-strategy flips ({len(flips)})\n")
    print("| query | joins @base | joins @10x |")
    print("|---|---|---|")
    for n, jb, jg in flips:
        print(f"| `{n}` | {fmt_joins(jb)} | {fmt_joins(jg)} |")
    print(f"\n## AQE skew activity ({len(skews)})\n")
    print("| query | skew_joins base->10x | skew_reads base->10x |")
    print("|---|---|---|")
    for n, a, b2, c, d in skews:
        print(f"| `{n}` | {a}->{b2} | {c}->{d} |")
    print(f"\n## Spills at 10x ({len(spills)})\n")
    for n, b2, g2 in spills:
        print(f"- `{n}`: {b2} -> {g2} bytes")
    ratios.sort(reverse=True)
    print("\n## Runtime scaling (10x data; top-15 ratios)\n")
    print("| query | secs @base | secs @10x | ratio |")
    print("|---|---|---|---|")
    for r, n, bs, gs in ratios[:15]:
        print(f"| `{n}` | {bs:.2f} | {gs:.2f} | {r:.1f}x |")
    import statistics
    med = statistics.median(r for r, *_ in ratios)
    tot_b = sum(bs for _, _, bs, _ in ratios)
    tot_g = sum(gs for _, _, _, gs in ratios)
    print(f"\nMedian runtime ratio: {med:.2f}x on 10x data; "
          f"total {tot_b:.0f}s -> {tot_g:.0f}s")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])

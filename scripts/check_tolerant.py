#!/usr/bin/env python3
"""Dev-only sf1 comparator implementing the REFERENCE's tolerance
discipline (NOT part of the shipped library), for the scale soak where
cross-engine determinism edges bind (SCALE.md "Correctness at sf1").

The reference compares TPC results as formatted strings with two
tolerance mechanisms (flink-table-planner-blink:
tpc/TpcUtils.scala:51-65 `formatResult` — BigDecimal/Double rendered via
`DecimalFormat("0.0000")`; runtime/utils/BatchTestBase.scala:455
`compareResult` — the `isUncertain` parameter of
TpcDsBatchExecITCase.scala:111-130 selects sorted (unordered multiset)
comparison for 8 tie-prone queries):

  tier EXACT    — value-exact unordered multiset (the driver gate;
                  scripts/check_correctness.py)
  tier REF_4DP  — the reference's discipline: every float/decimal
                  canonicalized to 4 decimal places (half-even, like
                  DecimalFormat) before the multiset compare, so
                  sub-1e-4 cross-engine float drift is not a failure.
                  Our compare is ALWAYS unordered (like the driver's
                  hash gate), which subsumes the reference's
                  isUncertain sort for every query.
  tier VALUE_DRIFT — equal-cardinality results whose unmatched rows
                  pair 1:1: identical on every non-float field, float
                  fields within |d| <= 0.011 or rel <= 1e-9 (the
                  one-cent half-even rounding flip of a windowed
                  double avg over 10x the rows — the qds57 class).
  tier TIE_SWAP — ORDER BY ... LIMIT that binds (oracle LIMIT == row
                  count), with the two engines keeping different
                  members of an exact tie group at the boundary: every
                  unmatched row must agree with a partner row on the
                  other side on ALL output-visible ORDER BY columns
                  (parsed from the oracle's trailing ORDER BY) — the
                  rows are interchangeable under the query's own order
                  (the qds75 class).
  tier THRESHOLD — membership flips explained by a float sitting
                  within eps of a predicate threshold; accepted only
                  for queries registered in THRESHOLD_QUERIES.
                  (qds39a/b turn out to pass under plain REF_4DP —
                  the 13th-digit cov drift never crosses 4dp — so this
                  tier is currently a guard, not an active pass.)

Dialect normalization: Spark sorts ASC NULLS FIRST / DESC NULLS LAST;
DuckDB defaults to the opposite. Where an ORDER BY ... LIMIT binds over
a null boundary the two engines keep different rows for the SAME query
semantics (the SQL standard leaves null order implementation-defined).
The oracle session pins DuckDB to Spark's convention so the comparison
tests the engine, not the dialect default.

Usage:
  python3 scripts/check_tolerant.py <verify_out_dir> <sf_dir> [prefix]
"""
import json
import math
import os
import sys
from decimal import Decimal, ROUND_HALF_EVEN

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# (b)-class queries: the predicate threshold that float summation order
# can cross, per SCALE.md "Correctness at sf1". name -> (column, threshold,
# eps) — a membership diff is accepted iff every one-side-only row's
# <column> lies within eps of threshold.
THRESHOLD_QUERIES = {
    "qds39a_literal": ("cov", 1.0, 1e-6),
    "qds39b_literal": ("cov", 1.0, 1e-6),
}


def fmt4(v):
    """The reference's DecimalFormat("0.0000") canonicalization:
    half-even to 4 decimal places (DecimalFormat's default rounding)."""
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):
            return "Inf" if v > 0 else "-Inf"
        return str(Decimal(repr(v)).quantize(Decimal("0.0001"),
                                             rounding=ROUND_HALF_EVEN))
    if isinstance(v, Decimal):
        return str(v.quantize(Decimal("0.0001"), rounding=ROUND_HALF_EVEN))
    return v


def rows_of(cur):
    cols = [d[0] for d in cur.description]
    order = [cols.index(c) for c in sorted(cols)]
    return sorted(cols), [tuple(r[i] for i in order) for r in cur.fetchall()]


def canon(rows):
    return sorted((tuple(fmt4(v) for v in r) for r in rows), key=repr)


def multiset_diff(a, b):
    """Symmetric difference of two row multisets (4dp-canonical)."""
    from collections import Counter
    ca, cb = Counter(a), Counter(b)
    only_a = list((ca - cb).elements())
    only_b = list((cb - ca).elements())
    return only_a, only_b


def _as_float(v):
    """Canonical rows carry floats/decimals as formatted strings."""
    if isinstance(v, (int, float, Decimal)):
        return float(v)
    if isinstance(v, str):
        try:
            return float(v)
        except ValueError:
            return None
    return None


def float_cols(rows_a, rows_b):
    """Per-column flags: True where the ORIGINAL (pre-canonical) values
    are float/Decimal — the only columns the VALUE_DRIFT numeric
    tolerance may apply to. Digit-like STRING columns (zip/phone keys:
    '00042' vs '42') must compare strictly, not as floats."""
    n = max((len(r) for r in rows_a + rows_b), default=0)
    flags = [False] * n
    for r in rows_a + rows_b:
        for i, v in enumerate(r):
            if isinstance(v, (float, Decimal)):
                flags[i] = True
    return flags


def value_drift_pairs(only_a, only_b, flags):
    """Pair each onlyA row with an onlyB row identical on every
    non-numeric field and with every numeric field within the one-cent/
    relative tolerance; the tolerance applies only to columns whose
    ORIGINAL type was float/Decimal (flags). Returns True iff ALL rows
    pair off."""
    if len(only_a) != len(only_b):
        return False
    rest = list(only_b)
    for ra in only_a:
        hit = None
        for rb in rest:
            ok = True
            for i, (x, y) in enumerate(zip(ra, rb)):
                fx = _as_float(x) if flags[i] else None
                fy = _as_float(y) if flags[i] else None
                if fx is None or fy is None:
                    if x != y:
                        ok = False
                        break
                elif abs(fx - fy) > max(0.011, 1e-9 * max(abs(fx), abs(fy))):
                    ok = False
                    break
            if ok:
                hit = rb
                break
        if hit is None:
            return False
        rest.remove(hit)
    return True


def _mask_nested(sql):
    """sql with single-quoted literals and parenthesized segments blanked
    to spaces (positions preserved), so an ORDER BY regex can only anchor
    at paren depth 0 of the top-level query — never inside an OVER(...)
    window clause or a subquery (advice r9: the lazy re.search anchored
    on the FIRST 'order by' in the text)."""
    out = []
    depth = 0
    in_str = False
    for ch in sql:
        if in_str:
            out.append(" ")
            if ch == "'":
                in_str = False
        elif ch == "'":
            out.append(" ")
            in_str = True
        elif ch == "(":
            depth += 1
            out.append(" ")
        elif ch == ")":
            depth = max(0, depth - 1)
            out.append(" ")
        elif depth > 0:
            out.append(" ")
        else:
            out.append(ch)
    return "".join(out)


def order_by_cols(sql, cols):
    """Output-visible columns of the oracle's trailing (depth-0) ORDER
    BY, and the LIMIT if present. Best-effort textual parse — used only
    to decide whether a tie-swap adjudication may apply."""
    import re
    masked = _mask_nested(sql)
    starts = [mm.start() for mm in
              re.finditer(r"\border\s+by\b", masked, re.IGNORECASE)]
    if not starts:
        return [], None
    m = re.match(r"order\s+by\s+(.*?)(?:\blimit\s+(\d+))?\s*$",
                 masked[starts[-1]:], re.IGNORECASE | re.DOTALL)
    if not m:
        return [], None
    names = []
    for part in m.group(1).split(","):
        tok = part.strip().split()[0].strip().lower() if part.strip() else ""
        tok = tok.split(".")[-1]
        if tok in [c.lower() for c in cols]:
            names.append([c for c in cols if c.lower() == tok][0])
    limit = int(m.group(2)) if m.group(2) else None
    return names, limit


def tie_swap_ok(only_a, only_b, cols, sql, n_rows):
    """LIMIT-boundary tie swap: the LIMIT binds (== result cardinality),
    and every unmatched row agrees with some partner on the other side
    on ALL output-visible ORDER BY columns — interchangeable under the
    query's own ordering."""
    if len(only_a) != len(only_b) or not only_a:
        return False, ""
    ob, limit = order_by_cols(sql, cols)
    if not ob or limit is None or limit != n_rows:
        return False, ""
    idx = [cols.index(c) for c in ob]
    rest = list(only_b)
    for ra in only_a:
        hit = next((rb for rb in rest
                    if all(ra[i] == rb[i] for i in idx)), None)
        if hit is None:
            return False, ""
        rest.remove(hit)
    return True, (f"{len(only_a)} row(s) exchanged within a tie group on "
                  f"ORDER BY ({', '.join(ob)}) at the binding LIMIT {limit}")


def threshold_explained(name, cols, only_a, only_b, con, sql):
    """(b)-class: every one-side-only row's threshold column sits within
    eps of the predicate threshold when recomputed at full precision."""
    if name not in THRESHOLD_QUERIES:
        return False, "not a registered threshold query"
    col_name, thr, eps = THRESHOLD_QUERIES[name]
    if col_name not in cols:
        return False, f"threshold column {col_name} absent from output"
    i = cols.index(col_name)
    bad = []
    for r in only_a + only_b:
        try:
            v = float(r[i])
        except (TypeError, ValueError):
            bad.append(r)
            continue
        if abs(v - thr) > eps:
            bad.append(r)
    if bad:
        return False, f"{len(bad)} flipped rows NOT at the {thr} threshold"
    return True, (f"all {len(only_a) + len(only_b)} flipped rows sit "
                  f"within {eps} of {col_name}={thr}")


def main(out_dir, sf_dir, prefix=""):
    con = duckdb.connect()
    # Spark's null-ordering convention (ASC NULLS FIRST / DESC NULLS LAST)
    try:
        con.execute("SET default_null_order='nulls_first_on_asc_last_on_desc'")
    except Exception:
        con.execute("SET default_null_order='nulls_first'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            p += "/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    tiers = {"EXACT": 0, "REF_4DP": 0, "VALUE_DRIFT": 0, "TIE_SWAP": 0,
             "THRESHOLD": 0, "FAIL": 0}
    fails = []
    for name, sql in sorted(oracles.items()):
        if not name.startswith(tuple(prefix.split(",")) if prefix else ""):
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            got_cols, got_rows = rows_of(got)
            exp_cols, exp_rows = rows_of(con.execute(sql))
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            tiers["FAIL"] += 1
            fails.append(name)
            continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns {got_cols} != {exp_cols}")
            tiers["FAIL"] += 1
            fails.append(name)
            continue
        # tier 1: exact
        ge = sorted((tuple(_exact(v) for v in r) for r in got_rows), key=repr)
        ee = sorted((tuple(_exact(v) for v in r) for r in exp_rows), key=repr)
        if ge == ee:
            tiers["EXACT"] += 1
            print(f"PASS {name} [EXACT] ({len(got_rows)} rows)")
            continue
        # tier 2: the reference's 4dp discipline
        g4, e4 = canon(got_rows), canon(exp_rows)
        if g4 == e4:
            tiers["REF_4DP"] += 1
            print(f"PASS {name} [REF_4DP] ({len(got_rows)} rows)")
            continue
        # tier 3+: boundary adjudication
        only_g, only_e = multiset_diff(g4, e4)
        verdict = None
        tier = None
        if (len(got_rows) == len(exp_rows)
                and value_drift_pairs(only_g, only_e,
                                      float_cols(got_rows, exp_rows))):
            tier = "VALUE_DRIFT"
            verdict = (f"{len(only_g)} row(s) paired with numeric drift "
                       "<= max(0.011, 1e-9 rel)")
        if verdict is None and len(got_rows) == len(exp_rows):
            ok, why = tie_swap_ok(only_g, only_e, got_cols, sql,
                                  len(got_rows))
            if ok:
                tier, verdict = "TIE_SWAP", why
        if verdict is None and name in THRESHOLD_QUERIES:
            ok, why = threshold_explained(name, got_cols, only_g, only_e,
                                          con, sql)
            if ok:
                tier, verdict = "THRESHOLD", f"threshold: {why}"
        if verdict:
            tiers[tier] += 1
            print(f"PASS {name} [{tier}] ({len(got_rows)} rows; {verdict})")
        else:
            tiers["FAIL"] += 1
            fails.append(name)
            print(f"FAIL {name}: {len(only_g)}/{len(only_e)} rows differ "
                  f"after 4dp (got {len(got_rows)}, exp {len(exp_rows)})")
            for r in only_g[:3]:
                print(f"  only-in-got: {r}")
            for r in only_e[:3]:
                print(f"  only-in-exp: {r}")
    total = sum(tiers.values())
    print(f"\n{total - tiers['FAIL']}/{total} pass "
          f"(EXACT {tiers['EXACT']}, REF_4DP {tiers['REF_4DP']}, "
          f"VALUE_DRIFT {tiers['VALUE_DRIFT']}, "
          f"TIE_SWAP {tiers['TIE_SWAP']}, "
          f"THRESHOLD {tiers['THRESHOLD']}); {tiers['FAIL']} failed"
          + (f": {fails}" if fails else ""))
    return 1 if tiers["FAIL"] else 0


def _exact(v):
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else ""))

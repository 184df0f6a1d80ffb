#!/usr/bin/env python3
"""Dev-only static audit of oracle_sql.json for cross-engine dialect risks
(SURVEY.md §2.0). Usage: python3 tools/audit_oracle.py <outDir>

Flags are HEURISTIC — triage each:
- "SUM(x) without CAST": real risk only for DOUBLE columns (float sum order
  differs); integer sums are exact in both engines, and `list_sum(
  list_transform(...))` is a sequential list fold, not an aggregate.
- "ORDER BY ... lacks NULLS spec": real risk only if the sort key can
  actually be null — COALESCE'd keys and left-side keys are safe.
- "bare *1.0": a DECIMAL literal in SQL but double in the Column API —
  use CAST(1.0 AS DOUBLE) when the impl computes double.
Audited 2026-08-12: 19 flags, all false positives (documented above).
"""
import json, re, sys

oracle = json.load(open(f"{sys.argv[1]}/oracle_sql.json"))
issues = []
for k, sql in sorted(oracle.items()):
    u = sql.upper()
    for m in re.finditer(r"\*\s*1\.0(?!\s*AS)", sql):
        if "CAST(1.0 AS DOUBLE)" not in sql[max(0, m.start()-20):m.start()+30]:
            issues.append((k, "bare *1.0 decimal literal")); break
    if re.search(r"\bAVG\s*\(", u) and "ROUND" not in u:
        issues.append((k, "AVG without ROUND"))
    if "DAYOFWEEK" in u or re.search(r"\bWEEK\s*\(", u):
        issues.append((k, "dow/week numbering trap"))
    for m in re.finditer(r"(?<![_A-Z])SUM\s*\(\s*(?!CAST)([a-z_]+)", sql, re.I):
        issues.append((k, f"SUM({m.group(1)}) without CAST"))
    if re.search(r"(LEFT JOIN|RIGHT JOIN|FULL JOIN|ROLLUP|CUBE|GROUPING SETS)", u):
        ob = u.rsplit("ORDER BY", 1)[-1]
        if "NULLS" not in ob:
            issues.append((k, "ORDER BY after null-producing op lacks NULLS spec"))
for k, why in sorted(set(issues)):
    print(f"RISK {k}: {why}")
print(f"== {len(oracle)} entries, {len(set(issues))} flags (triage per docstring)")

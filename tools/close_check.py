#!/usr/bin/env python3
"""Round-close registry receipts (r9 verdict demand #8, made permanent).

Checks, in order:
  1. Duplicate-key Counter cross-check: every q_ name in SparkEntry.scala
     appears EXACTLY twice (query entry + oracle twin). Scala Map
     literals keep the LAST duplicate key silently — this catch found
     one dead-shadowed gate in r9 and prevented three more.
  2. Registry-vs-verify set match: if a verify output dir is given, the
     parquet dumps there (plus oracle_sql.json keys) must equal the
     registry exactly — no gate silently skipped or orphaned.
  3. Bench-exclusion sanity: every name in Bench.scala's notQueries set
     must exist in the registry (a typo there silently benches a
     fixture gate).

Usage: python3 tools/close_check.py [verify_out_dir]
Exit 0 = all green; prints a receipt line per check.
"""
import json
import os
import re
import sys
from collections import Counter

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENTRY = os.path.join(REPO, "src/main/scala/graft/SparkEntry.scala")
BENCH = os.path.join(REPO, "src/main/scala/graft/Bench.scala")

fail = 0

# 1. Counter cross-check
src = open(ENTRY).read()
counts = Counter(re.findall(r'"(q_[a-z0-9_]+)"', src))
bad = {k: v for k, v in counts.items() if v != 2}
if bad:
    print(f"FAIL counter-cross-check: names not appearing exactly twice: {bad}")
    fail = 1
else:
    print(f"PASS counter-cross-check: {len(counts)} gates, each exactly "
          "twice (query + oracle)")

# 2. verify-dir set match (optional arg)
if len(sys.argv) > 1:
    vdir = sys.argv[1]
    dumped = {d.removesuffix(".parquet") for d in os.listdir(vdir)
              if d.startswith("q_")}
    osql = json.load(open(os.path.join(vdir, "oracle_sql.json")))
    reg = set(counts)
    for label, got in [("verify dumps", dumped), ("oracle_sql.json", set(osql))]:
        missing = reg - got
        extra = got - reg
        if missing or extra:
            print(f"FAIL {label} vs registry: missing={sorted(missing)[:5]} "
                  f"extra={sorted(extra)[:5]}")
            fail = 1
        else:
            print(f"PASS {label}: exact set match with the {len(reg)}-gate registry")

# 3. bench exclusions exist
bsrc = open(BENCH).read()
m = re.search(r"notQueries = Set\((.*?)\)\n", bsrc, re.S)
if not m:
    print("FAIL bench-exclusions: notQueries set not found")
    fail = 1
else:
    excl = set(re.findall(r'"(q_[a-z0-9_]+)"', m.group(1)))
    ghosts = excl - set(counts)
    if ghosts:
        print(f"FAIL bench-exclusions: not in registry: {sorted(ghosts)}")
        fail = 1
    else:
        print(f"PASS bench-exclusions: all {len(excl)} fixture gates exist "
              "in the registry")

sys.exit(fail)

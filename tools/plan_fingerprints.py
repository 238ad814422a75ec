"""Plan-fingerprint regression harness.

Hashes the NORMALIZED physical-plan shape (the formatted-explain
operator tree, minus expression/plan ids) of every catalog entry, so
a silent plan regression — a lost broadcast, a new Exchange, a window
that stopped group-limiting — shows up as a fingerprint diff even
when sf0.1 timings are too noisy to catch it.

Usage:
    python tools/plan_fingerprints.py [--prev PLANS_rN.txt] [sf_dir]

Writes to stdout: one ``name fp=<sha12> ops=<n>`` line per entry, a
diff section against ``--prev`` (parsed from its fingerprint lines),
then the full normalized trees (so a future diff is readable straight
from the committed artifacts).

Builders that iterate driver-side (pagerank, connected components)
run their iterations during plan construction; their fingerprint
covers the final result's plan, which is the part Catalyst owns.
"""

from __future__ import annotations

import argparse
import hashlib
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from topn_spark.plans import formatted_plan
from topn_spark.queries import QUERIES
from topn_spark.session import get_session

FP_LINE = re.compile(r"^(\S+) fp=([0-9a-f]{12}) ops=(\d+)$")


def normalize(plan: str) -> str:
    """The FULL formatted explain (operator tree + per-node details —
    the details carry PushedFilters / ReadSchema / build sides, so a
    lost pushdown fingerprints differently even when the tree shape
    survives), with per-compilation ids stripped: expression ids
    ``#123``, node ids ``(12)``, plan/codegen ids, and parquet scan
    paths (location strings embed the sf dir)."""
    out = []
    for line in plan.splitlines():
        if line.startswith("=="):
            continue
        s = re.sub(r"#\d+", "#id", line)
        s = re.sub(r" \(\d+\)", "", s)
        s = re.sub(r"\[plan_id=\d+\]", "", s)
        s = re.sub(r"\[codegen id : \d+\]", "", s)
        s = re.sub(r"\[id=#id\]", "", s)
        s = re.sub(r"file:[^\s,\]]+", "file:<path>", s)
        # lambda variables carry a session-global counter shared by
        # EVERY name the API mints (x_1, y_2, acc_3, …) — normalize
        # the counter on all of them, not just x_, or entries that
        # compile after a catalog addition fingerprint differently
        s = re.sub(r"lambda ([A-Za-z]+)_\d+", r"lambda \1_#", s)
        # CollapseProject's common-subexpression aliases carry the
        # same session-global counter (_common_expr_N): an entry
        # compiled after a catalog addition shifts every later
        # number — normalize it like the lambda counter (verified:
        # 22 spurious fingerprint diffs in round 10 were exactly
        # this, with byte-identical trees)
        s = re.sub(r"_common_expr_\d+", "_common_expr_#", s)
        # checkpointed RDD ids (iterative builders) are session
        # counters, and the recorded callsite depends on JVM stack
        # introspection luck (NativeMethodAccessorImpl vs <unknown>)
        s = re.sub(r"RDD\[\d+\]", "RDD", s)
        # recorded RDD callsites depend on JVM stack introspection
        # luck (NativeMethodAccessorImpl.java:0 vs <unknown>:0 —
        # inlining flips after enough JIT warmup, so an entry that
        # compiles LATER in a bigger catalog records a different
        # callsite for the same plan): strip the site, keep the op
        s = re.sub(
            r" at (localCheckpoint|applySchemaToPythonRDD) at [^,\]]+",
            r" at \1",
            s,
        )
        # Detail values are hashed as flat comma-fragment MULTISETS:
        # multi-distinct rewrites (RewriteDistinctAggregates) emit
        # Expand slots, grouping-key order, and sort/partitioning key
        # order in hash-iteration order, so the same query compiles to
        # differently-ORDERED (but equivalent) detail lines run to
        # run. Stripping brackets and sorting the fragments keeps the
        # content — a lost PushedFilter, a changed key set, a new
        # exchange still change the hash — while ignoring order churn
        # the optimizer itself does not keep stable.
        # parens split too: multi-distinct gid numbers are paired with
        # columns nondeterministically, so only fully-atomized tokens
        # (function names, columns, filters as separate atoms) form a
        # run-stable multiset
        m = re.match(r"^(\s*[A-Za-z][A-Za-z ]*(?: \[\d+\])?: )(.*)$", s)
        if m and ", " in m.group(2):
            atoms = re.sub(r"[()\[\]]", ", ", m.group(2))
            frags = sorted(t for t in (f.strip() for f in atoms.split(", ")) if t)
            s = m.group(1) + ", ".join(frags)
        out.append(s.rstrip())
    return "\n".join(out)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument("--prev", help="previous PLANS_r{N}.txt to diff against")
    args = ap.parse_args()

    prev: dict[str, str] = {}
    if args.prev:
        with open(args.prev) as f:
            for line in f:
                m = FP_LINE.match(line.strip())
                if m:
                    prev[m.group(1)] = m.group(2)

    spark = get_session(
        app_name="plan_fingerprints", shuffle_partitions=8, driver_memory="8g"
    )
    # default field-count truncation cuts long detail lists at an
    # order-dependent point, which breaks the multiset normalization
    spark.conf.set("spark.sql.debug.maxToStringFields", "10000")
    fps: dict[str, str] = {}
    trees: dict[str, str] = {}
    for name, q in sorted(QUERIES.items()):
        norm = normalize(formatted_plan(q.builder(spark, args.sf_dir)))
        # hermetic per entry: builders that persist() intermediates
        # would otherwise leak InMemoryRelations into LATER entries'
        # plans (cache substitution is by analyzed-plan match), making
        # a fingerprint depend on which queries ran before it
        spark.catalog.clearCache()
        fps[name] = hashlib.sha256(norm.encode()).hexdigest()[:12]
        # readable dump: the tree section; the hash covers the full
        # normalized plan including per-node details
        trees[name] = norm.split("\n\n", 1)[0]
        n_ops = sum(1 for ln in trees[name].splitlines() if ln.strip())
        print(f"{name} fp={fps[name]} ops={n_ops}")

    if prev:
        changed = sorted(
            n for n in fps if n in prev and prev[n] != fps[n]
        )
        added = sorted(n for n in fps if n not in prev)
        removed = sorted(n for n in prev if n not in fps)
        print(f"\n== diff vs {args.prev} ==")
        print(
            f"changed: {len(changed)}  added: {len(added)}  "
            f"removed: {len(removed)}  unchanged: "
            f"{len(fps) - len(changed) - len(added)}"
        )
        for n in changed:
            print(f"  CHANGED {n} {prev[n]} -> {fps[n]}")
        for n in added:
            print(f"  ADDED   {n}")
        for n in removed:
            print(f"  REMOVED {n}")

    print("\n== normalized trees ==")
    for name in sorted(trees):
        print(f"\n-- {name} --")
        print(trees[name])
    return 0


if __name__ == "__main__":
    sys.exit(main())

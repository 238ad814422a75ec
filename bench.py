"""Benchmark harness: runs the declared query catalog at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS].

Output layout is TAIL-SURVIVABLE (the round driver retains only the
tail of stdout; r3's single ~6 KB line lost its head and the committed
artifact had "parsed": null): one compact JSON line PER QUERY first
("detail" records), then the machine contract as the LAST line — one
short JSON line

    {"metric": "...", "value": N, "unit": "sec", "queries": {...},
     "sf": ..., "extended_total_sec": ..., "n_queries": ..., "trials": ...,
     "cpus": ..., "sf_dir": ...}

whose "queries" dict carries the survey suite (q01-q32, the queries
BASELINE.md measured) so it stays well under any plausible tail
window; x* per-query timings are the detail records directly above it.

Timings are per-query wall clock including plan + execute + collect,
single warm session (the engine's real deployment shape — BASELINE.md's
cold-JVM numbers include ~0.3-0.5 s/query of one-off planning overhead
we intentionally amortize). Each query runs $SPARK_GRAFT_TRIALS times
(default 3) and the MINIMUM is recorded: min-of-N is the standard
contention-robust estimator — any slower trial is the same code plus
machine noise, so the minimum is the closest observable to the true
cost (round-2 single-trial numbers recorded a phantom 31% "regression"
on byte-identical code; see VERDICT r2 §wrong-3).

Optional: $SPARK_GRAFT_QUERIES — comma-separated names or name
prefixes (e.g. "q" = the survey suite only) restricts which catalog
entries run; unset runs everything (the driver's default).

Drift discipline (the r10/r11 lesson — three verdicts re-litigated
1.5-3x phantom regressions that were machine noise on identical
code): each entry's min-of-N is compared against the most recent
committed BENCH_DETAIL_r{K}.jsonl beside this script (override via
$SPARK_GRAFT_PREV_DETAIL; set it empty to disable). An entry slower
than 1.5x its prior committed value is automatically RE-TIMED
(min-of-3 more trials after a cache clear); if the re-time recovers
it the detail record carries "retimed": true, and if it still
exceeds the band it carries "drift": true plus "prev_sec" — so the
committed artifact self-annotates which entries are measured slower
vs merely noisy, and no phantom survives into the next round's
comparison unexamined.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from topn_spark.queries import QUERIES
from topn_spark.session import DEFAULT_CPUS, get_session


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    spark = get_session(app_name="topn_spark_bench")

    # Warm the JVM/codegen paths once on the smallest table so q01's
    # timing measures the query, not first-task setup.
    QUERIES["q01"].builder(spark, sf_dir).collect()

    only = [
        p for p in os.environ.get("SPARK_GRAFT_QUERIES", "").split(",") if p
    ]
    trials = max(1, int(os.environ.get("SPARK_GRAFT_TRIALS", "3")))

    here = os.path.dirname(os.path.abspath(__file__))
    prev_path = os.environ.get("SPARK_GRAFT_PREV_DETAIL")
    if prev_path is None:
        committed = sorted(
            (
                p for p in os.listdir(here)
                if re.fullmatch(r"BENCH_DETAIL_r(\d+)\.jsonl", p)
            ),
            key=lambda p: int(re.findall(r"\d+", p)[0]),
        )
        prev_path = os.path.join(here, committed[-1]) if committed else ""
    prev: dict[str, float] = {}
    if prev_path and os.path.exists(prev_path):
        with open(prev_path) as fh:
            for ln in fh:
                try:
                    rec = json.loads(ln)
                    prev[rec["q"]] = float(rec["sec"])
                except (ValueError, KeyError):
                    continue

    def time_query(q, n):
        dt = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            q.builder(spark, sf_dir).collect()
            dt = min(dt, time.perf_counter() - t0)
            # Persisted intermediates are keyed by analyzed plan, so a
            # repeat trial would silently reuse the previous trial's
            # cache and time only the tail of the pipeline. Drop all
            # cached data so every trial measures identical work.
            spark.catalog.clearCache()
        return dt

    per_query: dict[str, float] = {}
    annot: dict[str, dict] = {}
    survey_total = 0.0  # q01-q32: the queries BASELINE.md measured
    extended_total = 0.0  # x*: extension ops with no baseline analogue
    for name, q in sorted(QUERIES.items()):
        if only and not any(name.startswith(p) for p in only):
            continue
        dt = time_query(q, trials)
        p = prev.get(name)
        if p is not None and dt > 1.5 * p:
            # quiet-box discipline: re-time before recording a drift
            dt = min(dt, time_query(q, 3))
            if dt > 1.5 * p:
                annot[name] = {"drift": True, "prev_sec": p}
            else:
                annot[name] = {"retimed": True}
        per_query[name] = round(dt, 4)
        if name.startswith("q"):
            survey_total += dt
        else:
            extended_total += dt

    # Detail records first (x* last so the ones nearest the summary —
    # the likeliest to survive a tail cut alongside it — are the
    # extension ops that appear nowhere else), summary line LAST.
    # The SAME detail lines also land in a file ($SPARK_GRAFT_DETAIL,
    # default BENCH_DETAIL.jsonl beside this script): the driver's
    # stdout tail window has twice truncated the per-extension detail
    # (r3: lost entirely; r4: 31 of ~130 lines kept), so the durable
    # copy is what round-over-round comparisons read.
    detail_path = os.environ.get(
        "SPARK_GRAFT_DETAIL",
        os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "BENCH_DETAIL.jsonl",
        ),
    )
    lines = [
        json.dumps(
            {"q": name, "sec": per_query[name], **annot.get(name, {})}
        )
        for name in sorted(
            per_query, key=lambda n: (n.startswith("x"), n)
        )
    ]
    try:
        with open(detail_path, "w") as fh:
            fh.write("\n".join(lines) + "\n")
    except OSError:
        pass  # read-only checkout: stdout detail is still complete
    for ln in lines:
        print(ln)
    survey_queries = {
        n: t for n, t in per_query.items() if n.startswith("q")
    }
    print(
        json.dumps(
            {
                "metric": "survey_query_suite_total",
                "value": round(survey_total, 3),
                "unit": "sec",
                "queries": survey_queries,
                "sf": sf,
                "extended_total_sec": round(extended_total, 3),
                "n_queries": len(per_query),
                "trials": trials,
                # Self-certify the scaling contract (VERDICT r14 #2):
                # echo the core count the session actually ran with
                # (master local[cpus], shuffle partitions follow it)
                # and the resolved data dir, so a $SPARK_GRAFT_CPUS=8
                # run is distinguishable from a 32-core run by the
                # summary line alone. Additions only — every existing
                # key is unchanged for round-over-round comparability.
                "cpus": DEFAULT_CPUS,
                "sf_dir": sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()

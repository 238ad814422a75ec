"""Local replica of the driver's correctness gate.

Runs every QUERIES entry on Spark and its oracle SQL on DuckDB at a
given sf dir, compares row count + column names + an order-insensitive
value hash (columns sorted by name, rows sorted, cells canonicalized).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from datetime import date, datetime
from decimal import Decimal

import duckdb

from topn_spark.catalog import TABLES
from topn_spark.queries import QUERIES
from topn_spark.session import get_session


def source_tree_digest(repo_root: str | None = None) -> str:
    """sha256 over the sorted relative paths + contents of every
    non-test source file the replay certifies (``topn_spark/**/*.py``
    plus ``__spark_entry__.py``). Stamped into the ORACLE_FULL
    header; ``tests/test_gate_artifacts.py`` recomputes it, so ANY
    operator-source edit after the committed replay — not just a new
    catalog entry — turns the suite red until the replay is re-run
    (the round-10 ``8a3afe1`` gate-ordering hole, closed)."""
    root = repo_root or os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    h = hashlib.sha256()
    paths = [os.path.join(root, "__spark_entry__.py")]
    for dirpath, dirnames, filenames in os.walk(
        os.path.join(root, "topn_spark")
    ):
        dirnames[:] = [d for d in dirnames if d != "__pycache__"]
        paths.extend(
            os.path.join(dirpath, f)
            for f in filenames
            if f.endswith(".py")
        )
    for p in sorted(os.path.relpath(p, root) for p in paths):
        h.update(p.encode())
        h.update(b"\0")
        with open(os.path.join(root, p), "rb") as f:
            h.update(f.read())
        h.update(b"\0")
    return h.hexdigest()


def canon_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, Decimal):
        return str(v)
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def canon(rows, colnames) -> str:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted(
        "|".join(canon_cell(r[i]) for i in order) for r in rows
    )
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]


def _is_num(v) -> bool:
    return isinstance(v, (int, float, Decimal)) and not isinstance(v, bool)


def check_tolerance(q, sdf, srows, con) -> list[str]:
    """Numeric-tolerance compare for non-hash-matchable entries:
    align rows on q.tol_keys (exact), require every other numeric
    cell within relative error q.tolerance of the exact oracle value
    (|a-b| <= tol * max(1, |a|, |b|)); non-numeric cells exact."""
    if callable(q.tol_oracle):
        dcols, drows = q.tol_oracle(con)
    else:
        cur = con.execute(q.tol_oracle)
        dcols = [d[0] for d in cur.description]
        drows = cur.fetchall()
    scols = sdf.columns
    if sorted(scols) != sorted(dcols):
        return [f"cols {sorted(scols)} != {sorted(dcols)}"]
    if len(srows) != len(drows):
        return [f"rowcount {len(srows)} != {len(drows)}"]
    ski = [scols.index(k) for k in q.tol_keys]
    dki = [dcols.index(k) for k in q.tol_keys]
    svi = [i for i in range(len(scols)) if i not in ski]
    dvi = [dcols.index(scols[i]) for i in svi]
    smap = {tuple(canon_cell(r[i]) for i in ski): r for r in srows}
    dmap = {tuple(canon_cell(r[i]) for i in dki): r for r in drows}
    if smap.keys() != dmap.keys():
        extra = sorted(smap.keys() - dmap.keys())[:3]
        missing = sorted(dmap.keys() - smap.keys())[:3]
        return [f"key sets differ: spark-only {extra}, oracle-only {missing}"]
    problems = []
    for key, sr in smap.items():
        dr = dmap[key]
        for i, j in zip(svi, dvi):
            a, b = sr[i], dr[j]
            if _is_num(a) and _is_num(b):
                a, b = float(a), float(b)
                if abs(a - b) > q.tolerance * max(1.0, abs(a), abs(b)):
                    problems.append(
                        f"{scols[i]}@{key}: {a} vs exact {b} "
                        f"(rel err > {q.tolerance})"
                    )
            elif canon_cell(a) != canon_cell(b):
                problems.append(f"{scols[i]}@{key}: {a!r} != {b!r}")
            if len(problems) >= 5:
                return problems
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    if not only:
        # full-replay header: certify WHICH source tree this replay
        # covers (guard test recomputes and compares)
        print(f"SOURCE_DIGEST {source_tree_digest()}")
    spark = get_session(
        app_name="oracle_check", shuffle_partitions=8, driver_memory="8g"
    )
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    if only:
        # prefix match, and FAIL on a selector that matches nothing —
        # a typo'd name must not report a vacuous ALL OK.
        unmatched = [
            p
            for p in only
            if not any(n.startswith(p) for n in QUERIES)
        ]
        if unmatched:
            print(f"FAIL — no catalog entry matches: {unmatched}")
            return 1
    n_fail = 0
    for name, q in sorted(QUERIES.items()):
        if only and not any(name.startswith(p) for p in only):
            continue
        sdf = q.builder(spark, sf_dir)
        srows = sdf.collect()
        scols = sdf.columns
        if q.oracle is None:
            if q.tol_oracle is None:
                print(f"{name}: rows-only ({len(srows)} rows) — no oracle")
                continue
            problems = check_tolerance(q, sdf, srows, con)
            if problems:
                n_fail += 1
                print(f"{name}: FAIL(tol) — {'; '.join(problems)}")
            else:
                print(
                    f"{name}: OK(tol<={q.tolerance}) ({len(srows)} rows)"
                )
            continue
        cur = con.execute(q.oracle)
        dcols = [d[0] for d in cur.description]
        drows = cur.fetchall()
        problems = []
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols {sorted(scols)} != {sorted(dcols)}")
        if len(srows) != len(drows):
            problems.append(f"rowcount {len(srows)} != {len(drows)}")
        if not problems:
            hs, hd = canon(srows, scols), canon(drows, dcols)
            if hs != hd:
                problems.append(f"hash {hs} != {hd}")
        if problems:
            n_fail += 1
            print(f"{name}: FAIL — {'; '.join(problems)}")
            for r in srows[:3]:
                print("  spark:", tuple(r))
            for r in drows[:3]:
                print("  duck :", r)
        else:
            print(f"{name}: OK ({len(srows)} rows)")
    print(f"{'ALL OK' if n_fail == 0 else f'{n_fail} FAILURES'}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())

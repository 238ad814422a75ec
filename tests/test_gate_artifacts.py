"""Gate-artifact discipline guard (the round-8/round-9 lesson).

The round's committed full-catalog replay (``ORACLE_FULL_r{N}.txt``,
written by ``python tools/check_oracle.py`` over the whole registry)
must cover EVERY ``@query`` catalog entry — an operator that lands
after the replay has no committed correctness artifact, which is the
process violation flagged in two consecutive verdicts. This test
makes the violation impossible to commit silently: add an entry, and
the suite is red until the full replay is re-run and committed.
"""

from __future__ import annotations

import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _latest_oracle_full() -> tuple[int, Path]:
    best = None
    for p in REPO.glob("ORACLE_FULL_r*.txt"):
        m = re.fullmatch(r"ORACLE_FULL_r(\d+)\.txt", p.name)
        if m and (best is None or int(m.group(1)) > best[0]):
            best = (int(m.group(1)), p)
    assert best is not None, "no ORACLE_FULL_r*.txt artifact in repo root"
    return best


def test_every_catalog_entry_has_a_gate_artifact_row():
    from topn_spark.queries import QUERIES

    rnd, path = _latest_oracle_full()
    rows = {}
    for line in path.read_text().splitlines():
        m = re.match(r"^(\w+): (OK\(tol[^)]*\)|OK|rows-only|FAIL\S*)", line)
        if m:
            rows[m.group(1)] = m.group(2)
    missing = sorted(set(QUERIES) - set(rows))
    assert not missing, (
        f"{len(missing)} catalog entr{'y' if len(missing) == 1 else 'ies'} "
        f"missing from {path.name}: {missing} — re-run the full gate "
        f"replay (python tools/check_oracle.py /root/testdata/sf0.01 "
        f"> ORACLE_FULL_r{rnd}.txt) and commit it; nothing lands after "
        f"the round's replay"
    )
    bad = sorted(k for k, v in rows.items() if v.startswith("FAIL"))
    assert not bad, f"failing gate rows in {path.name}: {bad}"


def test_committed_replay_matches_current_source_tree():
    """The round-10 gate-ordering hole, closed for CODE changes: the
    committed ORACLE_FULL carries a sha256 over the operator source
    tree it replayed (tools/check_oracle.py::source_tree_digest);
    recompute it here, so editing ANY topn_spark source file (or
    __spark_entry__.py) after the committed replay turns the suite
    red — not just adding a catalog entry. Artifacts from rounds
    before the stamp existed are exempt (no header line)."""
    import sys

    sys.path.insert(0, str(REPO / "tools"))
    from check_oracle import source_tree_digest

    rnd, path = _latest_oracle_full()
    first = path.read_text().splitlines()[0] if path.stat().st_size else ""
    m = re.match(r"^SOURCE_DIGEST ([0-9a-f]{64})$", first)
    if not m:
        return  # pre-stamp artifact (r10 and earlier)
    current = source_tree_digest(str(REPO))
    assert current == m.group(1), (
        f"operator source tree changed AFTER the committed replay "
        f"{path.name} (digest {m.group(1)[:12]}… vs current "
        f"{current[:12]}…) — re-run the full gate replay and commit "
        f"it as the LAST code-bearing change of the round"
    )


def test_coverage_header_matches_registry():
    """COVERAGE.md's header is the coverage map a reader trusts
    first, and it went stale in three separate rounds (said 275 in
    r10, 285 in r11 AND r12 while the registry grew). Pin the
    header's entry count to the live registry and its cited
    committed-replay artifact to the newest ORACLE_FULL on disk, so
    the doc cannot fork from reality a fourth time."""
    import topn_spark.queries_ext  # noqa: F401  (registration)
    from topn_spark.queries import QUERIES

    head = (REPO / "COVERAGE.md").read_text()[:2500]
    assert f"{len(QUERIES)} catalog queries" in head, (
        f"COVERAGE.md header does not say '{len(QUERIES)} catalog "
        "queries' — regenerate the header from the registry"
    )
    rnd, path = _latest_oracle_full()
    assert path.name in head, (
        f"COVERAGE.md header cites a different replay artifact than "
        f"the newest on disk ({path.name}) — update the citation "
        "when the round's replay is committed"
    )

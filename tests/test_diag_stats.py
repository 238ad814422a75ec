"""Statistical diagnostics: groupwise_linreg / categorical_entropy /
mutual_information vs closed-form NumPy/math references."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from topn_spark.diag import (
    categorical_entropy,
    groupwise_linreg,
    mutual_information,
)


@pytest.fixture(scope="module")
def xy(spark):
    rng = np.random.default_rng(7)
    rows = []
    for g, (slope, icept) in {"a": (2.5, 10.0), "b": (-1.0, 3.0)}.items():
        x = rng.uniform(0, 100, 200)
        y = slope * x + icept + rng.normal(0, 5, 200)
        rows += [(g, float(xi), float(yi)) for xi, yi in zip(x, y)]
    rows.append(("a", None, 1.0))  # NULL x: excluded pairwise
    rows.append(("b", 1.0, None))  # NULL y: excluded pairwise
    return spark.createDataFrame(rows, "g string, x double, y double")


def test_linreg_matches_numpy(spark, xy):
    got = {
        r["g"]: r
        for r in groupwise_linreg(xy, "y", "x", ["g"]).collect()
    }
    pdf = xy.toPandas().dropna()
    for g, sub in pdf.groupby("g"):
        slope, icept = np.polyfit(sub.x, sub.y, 1)
        r = np.corrcoef(sub.x, sub.y)[0, 1]
        assert got[g]["n_pairs"] == len(sub)
        assert got[g]["slope"] == pytest.approx(slope, abs=1e-5)
        assert got[g]["intercept"] == pytest.approx(icept, abs=1e-5)
        assert got[g]["r2"] == pytest.approx(r * r, abs=1e-5)


def test_linreg_global_no_keys(spark, xy):
    row = groupwise_linreg(xy, "y", "x").collect()
    assert len(row) == 1 and row[0]["n_pairs"] == 400


def test_entropy_uniform_and_constant(spark):
    rows = [("u", v) for v in "abcd" * 25] + [("k", "z")] * 17
    df = spark.createDataFrame(rows, "g string, v string")
    got = {r["g"]: r for r in categorical_entropy(df, "v", ["g"]).collect()}
    assert got["u"]["n_values"] == 4
    assert got["u"]["entropy"] == pytest.approx(math.log(4), abs=1e-6)
    assert got["u"]["norm_entropy"] == pytest.approx(1.0, abs=1e-6)
    # single-valued group: zero entropy, undefined normalization
    assert got["k"]["entropy"] == pytest.approx(0.0, abs=1e-6)
    assert got["k"]["norm_entropy"] is None


def test_entropy_skewed_value(spark):
    # H = -(0.9 ln 0.9 + 0.1 ln 0.1)
    rows = [("g", "a")] * 90 + [("g", "b")] * 10
    df = spark.createDataFrame(rows, "g string, v string")
    r = categorical_entropy(df, "v", ["g"]).collect()[0]
    want = -(0.9 * math.log(0.9) + 0.1 * math.log(0.1))
    assert r["entropy"] == pytest.approx(want, abs=1e-6)
    assert r["n"] == 100


def test_mi_independent_and_determined(spark):
    # independent: every (a, b) combination equally likely -> MI = 0
    indep = spark.createDataFrame(
        [(a, b) for a in "xy" for b in "pq" for _ in range(25)],
        "a string, b string",
    )
    r = mutual_information(indep, "a", "b").collect()[0]
    assert r["mi"] == pytest.approx(0.0, abs=1e-6)
    # determined: b is a function of a -> MI = H(a), NMI = 1
    det = spark.createDataFrame(
        [("x", "p")] * 30 + [("y", "q")] * 30 + [("z", "r")] * 40,
        "a string, b string",
    )
    r = mutual_information(det, "a", "b").collect()[0]
    h = -(0.3 * math.log(0.3) * 2 + 0.4 * math.log(0.4))
    assert r["mi"] == pytest.approx(h, abs=1e-6)
    assert r["nmi"] == pytest.approx(1.0, abs=1e-6)


def test_mi_null_category_kept(spark):
    df = spark.createDataFrame(
        [("x", None)] * 10 + [("y", "q")] * 10, "a string, b string"
    )
    r = mutual_information(df, "a", "b").collect()[0]
    # NULL is a real category: b determines a exactly
    assert r["n"] == 20
    assert r["nmi"] == pytest.approx(1.0, abs=1e-6)


def test_chi2_independence_known_tables(spark):
    from topn_spark.diag import chi2_independence

    # independent: uniform 2x2 -> chi2 = 0
    rows = [("x", 0), ("x", 1), ("y", 0), ("y", 1)] * 10
    df = spark.createDataFrame(rows, "a string, b int")
    r = chi2_independence(df, "a", "b").collect()[0]
    assert (r["n"], r["dof"], r["chi2"]) == (40, 1, 0.0)

    # perfect association: chi2 = n for a 2x2
    rows = [("x", 0)] * 15 + [("y", 1)] * 25
    r = chi2_independence(
        spark.createDataFrame(rows, "a string, b int"), "a", "b"
    ).collect()[0]
    assert (r["n"], r["dof"], r["chi2"]) == (40, 1, 40.0)

    # hand-computed 2x2: [[10, 20], [30, 40]]
    rows = (
        [("x", 0)] * 10 + [("x", 1)] * 20 + [("y", 0)] * 30 + [("y", 1)] * 40
    )
    r = chi2_independence(
        spark.createDataFrame(rows, "a string, b int"), "a", "b"
    ).collect()[0]
    # expected cells: 12, 18, 28, 42 -> chi2 = 4/12+4/18+4/28+4/42
    want = 4 / 12 + 4 / 18 + 4 / 28 + 4 / 42
    assert abs(r["chi2"] - want) < 1e-6

    # a structurally-absent cell (no ('y', 1) rows) still sums the
    # full contingency: [[5, 5], [5, 0]]
    rows = [("x", 0)] * 5 + [("x", 1)] * 5 + [("y", 0)] * 5
    r = chi2_independence(
        spark.createDataFrame(rows, "a string, b int"), "a", "b"
    ).collect()[0]
    # expected: x0=20/3, x1=10/3, y0=10/3, y1=5/3
    want = (
        (5 - 20 / 3) ** 2 / (20 / 3)
        + (5 - 10 / 3) ** 2 / (10 / 3)
        + (5 - 10 / 3) ** 2 / (10 / 3)
        + (5 / 3)
    )
    assert abs(r["chi2"] - want) < 1e-6


def test_observe_metrics_single_scan_qc(spark, tmp_path):
    from topn_spark.diag import observe_metrics

    df = spark.range(0, 1000).selectExpr(
        "id", "CASE WHEN id % 10 = 0 THEN NULL ELSE id * 2 END AS v"
    )
    observed, obs = observe_metrics(
        df,
        "qc",
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("v").isNull().cast("long")).alias("n_null_v"),
        F.max("id").alias("max_id"),
    )
    # the WRITE itself computes the metrics — no second scan
    observed.write.mode("overwrite").parquet(str(tmp_path / "out"))
    got = obs.get
    assert got == {"n_rows": 1000, "n_null_v": 100, "max_id": 999}
    # and the written data is intact
    assert spark.read.parquet(str(tmp_path / "out")).count() == 1000


def test_groupwise_auc_known_values(spark):
    from topn_spark.diag import groupwise_auc

    # perfect separation -> 1.0; inverted -> 0.0; random-ish known AUC
    rows = (
        [("sep", 1.0 + i, True) for i in range(5)]
        + [("sep", float(i) / 10, False) for i in range(5)]
        + [("inv", 1.0 + i, False) for i in range(5)]
        + [("inv", float(i) / 10, True) for i in range(5)]
    )
    df = spark.createDataFrame(rows, "g string, s double, y boolean")
    got = {
        r["g"]: r
        for r in groupwise_auc(df, F.col("y"), "s", ["g"]).collect()
    }
    assert got["sep"]["auc"] == 1.0
    assert got["inv"]["auc"] == 0.0
    assert (got["sep"]["n_pos"], got["sep"]["n_neg"]) == (5, 5)

    # hand-computed with ties: pos scores [1, 2], neg scores [1, 3]
    # pairs: (p1,n1) tie=0.5, (p1,n3) 0, (p2,n1) 1, (p2,n3) 0 -> U=1.5
    # AUC = 1.5 / 4 = 0.375
    df2 = spark.createDataFrame(
        [(1.0, True), (2.0, True), (1.0, False), (3.0, False)],
        "s double, y boolean",
    )
    r = groupwise_auc(df2, F.col("y"), "s").collect()[0]
    assert r["auc"] == 0.375

    # degenerate: single-class group -> NULL
    df3 = spark.createDataFrame([(1.0, True), (2.0, True)], "s double, y boolean")
    assert groupwise_auc(df3, F.col("y"), "s").collect()[0]["auc"] is None


def test_chi2_null_level_counts_toward_dof(spark):
    from topn_spark.diag import chi2_independence

    # {NULL,'x'} x {0,1} is a true 2x2 contingency: dof must be 1
    rows = (
        [(None, 0)] * 20 + [(None, 1)] * 5
        + [("x", 0)] * 5 + [("x", 1)] * 35
    )
    r = chi2_independence(
        spark.createDataFrame(rows, "a string, b int"), "a", "b"
    ).collect()[0]
    assert r["dof"] == 1
    assert r["n"] == 65 and r["chi2"] > 0


def test_groupwise_auc_excludes_null_scores(spark):
    from topn_spark.diag import groupwise_auc

    # NULL scores carry no rank: result equals the non-null subset
    rows = [
        (None, True), (None, True),
        (1.0, False), (2.0, True), (3.0, False),
    ]
    df = spark.createDataFrame(rows, "s double, y boolean")
    r = groupwise_auc(df, F.col("y"), "s").collect()[0]
    assert (r["n_pos"], r["n_neg"]) == (1, 2)
    assert r["auc"] == 0.5  # pos(2.0) above neg(1.0), below neg(3.0)


class TestWelchTTest:
    def test_matches_hand_model_and_guards(self, spark):
        import math

        from topn_spark.diag import welch_ttest
        from pyspark.sql import functions as F

        rows = []
        # group "g": treatment {10, 12, 14}, control {9, 9, 11, 15}
        for v in (10.0, 12.0, 14.0):
            rows.append(("g", True, v))
        for v in (9.0, 9.0, 11.0, 15.0):
            rows.append(("g", False, v))
        # group "tiny": one treatment value -> statistic undefined
        rows += [("tiny", True, 5.0), ("tiny", False, 1.0),
                 ("tiny", False, 2.0)]
        df = spark.createDataFrame(rows, "grp string, t boolean, v double")
        got = {
            r.grp: r
            for r in welch_ttest(df, "grp", F.col("t"), "v").collect()
        }

        def model(a, b):
            na, nb = len(a), len(b)
            ma = round(sum(a) / na, 6)
            mb = round(sum(b) / nb, 6)
            va = round(sum((x - sum(a) / na) ** 2 for x in a) / (na - 1), 6)
            vb = round(sum((x - sum(b) / nb) ** 2 for x in b) / (nb - 1), 6)
            se2 = va / na + vb / nb
            t = (ma - mb) / math.sqrt(se2)
            dof = (se2 * se2) / (
                (va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1)
            )
            return round(t, 6), round(dof, 6)

        t_want, dof_want = model(
            [10.0, 12.0, 14.0], [9.0, 9.0, 11.0, 15.0]
        )
        g = got["g"]
        assert (g.n_t, g.n_c) == (3, 4)
        assert abs(g.t_stat - t_want) <= 1e-9
        assert abs(g.dof - dof_want) <= 1e-9
        assert got["tiny"].t_stat is None
        assert got["tiny"].dof is None

    def test_identical_arms_zero_t(self, spark):
        from topn_spark.diag import welch_ttest
        from pyspark.sql import functions as F

        rows = [("g", i % 2 == 0, float(i % 5)) for i in range(40)]
        df = spark.createDataFrame(rows, "grp string, t boolean, v double")
        out = welch_ttest(df, "grp", F.col("t"), "v").collect()[0]
        assert out.t_stat == 0.0  # symmetric arms -> equal means


def test_join_size_estimate_deterministic_and_unbiased_shape(spark):
    from topn_spark.diag import join_size_estimate

    left = spark.createDataFrame(
        [(i % 50,) for i in range(500)], "k long"
    )  # every key has 10 left rows
    right = spark.createDataFrame([(i,) for i in range(50)], "k long")
    out = join_size_estimate(left, right, "k", "k").collect()[0]
    assert out.p == 0.25
    assert out.est_pairs == out.sampled_pairs / 0.25
    # correlated sampling: every sampled left key must also be
    # sampled on the right, so pairs = 10 * (#sampled keys)
    assert out.sampled_pairs % 10 == 0
    # deterministic under repartitioning
    again = join_size_estimate(
        left.repartition(7), right.repartition(3), "k", "k"
    ).collect()[0]
    assert (out.sampled_pairs, out.est_pairs) == (
        again.sampled_pairs,
        again.est_pairs,
    )
    # estimate is within sampling error of the true 500 pairs for
    # this uniform keyspace (md5 nibble acceptance ~ Binomial(50,.25))
    assert 200 <= out.est_pairs <= 900


def test_cohens_kappa_known_values(spark):
    from topn_spark.diag import cohens_kappa

    # classic worked example: po = 0.7, pe = 0.5 -> kappa = 0.4
    # raters agree on 35 'y' + 35 'n'; disagree on 30
    rows = (
        [("y", "y")] * 35 + [("n", "n")] * 35
        + [("y", "n")] * 15 + [("n", "y")] * 15
    )
    df = spark.createDataFrame(rows, "a string, b string")
    out = cohens_kappa(df, F.col("a"), F.col("b")).collect()[0]
    assert out.n == 100
    assert out.p_o == 0.7
    assert out.p_e == 0.5
    assert out.kappa == 0.4
    # perfect agreement -> 1; constant identical raters -> NULL
    perf = spark.createDataFrame(
        [("a", "a"), ("b", "b")], "a string, b string"
    )
    assert cohens_kappa(perf, F.col("a"), F.col("b")).collect()[0].kappa == 1.0
    const = spark.createDataFrame([("a", "a")] * 5, "a string, b string")
    assert cohens_kappa(const, F.col("a"), F.col("b")).collect()[0].kappa is None


def test_expected_calibration_error_perfect_and_known(spark):
    from topn_spark.diag import expected_calibration_error

    # perfectly calibrated: at score 25, 1 of 4 positive; at 75, 3/4
    rows = [(25, x < 1) for x in range(4)] + [
        (75, x < 3) for x in range(4)
    ]
    df = spark.createDataFrame(rows, "s long, y boolean")
    out = expected_calibration_error(df, F.col("s"), F.col("y")).collect()
    assert {r.bin for r in out} == {2, 7}
    for r in out:
        assert abs(r.ece) <= 1e-12 and r.conf == r.acc
    # score 100 lands in the LAST bin (least() clamp), not bin 10
    edge = spark.createDataFrame([(100, True)], "s long, y boolean")
    e = expected_calibration_error(edge, F.col("s"), F.col("y")).collect()
    assert [r.bin for r in e] == [9]
    # known miscalibration: all scores 90, half positive ->
    # ece = |0.5 - 0.9| = 0.4
    bad = spark.createDataFrame(
        [(90, i % 2 == 0) for i in range(10)], "s long, y boolean"
    )
    b = expected_calibration_error(bad, F.col("s"), F.col("y")).collect()[0]
    assert abs(b.ece - 0.4) <= 1e-12


def test_check_schema_contract(spark):
    from topn_spark.diag import check_schema

    df = spark.createDataFrame(
        [(1, "a", 2.0)], "id long, name string, v double"
    )
    assert check_schema(df, "id long, name string") == []
    assert check_schema(df, "id long, v double, name string") == []
    p = check_schema(df, "id int, ghost string")
    assert any("ghost" in x for x in p)
    assert any("expected int, got bigint" in x for x in p)
    p2 = check_schema(df, "id long", allow_extra=False)
    assert any("extra columns" in x for x in p2)


def test_population_stability_known_values(spark):
    import math

    from topn_spark.diag import population_stability

    # identical distributions -> psi 0
    a = spark.createDataFrame([("x",)] * 6 + [("y",)] * 4, "b string")
    out = population_stability(a, a, "b").collect()
    assert all(r.term == 0.0 and r.psi == 0.0 for r in out)
    # known shift: ref 60/40, new 40/60
    b = spark.createDataFrame([("x",)] * 4 + [("y",)] * 6, "b string")
    got = {r.b: r for r in population_stability(a, b, "b").collect()}
    want_x = round((0.4 - 0.6) * math.log(0.4 / 0.6), 6)
    assert abs(got["x"].term - want_x) <= 1e-9
    assert abs(got["x"].psi - 2 * want_x) <= 1e-9  # symmetric shift
    # one-sided bucket: finite large term via the eps floor, not inf
    c = spark.createDataFrame([("x",)] * 10, "b string")
    oneside = {r.b: r for r in population_stability(a, c, "b").collect()}
    assert oneside["y"].q == 1e-6
    assert math.isfinite(oneside["y"].term) and oneside["y"].term > 0

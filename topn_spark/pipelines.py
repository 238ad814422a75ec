"""JSON pipeline-spec compiler: the reference's USAGE mode.

Users of the reference don't call an API — they deploy a JSON pipeline
(`ETLBatchConfig`: stages + connections, reference
`TopNTest.java:94-105`) and CDAP wires source → TopN → sink around the
plugin. This module reproduces that surface on Spark: a dict spec with
``stages`` (name, type, plugin, properties) and ``connections``
(from → to) compiles to DataFrames and runs, with the reference's
two-phase lifecycle:

1. **deploy** (`compile_pipeline` ≈ ``configurePipeline``,
   TopN.java:63-72): topo-order the DAG, build each stage's lazy
   DataFrame, validate every stage's config against its INPUT schema
   with one FailureCollector per stage — macro'd (``${name}``)
   properties skip validation (TopNConfig.java:64,88,97). All stages'
   failures are reported together, not first-error-only.
2. **run** (`run_pipeline` ≈ ``prepareRun`` + execution,
   TopN.java:74-82): substitute macros, re-validate the literal
   configs, execute sinks.

Stage types mirror CDAP's: ``batchsource``, ``transform``,
``batchaggregator``, ``batchjoiner``, ``batchsink``. The plugin set
covers the pipelines the reference participates in (File source/sink,
Projection, Filter, SQL, Deduplicate, GroupByAggregate, Joiner, TopN);
registering more is one dict entry.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from topn_spark.errors import (
    FailureCollector,
    ValidationError,
    contains_macro,
    substitute_macros,
)
from topn_spark.operators.dedup import dedup_exact
from topn_spark.operators.topn import TopNConfig, topn
from topn_spark.sources.io import read, write


@dataclass
class Stage:
    name: str
    type: str
    plugin: str
    properties: dict = field(default_factory=dict)


_AGG_FUNCS: dict[str, Callable] = {
    "count": lambda c: F.count(F.lit(1) if c == "*" else F.col(c)),
    "sum": lambda c: F.sum(c),
    "min": lambda c: F.min(c),
    "max": lambda c: F.max(c),
    "avg": lambda c: F.avg(c),
    "countdistinct": lambda c: F.count_distinct(F.col(c)),
}


def _parse_aggregates(spec: str, collector: FailureCollector):
    """``alias:func(col), alias2:func2(col2)`` → list of Columns
    (CDAP GroupByAggregate's aggregates string)."""
    out = []
    for part in [p.strip() for p in spec.split(",") if p.strip()]:
        try:
            alias, call = part.split(":", 1)
            fn, _, rest = call.partition("(")
            col = rest.rstrip(")").strip()
            f = _AGG_FUNCS[fn.strip().lower()]
        except (ValueError, KeyError):
            collector.add_failure(
                f"Unparseable aggregate '{part}'.",
                "Use alias:func(col) with func in "
                f"{sorted(_AGG_FUNCS)}.",
                property_name="aggregates",
            )
            continue
        out.append(f(col).alias(alias.strip()))
    return out


def _stage_topn(spark, stage, inputs, collector, substitutions, phase):
    (df,) = inputs
    props = stage.properties
    cfg = TopNConfig(
        field=props.get("field", ""),
        size=props.get("size"),
        ignore_null=props.get("ignoreNull"),
    )
    if phase == "deploy":
        cfg.validate(df.schema, collector)
        return df  # schema passthrough (TopN.java:71)
    try:
        resolved = cfg.resolve(substitutions or {})
    except ValidationError as e:
        collector.failures.extend(e.failures)
        return df
    resolved.validate(df.schema, collector)
    if collector.failures:
        return df
    return topn(
        df, resolved.field, resolved.top_size, resolved.top_ignore_null
    )


def _stage_source(spark, stage, inputs, collector, substitutions, phase):
    p = stage.properties
    if "path" not in p and stage.plugin != "SyntheticDocs":
        collector.add_failure(
            "Source needs a 'path'.", property_name="path"
        )
        return None
    if stage.plugin == "SyntheticDocs":
        from topn_spark.sources.pydatasource import register

        register(spark)
        r = spark.read.format("synthetic_docs")
        for k in ("n", "parts", "seed"):
            if k in p:
                r = r.option(k, p[k])
        return r.load()
    path, fmt = p["path"], p.get("format", "parquet")
    # @Macro lifecycle, same as Filter/SQL/TopN: a macro'd path or
    # format cannot be read at deploy. If an explicit literal schema is
    # given, validate downstream against an empty typed frame; else
    # defer the whole downstream (schema unknown until run).
    if phase == "deploy" and (contains_macro(path) or contains_macro(fmt)):
        schema = p.get("schema")
        if schema and not contains_macro(schema):
            return spark.createDataFrame([], schema)
        return None  # downstream validation deferred to run
    if phase == "run":
        path = substitute_macros(
            path, substitutions or {}, collector, "path"
        )
        fmt = substitute_macros(
            fmt, substitutions or {}, collector, "format"
        )
        if collector.failures:
            return None
    return read(spark, path, fmt=fmt, schema=p.get("schema"))


def _stage_projection(spark, stage, inputs, collector, substitutions, phase):
    (df,) = inputs
    p = stage.properties
    if "select" in p:
        cols = [c.strip() for c in p["select"].split(",")]
        missing = [c for c in cols if c not in df.columns]
        if missing:
            collector.add_failure(
                f"Columns {missing} not in input schema.",
                property_name="select",
            )
            return df
        return df.select(*cols)
    if "drop" in p:
        return df.drop(*[c.strip() for c in p["drop"].split(",")])
    collector.add_failure(
        "Projection needs 'select' or 'drop'.", property_name="select"
    )
    return df


def _stage_filter(spark, stage, inputs, collector, substitutions, phase):
    (df,) = inputs
    cond = stage.properties.get("condition")
    if not cond:
        collector.add_failure(
            "Filter needs a 'condition'.", property_name="condition"
        )
        return df
    if phase == "deploy" and contains_macro(cond):
        return df  # deferred
    if phase == "run":
        cond = substitute_macros(
            cond, substitutions or {}, collector, "condition"
        )
    try:
        return df.where(F.expr(cond))
    except Exception as e:  # analyzer error → collected, not raised
        collector.add_failure(
            f"Invalid condition: {e}", property_name="condition"
        )
        return df


def _stage_sql(spark, stage, inputs, collector, substitutions, phase):
    (df,) = inputs
    q = stage.properties.get("query")
    if not q:
        collector.add_failure(
            "SQL stage needs a 'query'.", property_name="query"
        )
        return df
    # ${input} is the stage's own placeholder, not a config macro —
    # strip it before the macro check so deploy defers only on REAL
    # unresolved macros, exactly like the Filter stage
    if phase == "deploy" and contains_macro(q.replace("${input}", "")):
        return df
    if phase == "run":
        q = substitute_macros(
            q.replace("${input}", "\x00INPUT\x00"),
            substitutions or {}, collector, "query",
        ).replace("\x00INPUT\x00", "${input}")
    df.createOrReplaceTempView(f"_pipe_{stage.name}_input")
    try:
        return spark.sql(
            q.replace("${input}", f"_pipe_{stage.name}_input")
        )
    except Exception as e:
        collector.add_failure(
            f"Invalid query: {e}", property_name="query"
        )
        return df


def _stage_dedup(spark, stage, inputs, collector, substitutions, phase):
    (df,) = inputs
    p = stage.properties
    uniq = [
        c.strip() for c in p.get("uniqueFields", "").split(",") if c.strip()
    ]
    if not uniq:
        collector.add_failure(
            "Deduplicate needs 'uniqueFields'.",
            property_name="uniqueFields",
        )
        return df
    missing = [c for c in uniq if c not in df.columns]
    if missing:
        collector.add_failure(
            f"Columns {missing} not in input schema.",
            property_name="uniqueFields",
        )
        return df
    tiebreak = [
        c.strip() for c in p.get("tiebreak", "").split(",") if c.strip()
    ] or [c for c in df.columns if c not in uniq][:1]
    return dedup_exact(df, subset=uniq, tiebreak=tiebreak)


def _stage_groupby(spark, stage, inputs, collector, substitutions, phase):
    (df,) = inputs
    p = stage.properties
    keys = [
        c.strip()
        for c in p.get("groupByFields", "").split(",")
        if c.strip()
    ]
    aggs = _parse_aggregates(p.get("aggregates", ""), collector)
    if not aggs:
        return df
    return df.groupBy(*keys).agg(*aggs)


def _stage_joiner(spark, stage, inputs, collector, substitutions, phase):
    if len(inputs) != 2:
        collector.add_failure(
            f"Joiner needs exactly 2 inputs, got {len(inputs)}.",
        )
        return inputs[0] if inputs else None
    left, right = inputs
    p = stage.properties
    keys = p.get("joinKeys", "")
    pairs = []
    for part in keys.split(","):
        try:
            lk, rk = [k.strip() for k in part.split("=")]
        except ValueError:
            collector.add_failure(
                "joinKeys must be 'leftCol = rightCol"
                "[, leftCol2 = rightCol2 ...]'.",
                property_name="joinKeys",
            )
            return left
        if not lk or not rk:
            collector.add_failure(
                f"Empty column name in joinKeys pair '{part.strip()}'.",
                property_name="joinKeys",
            )
            return left
        pairs.append((lk, rk))
    how = p.get("joinType", "inner")
    cond = None
    for lk, rk in pairs:
        c = left[lk] == right[rk]
        cond = c if cond is None else cond & c
    out = left.join(right, cond, how)
    if p.get("dropRightKey", "true").lower() == "true":
        # drop by Column reference, not name: when lk == rk the joined
        # frame holds TWO columns named rk and a name-based drop would
        # either remove both or leave an AMBIGUOUS_REFERENCE landmine
        for _, rk in pairs:
            out = out.drop(right[rk])
    return out


def _stage_sink(spark, stage, inputs, collector, substitutions, phase):
    (df,) = inputs
    p = stage.properties
    if "path" not in p:
        collector.add_failure("Sink needs a 'path'.", property_name="path")
        return df
    if phase == "run":
        # @Macro lifecycle: resolve ${...} in path/format before the
        # write — a macro'd sink path must never create a literal
        # '${out}' directory
        path = substitute_macros(
            p["path"], substitutions or {}, collector, "path"
        )
        fmt = substitute_macros(
            p.get("format", "parquet"), substitutions or {},
            collector, "format",
        )
        if collector.failures:
            return df
        write(df, path, fmt=fmt, mode=p.get("mode", "overwrite"))
    return df


def _stage_union(spark, stage, inputs, collector, substitutions, phase):
    if len(inputs) < 2:
        collector.add_failure(
            f"Union needs >= 2 inputs, got {len(inputs)}."
        )
        return inputs[0] if inputs else None
    out = inputs[0]
    for df in inputs[1:]:
        if set(df.columns) != set(out.columns):
            collector.add_failure(
                "Union inputs must share a column set; got "
                f"{sorted(out.columns)} vs {sorted(df.columns)}."
            )
            return out
        out = out.unionByName(df)
    if stage.properties.get("distinct", "false").lower() == "true":
        out = out.distinct()
    return out


def _stage_window(spark, stage, inputs, collector, substitutions, phase):
    """CDAP-style windowed rank/row_number/lag transform: properties
    partitionFields, orderField (+ ':desc'), function
    (row_number|rank|dense_rank|lag|lead), alias, offset."""
    from pyspark.sql.window import Window as _W

    (df,) = inputs
    p = stage.properties
    parts = [
        c.strip()
        for c in p.get("partitionFields", "").split(",")
        if c.strip()
    ]
    order = p.get("orderField", "")
    if not order:
        collector.add_failure(
            "Window needs an 'orderField'.", property_name="orderField"
        )
        return df
    name, _, direction = order.partition(":")
    name = name.strip()
    if name not in df.columns:
        collector.add_failure(
            f"Column '{name}' not in input schema.",
            property_name="orderField",
        )
        return df
    oc = (
        F.col(name).desc()
        if direction.strip().lower() == "desc"
        else F.col(name).asc()
    )
    w = (_W.partitionBy(*parts) if parts else _W.partitionBy()).orderBy(oc)
    fn = p.get("function", "row_number").strip().lower()
    alias = p.get("alias", fn)
    offset = int(p.get("offset", "1"))
    exprs = {
        "row_number": lambda: F.row_number().over(w),
        "rank": lambda: F.rank().over(w),
        "dense_rank": lambda: F.dense_rank().over(w),
        "lag": lambda: F.lag(name, offset).over(w),
        "lead": lambda: F.lead(name, offset).over(w),
    }
    if fn not in exprs:
        collector.add_failure(
            f"Unknown window function '{fn}'.",
            f"One of {sorted(exprs)}.",
            property_name="function",
        )
        return df
    return df.withColumn(alias, exprs[fn]())


def _require_field(df, field, collector, prop):
    if field not in df.columns:
        collector.add_failure(
            f"Column '{field}' not in input schema.",
            property_name=prop,
        )
        return False
    return True


def _stage_html_extract(
    spark, stage, inputs, collector, substitutions, phase
):
    """HtmlExtract transform: raw markup -> (id, title, text,
    n_links) via operators/markup.py — the web-corpus front end as a
    pipeline plugin. Properties: htmlField (default 'html'), idField
    (default 'doc_id')."""
    (df,) = inputs
    p = stage.properties
    html_col = p.get("htmlField", "html")
    id_col = p.get("idField", "doc_id")
    if not (
        _require_field(df, html_col, collector, "htmlField")
        and _require_field(df, id_col, collector, "idField")
    ):
        return df
    from topn_spark.operators.markup import extract_html_text

    return extract_html_text(df, html_col=html_col, id_col=id_col)


def _stage_quality_score(
    spark, stage, inputs, collector, substitutions, phase
):
    """QualityScore transform: Gopher-style quality features + keep
    flag (textstats.add_quality). Property: textField ('text')."""
    (df,) = inputs
    text_col = stage.properties.get("textField", "text")
    if not _require_field(df, text_col, collector, "textField"):
        return df
    from topn_spark.operators.textstats import add_quality

    return add_quality(df, text_col)


def _stage_script_profile(
    spark, stage, inputs, collector, substitutions, phase
):
    """ScriptProfile transform: per-doc Unicode script counts +
    dominant script (textstats.script_profile). Property: textField."""
    (df,) = inputs
    text_col = stage.properties.get("textField", "text")
    if not _require_field(df, text_col, collector, "textField"):
        return df
    from topn_spark.operators.textstats import script_profile

    return script_profile(df, text_col)


def _stage_normalize_unicode(
    spark, stage, inputs, collector, substitutions, phase
):
    """NormalizeUnicode transform (textstats.normalize_unicode).
    Properties: textField ('text'), form ('NFC')."""
    (df,) = inputs
    p = stage.properties
    text_col = p.get("textField", "text")
    form = p.get("form", "NFC")
    # validate every property independently so one bad upstream stage
    # doesn't mask this stage's own config errors in the batch report
    ok = _require_field(df, text_col, collector, "textField")
    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        collector.add_failure(
            f"Unknown normalization form '{form}'.",
            "One of NFC, NFD, NFKC, NFKD.",
            property_name="form",
        )
        ok = False
    if not ok:
        return df
    from topn_spark.operators.textstats import normalize_unicode

    return normalize_unicode(df, text_col, form=form)


def _stage_gopher_rules(
    spark, stage, inputs, collector, substitutions, phase
):
    """GopherRules transform: the full published Gopher rule suite
    (textstats.gopher_rules) — per-rule signal columns + gopher_keep.
    Properties: textField ('text'), keepOnly ('false' — when 'true',
    filter to gopher_keep rows and drop the signal columns)."""
    (df,) = inputs
    p = stage.properties
    text_col = p.get("textField", "text")
    keep_only = p.get("keepOnly", "false")
    ok = _require_field(df, text_col, collector, "textField")
    if keep_only not in ("true", "false"):
        collector.add_failure(
            f"Invalid keepOnly '{keep_only}'.",
            "One of true, false.",
            property_name="keepOnly",
        )
        ok = False
    if not ok:
        return df
    from topn_spark.operators.textstats import gopher_rules

    out = gopher_rules(df, text_col)
    if keep_only == "true":
        return out.where(F.col("gopher_keep")).select(*df.columns)
    return out


def _stage_c4_line_filter(
    spark, stage, inputs, collector, substitutions, phase
):
    """C4LineFilter transform: C4-style line cleaning + page gate
    (textstats.c4_line_filter). Properties: textField ('text'),
    keepOnly ('false' — when 'true', keep only c4_keep pages and
    replace the text column with the cleaned text), minWords ('3')
    and minSentences ('5') — the Raffel et al. §2.2 constants, as
    properties for deliberate deviation."""
    (df,) = inputs
    p = stage.properties
    text_col = p.get("textField", "text")
    keep_only = p.get("keepOnly", "false")
    ok = _require_field(df, text_col, collector, "textField")
    if keep_only not in ("true", "false"):
        collector.add_failure(
            f"Invalid keepOnly '{keep_only}'.",
            "One of true, false.",
            property_name="keepOnly",
        )
        ok = False
    thresholds = {"minWords": 3, "minSentences": 5}
    for prop, default in list(thresholds.items()):
        raw = p.get(prop, str(default))
        try:
            thresholds[prop] = int(raw)
            if thresholds[prop] < 0:
                raise ValueError
        except ValueError:
            collector.add_failure(
                f"Invalid {prop} '{raw}'.",
                "A non-negative integer.",
                property_name=prop,
            )
            ok = False
    if not ok:
        return df
    from topn_spark.operators.textstats import c4_line_filter

    out = c4_line_filter(
        df,
        text_col,
        min_words=thresholds["minWords"],
        min_sentences=thresholds["minSentences"],
    )
    if keep_only == "true":
        return (
            out.where(F.col("c4_keep"))
            .withColumn(text_col, F.col("clean_text"))
            .select(*df.columns)
        )
    return out


def _stage_gopher_repetition(
    spark, stage, inputs, collector, substitutions, phase
):
    """GopherRepetition transform: the Table A1 repetition-rule suite
    (textstats.gopher_repetition). Properties: textField ('text'),
    keepOnly ('false' — when 'true', filter to gopher_rep_keep rows
    and drop the signal columns)."""
    (df,) = inputs
    p = stage.properties
    text_col = p.get("textField", "text")
    keep_only = p.get("keepOnly", "false")
    ok = _require_field(df, text_col, collector, "textField")
    if keep_only not in ("true", "false"):
        collector.add_failure(
            f"Invalid keepOnly '{keep_only}'.",
            "One of true, false.",
            property_name="keepOnly",
        )
        ok = False
    if not ok:
        return df
    from topn_spark.operators.textstats import gopher_repetition

    out = gopher_repetition(df, text_col)
    if keep_only == "true":
        return out.where(F.col("gopher_rep_keep")).select(*df.columns)
    return out


def _stage_perplexity_filter(
    spark, stage, inputs, collector, substitutions, phase
):
    """PerplexityFilter transform: score every record under a SAVED
    bigram LM artifact (lm.py::load_bigram_lm — train once, score
    any stream) and annotate with (n_bigrams, logprob, ppl).
    Properties: modelPath (required), textField ('text'), idField
    ('doc_id'), smoothing ('wb'), k ('1.0'), maxPpl (optional — when
    set, keep only records with ppl <= maxPpl and drop the score
    columns, the CCNet head-cut deployment shape; records with < 2
    tokens have no model opinion and are dropped by the filter)."""
    (df,) = inputs
    p = stage.properties
    model_path = p.get("modelPath")
    text_col = p.get("textField", "text")
    id_col = p.get("idField", "doc_id")
    smoothing = p.get("smoothing", "wb")
    k_raw = p.get("k", "1.0")
    maxppl_raw = p.get("maxPpl")
    if phase == "run":
        # macro lifecycle parity: substitute, then re-validate the
        # literal values below (macro'd props skipped deploy checks)
        subs = substitutions or {}
        model_path = substitute_macros(
            model_path, subs, collector, "modelPath"
        )
        smoothing = substitute_macros(
            smoothing, subs, collector, "smoothing"
        )
        k_raw = substitute_macros(k_raw, subs, collector, "k")
        maxppl_raw = substitute_macros(
            maxppl_raw, subs, collector, "maxPpl"
        )
    ok = _require_field(df, text_col, collector, "textField")
    ok = _require_field(df, id_col, collector, "idField") and ok
    if not model_path:
        collector.add_failure(
            "Required property 'modelPath' is missing.",
            "Point it at a save_bigram_lm artifact.",
            property_name="modelPath",
        )
        ok = False
    if not contains_macro(smoothing) and smoothing not in (
        "addk",
        "wb",
    ):
        collector.add_failure(
            f"Unknown smoothing '{smoothing}'.",
            "One of addk, wb.",
            property_name="smoothing",
        )
        ok = False
    k, max_ppl = 1.0, None
    if not contains_macro(k_raw):
        try:
            k = float(k_raw)
        except ValueError:
            collector.add_failure(
                f"Invalid k '{k_raw}'.",
                "A float.",
                property_name="k",
            )
            ok = False
    if maxppl_raw is not None and not contains_macro(maxppl_raw):
        try:
            max_ppl = float(maxppl_raw)
        except ValueError:
            collector.add_failure(
                f"Invalid maxPpl '{maxppl_raw}'.",
                "A float.",
                property_name="maxPpl",
            )
            ok = False
    if not ok:
        return df
    if phase == "deploy" and (
        contains_macro(model_path) or contains_macro(maxppl_raw)
    ):
        # schema-faithful placeholder: scoring needs the (deferred)
        # model; with a maxPpl cut the output schema == input schema,
        # else the three score columns append
        if maxppl_raw is not None:
            return df
        return (
            df.withColumn("n_bigrams", F.lit(None).cast("bigint"))
            .withColumn("logprob", F.lit(None).cast("double"))
            .withColumn("ppl", F.lit(None).cast("double"))
        )
    from topn_spark.operators.lm import (
        load_bigram_lm,
        perplexity_score,
    )

    unigrams, bigrams, meta = load_bigram_lm(spark, model_path)
    scored = perplexity_score(
        df,
        unigrams,
        bigrams,
        vocab_size=meta["vocab_size"],
        k=k,
        id_col=id_col,
        text_col=text_col,
        mode=meta["token_mode"],
        smoothing=smoothing,
    )
    out = df.join(scored, id_col)
    if max_ppl is not None:
        return out.where(F.col("ppl") <= max_ppl).select(*df.columns)
    return out


def _stage_routed_quality(
    spark, stage, inputs, collector, substitutions, phase
):
    """RoutedQuality transform: per-language routed quality gate
    (textstats.py::routed_quality) — one signal computation, each
    language gated on its own Gopher/C4/LM parameters via a
    broadcast thresholds table (the Dolma per-language deployment
    shape). Properties: routes (required JSON object: lang ->
    overrides of ROUTE_DEFAULTS, explicit null disables a rule),
    langField ('lang'), textField ('text'), idField ('doc_id'),
    lmPaths (optional JSON object: lang -> save_bigram_lm artifact
    path — required for every route that sets maxPpl/max_ppl),
    smoothing ('wb'), keepOnly ('false' — when 'true', admit only
    routed_keep rows and emit the INPUT schema, the gate
    deployment shape)."""
    import json

    from topn_spark.operators.textstats import ROUTE_DEFAULTS

    (df,) = inputs
    p = stage.properties
    routes_raw = p.get("routes")
    lm_paths_raw = p.get("lmPaths")
    lang_col = p.get("langField", "lang")
    text_col = p.get("textField", "text")
    id_col = p.get("idField", "doc_id")
    smoothing = p.get("smoothing", "wb")
    keep_only = p.get("keepOnly", "false")
    if phase == "run":
        subs = substitutions or {}
        routes_raw = substitute_macros(
            routes_raw, subs, collector, "routes"
        )
        lm_paths_raw = substitute_macros(
            lm_paths_raw, subs, collector, "lmPaths"
        )
    ok = _require_field(df, lang_col, collector, "langField")
    ok = _require_field(df, text_col, collector, "textField") and ok
    if not routes_raw:
        collector.add_failure(
            "Required property 'routes' is missing.",
            "A JSON object: lang -> parameter overrides.",
            property_name="routes",
        )
        return df
    routes = None
    if not contains_macro(routes_raw):
        try:
            routes = json.loads(routes_raw)
        except ValueError:
            collector.add_failure(
                f"routes is not valid JSON: {routes_raw[:80]!r}.",
                "A JSON object: lang -> parameter overrides.",
                property_name="routes",
            )
            ok = False
        if routes is not None and (
            not isinstance(routes, dict)
            or not all(
                isinstance(cfg, dict) for cfg in routes.values()
            )
        ):
            collector.add_failure(
                "routes must map language -> override object.",
                "e.g. {\"en\": {}, \"de\": {\"min_stop_hits\": 3}}",
                property_name="routes",
            )
            routes, ok = None, False
        if routes is not None:
            bad = sorted(
                {
                    key
                    for cfg in routes.values()
                    for key in cfg
                    if key not in ROUTE_DEFAULTS
                }
            )
            if bad:
                collector.add_failure(
                    f"Unknown route parameter(s) {bad}.",
                    f"Valid: {sorted(ROUTE_DEFAULTS)}.",
                    property_name="routes",
                )
                ok = False
    lm_paths = {}
    if lm_paths_raw is not None and not contains_macro(lm_paths_raw):
        try:
            lm_paths = json.loads(lm_paths_raw)
        except ValueError:
            collector.add_failure(
                f"lmPaths is not valid JSON: {lm_paths_raw[:80]!r}.",
                "A JSON object: lang -> artifact path.",
                property_name="lmPaths",
            )
            ok = False
        if not isinstance(lm_paths, dict):
            collector.add_failure(
                "lmPaths must map language -> artifact path.",
                property_name="lmPaths",
            )
            lm_paths, ok = {}, False
    if routes is not None:
        unmodeled = sorted(
            g
            for g, cfg in routes.items()
            if {**ROUTE_DEFAULTS, **cfg}["max_ppl"] is not None
            and g not in lm_paths
        )
        if unmodeled and not contains_macro(lm_paths_raw or ""):
            collector.add_failure(
                f"Route(s) {unmodeled} set max_ppl but lmPaths has "
                "no model for them.",
                "Add the language to lmPaths.",
                property_name="lmPaths",
            )
            ok = False
    if keep_only not in ("true", "false"):
        collector.add_failure(
            f"Invalid keepOnly '{keep_only}'.",
            "'true' or 'false'.",
            property_name="keepOnly",
        )
        ok = False
    if not ok or routes is None:
        return df
    if phase == "deploy" and (
        contains_macro(routes_raw)
        or contains_macro(lm_paths_raw or "")
    ):
        if keep_only == "true":
            return df
        # schema-faithful placeholder for the annotate shape
        out = df
        for name, t in (
            ("n_words", "bigint"), ("mean_word_len", "double"),
            ("hash_word_ratio", "double"),
            ("ellipsis_word_ratio", "double"),
            ("frac_bullet_lines", "double"),
            ("frac_ellipsis_lines", "double"),
            ("frac_alpha_words", "double"),
            ("n_sentences", "bigint"),
            ("route_stop_hits", "bigint"), ("ppl", "double"),
            ("route_reason", "string"), ("routed_keep", "boolean"),
        ):
            out = out.withColumn(name, F.lit(None).cast(t))
        return out
    from topn_spark.operators.lm import load_bigram_lm
    from topn_spark.operators.textstats import routed_quality

    lms = {
        g: load_bigram_lm(spark, path)
        for g, path in lm_paths.items()
    }
    out = routed_quality(
        df,
        routes,
        lang_col=lang_col,
        text_col=text_col,
        id_col=id_col,
        lms=lms or None,
        smoothing=smoothing,
    )
    if keep_only == "true":
        return out.where(F.col("routed_keep")).select(*df.columns)
    return out


def _stage_dsir_weights(
    spark, stage, inputs, collector, substitutions, phase
):
    """DsirWeights transform: annotate each record with its DSIR
    importance log-weight (lm.py::dsir_logweights) against a TARGET
    corpus read from parquet; the raw model is the input stream
    itself. Properties: targetPath (required), textField ('text'),
    idField ('doc_id'), nBuckets ('256')."""
    (df,) = inputs
    p = stage.properties
    target_path = p.get("targetPath")
    text_col = p.get("textField", "text")
    id_col = p.get("idField", "doc_id")
    nb_raw = p.get("nBuckets", "256")
    if phase == "run":
        subs = substitutions or {}
        target_path = substitute_macros(
            target_path, subs, collector, "targetPath"
        )
        nb_raw = substitute_macros(nb_raw, subs, collector, "nBuckets")
    ok = _require_field(df, text_col, collector, "textField")
    ok = _require_field(df, id_col, collector, "idField") and ok
    if not target_path:
        collector.add_failure(
            "Required property 'targetPath' is missing.",
            "Point it at a parquet corpus with the text field.",
            property_name="targetPath",
        )
        ok = False
    n_buckets = 256
    if not contains_macro(nb_raw):
        try:
            n_buckets = int(nb_raw)
            if n_buckets < 2:
                raise ValueError
        except ValueError:
            collector.add_failure(
                f"Invalid nBuckets '{nb_raw}'.",
                "An integer >= 2.",
                property_name="nBuckets",
            )
            ok = False
    if not ok:
        return df
    if phase == "deploy" and contains_macro(target_path):
        # schema-faithful placeholder until the macro resolves
        return df.withColumn(
            "n_tokens", F.lit(None).cast("bigint")
        ).withColumn("logweight", F.lit(None).cast("double"))
    from topn_spark.operators.lm import dsir_logweights

    target = spark.read.parquet(target_path)
    weights = dsir_logweights(
        df,
        target=target,
        raw=df,
        n_buckets=n_buckets,
        id_col=id_col,
        text_col=text_col,
    )
    return df.join(weights, id_col)


def _stage_langid(
    spark, stage, inputs, collector, substitutions, phase
):
    """LangId transform: classify each record's language under a
    SAVED char-n-gram Naive-Bayes model artifact
    (langid.py::load_langid — train once on labelled seed corpora,
    classify any stream) and annotate with (n_grams, lang_pred).
    Properties: modelPath (required), textField ('text'), idField
    ('doc_id'), keepScores ('false' — when 'true', also append the
    per-language score columns; requires a literal modelPath at
    deploy time since the score schema depends on the model's
    language list), keepOnly (optional language code — keep only
    records predicted as that language and drop the added columns,
    the corpus-routing deployment shape)."""
    (df,) = inputs
    p = stage.properties
    model_path = p.get("modelPath")
    text_col = p.get("textField", "text")
    id_col = p.get("idField", "doc_id")
    keep_scores = p.get("keepScores", "false")
    keep_only = p.get("keepOnly")
    if phase == "run":
        subs = substitutions or {}
        model_path = substitute_macros(
            model_path, subs, collector, "modelPath"
        )
        keep_only = substitute_macros(
            keep_only, subs, collector, "keepOnly"
        )
    ok = _require_field(df, text_col, collector, "textField")
    ok = _require_field(df, id_col, collector, "idField") and ok
    if not model_path:
        collector.add_failure(
            "Required property 'modelPath' is missing.",
            "Point it at a save_langid artifact.",
            property_name="modelPath",
        )
        ok = False
    if keep_scores not in ("true", "false"):
        collector.add_failure(
            f"Invalid keepScores '{keep_scores}'.",
            "One of true, false.",
            property_name="keepScores",
        )
        ok = False
    if (
        keep_scores == "true"
        and contains_macro(model_path)
        and keep_only is None
    ):
        collector.add_failure(
            "keepScores=true needs a literal modelPath.",
            "The score columns depend on the model's language list, "
            "which a macro'd path cannot supply at deploy time.",
            property_name="keepScores",
        )
        ok = False
    if not ok:
        return df
    if phase == "deploy" and contains_macro(model_path):
        # schema-faithful placeholder: keepOnly preserves the input
        # schema; otherwise the two classification columns append
        if keep_only is not None:
            return df
        return df.withColumn(
            "n_grams", F.lit(None).cast("bigint")
        ).withColumn("lang_pred", F.lit(None).cast("string"))
    from topn_spark.operators.langid import langid_score, load_langid

    model, meta = load_langid(spark, model_path)
    scored = langid_score(
        df,
        model,
        meta,
        id_col=id_col,
        text_col=text_col,
        n_lo=meta["n_lo"],
        n_hi=meta["n_hi"],
        keep_scores=keep_scores == "true",
    )
    out = df.join(scored, id_col)
    if keep_only is not None:
        return out.where(F.col("lang_pred") == keep_only).select(
            *df.columns
        )
    return out


def _int_prop(
    p, name, default, collector, lo=1,
    substitutions=None, phase="deploy",
):
    """Parse an integer stage property with the @Macro lifecycle: a
    ``${...}`` value defers validation at deploy (returns the
    default as a schema-faithful placeholder) and substitutes-then-
    validates at run, exactly like the string-prop handlers."""
    raw = p.get(name, str(default))
    if phase == "run":
        raw = substitute_macros(
            raw, substitutions or {}, collector, name
        )
    if contains_macro(raw):
        return default if phase == "deploy" else None
    try:
        v = int(raw)
    except (TypeError, ValueError):
        collector.add_failure(
            f"Invalid {name} '{raw}'.", "An integer.", property_name=name
        )
        return None
    if v < lo:
        collector.add_failure(
            f"{name} must be >= {lo}, got {v}.", property_name=name
        )
        return None
    return v


def _stage_warc_source(
    spark, stage, inputs, collector, substitutions, phase
):
    """Warc batchsource: read ``.warc``/``.warc.gz`` archives from a
    path (glob OK) via Spark's binaryFile source and explode them
    into WARC records (sources/warc.py::parse_warc) —
    ``(blob_id, rec_idx, warc_type, record_id, target_uri,
    warc_date, content_length, payload)``, ``blob_id`` = file path.
    Properties: path (required), strict ('true': a malformed archive
    fails the task; 'false': parse the well-formed prefix).

    Scale: the archive FILE is the unit of parallelism (one binary
    row per file, then an Arrow record walk per file) — exactly how
    a crawl dump ships (CommonCrawl: ~1 GB .warc.gz segments)."""
    p = stage.properties
    path = p.get("path")
    strict = p.get("strict", "true")
    ok = True
    if not path:
        collector.add_failure(
            "Warc source needs a 'path'.", property_name="path"
        )
        ok = False
    if strict not in ("true", "false"):
        collector.add_failure(
            f"Invalid strict '{strict}'.", "One of true, false.",
            property_name="strict",
        )
        ok = False
    if not ok:
        return None
    from topn_spark.sources.warc import parse_warc

    if phase == "deploy" and contains_macro(path):
        # schema is static (blob_id = file path) — validate downstream
        # against an empty typed frame, the File-source literal-schema
        # shape
        empty = spark.createDataFrame(
            [], "blob_id string, content binary"
        )
        return parse_warc(empty, id_col="blob_id", strict=True)
    if phase == "run":
        path = substitute_macros(
            path, substitutions or {}, collector, "path"
        )
        if collector.failures:
            return None
    blobs = spark.read.format("binaryFile").load(path).select(
        F.col("path").alias("blob_id"), "content"
    )
    return parse_warc(blobs, id_col="blob_id", strict=strict == "true")


def _stage_warc_parse(
    spark, stage, inputs, collector, substitutions, phase
):
    """WarcParse transform: explode a BINARY column of WARC archive
    bytes (already in a table — a crawl stored as blobs, or bytes
    from a message bus) into WARC records, the in-table sibling of
    the Warc source. Properties: contentField ('content'), idField
    ('blob_id'), strict ('true')."""
    (df,) = inputs
    p = stage.properties
    content_col = p.get("contentField", "content")
    id_col = p.get("idField", "blob_id")
    strict = p.get("strict", "true")
    ok = _require_field(df, content_col, collector, "contentField")
    ok = _require_field(df, id_col, collector, "idField") and ok
    if strict not in ("true", "false"):
        collector.add_failure(
            f"Invalid strict '{strict}'.", "One of true, false.",
            property_name="strict",
        )
        ok = False
    if not ok:
        return df
    from topn_spark.sources.warc import parse_warc

    return parse_warc(
        df, content_col=content_col, id_col=id_col,
        strict=strict == "true",
    )


def _stage_leakage_split(
    spark, stage, inputs, collector, substitutions, phase
):
    """LeakageSafeSplit transform: near-dup-aware train/val/test
    split (pipeline.py::leakage_safe_split) — MinHash-LSH pair graph
    → connected components → deterministic md5 split keyed by the
    component label, so near-duplicate documents land in the SAME
    split (no corpus-internal eval contamination). Appends
    ``component`` and the split column. Properties: textField
    ('text'), idField ('doc_id'), splitField ('split'), family
    ('xxhash' — the fast production hash family; 'md5' — the
    engine-portable family, reproducible outside the JVM for
    cross-engine audit), threshold ('0.8' xxhash / '0.5' md5),
    numHashes, bands, shingleSize."""
    (df,) = inputs
    p = stage.properties
    text_col = p.get("textField", "text")
    id_col = p.get("idField", "doc_id")
    out_col = p.get("splitField", "split")
    family = p.get("family", "xxhash")
    ok = _require_field(df, text_col, collector, "textField")
    ok = _require_field(df, id_col, collector, "idField") and ok
    if family not in ("xxhash", "md5"):
        collector.add_failure(
            f"Invalid family '{family}'.", "One of xxhash, md5.",
            property_name="family",
        )
        ok = False
    num_hashes = _int_prop(
        p, "numHashes", 32 if family == "xxhash" else 8, collector,
        substitutions=substitutions, phase=phase,
    )
    bands = _int_prop(
        p, "bands", 8 if family == "xxhash" else 4, collector,
        substitutions=substitutions, phase=phase,
    )
    shingle = _int_prop(
        p, "shingleSize", 3, collector,
        substitutions=substitutions, phase=phase,
    )
    thr_raw = p.get(
        "threshold", "0.8" if family == "xxhash" else "0.5"
    )
    if phase == "run":
        thr_raw = substitute_macros(
            thr_raw, substitutions or {}, collector, "threshold"
        )
    if contains_macro(thr_raw):
        threshold = 0.5 if phase == "deploy" else None
    else:
        try:
            threshold = float(thr_raw)
        except (TypeError, ValueError):
            threshold = None
            collector.add_failure(
                f"Invalid threshold '{thr_raw}'.",
                "A number in [0, 1].",
                property_name="threshold",
            )
    if None in (num_hashes, bands, shingle, threshold) or not ok:
        return df
    if num_hashes % bands:
        collector.add_failure(
            f"numHashes ({num_hashes}) must divide into bands"
            f" ({bands}).",
            property_name="bands",
        )
        return df
    if phase == "deploy":
        # schema-faithful placeholder: the connected-components
        # fixpoint EXECUTES jobs (iterative convergence check), which
        # deploy-time validation must never do
        return df.withColumn(
            "component", F.col(id_col)
        ).withColumn(out_col, F.lit(None).cast("string"))
    from topn_spark.operators.dedup import (
        lsh_pairs_md5,
        minhash_dedup_pairs,
    )
    from topn_spark.operators.pipeline import leakage_safe_split

    # Materialize the stage input ONCE: it fans out to the LSH pair
    # graph, the CC edge checkpoint, the component join-back AND the
    # downstream stages — each would otherwise re-run the whole
    # upstream pipeline (WARC parse / extract / quality / dedup)
    # per consumer (measured: the upstream chain executed 3x per
    # z49 run, ~14 s of CPU per execution at sf0.1).
    df = df.localCheckpoint(eager=True)
    if family == "md5":
        pairs = lsh_pairs_md5(
            df, id_col, text_col, num_hashes, bands, shingle, threshold
        )
    else:
        pairs = minhash_dedup_pairs(
            df, id_col, text_col, threshold, num_hashes, bands, shingle
        )
    return leakage_safe_split(
        df, pairs.select("id_a", "id_b"), id_col=id_col, out_col=out_col
    )


def _stage_neardup_collapse(
    spark, stage, inputs, collector, substitutions, phase
):
    """NearDupCollapse transform: collapse MinHash-LSH near-dup
    components to ONE survivor each (dedup.neardup_keep_best) —
    keep the highest-``scoreField`` member (ties: lowest id), or
    min-id when no score is given (the x31 convention). Properties:
    textField ('text'), idField ('doc_id'), scoreField (optional),
    family ('xxhash' | 'md5'), threshold, numHashes, bands,
    shingleSize — the LeakageSafeSplit pair-graph knobs. Appends
    ``component``."""
    (df,) = inputs
    p = stage.properties
    text_col = p.get("textField", "text")
    id_col = p.get("idField", "doc_id")
    score_col = p.get("scoreField")
    family = p.get("family", "xxhash")
    ok = _require_field(df, text_col, collector, "textField")
    ok = _require_field(df, id_col, collector, "idField") and ok
    if score_col is not None:
        ok = _require_field(df, score_col, collector, "scoreField") and ok
    if family not in ("xxhash", "md5"):
        collector.add_failure(
            f"Invalid family '{family}'.", "One of xxhash, md5.",
            property_name="family",
        )
        ok = False
    num_hashes = _int_prop(
        p, "numHashes", 32 if family == "xxhash" else 8, collector,
        substitutions=substitutions, phase=phase,
    )
    bands = _int_prop(
        p, "bands", 8 if family == "xxhash" else 4, collector,
        substitutions=substitutions, phase=phase,
    )
    shingle = _int_prop(
        p, "shingleSize", 3, collector,
        substitutions=substitutions, phase=phase,
    )
    thr_raw = p.get(
        "threshold", "0.8" if family == "xxhash" else "0.5"
    )
    if phase == "run":
        thr_raw = substitute_macros(
            thr_raw, substitutions or {}, collector, "threshold"
        )
    try:
        threshold = (
            0.5 if contains_macro(thr_raw) else float(thr_raw)
        )
    except (TypeError, ValueError):
        threshold = None
        collector.add_failure(
            f"Invalid threshold '{thr_raw}'.", "A number in [0, 1].",
            property_name="threshold",
        )
    if None in (num_hashes, bands, shingle, threshold) or not ok:
        return df
    if num_hashes % bands:
        collector.add_failure(
            f"numHashes ({num_hashes}) must divide into bands"
            f" ({bands}).",
            property_name="bands",
        )
        return df
    if phase == "deploy":
        # the CC fixpoint executes jobs — never at validation time
        return df.withColumn("component", F.col(id_col))
    from topn_spark.operators.dedup import (
        lsh_pairs_md5,
        minhash_dedup_pairs,
        neardup_keep_best,
    )

    # same fan-out as LeakageSafeSplit: the stage input feeds the
    # pair graph, the CC edges, the component join-back and the
    # downstream stages — materialize it once (run phase only)
    df = df.localCheckpoint(eager=True)
    if family == "md5":
        pairs = lsh_pairs_md5(
            df, id_col, text_col, num_hashes, bands, shingle, threshold
        )
    else:
        pairs = minhash_dedup_pairs(
            df, id_col, text_col, threshold, num_hashes, bands, shingle
        )
    pairs = pairs.select("id_a", "id_b")
    if score_col is not None:
        return neardup_keep_best(df, pairs, score_col, id_col=id_col)
    # min-id convention: rank on a constant score
    scored = df.withColumn("_nd_score", F.lit(0))
    return neardup_keep_best(
        scored, pairs, "_nd_score", id_col=id_col
    ).drop("_nd_score")


def _stage_token_budget_mixture(
    spark, stage, inputs, collector, substitutions, phase
):
    """TokenBudgetMixture transform: fill each group to its token
    quota (pipeline.token_budget_mixture — training mixes are
    specified in TOKENS). Properties: weights (required,
    'group:weight,group:weight' — e.g. 'web:0.6,code:0.2,books:0.2'),
    totalTokens (required), groupField ('source'), idField
    ('doc_id'), tokenField ('n_tokens')."""
    (df,) = inputs
    p = stage.properties
    weights_raw = p.get("weights")
    group_col = p.get("groupField", "source")
    id_col = p.get("idField", "doc_id")
    token_col = p.get("tokenField", "n_tokens")
    if phase == "run":
        weights_raw = substitute_macros(
            weights_raw, substitutions or {}, collector, "weights"
        )
    total = _int_prop(
        p, "totalTokens", 0, collector, lo=0,
        substitutions=substitutions, phase=phase,
    )
    ok = _require_field(df, group_col, collector, "groupField")
    ok = _require_field(df, id_col, collector, "idField") and ok
    ok = _require_field(df, token_col, collector, "tokenField") and ok
    if "totalTokens" not in p:
        collector.add_failure(
            "TokenBudgetMixture needs 'totalTokens'.",
            property_name="totalTokens",
        )
        ok = False
    weights = None
    if not weights_raw:
        collector.add_failure(
            "TokenBudgetMixture needs 'weights'.",
            "Format: 'group:weight,group:weight'.",
            property_name="weights",
        )
        ok = False
    elif not contains_macro(weights_raw):
        try:
            weights = {
                g.strip(): float(w)
                for g, w in (
                    part.split(":", 1)
                    for part in weights_raw.split(",")
                    if part.strip()
                )
            }
            if not weights:
                raise ValueError("empty")
        except ValueError:
            weights = None
            collector.add_failure(
                f"Unparseable weights '{weights_raw}'.",
                "Format: 'group:weight,group:weight'.",
                property_name="weights",
            )
            ok = False
    if total is None or not ok:
        return df
    if phase == "deploy" or weights is None:
        return df  # filter preserves the schema
    from topn_spark.operators.pipeline import token_budget_mixture

    return token_budget_mixture(
        df, weights, total, group_col=group_col, id_col=id_col,
        token_col=token_col,
    )


def _stage_epoch_mixture(
    spark, stage, inputs, collector, substitutions, phase
):
    """EpochMixture transform: fill each group to its token quota
    WITH REPETITION (pipeline.epoch_mixture — small domains run
    multiple epochs, the LLaMA/DoReMi mixes); appends ``n_epochs``
    repeat counts, drops zero-epoch rows. Properties: weights
    (required, 'group:weight,...'), totalTokens (required),
    maxEpochs (optional cap), groupField ('source'), idField
    ('doc_id'), tokenField ('n_tokens'), expand ('false' — when
    'true', materialize one row per (document, epoch) with the
    md5 global-interleave ``order_key`` via
    pipeline.expand_epochs; salt re-deals the interleave)."""
    (df,) = inputs
    p = stage.properties
    weights_raw = p.get("weights")
    group_col = p.get("groupField", "source")
    id_col = p.get("idField", "doc_id")
    token_col = p.get("tokenField", "n_tokens")
    if phase == "run":
        weights_raw = substitute_macros(
            weights_raw, substitutions or {}, collector, "weights"
        )
    total = _int_prop(
        p, "totalTokens", 0, collector, lo=0,
        substitutions=substitutions, phase=phase,
    )
    max_epochs = None
    if "maxEpochs" in p:
        max_epochs = _int_prop(
            p, "maxEpochs", 1, collector, lo=1,
            substitutions=substitutions, phase=phase,
        )
    ok = _require_field(df, group_col, collector, "groupField")
    ok = _require_field(df, id_col, collector, "idField") and ok
    ok = _require_field(df, token_col, collector, "tokenField") and ok
    if "totalTokens" not in p:
        collector.add_failure(
            "EpochMixture needs 'totalTokens'.",
            property_name="totalTokens",
        )
        ok = False
    weights = None
    if not weights_raw:
        collector.add_failure(
            "EpochMixture needs 'weights'.",
            "Format: 'group:weight,group:weight'.",
            property_name="weights",
        )
        ok = False
    elif not contains_macro(weights_raw):
        try:
            weights = {
                g.strip(): float(w)
                for g, w in (
                    part.split(":", 1)
                    for part in weights_raw.split(",")
                    if part.strip()
                )
            }
            if not weights:
                raise ValueError("empty")
        except ValueError:
            weights = None
            collector.add_failure(
                f"Unparseable weights '{weights_raw}'.",
                "Format: 'group:weight,group:weight'.",
                property_name="weights",
            )
            ok = False
    expand = p.get("expand", "false")
    if expand not in ("true", "false"):
        collector.add_failure(
            f"Invalid expand '{expand}'.",
            "'true' or 'false'.",
            property_name="expand",
        )
        ok = False
    if total is None or not ok:
        return df
    if phase == "deploy" or weights is None:
        out = df.withColumn("n_epochs", F.lit(None).cast("bigint"))
        if expand == "true":
            out = out.withColumn(
                "epoch", F.lit(None).cast("bigint")
            ).withColumn("order_key", F.lit(None).cast("string"))
        return out
    from topn_spark.operators.pipeline import epoch_mixture, expand_epochs

    mixed = epoch_mixture(
        df, weights, total, group_col=group_col, id_col=id_col,
        token_col=token_col, max_epochs=max_epochs,
    )
    if expand == "true":
        return expand_epochs(
            mixed, id_col=id_col, salt=p.get("salt", "")
        )
    return mixed


def _stage_decontaminate(
    spark, stage, inputs, collector, substitutions, phase
):
    """Decontaminate transform: benchmark decontamination by n-gram
    collision (dedup.ngram_decontaminate — the GPT-3 Appendix C
    recipe). Properties: evalPath (required — parquet of the eval
    benchmark), n ('13'), minHits ('1'), action ('flag' annotates
    n_contam_grams + contaminated; 'drop' emits clean rows in the
    input schema), textField ('text'), evalTextField (defaults to
    textField), idField ('doc_id'), countField/flagField (rename the
    flag outputs so successive gates against different benchmarks
    compose — the operator raises on a clobber)."""
    (df,) = inputs
    p = stage.properties
    eval_path = p.get("evalPath")
    text_col = p.get("textField", "text")
    ev_text_col = p.get("evalTextField", text_col)
    id_col = p.get("idField", "doc_id")
    action = p.get("action", "flag")
    count_col = p.get("countField", "n_contam_grams")
    flag_col = p.get("flagField", "contaminated")
    if phase == "run":
        eval_path = substitute_macros(
            eval_path, substitutions or {}, collector, "evalPath"
        )
    n = _int_prop(
        p, "n", 13, collector, lo=1,
        substitutions=substitutions, phase=phase,
    )
    min_hits = _int_prop(
        p, "minHits", 1, collector, lo=1,
        substitutions=substitutions, phase=phase,
    )
    ok = _require_field(df, text_col, collector, "textField")
    ok = _require_field(df, id_col, collector, "idField") and ok
    if not eval_path:
        collector.add_failure(
            "Required property 'evalPath' is missing.",
            "Point it at the eval benchmark parquet.",
            property_name="evalPath",
        )
        ok = False
    if action not in ("flag", "drop"):
        collector.add_failure(
            f"Invalid action '{action}'.",
            "'flag' or 'drop'.",
            property_name="action",
        )
        ok = False
    for prop, col in (("countField", count_col), ("flagField", flag_col)):
        if col in df.columns:
            collector.add_failure(
                f"Output field '{col}' already exists in the input.",
                f"Set '{prop}' so successive gates compose.",
                property_name=prop,
            )
            ok = False
    if n is None or min_hits is None or not ok:
        return df
    if phase == "deploy" and contains_macro(eval_path):
        if action == "drop":
            return df
        return df.withColumn(
            count_col, F.lit(None).cast("bigint")
        ).withColumn(flag_col, F.lit(None).cast("boolean"))
    from topn_spark.operators.dedup import ngram_decontaminate

    eval_df = spark.read.parquet(eval_path)
    if ev_text_col not in eval_df.columns:
        collector.add_failure(
            f"Eval benchmark at '{eval_path}' has no field "
            f"'{ev_text_col}'.",
            f"Fields: {eval_df.columns}.",
            property_name="evalTextField",
        )
        return df
    return ngram_decontaminate(
        df, eval_df, n=n, text_col=text_col, id_col=id_col,
        eval_text_col=ev_text_col, min_hits=min_hits, action=action,
        count_col=count_col, flag_col=flag_col,
    )


def _stage_tokenize(
    spark, stage, inputs, collector, substitutions, phase
):
    """Tokenize transform: append the token array a packer/budgeter
    consumes. Properties: textField ('text'), mode ('unicode' —
    also 'ascii' or the CJK-aware 'script'; all JVM-side regex,
    appending ``tokens`` + ``n_tokens``) OR mergesPath (a
    save_bpe_merges artifact — apply trained byte-pair encoding,
    appending ``n_words``/``n_bpe_tokens`` and, when keepTokens is
    nonzero, ``tokens`` — '-1' keeps ALL subwords, the shape
    PackSequences consumes; bpeMode 'ascii'|'unicode'|'byte' selects
    the pre-tokenizer, idField the join-back key) OR piecesPath (a
    save_unigram_lm artifact — Viterbi-best segmentation under the
    trained piece table, appending ``n_words``/``n_lm_tokens`` and
    the same keepTokens contract; lmMode 'ascii'|'unicode')."""
    (df,) = inputs
    p = stage.properties
    text_col = p.get("textField", "text")
    merges_path = p.get("mergesPath")
    pieces_path = p.get("piecesPath")
    if merges_path is not None and pieces_path is not None:
        collector.add_failure(
            "mergesPath and piecesPath are mutually exclusive.",
            "A stage applies ONE trained tokenizer.",
            property_name="piecesPath",
        )
        return df
    if phase == "run":
        merges_path = substitute_macros(
            merges_path, substitutions or {}, collector, "mergesPath"
        )
        pieces_path = substitute_macros(
            pieces_path, substitutions or {}, collector, "piecesPath"
        )
    ok = _require_field(df, text_col, collector, "textField")
    if pieces_path is not None:
        id_col = p.get("idField", "doc_id")
        lm_mode = p.get("lmMode", "ascii")
        keep = _int_prop(
            p, "keepTokens", 0, collector, lo=-1,
            substitutions=substitutions, phase=phase,
        )
        if lm_mode not in ("ascii", "unicode"):
            collector.add_failure(
                f"Invalid lmMode '{lm_mode}'.",
                "One of ascii, unicode.",
                property_name="lmMode",
            )
            ok = False
        ok = _require_field(df, id_col, collector, "idField") and ok
        if keep is None or not ok:
            return df
        if phase == "deploy" and contains_macro(pieces_path):
            out = df.withColumn(
                "n_words", F.lit(None).cast("bigint")
            ).withColumn("n_lm_tokens", F.lit(None).cast("bigint"))
            if keep:
                out = out.withColumn(
                    "tokens", F.lit(None).cast("array<string>")
                )
            return out
        from topn_spark.operators.textstats import (
            apply_unigram_lm,
            load_unigram_lm,
        )

        pieces = load_unigram_lm(spark, pieces_path)
        applied = apply_unigram_lm(
            df.select(id_col, text_col), pieces, id_col=id_col,
            text_col=text_col, keep_tokens=keep, mode=lm_mode,
        )
        return df.join(applied, id_col)
    if merges_path is None:
        mode = p.get("mode", "unicode")
        if mode not in ("ascii", "unicode", "script"):
            collector.add_failure(
                f"Invalid mode '{mode}'.",
                "One of ascii, unicode, script (or set mergesPath "
                "for trained BPE).",
                property_name="mode",
            )
            ok = False
        if not ok:
            return df
        from topn_spark.operators.textstats import tokens

        t = tokens(text_col, mode)
        return df.withColumn("tokens", t).withColumn(
            "n_tokens", F.size("tokens").cast("bigint")
        )
    id_col = p.get("idField", "doc_id")
    bpe_mode = p.get("bpeMode", "byte")
    keep = _int_prop(
        p, "keepTokens", 0, collector, lo=-1,
        substitutions=substitutions, phase=phase,
    )
    if bpe_mode not in ("ascii", "unicode", "byte"):
        collector.add_failure(
            f"Invalid bpeMode '{bpe_mode}'.",
            "One of ascii, unicode, byte.",
            property_name="bpeMode",
        )
        return df
    ok = _require_field(df, id_col, collector, "idField") and ok
    if keep is None or not ok:
        return df
    if phase == "deploy" and contains_macro(merges_path):
        out = df.withColumn(
            "n_words", F.lit(None).cast("bigint")
        ).withColumn("n_bpe_tokens", F.lit(None).cast("bigint"))
        if keep:
            out = out.withColumn(
                "tokens", F.lit(None).cast("array<string>")
            )
        return out
    from topn_spark.operators.textstats import (
        apply_bpe,
        load_bpe_merges,
    )

    merges = load_bpe_merges(spark, merges_path)
    applied = apply_bpe(
        df.select(id_col, text_col), merges, id_col=id_col,
        text_col=text_col, keep_tokens=keep, mode=bpe_mode,
    )
    return df.join(applied, id_col)


def _stage_quality_classifier(
    spark, stage, inputs, collector, substitutions, phase
):
    """QualityClassifier transform: score every record under a SAVED
    logistic-regression artifact (textstats.load_logreg — train once
    with logreg_train/train_quality_classifier, gate any stream):
    featurize with add_quality, sigmoid-score with the artifact's
    weights (pure Catalyst, weights as literals). Properties:
    modelPath (required), textField ('text'), probField ('prob'),
    minProb (optional — keep only records with prob >= minProb and
    drop the added columns, the gate deployment shape; records
    without complete features score NULL and are dropped by the
    gate)."""
    (df,) = inputs
    p = stage.properties
    model_path = p.get("modelPath")
    text_col = p.get("textField", "text")
    prob_col = p.get("probField", "prob")
    minprob_raw = p.get("minProb")
    if phase == "run":
        subs = substitutions or {}
        model_path = substitute_macros(
            model_path, subs, collector, "modelPath"
        )
        minprob_raw = substitute_macros(
            minprob_raw, subs, collector, "minProb"
        )
    ok = _require_field(df, text_col, collector, "textField")
    if not model_path:
        collector.add_failure(
            "Required property 'modelPath' is missing.",
            "Point it at a save_logreg artifact.",
            property_name="modelPath",
        )
        ok = False
    min_prob = None
    if minprob_raw is not None and not contains_macro(minprob_raw):
        try:
            min_prob = float(minprob_raw)
        except (TypeError, ValueError):
            collector.add_failure(
                f"Invalid minProb '{minprob_raw}'.",
                "A number in [0, 1].",
                property_name="minProb",
            )
            ok = False
    if not ok:
        return df
    if phase == "deploy" and contains_macro(model_path):
        # schema-faithful placeholder: the gate preserves the input
        # schema; annotate mode appends the feature + prob columns
        if minprob_raw is not None:
            return df
        from topn_spark.operators.textstats import add_quality

        return add_quality(df, text_col).withColumn(
            prob_col, F.lit(None).cast("double")
        )
    from topn_spark.operators.textstats import (
        add_quality,
        load_logreg,
        logreg_predict,
    )

    weights, feature_cols = load_logreg(spark, model_path)
    feat = add_quality(df, text_col)
    missing = [c for c in feature_cols if c not in feat.columns]
    if missing:
        collector.add_failure(
            f"Artifact features {missing} not produced by the "
            "add_quality featurizer.",
            "The artifact must be trained over add_quality columns.",
            property_name="modelPath",
        )
        return df
    scored = logreg_predict(feat, weights, feature_cols, prob_col)
    if minprob_raw is not None:
        return scored.where(F.col(prob_col) >= min_prob).select(
            *df.columns
        )
    return scored


def _stage_dedup_against(
    spark, stage, inputs, collector, substitutions, phase
):
    """DedupAgainst batchjoiner-shaped transform: cross-corpus exact
    dedup gate (dedup.dedup_against) — keep only records whose
    ``uniqueFields`` content does NOT already appear in a BASE corpus
    on disk, the incremental-ingest check a pipeline runs before
    admitting a new crawl against the existing corpus. Properties:
    basePath (required — parquet of the existing corpus), uniqueFields
    (comma list, default = all common columns). Planned as a LEFT
    ANTI join on the md5 content digest — both sides shuffle 16-byte
    keys, or broadcast when the base digest set is small."""
    (df,) = inputs
    p = stage.properties
    base_path = p.get("basePath")
    if phase == "run":
        base_path = substitute_macros(
            base_path, substitutions or {}, collector, "basePath"
        )
    uniq = [
        c.strip()
        for c in p.get("uniqueFields", "").split(",")
        if c.strip()
    ]
    ok = True
    if not base_path:
        collector.add_failure(
            "DedupAgainst needs 'basePath'.", property_name="basePath"
        )
        ok = False
    missing = [c for c in uniq if c not in df.columns]
    if missing:
        collector.add_failure(
            f"Columns {missing} not in input schema.",
            property_name="uniqueFields",
        )
        ok = False
    if not ok:
        return df
    if phase == "deploy":
        return df  # anti join preserves the schema; base unread
    from topn_spark.operators.dedup import dedup_against

    base = spark.read.parquet(base_path)
    if uniq:
        bad = [c for c in uniq if c not in base.columns]
        if bad:
            collector.add_failure(
                f"Columns {bad} not in the base corpus schema.",
                property_name="uniqueFields",
            )
            return df
    return dedup_against(df, base, subset=uniq or None)


def _stage_pii_redact(
    spark, stage, inputs, collector, substitutions, phase
):
    """PiiRedact transform: regex PII redaction
    (textstats.redact_pii — emails/IPs/phones to the standard
    placeholder tokens + per-class counts). Properties: textField
    ('text'), replaceText ('false' — when 'true', overwrite the text
    column with the redacted text and keep the input schema, the
    release-gate deployment shape)."""
    (df,) = inputs
    p = stage.properties
    text_col = p.get("textField", "text")
    replace_text = p.get("replaceText", "false")
    ok = _require_field(df, text_col, collector, "textField")
    if replace_text not in ("true", "false"):
        collector.add_failure(
            f"Invalid replaceText '{replace_text}'.",
            "One of true, false.",
            property_name="replaceText",
        )
        ok = False
    if not ok:
        return df
    from topn_spark.operators.textstats import redact_pii

    out = redact_pii(df, text_col)
    if replace_text == "true":
        return out.withColumn(text_col, F.col("clean_text")).select(
            *df.columns
        )
    return out


def _stage_url_filter(
    spark, stage, inputs, collector, substitutions, phase
):
    """UrlFilter transform: domain-blocklist/allowlist source
    filtering (the UT1-style stage every web-corpus recipe runs
    before content filters — Dolma, RefinedWeb, C4 all gate on
    domain first, it is the cheapest signal): decompose the URL with
    pipeline.py::url_features and keep/drop rows whose
    ``registered_domain`` (or ``host``) is in the list. Properties:
    urlField ('url'), action ('block' — drop matches — or 'allow' —
    keep only matches), matchOn ('registered_domain' | 'host'),
    domains (comma literal list) OR domainsPath (text file, one
    domain per line, '#' comments — the artifact shape; matched via
    a broadcast-friendly join, never a collected driver set, so a
    millions-of-domains UT1 list stays executor-side). Output schema
    = input schema (feature columns are internal)."""
    (df,) = inputs
    p = stage.properties
    url_col = p.get("urlField", "url")
    action = p.get("action", "block")
    match_on = p.get("matchOn", "registered_domain")
    domains = p.get("domains")
    domains_path = p.get("domainsPath")
    ok = _require_field(df, url_col, collector, "urlField")
    if action not in ("block", "allow"):
        collector.add_failure(
            f"Invalid action '{action}'.", "One of block, allow.",
            property_name="action",
        )
        ok = False
    if match_on not in ("registered_domain", "host"):
        collector.add_failure(
            f"Invalid matchOn '{match_on}'.",
            "One of registered_domain, host.",
            property_name="matchOn",
        )
        ok = False
    if (domains is None) == (domains_path is None):
        collector.add_failure(
            "Exactly one of 'domains' or 'domainsPath' is required.",
            "A comma list for small literal lists, a one-per-line "
            "text file for blocklist artifacts.",
            property_name="domains",
        )
        ok = False
    if phase == "run":
        domains_path = substitute_macros(
            domains_path, substitutions or {}, collector, "domainsPath"
        )
        domains = substitute_macros(
            domains, substitutions or {}, collector, "domains"
        )
    if not ok:
        return df
    if phase == "deploy":
        return df  # filter never changes the schema
    from topn_spark.operators.pipeline import url_features

    feats = url_features(df, url_col=url_col)
    key = F.lower(F.col(match_on))
    if domains is not None:
        wanted = [
            d.strip().lower() for d in domains.split(",") if d.strip()
        ]
        hit = key.isin(wanted)
        out = feats.where(
            hit if action == "allow"
            else ~F.coalesce(hit, F.lit(False))
        )
    else:
        dlist = (
            spark.read.text(domains_path)
            .select(F.lower(F.trim("value")).alias("_dom"))
            .where(
                (F.col("_dom") != "") & ~F.col("_dom").startswith("#")
            )
            .distinct()
        )
        out = feats.join(
            dlist,
            key == F.col("_dom"),
            "left_semi" if action == "allow" else "left_anti",
        )
    return out.select(*df.columns)


def _stage_pack_sequences(
    spark, stage, inputs, collector, substitutions, phase
):
    """PackSequences transform: GPT-style packing
    (pipeline.py::pack_token_sequences) — concatenate tokenized
    documents in order and emit fixed-length training sequences
    ``(*by, seq_id, n_docs, n_tokens, tokens)``; documents split
    across boundaries, no token dropped. Properties: tokensField
    ('tokens'), idField ('doc_id'), seqLen ('2048'), orderField
    (defaults to idField), byFields (comma list — ALWAYS set at
    scale: an empty byFields is one global window partition),
    padToken (optional pad for the final short sequence), sepToken
    (optional EOS/separator appended after every document — the GPT
    convention; counts as a real training token)."""
    (df,) = inputs
    p = stage.properties
    tokens_col = p.get("tokensField", "tokens")
    id_col = p.get("idField", "doc_id")
    order_col = p.get("orderField", id_col)
    by = tuple(
        c.strip() for c in p.get("byFields", "").split(",") if c.strip()
    )
    seq_len = _int_prop(
        p, "seqLen", 2048, collector,
        substitutions=substitutions, phase=phase,
    )
    ok = _require_field(df, tokens_col, collector, "tokensField")
    ok = _require_field(df, id_col, collector, "idField") and ok
    ok = _require_field(df, order_col, collector, "orderField") and ok
    for c in by:
        ok = _require_field(df, c, collector, "byFields") and ok
    if seq_len is None or not ok:
        return df
    from topn_spark.operators.pipeline import pack_token_sequences

    return pack_token_sequences(
        df, tokens_col=tokens_col, id_col=id_col, seq_len=seq_len,
        by=by, order_col=order_col, pad_token=p.get("padToken"),
        sep_token=p.get("sepToken"),
    )


def _stage_shard_sink(
    spark, stage, inputs, collector, substitutions, phase
):
    """ShardSink batchsink: training-shard export
    (pipeline.py::export_training_shards) — write the corpus as
    ``path/shard=<k>/`` parquet with deterministic md5(id||salt)
    mod-nShards assignment plus a ``_manifest`` of per-shard
    doc/token counts (verify with verify_shards). Properties: path
    (required), nShards (required), idField ('doc_id'), tokenField
    (optional — manifest then also carries token counts), salt ('')."""
    (df,) = inputs
    p = stage.properties
    path = p.get("path")
    id_col = p.get("idField", "doc_id")
    token_col = p.get("tokenField")
    if not path:
        collector.add_failure(
            "ShardSink needs a 'path'.", property_name="path"
        )
        return df
    if "nShards" not in p:
        collector.add_failure(
            "ShardSink needs 'nShards'.", property_name="nShards"
        )
        return df
    n_shards = _int_prop(
        p, "nShards", 1, collector,
        substitutions=substitutions, phase=phase,
    )
    ok = _require_field(df, id_col, collector, "idField")
    if token_col is not None:
        ok = _require_field(df, token_col, collector, "tokenField") and ok
    if n_shards is None or not ok:
        return df
    if phase == "run":
        path = substitute_macros(
            path, substitutions or {}, collector, "path"
        )
        if collector.failures:
            return df
        from topn_spark.operators.pipeline import export_training_shards

        export_training_shards(
            df, path, n_shards, id_col=id_col, token_col=token_col,
            salt=p.get("salt", ""),
        )
    return df


def _stage_winrate(
    spark, stage, inputs, collector, substitutions, phase
):
    """WinRate aggregator: the arena head-to-head matrix
    (sft.pairwise_winrate — per model pair over shared scored
    prompts: wins/losses/ties + win_rate_a with ties half, best-of-n
    reduction per (prompt, model) first). Properties: promptField
    ('prompt_id'), modelField ('model'), scoreField ('score')."""
    from topn_spark.operators.sft import pairwise_winrate

    (df,) = inputs
    p = stage.properties
    prompt_col = p.get("promptField", "prompt_id")
    model_col = p.get("modelField", "model")
    score_col = p.get("scoreField", "score")
    ok = True
    for prop, col in (
        ("promptField", prompt_col), ("modelField", model_col),
        ("scoreField", score_col),
    ):
        ok = _require_field(df, col, collector, prop) and ok
    if not ok:
        return df
    return pairwise_winrate(
        df, prompt_col=prompt_col, model_col=model_col,
        score_col=score_col,
    )


def _stage_elo_fit(
    spark, stage, inputs, collector, substitutions, phase
):
    """EloFit aggregator: Bradley–Terry strength fit over a WinRate
    matrix (sft.bradley_terry_fit — Hunter MM on the model-sized
    sufficient statistic, geometric-mean-1 anchor, Elo-scale
    rating). Runs the driver-side fit ONLY in the run phase (the fit
    collects the matrix; at deploy it propagates the empty ratings
    schema). Properties: smoothing ('0.5' — zero-win models raise
    at 0), maxIter ('1000')."""
    from topn_spark.operators.sft import bradley_terry_fit

    (df,) = inputs
    p = stage.properties
    ok = True
    for col in ("model_a", "model_b", "wins_a", "wins_b", "ties"):
        ok = _require_field(df, col, collector, "input") and ok
    smoothing_raw = p.get("smoothing", "0.5")
    max_iter = _int_prop(
        p, "maxIter", 1, collector,
        substitutions=substitutions, phase=phase,
    ) if "maxIter" in p else 1000
    if phase == "run":
        smoothing_raw = substitute_macros(
            smoothing_raw, substitutions or {}, collector, "smoothing"
        )
    smoothing = 0.5
    if not contains_macro(smoothing_raw):
        try:
            smoothing = float(smoothing_raw)
            if smoothing < 0:
                raise ValueError
        except ValueError:
            collector.add_failure(
                f"Invalid smoothing '{smoothing_raw}'.",
                "A non-negative number.",
                property_name="smoothing",
            )
            ok = False
    if not ok or max_iter is None:
        return df
    if phase != "run":
        return bradley_terry_fit(df.limit(0))
    return bradley_terry_fit(
        df, smoothing=smoothing, max_iter=max_iter
    )


def _stage_encode_ids(
    spark, stage, inputs, collector, substitutions, phase
):
    """EncodeIds transform: replace a string-token array with its
    integer-id array under a saved vocabulary artifact
    (binshard.py::encode_token_ids — the step between a string
    tokenizer and binary export; OOV raises, never substitutes).
    Properties: vocabPath (required — a save_vocab artifact),
    tokensField ('tokens'), outField (defaults to tokensField)."""
    (df,) = inputs
    p = stage.properties
    vocab_path = p.get("vocabPath")
    tokens_col = p.get("tokensField", "tokens")
    ok = _require_field(df, tokens_col, collector, "tokensField")
    if not vocab_path:
        collector.add_failure(
            "Required property 'vocabPath' is missing.",
            "Point it at a save_vocab artifact.",
            property_name="vocabPath",
        )
        ok = False
    if phase == "run" and vocab_path:
        vocab_path = substitute_macros(
            vocab_path, substitutions or {}, collector, "vocabPath"
        )
    if not ok:
        return df
    if phase == "deploy" and contains_macro(vocab_path):
        return df
    from topn_spark.operators.binshard import (
        encode_token_ids,
        load_vocab,
    )

    vocab = load_vocab(spark, vocab_path)
    return encode_token_ids(
        df, vocab, tokens_col=tokens_col,
        out_col=p.get("outField", tokens_col),
    )


def _stage_bin_shard_sink(
    spark, stage, inputs, collector, substitutions, phase
):
    """BinShardSink batchsink: trainer-native binary shard export
    (binshard.py::export_bin_shards) — fixed-layout .bin token
    stream + .idx sequence index + .msk loss-mask bitstream per
    shard, plus a byte-exact _manifest (verify with
    verify_bin_shards). Properties: path (required), nShards
    (required), idField ('seq_id'), tokensField ('tokens'),
    maskField ('loss_mask'; 'none' exports without a mask),
    assetsField ('none'; a multimodal asset-ref array column adds
    the .ast sidecar), dtype ('auto' | 'uint16' | 'uint32'),
    salt (''), incremental ('false'; 'true' rewrites only shards
    whose content signature changed), seqsPerShard (optional:
    RANGE sharding — shard = id // seqsPerShard, shard count grows
    with the corpus; nShards is then ignored. The streaming-
    maintenance scheme: commits touch only tail shards)."""
    (df,) = inputs
    p = stage.properties
    path = p.get("path")
    id_col = p.get("idField", "seq_id")
    tokens_col = p.get("tokensField", "tokens")
    mask_col: str | None = p.get("maskField", "loss_mask")
    if mask_col == "none":
        mask_col = None
    assets_col: str | None = p.get("assetsField", "none")
    if assets_col == "none":
        assets_col = None
    dtype = p.get("dtype", "auto")
    if not path:
        collector.add_failure(
            "BinShardSink needs a 'path'.", property_name="path"
        )
        return df
    seqs_per_shard = None
    if "seqsPerShard" in p:
        seqs_per_shard = _int_prop(
            p, "seqsPerShard", 1, collector,
            substitutions=substitutions, phase=phase,
        )
        n_shards = 0
    else:
        if "nShards" not in p:
            collector.add_failure(
                "BinShardSink needs 'nShards' (or 'seqsPerShard' "
                "for range sharding).",
                property_name="nShards",
            )
            return df
        n_shards = _int_prop(
            p, "nShards", 1, collector,
            substitutions=substitutions, phase=phase,
        )
    ok = _require_field(df, id_col, collector, "idField")
    ok = _require_field(df, tokens_col, collector, "tokensField") and ok
    if mask_col is not None:
        ok = _require_field(df, mask_col, collector, "maskField") and ok
    if assets_col is not None:
        ok = _require_field(
            df, assets_col, collector, "assetsField"
        ) and ok
    if dtype not in ("auto", "uint16", "uint32"):
        collector.add_failure(
            f"Invalid dtype '{dtype}'.",
            "'auto', 'uint16' or 'uint32'.",
            property_name="dtype",
        )
        ok = False
    incremental = p.get("incremental", "false")
    if incremental not in ("true", "false"):
        collector.add_failure(
            f"Invalid incremental '{incremental}'.",
            "'true' or 'false'.",
            property_name="incremental",
        )
        ok = False
    if (seqs_per_shard is None and n_shards is None) or (
        "seqsPerShard" in p and seqs_per_shard is None
    ) or not ok:
        return df
    if phase == "run":
        path = substitute_macros(
            path, substitutions or {}, collector, "path"
        )
        if collector.failures:
            return df
        from topn_spark.operators.binshard import export_bin_shards

        export_bin_shards(
            df, path, n_shards, tokens_col=tokens_col,
            mask_col=mask_col, id_col=id_col, dtype=dtype,
            salt=p.get("salt", ""), assets_col=assets_col,
            incremental=incremental == "true",
            seqs_per_shard=seqs_per_shard,
        )
    return df


def _stage_validate_assets(
    spark, stage, inputs, collector, substitutions, phase
):
    """ValidateAssets batchjoiner: referential-integrity gate for
    multimodal asset references — every id in the FIRST input's
    ``refsField`` array must exist in the SECOND input's
    ``assetKey`` registry column (a dangling ref would splice a
    vision embedding from nothing, silently); appends ``n_missing``
    and ``assets_ok`` so a downstream Filter can gate BEFORE the
    binary export. Properties: refsField ('asset_ids'), assetKey
    ('asset_id'), idField (optional but RECOMMENDED: a stable
    unique row id like conv_id — the count re-join then keys on
    it). Scale shape: explode the refs (rows = image references,
    not tokens), one anti-join against the distinct registry key
    (broadcast-sized registries broadcast), one count re-agg
    joined back on the row id — the decontamination shape.

    Row-identity determinism: the two join branches re-evaluate
    the same plan, so the row id joining them back MUST be stable
    across re-evaluation — ``monotonically_increasing_id`` is NOT
    (shuffle-order nondeterminism or a task retry upstream can
    renumber rows between branches, silently attaching n_missing
    to the wrong rows and letting a dangling ref through the
    gate). With ``idField`` the join keys on the user's stable id;
    without one, the id-stamped frame is pinned with
    ``localCheckpoint`` (materialized once, both branches read the
    SAME numbering) before branching."""
    if len(inputs) != 2:
        raise ValueError(
            "ValidateAssets needs exactly 2 inputs "
            "(data, asset registry); got "
            f"{len(inputs)}"
        )
    df, registry = inputs
    p = stage.properties
    refs_col = p.get("refsField", "asset_ids")
    asset_key = p.get("assetKey", "asset_id")
    id_field = p.get("idField")
    ok = _require_field(df, refs_col, collector, "refsField")
    ok = _require_field(
        registry, asset_key, collector, "assetKey"
    ) and ok
    if id_field:
        ok = _require_field(df, id_field, collector, "idField") and ok
    if not ok:
        return df
    if id_field:
        base = df.withColumn("_vid", F.col(id_field))
    else:
        # lazy checkpoint: pins the numbering at first evaluation
        # (eager=True would run a job during deploy-time validation)
        base = df.withColumn(
            "_vid", F.monotonically_increasing_id()
        ).localCheckpoint(eager=(phase == "run"))
    refs = base.select(
        "_vid",
        F.explode(
            F.filter(
                F.coalesce(
                    F.col(refs_col),
                    F.array().cast(
                        df.schema[refs_col].dataType.simpleString()
                    ),
                ),
                lambda a: a.isNotNull(),
            )
        ).alias("_aid"),
    )
    reg = registry.select(
        F.col(asset_key).alias("_aid")
    ).distinct()
    missing = (
        refs.join(reg, "_aid", "left_anti")
        .groupBy("_vid")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_missing"))
    )
    return (
        base.join(missing, "_vid", "left")
        .withColumn(
            "n_missing",
            F.coalesce(
                F.col("n_missing"), F.lit(0).cast("bigint")
            ),
        )
        .withColumn("assets_ok", F.col("n_missing") == 0)
        .drop("_vid")
    )


def _stage_pack_multimodal(
    spark, stage, inputs, collector, substitutions, phase
):
    """PackMultimodal transform: mask- AND asset-binding-preserving
    sequence packing (pipeline.py::pack_multimodal_sequences) —
    every packed sequence carries the assets whose placeholders
    physically landed in it, in placeholder order. Properties:
    seqLen (required), idField ('conv_id'), tokensField ('tokens'),
    maskField ('loss_mask'), assetsField ('asset_ids'), imageToken
    ('<|image|>'), sepToken (optional), sepSupervised ('false')."""
    (df,) = inputs
    p = stage.properties
    if "seqLen" not in p:
        collector.add_failure(
            "PackMultimodal needs 'seqLen'.",
            property_name="seqLen",
        )
        return df
    seq_len = _int_prop(
        p, "seqLen", 1, collector,
        substitutions=substitutions, phase=phase,
    )
    id_col = p.get("idField", "conv_id")
    tokens_col = p.get("tokensField", "tokens")
    mask_col = p.get("maskField", "loss_mask")
    assets_col = p.get("assetsField", "asset_ids")
    ok = _require_field(df, id_col, collector, "idField")
    for f, n in (
        (tokens_col, "tokensField"),
        (mask_col, "maskField"),
        (assets_col, "assetsField"),
    ):
        ok = _require_field(df, f, collector, n) and ok
    if seq_len is None or not ok:
        return df
    from topn_spark.operators.pipeline import (
        pack_multimodal_sequences,
    )

    return pack_multimodal_sequences(
        df,
        tokens_col=tokens_col,
        mask_col=mask_col,
        assets_col=assets_col,
        id_col=id_col,
        seq_len=seq_len,
        order_col=id_col,
        image_token=p.get("imageToken", "<|image|>"),
        sep_token=p.get("sepToken"),
        sep_supervised=p.get("sepSupervised", "false") == "true",
    )


def _stage_bin_export_sink(
    spark, stage, inputs, collector, substitutions, phase
):
    """BinExportSink batchsink: batch-proportional MAINTENANCE of a
    trainer binary shard set (streaming/ingest.py::
    bin_export_batch) — the spec-addressable form of the streaming
    maintenance path: under ``run_streaming_pipeline`` every
    micro-batch replays this stage with ``${batchId}`` bound to the
    Structured Streaming batch id, so the batch lands in the
    shard-partitioned corpus store and the shard set re-exports by
    signature fold + partition-pruned rewrite (a plain BinShardSink
    in a streaming spec would OVERWRITE the set with each batch's
    rows — the wrong semantics for accumulation). Also usable from
    batch specs for scheduled append jobs by passing batchId
    explicitly. Properties: corpusPath (required — the
    shard-partitioned parquet store), path (required — the binary
    shard set), nShards OR seqsPerShard (range sharding — the flat
    per-commit scheme for streaming ids), batchId ('${batchId}'
    under streaming; an integer >= 0), idField ('seq_id'),
    tokensField ('tokens'), maskField ('loss_mask'; 'none'),
    assetsField ('none'), dtype ('auto'), salt (''), epochs
    (optional comma-separated epoch numbers to re-derive after
    content-changing commits), epochSalt ('')."""
    (df,) = inputs
    p = stage.properties
    corpus_path = p.get("corpusPath")
    path = p.get("path")
    id_col = p.get("idField", "seq_id")
    tokens_col = p.get("tokensField", "tokens")
    mask_col: str | None = p.get("maskField", "loss_mask")
    if mask_col == "none":
        mask_col = None
    assets_col: str | None = p.get("assetsField", "none")
    if assets_col == "none":
        assets_col = None
    dtype = p.get("dtype", "auto")
    ok = True
    if not corpus_path:
        collector.add_failure(
            "BinExportSink needs a 'corpusPath'.",
            property_name="corpusPath",
        )
        ok = False
    if not path:
        collector.add_failure(
            "BinExportSink needs a 'path'.", property_name="path"
        )
        ok = False
    seqs_per_shard = None
    if "seqsPerShard" in p:
        seqs_per_shard = _int_prop(
            p, "seqsPerShard", 1, collector,
            substitutions=substitutions, phase=phase,
        )
        n_shards = 0
    else:
        if "nShards" not in p:
            collector.add_failure(
                "BinExportSink needs 'nShards' (or 'seqsPerShard' "
                "for range sharding).",
                property_name="nShards",
            )
            return df
        n_shards = _int_prop(
            p, "nShards", 1, collector,
            substitutions=substitutions, phase=phase,
        )
    batch_id = _int_prop(
        p, "batchId", 0, collector, lo=0,
        substitutions=substitutions, phase=phase,
    )
    epochs_raw = p.get("epochs", "")
    epochs: tuple[int, ...] = ()
    if epochs_raw:
        try:
            epochs = tuple(
                int(x) for x in str(epochs_raw).split(",")
            )
        except ValueError:
            collector.add_failure(
                f"Invalid epochs '{epochs_raw}'.",
                "Comma-separated integers.",
                property_name="epochs",
            )
            ok = False
    ok = _require_field(df, id_col, collector, "idField") and ok
    ok = _require_field(df, tokens_col, collector, "tokensField") and ok
    if mask_col is not None:
        ok = _require_field(df, mask_col, collector, "maskField") and ok
    if assets_col is not None:
        ok = _require_field(
            df, assets_col, collector, "assetsField"
        ) and ok
    if dtype not in ("auto", "uint16", "uint32"):
        collector.add_failure(
            f"Invalid dtype '{dtype}'.",
            "'auto', 'uint16' or 'uint32'.",
            property_name="dtype",
        )
        ok = False
    if (
        (seqs_per_shard is None and n_shards is None)
        or ("seqsPerShard" in p and seqs_per_shard is None)
        or batch_id is None
        or not ok
    ):
        return df
    if phase == "run":
        mc = FailureCollector()
        corpus_path = substitute_macros(
            corpus_path, substitutions or {}, mc, "corpusPath"
        )
        path = substitute_macros(path, substitutions or {}, mc, "path")
        mc.get_or_throw()
        from topn_spark.streaming.ingest import bin_export_batch

        bin_export_batch(
            df, corpus_path, path, batch_id, n_shards,
            tokens_col=tokens_col, mask_col=mask_col,
            id_col=id_col, dtype=dtype, salt=p.get("salt", ""),
            assets_col=assets_col, epochs=epochs,
            epoch_salt=p.get("epochSalt", ""),
            seqs_per_shard=seqs_per_shard,
        )
    return df


def _stage_preference_bin_shard_sink(
    spark, stage, inputs, collector, substitutions, phase
):
    """PreferenceBinShardSink batchsink: paired chosen/rejected
    binary export (binshard.py::export_preference_shards) — each
    pair lands as adjacent even/odd sequences of one shard, the
    DPO-trainer shape. Properties: path (required), nShards
    (required), pairIdField ('pair_id'), chosenTokensField
    ('chosen_tokens'), rejectedTokensField ('rejected_tokens'),
    chosenMaskField / rejectedMaskField ('chosen_mask' /
    'rejected_mask'; BOTH 'none' exports mask-less), dtype
    ('auto'), salt (''), incremental ('false')."""
    (df,) = inputs
    p = stage.properties
    path = p.get("path")
    if not path:
        collector.add_failure(
            "PreferenceBinShardSink needs a 'path'.",
            property_name="path",
        )
        return df
    if "nShards" not in p:
        collector.add_failure(
            "PreferenceBinShardSink needs 'nShards'.",
            property_name="nShards",
        )
        return df
    n_shards = _int_prop(
        p, "nShards", 1, collector,
        substitutions=substitutions, phase=phase,
    )
    pair_col = p.get("pairIdField", "pair_id")
    ct = p.get("chosenTokensField", "chosen_tokens")
    rt = p.get("rejectedTokensField", "rejected_tokens")
    cm: str | None = p.get("chosenMaskField", "chosen_mask")
    rm: str | None = p.get("rejectedMaskField", "rejected_mask")
    if cm == "none":
        cm = None
    if rm == "none":
        rm = None
    if (cm is None) != (rm is None):
        collector.add_failure(
            "chosenMaskField/rejectedMaskField must both be set "
            "or both be 'none'.",
            property_name="chosenMaskField",
        )
        return df
    ok = _require_field(df, pair_col, collector, "pairIdField")
    ok = _require_field(df, ct, collector, "chosenTokensField") and ok
    ok = _require_field(
        df, rt, collector, "rejectedTokensField"
    ) and ok
    if cm is not None:
        ok = _require_field(
            df, cm, collector, "chosenMaskField"
        ) and ok
        ok = _require_field(
            df, rm, collector, "rejectedMaskField"
        ) and ok
    if n_shards is None or not ok:
        return df
    if phase == "run":
        path = substitute_macros(
            path, substitutions or {}, collector, "path"
        )
        if collector.failures:
            return df
        from topn_spark.operators.binshard import (
            export_preference_shards,
        )

        export_preference_shards(
            df, path, n_shards,
            pair_id_col=pair_col,
            chosen_tokens_col=ct,
            rejected_tokens_col=rt,
            chosen_mask_col=cm,
            rejected_mask_col=rm,
            dtype=p.get("dtype", "auto"),
            salt=p.get("salt", ""),
            incremental=p.get("incremental", "false") == "true",
        )
    return df


def _stage_tag_attributes(
    spark, stage, inputs, collector, substitutions, phase
):
    """TagAttributes transform: evaluate the doc-level tagger
    registry (attributes.py::tag_attributes) in one map-only scan
    and emit the SIDECAR rows (idField + one column per tagger) —
    route them to a FileSink beside the corpus, then re-mix with
    the Mixer stage as often as thresholds change. Properties:
    taggers (optional CSV of registry names; default = the full
    registry), idField ('doc_id'), textField ('text'). With a
    macro-deferred taggers list the deploy-time schema is
    unknowable, so the stage passes its input through at deploy and
    resolves at run."""
    from topn_spark.operators.attributes import (
        DOC_TAGGER_TYPES,
        DOC_TAGGERS,
        tag_attributes,
    )

    (df,) = inputs
    p = stage.properties
    taggers_raw = p.get("taggers")
    id_col = p.get("idField", "doc_id")
    text_col = p.get("textField", "text")
    if phase == "run":
        taggers_raw = substitute_macros(
            taggers_raw, substitutions or {}, collector, "taggers"
        )
    ok = _require_field(df, id_col, collector, "idField")
    ok = _require_field(df, text_col, collector, "textField") and ok
    names = None
    if taggers_raw and not contains_macro(taggers_raw):
        names = [t.strip() for t in taggers_raw.split(",") if t.strip()]
        unknown = [n for n in names if n not in DOC_TAGGERS]
        if unknown:
            collector.add_failure(
                f"Unknown tagger(s) {unknown}.",
                f"Registered: {list(DOC_TAGGERS)}.",
                property_name="taggers",
            )
            ok = False
        if not names:
            collector.add_failure(
                "taggers must name at least one tagger.",
                property_name="taggers",
            )
            ok = False
    if not ok:
        return df
    if phase == "deploy" and contains_macro(taggers_raw or ""):
        return df
    if phase == "deploy":
        out = df.select(id_col)
        for n in names or list(DOC_TAGGERS):
            out = out.withColumn(
                n, F.lit(None).cast(DOC_TAGGER_TYPES[n])
            )
        return out
    return tag_attributes(df, names, id_col=id_col, text_col=text_col)


def _stage_mixer(
    spark, stage, inputs, collector, substitutions, phase
):
    """Mixer transform: produce a corpus mix from declarative rules
    over a pre-computed attribute sidecar (attributes.py::
    apply_mixer — Dolma mixer semantics: keep iff some include
    AND-list matches and no exclude AND-list does, NULL attributes
    match nothing; then span_replacement splices). Properties:
    config (required JSON: {"include": [[[attr, op, value], ...],
    ...], "exclude": [...], "span_replacement": [{"span": ...,
    "replacement": ...}]}), attributesPath (required — the sidecar
    parquet written by TagAttributes + FileSink), idField
    ('doc_id'), textField ('text'). Output keeps the input schema
    (the filter deployment shape), so the macro-deferred deploy
    placeholder is the input itself."""
    import json

    from topn_spark.operators.attributes import apply_mixer, mixer_errors

    (df,) = inputs
    p = stage.properties
    config_raw = p.get("config")
    attrs_path = p.get("attributesPath")
    id_col = p.get("idField", "doc_id")
    text_col = p.get("textField", "text")
    if phase == "run":
        subs = substitutions or {}
        config_raw = substitute_macros(
            config_raw, subs, collector, "config"
        )
        attrs_path = substitute_macros(
            attrs_path, subs, collector, "attributesPath"
        )
    ok = _require_field(df, id_col, collector, "idField")
    for prop, val in (("config", config_raw),
                      ("attributesPath", attrs_path)):
        if not val:
            collector.add_failure(
                f"Required property '{prop}' is missing.",
                property_name=prop,
            )
            ok = False
    config = None
    if config_raw and not contains_macro(config_raw):
        try:
            config = json.loads(config_raw)
        except ValueError:
            collector.add_failure(
                f"config is not valid JSON: {config_raw[:80]!r}.",
                "The mixer rule object.",
                property_name="config",
            )
            ok = False
        if config is not None and not isinstance(config, dict):
            collector.add_failure(
                "config must be a JSON object.",
                property_name="config",
            )
            config, ok = None, False
    if not ok:
        return df
    if phase == "deploy" and (
        contains_macro(config_raw or "")
        or contains_macro(attrs_path or "")
    ):
        return df
    attrs = spark.read.parquet(attrs_path)
    if id_col not in attrs.columns:
        collector.add_failure(
            f"Attribute sidecar at '{attrs_path}' has no id field "
            f"'{id_col}'.",
            f"Fields: {attrs.columns}.",
            property_name="attributesPath",
        )
        return df
    errs = mixer_errors(config, attrs.columns)
    for rule in (config or {}).get("span_replacement", []) or []:
        if isinstance(rule, dict) and "span" in rule:
            if not _require_field(df, text_col, collector, "textField"):
                break
    if errs:
        for e in errs:
            collector.add_failure(
                f"Invalid mixer config: {e}.", property_name="config"
            )
        return df
    try:
        return apply_mixer(
            df, attrs, config, id_col=id_col, text_col=text_col
        )
    except ValueError as exc:  # column clash
        collector.add_failure(str(exc), property_name="config")
        return df


def _stage_conversation_qc(
    spark, stage, inputs, collector, substitutions, phase
):
    """ConversationQc transform: structural SFT-conversation gate
    (sft.conversation_qc — roles from the allowed set, system only
    first, strict user/assistant alternation, non-empty content,
    assistant-final; per-rule flags + first-failure qc_reason).
    Properties: messagesField ('messages'), allowedRoles (CSV,
    default 'system,user,assistant'), keepOnly ('false' — when
    'true', admit only qc_pass rows and emit the INPUT schema, the
    gate deployment shape)."""
    from topn_spark.operators.sft import conversation_qc

    (df,) = inputs
    p = stage.properties
    messages_col = p.get("messagesField", "messages")
    roles_raw = p.get("allowedRoles", "system,user,assistant")
    keep_only = p.get("keepOnly", "false")
    ok = _require_field(df, messages_col, collector, "messagesField")
    roles = tuple(
        r.strip() for r in roles_raw.split(",") if r.strip()
    )
    if not roles:
        collector.add_failure(
            "allowedRoles must name at least one role.",
            property_name="allowedRoles",
        )
        ok = False
    if keep_only not in ("true", "false"):
        collector.add_failure(
            f"Invalid keepOnly '{keep_only}'.",
            "'true' or 'false'.",
            property_name="keepOnly",
        )
        ok = False
    if not ok:
        return df
    out = conversation_qc(df, messages_col, allowed_roles=roles)
    if keep_only == "true":
        return out.where(F.col("qc_pass")).select(*df.columns)
    return out


def _stage_render_chat(
    spark, stage, inputs, collector, substitutions, phase
):
    """RenderChat transform: flatten message arrays to training text
    under a named chat template (sft.render_chat — 'chatml' or
    'plain'). Properties: messagesField ('messages'), template
    ('chatml'), outField ('text')."""
    from topn_spark.operators.sft import CHAT_TEMPLATES, render_chat

    (df,) = inputs
    p = stage.properties
    messages_col = p.get("messagesField", "messages")
    template = p.get("template", "chatml")
    out_col = p.get("outField", "text")
    ok = _require_field(df, messages_col, collector, "messagesField")
    if template not in CHAT_TEMPLATES:
        collector.add_failure(
            f"Unknown template '{template}'.",
            f"One of {list(CHAT_TEMPLATES)}.",
            property_name="template",
        )
        ok = False
    if not ok:
        return df
    return render_chat(
        df, messages_col, template=template, out_col=out_col
    )


def _stage_fim(
    spark, stage, inputs, collector, substitutions, phase
):
    """FimTransform transform: deterministic fill-in-the-middle
    (pipeline.py::fim_transform — Bavarian et al. 2022 PSM/SPM with
    md5-derived gates and cut points). Properties: textField
    ('text'), idField ('doc_id'), rate ('0.5'), spmRate ('0.5'),
    prefixToken/middleToken/suffixToken (the sentinels), outField
    (defaults to textField), salt ('')."""
    (df,) = inputs
    p = stage.properties
    text_col = p.get("textField", "text")
    id_col = p.get("idField", "doc_id")
    ok = _require_field(df, text_col, collector, "textField")
    ok = _require_field(df, id_col, collector, "idField") and ok
    rates = {}
    for prop, default in (("rate", 0.5), ("spmRate", 0.5)):
        raw = p.get(prop, str(default))
        if phase == "run":
            raw = substitute_macros(
                raw, substitutions or {}, collector, prop
            )
        if contains_macro(str(raw)):
            rates[prop] = default
            continue
        try:
            v = float(raw)
        except (TypeError, ValueError):
            v = None
        if v is None or not 0.0 <= v <= 1.0:
            collector.add_failure(
                f"Invalid {prop} '{raw}'.",
                "A fraction in [0, 1].",
                property_name=prop,
            )
            ok = False
        else:
            rates[prop] = v
    if not ok:
        return df
    from topn_spark.operators.pipeline import fim_transform

    return fim_transform(
        df, text_col=text_col, id_col=id_col,
        rate=rates["rate"], spm_rate=rates["spmRate"],
        prefix_token=p.get("prefixToken", "<fim_prefix>"),
        middle_token=p.get("middleToken", "<fim_middle>"),
        suffix_token=p.get("suffixToken", "<fim_suffix>"),
        out_col=p.get("outField"), salt=p.get("salt", ""),
    )


def _stage_token_windows(
    spark, stage, inputs, collector, substitutions, phase
):
    """TokenWindows transform: token-level sliding windows for
    long-document chunking (pipeline.py::token_windows — overlapping
    stride windows, clipped tails, one row per window). Properties:
    tokensField ('tokens'), idField ('doc_id'), window ('2048'),
    stride ('1024' — must be in [1, window])."""
    (df,) = inputs
    p = stage.properties
    tokens_col = p.get("tokensField", "tokens")
    id_col = p.get("idField", "doc_id")
    window = _int_prop(
        p, "window", 2048, collector, lo=1,
        substitutions=substitutions, phase=phase,
    )
    stride = _int_prop(
        p, "stride", 1024, collector, lo=1,
        substitutions=substitutions, phase=phase,
    )
    ok = _require_field(df, tokens_col, collector, "tokensField")
    ok = _require_field(df, id_col, collector, "idField") and ok
    if window is not None and stride is not None and stride > window:
        collector.add_failure(
            f"stride ({stride}) exceeds window ({window}).",
            "Use stride <= window.",
            property_name="stride",
        )
        ok = False
    if window is None or stride is None or not ok:
        return df
    from topn_spark.operators.pipeline import token_windows

    return token_windows(
        df, tokens_col=tokens_col, id_col=id_col,
        window=window, stride=stride,
    )


def _stage_loss_mask(
    spark, stage, inputs, collector, substitutions, phase
):
    """LossMask transform: the SFT render->supervise step in one
    stage — render the conversation under the template, derive the
    assistant-content char spans (sft.loss_spans), convert them to a
    whitespace-token supervise mask (sft.token_loss_mask), and emit
    PACKABLE columns: ``outField`` (rendered text), ``tokens``
    (array<string> — plain tokens, offsets dropped), ``loss_mask``
    (aligned booleans) and ``n_supervised``. Feed the output to
    PackMasked so the mask survives packing. Properties:
    messagesField ('messages'), template ('chatml'), lossRole
    ('assistant'), outField ('text')."""
    from topn_spark.operators.sft import (
        CHAT_TEMPLATES,
        loss_spans,
        token_loss_mask,
    )

    (df,) = inputs
    p = stage.properties
    messages_col = p.get("messagesField", "messages")
    template = p.get("template", "chatml")
    loss_role = p.get("lossRole", "assistant")
    out_col = p.get("outField", "text")
    ok = _require_field(df, messages_col, collector, "messagesField")
    if template not in CHAT_TEMPLATES:
        collector.add_failure(
            f"Unknown template '{template}'.",
            f"One of {list(CHAT_TEMPLATES)}.",
            property_name="template",
        )
        ok = False
    if not ok:
        return df
    spanned = loss_spans(
        df, messages_col, template=template, loss_role=loss_role,
        text_col=out_col,
    )
    masked = token_loss_mask(spanned, text_col=out_col)
    return masked.withColumn(
        "tokens", F.transform("tokens", lambda t: t["tok"])
    )


def _stage_pack_masked(
    spark, stage, inputs, collector, substitutions, phase
):
    """PackMasked transform: mask-preserving sequence packing
    (pipeline.py::pack_masked_sequences) — concat-and-chunk packing
    where every packed sequence carries an ALIGNED per-token loss
    mask plus n_supervised, so SFT shards stay trainable. NULL or
    misaligned masks fail at execution with the document id.
    Properties: tokensField ('tokens'), maskField ('loss_mask'),
    idField ('doc_id'), seqLen ('2048'), orderField (defaults to
    idField), byFields (comma list — ALWAYS set at scale), padToken
    (pad positions are never supervised), sepToken, sepSupervised
    ('false' — 'true' when the EOS after an assistant turn should be
    learned)."""
    (df,) = inputs
    p = stage.properties
    tokens_col = p.get("tokensField", "tokens")
    mask_col = p.get("maskField", "loss_mask")
    id_col = p.get("idField", "doc_id")
    order_col = p.get("orderField", id_col)
    by = tuple(
        c.strip() for c in p.get("byFields", "").split(",") if c.strip()
    )
    seq_len = _int_prop(
        p, "seqLen", 2048, collector,
        substitutions=substitutions, phase=phase,
    )
    sep_sup = p.get("sepSupervised", "false").lower()
    ok = _require_field(df, tokens_col, collector, "tokensField")
    ok = _require_field(df, mask_col, collector, "maskField") and ok
    ok = _require_field(df, id_col, collector, "idField") and ok
    ok = _require_field(df, order_col, collector, "orderField") and ok
    for c in by:
        ok = _require_field(df, c, collector, "byFields") and ok
    if sep_sup not in ("true", "false"):
        collector.add_failure(
            f"Invalid sepSupervised '{p.get('sepSupervised')}'.",
            "'true' or 'false'.",
            property_name="sepSupervised",
        )
        ok = False
    if seq_len is None or not ok:
        return df
    from topn_spark.operators.pipeline import pack_masked_sequences

    return pack_masked_sequences(
        df, tokens_col=tokens_col, mask_col=mask_col, id_col=id_col,
        seq_len=seq_len, by=by, order_col=order_col,
        pad_token=p.get("padToken"), sep_token=p.get("sepToken"),
        sep_supervised=sep_sup == "true",
    )


def _stage_bpe_loss_mask(
    spark, stage, inputs, collector, substitutions, phase
):
    """BpeLossMask transform: expand the whitespace-token supervise
    mask to trained-tokenizer subtokens (sft.bpe_loss_mask — the
    same merge walk as Tokenize's mergesPath path, so SFT and
    pretraining token counts reconcile). Run it between LossMask and
    PackMasked when the trainer consumes BPE ids. Properties:
    mergesPath (required — a save_bpe_merges artifact), idField
    ('conv_id'), tokensField ('tokens'), maskField ('loss_mask'),
    mode ('byte' | 'char')."""
    (df,) = inputs
    p = stage.properties
    merges_path = p.get("mergesPath")
    id_col = p.get("idField", "conv_id")
    tokens_col = p.get("tokensField", "tokens")
    mask_col = p.get("maskField", "loss_mask")
    mode = p.get("mode", "byte")
    ok = _require_field(df, id_col, collector, "idField")
    ok = _require_field(df, tokens_col, collector, "tokensField") and ok
    ok = _require_field(df, mask_col, collector, "maskField") and ok
    if not merges_path:
        collector.add_failure(
            "Required property 'mergesPath' is missing.",
            "Point it at a save_bpe_merges artifact.",
            property_name="mergesPath",
        )
        ok = False
    if mode not in ("byte", "char"):
        collector.add_failure(
            f"Invalid mode '{mode}'.", "'byte' or 'char'.",
            property_name="mode",
        )
        ok = False
    if phase == "run" and merges_path:
        merges_path = substitute_macros(
            merges_path, substitutions or {}, collector, "mergesPath"
        )
    if not ok:
        return df
    if phase == "deploy" and contains_macro(merges_path):
        return df
    from topn_spark.operators.sft import bpe_loss_mask
    from topn_spark.operators.textstats import load_bpe_merges

    merges = load_bpe_merges(spark, merges_path)
    return bpe_loss_mask(
        df, merges, id_col=id_col, tokens_col=tokens_col,
        mask_col=mask_col, mode=mode,
    )


def _stage_redact_conversation(
    spark, stage, inputs, collector, substitutions, phase
):
    """RedactConversation transform: in-place per-turn PII redaction
    for SFT message arrays (sft.redact_conversation — standard
    patterns/placeholders, per-class counts over the original
    turns). Properties: messagesField ('messages')."""
    from topn_spark.operators.sft import redact_conversation

    (df,) = inputs
    p = stage.properties
    messages_col = p.get("messagesField", "messages")
    if not _require_field(df, messages_col, collector, "messagesField"):
        return df
    return redact_conversation(df, messages_col)


def _stage_preference_pairs(
    spark, stage, inputs, collector, substitutions, phase
):
    """PreferencePairs aggregator: DPO/RLHF reward-data construction
    (sft.preference_pairs — per prompt, chosen/rejected extremes with
    deterministic tiebreaks, positive-margin filter). Properties:
    promptField ('prompt_id'), scoreField ('score'), idField
    ('sample_id'), responseField ('response'), minGap ('0')."""
    from topn_spark.operators.sft import preference_pairs

    (df,) = inputs
    p = stage.properties
    prompt_col = p.get("promptField", "prompt_id")
    score_col = p.get("scoreField", "score")
    id_col = p.get("idField", "sample_id")
    response_col = p.get("responseField", "response")
    min_gap_raw = p.get("minGap", "0")
    ok = True
    for prop, col in (
        ("promptField", prompt_col), ("scoreField", score_col),
        ("idField", id_col), ("responseField", response_col),
    ):
        ok = _require_field(df, col, collector, prop) and ok
    if phase == "run":
        min_gap_raw = substitute_macros(
            min_gap_raw, substitutions or {}, collector, "minGap"
        )
    min_gap = 0.0
    if not contains_macro(min_gap_raw):
        try:
            min_gap = float(min_gap_raw)
            if min_gap < 0:
                raise ValueError
        except ValueError:
            collector.add_failure(
                f"Invalid minGap '{min_gap_raw}'.",
                "A number >= 0.",
                property_name="minGap",
            )
            ok = False
    if not ok:
        return df
    if phase == "deploy" and contains_macro(p.get("minGap", "0")):
        min_gap = 0.0
    return preference_pairs(
        df, prompt_col=prompt_col, score_col=score_col,
        id_col=id_col, response_col=response_col, min_gap=min_gap,
    )


def _stage_loss_spans(
    spark, stage, inputs, collector, substitutions, phase
):
    """LossSpans transform: render + assistant-content char spans for
    loss masking (sft.loss_spans — same template arithmetic as
    RenderChat, 0-based half-open offsets, loss_chars/total_chars).
    Properties: messagesField ('messages'), template ('chatml'),
    lossRole ('assistant')."""
    from topn_spark.operators.sft import CHAT_TEMPLATES, loss_spans

    (df,) = inputs
    p = stage.properties
    messages_col = p.get("messagesField", "messages")
    template = p.get("template", "chatml")
    loss_role = p.get("lossRole", "assistant")
    ok = _require_field(df, messages_col, collector, "messagesField")
    if template not in CHAT_TEMPLATES:
        collector.add_failure(
            f"Unknown template '{template}'.",
            f"One of: {', '.join(CHAT_TEMPLATES)}.",
            property_name="template",
        )
        ok = False
    if not ok:
        return df
    return loss_spans(
        df, messages_col, template=template, loss_role=loss_role
    )


def _stage_kto_labels(
    spark, stage, inputs, collector, substitutions, phase
):
    """KtoLabels transform: unpaired binary preference labels
    (sft.kto_labels — label = score >= fixed threshold or per-prompt
    mean of the validly-scored samples; NULL scores keep NULL labels,
    n_valid rides along). Properties: promptField ('prompt_id'),
    scoreField ('score'), threshold (optional number; macro-able —
    absent means the per-prompt mean reference point)."""
    from topn_spark.operators.sft import kto_labels

    (df,) = inputs
    p = stage.properties
    prompt_col = p.get("promptField", "prompt_id")
    score_col = p.get("scoreField", "score")
    thr_raw = p.get("threshold")
    ok = _require_field(df, prompt_col, collector, "promptField")
    ok = _require_field(df, score_col, collector, "scoreField") and ok
    if thr_raw is not None and phase == "run":
        thr_raw = substitute_macros(
            thr_raw, substitutions or {}, collector, "threshold"
        )
    threshold = None
    if thr_raw is not None and not contains_macro(thr_raw):
        try:
            threshold = float(thr_raw)
        except ValueError:
            collector.add_failure(
                f"Invalid threshold '{thr_raw}'.",
                "A number, or omit for the per-prompt mean.",
                property_name="threshold",
            )
            ok = False
    if not ok:
        return df
    return kto_labels(
        df, prompt_col=prompt_col, score_col=score_col,
        threshold=threshold,
    )


def _stage_epoch_shuffle(
    spark, stage, inputs, collector, substitutions, phase
):
    """EpochShuffle transform: deterministic between-epoch reshuffle
    (pipeline.epoch_shuffle — epoch-salted md5 key, mod-n_shards
    assignment, exact per-shard positions). Properties: epoch
    (required int, macro-able), numShards (required int >= 1,
    macro-able), idField ('doc_id')."""
    from topn_spark.operators.pipeline import epoch_shuffle

    (df,) = inputs
    p = stage.properties
    id_col = p.get("idField", "doc_id")
    ok = _require_field(df, id_col, collector, "idField")
    vals = {}
    for prop, lo in (("epoch", 0), ("numShards", 1)):
        raw = p.get(prop)
        if raw is None:
            collector.add_failure(
                f"Required property '{prop}' is missing.",
                "Provide an integer.",
                property_name=prop,
            )
            ok = False
            continue
        if phase == "run":
            raw = substitute_macros(
                raw, substitutions or {}, collector, prop
            )
        if contains_macro(raw):
            vals[prop] = lo  # deferred; placeholder for deploy
            continue
        try:
            v = int(raw)
            if v < lo:
                raise ValueError
        except ValueError:
            collector.add_failure(
                f"Invalid {prop} '{raw}'.",
                f"An integer >= {lo}.",
                property_name=prop,
            )
            ok = False
            continue
        vals[prop] = v
    if not ok:
        return df
    return epoch_shuffle(
        df, epoch=vals["epoch"], n_shards=vals["numShards"],
        id_col=id_col,
    )


def _stage_truncate_conversation(
    spark, stage, inputs, collector, substitutions, phase
):
    """TruncateConversation transform: context-budget suffix
    truncation (sft.truncate_conversation — system pinned, longest
    fitting suffix of turns, over_budget observable). Properties:
    messagesField ('messages'), maxChars (required int >= 0,
    macro-able), keepSystem ('true')."""
    from topn_spark.operators.sft import truncate_conversation

    (df,) = inputs
    p = stage.properties
    messages_col = p.get("messagesField", "messages")
    keep_system = p.get("keepSystem", "true").lower() != "false"
    raw = p.get("maxChars")
    ok = _require_field(df, messages_col, collector, "messagesField")
    if raw is None:
        collector.add_failure(
            "Required property 'maxChars' is missing.",
            "Provide an integer >= 0.",
            property_name="maxChars",
        )
        return df
    if phase == "run":
        raw = substitute_macros(
            raw, substitutions or {}, collector, "maxChars"
        )
    max_chars = 0
    if not contains_macro(raw):
        try:
            max_chars = int(raw)
            if max_chars < 0:
                raise ValueError
        except ValueError:
            collector.add_failure(
                f"Invalid maxChars '{raw}'.",
                "An integer >= 0.",
                property_name="maxChars",
            )
            ok = False
    if not ok:
        return df
    return truncate_conversation(
        df,
        messages_col=messages_col,
        max_chars=max_chars,
        keep_system=keep_system,
    )


def _stage_json_output_qc(
    spark, stage, inputs, collector, substitutions, phase
):
    """JsonOutputQc transform: structured-output validity gate
    (sft.json_output_qc — is_valid_json / is_object / missing_keys /
    qc_pass). Properties: field ('response'), requiredKeys
    (comma-separated, optional), keepOnly ('false' — drop failing
    rows when 'true')."""
    from topn_spark.operators.sft import json_output_qc

    (df,) = inputs
    p = stage.properties
    col = p.get("field", "response")
    keys = tuple(
        k.strip()
        for k in p.get("requiredKeys", "").split(",")
        if k.strip()
    )
    keep_only = p.get("keepOnly", "false").lower() == "true"
    if not _require_field(df, col, collector, "field"):
        return df
    out = json_output_qc(df, col=col, required_keys=keys)
    if keep_only:
        out = out.where(F.col("qc_pass")).drop(
            "is_valid_json", "is_object", "missing_keys", "qc_pass"
        )
    return out


def _stage_canonical_url(
    spark, stage, inputs, collector, substitutions, phase
):
    """CanonicalUrl transform: URL canonicalization for web-corpus
    dedup (pipeline.canonical_url — lowercase scheme/host, strip
    fragment/default ports/tracking params, sort params, trim
    trailing slash). Properties: urlField ('url'), outField
    ('canonical_url')."""
    from topn_spark.operators.pipeline import canonical_url

    (df,) = inputs
    p = stage.properties
    url_col = p.get("urlField", "url")
    out_col = p.get("outField", "canonical_url")
    if not _require_field(df, url_col, collector, "urlField"):
        return df
    return canonical_url(df, url_col=url_col, out_col=out_col)


#: plugin registry: (expected stage type, handler)
PLUGINS: dict[str, tuple[str, Callable]] = {
    "File": ("batchsource", _stage_source),
    "SyntheticDocs": ("batchsource", _stage_source),
    "Projection": ("transform", _stage_projection),
    "Filter": ("transform", _stage_filter),
    "SQL": ("transform", _stage_sql),
    "Deduplicate": ("batchaggregator", _stage_dedup),
    "GroupByAggregate": ("batchaggregator", _stage_groupby),
    "TopN": ("batchaggregator", _stage_topn),
    "Joiner": ("batchjoiner", _stage_joiner),
    "Union": ("batchjoiner", _stage_union),
    "Window": ("transform", _stage_window),
    "HtmlExtract": ("transform", _stage_html_extract),
    "QualityScore": ("transform", _stage_quality_score),
    "ScriptProfile": ("transform", _stage_script_profile),
    "NormalizeUnicode": ("transform", _stage_normalize_unicode),
    "GopherRules": ("transform", _stage_gopher_rules),
    "GopherRepetition": ("transform", _stage_gopher_repetition),
    "C4LineFilter": ("transform", _stage_c4_line_filter),
    "PerplexityFilter": ("transform", _stage_perplexity_filter),
    "RoutedQuality": ("transform", _stage_routed_quality),
    "DsirWeights": ("transform", _stage_dsir_weights),
    "LangId": ("transform", _stage_langid),
    "Warc": ("batchsource", _stage_warc_source),
    "WarcParse": ("transform", _stage_warc_parse),
    "LeakageSafeSplit": ("transform", _stage_leakage_split),
    "UrlFilter": ("transform", _stage_url_filter),
    "NearDupCollapse": ("transform", _stage_neardup_collapse),
    "TokenBudgetMixture": ("transform", _stage_token_budget_mixture),
    "EpochMixture": ("transform", _stage_epoch_mixture),
    "Decontaminate": ("transform", _stage_decontaminate),
    "TagAttributes": ("transform", _stage_tag_attributes),
    "Mixer": ("transform", _stage_mixer),
    "ConversationQc": ("transform", _stage_conversation_qc),
    "RenderChat": ("transform", _stage_render_chat),
    "LossMask": ("transform", _stage_loss_mask),
    "PackMasked": ("transform", _stage_pack_masked),
    "FimTransform": ("transform", _stage_fim),
    "TokenWindows": ("transform", _stage_token_windows),
    "BpeLossMask": ("transform", _stage_bpe_loss_mask),
    "RedactConversation": ("transform", _stage_redact_conversation),
    "LossSpans": ("transform", _stage_loss_spans),
    "PreferencePairs": ("batchaggregator", _stage_preference_pairs),
    "WinRate": ("batchaggregator", _stage_winrate),
    "EloFit": ("batchaggregator", _stage_elo_fit),
    "KtoLabels": ("transform", _stage_kto_labels),
    "EpochShuffle": ("transform", _stage_epoch_shuffle),
    "TruncateConversation": ("transform", _stage_truncate_conversation),
    "JsonOutputQc": ("transform", _stage_json_output_qc),
    "CanonicalUrl": ("transform", _stage_canonical_url),
    "PiiRedact": ("transform", _stage_pii_redact),
    "QualityClassifier": ("transform", _stage_quality_classifier),
    "DedupAgainst": ("transform", _stage_dedup_against),
    "Tokenize": ("transform", _stage_tokenize),
    "PackSequences": ("transform", _stage_pack_sequences),
    "EncodeIds": ("transform", _stage_encode_ids),
    "FileSink": ("batchsink", _stage_sink),
    "ShardSink": ("batchsink", _stage_shard_sink),
    "BinShardSink": ("batchsink", _stage_bin_shard_sink),
    "BinExportSink": ("batchsink", _stage_bin_export_sink),
    "ValidateAssets": ("batchjoiner", _stage_validate_assets),
    "PackMultimodal": ("transform", _stage_pack_multimodal),
    "PreferenceBinShardSink": (
        "batchsink", _stage_preference_bin_shard_sink,
    ),
}

#: sink plugins double-book under the source name for CDAP parity
PLUGINS["File.sink"] = ("batchsink", _stage_sink)


def _topo_order(stages, connections, collector):
    names = {s.name for s in stages}
    indeg = {s.name: 0 for s in stages}
    adj: dict[str, list[str]] = {s.name: [] for s in stages}
    inputs: dict[str, list[str]] = {s.name: [] for s in stages}
    for c in connections:
        a, b = c["from"], c["to"]
        if a not in names or b not in names:
            collector.add_failure(
                f"Connection {a} -> {b} references an unknown stage."
            )
            continue
        adj[a].append(b)
        inputs[b].append(a)
        indeg[b] += 1
    order, queue = [], sorted(n for n, d in indeg.items() if d == 0)
    while queue:
        n = queue.pop(0)
        order.append(n)
        for m in adj[n]:
            indeg[m] -= 1
            if indeg[m] == 0:
                queue.append(m)
        queue.sort()
    if len(order) != len(stages):
        cyc = sorted(n for n, d in indeg.items() if d > 0)
        collector.add_failure(
            f"Pipeline DAG has a cycle involving {cyc}."
        )
    return order, inputs


def _execute(
    spark: SparkSession,
    spec: dict,
    substitutions: dict | None,
    phase: str,
) -> dict[str, DataFrame]:
    stages = [
        Stage(
            s["name"], s.get("type", ""), s["plugin"],
            s.get("properties", {}),
        )
        for s in spec.get("stages", [])
    ]
    top = FailureCollector()
    seen = set()
    for s in stages:
        if s.name in seen:
            top.add_failure(f"Duplicate stage name '{s.name}'.")
        seen.add(s.name)
        if s.plugin not in PLUGINS:
            top.add_failure(
                f"Stage '{s.name}': unknown plugin '{s.plugin}'.",
                f"One of {sorted(p for p in PLUGINS if '.' not in p)}.",
            )
        elif s.type and s.type != PLUGINS[s.plugin][0]:
            top.add_failure(
                f"Stage '{s.name}': plugin {s.plugin} is a "
                f"{PLUGINS[s.plugin][0]}, declared {s.type}."
            )
    order, inputs = _topo_order(
        stages, spec.get("connections", []), top
    )
    top.get_or_throw()

    by_name = {s.name: s for s in stages}
    outputs: dict[str, DataFrame] = {}
    failures = []
    for name in order:
        s = by_name[name]
        ins = [outputs[i] for i in inputs[name] if outputs.get(i) is not None]
        if len(ins) != len(inputs[name]):
            continue  # upstream already failed; don't cascade noise
        handler = PLUGINS[s.plugin][1]
        collector = FailureCollector()
        try:
            outputs[name] = handler(
                spark, s, ins, collector, substitutions, phase
            )
        except ValueError as e:  # arity errors etc.
            collector.add_failure(str(e))
            outputs[name] = None
        for fail in collector.failures:
            failures.append(
                type(fail)(
                    f"Stage '{name}': {fail.message}",
                    fail.corrective_action,
                    fail.property_name,
                )
            )
    if failures:
        raise ValidationError(failures)
    return outputs


def compile_pipeline(
    spark: SparkSession, spec: dict
) -> dict[str, DataFrame]:
    """Deploy-time pass: build every stage's DataFrame lazily and
    validate configs against real input schemas, skipping macro'd
    properties. Raises :class:`ValidationError` carrying ALL stages'
    failures. Returns stage-name → DataFrame (nothing executed, no
    sink written)."""
    return _execute(spark, spec, None, "deploy")


def run_pipeline(
    spark: SparkSession,
    spec: dict,
    substitutions: dict | None = None,
) -> dict[str, DataFrame]:
    """Run-time pass: substitute macros, re-validate the literal
    configs, execute sink writes. Returns stage-name → DataFrame so
    callers can also read results directly."""
    return _execute(spark, spec, substitutions, "run")


def run_pipeline_with_source(
    spark: SparkSession,
    spec: dict,
    source_name: str,
    df: DataFrame,
    substitutions: dict | None = None,
) -> dict[str, DataFrame]:
    """Run a spec with the named source stage's output REPLACED by
    ``df`` — the embedding/testing shape (drive a pipeline from an
    in-memory frame, a fixture, or another pipeline's output without
    a round-trip through storage). Identical run-phase semantics to
    :func:`run_pipeline`; sinks write in append mode (the injected
    frame is treated as one batch of a larger feed)."""
    return _run_with_source(
        spark, spec, source_name, df, substitutions
    )


def run_streaming_pipeline(
    spark: SparkSession,
    spec: dict,
    checkpoint_dir: str,
    substitutions: dict | None = None,
):
    """Streaming execution of a pipeline spec — the reference's OTHER
    registration (`cdap-data-streams`, pom.xml:39-42): CDAP runs the
    SAME plugins per micro-batch, so a streaming TopN is a per-batch
    top-N, exactly as here. The single ``batchsource`` stage becomes a
    file stream (``readStream`` on its path/format/schema); every
    micro-batch replays the REST of the DAG through the batch
    handlers via ``foreachBatch`` (one code path, zero re-implemented
    operators) and appends sink output.

    Requirements: exactly one source stage; at least one ``FileSink``
    (append target); ``schema`` on the source (streams cannot infer).
    Returns the started ``StreamingQuery`` (availableNow trigger —
    call repeatedly to drain a growing directory).
    """
    stages = spec.get("stages", [])
    sources = [
        s
        for s in stages
        if PLUGINS.get(s["plugin"], ("",))[0] == "batchsource"
    ]
    sinks = [
        s
        for s in stages
        if PLUGINS.get(s["plugin"], ("",))[0] == "batchsink"
    ]
    top = FailureCollector()
    if len(sources) != 1:
        top.add_failure(
            f"Streaming pipeline needs exactly 1 source, got {len(sources)}."
        )
    if not sinks:
        top.add_failure("Streaming pipeline needs a FileSink stage.")
    if sources and "schema" not in sources[0].get("properties", {}):
        top.add_failure(
            f"Stage '{sources[0]['name']}': streaming source needs an "
            "explicit 'schema' (streams cannot infer).",
            property_name="schema",
        )
    top.get_or_throw()
    src = sources[0]
    p = src["properties"]

    # deploy-time validation of the whole DAG on an empty batch frame
    # (schemas are what validation needs; rows are not)
    empty = spark.createDataFrame([], p["schema"])
    _validate_against(spark, spec, src["name"], empty)

    # @Macro lifecycle for the stream source, mirroring the batch
    # File stage: ${...} in path/format resolves from substitutions
    # before the stream starts (the schema must be literal — it was
    # already required explicit above)
    mc = FailureCollector()
    path = substitute_macros(
        p["path"], substitutions or {}, mc, "path"
    )
    fmt = substitute_macros(
        p.get("format", "parquet"), substitutions or {}, mc, "format"
    )
    mc.get_or_throw()

    reader = spark.readStream.schema(p["schema"]).format(fmt)
    if "maxFilesPerTrigger" in p:
        reader = reader.option(
            "maxFilesPerTrigger", p["maxFilesPerTrigger"]
        )
    stream = reader.load(path)

    def _process(batch_df: DataFrame, _bid: int) -> None:
        # bind the Structured Streaming batch id into the macro
        # namespace (reserved key ``batchId``) so maintenance sinks
        # like BinExportSink get the replay-stable id their
        # exactly-once contracts key on; a user-supplied batchId
        # substitution wins (documented escape hatch for tests)
        subs = dict(substitutions or {})
        subs.setdefault("batchId", str(int(_bid)))
        _run_with_source(
            spark, spec, src["name"], batch_df, subs,
            sink_mode="append",
        )

    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def _replace_source(spec: dict, source_name: str) -> dict:
    """Spec with the source stage swapped for a passthrough handled
    out-of-band (the caller injects the DataFrame)."""
    return {
        "stages": [
            s for s in spec.get("stages", []) if s["name"] != source_name
        ],
        "connections": spec.get("connections", []),
    }


def _run_with_source(
    spark, spec, source_name, df, substitutions, sink_mode="overwrite"
):
    sub = _replace_source(spec, source_name)
    # execute downstream stages with the injected frame as the
    # source's output; force sinks to append (micro-batch semantics)
    stages = [
        Stage(
            s["name"], s.get("type", ""), s["plugin"],
            dict(s.get("properties", {}), mode=sink_mode)
            if PLUGINS.get(s["plugin"], ("",))[0] == "batchsink"
            else s.get("properties", {}),
        )
        for s in sub["stages"]
    ]
    top = FailureCollector()
    order, inputs = _topo_order(
        stages + [Stage(source_name, "batchsource", "File")],
        sub["connections"],
        top,
    )
    top.get_or_throw()
    by_name = {s.name: s for s in stages}
    outputs: dict[str, DataFrame] = {source_name: df}
    failures = []
    for name in order:
        if name == source_name:
            continue
        s = by_name[name]
        ins = [outputs[i] for i in inputs[name] if outputs.get(i) is not None]
        if len(ins) != len(inputs[name]):
            continue
        collector = FailureCollector()
        outputs[name] = PLUGINS[s.plugin][1](
            spark, s, ins, collector, substitutions, "run"
        )
        for fail in collector.failures:
            failures.append(
                type(fail)(
                    f"Stage '{name}': {fail.message}",
                    fail.corrective_action,
                    fail.property_name,
                )
            )
    if failures:
        raise ValidationError(failures)
    return outputs


def _validate_against(spark, spec, source_name, df):
    """Deploy-phase DAG validation with an injected source frame."""
    sub = _replace_source(spec, source_name)
    stages = [
        Stage(
            s["name"], s.get("type", ""), s["plugin"],
            s.get("properties", {}),
        )
        for s in sub["stages"]
    ]
    top = FailureCollector()
    order, inputs = _topo_order(
        stages + [Stage(source_name, "batchsource", "File")],
        sub["connections"],
        top,
    )
    top.get_or_throw()
    by_name = {s.name: s for s in stages}
    outputs: dict[str, DataFrame] = {source_name: df}
    failures = []
    for name in order:
        if name == source_name:
            continue
        s = by_name[name]
        ins = [outputs[i] for i in inputs[name] if outputs.get(i) is not None]
        if len(ins) != len(inputs[name]):
            continue
        collector = FailureCollector()
        outputs[name] = PLUGINS[s.plugin][1](
            spark, s, ins, collector, None, "deploy"
        )
        for fail in collector.failures:
            failures.append(
                type(fail)(
                    f"Stage '{name}': {fail.message}",
                    fail.corrective_action,
                    fail.property_name,
                )
            )
    if failures:
        raise ValidationError(failures)

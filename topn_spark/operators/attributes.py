"""Attribute sidecars + mixer — the tag-then-mix corpus architecture.

Public-knowledge pattern (AllenAI Dolma toolkit, Soldaini et al. 2024,
arXiv:2402.00159; same shape in RedPajama-v2's "quality signals"
files): quality SIGNALS are computed ONCE into side-car files keyed by
document id ("taggers" → "attributes"), and corpus releases are then
produced by a cheap, declarative "mixer" that filters / rewrites
documents from rules over those attributes — without recomputing any
signal and, until the final join, without touching the text at all.
At 100 TB this split is the whole point: tagging is the expensive
full-text scan you run once per signal version; every subsequent mix
(new thresholds, an ablation, a filtered re-release) reads only the
narrow attribute columns its rules reference (parquet column pruning
does this for free) plus one id-equi join back to the text.

Three layers, all Catalyst:

- **Doc-level taggers** (:data:`DOC_TAGGERS`, :func:`tag_attributes`):
  a registry of named signal expressions (length, word stats, symbol
  ratios, stopword hits, line shapes — the Gopher/C4 signal family,
  see ``textstats.py``) evaluated in ONE map-only scan. Word/line
  arrays are bound as projected attributes before any lambda consumes
  them (the per-element re-evaluation trap — see
  ``ngrams_from_tokens``'s perf note). Output is the sidecar row:
  ``(id, <one column per tagger>)``.
- **Span taggers** (:func:`dup_paragraph_spans`): attributes that are
  CHARACTER RANGES, ``array<struct<begin,end>>`` per document —
  Dolma's span attributes. The shipped tagger marks every paragraph
  occurrence that is not the corpus-wide FIRST occurrence of its
  exact text (first = smallest ``(id, position)``, blank paragraphs
  never tagged) — the boilerplate-paragraph scrub (cookie banners,
  nav blocks) that document-level dedup cannot express. Shape: one
  paragraph explode, one md5-keyed hash agg for the first-occurrence
  map (map-side combinable ``min(struct(id,pos))`` — no giant sort
  partition under boilerplate skew), a join back, and a per-doc
  collect of bounded span lists.
- **Mixer** (:func:`apply_mixer`, :func:`replace_spans`): a JSON
  config ``{"include": [...], "exclude": [...],
  "span_replacement": [...]}``. ``include``/``exclude`` are OR-lists
  of AND-lists of ``[attribute, op, value]`` triples (ops ``== != <
  <= > >=``); a document is kept iff SOME include list matches (empty
  include ⇒ all) and NO exclude list matches, with NULL attribute
  comparisons matching nothing on either side. ``span_replacement``
  rules splice each span attribute out of the text (or replace it
  with a placeholder) via a sorted ``aggregate`` fold over substring
  slices — pure codegen'd expressions, no UDF.

Engine-exactness: counts are exact BIGINTs; every ratio is
``ROUND(x, 6)`` on a single IEEE division of exact counts (the
cross-engine float discipline used across ``textstats.py``); all
regexes avoid lookaround so the DuckDB/RE2 oracle runs them verbatim
(z60–z62).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

from topn_spark.operators.textstats import GOPHER_STOPWORDS

__all__ = [
    "DOC_TAGGERS",
    "doc_tagger_names",
    "tag_attributes",
    "tag_attributes_incremental",
    "dup_paragraph_spans",
    "replace_spans",
    "scrub_dup_paragraphs",
    "mixer_errors",
    "apply_mixer",
    "mixer_report",
    "MIXER_OPS",
]


# --------------------------------------------------------------------------
# Doc-level tagger registry
# --------------------------------------------------------------------------

#: Bound intermediate columns taggers may request: ``text`` (the raw
#: string), ``words`` (lowercased whitespace-run tokens), ``lines``
#: (non-blank lines). Each is projected ONCE per document before any
#: tagger lambda references it.
_NEEDS = ("text", "words", "lines")


def _ratio(num: Column, den: Column) -> Column:
    return F.round(num / F.nullif(den, F.lit(0.0)), 6)


def _n_words(b):
    return F.size(b["words"]).cast("bigint")


def _t_char_length(b):
    return F.length(b["text"]).cast("bigint")


def _t_line_count(b):
    return F.size(F.split(b["text"], "\n", -1)).cast("bigint")


def _t_word_count(b):
    return _n_words(b)


def _t_mean_word_len(b):
    nonspace = F.length(F.regexp_replace(b["text"], r"\s", "")).cast("double")
    return _ratio(nonspace, _n_words(b).cast("double"))


def _t_alpha_word_frac(b):
    alpha = F.size(
        F.filter(b["words"], lambda w: w.rlike(r"\p{L}"))
    ).cast("double")
    return _ratio(alpha, _n_words(b).cast("double"))


def _t_digit_char_frac(b):
    digits = F.size(
        F.regexp_extract_all(b["text"], F.lit("[0-9]"), F.lit(0))
    ).cast("double")
    return _ratio(digits, F.length(b["text"]).cast("double"))


def _t_hash_word_ratio(b):
    n_hash = F.size(
        F.regexp_extract_all(b["text"], F.lit("#"), F.lit(0))
    ).cast("double")
    return _ratio(n_hash, _n_words(b).cast("double"))


def _t_stop_hits(b):
    return F.size(
        F.array_intersect(
            F.array_distinct(b["words"]),
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
        )
    ).cast("bigint")


def _t_bullet_line_frac(b):
    n = F.size(
        F.filter(b["lines"], lambda l: F.trim(l).rlike("^[-*•‣▪]"))
    ).cast("double")
    return _ratio(n, F.size(b["lines"]).cast("double"))


def _t_ellipsis_line_frac(b):
    n = F.size(
        F.filter(b["lines"], lambda l: F.trim(l).rlike("(\\.\\.\\.|…)$"))
    ).cast("double")
    return _ratio(n, F.size(b["lines"]).cast("double"))


#: name -> (needs, builder(bound) -> Column). The registry is the
#: extension point: a new signal is one entry here, and every sidecar
#: writer / mixer config can reference it by name.
DOC_TAGGERS: dict[str, tuple[tuple[str, ...], object]] = {
    "char_length": (("text",), _t_char_length),
    "line_count": (("text",), _t_line_count),
    "word_count": (("words",), _t_word_count),
    "mean_word_len": (("text", "words"), _t_mean_word_len),
    "alpha_word_frac": (("words",), _t_alpha_word_frac),
    "digit_char_frac": (("text",), _t_digit_char_frac),
    "hash_word_ratio": (("text", "words"), _t_hash_word_ratio),
    "stop_hits": (("words",), _t_stop_hits),
    "bullet_line_frac": (("lines",), _t_bullet_line_frac),
    "ellipsis_line_frac": (("lines",), _t_ellipsis_line_frac),
}


#: Output Spark type per tagger (exact counts are BIGINT, every
#: ratio a ROUND(x, 6) DOUBLE) — lets spec compilers build
#: schema-faithful deploy placeholders without evaluating taggers.
DOC_TAGGER_TYPES: dict[str, str] = {
    "char_length": "bigint",
    "line_count": "bigint",
    "word_count": "bigint",
    "mean_word_len": "double",
    "alpha_word_frac": "double",
    "digit_char_frac": "double",
    "hash_word_ratio": "double",
    "stop_hits": "bigint",
    "bullet_line_frac": "double",
    "ellipsis_line_frac": "double",
}


def doc_tagger_names() -> tuple[str, ...]:
    """Registered doc-level tagger names, registry order."""
    return tuple(DOC_TAGGERS)


def tag_attributes(
    df: DataFrame,
    taggers: list[str] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Evaluate the named doc-level taggers in one map-only scan and
    return the attribute SIDECAR rows ``(id_col, <tagger columns>)``
    — write them beside the corpus keyed by id, re-read them for
    every subsequent mix. ``taggers=None`` runs the full registry.

    The word and line arrays are projected once (``_aw``/``_al``)
    before the tagger expressions reference them, so each split/regexp
    runs once per document no matter how many taggers consume it.
    """
    names = list(DOC_TAGGERS) if taggers is None else list(taggers)
    unknown = [n for n in names if n not in DOC_TAGGERS]
    if unknown:
        raise ValueError(
            f"Unknown tagger(s) {unknown}; registered: {list(DOC_TAGGERS)}"
        )
    if not names:
        raise ValueError("taggers must name at least one tagger")
    needs = {n for t in names for n in DOC_TAGGERS[t][0]}
    b = df.select(F.col(id_col), F.col(text_col).alias("_at"))
    bound: dict[str, Column] = {"text": F.col("_at")}
    if "words" in needs:
        b = b.withColumn(
            "_aw",
            F.regexp_extract_all(F.lower("_at"), F.lit(r"\S+"), F.lit(0)),
        )
        bound["words"] = F.col("_aw")
    if "lines" in needs:
        b = b.withColumn(
            "_al",
            F.filter(
                F.split(F.col("_at"), "\n", -1), lambda l: F.trim(l) != ""
            ),
        )
        bound["lines"] = F.col("_al")
    cols = [F.col(id_col)] + [
        DOC_TAGGERS[n][1](bound).alias(n) for n in names
    ]
    return b.select(*cols)


def tag_attributes_incremental(
    df: DataFrame,
    existing: DataFrame,
    taggers: list[str] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tag ONLY the documents missing from an existing sidecar and
    return the rows to APPEND — how a growing corpus keeps its
    attributes current without re-tagging history (Dolma re-tags new
    shards only; signals are deterministic, so old rows never go
    stale). The tagger set must match the existing sidecar's columns
    exactly — a drifted registry would silently fork signal versions,
    so it fails loudly instead; re-tag from scratch to change it.

    Shape: one id-equi LEFT ANTI join against the sidecar's id column
    (column pruning reads nothing else), then the usual one-scan
    tagging over the new rows only.
    """
    names = list(DOC_TAGGERS) if taggers is None else list(taggers)
    expected = {id_col, *names}
    if set(existing.columns) != expected:
        raise ValueError(
            f"existing sidecar columns {sorted(existing.columns)} do "
            f"not match the requested tagger set {sorted(expected)}; "
            "re-tag from scratch to change the signal version"
        )
    new = df.join(existing.select(id_col), id_col, "left_anti")
    return tag_attributes(new, names, id_col=id_col, text_col=text_col)


# --------------------------------------------------------------------------
# Span taggers + span replacement
# --------------------------------------------------------------------------

def dup_paragraph_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n\n",
    attr_col: str = "dup_paragraph_spans",
) -> DataFrame:
    """Span tagger: per document, the character ranges
    ``array<struct<begin,end>>`` (0-based, end-exclusive, sorted) of
    every paragraph occurrence that is NOT the corpus-wide first
    occurrence of its exact text — first = smallest ``(id, position)``
    pair, so the survivor set is order-free and partitioning-
    independent. Blank (whitespace-only) paragraphs are never tagged.
    Every input document gets a row (empty array when clean), so the
    sidecar left-joins losslessly.

    This is the FineWeb/Dolma paragraph-boilerplate scrub (cookie
    banners, nav blocks, share footers repeated across a crawl) that
    whole-document dedup cannot express and line-level dedup
    over-segments.

    Scale shape: one paragraph posexplode; offsets from a per-doc
    cumulative window (partition = document, bounded); the
    first-occurrence map is ``groupBy(md5(para)).agg(min(struct(id,
    pos)))`` — map-side combinable, so a boilerplate paragraph
    repeated a billion times costs one partial per task, never a
    giant sorted partition; join back on the md5 key; per-doc span
    lists collected (bounded by paragraphs-per-doc).
    """
    slen = len(sep)
    paras = df.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.col(text_col), re.escape(sep), -1)
        ).alias("_pos", "_para"),
    )
    w = F.coalesce(
        F.sum(F.length("_para").cast("bigint") + F.lit(slen)).over(
            Window.partitionBy(id_col)
            .orderBy("_pos")
            .rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0).cast("bigint"),
    )
    paras = paras.withColumn("_begin", w).withColumn(
        "_end", F.col("_begin") + F.length("_para").cast("bigint")
    )
    occ = paras.where(F.trim("_para") != "").withColumn(
        "_h", F.md5(F.col("_para"))
    )
    firsts = occ.groupBy("_h").agg(
        F.min(F.struct(F.col(id_col), F.col("_pos"))).alias("_first")
    )
    dups = occ.join(firsts, "_h").where(
        F.struct(F.col(id_col), F.col("_pos")) != F.col("_first")
    )
    spans = dups.groupBy(id_col).agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("_begin").alias("begin"),
                    F.col("_end").alias("end"),
                )
            )
        ).alias(attr_col)
    )
    empty = F.array().cast("array<struct<begin:bigint,end:bigint>>")
    return (
        df.select(id_col)
        .join(spans, id_col, "left")
        .select(
            id_col, F.coalesce(F.col(attr_col), empty).alias(attr_col)
        )
    )


def replace_spans(
    df: DataFrame,
    spans_col: str,
    text_col: str = "text",
    replacement: str = "",
    out_col: str | None = None,
) -> DataFrame:
    """Splice every ``[begin, end)`` span out of ``text_col``,
    inserting ``replacement`` in its place — the mixer's
    span-replacement primitive (Dolma ``span_replacement``; the same
    mechanism deletes boilerplate paragraphs or masks flagged ranges
    with a placeholder).

    Contract: spans are 0-based character offsets, end-exclusive,
    non-overlapping within ``[0, length]``; they are sorted here
    (``sort_array``) so callers may supply any order. NULL or empty
    span arrays leave the text unchanged.

    Pure Catalyst: the text and sorted spans are bound as projected
    attributes, then one ``aggregate`` fold walks the spans carrying
    ``(pos, acc)`` and concatenating the keep-slice before each span
    plus the replacement; the tail slice is appended by the finisher.
    Map-only, codegen'd, no UDF — at 100 TB this adds zero shuffle.
    """
    out_col = out_col or text_col
    b = df.withColumn("_rs_t", F.col(text_col).cast("string")).withColumn(
        "_rs_s", F.sort_array(F.col(spans_col))
    )
    init = F.struct(
        F.lit(0).cast("bigint").alias("pos"), F.lit("").alias("acc")
    )

    def step(a, s):
        keep = F.substring(
            F.col("_rs_t"),
            (a["pos"] + 1).cast("int"),
            (s["begin"] - a["pos"]).cast("int"),
        )
        return F.struct(
            s["end"].cast("bigint").alias("pos"),
            F.concat(a["acc"], keep, F.lit(replacement)).alias("acc"),
        )

    def fin(a):
        tail = F.substring(
            F.col("_rs_t"),
            (a["pos"] + 1).cast("int"),
            (F.length("_rs_t").cast("bigint") - a["pos"]).cast("int"),
        )
        return F.concat(a["acc"], tail)

    rebuilt = F.when(
        F.col(spans_col).isNull() | (F.size(spans_col) == 0),
        F.col("_rs_t"),
    ).otherwise(F.aggregate("_rs_s", init, step, fin))
    if out_col in df.columns:
        cols = [
            rebuilt.alias(c) if c == out_col else F.col(c)
            for c in df.columns
        ]
    else:
        cols = [F.col(c) for c in df.columns] + [rebuilt.alias(out_col)]
    return b.select(*cols)


def scrub_dup_paragraphs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n\n",
    replacement: str = "",
) -> DataFrame:
    """Tag + splice in one call: every non-first paragraph occurrence
    (see :func:`dup_paragraph_spans`) is replaced by ``replacement``
    (default: deleted, separators kept — the text around the scrub is
    byte-identical). Appends ``n_scrubbed`` (spans removed, BIGINT).
    """
    spans = dup_paragraph_spans(df, id_col, text_col, sep, "_spans")
    joined = df.join(spans, id_col)
    out = replace_spans(joined, "_spans", text_col, replacement)
    return out.withColumn(
        "n_scrubbed", F.size("_spans").cast("bigint")
    ).drop("_spans")


# --------------------------------------------------------------------------
# Mixer
# --------------------------------------------------------------------------

MIXER_OPS = ("==", "!=", "<", "<=", ">", ">=")


def mixer_errors(config: dict, attr_columns: list[str]) -> list[str]:
    """Validate a mixer config against the available attribute
    columns; returns human-readable problems (empty = valid). Shared
    by :func:`apply_mixer` (raises) and the ``Mixer`` pipeline stage
    (routes each message into the failure collector).
    """
    errs: list[str] = []
    if not isinstance(config, dict):
        return [f"config must be a dict, got {type(config).__name__}"]
    known = {"include", "exclude", "span_replacement"}
    for k in config:
        if k not in known:
            errs.append(f"unknown config key '{k}' (known: {sorted(known)})")
    for section in ("include", "exclude"):
        rules = config.get(section, [])
        if not isinstance(rules, list):
            errs.append(f"'{section}' must be a list of AND-lists")
            continue
        for i, clause in enumerate(rules):
            if not isinstance(clause, list) or not clause:
                errs.append(
                    f"{section}[{i}] must be a non-empty AND-list of "
                    "[attribute, op, value] triples"
                )
                continue
            for t in clause:
                if (
                    not isinstance(t, (list, tuple))
                    or len(t) != 3
                    or not isinstance(t[0], str)
                ):
                    errs.append(
                        f"{section}[{i}] has a malformed triple {t!r}"
                    )
                    continue
                attr, op, val = t
                if attr not in attr_columns:
                    errs.append(
                        f"{section}[{i}] references unknown attribute "
                        f"'{attr}' (have: {sorted(attr_columns)})"
                    )
                if op not in MIXER_OPS:
                    errs.append(
                        f"{section}[{i}] has invalid op '{op}' "
                        f"(valid: {list(MIXER_OPS)})"
                    )
                if val is None and op not in ("==", "!="):
                    errs.append(
                        f"{section}[{i}]: None only combines with "
                        "'==' (IS NULL) / '!=' (IS NOT NULL)"
                    )
    for i, rule in enumerate(config.get("span_replacement", []) or []):
        if not isinstance(rule, dict) or "span" not in rule:
            errs.append(
                f"span_replacement[{i}] must be a dict with a 'span' key"
            )
            continue
        if rule["span"] not in attr_columns:
            errs.append(
                f"span_replacement[{i}] references unknown span "
                f"attribute '{rule['span']}'"
            )
        extra = set(rule) - {"span", "replacement"}
        if extra:
            errs.append(
                f"span_replacement[{i}] has unknown keys {sorted(extra)}"
            )
    return errs


def _triple_col(attr: str, op: str, val) -> Column:
    c = F.col(attr)
    if val is None:
        return c.isNull() if op == "==" else c.isNotNull()
    v = F.lit(val)
    if op == "==":
        return c == v
    if op == "!=":
        return c != v
    if op == "<":
        return c < v
    if op == "<=":
        return c <= v
    if op == ">":
        return c > v
    return c >= v


def _clauses_col(rules: list) -> Column | None:
    """OR of AND-lists, each AND-list NULL-safe (NULL → no match)."""
    if not rules:
        return None
    ors = []
    for clause in rules:
        conj = None
        for attr, op, val in clause:
            t = _triple_col(attr, op, val)
            conj = t if conj is None else conj & t
        ors.append(F.coalesce(conj, F.lit(False)))
    out = ors[0]
    for o in ors[1:]:
        out = out | o
    return out


def apply_mixer(
    docs: DataFrame,
    attrs: DataFrame,
    config: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_attrs: bool = False,
) -> DataFrame:
    """Produce a corpus mix from rules over a pre-computed attribute
    sidecar — the Dolma mixer semantics:

    - keep a document iff SOME ``include`` AND-list is fully true
      (empty/absent ``include`` keeps everything) AND NO ``exclude``
      AND-list is fully true;
    - NULL attribute values (missing sidecar row, NULL signal) match
      NOTHING — they fail include clauses and never trigger exclude
      clauses;
    - then apply each ``span_replacement`` rule (``{"span": <span
      attribute>, "replacement": ""}``) to the text via
      :func:`replace_spans`.

    Plan: docs ⟕ attrs on the id (both corpus-sized — the natural
    bucketed/co-partitioned join; with the sidecar written
    ``bucketBy(id)`` next to a bucketed corpus this is shuffle-free),
    one filter over attribute columns only (Catalyst pushes it below
    the join's text side where legal), span splices map-only. The
    rules themselves are config-sized literals — nothing collects.
    """
    errs = mixer_errors(config, attrs.columns)
    if id_col not in docs.columns or id_col not in attrs.columns:
        errs.append(f"id column '{id_col}' must exist in docs and attrs")
    if errs:
        raise ValueError("invalid mixer config: " + "; ".join(errs))
    attr_cols = [c for c in attrs.columns if c != id_col]
    clash = [c for c in attr_cols if c in docs.columns]
    if clash:
        raise ValueError(
            f"attribute column(s) {clash} collide with corpus columns; "
            "rename the tagger outputs or drop the corpus columns"
        )
    j = docs.join(attrs, id_col, "left")
    inc = _clauses_col(config.get("include", []))
    exc = _clauses_col(config.get("exclude", []))
    if inc is not None:
        j = j.where(inc)
    if exc is not None:
        j = j.where(~exc)
    for rule in config.get("span_replacement", []) or []:
        j = replace_spans(
            j, rule["span"], text_col, rule.get("replacement", "")
        )
    if keep_attrs:
        return j
    return j.select(*docs.columns)


def mixer_report(
    docs: DataFrame,
    attrs: DataFrame,
    config: dict,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-rule accounting for a mixer config — the release data
    card's "why did documents drop" table (Dolma's mixer emits the
    same statistics): one row per rule with how many documents its
    AND-list matched, plus ``total`` and ``kept`` summary rows.
    ``(rule, n_docs)`` with rules named ``include[i]`` /
    ``exclude[i]`` in config order, NULL-safe exactly like
    :func:`apply_mixer` (a NULL attribute matches nothing), so
    ``kept`` here equals ``apply_mixer(...).count()``.

    One scan: every rule becomes a 0/1 projection over the id-equi
    joined frame, summed in a single hash agg to one model-sized
    row, then unpivoted to the report rows — no per-rule job, no
    data-sized anything.
    """
    errs = mixer_errors(config, attrs.columns)
    if id_col not in docs.columns or id_col not in attrs.columns:
        errs.append(f"id column '{id_col}' must exist in docs and attrs")
    if errs:
        raise ValueError("invalid mixer config: " + "; ".join(errs))
    j = docs.join(attrs, id_col, "left")
    flags: list[tuple[str, Column]] = []
    for section in ("include", "exclude"):
        for i, clause in enumerate(config.get(section, []) or []):
            flags.append(
                (f"{section}[{i}]", _clauses_col([clause]))
            )
    inc = _clauses_col(config.get("include", []))
    exc = _clauses_col(config.get("exclude", []))
    keep = F.lit(True) if inc is None else inc
    if exc is not None:
        keep = keep & ~exc
    flags.append(("kept", keep))
    aggs = [F.count(F.lit(1)).alias("total")] + [
        F.sum(c.cast("int")).cast("bigint").alias(f"_f{i}")
        for i, (_, c) in enumerate(flags)
    ]
    row = j.agg(*aggs)
    return (
        row.select(
            F.expr(
                f"stack({len(flags) + 1}, "
                + ", ".join(
                    f"'{n}', _f{i}" for i, (n, _) in enumerate(flags)
                )
                + ", 'total', total) as (rule, n_docs)"
            )
        )
        .orderBy("rule")
    )

"""Batch sources and sinks over Spark's DataSource V2 connectors.

Formats: parquet (primary — columnar, statistics, predicate pushdown),
orc (same class), csv/json (schema-on-read text; always pass an
explicit schema in production — inference scans the data twice and
types drift), xml (built into Spark ≥4.0; rowTag-delimited records),
text (one string column ``value`` per line — raw-corpus ingest), jdbc
(partitioned parallel reads via partitionColumn/lowerBound/upperBound/
numPartitions; proven against embedded Derby in test_sources). avro is
deliberately NOT listed: the spark-avro module is external to the
distribution and absent here — requesting it raises the explanatory
ValueError rather than Spark's generic lookup failure.

Scale notes:
- Write with ``partition_by`` on low-cardinality filter columns →
  partition pruning turns full scans into directory lookups
  (asserted in tests/test_sources.py).
- ``bucket_by`` on high-cardinality join/agg keys co-locates both
  sides of a join and removes the shuffle (requires saveAsTable —
  bucketing metadata lives in the catalog).
- Target 128 MB - 1 GB files; tiny-file explosions are the #1
  operational failure of 100 TB tables. Use ``coalesce_files`` to
  bound output file count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_READ_FORMATS = ("parquet", "orc", "csv", "json", "xml", "text", "jdbc")


def read(
    spark: SparkSession,
    path: str | None = None,
    fmt: str = "parquet",
    schema: T.StructType | str | None = None,
    **options,
) -> DataFrame:
    """Read a table. csv defaults: header=true; pass ``schema`` to
    avoid inference. jdbc: pass url/dbtable/driver (+ partitionColumn,
    lowerBound, upperBound, numPartitions for parallel reads) as
    options and no ``path``."""
    if fmt == "avro":
        raise ValueError(
            "avro needs the external spark-avro module, which is not in "
            "this distribution; use parquet/orc for columnar data"
        )
    if fmt not in _READ_FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {_READ_FORMATS}")
    reader = spark.read.format(fmt)
    if fmt == "csv":
        reader = reader.option("header", "true")
    if fmt == "xml" and "rowTag" not in options:
        reader = reader.option("rowTag", "row")
    for k, v in options.items():
        reader = reader.option(k, v)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path) if path is not None else reader.load()


def write(
    df: DataFrame,
    path: str | None = None,
    fmt: str = "parquet",
    mode: str = "error",
    partition_by: list[str] | None = None,
    bucket_by: tuple[int, list[str]] | None = None,
    table: str | None = None,
    coalesce_files: int | None = None,
    **options,
) -> None:
    """Write a table. ``bucket_by=(n, cols)`` requires ``table=``
    (bucketing metadata needs the catalog); otherwise writes to
    ``path``."""
    if fmt == "avro":
        raise ValueError(
            "avro needs the external spark-avro module, which is not in "
            "this distribution; use parquet/orc for columnar data"
        )
    if fmt not in _READ_FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {_READ_FORMATS}")
    if coalesce_files is not None:
        df = df.coalesce(coalesce_files)
    writer = df.write.format(fmt).mode(mode)
    if fmt == "csv":
        writer = writer.option("header", "true")
    if fmt == "xml" and "rowTag" not in options:
        writer = writer.option("rowTag", "row")
    for k, v in options.items():
        writer = writer.option(k, v)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if bucket_by is not None:
        n, cols = bucket_by
        if table is None:
            raise ValueError("bucket_by requires table= (saveAsTable)")
        writer.bucketBy(n, *cols).sortBy(*cols).saveAsTable(table)
        return
    if table is not None:
        writer.saveAsTable(table)
    else:
        writer.save(path)


def read_json_rescued(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    corrupt_col: str = "_corrupt_record",
    **options,
) -> DataFrame:
    """Schema-enforced JSON ingest that CAPTURES malformed rows
    instead of silently nulling (PERMISSIVE default) or dropping
    (DROPMALFORMED) them: rows that fail the schema land with their
    raw text in ``corrupt_col`` and every declared field NULL, so an
    ingest job can route them to a quarantine sink and alert on the
    corrupt fraction — at 100 TB "0.3% of the feed went bad at 2am"
    must be an observable event, not a silent row-count dip.

    The corrupt column is appended to the declared schema here (Spark
    only populates ``columnNameOfCorruptRecord`` if the read schema
    contains it). Spark caveat handled: a count()-style zero-column
    scan over only the corrupt column is disallowed, so callers
    filtering on it should select data fields too — the returned
    frame keeps all declared fields.
    """
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    full = T.StructType(
        list(schema.fields) + [T.StructField(corrupt_col, T.StringType())]
    )
    reader = (
        spark.read.format("json")
        .schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


#: Dolma document-format required fields (allenai/dolma data spec:
#: one JSON object per line, gzip members, ``id`` a STRING).
_DOLMA_FIELDS = ("id", "text", "source")


def write_dolma(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str | None = "source",
    default_source: str = "topn_spark",
    mode: str = "error",
    coalesce_files: int | None = None,
) -> None:
    """Export a corpus in the Dolma interchange format (the
    allenai/dolma data spec, the lingua franca of open pretraining
    releases): gzip'd JSON-lines with one document per line and the
    required ``id`` (string), ``text``, ``source`` fields. Every
    other input column rides along as an extra JSON field (the spec
    allows arbitrary metadata). ``source_col=None`` stamps
    ``default_source`` on every document.

    Scale: a map-only columnar→JSON projection; gzip is per-file, so
    bound file count with ``coalesce_files`` toward the spec's
    ~1 GB-per-shard convention."""
    from pyspark.sql import functions as F

    cols = [
        F.col(id_col).cast("string").alias("id"),
        F.col(text_col).alias("text"),
    ]
    if source_col is not None:
        cols.append(F.col(source_col).cast("string").alias("source"))
    else:
        cols.append(F.lit(default_source).alias("source"))
    taken = {id_col, text_col, source_col}
    extras = [c for c in df.columns if c not in taken]
    # a passthrough column literally named 'id'/'text'/'source'
    # (distinct from id_col/text_col/source_col) would ride into
    # extras and collide with the projected required field ->
    # duplicate JSON keys in the exported corpus. Loud, not silent.
    clash = [c for c in extras if c in _DOLMA_FIELDS]
    if clash:
        raise ValueError(
            f"column(s) {clash!r} collide with required Dolma "
            f"field(s): rename or drop them, or pass them as "
            f"id_col/text_col/source_col"
        )
    out = df.select(*cols, *extras)
    write(
        out, path, fmt="json", mode=mode,
        coalesce_files=coalesce_files, compression="gzip",
    )


def read_dolma(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
) -> DataFrame:
    """Ingest a Dolma-format corpus (gzip'd JSON-lines). Validates
    the spec's required fields are present and ``id`` reads as a
    string; pass ``schema`` to skip inference on large corpora (the
    spec's core: ``id string, text string, source string`` plus any
    metadata fields)."""
    df = read(spark, path, fmt="json", schema=schema)
    missing = [f for f in _DOLMA_FIELDS if f not in df.columns]
    if missing:
        raise ValueError(
            f"not a Dolma corpus: missing required field(s) {missing} "
            f"at {path!r} (have: {df.columns})"
        )
    if dict(df.dtypes)["id"] != "string":
        df = df.withColumn("id", df["id"].cast("string"))
    return df

"""Command-line entry point: ``python -m topn_spark <command>``.

The engine's operational surface for users who deploy specs rather
than write code (the reference's own audience):

- ``run-pipeline SPEC.json [--set name=value ...] [--show STAGE]`` —
  execute a JSON pipeline spec (see :mod:`topn_spark.pipelines`);
  ``--set`` provides macro substitutions, ``--show`` prints a stage's
  result to stdout instead of relying on a sink.
- ``validate-pipeline SPEC.json`` — deploy-time validation only:
  prints every collected failure across all stages, exit 1 on any.
- ``query NAME [--sf-dir DIR]`` — run a catalog query and print it.
- ``list-queries [PREFIX]`` — list catalog entries with their docs.
- ``verify-shards DIR [--token-field F]`` — recount an exported
  shard set against its stored ``_manifest`` (the torn-export
  audit); prints the per-shard verdict table, exit 1 on mismatch.
- ``verify-bin-shards DIR [--object-root ROOT]`` — byte-level verify
  of a trainer-native BINARY shard set (.bin/.idx/.msk/.ast vs the
  crc manifest), dispatching on the recorded layout: preference
  (pair) sets also re-check the even/odd pairing invariant.
  ``--object-root`` verifies a set written through the object-store
  backend (DIR is then the key prefix). Exit 1 on any bad shard.
- ``bin-data-card DIR [--object-root ROOT]`` — print the one-row
  release card of a binary shard set (layout-aware: preference sets
  include the per-stream chosen/rejected accounting).
"""

from __future__ import annotations

import argparse
import json
import sys


def _session():
    from topn_spark.session import get_session

    return get_session(app_name="topn_spark-cli")


def _cmd_run_pipeline(args) -> int:
    from topn_spark.pipelines import run_pipeline

    spec = json.load(open(args.spec))
    subs = dict(kv.split("=", 1) for kv in args.set or [])
    outputs = run_pipeline(_session(), spec, subs)
    if args.show:
        if args.show not in outputs:
            print(f"no stage named {args.show!r}", file=sys.stderr)
            return 2
        outputs[args.show].show(args.num_rows, truncate=False)
    else:
        for name, df in outputs.items():
            print(f"{name}: {len(df.columns)} columns")
    return 0


def _cmd_validate_pipeline(args) -> int:
    from topn_spark.errors import ValidationError
    from topn_spark.pipelines import compile_pipeline

    spec = json.load(open(args.spec))
    try:
        staged = compile_pipeline(_session(), spec)
    except ValidationError as e:
        for f in e.failures:
            print(f"FAIL: {f}")
        return 1
    print(f"OK: {len(staged)} stages validate")
    return 0


def _cmd_query(args) -> int:
    import topn_spark.queries_ext  # noqa: F401  (registration)
    from topn_spark.queries import QUERIES

    matches = [n for n in sorted(QUERIES) if n.startswith(args.name)]
    if len(matches) != 1:
        print(
            f"{args.name!r} matches {matches or 'nothing'}; need exactly one",
            file=sys.stderr,
        )
        return 2
    df = QUERIES[matches[0]].builder(_session(), args.sf_dir)
    df.show(args.num_rows, truncate=False)
    return 0


def _cmd_list_queries(args) -> int:
    import topn_spark.queries_ext  # noqa: F401
    from topn_spark.queries import QUERIES

    for name in sorted(QUERIES):
        if args.prefix and not name.startswith(args.prefix):
            continue
        q = QUERIES[name]
        kind = "sql-oracle" if q.oracle else (
            "tolerance" if q.tol_oracle is not None else "rows-only"
        )
        doc = (q.doc or "").split(";")[0][:88]
        print(f"{name:28s} [{kind}] {doc}")
    return 0


def _cmd_verify_shards(args) -> int:
    from topn_spark.operators.pipeline import verify_shards

    verdict = verify_shards(
        _session(), args.dir, token_col=args.token_field
    )
    rows = verdict.orderBy("shard").collect()
    for r in rows:
        print(r.asDict())
    bad = [r for r in rows if not r.ok]
    if not rows:
        print("no shards found", file=sys.stderr)
        return 1
    if bad:
        print(
            f"{len(bad)}/{len(rows)} shards FAILED verification",
            file=sys.stderr,
        )
        return 1
    print(f"all {len(rows)} shards verified")
    return 0


def _bin_store(args):
    if getattr(args, "object_root", None):
        from topn_spark.operators.binfs import ObjectStoreBinaryStore

        return ObjectStoreBinaryStore(args.object_root)
    return None  # LocalBinaryStore default inside the operators


def _cmd_verify_bin_shards(args) -> int:
    from topn_spark.operators.binshard import (
        _read_meta,
        verify_bin_shards,
        verify_preference_shards,
    )

    spark = _session()
    st = _bin_store(args)
    meta = _read_meta(spark, args.dir, st)
    layout = (meta or {}).get("layout") or "seq"
    verify = (
        verify_preference_shards if layout == "pair"
        else verify_bin_shards
    )
    rows = verify(spark, args.dir, store=st).orderBy(
        "shard"
    ).collect()
    show = [
        "shard", "n_seqs", "n_tokens", "bin_bytes", "bin_crc32",
        "ok",
    ] + (["pairing_ok"] if layout == "pair" else [])
    for r in rows:
        d = r.asDict()
        print({k: d[k] for k in show})
    if not rows:
        print("no shards found", file=sys.stderr)
        return 1
    bad = [r for r in rows if not r.ok]
    if bad:
        print(
            f"{len(bad)}/{len(rows)} shards FAILED verification "
            f"(layout={layout})",
            file=sys.stderr,
        )
        return 1
    print(f"all {len(rows)} shards verified (layout={layout})")
    return 0


def _cmd_bin_data_card(args) -> int:
    from topn_spark.operators.binshard import bin_shard_data_card

    [row] = bin_shard_data_card(
        _session(), args.dir, store=_bin_store(args)
    ).collect()
    for k, v in row.asDict().items():
        print(f"{k}: {v}")
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="topn_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    rp = sub.add_parser("run-pipeline", help="execute a JSON pipeline spec")
    rp.add_argument("spec")
    rp.add_argument("--set", action="append", metavar="NAME=VALUE")
    rp.add_argument("--show", metavar="STAGE")
    rp.add_argument("--num-rows", type=int, default=20)
    rp.set_defaults(fn=_cmd_run_pipeline)

    vp = sub.add_parser(
        "validate-pipeline", help="deploy-time validation only"
    )
    vp.add_argument("spec")
    vp.set_defaults(fn=_cmd_validate_pipeline)

    q = sub.add_parser("query", help="run a catalog query")
    q.add_argument("name")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    q.add_argument("--num-rows", type=int, default=20)
    q.set_defaults(fn=_cmd_query)

    lq = sub.add_parser("list-queries", help="list catalog entries")
    lq.add_argument("prefix", nargs="?", default="")
    lq.set_defaults(fn=_cmd_list_queries)

    vs = sub.add_parser(
        "verify-shards",
        help="recount an exported shard set against its _manifest",
    )
    vs.add_argument("dir")
    vs.add_argument("--token-field", default=None)
    vs.set_defaults(fn=_cmd_verify_shards)

    vb = sub.add_parser(
        "verify-bin-shards",
        help="byte-level verify of a trainer binary shard set "
        "(layout-aware: preference sets also check pairing)",
    )
    vb.add_argument("dir")
    vb.add_argument("--object-root", default=None)
    vb.set_defaults(fn=_cmd_verify_bin_shards)

    dc = sub.add_parser(
        "bin-data-card",
        help="print the one-row release card of a binary shard set",
    )
    dc.add_argument("dir")
    dc.add_argument("--object-root", default=None)
    dc.set_defaults(fn=_cmd_bin_data_card)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())

"""spark-submit entry point.

    spark-submit --master <cluster> --py-files canned_yaml_spark.zip \
        tools/submit_main.py \
        --spec specs/clips.spec.yaml --table /data/clips.parquet \
        --ref /data/clips_ref.parquet --dim codec_dim=/data/codec_dim.parquet \
        --out /data/validation_run

(spark-submit's primary resource must be a script file — see
tools/submit_main.py; tests/test_cli_submit.py drives this exact
invocation end-to-end with the package importable ONLY from the
--py-files zip, and asserts the submitted --master is respected.)

Exit code 0 iff no ERROR-severity violation (the reference's process
contract, /root/reference/canner/src/validate.cpp:12-26 /
canner.cc:1116).
"""

from __future__ import annotations

import argparse
import sys

from canned_yaml_spark import fixtures, job
from canned_yaml_spark.session import get_spark


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="canned-yaml-spark")
    ap.add_argument("--spec", help="YAML/JSON spec path")
    ap.add_argument("--table", required=True, help="clips parquet path")
    ap.add_argument("--infer", action="store_true",
                    help="profile --table and print a draft spec (YAML) "
                         "instead of validating — review, tighten, save, "
                         "then run with --spec")
    ap.add_argument("--ref", help="clips_ref parquet path (payload checks)")
    ap.add_argument("--dim", action="append", default=[],
                    help="name=path of a dimension table (repeatable)")
    ap.add_argument("--out", help="output dir (violations/verdicts/metrics/manifest)")
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--cores", type=int, default=None,
                    help="local[N] cores (ignored under a real cluster master)")
    args = ap.parse_args(argv)

    import os
    if not args.infer:
        if not args.spec:
            ap.error("--spec is required (or pass --infer to draft one)")
        if not os.path.exists(args.spec):
            ap.error(f"--spec: no such file: {args.spec}")
    for d in args.dim:
        if "=" not in d:
            ap.error(f"--dim expects name=path, got {d!r}")

    spark = get_spark("canned-yaml-spark", cores=args.cores)
    clips = spark.read.parquet(args.table)

    if args.infer:
        from canned_yaml_spark import infer
        print(infer.to_yaml(infer.infer_spec(clips)))
        return 0
    dims = {}
    for d in args.dim:
        name, path = d.split("=", 1)
        dims[name] = spark.read.parquet(path)
    clips_ref = spark.read.parquet(args.ref) if args.ref else None

    result = job.run(
        spark, args.spec, clips,
        dims=dims, clips_ref=clips_ref,
        expected_hist=fixtures.reference_hist_df(spark),
        ks_reference=fixtures.reference_dur_sample(),
        out_dir=args.out, resume=not args.no_resume)

    verd = result.verdicts.orderBy("part_id").collect()
    n_fail = sum(0 if r["pass"] else 1 for r in verd)
    print(f"partitions: {len(verd)}  failing: {n_fail}  ok: {result.ok}")
    if result.ok:
        print("Nice job!")   # validate.cpp:23 salute
    return 0 if result.ok else 1


if __name__ == "__main__":
    sys.exit(main())

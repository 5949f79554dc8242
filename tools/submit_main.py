"""spark-submit primary resource for the validation job.

spark-submit needs a script file (it cannot run `-m package.module`),
so this 3-liner is the launch contract from the north rule:

    spark-submit --master <cluster> \
        --py-files canned_yaml_spark.zip \
        tools/submit_main.py \
        --spec specs/clips.spec.yaml --table ... --ref ... \
        --dim codec_dim=... --out ...

The package itself ships ONLY through --py-files (build the zip with
`python -m zipfile -c canned_yaml_spark.zip canned_yaml_spark`);
tests/test_cli_submit.py proves this end-to-end from a directory where
the package is not otherwise importable. Exit code 0 iff no
ERROR-severity violation (reference process contract,
canner/src/validate.cpp:12-26).
"""
import sys

from canned_yaml_spark.cli import main

if __name__ == "__main__":
    sys.exit(main())

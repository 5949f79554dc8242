"""canned_yaml_spark — a PySpark-native schema + constraint validation engine.

A brand-new engine (NOT a port) with the capabilities of
SolidWallOfCode/canned-yaml: YAML/JSON schema specs are *compiled* —
not interpreted per row — into a tree of vectorized constraint
predicates (`pyspark.sql.Column` expressions) evaluated in a single
scan over a table of audio clip + transcript pairs, plus dataset-level
checks (uniqueness, referential integrity, column stats, distribution
drift) and Arrow-vectorized payload validation.

Where the reference generates specialized C++ from a spec
(/root/reference/canner/src/canner.cc:999-1103), this engine compiles
the spec on the Spark driver into Column expression trees and lets
Catalyst + Tungsten do the actual code generation.
"""

from canned_yaml_spark.checks import Check, CheckSuite, Severity
from canned_yaml_spark.compile import compile_spec
from canned_yaml_spark.errors import SpecError
from canned_yaml_spark.spec import load_spec

__all__ = [
    "Check",
    "CheckSuite",
    "Severity",
    "SpecError",
    "compile_spec",
    "load_spec",
]

__version__ = "0.1.0"

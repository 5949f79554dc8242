"""draft-07 `format` assertion profile — the last validation keyword.

draft-07 §7 makes `format` an annotation by default; implementations
MAY provide an opt-in assertion profile. This engine asserts formats
when the root spec sets ``x-assert-formats: true`` (otherwise the
keyword compiles to a located warning and no predicate — the
spec-default behavior). Unknown format names are ignored with a
warning, per §7.1 "SHOULD ignore".

Every format is defined ONCE here as an anchored regex plus (for a few
formats) an extra algebraic conjunct, and rendered in BOTH engines:

- Spark: ``format_ok_column`` builds a Column (``rlike`` + arithmetic)
  — stays inside whole-stage codegen, no UDF;
- DuckDB: ``format_ok_sql`` renders the *same* regex and arithmetic as
  an oracle SQL fragment (``regexp_matches``).

The regexes deliberately use only the Java-regex ∩ RE2 common subset —
character classes, alternation, bounded repetition, anchors; no
lookaround, no backreferences — so the two engines agree by
construction (pinned by tests/test_formats.py, which evaluates a
valid/invalid corpus in python-re, Spark, and DuckDB side by side).

Profiles (documented, pragmatic where the RFC grammar is not a regular
language):

- ``ipv4``    RFC 2673 dotted-quad, no leading zeros.
- ``ipv6``    RFC 4291 textual forms incl. `::` compression and
              embedded IPv4 (no zone index — that's RFC 6874 URIs).
- ``uuid``    RFC 4122 8-4-4-4-12 hex (any variant/version).
- ``date``    RFC 3339 full-date WITH calendar validity (month/day
              ranges, month lengths, proleptic-Gregorian leap years).
- ``time``    RFC 3339 full-time: 24h clock, optional fraction,
              Z or ±hh:mm offset; second 60 admitted (leap second).
- ``date-time`` RFC 3339 date-time = full-date "T" full-time, with
              the same calendar-validity conjunct on the date part.
- ``hostname`` RFC 1034 preferred syntax: 1-63 char LDH labels not
              starting/ending with '-', total length ≤ 253.
- ``email``   pragmatic profile: dot-atom-ish local part (≤ 64 chars,
              no quoted strings / comments) @ hostname with ≥ 1 dot.
- ``uri``     pragmatic absolute-URI profile: RFC 3986 scheme, then
              only RFC 3986 characters, with every '%' starting a
              valid two-hex-digit percent-encoding.
- ``json-pointer`` RFC 6901 (`~` only as ~0/~1).
- ``duration`` ISO 8601 / RFC 3339 appendix A: PnYnMnD T nHnMn.nS or
              PnW; at least one component (bare "P"/trailing "T"
              rejected).

`regex` is intentionally NOT in the registry: "is this a valid ECMA
regex" is not expressible as a data predicate — asserting it would
need a compile step per value. It falls through the unknown-format
warning like any other unsupported name.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------- rx
_OCT = "(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
RX_IPV4 = rf"^({_OCT}\.){{3}}{_OCT}$"

_H = "[0-9A-Fa-f]{1,4}"
_V4 = rf"({_OCT}\.){{3}}{_OCT}"
RX_IPV6 = ("^("
           f"({_H}:){{7}}{_H}"            # 8 hex groups
           f"|({_H}:){{1,7}}:"            # 1-7 groups then ::
           f"|({_H}:){{1,6}}:{_H}"        # groups :: group
           f"|({_H}:){{1,5}}(:{_H}){{1,2}}"
           f"|({_H}:){{1,4}}(:{_H}){{1,3}}"
           f"|({_H}:){{1,3}}(:{_H}){{1,4}}"
           f"|({_H}:){{1,2}}(:{_H}){{1,5}}"
           f"|{_H}:(:{_H}){{1,6}}"
           f"|:((:{_H}){{1,7}}|:)"        # ::... and ::
           f"|::(ffff(:0{{1,4}})?:)?{_V4}"  # v4-mapped/compatible
           f"|({_H}:){{1,4}}:{_V4}"       # hex groups :: v4 tail
           f"|({_H}:){{6}}{_V4}"          # full hex prefix + v4
           ")$")

RX_UUID = ("^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-"
           "[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$")

_DATE_BODY = "[0-9]{4}-(0[1-9]|1[0-2])-(0[1-9]|[12][0-9]|3[01])"
_TIME_BODY = ("([01][0-9]|2[0-3]):[0-5][0-9]:([0-5][0-9]|60)"
              "([.][0-9]+)?([Zz]|[+-]([01][0-9]|2[0-3]):[0-5][0-9])")
RX_DATE = f"^{_DATE_BODY}$"
RX_TIME = f"^{_TIME_BODY}$"
RX_DATETIME = f"^{_DATE_BODY}[Tt]{_TIME_BODY}$"

_LABEL = "[A-Za-z0-9]([A-Za-z0-9-]{0,61}[A-Za-z0-9])?"
RX_HOSTNAME = rf"^{_LABEL}(\.{_LABEL})*$"
RX_EMAIL = rf"^[A-Za-z0-9._%+-]{{1,64}}@{_LABEL}(\.{_LABEL})+$"

# RFC 3986 character repertoire: unreserved + gen-delims + sub-delims
# + '%'. '[' ']' escaped for Java-class compatibility; '-' last.
RX_URI = r"^[A-Za-z][A-Za-z0-9+.-]*:[A-Za-z0-9._~:/?#\[\]@!$&'()*+,;=%-]*$"
_RX_PCT = "%[0-9A-Fa-f]{2}"

RX_JSON_POINTER = "^(/([^/~]|~[01])*)*$"

RX_DURATION = ("^P([0-9]+W|([0-9]+Y)?([0-9]+M)?([0-9]+D)?"
               "(T([0-9]+H)?([0-9]+M)?([0-9]+([.][0-9]+)?S)?)?)$")

#: format name -> (anchored regex, extra-conjunct tag or None)
FORMATS: dict[str, tuple[str, str | None]] = {
    "ipv4": (RX_IPV4, None),
    "ipv6": (RX_IPV6, None),
    "uuid": (RX_UUID, None),
    "date": (RX_DATE, "date_valid"),
    "time": (RX_TIME, None),
    "date-time": (RX_DATETIME, "date_valid"),
    "hostname": (RX_HOSTNAME, "len253"),
    "email": (RX_EMAIL, None),
    "uri": (RX_URI, "pct_enc"),
    "json-pointer": (RX_JSON_POINTER, None),
    "duration": (RX_DURATION, "dur_nonempty"),
}


# ------------------------------------------------------------- spark
def _date_valid_col(expr: Column) -> Column:
    """Calendar validity of the leading ``yyyy-mm-dd``. Only evaluated
    when the format regex already matched (3VL: And(false, x) = false),
    so substrings are guaranteed digit runs — try_cast never misses."""
    y = F.substring(expr, 1, 4).try_cast("int")
    m = F.substring(expr, 6, 2).try_cast("int")
    d = F.substring(expr, 9, 2).try_cast("int")
    leap = ((y % 4 == 0) & ((y % 100 != 0) | (y % 400 == 0)))
    dmax = (F.when(m.isin(4, 6, 9, 11), F.lit(30))
             .when(m == 2, F.when(leap, F.lit(29)).otherwise(F.lit(28)))
             .otherwise(F.lit(31)))
    return d <= dmax


def format_ok_column(fmt: str, expr: Column) -> Column:
    """The format predicate as a pure Column (codegen, no UDF)."""
    rx, extra = FORMATS[fmt]
    ok = expr.rlike(rx)
    if extra == "date_valid":
        ok = ok & _date_valid_col(expr)
    elif extra == "len253":
        ok = ok & (F.length(expr) <= 253)
    elif extra == "pct_enc":
        # strip every valid %hh; a surviving '%' is a bad encoding
        ok = ok & ~F.regexp_replace(expr, _RX_PCT, "").contains("%")
    elif extra == "dur_nonempty":
        ok = ok & (expr != F.lit("P")) & ~expr.endswith("T")
    return ok


# ------------------------------------------------------------ duckdb
def _q(rx: str) -> str:
    return "'" + rx.replace("'", "''") + "'"


def format_ok_sql(fmt: str, v: str) -> str:
    """The same predicate as a DuckDB SQL boolean over expression ``v``
    (oracle side). Regex text is char-identical to the Spark side;
    DuckDB regexp_replace needs the explicit 'g' flag Spark implies."""
    rx, extra = FORMATS[fmt]
    ok = f"regexp_matches({v}, {_q(rx)})"
    if extra == "date_valid":
        ok += (
            f" AND TRY_CAST(substring({v}, 9, 2) AS INT) <= "
            f"(CASE WHEN TRY_CAST(substring({v}, 6, 2) AS INT) IN (4,6,9,11)"
            f" THEN 30"
            f" WHEN TRY_CAST(substring({v}, 6, 2) AS INT) = 2 THEN"
            f" (CASE WHEN TRY_CAST(substring({v}, 1, 4) AS INT) % 4 = 0"
            f" AND (TRY_CAST(substring({v}, 1, 4) AS INT) % 100 <> 0"
            f" OR TRY_CAST(substring({v}, 1, 4) AS INT) % 400 = 0)"
            f" THEN 29 ELSE 28 END)"
            f" ELSE 31 END)")
    elif extra == "len253":
        ok += f" AND length({v}) <= 253"
    elif extra == "pct_enc":
        ok += (f" AND strpos(regexp_replace({v}, {_q(_RX_PCT)}, '', 'g'),"
               f" '%') = 0")
    elif extra == "dur_nonempty":
        ok += f" AND {v} <> 'P' AND NOT {v} LIKE '%T'"
    return f"({ok})"

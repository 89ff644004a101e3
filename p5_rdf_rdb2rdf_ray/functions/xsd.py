"""Natural datatype mapping + canonical lexical forms (W3C-R2RML §10.2, §11.2).

The reference maps SQL types to XSD datatypes and emits the value's lexical
form [R: Simple.pm / DirectMapping.pm datatype code]. We map *Arrow* types:

    string                → plain literal (no datatype; RDF 1.0 / Trine style)
    int8..64 / uint*      → xsd:integer
    float32/64            → xsd:double   (canonical mantissaEexponent)
    decimal128            → xsd:decimal  (no trailing zeros, always a '.')
    bool                  → xsd:boolean  ("true"/"false")
    date32/64             → xsd:date
    time32/64             → xsd:time
    timestamp             → xsd:dateTime (canonical: no trailing-zero fraction)
    binary                → xsd:hexBinary (uppercase)

``lexical_array`` is the vectorized engine path (pyarrow.compute kernels;
string columns pass through zero-copy — the north-rule per-turn ``text``
byte-equality invariant). Scalar ``canon_*`` helpers serve driver code; the
test goldens reimplement these independently (FIXTURES.md §D).
"""

from __future__ import annotations

from decimal import Decimal

import pyarrow as pa
import pyarrow.compute as pc

from ..terms import (
    XSD_BOOLEAN,
    XSD_DATE,
    XSD_DATETIME,
    XSD_DECIMAL,
    XSD_DOUBLE,
    XSD_HEXBINARY,
    XSD_INTEGER,
    XSD_TIME,
)

# --------------------------------------------------------------------------
# scalar canonical forms
# --------------------------------------------------------------------------

def canon_double(f: float) -> str:
    """Canonical xsd:double: one nonzero digit before the point, 'E', no
    exponent sign for positives, special INF/-INF/NaN."""
    if f != f:
        return "NaN"
    if f == float("inf"):
        return "INF"
    if f == float("-inf"):
        return "-INF"
    d = Decimal(repr(f))  # repr = shortest round-trip digits
    sign, digits, exp = d.as_tuple()
    ds = "".join(map(str, digits)).rstrip("0") or "0"
    # value = 0.ds * 10^(len(digits)+exp) ; mantissa d.ddd
    if ds == "0":
        return "-0.0E0" if sign else "0.0E0"
    e10 = len(digits) + exp - 1
    mant = ds[0] + "." + (ds[1:] or "0")
    return ("-" if sign else "") + mant + "E" + str(e10)


def canon_decimal(s: str) -> str:
    """Canonical xsd:decimal from a plain decimal string: strip trailing
    fractional zeros, keep at least one digit each side of the point."""
    if "." not in s:
        return s + ".0"
    s = s.rstrip("0")
    if s.endswith("."):
        s += "0"
    if s.startswith("."):
        s = "0" + s
    if s.startswith("-."):
        s = "-0" + s[1:]
    return s


def canon_boolean(b: bool) -> str:
    return "true" if b else "false"


def canon_hexbinary(b: bytes) -> str:
    return b.hex().upper()


def canon_datetime(dt) -> str:
    """Canonical xsd:dateTime from a python datetime: 'T' separator,
    fractional seconds only when nonzero, trailing zeros stripped."""
    s = dt.strftime("%Y-%m-%dT%H:%M:%S")
    if dt.microsecond:
        s += (".%06d" % dt.microsecond).rstrip("0")
    return s


# --------------------------------------------------------------------------
# vectorized lexical forms
# --------------------------------------------------------------------------

def _canon_decimal_array(arr: pa.Array) -> pa.Array:
    s = pc.cast(arr, pa.string())
    has_dot = pc.match_substring(s, ".")
    s = pc.if_else(has_dot, s, pc.binary_join_element_wise(s, pa.scalar(".0"), ""))
    s = pc.replace_substring_regex(s, r"(\.\d*?)0+$", r"\1")
    s = pc.replace_substring_regex(s, r"\.$", ".0")
    return s


def _canon_double_array(arr: pa.Array) -> pa.Array:
    # shortest-round-trip doubles need Python repr, but real double
    # columns (scores, prices) are heavily repetitive: dictionary-encode
    # first so the Python loop runs over the UNIQUE values only, then a
    # vectorized take scatters the canon strings back (profiled: the
    # flagship's score column went from 0.45 s to ~0 per 65k batch).
    d = pc.dictionary_encode(arr)
    if isinstance(d, pa.ChunkedArray):
        d = d.combine_chunks()
    uniq = d.dictionary.to_pylist()
    canon = pa.array([canon_double(v) for v in uniq], pa.string())
    return pa.DictionaryArray.from_arrays(d.indices, canon).cast(pa.string())


def _canon_timestamp_array(arr: pa.Array) -> pa.Array:
    ts = pc.cast(arr, pa.timestamp("us"))
    # pyarrow strftime's %S includes fractional digits at sub-second
    # precision; render the base from a seconds-precision cast instead.
    us64 = pc.cast(ts, pa.int64())
    secs = pc.cast(
        pc.multiply(
            pc.cast(pc.floor(pc.divide(pc.cast(us64, pa.float64()), 1e6)), pa.int64()),
            1_000_000,
        ),
        pa.timestamp("us"),
    )
    base = pc.strftime(pc.cast(secs, pa.timestamp("s"), safe=False), format="%Y-%m-%dT%H:%M:%S")
    frac = pc.subtract(us64, pc.multiply(pc.floor(pc.divide(pc.cast(us64, pa.float64()), 1e6)), pa.scalar(1e6)))
    frac = pc.cast(frac, pa.int64())
    fs = pc.utf8_lpad(pc.cast(frac, pa.string()), 6, "0")
    fs = pc.replace_substring_regex(fs, r"0+$", "")
    dot = pc.if_else(pc.equal(frac, 0), pa.scalar(""), pa.scalar("."))
    fs = pc.if_else(pc.equal(frac, 0), pa.scalar(""), fs)
    return pc.binary_join_element_wise(base, dot, fs, "")


def _canon_time_array(arr: pa.Array) -> pa.Array:
    us = pc.cast(pc.cast(arr, pa.time64("us")), pa.int64())
    h = pc.divide(us, 3_600_000_000)
    m = pc.divide(pc.subtract(us, pc.multiply(h, 3_600_000_000)), 60_000_000)
    rem = pc.subtract(us, pc.add(pc.multiply(h, 3_600_000_000), pc.multiply(m, 60_000_000)))
    s = pc.divide(rem, 1_000_000)
    frac = pc.subtract(rem, pc.multiply(s, 1_000_000))
    two = lambda x: pc.utf8_lpad(pc.cast(x, pa.string()), 2, "0")  # noqa: E731
    base = pc.binary_join_element_wise(two(h), two(m), two(s), ":")
    fs = pc.utf8_lpad(pc.cast(frac, pa.string()), 6, "0")
    fs = pc.replace_substring_regex(fs, r"0+$", "")
    dot = pc.if_else(pc.equal(frac, 0), pa.scalar(""), pa.scalar("."))
    fs = pc.if_else(pc.equal(frac, 0), pa.scalar(""), fs)
    return pc.binary_join_element_wise(base, dot, fs, "")


def _canon_binary_array(arr: pa.Array) -> pa.Array:
    vals = arr.to_pylist()
    return pa.array(
        [None if v is None else canon_hexbinary(v) for v in vals], pa.string()
    )


def lexical_array(arr: pa.Array) -> tuple[pa.Array, str | None]:
    """(lexical string array, natural datatype IRI or None-for-plain).

    String columns return the input array unchanged (zero-copy pass-through).
    """
    t = arr.type
    if pa.types.is_string(t):
        return arr, None
    if pa.types.is_large_string(t):
        return pc.cast(arr, pa.string()), None
    if pa.types.is_integer(t):
        return pc.cast(arr, pa.string()), XSD_INTEGER
    if pa.types.is_boolean(t):
        out = pc.if_else(arr, pa.scalar("true"), pa.scalar("false"))
        return out, XSD_BOOLEAN
    if pa.types.is_decimal(t):
        return _canon_decimal_array(arr), XSD_DECIMAL
    if pa.types.is_floating(t):
        if pa.types.is_float32(t):
            arr = pc.cast(arr, pa.float64())
        return _canon_double_array(arr), XSD_DOUBLE
    if pa.types.is_timestamp(t):
        return _canon_timestamp_array(arr), XSD_DATETIME
    if pa.types.is_date(t):
        ts = pc.cast(arr, pa.timestamp("s"))
        return pc.strftime(ts, format="%Y-%m-%d"), XSD_DATE
    if pa.types.is_time(t):
        return _canon_time_array(arr), XSD_TIME
    if pa.types.is_binary(t) or pa.types.is_large_binary(t) or pa.types.is_fixed_size_binary(t):
        return _canon_binary_array(arr), XSD_HEXBINARY
    if pa.types.is_null(t):
        return pc.cast(arr, pa.string()), None
    raise TypeError(f"no natural RDF mapping for Arrow type {t}")


def has_natural_mapping(t: pa.DataType) -> bool:
    """True if :func:`lexical_array` can canonicalize this Arrow type —
    i.e. the column exists in the reference's SQL-92 world (W3C-R2RML
    §10.2 natural mappings). Nested types (list/struct/map) do not."""
    return (
        pa.types.is_string(t)
        or pa.types.is_large_string(t)
        or pa.types.is_integer(t)
        or pa.types.is_boolean(t)
        or pa.types.is_decimal(t)
        or pa.types.is_floating(t)
        or pa.types.is_timestamp(t)
        or pa.types.is_date(t)
        or pa.types.is_time(t)
        or pa.types.is_binary(t)
        or pa.types.is_large_binary(t)
        or pa.types.is_fixed_size_binary(t)
        or pa.types.is_null(t)
    )

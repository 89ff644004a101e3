"""Row-local scalar functions, vectorized over Arrow arrays (SURVEY.md §2.6).

Semantics sources:
- IRI-safe percent-encoding: W3C-R2RML §7.3 ("IRI-safe version" — percent-
  encode every char outside RFC 3987 ``iunreserved``); the reference uses
  URI::Escape [R: Simple.pm].
- Template fill: W3C-R2RML §7.3 string templates ``{col}`` with backslash
  escapes; the reference's ``sub template`` [R: Simple.pm :: template/iri].
- N-Triples escapes: RDF 1.1 N-Triples grammar.

Every function has a scalar form (used by test golden generators and small
driver-side code) and a vectorized array form used inside ``map_batches``.
The array forms use a fast path (regex "no work needed" mask via
``pyarrow.compute``) and fall back to the scalar form only for the values
that actually need work — at transcript scale almost all template inputs are
``c000123``-style identifiers that pass the fast path untouched.
"""

from __future__ import annotations

import re
import urllib.parse
from typing import Callable, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# --------------------------------------------------------------------------
# IRI-safe percent encoding (W3C-R2RML §7.3)
# --------------------------------------------------------------------------

# RFC 3987 ucschar ranges (kept verbatim in IRIs, NOT percent-encoded).
_UCSCHAR_RANGES = (
    (0x00A0, 0xD7FF), (0xF900, 0xFDCF), (0xFDF0, 0xFFEF),
    (0x10000, 0x1FFFD), (0x20000, 0x2FFFD), (0x30000, 0x3FFFD),
    (0x40000, 0x4FFFD), (0x50000, 0x5FFFD), (0x60000, 0x6FFFD),
    (0x70000, 0x7FFFD), (0x80000, 0x8FFFD), (0x90000, 0x9FFFD),
    (0xA0000, 0xAFFFD), (0xB0000, 0xBFFFD), (0xC0000, 0xCFFFD),
    (0xD0000, 0xDFFFD), (0xE1000, 0xEFFFD),
)

_ASCII_UNRESERVED = frozenset(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)


def _is_iunreserved(ch: str) -> bool:
    if ch in _ASCII_UNRESERVED:
        return True
    cp = ord(ch)
    if cp < 0xA0:
        return False
    for lo, hi in _UCSCHAR_RANGES:
        if lo <= cp <= hi:
            return True
    return False


def iri_safe_encode(s: str) -> str:
    """Percent-encode every char outside RFC3987 iunreserved (UTF-8 bytes,
    uppercase hex). Unicode letters are *kept* — IRIs, not URIs."""
    out: list[str] = []
    for ch in s:
        if _is_iunreserved(ch):
            out.append(ch)
        else:
            out.append("".join(f"%{b:02X}" for b in ch.encode("utf-8")))
    return "".join(out)


# ASCII values matching this need no encoding. Conservative: any non-ASCII
# value takes the slow path (which then keeps iunreserved chars verbatim).
_SAFE_RE = r"^[A-Za-z0-9\-._~]*$"


def _selective_apply(
    arr: pa.Array, safe_mask: pa.Array, fn: Callable[[str], str]
) -> pa.Array:
    """Apply scalar ``fn`` only where ``safe_mask`` is false; keep the Arrow
    array untouched (zero-copy) when every valid value is safe."""
    need = pc.fill_null(
        pc.and_kleene(pc.invert(safe_mask), pc.is_valid(arr)), False
    )
    if pc.sum(pc.cast(need, pa.int64())).as_py() in (0, None):
        return arr
    # encode ONLY the flagged slice and scatter it back with
    # pc.replace_with_mask — one weird value in a batch no longer degrades
    # the whole batch to a Python list round-trip
    idx = np.flatnonzero(need.to_numpy(zero_copy_only=False))
    py = arr.take(pa.array(idx)).to_pylist()
    repl = pa.array([fn(v) for v in py], type=arr.type)
    return pc.replace_with_mask(arr, need, repl)


def iri_safe_encode_array(arr: pa.Array) -> pa.Array:
    """Vectorized iri_safe_encode; zero-copy when nothing needs encoding."""
    if not pa.types.is_string(arr.type) and not pa.types.is_large_string(arr.type):
        arr = pc.cast(arr, pa.string())
    safe = pc.match_substring_regex(arr, _SAFE_RE)
    return _selective_apply(arr, safe, iri_safe_encode)


# --------------------------------------------------------------------------
# Templates (W3C-R2RML §7.3) — '{col}', '{"quoted col"}', backslash escapes
# --------------------------------------------------------------------------

class Template:
    """A parsed string template: alternating literal / column segments.

    ``segments`` is a list of ("lit", text) | ("col", column_name).
    """

    __slots__ = ("raw", "segments", "columns")

    def __init__(self, raw: str):
        self.raw = raw
        self.segments: list[tuple[str, str]] = []
        lit: list[str] = []
        i, n = 0, len(raw)
        while i < n:
            ch = raw[i]
            if ch == "\\" and i + 1 < n and raw[i + 1] in "{}\\":
                lit.append(raw[i + 1])
                i += 2
            elif ch == "{":
                if lit:
                    self.segments.append(("lit", "".join(lit)))
                    lit = []
                j = raw.index("}", i)
                name = raw[i + 1 : j]
                if len(name) >= 2 and name[0] == '"' and name[-1] == '"':
                    name = name[1:-1]
                self.segments.append(("col", name))
                i = j + 1
            else:
                lit.append(ch)
                i += 1
        if lit:
            self.segments.append(("lit", "".join(lit)))
        self.columns = [s for k, s in self.segments if k == "col"]

    def unparse(self, rename: dict[str, str] | None = None) -> str:
        """Serialize back to template syntax, optionally renaming columns
        (used by the RefObjectMap fast path to re-express a parent subject
        template over child join columns)."""
        out = []
        for kind, s in self.segments:
            if kind == "lit":
                out.append(s.replace("\\", "\\\\").replace("{", "\\{").replace("}", "\\}"))
            else:
                name = (rename or {}).get(s, s)
                if re.search(r"[^\w]", name):
                    out.append('{"%s"}' % name)
                else:
                    out.append("{%s}" % name)
        return "".join(out)

    def match(self, value: str, iri_safe: bool = True) -> dict[str, str] | None:
        """Invert the template against a generated term's lexical form →
        {column: raw value}, or None if the value cannot have been produced
        by this template. See :meth:`match_detail`."""
        return self.match_detail(value, iri_safe=iri_safe)[0]

    def match_detail(
        self, value: str, iri_safe: bool = True
    ) -> tuple[dict[str, str] | None, bool]:
        """Invert the template → ``(bindings, unique)``.

        The inverse of :meth:`fill_scalar`: literal segments anchor a
        regex, column slots capture non-greedily, and (for IRI templates)
        captures are percent-DECODED. ``bindings`` is None if the value
        cannot have been produced by ANY fill of this template (a sound
        skip signal); a column appearing twice must capture the same value.

        ``unique`` is True only when this is provably the ONLY possible
        inversion of ``value``: no two adjacent column slots, and for every
        col–lit–col run the separator occurs exactly once (overlap-counted)
        in the spanned slice. Callers pruning a scan by the bindings must
        treat ``unique=False`` as "don't prune" — another row with a
        different split could generate the same term (W3C-R2RML §7.7
        hands such templates to rr:inverseExpression)."""
        pat, cols = ["^"], []
        for kind, s in self.segments:
            if kind == "lit":
                pat.append(re.escape(s))
            else:
                cols.append(s)
                pat.append("(.*?)")
        pat.append("$")
        m = re.match("".join(pat), value, re.DOTALL)
        if m is None:
            return None, False
        out: dict[str, str] = {}
        for name, grp in zip(cols, m.groups()):
            raw = urllib.parse.unquote(grp) if iri_safe else grp
            if name in out and out[name] != raw:
                return None, False
            out[name] = raw
        return out, self._unique_inversion(value, m)

    def _unique_inversion(self, value: str, m: "re.Match") -> bool:
        """Conservative split-uniqueness proof for one matched value: False
        on adjacent column slots, or when a separator between two captures
        could slide (occurs ≠ once, overlap-counted, across the
        capture–sep–capture window). False negatives only cost pruning."""
        g = 0
        for i, (kind, _s) in enumerate(self.segments):
            if kind != "col":
                continue
            g += 1
            nxt = self.segments[i + 1] if i + 1 < len(self.segments) else None
            if nxt is None:
                continue  # trailing capture: end-anchored, determined
            if nxt[0] == "col":
                return False  # adjacent slots: split is arbitrary
            sep = nxt[1]
            if i + 2 < len(self.segments) and self.segments[i + 2][0] == "col":
                w = value[m.start(g): m.end(g + 1)]
                hits = sum(
                    1
                    for j in range(len(w) - len(sep) + 1)
                    if w.startswith(sep, j)
                )
                if hits != 1:
                    return False
        return True

    def fill_scalar(self, row: dict, iri_safe: bool = True) -> str | None:
        """Scalar fill (driver-side / goldens). None if any referenced value
        is NULL (term-generation rule, W3C-R2RML §11)."""
        out = []
        for kind, s in self.segments:
            if kind == "lit":
                out.append(s)
            else:
                v = row.get(s)
                if v is None:
                    return None
                v = str(v)
                out.append(iri_safe_encode(v) if iri_safe else v)
        return "".join(out)

    def fill_array(
        self, columns: dict[str, pa.Array], n: int, iri_safe: bool = True
    ) -> pa.Array:
        """Vectorized fill. ``columns`` maps name → *string lexical* Arrow
        array (caller converts non-string columns via xsd lexical forms
        first). Result is null wherever any referenced column is null —
        which implements NULL suppression for free."""
        parts: list = []
        for kind, s in self.segments:
            if kind == "lit":
                parts.append(pa.scalar(s, pa.string()))
            else:
                col = columns[s]
                parts.append(iri_safe_encode_array(col) if iri_safe else col)
        if not parts:
            return pa.nulls(n, pa.string())
        if len(parts) == 1 and isinstance(parts[0], pa.Scalar):
            return pa.array([parts[0].as_py()] * n, type=pa.string())
        # null_handling default emits null if any component null → NULL rule
        return pc.binary_join_element_wise(*parts, pa.scalar("", pa.string()))


# --------------------------------------------------------------------------
# CURIE / IRI resolution
# --------------------------------------------------------------------------

_ABS_IRI_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*:")
_CURIE_RE = re.compile(r"^([A-Za-z_][\w\-]*):(\S*)$")


def curie_expand(name: str, namespaces: dict[str, str], base: str = "") -> str:
    """Expand ``dc:title``-style CURIEs via a prefix map; pass through
    absolute IRIs; otherwise resolve against ``base``.
    [R: Simple.pm :: -namespaces handling]"""
    m = _CURIE_RE.match(name)
    if m and m.group(1) in namespaces:
        return namespaces[m.group(1)] + m.group(2)
    if _ABS_IRI_RE.match(name):
        return name
    return base + name


def resolve_base(iri: str, base: str) -> str:
    """Resolve a (possibly relative) IRI against a base (W3C-R2RML §7.4)."""
    if _ABS_IRI_RE.match(iri):
        return iri
    return base + iri


# --------------------------------------------------------------------------
# N-Triples escaping (sink #6)
# --------------------------------------------------------------------------

_NT_NEEDS = r'[\x00-\x1F"\\]'


def ntriples_escape(s: str) -> str:
    out = []
    for ch in s:
        if ch == "\\":
            out.append("\\\\")
        elif ch == '"':
            out.append('\\"')
        elif ch == "\n":
            out.append("\\n")
        elif ch == "\r":
            out.append("\\r")
        elif ch == "\t":
            out.append("\\t")
        elif ord(ch) < 0x20:
            out.append(f"\\u{ord(ch):04X}")
        else:
            out.append(ch)
    return "".join(out)


def ntriples_escape_array(arr: pa.Array) -> pa.Array:
    if not pa.types.is_string(arr.type) and not pa.types.is_large_string(arr.type):
        arr = pc.cast(arr, pa.string())
    safe = pc.invert(pc.match_substring_regex(arr, _NT_NEEDS))
    return _selective_apply(arr, safe, ntriples_escape)


# --------------------------------------------------------------------------
# Deterministic skolemization (SURVEY §2 #16)
# --------------------------------------------------------------------------

def bnode_skolem_scalar(scope: str, *parts: object) -> str:
    """Deterministic blank-node label ``_:sk-<scope>-<enc(p1)>.<enc(p2)>…``.
    Plain reversible encoding instead of a hash: deterministic across
    runs/retries (retry-safe), unique by construction, and vectorizable."""
    return "_:sk-" + scope + "-" + ".".join(iri_safe_encode(str(p)) for p in parts)


def bnode_skolem_array(scope: str, parts: Sequence[pa.Array], n: int) -> pa.Array:
    """Vectorized skolem labels; null if any key part is null."""
    joined: list = [pa.scalar("_:sk-" + scope + "-", pa.string())]
    for i, p in enumerate(parts):
        if i:
            joined.append(pa.scalar(".", pa.string()))
        joined.append(iri_safe_encode_array(p))
    return pc.binary_join_element_wise(*joined, pa.scalar("", pa.string()))

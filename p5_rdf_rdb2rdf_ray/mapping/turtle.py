"""Minimal Turtle-subset parser for R2RML mapping documents.

Offline sandbox → no rdflib; the ``rr:`` subset actually used by mapping
documents is small (SURVEY §7): prefixes, IRIs, prefixed names, blank nodes
(labelled and ``[ … ]`` property lists), string literals in all four quote
forms (``"…"`` / ``'…'`` / ``\"\"\"…\"\"\"`` / ``'''…'''``, multi-line for
the long forms), numeric literals (integer/decimal/double per the Turtle
grammar), booleans, ``;`` / ``,`` continuation, ``a`` keyword, and
collections (``( … )`` → the standard rdf:first/rdf:rest chain, walkable
with :meth:`Graph.collection`). Quoted graphs FAIL LOUDLY.

Terms are tuples: ("iri", s) | ("bnode", label) | ("lit", value, lang, dt).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

Term = tuple


@dataclass
class Graph:
    triples: list[tuple[Term, Term, Term]] = field(default_factory=list)

    def add(self, s: Term, p: Term, o: Term) -> None:
        self.triples.append((s, p, o))

    def objects(self, s: Term, p_iri: str) -> list[Term]:
        return [o for (ss, pp, o) in self.triples if ss == s and pp == ("iri", p_iri)]

    def obj(self, s: Term, p_iri: str) -> Term | None:
        vals = self.objects(s, p_iri)
        return vals[0] if vals else None

    def subjects_of_type(self, cls_iri: str) -> list[Term]:
        t = ("iri", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type")
        return [s for (s, p, o) in self.triples if p == t and o == ("iri", cls_iri)]

    def subjects_with(self, p_iri: str) -> list[Term]:
        seen: dict[Term, None] = {}
        for s, p, _ in self.triples:
            if p == ("iri", p_iri):
                seen.setdefault(s)
        return list(seen)

    def collection(self, node: Term) -> list[Term]:
        """Walk an rdf:first/rdf:rest chain from ``node`` into a Python
        list (the inverse of the parser's ``( … )`` expansion)."""
        rdf = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
        items: list[Term] = []
        seen: set[Term] = set()
        while node != ("iri", rdf + "nil"):
            if node in seen:
                raise ValueError("turtle: cyclic rdf:rest chain")
            seen.add(node)
            first = self.obj(node, rdf + "first")
            rest = self.obj(node, rdf + "rest")
            if first is None or rest is None:
                raise ValueError(
                    "turtle: malformed collection (missing rdf:first/rest)"
                )
            items.append(first)
            node = rest
        return items


_TOKEN = re.compile(
    r"""
    (?P<ws>\s+|\#[^\n]*)
  | (?P<iriref><[^<>\s]*>)
  | (?P<str3>\"\"\"(?:[^"\\]|\\[\s\S]|\"(?!\"\"))*\"\"\")
  | (?P<str1>"(?:[^"\\\n]|\\[\s\S])*")
  | (?P<sq3>'''(?:[^'\\]|\\[\s\S]|'(?!''))*''')
  | (?P<sq1>'(?:[^'\\\n]|\\[\s\S])*')
  | (?P<lang>@[A-Za-z][A-Za-z0-9\-]*)
  | (?P<dtsep>\^\^)
  | (?P<bnode>_:[A-Za-z0-9._\-]+)
  | (?P<num>[+-]?(?:\d+\.\d*[eE][+-]?\d+|\d*\.\d+(?:[eE][+-]?\d+)?|\d+(?:[eE][+-]?\d+)?))
  | (?P<pname>[A-Za-z_][\w\-.]*)?:(?P<local>[\w\-.%/#]*)
  | (?P<kw>@?[A-Za-z]+)
  | (?P<punct>[\[\]();,.])
    """,
    re.VERBOSE,
)

_ESCAPES = {
    "t": "\t", "n": "\n", "r": "\r", "b": "\b", "f": "\f",
    '"': '"', "'": "'", "\\": "\\",
}


def _unescape(s: str) -> str:
    out: list[str] = []
    i = 0
    while i < len(s):
        ch = s[i]
        if ch == "\\" and i + 1 < len(s):
            nxt = s[i + 1]
            if nxt in _ESCAPES:
                out.append(_ESCAPES[nxt])
                i += 2
                continue
            if nxt == "u" and i + 6 <= len(s):
                out.append(chr(int(s[i + 2 : i + 6], 16)))
                i += 6
                continue
            if nxt == "U" and i + 10 <= len(s):
                out.append(chr(int(s[i + 2 : i + 10], 16)))
                i += 10
                continue
        out.append(ch)
        i += 1
    return "".join(out)


class TurtleParser:
    def __init__(self, text: str, base: str = ""):
        self.toks: list[tuple[str, str]] = []
        pos = 0
        while pos < len(text):
            m = _TOKEN.match(text, pos)
            if m is None:
                raise ValueError(f"turtle: bad syntax at {text[pos:pos+40]!r}")
            pos = m.end()
            kind = m.lastgroup
            if kind == "ws":
                continue
            if kind == "local":
                self.toks.append(("pname", (m.group("pname") or "") + ":" + m.group("local")))
            else:
                self.toks.append((kind, m.group(0)))
        self.i = 0
        self.prefixes: dict[str, str] = {}
        self.base = base
        self.graph = Graph()
        self._bn = 0

    # -- token helpers ----------------------------------------------------

    def _peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else ("eof", "")

    def _next(self):
        t = self._peek()
        self.i += 1
        return t

    def _expect(self, value: str):
        k, v = self._next()
        if v != value:
            raise ValueError(f"turtle: expected {value!r}, got {v!r}")

    # -- parsing ----------------------------------------------------------

    def parse(self) -> Graph:
        while self._peek()[0] != "eof":
            k, v = self._peek()
            if (k == "kw" and v.lower() in ("@prefix", "prefix")) or (
                k == "lang" and v.lower() == "@prefix"
            ):
                self._next()
                pk, pv = self._next()
                if pk != "pname" or not pv.endswith(":"):
                    raise ValueError(f"turtle: bad prefix decl {pv!r}")
                ik, iv = self._next()
                if ik != "iriref":
                    raise ValueError("turtle: prefix needs IRIREF")
                self.prefixes[pv[:-1]] = iv[1:-1]
                if self._peek()[1] == ".":
                    self._next()
                continue
            if (k == "kw" and v.lower() in ("@base", "base")) or (
                k == "lang" and v.lower() == "@base"
            ):
                self._next()
                ik, iv = self._next()
                self.base = iv[1:-1]
                if self._peek()[1] == ".":
                    self._next()
                continue
            s = self._term(as_subject=True)
            self._predicate_object_list(s)
            self._expect(".")
        return self.graph

    def _fresh_bnode(self) -> Term:
        self._bn += 1
        return ("bnode", f"gen{self._bn}")

    def _term(self, as_subject: bool = False) -> Term:
        k, v = self._next()
        if k == "iriref":
            iri = _unescape(v[1:-1])
            if self.base and not re.match(r"^[A-Za-z][A-Za-z0-9+.\-]*:", iri):
                iri = self.base + iri
            return ("iri", iri)
        if k == "pname":
            pfx, _, local = v.partition(":")
            if pfx not in self.prefixes:
                raise ValueError(f"turtle: unknown prefix {pfx!r}:")
            return ("iri", self.prefixes[pfx] + local)
        if k == "bnode":
            return ("bnode", v[2:])
        if k == "punct" and v == "[":
            node = self._fresh_bnode()
            if self._peek()[1] != "]":
                self._predicate_object_list(node)
            self._expect("]")
            return node
        if k in ("str1", "str3", "sq1", "sq3"):
            if as_subject:
                raise ValueError("turtle: a literal cannot be a subject")
            raw = v[3:-3] if k in ("str3", "sq3") else v[1:-1]
            value = _unescape(raw)
            nk, nv = self._peek()
            if nk == "lang":
                self._next()
                return ("lit", value, nv[1:], None)
            if nk == "dtsep":
                self._next()
                dt = self._term()
                return ("lit", value, None, dt[1])
            return ("lit", value, None, None)
        if k == "num":
            if as_subject:
                raise ValueError("turtle: a literal cannot be a subject")
            # Turtle grammar: exponent → xsd:double, '.' → xsd:decimal,
            # plain digits → xsd:integer
            if "e" in v or "E" in v:
                dt = "http://www.w3.org/2001/XMLSchema#double"
            elif "." in v:
                dt = "http://www.w3.org/2001/XMLSchema#decimal"
            else:
                dt = "http://www.w3.org/2001/XMLSchema#integer"
            return ("lit", v, None, dt)
        if k == "kw" and v in ("true", "false"):
            if as_subject:
                raise ValueError("turtle: a literal cannot be a subject")
            return ("lit", v, None, "http://www.w3.org/2001/XMLSchema#boolean")
        if k == "punct" and v == "(":
            # RDF collection '( o1 o2 … )' — expands to the standard
            # rdf:first/rdf:rest bnode chain (Turtle §2.8); '()' is
            # rdf:nil. No rr: property takes a collection, but mapping
            # documents may carry annotation triples that do.
            rdf = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
            items: list[Term] = []
            while self._peek()[1] != ")":
                if self._peek()[0] == "eof":
                    raise ValueError("turtle: unterminated collection '( …'")
                items.append(self._term())
            self._next()  # ')'
            if not items:
                return ("iri", rdf + "nil")
            nodes = [self._fresh_bnode() for _ in items]
            tails = nodes[1:] + [("iri", rdf + "nil")]
            for node, item, tail in zip(nodes, items, tails):
                self.graph.add(node, ("iri", rdf + "first"), item)
                self.graph.add(node, ("iri", rdf + "rest"), tail)
            return nodes[0]
        raise ValueError(f"turtle: unexpected token {v!r}")

    def _predicate_object_list(self, s: Term) -> None:
        while True:
            k, v = self._peek()
            if k == "kw" and v == "a":
                self._next()
                p: Term = ("iri", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type")
            else:
                p = self._term()
            while True:
                o = self._term()
                self.graph.add(s, p, o)
                if self._peek()[1] == ",":
                    self._next()
                    continue
                break
            if self._peek()[1] == ";":
                while self._peek()[1] == ";":
                    self._next()
                if self._peek()[1] in ("]", "."):
                    return  # trailing ';' before close
                continue
            return


def parse_turtle(text: str, base: str = "") -> tuple[Graph, dict[str, str]]:
    p = TurtleParser(text, base=base)
    g = p.parse()
    return g, p.prefixes

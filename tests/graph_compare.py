"""Graph-isomorphism-aware comparison with blank-node bijection matching.

Mirrors the reference's test comparison style (RDF::Trine graph equality
matches bnodes structurally, not by label) [SURVEY §5.1]. Triples are
N-Triples-style strings; any token starting ``_:`` is a blank node.

Small graphs only (test fixtures): brute-force bijection for ≤ 8 bnodes,
signature refinement above that.
"""

from __future__ import annotations

import itertools
import re

_BNODE = re.compile(r"_:[A-Za-z0-9._\-%]+")


def _bnodes(lines: set[str]) -> list[str]:
    out: set[str] = set()
    for ln in lines:
        out.update(_BNODE.findall(ln))
    return sorted(out)


def _apply(lines: set[str], mapping: dict[str, str]) -> set[str]:
    def sub(m: re.Match) -> str:
        return mapping.get(m.group(0), m.group(0))

    return {_BNODE.sub(sub, ln) for ln in lines}


def graphs_equal(a: set[str] | list[str], b: set[str] | list[str]) -> bool:
    a, b = set(a), set(b)
    if len(a) != len(b):
        return False
    ba, bb = _bnodes(a), _bnodes(b)
    if len(ba) != len(bb):
        return False
    if not ba:
        return a == b
    if len(ba) <= 8:
        for perm in itertools.permutations(bb):
            if _apply(a, dict(zip(ba, perm))) == b:
                return True
        return False
    # signature refinement: map every bnode to a canonical index
    return _canon(a) == _canon(b)


def _canon(lines: set[str]) -> set[str]:
    nodes = _bnodes(lines)
    sig = {n: "" for n in nodes}
    for _ in range(3):
        new: dict[str, str] = {}
        for n in nodes:
            rel = sorted(
                _BNODE.sub(lambda m: "⟨" + sig[m.group(0)] + "⟩", ln)
                for ln in lines
                if n in _BNODE.findall(ln)
            )
            new[n] = "|".join(rel)
        sig = new
    order = sorted(nodes, key=lambda n: sig[n])
    mapping = {n: f"_:c{i}" for i, n in enumerate(order)}
    return _apply(lines, mapping)


def diff(a, b) -> str:
    a, b = set(a), set(b)
    out = []
    for ln in sorted(a - b):
        out.append("- " + ln)
    for ln in sorted(b - a):
        out.append("+ " + ln)
    return "\n".join(out)

"""Independent golden-KG derivation for the flagship pipeline (FIXTURES §A).

Deliberately does NOT import the engine's executor/scalar kernels: expected
triples are derived row-by-row in plain Python straight from the fixture
spec, so an engine bug cannot cancel out in the comparison. Shares only the
*fixture constants* (gazetteer shape, crc32 score formula — they define the
synthetic data itself, not the engine).
"""

from __future__ import annotations

import re
import zlib

import pyarrow as pa

TY = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
XDT = "http://www.w3.org/2001/XMLSchema#dateTime"
XD = "http://www.w3.org/2001/XMLSchema#double"

_MENTION = re.compile(r"\[\[([A-Za-z0-9_]+)\]\]")


def _canon_score(surface: str, entity: str) -> str:
    h = zlib.crc32(f"{surface}→{entity}".encode()) % 50
    two = str(50 + h)  # always two digits, 50..99
    return f"{two[0]}.{two[1]}E-1"


def _esc(s: str) -> str:
    # fixture texts contain no quotes/backslashes/control chars by construction
    assert not re.search(r'[\\"\n\r\t]', s)
    return s


def golden_kg_lines(transcripts: pa.Table, base: str) -> set[str]:
    lines: set[str] = set()
    # canonical id = lexicographic min of the alias component (the CC
    # min-label convention): component {Alias_k, Entity_k} → "Alias_k"
    canon = {f"Entity_{k}": f"Alias_{k}" for k in range(8)}
    known = {f"Entity_{k}" for k in range(64)} | {f"Alias_{k}" for k in range(8)}
    rows = transcripts.to_pylist()
    for r in rows:
        c, i = r["conv_id"], r["turn_idx"]
        turn = f"<{base}conv/{c}/turn/{i}>"
        conv = f"<{base}conv/{c}>"
        lines.add(f"{turn} <{TY}> <{base}Turn> .")
        lines.add(f"{conv} <{TY}> <{base}Conversation> .")
        lines.add(f'{turn} <{base}role> "{r["role"]}" .')
        lines.add(f'{turn} <{base}text> "{_esc(r["text"])}" .')
        if r["tool"] is not None:
            lines.add(f'{turn} <{base}tool> "{r["tool"]}" .')
        ts = r["ts"].strftime("%Y-%m-%dT%H:%M:%S")
        lines.add(f'{turn} <{base}ts> "{ts}"^^<{XDT}> .')
        lines.add(f"{turn} <{base}inConversation> {conv} .")
        j = 0
        for m in _MENTION.finditer(r["text"]):
            s = m.group(1)
            if s not in known:
                continue
            node = f"_:sk-mention-{c}.{i}.{j}"
            target = canon.get(s, s)
            lines.add(f"{node} <{TY}> <{base}Mention> .")
            lines.add(f"{turn} <{base}hasMention> {node} .")
            lines.add(f'{node} <{base}surface> "{s}" .')
            lines.add(f'{node} <{base}score> "{_canon_score(s, s)}"^^<{XD}> .')
            lines.add(f"{node} <{base}linksTo> <{base}entity/{target}> .")
            j += 1
    return lines


def precision_recall(got: set[str], want: set[str]) -> tuple[float, float]:
    tp = len(got & want)
    p = tp / len(got) if got else 1.0
    r = tp / len(want) if want else 1.0
    return p, r

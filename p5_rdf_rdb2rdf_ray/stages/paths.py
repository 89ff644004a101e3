"""SPARQL property paths: arbitrary-length reachability (``p+``) as a
distributed transitive closure [graft extension — the reference Store
answers only single-hop ``get_statements``; SPARQL 1.1 §9.1 path
semantics recalled from the public spec].

Algorithm: PATH DOUBLING.  ``R₀ = E``; each round composes the relation
with itself and folds the result in::

    R_{k+1} = distinct(R_k ∪ (R_k ∘ R_k))      # ∘ = join on mid node

so ``R_k`` holds every pair connected by a path of length ≤ 2^k —
**O(log diameter) rounds**, each ONE self-join (the engine's union-tag
co-hash ``hash_join``) plus ONE distinct shuffle.  A semi-naive
frontier expansion would need O(diameter) rounds; for the billion-edge
/ shallow-diameter graphs a KG produces (FK forests, org charts,
thread-reply trees) doubling is the scale shape.  Convergence is a
materialized ``count()`` — the pair set is monotone growing and each
round ends distinct, so an unchanged count IS the fixpoint, and count
on materialized blocks is metadata (no data pass; ``cc.py`` needs its
row-hash digest only because labels change without the count moving).

Output size is the closure itself (Σ per-node reachable-set sizes) —
inherent to the query, not a property of the algorithm; each round
materializes so lineage stays O(1) deep.

Term correctness for the store-served ``p_plus``: only NON-LITERAL
objects can be path-interior nodes (a literal is never a subject), so
literal-ended edges join the closure only as TERMINAL hops — a literal
whose lexical form spells a node IRI cannot splice two paths together.
"""

from __future__ import annotations

from typing import Sequence

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def transitive_closure(
    edges: rd.Dataset,
    src: str = "src",
    dst: str = "dst",
    num_partitions: int = 16,
    max_rounds: int = 16,
) -> rd.Dataset:
    """→ Dataset(src, dst): every pair connected by a DIRECTED path of
    length ≥ 1 (SPARQL ``p+`` semantics; cycles converge — the pair set
    is finite).  ``max_rounds`` is a safety cap reached only past
    diameter 2^16; the loop stops at the digest fixpoint.

    Each round: ONE union-tag co-hash self-join on the mid node + ONE
    distinct shuffle, materialized so round k+1 starts from blocks, not
    a k-deep lineage.  Key columns may be any hashable Arrow type
    (ints, strings); both columns must share one type."""
    from ..engine.distinct import distinct_rows, ensure_hash_shuffle
    from ..engine.joins import hash_join

    ensure_hash_shuffle(edges)
    base = edges.map_batches(
        lambda t, _s=src, _d=dst: pa.table(
            {"src": t.column(_s), "dst": t.column(_d)}
        ),
        batch_format="pyarrow",
    )
    r = distinct_rows(base, ["src", "dst"], num_buckets=num_partitions)
    r = r.materialize()
    # fixpoint probe: the pair set is MONOTONE GROWING and each round
    # ends distinct, so an unchanged count means no new pairs — and
    # count() on a materialized Dataset is block metadata, no pass over
    # the data (cc.py needs its hash digest because labels change
    # without the row count changing; reachability does not)
    prev = r.count()
    if prev == 0:
        return r
    for _ in range(max_rounds):
        # compose: (a,b) ∘ (b,c) → (a,c); parent payload renamed so the
        # engine join's no-collision contract holds
        ren = r.map_batches(
            lambda t: pa.table(
                {"m_src": t.column("src"), "m_dst": t.column("dst")}
            ),
            batch_format="pyarrow",
        )
        comp = hash_join(
            r, ren, ["dst"], ["m_src"], num_partitions=num_partitions
        ).map_batches(
            lambda t: pa.table(
                {
                    "src": t.column("src").filter(
                        pc.is_valid(t.column("m_dst"))
                    )
                    if t.num_rows
                    else t.column("src"),
                    "dst": t.column("m_dst").filter(
                        pc.is_valid(t.column("m_dst"))
                    )
                    if t.num_rows
                    else t.column("m_dst"),
                }
            ),
            batch_format="pyarrow",
        )
        r = distinct_rows(
            r.union(comp), ["src", "dst"], num_buckets=num_partitions
        ).materialize()
        cur = r.count()
        if cur == prev:
            return r
        prev = cur
    import logging

    logging.getLogger(__name__).warning(
        "transitive_closure: no fixpoint after %d doubling rounds "
        "(diameter > 2^%d?); result covers paths up to that length",
        max_rounds, max_rounds,
    )
    return r


def p_plus(
    store_dir: str,
    predicate: str,
    num_partitions: int = 16,
    max_rounds: int = 16,
) -> rd.Dataset:
    """SPARQL ``pred+`` over a MATERIALIZED triple store →
    Dataset(src, dst, dst_kind): subjects reaching terms through ≥ 1
    hop of ``predicate``.  ``dst_kind`` carries the object's term kind
    (the engine's uint8 code) so IRI/bnode/literal endpoints stay
    distinguishable.

    Term-correct composition: the closure runs over the NON-LITERAL-
    object edges only (literals are never subjects, so they cannot be
    path-interior); literal-ended edges then extend it by one terminal
    hop — ``C ∪ E_lit ∪ (C ∘ E_lit)`` — via one broadcast-free co-hash
    join.  A literal spelling a node IRI therefore never splices paths.
    """
    from ..engine.distinct import distinct_rows
    from ..engine.joins import hash_join
    from ..sinks.triplestore import store_statements
    from ..terms import KIND_LITERAL

    trips = store_statements(store_dir, predicate=predicate)

    def split(lit: bool):
        def f(t: pa.Table) -> pa.Table:
            k = t.column("obj_kind")
            m = (
                pc.equal(k, KIND_LITERAL)
                if lit
                else pc.not_equal(k, KIND_LITERAL)
            )
            s = t.filter(pc.fill_null(m, False))
            return pa.table(
                {
                    "src": s.column("subj"),
                    "dst": s.column("obj"),
                    "dst_kind": s.column("obj_kind"),
                }
            )

        return f

    nonlit = trips.map_batches(split(False), batch_format="pyarrow")
    lit = trips.map_batches(split(True), batch_format="pyarrow")

    closure = transitive_closure(
        nonlit, num_partitions=num_partitions, max_rounds=max_rounds
    )
    # closure lost the kind column (generic operator) — every interior/
    # closure endpoint came from a non-literal edge, and IRIs vs bnodes
    # are distinguishable by the _: prefix (no IRI can carry it)
    from ..terms import KIND_BNODE, KIND_IRI

    def rekind(t: pa.Table) -> pa.Table:
        s = (
            t.column("dst").combine_chunks()
            if t.num_rows
            else pa.array([], pa.string())
        )
        k = pc.if_else(
            pc.starts_with(pc.fill_null(s, ""), "_:"),
            pa.scalar(KIND_BNODE, pa.uint8()),
            pa.scalar(KIND_IRI, pa.uint8()),
        )
        return pa.table(
            {"src": t.column("src"), "dst": t.column("dst"), "dst_kind": k}
        )

    closure_k = closure.map_batches(rekind, batch_format="pyarrow")

    # terminal literal hop: (a ⇒ b) ∘ (b → "lit") plus the 1-hop literal
    # edges themselves
    ren = lit.map_batches(
        lambda t: pa.table(
            {
                "m_src": t.column("src"),
                "m_dst": t.column("dst"),
                "m_kind": t.column("dst_kind"),
            }
        ),
        batch_format="pyarrow",
    )
    ext = hash_join(
        closure, ren, ["dst"], ["m_src"], num_partitions=num_partitions
    ).map_batches(
        lambda t: (
            lambda s: pa.table(
                {
                    "src": s.column("src"),
                    "dst": s.column("m_dst"),
                    "dst_kind": s.column("m_kind"),
                }
            )
        )(t.filter(pc.is_valid(t.column("m_dst"))))
        if t.num_rows
        else pa.table(
            {
                "src": pa.array([], pa.string()),
                "dst": pa.array([], pa.string()),
                "dst_kind": pa.array([], pa.uint8()),
            }
        ),
        batch_format="pyarrow",
    )
    return distinct_rows(
        closure_k.union(lit).union(ext),
        ["src", "dst", "dst_kind"],
        num_buckets=num_partitions,
    )


# ---------------------------------------------------------------------------
# Full SPARQL 1.1 §9.1 property-path ALGEBRA over a materialized store
# [graft extension — the reference Store answers single-hop
# get_statements only; path forms recalled from the public spec].
#
# Representation: a path relation is a Dataset(src, dst) whose node
# values are N-TRIPLES-FORMATTED TERM STRINGS ("<iri>", "_:label",
# '"lex"@lang' / '"lex"^^<dt>').  The formatting is injective across
# term kinds, so one string column carries full term identity:
#   - a literal's serialization can never equal an IRI's, so literals
#     never splice two path steps (the p_plus invariant for free);
#   - joins / closures / distincts are plain string-column operations —
#     transitive_closure above is reused UNCHANGED;
#   - output is directly comparable with SQL oracles that mint the same
#     lexical forms.
#
# Cardinality: pred / ^ / seq / alt / !(…) preserve DUPLICATES (SPARQL
# translates them to triple patterns + joins — bag semantics), while
# `+` / `*` / `?` are evaluated with SET semantics per the spec's
# arbitrary-length-path evaluation.  Zero-length paths (`*`, `?`) match
# every TERM IN THE GRAPH (all subjects and objects), per §18.4.
# ---------------------------------------------------------------------------

#: AST shapes accepted by :func:`eval_path` (also produced by
#: :func:`parse_path`):
#:   ("pred", iri)          — single predicate hop
#:   ("inv", p)             — ^p
#:   ("seq", p1, p2)        — p1 / p2
#:   ("alt", p1, p2)        — p1 | p2
#:   ("plus", p)            — p+
#:   ("star", p)            — p*
#:   ("opt", p)             — p?
#:   ("nps", [iri, ...])    — !(iri1 | iri2 | ...)


def parse_path(expr: str):
    """SPARQL §9.1 path syntax → tuple AST.  Supported: ``<iri>``,
    ``^``, ``/``, ``|``, postfix ``+ * ?``, ``!(<a>|<b>)`` / ``!<a>``,
    and parentheses.  Precedence per the grammar: ``|`` < ``/`` <
    unary ``^``/``!`` < postfix.  Fail-loud on anything else
    (CURIE-form path atoms are not accepted — pass full IRIs)."""
    toks: list[str] = []
    i, n = 0, len(expr)
    while i < n:
        c = expr[i]
        if c.isspace():
            i += 1
        elif c == "<":
            j = expr.index(">", i)
            toks.append(expr[i : j + 1])
            i = j + 1
        elif c in "^/|+*?!()":
            toks.append(c)
            i += 1
        else:
            raise ValueError(f"path syntax: unexpected {c!r} at {i} in {expr!r}")
    pos = 0

    def peek():
        return toks[pos] if pos < len(toks) else None

    def eat(t=None):
        nonlocal pos
        if pos >= len(toks) or (t is not None and toks[pos] != t):
            raise ValueError(
                f"path syntax: expected {t or 'token'} at #{pos} in {expr!r}"
            )
        pos += 1
        return toks[pos - 1]

    def p_alt():
        left = p_seq()
        while peek() == "|":
            eat("|")
            left = ("alt", left, p_seq())
        return left

    def p_seq():
        left = p_elt_or_inverse()
        while peek() == "/":
            eat("/")
            left = ("seq", left, p_elt_or_inverse())
        return left

    def p_elt_or_inverse():
        if peek() == "^":
            eat("^")
            return ("inv", p_elt())
        return p_elt()

    def p_elt():
        prim = p_primary()
        t = peek()
        if t in ("+", "*", "?"):
            eat()
            prim = ({"+": "plus", "*": "star", "?": "opt"}[t], prim)
        return prim

    def p_primary():
        t = peek()
        if t == "(":
            eat("(")
            inner = p_alt()
            eat(")")
            return inner
        if t == "!":
            eat("!")
            if peek() == "(":
                eat("(")
                iris = [eat()]
                while peek() == "|":
                    eat("|")
                    iris.append(eat())
                eat(")")
            else:
                iris = [eat()]
            bad = [x for x in iris if not (x.startswith("<") and x.endswith(">"))]
            if bad:
                raise ValueError(f"path syntax: !() accepts IRIs only, got {bad}")
            return ("nps", [x[1:-1] for x in iris])
        if t and t.startswith("<"):
            eat()
            return ("pred", t[1:-1])
        raise ValueError(f"path syntax: unexpected {t!r} in {expr!r}")

    ast = p_alt()
    if pos != len(toks):
        raise ValueError(f"path syntax: trailing tokens {toks[pos:]} in {expr!r}")
    return ast


def _source_statements(source, predicate: str | None = None) -> rd.Dataset:
    """Graph-source dispatch: a string is a materialized-store directory
    (``store_statements`` — bucket pruning + parquet filters); a LIST of
    strings is the federated UNION of member stores (each with its own
    pushdown; closure distincts collapse cross-store duplicates); a
    ``("graph_scope", store, g, default)`` wrapper restricts every edge
    read to ONE named context (or the nil context) — SPARQL GRAPH
    scope over paths, pushed as a parquet row filter; a
    ``(catalog, base)`` tuple is the Direct-Mapping VIRTUAL graph
    (``engine.lookup.get_statements`` — the bound predicate compiles
    only that column's triples map, so a path leaf scans one column)."""
    gkw: dict = {}
    if (
        isinstance(source, tuple)
        and len(source) == 4
        and source[0] == "graph_scope"
    ):
        _, source, g, dflt = source
        if not isinstance(source, (str, list)):
            raise ValueError(
                "GRAPH scope over paths needs a store source (the DM "
                "virtual graph has no named contexts)"
            )
        gkw = {"graph": g, "default_graph": dflt}
    if isinstance(source, str):
        from ..sinks.triplestore import store_statements

        return store_statements(source, predicate=predicate, **gkw)
    if isinstance(source, list):
        from ..sinks.triplestore import store_statements

        out = store_statements(source[0], predicate=predicate, **gkw)
        for d in source[1:]:
            out = out.union(store_statements(d, predicate=predicate, **gkw))
        return out
    catalog, base = source
    from ..engine.lookup import get_statements

    return get_statements(catalog, predicate=predicate, base=base)


def _rel_edges(
    source,
    predicate: str | None = None,
    exclude: Sequence[str] | None = None,
) -> rd.Dataset:
    """One-hop path relation from the graph source: (src, dst) as
    N-Triples term strings.  ``predicate`` prunes with the source's
    pushdown; ``exclude`` is the negated-property-set filter (applied
    batch-wise — NPS has no single-predicate pushdown by nature)."""
    from ..sinks.ntriples import format_terms_batch

    trips = _source_statements(source, predicate=predicate)
    ex = list(exclude or [])

    def f(t: pa.Table) -> pa.Table:
        if ex and t.num_rows:
            m = pc.invert(
                pc.is_in(t.column("pred"), value_set=pa.array(ex, pa.string()))
            )
            t = t.filter(m)
        ft = format_terms_batch(t)
        return pa.table({"src": ft.column("subj"), "dst": ft.column("obj")})

    return trips.map_batches(f, batch_format="pyarrow")


def _graph_terms(source, num_partitions: int) -> rd.Dataset:
    """All terms in the graph (distinct formatted subjects ∪ objects) —
    the zero-length-path node set per SPARQL §18.4."""
    from ..engine.distinct import distinct_rows
    from ..sinks.ntriples import format_terms_batch

    def f(t: pa.Table) -> pa.Table:
        ft = format_terms_batch(t)
        return pa.concat_tables(
            [
                pa.table({"t": ft.column("subj")}),
                pa.table({"t": ft.column("obj")}),
            ]
        )

    nodes = _source_statements(source).map_batches(f, batch_format="pyarrow")
    return distinct_rows(nodes, ["t"], num_buckets=num_partitions)


def _identity(store_dir: str, num_partitions: int) -> rd.Dataset:
    return _graph_terms(store_dir, num_partitions).map_batches(
        lambda t: pa.table({"src": t.column("t"), "dst": t.column("t")}),
        batch_format="pyarrow",
    )


def _compose(
    left: rd.Dataset, right: rd.Dataset, num_partitions: int
) -> rd.Dataset:
    """Bag-semantics sequence composition: (a,b) ∘ (b,c) → (a,c) via
    ONE union-tag co-hash inner join on the mid term (duplicates
    multiply, as SPARQL's triple-pattern translation requires)."""
    from ..engine.joins import hash_join

    ren = right.map_batches(
        lambda t: pa.table({"m_src": t.column("src"), "m_dst": t.column("dst")}),
        batch_format="pyarrow",
    )
    return hash_join(
        left, ren, ["dst"], ["m_src"],
        num_partitions=num_partitions, join_type="inner",
    ).map_batches(
        lambda t: pa.table({"src": t.column("src"), "dst": t.column("m_dst")}),
        batch_format="pyarrow",
    )


def eval_path(
    store_dir,
    path,
    num_partitions: int = 8,
    max_rounds: int = 16,
) -> rd.Dataset:
    """Evaluate a SPARQL §9.1 property-path expression over a graph
    source — a materialized-store directory, or a ``(catalog, base)``
    tuple for the Direct-Mapping VIRTUAL graph (no store needed; path
    leaves compile to single-column DM scans) — → lazy
    Dataset(src, dst) of N-Triples term strings (see the algebra notes
    above for representation and cardinality).  ``path`` is a tuple AST
    or a path-syntax string (parsed with :func:`parse_path`).

    Scale shape: leaves are predicate-pruned store scans; ``seq`` is
    one co-hash shuffle; ``alt`` a block union; ``+``/``*`` run the
    path-doubling closure (O(log diameter) rounds).  Nothing touches
    the driver; zero-length node sets stream through the distinct
    shuffle."""
    from ..engine.distinct import distinct_rows

    if isinstance(path, str):
        path = parse_path(path)

    def ev(p) -> rd.Dataset:
        op = p[0]
        if op == "pred":
            return _rel_edges(store_dir, predicate=p[1])
        if op == "nps":
            return _rel_edges(store_dir, exclude=p[1])
        if op == "inv":
            return ev(p[1]).map_batches(
                lambda t: pa.table(
                    {"src": t.column("dst"), "dst": t.column("src")}
                ),
                batch_format="pyarrow",
            )
        if op == "seq":
            return _compose(ev(p[1]), ev(p[2]), num_partitions)
        if op == "alt":
            return ev(p[1]).union(ev(p[2]))
        if op == "plus":
            return transitive_closure(
                ev(p[1]), num_partitions=num_partitions, max_rounds=max_rounds
            )
        if op == "star":
            closed = transitive_closure(
                ev(p[1]), num_partitions=num_partitions, max_rounds=max_rounds
            )
            return distinct_rows(
                closed.union(_identity(store_dir, num_partitions)),
                ["src", "dst"],
                num_buckets=num_partitions,
            )
        if op == "opt":
            return distinct_rows(
                ev(p[1]).union(_identity(store_dir, num_partitions)),
                ["src", "dst"],
                num_buckets=num_partitions,
            )
        raise ValueError(f"unknown path op {p!r}")

    return ev(path)

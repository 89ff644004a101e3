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

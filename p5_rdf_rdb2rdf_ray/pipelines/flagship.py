"""Flagship KG-construction pipeline over transcripts (SURVEY §3.4).

    read_parquet(transcripts)
      ├─ map_batches(CompiledMap)           # turn + conversation triples;
      │                                     #   turn→conv ref = join fast path
      ├─ map_batches(MentionScorer, …)      # actor pool: mentions + scores
      ├─ canonicalization                   # CC over alias edges → broadcast map
      ├─ map_batches(CompiledMap(mentions)) # mention bnodes + link triples
      ├─ union → distinct (s,p,o,g)         # RDF set semantics
      └─ sink (partitioned Parquet triple store / N-Triples)

Everything before the sink is lazy; Ray Data's streaming executor pipelines
all stages with backpressure. The only shuffle in the whole flagship is the
final distinct (the turn→conversation RefObjectMap rides the fast path, and
the canonical map is a broadcast dict, not a shuffle join).
"""

from __future__ import annotations

import ray
import ray.data as rd

from ..engine.distinct import distinct_triples
from ..engine.executor import CompiledMap
from ..mapping.spec import (
    BNODE,
    IRI,
    LITERAL,
    MappingSpec,
    PredObjSpec,
    RefObjectSpec,
    TermMapSpec,
    TriplesMapSpec,
)
from ..stages.cc import CanonicalMapper, cc_labels_small
from ..stages.mentions import MentionScorer, build_gazetteer
from .transcripts import alias_edges

BASE = "http://ex.org/"


def transcript_mapping(base: str = BASE) -> MappingSpec:
    """The flagship R2RML-style mapping (FIXTURES §A golden mapping):
    subject <{base}conv/{conv_id}/turn/{turn_idx}>, predicate maps for
    role/text/tool/ts, rdf:type ex:Turn, refobject ex:inConversation →
    <{base}conv/{conv_id}> (fast path), conversation node typed
    ex:Conversation."""
    turn_subject = TermMapSpec(
        kind=IRI, template=base + "conv/{conv_id}/turn/{turn_idx}"
    )
    conv_subject = TermMapSpec(kind=IRI, template=base + "conv/{conv_id}")
    turns = TriplesMapSpec(
        name="turns",
        table="transcripts",
        subject=turn_subject,
        classes=(base + "Turn",),
        pos=(
            PredObjSpec(
                pred=TermMapSpec(kind=IRI, constant=base + "role"),
                obj=TermMapSpec(kind=LITERAL, column="role"),
            ),
            PredObjSpec(
                pred=TermMapSpec(kind=IRI, constant=base + "text"),
                obj=TermMapSpec(kind=LITERAL, column="text"),
            ),
            PredObjSpec(
                pred=TermMapSpec(kind=IRI, constant=base + "tool"),
                obj=TermMapSpec(kind=LITERAL, column="tool"),
            ),
            PredObjSpec(
                pred=TermMapSpec(kind=IRI, constant=base + "ts"),
                obj=TermMapSpec(kind=LITERAL, column="ts"),
            ),
        ),
        refs=(
            RefObjectSpec(
                pred=TermMapSpec(kind=IRI, constant=base + "inConversation"),
                parent="convs",
                join=(("conv_id", "conv_id"),),
            ),
        ),
    )
    convs = TriplesMapSpec(
        name="convs",
        table="transcripts",
        subject=conv_subject,
        classes=(base + "Conversation",),
    )
    return MappingSpec(maps={"turns": turns, "convs": convs}, base=base)


def mention_mapping(base: str = BASE) -> TriplesMapSpec:
    """Mention/link triples over the MentionScorer output table:
    skolem mention bnode ← (conv_id, turn_idx, mention_idx);
    turn —hasMention→ mention; mention surface/score/linksTo(canonical)."""
    mention_node = TermMapSpec(
        kind=BNODE,
        skolem_scope="mention",
        skolem_cols=("conv_id", "turn_idx", "mention_idx"),
    )
    turn_node = TermMapSpec(kind=IRI, template=base + "conv/{conv_id}/turn/{turn_idx}")
    return TriplesMapSpec(
        name="mentions",
        table="mentions",
        subject=mention_node,
        classes=(base + "Mention",),
        pos=(
            PredObjSpec(  # turn —hasMention→ mention  (reversed emission)
                pred=TermMapSpec(kind=IRI, constant=base + "hasMention"),
                obj=turn_node,
                rev=True,
            ),
            PredObjSpec(
                pred=TermMapSpec(kind=IRI, constant=base + "surface"),
                obj=TermMapSpec(kind=LITERAL, column="surface"),
            ),
            PredObjSpec(
                pred=TermMapSpec(kind=IRI, constant=base + "score"),
                obj=TermMapSpec(kind=LITERAL, column="score"),
            ),
            PredObjSpec(
                pred=TermMapSpec(kind=IRI, constant=base + "linksTo"),
                obj=TermMapSpec(kind=IRI, template=base + "entity/{canonical_id}"),
            ),
        ),
    )


def _compiled_turn_map(base: str):
    """Turn triples map with the turn→conversation RefObjectMap folded in
    via the join fast path (parent IRI minted from child columns)."""
    from dataclasses import replace

    spec = transcript_mapping(base)
    turn_map = spec.maps["turns"]
    conv_subject = spec.maps["convs"].subject
    ref = turn_map.refs[0]
    rename = {p: c for c, p in ref.join}
    ref_pos = PredObjSpec(
        pred=ref.pred, obj=conv_subject.rename_columns(rename), rev=ref.rev
    )
    turn_map = replace(turn_map, pos=turn_map.pos + (ref_pos,), refs=())
    return CompiledMap(turn_map), CompiledMap(spec.maps["convs"])


class FlagshipExpander:
    """Single-pass actor stage: one transcript batch in → the COMPLETE
    triple batch out (turn + conversation + mention/link triples).

    One stage instead of three union branches means the input parquet is
    read ONCE (three branches each re-scan it — 3× decode at 100 TB), no
    union barrier, and the gazetteer/canonical-map state is loaded once
    per actor. This is the pipeline's only pass over the raw text."""

    def __init__(self, base: str, gaz_ref, canon_ref, scorer_kwargs=None):
        self.turn_cm, self.conv_cm = _compiled_turn_map(base)
        self.mention_cm = CompiledMap(mention_mapping(base))
        self.scorer = MentionScorer(gazetteer_ref=gaz_ref, **(scorer_kwargs or {}))
        self.canon = CanonicalMapper(mapping_ref=canon_ref)

    def __call__(self, batch) -> "pa.Table":
        import pyarrow as pa

        mentions = self.canon(self.scorer(batch))
        return pa.concat_tables(
            [
                self.turn_cm(batch),
                self.conv_cm(batch),
                self.mention_cm(mentions),
            ]
        ).combine_chunks()


def build_kg(
    transcripts: rd.Dataset,
    *,
    base: str = BASE,
    gazetteer: dict[str, str] | None = None,
    entity_edges: list[tuple[str, str]] | None = None,
    distinct: bool = True,
    distinct_buckets: int = 32,
    scorer_concurrency=(1, 8),
    scorer_batch_size: int = 4096,
) -> rd.Dataset:
    """Transcripts Dataset → KG triples Dataset (lazy until consumed)."""
    gaz = gazetteer if gazetteer is not None else build_gazetteer()
    gaz_ref = ray.put(gaz)
    # canonicalization: CC over the (small) entity alias graph → broadcast;
    # document-scale alias graphs go through stages.cc.connected_components
    edges = entity_edges if entity_edges is not None else alias_edges()
    canon = cc_labels_small(edges)
    canon_ref = ray.put(canon)

    ds = transcripts.map_batches(
        FlagshipExpander,
        fn_constructor_kwargs={
            "base": base,
            "gaz_ref": gaz_ref,
            "canon_ref": canon_ref,
        },
        batch_format="pyarrow",
        batch_size=scorer_batch_size,
        concurrency=scorer_concurrency,
        zero_copy_batch=True,
    )
    if distinct:
        ds = distinct_triples(ds, num_buckets=distinct_buckets)
    return ds

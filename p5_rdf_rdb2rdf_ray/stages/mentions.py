"""Mention detection + entity-link scoring (SURVEY §2 #20 — graft stage).

A stateful actor-pool stage: the gazetteer and compiled patterns are built
ONCE per actor in ``__init__`` (broadcast via ``ray.put`` — read from the
object store per actor, not shipped per batch), and each ``__call__``
processes one Arrow batch. Deterministic (seed-free scoring via crc32) so
task retries and resumed runs reproduce identical links.

Usage:

    gaz_ref = ray.put(build_gazetteer())
    mentions = transcripts.map_batches(
        MentionScorer,
        fn_constructor_kwargs={"gazetteer_ref": gaz_ref},
        batch_format="pyarrow", batch_size=4096, concurrency=(2, 8),
    )

Output rows: key columns (pass-through, e.g. conv_id/turn_idx),
mention_idx:int32, surface:string, entity_id:string, score:float64.
"""

from __future__ import annotations

import re
import zlib

import pyarrow as pa

DEFAULT_PATTERN = r"\[\[([A-Za-z0-9_]+)\]\]"


def build_gazetteer(surfaces: list[str] | None = None) -> dict[str, str]:
    """surface form → candidate entity id. Default: the FIXTURES §A
    gazetteer (Entity_0..63 + Alias_0..7, each its own candidate; alias
    resolution happens in the canonicalization stage)."""
    if surfaces is None:
        from ..pipelines.transcripts import gazetteer_surfaces

        surfaces = gazetteer_surfaces()
    return {s: s for s in surfaces}


def link_score(surface: str, entity_id: str) -> float:
    """Deterministic pseudo-score in [0.5, 1.0) — stands in for a link
    model; crc32-based, stable across processes/retries."""
    h = zlib.crc32(f"{surface}→{entity_id}".encode()) % 50
    # single division: (50+h)/100 is the closest double to the two-digit
    # decimal, so its shortest repr (and xsd:double canonical form) is exact
    return (50 + h) / 100.0


class MentionScorer:
    """Actor-pool stage: batched mention detection over a text column."""

    def __init__(
        self,
        gazetteer_ref=None,
        gazetteer: dict[str, str] | None = None,
        text_col: str = "text",
        key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
        pattern: str = DEFAULT_PATTERN,
    ):
        if gazetteer is None:
            if gazetteer_ref is not None:
                import ray

                gazetteer = ray.get(gazetteer_ref)
            else:
                gazetteer = build_gazetteer()
        self.gazetteer = gazetteer
        self.text_col = text_col
        self.key_cols = key_cols
        self.rx = re.compile(pattern)
        # precomputed per-surface entity/score maps: the "model" loaded once
        self.ent_map = dict(gazetteer)
        self.score_map = {s: link_score(s, e) for s, e in gazetteer.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pandas as pd

        s = batch.column(self.text_col).to_pandas()
        # C-driven regex sweep: (row, match#) MultiIndex of capture group 0
        m = s.str.extractall(self.rx)
        if len(m):
            surf = m[0]
            ent = surf.map(self.ent_map)
            keep = ent.notna()
            surf, ent = surf[keep], ent[keep]
        else:
            surf = ent = pd.Series([], dtype=object)
        rows = surf.index.get_level_values(0).to_numpy() if len(surf) else []
        # mention_idx counts only gazetteer hits, in match order per row
        midx = (
            surf.groupby(level=0).cumcount().to_numpy()
            if len(surf)
            else []
        )
        score = surf.map(self.score_map) if len(surf) else surf
        arrays: list[pa.Array] = []
        names: list[str] = []
        row_idx = pa.array(rows, pa.int64())
        for k in self.key_cols:
            arrays.append(batch.column(k).take(row_idx).combine_chunks())
            names.append(k)
        arrays += [
            pa.array(midx, pa.int32()),
            pa.Array.from_pandas(surf, type=pa.string()),
            pa.Array.from_pandas(ent, type=pa.string()),
            pa.Array.from_pandas(score, type=pa.float64()),
        ]
        names += ["mention_idx", "surface", "entity_id", "score"]
        return pa.Table.from_arrays(arrays, names=names)

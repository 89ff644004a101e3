"""Deterministic synthetic transcript generator (FIXTURES.md §A).

The primary input table per the driver's input_hint:

    conv_id:string, turn_idx:int32, role:string, text:string,
    tool:string (nullable), ts:timestamp[us]

Seeded (numpy Generator, seed=42 default), pure Python + pyarrow, no
external data. ``write_transcripts`` shards the table over several parquet
files — the unit of checkpoint/resume sharding in the flagship pipeline.
"""

from __future__ import annotations

import datetime as dt
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

TRANSCRIPT_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("role", pa.string()),
        pa.field("text", pa.string()),
        pa.field("tool", pa.string()),
        pa.field("ts", pa.timestamp("us")),
    ]
)

N_ENTITIES = 64
N_ALIASES = 8
EPOCH = dt.datetime(2026, 1, 1, 0, 0, 0)

_FILLER = [
    "let us discuss the plan",
    "running the requested analysis",
    "here is the result you asked for",
    "could you clarify the requirement",
    "invoking the tool with the given arguments",
    "summarizing the previous steps",
]


def gazetteer_surfaces() -> list[str]:
    """All gazetteer surface forms: Entity_0..63 plus Alias_0..7."""
    return [f"Entity_{k}" for k in range(N_ENTITIES)] + [
        f"Alias_{k}" for k in range(N_ALIASES)
    ]


def alias_edges() -> list[tuple[str, str]]:
    """Alias_k ≡ Entity_k for k < 8 → non-trivial CC clusters."""
    return [(f"Alias_{k}", f"Entity_{k}") for k in range(N_ALIASES)]


def generate_transcripts(
    n_convs: int,
    seed: int = 42,
    skew: bool = False,
    turns_lo: int = 1,
    turns_hi: int = 6,
) -> pa.Table:
    rng = np.random.default_rng(seed)
    conv_ids: list[str] = []
    turn_idxs: list[int] = []
    roles: list[str] = []
    texts: list[str] = []
    tools: list[str | None] = []
    tss: list[dt.datetime] = []

    def emit_conv(conv_no: int, cid: str, n_turns: int, hot: bool) -> None:
        for ti in range(n_turns):
            if ti == 0 and conv_no % 5 == 0:
                role = "system"
            elif ti % 7 == 6:
                role = "tool"
            else:
                role = "user" if ti % 2 == 0 else "assistant"
            mentions: list[str] = []
            if hot and rng.random() < 0.5:
                mentions.append("[[Entity_0]]")
            k = int(rng.integers(0, 4))
            for _ in range(k):
                eid = int(rng.integers(0, N_ENTITIES))
                if eid < N_ALIASES and rng.random() < 0.5:
                    mentions.append(f"[[Alias_{eid}]]")
                else:
                    mentions.append(f"[[Entity_{eid}]]")
            filler = _FILLER[int(rng.integers(0, len(_FILLER)))]
            text = f"turn {ti} of {cid}: {filler}"
            if mentions:
                text += " " + " ".join(mentions)
            conv_ids.append(cid)
            turn_idxs.append(ti)
            roles.append(role)
            texts.append(text)
            tools.append(f"tool_{ti % 5}" if role == "tool" else None)
            tss.append(EPOCH + dt.timedelta(seconds=conv_no * 3600 + ti * 13))

    for i in range(n_convs):
        n_turns = int(rng.integers(turns_lo, turns_hi + 1))
        emit_conv(i, f"c{i:06d}", n_turns, hot=False)
    if skew:
        emit_conv(n_convs, f"c{n_convs:06d}", 10_000, hot=True)

    return pa.Table.from_arrays(
        [
            pa.array(conv_ids, pa.string()),
            pa.array(turn_idxs, pa.int32()),
            pa.array(roles, pa.string()),
            pa.array(texts, pa.string()),
            pa.array(tools, pa.string()),
            pa.array(tss, pa.timestamp("us")),
        ],
        schema=TRANSCRIPT_SCHEMA,
    )


def write_transcripts(
    out_dir: str,
    n_convs: int,
    num_files: int = 8,
    seed: int = 42,
    skew: bool = False,
) -> list[str]:
    """Shard by conversation across ``num_files`` parquet files (a conv
    never spans files — the resume shard unit keeps conv-local work local).
    Returns the file list."""
    os.makedirs(out_dir, exist_ok=True)
    t = generate_transcripts(n_convs, seed=seed, skew=skew)
    # conv_no → file by modulo; stable, conversation-aligned
    conv = t.column("conv_id").to_pylist()
    assign = np.array([int(c[1:]) % num_files for c in conv])
    paths: list[str] = []
    for f in range(num_files):
        idx = np.flatnonzero(assign == f)
        part = t.take(pa.array(idx))
        p = os.path.join(out_dir, f"transcripts-{f:05d}.parquet")
        pq.write_table(part, p)
        paths.append(p)
    return paths

"""Flagship transcript→KG pipeline vs independent golden (FIXTURES §A)."""

import pyarrow as pa
import pytest
import ray.data as rd

from p5_rdf_rdb2rdf_ray.pipelines.flagship import BASE, build_kg
from p5_rdf_rdb2rdf_ray.pipelines.transcripts import generate_transcripts
from p5_rdf_rdb2rdf_ray.sinks.ntriples import collect_ntriples

from .golden_kg import golden_kg_lines, precision_recall


@pytest.fixture(scope="module")
def tiny():
    return generate_transcripts(8, seed=42)


def test_flagship_matches_golden(ray_session, tiny):
    ds = rd.from_arrow(tiny)
    got = set(collect_ntriples(build_kg(ds, distinct_buckets=4)))
    want = golden_kg_lines(tiny, BASE)
    p, r = precision_recall(got, want)
    assert p == 1.0 and r == 1.0, (
        f"P={p:.3f} R={r:.3f}\nmissing: {sorted(want - got)[:5]}\n"
        f"extra: {sorted(got - want)[:5]}"
    )


def test_flagship_small_pr(ray_session):
    small = generate_transcripts(200, seed=42)
    got = set(collect_ntriples(build_kg(rd.from_arrow(small), distinct_buckets=8)))
    want = golden_kg_lines(small, BASE)
    p, r = precision_recall(got, want)
    assert p >= 0.95 and r >= 0.95, f"P={p} R={r}"  # north-rule gate
    assert p == 1.0 and r == 1.0  # we hold ourselves to exact


def test_per_turn_text_byte_equality(ray_session, tiny):
    """North-rule invariant: per-turn text byte-equality under stable
    (conv_id, turn_idx) ordering."""
    ds = rd.from_arrow(tiny)
    kg = build_kg(ds, distinct_buckets=4)
    text_triples = kg.filter(
        expr=f"pred == '{BASE}text'"
    ).to_pandas()
    # decode turn subject back to (conv_id, turn_idx) and order
    import re

    pat = re.compile(re.escape(BASE) + r"conv/(c\d+)/turn/(\d+)$")
    text_triples[["conv_id", "turn_idx"]] = text_triples["subj"].str.extract(pat)
    text_triples["turn_idx"] = text_triples["turn_idx"].astype(int)
    got = (
        text_triples.sort_values(["conv_id", "turn_idx"])["obj"]
        .tolist()
    )
    src = tiny.to_pandas().sort_values(["conv_id", "turn_idx"])["text"].tolist()
    assert got == src  # byte-identical, zero-copy path


def test_skew_variant_completes(ray_session):
    skew = generate_transcripts(20, seed=42, skew=True)
    assert skew.num_rows > 10_000
    ds = rd.from_arrow(skew)
    kg = build_kg(ds, distinct_buckets=8)
    n = kg.count()
    want = golden_kg_lines(skew, BASE)
    assert n == len(want)

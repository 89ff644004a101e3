"""Turtle serializer sink: round-trip through our own Turtle parser
(serialize → parse → identical triple set as the N-Triples sink)."""

import glob
import os

import ray.data as rd

from p5_rdf_rdb2rdf_ray.mapping.turtle import parse_turtle
from p5_rdf_rdb2rdf_ray.pipelines.flagship import build_kg
from p5_rdf_rdb2rdf_ray.pipelines.transcripts import write_transcripts
from p5_rdf_rdb2rdf_ray.sinks.ntriples import collect_ntriples
from p5_rdf_rdb2rdf_ray.sinks.turtle import collect_turtle, write_turtle

from p5_rdf_rdb2rdf_ray.functions.scalars import ntriples_escape


def _parsed_to_ntriples(graph) -> set[str]:
    out = set()
    for s, p, o in graph.triples:
        def term(t):
            if t[0] == "iri":
                return f"<{t[1]}>"
            if t[0] == "bnode":
                return f"_:{t[1]}"
            v = f'"{ntriples_escape(t[1])}"'
            if t[2]:
                v += f"@{t[2]}"
            elif t[3]:
                v += f"^^<{t[3]}>"
            return v

        out.add(f"{term(s)} {term(p)} {term(o)} .")
    return out


def test_turtle_roundtrip_flagship(ray_session, tmp_path):
    tx = str(tmp_path / "tx")
    write_transcripts(tx, n_convs=12, num_files=2, seed=7)
    kg = build_kg(rd.read_parquet(tx), distinct_buckets=4)
    want = set(collect_ntriples(kg))

    kg2 = build_kg(rd.read_parquet(tx), distinct_buckets=4)
    ttl = collect_turtle(kg2, prefixes={"ex": "http://ex.org/"})
    g, _ = parse_turtle(ttl)
    got = _parsed_to_ntriples(g)
    assert got == want, (
        f"missing={list(want - got)[:3]} extra={list(got - want)[:3]}"
    )


def test_write_turtle_parts_parse(ray_session, tmp_path):
    tx = str(tmp_path / "tx")
    write_transcripts(tx, n_convs=8, num_files=2, seed=9)
    kg = build_kg(rd.read_parquet(tx), distinct_buckets=4)
    want = set(collect_ntriples(kg))

    out = str(tmp_path / "ttl")
    kg2 = build_kg(rd.read_parquet(tx), distinct_buckets=4)
    nblocks = write_turtle(kg2, out, prefixes={"ex": "http://ex.org/"})
    assert nblocks > 0
    got: set[str] = set()
    for f in glob.glob(os.path.join(out, "part-*.ttl")):
        g, _ = parse_turtle(open(f, encoding="utf-8").read())
        got |= _parsed_to_ntriples(g)
    assert got == want


def test_ntriples_reader_roundtrip(ray_session, tmp_path):
    """write_ntriples → read_ntriples: the re-parsed triples re-serialize
    to the identical line set (source/sink symmetry)."""
    from p5_rdf_rdb2rdf_ray.sinks.ntriples import read_ntriples, write_ntriples

    tx = str(tmp_path / "tx")
    write_transcripts(tx, n_convs=10, num_files=2, seed=5)
    kg = build_kg(rd.read_parquet(tx), distinct_buckets=4)
    want = set(collect_ntriples(kg))

    out = str(tmp_path / "nt")
    kg2 = build_kg(rd.read_parquet(tx), distinct_buckets=4)
    n = write_ntriples(kg2, out)
    assert n == len(want)
    back = read_ntriples(out)
    got = set(collect_ntriples(back))
    assert got == want


def test_nquads_reader_roundtrip(ray_session, tmp_path):
    """Named-graph data: the quad lines write_ntriples emits parse back
    with the graph column intact (including bnode graphs and a mixed
    default-graph row)."""
    import pyarrow as pa

    from p5_rdf_rdb2rdf_ray.sinks.ntriples import read_ntriples, write_ntriples
    from p5_rdf_rdb2rdf_ray.terms import TRIPLE_SCHEMA

    t = pa.Table.from_pydict(
        {
            "subj": ["http://ex.org/s1", "_:b0", "http://ex.org/s2",
                     "http://ex.org/s3"],
            "pred": ["http://ex.org/p"] * 4,
            "obj": ["http://ex.org/o", 'va"l\n', "x", "_:ob"],
            "obj_kind": pa.array([0, 2, 2, 1], pa.uint8()),
            "lang": [None, None, "en", None],
            "datatype": [None, "http://www.w3.org/2001/XMLSchema#string",
                         None, None],
            "graph": ["http://ex.org/g1", "http://ex.org/g2", None, "_:g"],
        },
        schema=TRIPLE_SCHEMA,
    )
    out = str(tmp_path / "nq")
    assert write_ntriples(rd.from_arrow(t), out) == 4
    back = read_ntriples(out).take_all()
    want = {tuple(r.values()) for r in t.to_pylist()}
    got = {tuple(r.values()) for r in back}
    assert got == want


def test_read_turtle_dataset_roundtrip(ray_session, tmp_path):
    """write_turtle directory → read_turtle Dataset → identical triple
    set (full TRIPLE_SCHEMA columns, graph all-null)."""
    tx = str(tmp_path / "tx")
    write_transcripts(tx, n_convs=10, num_files=2, seed=11)
    kg = build_kg(rd.read_parquet(tx), distinct_buckets=4)
    want = set(collect_ntriples(kg))

    out = str(tmp_path / "ttl")
    kg2 = build_kg(rd.read_parquet(tx), distinct_buckets=4)
    write_turtle(kg2, out, prefixes={"ex": "http://ex.org/"})
    assert len(glob.glob(os.path.join(out, "part-*.ttl"))) >= 1

    from p5_rdf_rdb2rdf_ray.sinks.turtle import read_turtle

    back = read_turtle(out)
    got = set(collect_ntriples(back))
    assert got == want, (
        f"missing={list(want - got)[:3]} extra={list(got - want)[:3]}"
    )

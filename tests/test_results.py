"""W3C SPARQL results serializers (sinks/results.py): CSV / TSV / JSON
round-trips against the bindings a query returns."""

from __future__ import annotations

import csv
import glob
import json

import pyarrow as pa
import pytest
import ray.data as rd

from p5_rdf_rdb2rdf_ray.sinks.results import (
    ask_results_json,
    write_results_csv,
    write_results_json,
    write_results_tsv,
)
from p5_rdf_rdb2rdf_ray.terms import KIND_IRI, KIND_LITERAL


@pytest.fixture(scope="module")
def bindings(ray_session):
    """Bindings with every serializer-relevant shape: IRIs, literals
    needing CSV quoting and NT escapes, an unbound (NULL) OPTIONAL
    value, and a bnode — plus the hidden __k_ kind column on ?v."""
    t = pa.table(
        {
            "s": ["http://x/a", "http://x/b", "_:blank"],
            "v": ['say "hi", ok?', "plain", "http://x/a"],
            "__k_v": pa.array(
                [KIND_LITERAL, KIND_LITERAL, KIND_IRI], pa.uint8()
            ),
            "opt": pa.array(["yes", None, "line\nbreak"], pa.string()),
            # NULL kind on the unbound row (what an OPTIONAL var's
            # kind column carries); vars WITHOUT a __k_ column are, by
            # the engine's invariant, non-literal-position bindings —
            # the serializers derive IRIs/bnodes from the surface form
            "__k_opt": pa.array(
                [KIND_LITERAL, None, KIND_LITERAL], pa.uint8()
            ),
        }
    )
    return rd.from_arrow(t)


def _expect_rows():
    return [
        ("http://x/a", 'say "hi", ok?', "yes"),
        ("http://x/b", "plain", ""),
        ("_:blank", "http://x/a", "line\nbreak"),
    ]


def test_results_csv(bindings, tmp_path):
    # single_file: standards-exact one document
    p = str(tmp_path / "out.csv")
    n = write_results_csv(bindings, p, single_file=True)
    assert n == 3
    with open(p, newline="", encoding="utf-8") as f:
        rows = list(csv.reader(f))
    assert rows[0] == ["s", "v", "opt"]
    assert sorted(map(tuple, rows[1:])) == sorted(_expect_rows())
    # sharded: every part standalone, header repeated
    d = str(tmp_path / "shards_csv")
    n2 = write_results_csv(bindings.repartition(2), d)
    assert n2 == 3
    got = []
    for part in glob.glob(d + "/part-*.csv"):
        with open(part, newline="", encoding="utf-8") as f:
            r = list(csv.reader(f))
        assert r[0] == ["s", "v", "opt"]
        got.extend(map(tuple, r[1:]))
    assert sorted(got) == sorted(_expect_rows())


def test_results_tsv(bindings, tmp_path):
    p = str(tmp_path / "out.tsv")
    assert write_results_tsv(bindings, p, single_file=True) == 3
    lines = open(p, encoding="utf-8").read().split("\n")
    assert lines[0] == "?s\t?v\t?opt"
    body = sorted(l.split("\t") for l in lines[1:] if l)
    # kinds come from the __k_ columns; ?s derives from the surface
    # form (IRI / _:bnode), and NT escapes cover the embedded newline
    assert ["<http://x/a>", '"say \\"hi\\", ok?"', '"yes"'] in body
    assert ["<http://x/b>", '"plain"', ""] in body
    assert ["_:blank", "<http://x/a>", '"line\\nbreak"'] in body


def test_results_json(bindings, tmp_path):
    p = str(tmp_path / "out.json")
    assert write_results_json(bindings, p, single_file=True) == 3
    doc = json.load(open(p, encoding="utf-8"))
    assert doc["head"]["vars"] == ["s", "v", "opt"]
    bs = doc["results"]["bindings"]
    assert len(bs) == 3
    by_s = {b["s"]["value"]: b for b in bs}
    assert by_s["http://x/a"]["s"]["type"] == "uri"
    assert by_s["http://x/a"]["v"] == {
        "type": "literal", "value": 'say "hi", ok?'
    }
    assert by_s["_:blank"]["s"]["type"] == "bnode"
    assert by_s["_:blank"]["v"]["type"] == "uri"  # __k_v says IRI
    assert "opt" not in by_s["http://x/b"]  # unbound var omitted
    # sharded parts each a valid document
    d = str(tmp_path / "shards_json")
    assert write_results_json(bindings.repartition(2), d) == 3
    tot = 0
    for part in glob.glob(d + "/part-*.json"):
        sub = json.load(open(part, encoding="utf-8"))
        assert sub["head"]["vars"] == ["s", "v", "opt"]
        tot += len(sub["results"]["bindings"])
    assert tot == 3


def test_results_from_query(ray_session, tmp_path):
    """End-to-end: a textual SELECT's bindings serialize to all three
    formats with consistent values."""
    from p5_rdf_rdb2rdf_ray.engine.sparql import sparql
    from p5_rdf_rdb2rdf_ray.pipelines.queries_kg import BASE, catalog_for

    ds = sparql(
        catalog_for("/root/testdata/sf0.001"),
        f"SELECT ?n ?r WHERE {{ ?n <{BASE}nation#ref-n_regionkey> ?r }}",
        base=BASE,
    )
    p = str(tmp_path / "q.json")
    n = write_results_json(ds, p, single_file=True)
    doc = json.load(open(p, encoding="utf-8"))
    assert n == len(doc["results"]["bindings"]) == 25
    assert all(
        b["n"]["type"] == "uri" and b["r"]["type"] == "uri"
        for b in doc["results"]["bindings"]
    )


def test_ask_results_json():
    assert json.loads(ask_results_json(True)) == {
        "head": {}, "boolean": True
    }

"""Factory API parity — the reference's primary entry point
[R: RDB2RDF.pm :: new/process/process_turtle] through all three
front-ends, including the distinct="auto" default."""

import pyarrow as pa

from p5_rdf_rdb2rdf_ray.api import RDB2RDF
from p5_rdf_rdb2rdf_ray.sources.catalog import Catalog, TableLayout

B = "http://api.test/"

BOOKS = pa.table(
    {
        "book_id": pa.array([1, 2], pa.int64()),
        "title": pa.array(["Moby Dick", "Perl & RDF"]),
    }
)


def _cat():
    return Catalog(
        root="",
        tables={"books": BOOKS},
        layouts={"books": TableLayout(pkey=("book_id",))},
    )


def test_simple_front_end(ray_session):
    m = RDB2RDF(
        "Simple",
        {"books": {"about": "book/{book_id}", "columns": {
            "title": [{"property": "dc:title"}]}}},
        base=B,
        namespaces={"dc": "http://purl.org/dc/terms/"},
    )
    lines = m.process_ntriples(_cat())
    assert f'<{B}book/1> <http://purl.org/dc/terms/title> "Moby Dick" .' in lines
    assert len(lines) == len(set(lines)) == 2


def test_r2rml_front_end_auto_distinct(ray_session):
    ttl = f"""
    @prefix rr: <http://www.w3.org/ns/r2rml#> .
    @prefix ex: <{B}> .
    <#m> rr:logicalTable [ rr:tableName "books" ] ;
      rr:subjectMap [ rr:template "{B}b/{{book_id}}" ; rr:class ex:Book ] ;
      rr:predicateObjectMap [ rr:predicate ex:t ;
                              rr:objectMap [ rr:column "title" ] ] .
    """
    m = RDB2RDF("R2RML", ttl, base=B)
    auto = sorted(m.process_ntriples(_cat()))
    forced = sorted(m.process_ntriples(_cat(), distinct=True))
    assert auto == forced and len(auto) == 4  # 2 rows × (type + title)


def test_direct_mapping_front_end(ray_session):
    m = RDB2RDF("DirectMapping", prefix=B, rdfs=True)
    lines = m.process_ntriples(_cat())
    assert len(lines) == len(set(lines))
    assert f'<{B}books/book_id=1> <{B}books#title> "Moby Dick" .' in lines
    # rdfs=>1 schema triples ride along
    assert any("rdf-schema#label" in l for l in lines)

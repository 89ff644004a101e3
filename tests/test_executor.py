"""Executor tests: Simple-mapping semantics, batch-wise (FIXTURES §C-style)."""

import datetime as dt
from decimal import Decimal

import pyarrow as pa
import pytest

from p5_rdf_rdb2rdf_ray.engine.executor import CompiledMap
from p5_rdf_rdb2rdf_ray.engine.runner import run_mapping
from p5_rdf_rdb2rdf_ray.mapping.spec import compile_simple
from p5_rdf_rdb2rdf_ray.sinks.ntriples import collect_ntriples, table_to_ntriples
from p5_rdf_rdb2rdf_ray.sources.catalog import Catalog, TableLayout

from .graph_compare import diff, graphs_equal

EX = "http://ex.com/"

BOOKS = pa.table(
    {
        "book_id": pa.array([1, 2, 3], pa.int64()),
        "title": pa.array(["Moby Dick", "Perl & RDF", None]),
        "price": pa.array([Decimal("10.50"), Decimal("2.00"), None], pa.decimal128(10, 2)),
        "in_print": pa.array([True, False, None]),
        "pub_date": pa.array([dt.date(2001, 2, 3), None, dt.date(2020, 1, 1)], pa.date32()),
        "author_id": pa.array([10, 20, None], pa.int64()),
    }
)

AUTHORS = pa.table(
    {
        "author_id": pa.array([10, 20], pa.int64()),
        "name": pa.array(["Herman", "Toby"]),
        "home": pa.array(["NY", "UK"]),
    }
)


def simple_spec(**over):
    m = {
        "book": {
            "about": "book/{book_id}",
            "typeof": "ex:Book",
            "columns": {
                "title": [{"property": "dc:title", "lang": "en"}],
                "price": [{"property": "ex:price"}],
                "in_print": [{"property": "ex:inPrint"}],
                "pub_date": [{"property": "ex:published"}],
                "author_id": [{"rel": "ex:author", "resource": "author/{author_id}"}],
            },
        }
    }
    m["book"].update(over)
    return compile_simple(
        m, base=EX, namespaces={"ex": EX, "dc": "http://purl.org/dc/terms/"}
    )


def test_expand_batch_golden():
    spec = simple_spec()
    out = CompiledMap(spec.maps["book"]).expand_batch(BOOKS)
    lines = set(table_to_ntriples(out))
    b = f"<{EX}book/"
    expected = {
        f"{b}1> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <{EX}Book> .",
        f"{b}2> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <{EX}Book> .",
        f"{b}3> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <{EX}Book> .",
        f'{b}1> <http://purl.org/dc/terms/title> "Moby Dick"@en .',
        f'{b}2> <http://purl.org/dc/terms/title> "Perl & RDF"@en .',
        f'{b}1> <{EX}price> "10.5"^^<http://www.w3.org/2001/XMLSchema#decimal> .',
        f'{b}2> <{EX}price> "2.0"^^<http://www.w3.org/2001/XMLSchema#decimal> .',
        f'{b}1> <{EX}inPrint> "true"^^<http://www.w3.org/2001/XMLSchema#boolean> .',
        f'{b}2> <{EX}inPrint> "false"^^<http://www.w3.org/2001/XMLSchema#boolean> .',
        f'{b}1> <{EX}published> "2001-02-03"^^<http://www.w3.org/2001/XMLSchema#date> .',
        f'{b}3> <{EX}published> "2020-01-01"^^<http://www.w3.org/2001/XMLSchema#date> .',
        f"{b}1> <{EX}author> <{EX}author/10> .",
        f"{b}2> <{EX}author> <{EX}author/20> .",
    }
    assert lines == expected, diff(lines, expected)


def test_rev_and_constant_and_udf():
    def shout(cols, n):
        import pyarrow.compute as pc

        return pc.utf8_upper(cols["title"])

    spec = compile_simple(
        {
            "book": {
                "about": "book/{book_id}",
                "columns": {
                    "author_id": [
                        {"rev": "ex:wrote", "resource": "author/{author_id}"}
                    ],
                    "title": [{"property": "ex:shout", "udf": shout}],
                },
            }
        },
        base=EX,
        namespaces={"ex": EX},
    )
    lines = set(
        table_to_ntriples(CompiledMap(spec.maps["book"]).expand_batch(BOOKS))
    )
    assert f"<{EX}author/10> <{EX}wrote> <{EX}book/1> ." in lines
    assert f'<{EX}book/1> <{EX}shout> "MOBY DICK" .' in lines
    # NULL author suppressed even reversed
    assert not any("book/3" in l and "wrote" in l for l in lines)


def test_named_graph_quads():
    spec = simple_spec(graph="ex:g1")
    lines = set(
        table_to_ntriples(CompiledMap(spec.maps["book"]).expand_batch(BOOKS))
    )
    assert (
        f'<{EX}book/1> <http://purl.org/dc/terms/title> "Moby Dick"@en <{EX}g1> .'
        in lines
    )


def test_bnode_subject_pk_skolem(ray_session):
    cat = Catalog(
        root="", tables={"book": BOOKS}, layouts={"book": TableLayout(pkey=("book_id",))}
    )
    spec = compile_simple(
        {"book": {"about": None, "typeof": "ex:Book"}}, base=EX, namespaces={"ex": EX}
    )
    lines = collect_ntriples(run_mapping(spec, cat))
    assert set(lines) == {
        "_:sk-book-1 <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://ex.com/Book> .",
        "_:sk-book-2 <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://ex.com/Book> .",
        "_:sk-book-3 <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://ex.com/Book> .",
    }


def test_bnode_subject_rowid_distinct_rows(ray_session):
    # duplicate rows in a no-PK table must yield DISTINCT bnodes (W3C-DM §2)
    t = pa.table({"a": ["x", "x", "y"], "b": [1, 1, 2]})
    cat = Catalog(root="", tables={"t": t})
    spec = compile_simple(
        {"t": {"about": None, "columns": {"a": [{"property": "ex:a"}]}}},
        base=EX,
        namespaces={"ex": EX},
    )
    lines = collect_ntriples(run_mapping(spec, cat))
    subj = {l.split(" ")[0] for l in lines}
    assert len(subj) == 3  # three distinct row bnodes, dedup must NOT merge


def test_run_mapping_union_distinct(ray_session):
    cat = Catalog(root="", tables={"book": BOOKS, "author": AUTHORS})
    spec = compile_simple(
        {
            "book": {
                "about": "book/{book_id}",
                "typeof": "ex:Book",
                "columns": {"title": [{"property": "ex:title"}]},
            },
            "author": {
                "about": "author/{author_id}",
                "typeof": "ex:Author",
                "columns": {"name": [{"property": "ex:name"}]},
            },
        },
        base=EX,
        namespaces={"ex": EX},
    )
    lines = collect_ntriples(run_mapping(spec, cat))
    assert f'<{EX}author/20> <{EX}name> "Toby" .' in lines
    assert len(lines) == len(set(lines))
    assert len(set(lines)) == 3 + 2 + 2 + 2  # book types+titles, author types+names


def test_distinct_collapses_duplicate_maps(ray_session):
    cat = Catalog(root="", tables={"book": BOOKS})
    spec = compile_simple(
        {
            "book": {
                "about": "book/{book_id}",
                "columns": {
                    "title": [
                        {"property": "ex:title"},
                        {"property": "ex:title"},  # duplicate map
                    ]
                },
            }
        },
        base=EX,
        namespaces={"ex": EX},
    )
    lines = collect_ntriples(run_mapping(spec, cat))
    assert len(lines) == len(set(lines)) == 2


def test_graph_compare_helper():
    a = {"_:x <p> <o> .", "<s> <p> _:x ."}
    b = {"_:zz <p> <o> .", "<s> <p> _:zz ."}
    c = {"_:zz <p> <o> .", "<s> <q> _:zz ."}
    assert graphs_equal(a, b)
    assert not graphs_equal(a, c)

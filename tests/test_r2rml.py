"""R2RML Turtle front-end tests (FIXTURES.md §C; W3C-R2RML §§6–11)."""

import datetime as dt
from decimal import Decimal

import pyarrow as pa
import pytest

from p5_rdf_rdb2rdf_ray.engine.runner import run_mapping
from p5_rdf_rdb2rdf_ray.mapping.r2rml import compile_r2rml
from p5_rdf_rdb2rdf_ray.mapping.turtle import parse_turtle
from p5_rdf_rdb2rdf_ray.sinks.ntriples import collect_ntriples
from p5_rdf_rdb2rdf_ray.sources.catalog import Catalog

from .graph_compare import diff

EX = "http://ex.com/"
TY = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

BOOKS = pa.table(
    {
        "book_id": pa.array([1, 2], pa.int64()),
        "title": pa.array(["Moby Dick", "Perl & RDF"]),
        "price": pa.array([Decimal("10.50"), None], pa.decimal128(10, 2)),
        "pub_date": pa.array([dt.date(2001, 2, 3), None], pa.date32()),
        "author_id": pa.array([10, 20], pa.int64()),
    }
)
AUTHORS = pa.table(
    {
        "author_id": pa.array([10, 20], pa.int64()),
        "name": pa.array(["Herman", "Toby"]),
    }
)


@pytest.fixture(scope="module")
def cat():
    return Catalog(root="", tables={"books": BOOKS, "authors": AUTHORS})


def run_ttl(ttl, cat):
    spec = compile_r2rml(ttl, base=EX)
    return set(collect_ntriples(run_mapping(spec, cat)))


def test_turtle_parser_basics():
    g, pfx = parse_turtle(
        """
        @prefix ex: <http://ex.com/> .
        @prefix rr: <http://www.w3.org/ns/r2rml#> .
        ex:s a ex:T ;
            ex:p "lit"@en , "typed"^^ex:dt ;
            ex:q [ ex:r 4 ; ex:s true ] .
        """
    )
    assert pfx["ex"] == "http://ex.com/"
    assert (("iri", EX + "s"), ("iri", TY), ("iri", EX + "T")) in g.triples
    lits = [o for (_, p, o) in g.triples if p == ("iri", EX + "p")]
    assert ("lit", "lit", "en", None) in lits
    assert ("lit", "typed", None, EX + "dt") in lits


def test_turtle_parser_literal_breadth():
    """Round-4 robustness pass: all four string quote forms (multi-line
    long forms, escapes spanning lines), Turtle-grammar numeric typing
    (integer / decimal / double incl. leading-dot and exponent), and
    fail-LOUD errors for the unsupported constructs (collections,
    literal subjects) instead of misparses."""
    import pytest as _pytest

    XSD = "http://www.w3.org/2001/XMLSchema#"
    g, _ = parse_turtle(
        """
        @prefix ex: <http://ex.com/> .
        ex:s ex:sq 'single' ;
             ex:sq3 '''multi
line''' ;
             ex:dq3 \"\"\"dq multi
line \\"quoted\\"\"\"\" ;
             ex:nums 7 , -3 , 4.25 , .5 , 2e3 , -1.5E-2 .
        """
    )
    lits = {o for (_, p, o) in g.triples}
    assert ("lit", "single", None, None) in lits
    assert ("lit", "multi\nline", None, None) in lits
    assert ("lit", 'dq multi\nline "quoted"', None, None) in lits
    nums = {
        (o[1], o[3]) for (_, p, o) in g.triples
        if p == ("iri", "http://ex.com/nums")
    }
    assert nums == {
        ("7", XSD + "integer"),
        ("-3", XSD + "integer"),
        ("4.25", XSD + "decimal"),
        (".5", XSD + "decimal"),
        ("2e3", XSD + "double"),
        ("-1.5E-2", XSD + "double"),
    }
    # Turtle DECIMAL requires a digit after the dot, so `1.` must lex as
    # INTEGER `1` + statement terminator (round-4 review regression)
    g2, _ = parse_turtle("@prefix ex: <http://e/> . ex:s ex:p 1.")
    assert g2.triples == [
        (("iri", "http://e/s"), ("iri", "http://e/p"),
         ("lit", "1", None, XSD + "integer"))
    ]
    g3, _ = parse_turtle("@prefix ex: <http://e/> . ex:s ex:p 2. ex:s ex:q 3 .")
    assert len(g3.triples) == 2
    g4, _ = parse_turtle("@prefix ex: <http://e/> . ex:s ex:p 1.e3 .")
    assert g4.triples[0][2] == ("lit", "1.e3", None, XSD + "double")
    with _pytest.raises(ValueError, match="literal cannot be a subject"):
        parse_turtle('@prefix ex: <http://e/> . "lit" ex:p ex:o .')
    with _pytest.raises(ValueError, match="unknown prefix"):
        parse_turtle("ex:s ex:p ex:o .")


def test_turtle_collections():
    """Collections `( … )` expand to the standard rdf:first/rest bnode
    chain (Turtle §2.8), `()` is rdf:nil, nesting works, and
    Graph.collection walks the chain back to a Python list."""
    import pytest as _pytest

    RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    g, _ = parse_turtle(
        '@prefix ex: <http://e/> . ex:s ex:p ( ex:a "two" 3 ) .'
    )
    head = g.obj(("iri", "http://e/s"), "http://e/p")
    assert head[0] == "bnode"
    items = g.collection(head)
    assert items == [
        ("iri", "http://e/a"),
        ("lit", "two", None, None),
        ("lit", "3", None, "http://www.w3.org/2001/XMLSchema#integer"),
    ]
    # the chain itself is well-formed: 3 first/rest pairs, nil-terminated
    firsts = [t for t in g.triples if t[1] == ("iri", RDF + "first")]
    rests = [t for t in g.triples if t[1] == ("iri", RDF + "rest")]
    assert len(firsts) == 3 and len(rests) == 3
    assert rests[-1][2] == ("iri", RDF + "nil")

    g2, _ = parse_turtle("@prefix ex: <http://e/> . ex:s ex:p () .")
    assert g2.obj(("iri", "http://e/s"), "http://e/p") == ("iri", RDF + "nil")
    assert g2.collection(("iri", RDF + "nil")) == []

    g3, _ = parse_turtle(
        "@prefix ex: <http://e/> . ex:s ex:p ( ex:a ( ex:b ) ) ."
    )
    outer = g3.collection(g3.obj(("iri", "http://e/s"), "http://e/p"))
    assert outer[0] == ("iri", "http://e/a")
    assert g3.collection(outer[1]) == [("iri", "http://e/b")]

    with _pytest.raises(ValueError, match="unterminated collection"):
        parse_turtle("@prefix ex: <http://e/> . ex:s ex:p ( ex:a")
    with _pytest.raises(ValueError, match="unexpected token"):
        parse_turtle("@prefix ex: <http://e/> . ex:s ex:p ( ex:a .")


def test_c01_template_class(cat, ray_session):
    got = run_ttl(
        """
        @prefix rr: <http://www.w3.org/ns/r2rml#> .
        @prefix ex: <http://ex.com/> .
        <#m> rr:logicalTable [ rr:tableName "books" ] ;
          rr:subjectMap [ rr:template "http://ex.com/book/{book_id}" ;
                          rr:class ex:Book ] ;
          rr:predicateObjectMap [
            rr:predicate ex:title ;
            rr:objectMap [ rr:column "title" ] ] .
        """,
        cat,
    )
    want = {
        f"<{EX}book/1> <{TY}> <{EX}Book> .",
        f"<{EX}book/2> <{TY}> <{EX}Book> .",
        f'<{EX}book/1> <{EX}title> "Moby Dick" .',
        f'<{EX}book/2> <{EX}title> "Perl & RDF" .',
    }
    assert got == want, diff(got, want)


def test_c02_constants_and_graph(cat, ray_session):
    got = run_ttl(
        """
        @prefix rr: <http://www.w3.org/ns/r2rml#> .
        @prefix ex: <http://ex.com/> .
        <#m> rr:logicalTable [ rr:tableName "books" ] ;
          rr:subjectMap [ rr:template "http://ex.com/book/{book_id}" ;
                          rr:graphMap [ rr:constant ex:g1 ] ] ;
          rr:predicateObjectMap [
            rr:predicateMap [ rr:constant ex:flag ] ;
            rr:objectMap [ rr:constant "yes" ] ] .
        """,
        cat,
    )
    assert f'<{EX}book/1> <{EX}flag> "yes" <{EX}g1> .' in got


def test_c03_language_and_datatype_override(cat, ray_session):
    got = run_ttl(
        """
        @prefix rr: <http://www.w3.org/ns/r2rml#> .
        @prefix ex: <http://ex.com/> .
        @prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
        <#m> rr:logicalTable [ rr:tableName "books" ] ;
          rr:subjectMap [ rr:template "http://ex.com/book/{book_id}" ] ;
          rr:predicateObjectMap [
            rr:predicate ex:t ;
            rr:objectMap [ rr:column "title" ; rr:language "en" ] ] ;
          rr:predicateObjectMap [
            rr:predicate ex:id ;
            rr:objectMap [ rr:column "book_id" ; rr:datatype xsd:string ] ] .
        """,
        cat,
    )
    assert f'<{EX}book/1> <{EX}t> "Moby Dick"@en .' in got
    assert (
        f'<{EX}book/1> <{EX}id> "1"^^<http://www.w3.org/2001/XMLSchema#string> .'
        in got
    )


def test_c04_natural_datatypes(cat, ray_session):
    got = run_ttl(
        """
        @prefix rr: <http://www.w3.org/ns/r2rml#> .
        @prefix ex: <http://ex.com/> .
        <#m> rr:logicalTable [ rr:tableName "books" ] ;
          rr:subjectMap [ rr:template "http://ex.com/book/{book_id}" ] ;
          rr:predicateObjectMap [
            rr:predicate ex:price ; rr:objectMap [ rr:column "price" ] ] ;
          rr:predicateObjectMap [
            rr:predicate ex:pub ; rr:objectMap [ rr:column "pub_date" ] ] .
        """,
        cat,
    )
    want = {
        f'<{EX}book/1> <{EX}price> "10.5"^^<http://www.w3.org/2001/XMLSchema#decimal> .',
        f'<{EX}book/1> <{EX}pub> "2001-02-03"^^<http://www.w3.org/2001/XMLSchema#date> .',
    }
    assert want <= got
    # NULL suppression: book/2 price/pub are NULL
    assert not any("book/2" in l for l in got if "price" in l or "pub" in l)


def test_c05_termtype_bnode_value_based(cat, ray_session):
    got = run_ttl(
        """
        @prefix rr: <http://www.w3.org/ns/r2rml#> .
        @prefix ex: <http://ex.com/> .
        <#m> rr:logicalTable [ rr:tableName "books" ] ;
          rr:subjectMap [ rr:template "n{author_id}" ; rr:termType rr:BlankNode ] ;
          rr:predicateObjectMap [
            rr:predicate ex:id ; rr:objectMap [ rr:column "book_id" ] ] .
        """,
        cat,
    )
    assert (
        '_:n10 <http://ex.com/id> "1"^^<http://www.w3.org/2001/XMLSchema#integer> .'
        in got
    )


def test_c06_refobjectmap(cat, ray_session):
    got = run_ttl(
        """
        @prefix rr: <http://www.w3.org/ns/r2rml#> .
        @prefix ex: <http://ex.com/> .
        <#books> rr:logicalTable [ rr:tableName "books" ] ;
          rr:subjectMap [ rr:template "http://ex.com/book/{book_id}" ] ;
          rr:predicateObjectMap [
            rr:predicate ex:author ;
            rr:objectMap [ rr:parentTriplesMap <#authors> ;
                           rr:joinCondition [ rr:child "author_id" ;
                                              rr:parent "author_id" ] ] ] .
        <#authors> rr:logicalTable [ rr:tableName "authors" ] ;
          rr:subjectMap [ rr:template "http://ex.com/author/{author_id}" ;
                          rr:class ex:Author ] .
        """,
        cat,
    )
    assert f"<{EX}book/1> <{EX}author> <{EX}author/10> ." in got
    assert f"<{EX}author/20> <{TY}> <{EX}Author> ." in got


def test_c07_sqlquery_logical_table(cat, ray_session):
    got = run_ttl(
        """
        @prefix rr: <http://www.w3.org/ns/r2rml#> .
        @prefix ex: <http://ex.com/> .
        <#m> rr:logicalTable [ rr:sqlQuery "SELECT book_id, title FROM books WHERE book_id = 1" ] ;
          rr:subjectMap [ rr:template "http://ex.com/book/{book_id}" ] ;
          rr:predicateObjectMap [
            rr:predicate ex:title ; rr:objectMap [ rr:column "title" ] ] .
        """,
        cat,
    )
    assert got == {f'<{EX}book/1> <{EX}title> "Moby Dick" .'}


def test_c08_constant_shortcuts(cat, ray_session):
    got = run_ttl(
        """
        @prefix rr: <http://www.w3.org/ns/r2rml#> .
        @prefix ex: <http://ex.com/> .
        <#m> rr:logicalTable [ rr:tableName "books" ] ;
          rr:subject ex:TheBook ;
          rr:predicateObjectMap [ rr:predicate ex:p ; rr:object ex:o ] .
        """,
        cat,
    )
    # constant subject/pred/object: one triple after dedup (2 rows collapse)
    assert got == {f"<{EX}TheBook> <{EX}p> <{EX}o> ."}


def test_sqlquery_streaming_vs_duckdb(ray_session, tmp_path):
    """The simple-SQL subset streams (read_parquet + pushdown) and must
    produce exactly the DuckDB-materialized rows; richer SQL falls back."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from p5_rdf_rdb2rdf_ray.sources.catalog import Catalog
    from p5_rdf_rdb2rdf_ray.sources.sqlview import parse_simple_select

    d = str(tmp_path / "cat")
    os.makedirs(d, exist_ok=True)
    pq.write_table(
        pa.table({"k": list(range(100)), "v": [f"s{i}" for i in range(100)],
                  "w": [i * 1.5 for i in range(100)]}),
        os.path.join(d, "tbl.parquet"),
    )
    cat = Catalog(root=d)
    sql = "SELECT k, v FROM tbl WHERE k >= 90 AND w < 145.0"
    assert parse_simple_select(sql) is not None
    got = sorted(r["k"] for r in cat.load("tbl", sql=sql).take_all())
    # duckdb fallback (force it with a shape outside the subset)
    sql2 = "SELECT k, v FROM tbl WHERE k >= 90 AND w < 145.0 ORDER BY k"
    assert parse_simple_select(sql2) is None
    want = sorted(r["k"] for r in cat.load("tbl", sql=sql2).take_all())
    assert got == want == list(range(90, 97))


def test_sqlquery_coercion_matches_duckdb(ray_session, tmp_path):
    """DuckDB-style coercions the streaming path must honor (or punt on):
    quoted-int literal on an int column, case-insensitive identifiers,
    non-integral float on an int column (falls back to DuckDB)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from p5_rdf_rdb2rdf_ray.sources.catalog import Catalog

    d = str(tmp_path / "cat")
    os.makedirs(d, exist_ok=True)
    pq.write_table(
        pa.table({"k": list(range(10)), "v": [f"s{i}" for i in range(10)]}),
        os.path.join(d, "tbl.parquet"),
    )
    cat = Catalog(root=d)
    # intcol = '5' coerces like DuckDB instead of a pyarrow type error
    got = cat.load("tbl", sql="SELECT k FROM tbl WHERE k = '5'").take_all()
    assert [r["k"] for r in got] == [5]
    # case-insensitive identifiers (table + columns)
    got2 = cat.load("tbl", sql="SELECT K, V FROM TBL WHERE K = 3").take_all()
    assert len(got2) == 1 and list(got2[0].values())[1] == "s3"
    # non-integral float on an int column: numeric compare via DuckDB
    got3 = cat.load("tbl", sql="SELECT k FROM tbl WHERE k > 7.5").take_all()
    assert sorted(r["k"] for r in got3) == [8, 9]
    # unparseable string on an int column → DuckDB decides (errors are its)
    try:
        cat.load("tbl", sql="SELECT k FROM tbl WHERE k = 'abc'").take_all()
        raised = False
    except Exception:
        raised = True
    assert raised  # DuckDB raises a conversion error, not a pyarrow one


def test_is_duplicate_free_analysis(ray_session):
    """Compile-time dup-free proof: accepts the provable shapes, rejects
    every rule violation, and 'auto' matches distinct=True output."""
    from dataclasses import replace as rep

    from p5_rdf_rdb2rdf_ray.engine.runner import is_duplicate_free, run_mapping
    from p5_rdf_rdb2rdf_ray.mapping.spec import (
        IRI,
        LITERAL,
        MappingSpec,
        PredObjSpec,
        TermMapSpec,
        TriplesMapSpec,
    )
    from p5_rdf_rdb2rdf_ray.sinks.ntriples import collect_ntriples
    from p5_rdf_rdb2rdf_ray.sources.catalog import TableLayout

    B2 = "http://x.org/"
    cat = Catalog(
        root="",
        tables={"book": BOOKS},
        layouts={"book": TableLayout(pkey=("book_id",))},
    )
    pom = lambda pred, col: PredObjSpec(
        pred=TermMapSpec(kind=IRI, constant=B2 + pred),
        obj=TermMapSpec(kind=LITERAL, column=col),
    )
    good = TriplesMapSpec(
        name="m", table="book",
        subject=TermMapSpec(kind=IRI, template=B2 + "b/{book_id}"),
        classes=(B2 + "Book",),
        pos=(pom("title", "title"), pom("au", "author_id")),
    )
    spec = MappingSpec(maps={"m": good}, base=B2)
    assert is_duplicate_free(spec, cat)

    # rule violations, one by one
    bad_cases = [
        rep(good, pos=(pom("p", "title"), pom("p", "author_id"))),  # dup pred
        rep(good, subject=TermMapSpec(kind=IRI, template=B2 + "b/{title}")),  # non-PK
        rep(good, subject=TermMapSpec(kind=IRI, template=B2 + "{book_id}{title}")),  # ambiguous
        rep(good, subject=TermMapSpec(kind=IRI, constant=B2 + "one")),  # constant subj
        rep(good, pos=(PredObjSpec(pred=TermMapSpec(kind=IRI, constant=B2 + "p"),
                                   obj=TermMapSpec(kind=LITERAL, column="title"),
                                   graphs=(TermMapSpec(kind=IRI, constant=B2 + "g"),)),)),  # graphMap
    ]
    for tm in bad_cases:
        assert not is_duplicate_free(MappingSpec(maps={"m": tm}, base=B2), cat)

    # cross-map: shared rdf:type + overlapping subject prefixes → False
    twin = rep(good, name="m2", subject=TermMapSpec(kind=IRI, template=B2 + "b/x{book_id}"))
    assert not is_duplicate_free(
        MappingSpec(maps={"m": good, "m2": twin}, base=B2), cat
    )
    # disjoint prefixes → True
    other = rep(good, name="m2", subject=TermMapSpec(kind=IRI, template=B2 + "c/{book_id}"))
    assert is_duplicate_free(
        MappingSpec(maps={"m": good, "m2": other}, base=B2), cat
    )

    # empirical: auto == distinct=True for the accepted spec
    a = sorted(collect_ntriples(run_mapping(spec, cat, distinct="auto")))
    b = sorted(collect_ntriples(run_mapping(spec, cat, distinct=True)))
    assert a == b and len(a) == len(set(a))


def test_duplicate_free_proof_never_false_positive(ray_session):
    """Soundness grid for the distinct="auto" optimizer: over a lattice
    of spec shapes, whenever the proof says duplicate-free, the actual
    run (with the distinct stage DISABLED) must contain no duplicate
    triples. (Completeness is not required — False just keeps the
    shuffle — but a false True would silently break set semantics.)"""
    from dataclasses import replace as rep

    from p5_rdf_rdb2rdf_ray.engine.runner import is_duplicate_free, run_mapping
    from p5_rdf_rdb2rdf_ray.mapping.spec import (
        BNODE,
        IRI,
        LITERAL,
        MappingSpec,
        PredObjSpec,
        TermMapSpec,
        TriplesMapSpec,
    )
    from p5_rdf_rdb2rdf_ray.sinks.ntriples import collect_ntriples
    from p5_rdf_rdb2rdf_ray.sources.catalog import TableLayout

    B2 = "http://y.org/"
    # duplicate VALUES in a non-key column make non-injective subjects
    # actually collide at runtime, not just in theory
    t = pa.table(
        {
            "id": pa.array([1, 2, 3], pa.int64()),
            "grp": pa.array(["a", "a", "b"]),
        }
    )
    cat = Catalog(
        root="", tables={"t": t}, layouts={"t": TableLayout(pkey=("id",))}
    )
    subjects = [
        TermMapSpec(kind=IRI, template=B2 + "t/{id}"),        # injective
        TermMapSpec(kind=IRI, template=B2 + "g/{grp}"),       # collides
        TermMapSpec(kind=IRI, template=B2 + "{id}{grp}"),     # ambiguous
        TermMapSpec(kind=IRI, constant=B2 + "one"),           # constant
        TermMapSpec(kind=BNODE, skolem_scope="t"),            # row bnode
    ]
    pom = lambda pred, col: PredObjSpec(
        pred=TermMapSpec(kind=IRI, constant=B2 + pred),
        obj=TermMapSpec(kind=LITERAL, column=col),
    )
    pred_sets = [
        (pom("p1", "grp"),),
        (pom("p1", "grp"), pom("p1", "id")),  # duplicate predicate
        (pom("p1", "grp"), pom("p2", "id")),
    ]
    checked = accepted = 0
    for sub in subjects:
        for pos in pred_sets:
            for classes in ((), (B2 + "T",)):
                tm = TriplesMapSpec(
                    name="m", table="t", subject=sub, classes=classes, pos=pos
                )
                spec = MappingSpec(maps={"m": tm}, base=B2)
                checked += 1
                if not is_duplicate_free(spec, cat):
                    continue
                accepted += 1
                lines = collect_ntriples(
                    run_mapping(spec, cat, distinct=False)
                )
                assert len(lines) == len(set(lines)), (sub, pos, classes)
    # the grid must exercise both outcomes
    assert accepted >= 4 and accepted < checked


def test_duplicate_free_proof_rejects_new_holes(ray_session):
    """Two proof holes found by review: (a) explicit skolem_cols carry
    no row-uniqueness guarantee; (b) a non-ASCII separator is NOT an
    unambiguous delimiter because iri_safe_encode leaves ucschar
    verbatim inside values."""
    from p5_rdf_rdb2rdf_ray.engine.runner import is_duplicate_free
    from p5_rdf_rdb2rdf_ray.mapping.spec import (
        BNODE,
        IRI,
        LITERAL,
        MappingSpec,
        PredObjSpec,
        TermMapSpec,
        TriplesMapSpec,
    )
    from p5_rdf_rdb2rdf_ray.sources.catalog import TableLayout

    B2 = "http://z.org/"
    cat = Catalog(
        root="",
        tables={"t": pa.table({"a": ["x"], "b": ["y"], "g": ["v"]})},
        layouts={"t": TableLayout(pkey=("a", "b"))},
    )
    pom = (
        PredObjSpec(
            pred=TermMapSpec(kind=IRI, constant=B2 + "p"),
            obj=TermMapSpec(kind=LITERAL, column="g"),
        ),
    )
    # (a) value-based skolem bnode over a non-unique column
    tm = TriplesMapSpec(
        name="m", table="t",
        subject=TermMapSpec(kind=BNODE, skolem_scope="t", skolem_cols=("g",)),
        pos=pom,
    )
    assert not is_duplicate_free(MappingSpec(maps={"m": tm}, base=B2), cat)
    # (b) ucschar separator between adjacent placeholders
    tm2 = TriplesMapSpec(
        name="m", table="t",
        subject=TermMapSpec(kind=IRI, template=B2 + "{a}é{b}"),
        pos=pom,
    )
    assert not is_duplicate_free(MappingSpec(maps={"m": tm2}, base=B2), cat)
    # control: an ASCII reserved-char separator still proves
    tm3 = TriplesMapSpec(
        name="m", table="t",
        subject=TermMapSpec(kind=IRI, template=B2 + "{a}/{b}"),
        pos=pom,
    )
    assert is_duplicate_free(MappingSpec(maps={"m": tm3}, base=B2), cat)


def test_invalid_term_types_rejected(cat, ray_session):
    """W3C-R2RML §7.4.1: literal subject maps and non-IRI predicate or
    graph maps are invalid — the compiler must reject, not emit."""
    from p5_rdf_rdb2rdf_ray.mapping.r2rml import R2RMLError

    bad_subject = """
    @prefix rr: <http://www.w3.org/ns/r2rml#> .
    @prefix ex: <http://ex.com/> .
    <#m> rr:logicalTable [ rr:tableName "books" ] ;
      rr:subjectMap [ rr:column "title" ; rr:termType rr:Literal ] ;
      rr:predicateObjectMap [ rr:predicate ex:p ;
                              rr:objectMap [ rr:column "title" ] ] .
    """
    bad_pred = """
    @prefix rr: <http://www.w3.org/ns/r2rml#> .
    @prefix ex: <http://ex.com/> .
    <#m> rr:logicalTable [ rr:tableName "books" ] ;
      rr:subjectMap [ rr:template "http://ex.com/b/{book_id}" ] ;
      rr:predicateObjectMap [
        rr:predicateMap [ rr:column "title" ; rr:termType rr:BlankNode ] ;
        rr:objectMap [ rr:column "title" ] ] .
    """
    for ttl in (bad_subject, bad_pred):
        with pytest.raises(R2RMLError, match="7.4.1"):
            compile_r2rml(ttl, base=EX)
    # control: valid BlankNode subject still compiles
    ok = """
    @prefix rr: <http://www.w3.org/ns/r2rml#> .
    @prefix ex: <http://ex.com/> .
    <#m> rr:logicalTable [ rr:tableName "books" ] ;
      rr:subjectMap [ rr:template "n{book_id}" ; rr:termType rr:BlankNode ] ;
      rr:predicateObjectMap [ rr:predicate ex:p ;
                              rr:objectMap [ rr:column "title" ] ] .
    """
    compile_r2rml(ok, base=EX)


def test_literal_constants_rejected_on_non_object_maps(cat, ray_session):
    """W3C 7.4.1 completion: literal rr:constant on subject/predicate/
    graph maps (and the rr:subject/rr:predicate/rr:graph shortcuts) is
    rejected at compile, not silently concatenated into a broken IRI."""
    from p5_rdf_rdb2rdf_ray.mapping.r2rml import R2RMLError

    cases = [
        # literal constant in a subjectMap
        """<#m> rr:logicalTable [ rr:tableName "books" ] ;
           rr:subjectMap [ rr:constant "not an iri" ] ;
           rr:predicateObjectMap [ rr:predicate ex:p ;
                                   rr:objectMap [ rr:column "title" ] ] .""",
        # literal constant in a predicateMap
        """<#m> rr:logicalTable [ rr:tableName "books" ] ;
           rr:subjectMap [ rr:template "http://ex.com/b/{book_id}" ] ;
           rr:predicateObjectMap [
             rr:predicateMap [ rr:constant "lit pred" ] ;
             rr:objectMap [ rr:column "title" ] ] .""",
        # literal in the rr:subject shortcut
        """<#m> rr:logicalTable [ rr:tableName "books" ] ;
           rr:subject "lit subject" ;
           rr:predicateObjectMap [ rr:predicate ex:p ;
                                   rr:objectMap [ rr:column "title" ] ] .""",
        # literal in a graphMap constant
        """<#m> rr:logicalTable [ rr:tableName "books" ] ;
           rr:subjectMap [ rr:template "http://ex.com/b/{book_id}" ;
                           rr:graphMap [ rr:constant "lit graph" ] ] ;
           rr:predicateObjectMap [ rr:predicate ex:p ;
                                   rr:objectMap [ rr:column "title" ] ] .""",
    ]
    prefix = """
    @prefix rr: <http://www.w3.org/ns/r2rml#> .
    @prefix ex: <http://ex.com/> .
    """
    for body in cases:
        with pytest.raises(R2RMLError, match="7.4.1"):
            compile_r2rml(prefix + body, base=EX)
    # literal constant OBJECTS remain valid (c08 also covers this)
    ok = prefix + """<#m> rr:logicalTable [ rr:tableName "books" ] ;
      rr:subjectMap [ rr:template "http://ex.com/b/{book_id}" ] ;
      rr:predicateObjectMap [ rr:predicate ex:p ; rr:object "yes" ] ."""
    compile_r2rml(ok, base=EX)

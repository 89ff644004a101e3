"""rr:inverseExpression + template inversion point lookup (W3C-R2RML §7.7).

Covers ``Template.match_detail`` (the inverse of template fill, with the
split-uniqueness proof), ``_instantiate_inverse`` (§7.7 instantiation), and
``r2rml_lookup`` — the generalization of the Store's bound-subject pushdown
to arbitrary R2RML mappings [R: R2RML.pm term maps; DirectMapping/Store.pm
covers DM only].
"""

import pyarrow as pa
import pytest

from p5_rdf_rdb2rdf_ray.engine.lookup import _instantiate_inverse, r2rml_lookup
from p5_rdf_rdb2rdf_ray.engine.runner import run_mapping
from p5_rdf_rdb2rdf_ray.functions.scalars import Template
from p5_rdf_rdb2rdf_ray.mapping.r2rml import compile_r2rml
from p5_rdf_rdb2rdf_ray.sinks.ntriples import collect_ntriples
from p5_rdf_rdb2rdf_ray.sources.catalog import Catalog

EX = "http://ex.com/"

RR = "@prefix rr: <http://www.w3.org/ns/r2rml#> .\n@prefix ex: <http://ex.com/> .\n"


# ---------------------------------------------------------------- match


def test_match_round_trip_iri_safe():
    t = Template("http://ex.com/d/{a}/{b}")
    filled = t.fill_scalar({"a": "x y", "b": "p/q"})
    assert filled == "http://ex.com/d/x%20y/p%2Fq"
    bindings, unique = t.match_detail(filled)
    assert bindings == {"a": "x y", "b": "p/q"}
    assert unique  # separators can't occur in encoded captures here


def test_match_rejects_foreign_value():
    assert Template("http://ex.com/d/{a}").match("http://other/d/1") is None


def test_match_repeated_column_must_agree():
    t = Template("{a}-{a}")
    assert t.match("1-1", iri_safe=False) == {"a": "1"}
    assert t.match("1-2", iri_safe=False) is None


def test_match_adjacent_slots_not_unique():
    bindings, unique = Template("x/{a}{b}").match_detail("x/123", iri_safe=False)
    assert bindings is not None and not unique


def test_match_sliding_separator_not_unique():
    # "x-y-z" splits as (x, y-z) or (x-y, z): both are real inversions
    _, unique = Template("{a}-{b}").match_detail("x-y-z", iri_safe=False)
    assert not unique
    _, unique2 = Template("{a}-{b}").match_detail("x-z", iri_safe=False)
    assert unique2


def test_match_overlapping_separator_not_unique():
    # "1aaa2" under "{a}aa{b}": (1, a2) and (1a, 2) both invert
    _, unique = Template("{a}aa{b}").match_detail("1aaa2", iri_safe=False)
    assert not unique


# ---------------------------------------------------- §7.7 instantiation


def test_instantiate_inverse():
    got = _instantiate_inverse(
        "{book_id} = CAST(substr({code}, 4) AS INTEGER)", {"code": "BK-2"}
    )
    # known binding → SQL literal; unknown column ref → quoted identifier
    assert got == "\"book_id\" = CAST(substr('BK-2', 4) AS INTEGER)"


def test_instantiate_inverse_quotes_values():
    assert _instantiate_inverse("{c} = {v}", {"v": "o'brien"}) == (
        "\"c\" = 'o''brien'"
    )


# ---------------------------------------------------------- r2rml_lookup

TBL = pa.table(
    {
        "book_id": pa.array([1, 2, 3], pa.int64()),
        "title": pa.array(["Moby Dick", "Perl & RDF", "Ray"]),
    }
)


@pytest.fixture(scope="module")
def cat():
    return Catalog(root="", tables={"books": TBL})


TTL_TEMPLATE = RR + """
ex:m a rr:TriplesMap ;
  rr:logicalTable [ rr:tableName "books" ] ;
  rr:subjectMap [ rr:template "http://ex.com/book/{book_id}" ;
                  rr:class ex:Book ] ;
  rr:predicateObjectMap [ rr:predicate ex:title ;
                          rr:objectMap [ rr:column "title" ] ] .
"""


def lines_for(spec, cat, subject):
    """Expected = full-mapping N-Triples lines with that subject."""
    return {
        ln
        for ln in collect_ntriples(run_mapping(spec, cat))
        if ln.startswith("<" + subject + ">")
    }


def test_lookup_template_equality_prune(cat, ray_session):
    spec = compile_r2rml(TTL_TEMPLATE, base=EX)
    subj = EX + "book/2"
    got = set(collect_ntriples(r2rml_lookup(spec, cat, subj)))
    assert got == lines_for(spec, cat, subj)
    assert len(got) == 2  # type + title


def test_lookup_no_match_is_empty(cat, ray_session):
    spec = compile_r2rml(TTL_TEMPLATE, base=EX)
    assert collect_ntriples(r2rml_lookup(spec, cat, EX + "author/1")) == []
    # uncastable template value over an int column: empty, not an error
    assert collect_ntriples(r2rml_lookup(spec, cat, EX + "book/abc")) == []


TTL_INVERSE = RR + """
ex:m a rr:TriplesMap ;
  rr:logicalTable [ rr:sqlQuery \"\"\"
    SELECT book_id, 'BK-' || CAST(book_id AS VARCHAR) AS code, title
    FROM books
  \"\"\" ] ;
  rr:subjectMap [ rr:template "http://ex.com/book/{code}" ;
                  rr:inverseExpression
                    "{book_id} = CAST(substr({code}, 4) AS INTEGER)" ] ;
  rr:predicateObjectMap [ rr:predicate ex:title ;
                          rr:objectMap [ rr:column "title" ] ] .
"""


def test_lookup_inverse_expression(cat, ray_session):
    spec = compile_r2rml(TTL_INVERSE, base=EX)
    assert spec.maps[EX + "m"].subject.inverse_expression is not None
    subj = EX + "book/BK-2"
    got = set(collect_ntriples(r2rml_lookup(spec, cat, subj)))
    assert got == {
        "<http://ex.com/book/BK-2> <http://ex.com/title> "
        '"Perl & RDF" .'
    }


AMBIG = pa.table(
    {
        "a": pa.array(["x-y", "x"]),
        "b": pa.array(["z", "y-z"]),
    }
)

TTL_AMBIG = RR + """
ex:m a rr:TriplesMap ;
  rr:logicalTable [ rr:tableName "t" ] ;
  rr:subjectMap [ rr:template "http://ex.com/x/{a}-{b}" ] ;
  rr:predicateObjectMap [ rr:predicate ex:a ;
                          rr:objectMap [ rr:column "a" ] ] .
"""


def test_lookup_ambiguous_template_runs_unpruned(ray_session):
    """Both rows generate <x/x-y-z>; a naive prune on one split would
    miss the other row's triples. unique=False must disable pruning."""
    cat = Catalog(root="", tables={"t": AMBIG})
    spec = compile_r2rml(TTL_AMBIG, base=EX)
    got = set(collect_ntriples(r2rml_lookup(spec, cat, EX + "x/x-y-z")))
    assert got == {
        '<http://ex.com/x/x-y-z> <http://ex.com/a> "x-y" .',
        '<http://ex.com/x/x-y-z> <http://ex.com/a> "x" .',
    }


TTL_CONST = RR + """
ex:m a rr:TriplesMap ;
  rr:logicalTable [ rr:tableName "books" ] ;
  rr:subject ex:catalogue ;
  rr:predicateObjectMap [ rr:predicate ex:holds ;
                          rr:objectMap [ rr:column "title" ] ] .
"""


def test_lookup_constant_subject(cat, ray_session):
    spec = compile_r2rml(TTL_CONST, base=EX)
    got = collect_ntriples(r2rml_lookup(spec, cat, EX + "catalogue"))
    assert len(got) == 3
    assert collect_ntriples(r2rml_lookup(spec, cat, EX + "other")) == []


# ------------------------------------------------- property round-trip

try:
    from hypothesis import given, settings, strategies as st

    _VALS = st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)), max_size=12
    )
    _SEPS = st.text(
        alphabet=st.sampled_from("/-_.#:"), min_size=1, max_size=3
    )

    @settings(max_examples=200, deadline=None)
    @given(
        vals=st.lists(_VALS, min_size=1, max_size=4),
        seps=st.lists(_SEPS, min_size=5, max_size=5),
    )
    def test_fill_match_round_trip_property(vals, seps):
        """For ANY values: match(fill(v)) must (a) succeed, and (b) when it
        claims unique=True, recover exactly v. IRI-safe encoding makes the
        captures opaque to the separators unless the separator itself is
        made of unreserved characters present in a value."""
        tmpl = seps[0] + "".join(
            "{c%d}%s" % (i, seps[i + 1]) for i in range(len(vals))
        )
        t = Template(tmpl)
        row = {f"c{i}": v for i, v in enumerate(vals)}
        filled = t.fill_scalar(row)
        assert filled is not None
        bindings, unique = t.match_detail(filled)
        assert bindings is not None  # fill output must always re-match
        if unique:
            assert bindings == row  # a unique inversion must be THE row

except ImportError:  # pragma: no cover - hypothesis is in the sandbox
    pass


TTL_TWO_MAPS_SAME_TABLE = RR + """
ex:byId a rr:TriplesMap ;
  rr:logicalTable [ rr:tableName "books" ] ;
  rr:subjectMap [ rr:template "http://ex.com/book/{book_id}" ] ;
  rr:predicateObjectMap [ rr:predicate ex:title ;
                          rr:objectMap [ rr:column "title" ] ] .

ex:byTitle a rr:TriplesMap ;
  rr:logicalTable [ rr:tableName "books" ] ;
  rr:subjectMap [ rr:template "http://ex.com/book/{title}" ] ;
  rr:predicateObjectMap [ rr:predicate ex:id ;
                          rr:objectMap [ rr:column "book_id" ] ] .
"""


def test_lookup_two_maps_same_table_no_clobber(cat, ray_session):
    """Two triples maps over ONE base table whose subject templates share
    a prefix: each map's pruned slice must be private — keying slices by
    table name let map byTitle's EMPTY slice (no book titled '2')
    clobber byId's id=2 slice, silently dropping byId's triples
    (regression for the per-map synthetic-table fix)."""
    spec = compile_r2rml(TTL_TWO_MAPS_SAME_TABLE, base=EX)
    # 'book/2' inverts under BOTH maps: byId binds book_id=2 (1 row),
    # byTitle binds title='2' (0 rows)
    subj = EX + "book/2"
    got = set(collect_ntriples(r2rml_lookup(spec, cat, subj)))
    assert got == lines_for(spec, cat, subj)
    assert len(got) == 1  # ex:title triple from byId survives
    # title-minted subject: byId's inversion is uncastable (skip), byTitle
    # prunes to the one matching row
    subj2 = EX + "book/Ray"
    got2 = set(collect_ntriples(r2rml_lookup(spec, cat, subj2)))
    assert got2 == lines_for(spec, cat, subj2)
    assert len(got2) == 1  # ex:id triple from byTitle

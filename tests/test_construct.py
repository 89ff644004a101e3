"""SPARQL-CONSTRUCT-shaped enrichment (`engine.construct`): template
instantiation, §10.2.1 invalid-triple suppression, composition with
the BGP planners and the store sink."""

import pyarrow as pa
import pytest
import ray.data as rd

from p5_rdf_rdb2rdf_ray.engine.construct import construct
from p5_rdf_rdb2rdf_ray.sinks.ntriples import collect_ntriples
from p5_rdf_rdb2rdf_ray.terms import KIND_LITERAL

B = "http://ex.com/base/"


def _bind(cols: dict) -> rd.Dataset:
    return rd.from_arrow(pa.table(cols))


def test_construct_templates_and_set_semantics(ray_session):
    b = _bind(
        {
            "s": [B + "a", B + "a", B + "b"],  # dup solution row
            "o": [B + "x", B + "x", None],     # NULL object for b
        }
    )
    lines = collect_ntriples(
        construct(
            b,
            [
                ("?s", B + "p", "?o"),
                ("?s", B + "q", ("lit", "v")),
            ],
        )
    )
    assert sorted(lines) == [
        f'<{B}a> <{B}p> <{B}x> .',          # dup collapsed (set semantics)
        f'<{B}a> <{B}q> "v" .',
        f'<{B}b> <{B}q> "v" .',             # other template still fires
    ]


def test_construct_invalid_triples_drop(ray_session):
    # literal subject binding (kind column says literal) produces nothing
    b = _bind(
        {
            "s": [B + "a", "just text"],
            "__k_s": pa.array([0, KIND_LITERAL], pa.uint8()),
            "p": [B + "p", B + "p"],
        }
    )
    lines = collect_ntriples(
        construct(b, [("?s", "?p", ("lit", "x"))], distinct=False)
    )
    assert lines == [f'<{B}a> <{B}p> "x" .']

    # bnode / NULL predicate bindings drop their row
    b2 = _bind({"s": [B + "a", B + "b"], "p": ["_:bn", None]})
    assert collect_ntriples(
        construct(b2, [("?s", "?p", ("lit", "x"))], distinct=False)
    ) == []


def test_construct_template_validation():
    with pytest.raises(ValueError, match="predicate template"):
        _compile = construct.__globals__["_compile_templates"]
        _compile([("?s", "_:b", "?o")], None)
    _compile = construct.__globals__["_compile_templates"]
    with pytest.raises(ValueError, match="graph must be an IRI"):
        _compile([("?s", B + "p", "?o")], '"lit"')


def test_construct_bgp_to_store_round_trip(ray_session, tmp_path):
    """Constructed graphs are first-class stores: BGP → construct →
    write_triplestore → get_pattern_store over the DERIVED predicate."""
    from p5_rdf_rdb2rdf_ray.engine.lookup import get_pattern, get_pattern_store
    from p5_rdf_rdb2rdf_ray.engine.runner import run_mapping  # noqa: F401
    from p5_rdf_rdb2rdf_ray.mapping.direct import direct_mapping  # noqa: F401
    from p5_rdf_rdb2rdf_ray.sinks.triplestore import write_triplestore
    from p5_rdf_rdb2rdf_ray.sources.catalog import Catalog, TableLayout

    emp = pa.table(
        {
            "emp_id": pa.array([1, 2, 3], pa.int64()),
            "dept_id": pa.array([10, 10, 20], pa.int64()),
        }
    )
    cat = Catalog(
        root="",
        tables={"dm_emp2": emp},
        layouts={"dm_emp2": TableLayout(pkey=("emp_id",))},
    )
    # INVERSE property derivation: dept —hasMember→ emp (the source
    # mapping only emits emp —dept_id→ literal; the constructed edge
    # subject is a previously-object-only node)
    b = get_pattern(
        cat,
        [("?e", B + "dm_emp2#dept_id", "?d")],
        base=B,
        keep_kinds=True,
    )
    kg = construct(
        b, [("?e", B + "memberOfDept", ("lit", "dept"))], distinct=False
    )
    store = str(tmp_path / "derived")
    write_triplestore(kg, store, num_buckets=4)
    got = {
        r["e"]
        for r in get_pattern_store(
            store, [("?e", B + "memberOfDept", ("lit", "dept"))]
        ).take_all()
    }
    assert got == {
        B + "dm_emp2/emp_id=1",
        B + "dm_emp2/emp_id=2",
        B + "dm_emp2/emp_id=3",
    }

"""Direct Mapping conformance fixtures (FIXTURES.md §B; W3C-DM §2)."""

import pyarrow as pa
import pytest

from p5_rdf_rdb2rdf_ray.engine.runner import run_mapping
from p5_rdf_rdb2rdf_ray.mapping.direct import direct_mapping, rdfs_schema_triples
from p5_rdf_rdb2rdf_ray.sinks.ntriples import collect_ntriples, table_to_ntriples
from p5_rdf_rdb2rdf_ray.sources.catalog import Catalog, TableLayout

from .graph_compare import diff, graphs_equal

B = "http://ex.com/base/"

DEPT = pa.table(
    {
        "dept_id": pa.array([1, 2, 3], pa.int64()),
        "dname": pa.array(["eng", "ops", "hr"]),
        "city": pa.array(["NYC", None, "SFO"]),
    }
)
EMP = pa.table(
    {
        "emp_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "ename": pa.array(["a", "b", "c", "d", "e"]),
        "dept_id": pa.array([1, 1, 2, 2, None], pa.int64()),
    }
)


@pytest.fixture(scope="module")
def dm_catalog():
    return Catalog(
        root="",
        tables={"dm_dept": DEPT, "dm_emp": EMP},
        layouts={
            "dm_dept": TableLayout(pkey=("dept_id",)),
            "dm_emp": TableLayout(
                pkey=("emp_id",),
                fkeys=((("dept_id",), "dm_dept", ("dept_id",)),),
            ),
        },
    )


def _golden_dm_lines():
    """Independent hand-derivation of the expected graph (W3C-DM §2)."""
    lines = set()
    ty = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    xint = "http://www.w3.org/2001/XMLSchema#integer"
    for did, dn, city in zip([1, 2, 3], ["eng", "ops", "hr"], ["NYC", None, "SFO"]):
        s = f"<{B}dm_dept/dept_id={did}>"
        lines.add(f"{s} <{ty}> <{B}dm_dept> .")
        lines.add(f'{s} <{B}dm_dept#dept_id> "{did}"^^<{xint}> .')
        lines.add(f'{s} <{B}dm_dept#dname> "{dn}" .')
        if city is not None:
            lines.add(f'{s} <{B}dm_dept#city> "{city}" .')
    for eid, en, did in zip(
        [1, 2, 3, 4, 5], ["a", "b", "c", "d", "e"], [1, 1, 2, 2, None]
    ):
        s = f"<{B}dm_emp/emp_id={eid}>"
        lines.add(f"{s} <{ty}> <{B}dm_emp> .")
        lines.add(f'{s} <{B}dm_emp#emp_id> "{eid}"^^<{xint}> .')
        lines.add(f'{s} <{B}dm_emp#ename> "{en}" .')
        if did is not None:
            lines.add(f'{s} <{B}dm_emp#dept_id> "{did}"^^<{xint}> .')
            lines.add(f"{s} <{B}dm_emp#ref-dept_id> <{B}dm_dept/dept_id={did}> .")
    return lines


def test_direct_mapping_fk_pair(ray_session, dm_catalog):
    spec = direct_mapping(dm_catalog, base=B)
    got = set(collect_ntriples(run_mapping(spec, dm_catalog)))
    want = _golden_dm_lines()
    assert got == want, diff(got, want)


def test_dm_nopk_bnodes(ray_session):
    t = pa.table({"a": ["x", "x", "y"], "b": [1, 1, 2]})
    cat = Catalog(root="", tables={"dm_nopk": t})
    spec = direct_mapping(cat, base=B)
    got = collect_ntriples(run_mapping(spec, cat))
    subs = {l.split(" ")[0] for l in got}
    assert all(s.startswith("_:") for s in subs)
    assert len(subs) == 3  # duplicate rows keep distinct bnodes
    # 3 rows × (type + a + b) triples
    assert len(got) == 9


def test_dm_composite_key_encoding(ray_session):
    parent = pa.table(
        {
            "k1": pa.array(["a b", "x/y", "ü"]),
            "k2": pa.array([1, 2, 3], pa.int32()),
            "v": pa.array(["p", "q", "r"]),
        }
    )
    child = pa.table(
        {
            "cid": pa.array([10, 11], pa.int64()),
            "fk1": pa.array(["a b", "ü"]),
            "fk2": pa.array([1, 3], pa.int32()),
        }
    )
    cat = Catalog(
        root="",
        tables={"dm_parent": parent, "dm_child": child},
        layouts={
            "dm_parent": TableLayout(pkey=("k1", "k2")),
            "dm_child": TableLayout(
                pkey=("cid",),
                fkeys=((("fk1", "fk2"), "dm_parent", ("k1", "k2")),),
            ),
        },
    )
    spec = direct_mapping(cat, base=B)
    got = set(collect_ntriples(run_mapping(spec, cat)))
    assert f"<{B}dm_parent/k1=a%20b;k2=1> <{B}dm_parent#v> \"p\" ." in got
    assert (
        f"<{B}dm_child/cid=10> <{B}dm_child#ref-fk1;fk2> <{B}dm_parent/k1=a%20b;k2=1> ."
        in got
    )
    assert (
        f"<{B}dm_child/cid=11> <{B}dm_child#ref-fk1;fk2> <{B}dm_parent/k1=ü;k2=3> ."
        in got
    )


def test_fk_to_nopk_table_general_join(ray_session):
    """FK to a table without PK → parent rowid-skolem bnodes via real join."""
    parent = pa.table({"u": ["p1", "p2"], "w": ["a", "b"]})
    child = pa.table(
        {"cid": pa.array([1, 2], pa.int64()), "pu": pa.array(["p1", "p2"])}
    )
    cat = Catalog(
        root="",
        tables={"np_parent": parent, "np_child": child},
        layouts={
            "np_child": TableLayout(
                pkey=("cid",), fkeys=((("pu",), "np_parent", ("u",)),)
            ),
        },
    )
    spec = direct_mapping(cat, base=B)
    got = set(collect_ntriples(run_mapping(spec, cat)))
    # child ref triples point at the same bnodes the parent rows got
    refs = {l for l in got if "#ref-pu" in l}
    assert len(refs) == 2
    parent_subjects = {
        l.split(" ")[0] for l in got if l.startswith("_:") and "#w>" in l
    }
    ref_objects = {l.split(" ")[2] for l in refs}
    assert ref_objects == parent_subjects


def test_rdfs_schema_triples(dm_catalog):
    t = rdfs_schema_triples(dm_catalog, base=B)
    lines = set(table_to_ntriples(t))
    assert f'<{B}dm_dept> <http://www.w3.org/2000/01/rdf-schema#label> "dm_dept" .' in lines
    assert (
        f"<{B}dm_emp#ename> <http://www.w3.org/2000/01/rdf-schema#domain> <{B}dm_emp> ."
        in lines
    )


# ---------------------------------------------------------------------------
# Store parity: bound-object lookup + count_statements
# [R: DirectMapping/Store.pm :: get_statements/count_statements]


def test_lookup_bound_literal_object(ray_session, dm_catalog):
    from p5_rdf_rdb2rdf_ray.engine.lookup import get_statements

    rows = get_statements(
        dm_catalog, predicate=B + "dm_dept#dname", obj_literal="ops",
        base=B, distinct_buckets=2,
    ).take_all()
    assert len(rows) == 1
    assert rows[0]["subj"] == B + "dm_dept/dept_id=2"
    assert rows[0]["obj"] == "ops"


def test_lookup_bound_ref_object(ray_session, dm_catalog):
    from p5_rdf_rdb2rdf_ray.engine.lookup import get_statements

    rows = get_statements(
        dm_catalog, predicate=B + "dm_emp#ref-dept_id",
        obj=B + "dm_dept/dept_id=1", base=B, distinct_buckets=2,
    ).take_all()
    assert sorted(r["subj"] for r in rows) == [
        B + "dm_emp/emp_id=1",
        B + "dm_emp/emp_id=2",
    ]
    assert all(r["obj"] == B + "dm_dept/dept_id=1" for r in rows)


def test_lookup_object_without_predicate(ray_session, dm_catalog):
    from p5_rdf_rdb2rdf_ray.engine.lookup import get_statements

    # no pushdown column — post-filter on the emitted term (all columns)
    rows = get_statements(
        dm_catalog, obj_literal="eng", base=B, distinct_buckets=2
    ).take_all()
    assert len(rows) == 1
    assert rows[0]["pred"] == B + "dm_dept#dname"
    # an IRI object must not match equal-lexical literals
    rows2 = get_statements(
        dm_catalog, obj=B + "dm_dept/dept_id=1", base=B, distinct_buckets=2
    ).take_all()
    assert {r["pred"] for r in rows2} == {B + "dm_emp#ref-dept_id"}


def test_count_statements(ray_session, dm_catalog):
    from p5_rdf_rdb2rdf_ray.engine.lookup import count_statements

    # dept 1: type + dept_id + dname + city = 4 triples
    assert count_statements(dm_catalog, subject=B + "dm_dept/dept_id=1", base=B) == 4
    # dept 2 has NULL city → 3
    assert count_statements(dm_catalog, subject=B + "dm_dept/dept_id=2", base=B) == 3
    assert count_statements(dm_catalog, predicate=B + "dm_emp#ename", base=B) == 5
    assert (
        count_statements(
            dm_catalog, predicate=B + "dm_emp#ref-dept_id",
            obj=B + "dm_dept/dept_id=2", base=B,
        )
        == 2
    )


def test_dm_nopk_multifile_streams(ray_session, tmp_path):
    """No-PK Direct Mapping over a MULTI-FILE table: rowid bases derived
    from parquet metadata, data read task-side (no driver materialize);
    bnodes distinct across files and stable across runs."""
    import os

    import pyarrow.parquet as pq_

    d = str(tmp_path / "nopk")
    os.makedirs(d + "/dm_multi.parquet", exist_ok=True)
    t1 = pa.table({"a": ["x", "y"], "b": [1, 2]})
    t2 = pa.table({"a": ["z", "x"], "b": [3, 1]})
    pq_.write_table(t1, d + "/dm_multi.parquet/part-0.parquet")
    pq_.write_table(t2, d + "/dm_multi.parquet/part-1.parquet")
    cat = Catalog(root=d)
    spec = direct_mapping(cat, base=B)
    got1 = set(collect_ntriples(run_mapping(spec, cat)))
    subs = {l.split(" ")[0] for l in got1}
    assert len(subs) == 4 and all(s.startswith("_:") for s in subs)
    assert len(got1) == 12  # 4 rows x (type + a + b)
    # deterministic across runs (retry/resume safety)
    got2 = set(collect_ntriples(run_mapping(spec, cat)))
    assert got1 == got2


def test_get_pattern_bgp(ray_session, dm_catalog):
    """Store get_pattern parity: multi-pattern BGP with shared vars,
    bound-literal constraint, fully-bound existence filter."""
    from p5_rdf_rdb2rdf_ray.engine.lookup import get_pattern

    # employees → dept → dept name
    rows = get_pattern(
        dm_catalog,
        [
            ("?e", B + "dm_emp#ref-dept_id", "?d"),
            ("?d", B + "dm_dept#dname", "?dn"),
        ],
        base=B,
    ).take_all()
    got = {(r["e"], r["dn"]) for r in rows}
    assert got == {
        (B + "dm_emp/emp_id=1", "eng"),
        (B + "dm_emp/emp_id=2", "eng"),
        (B + "dm_emp/emp_id=3", "ops"),
        (B + "dm_emp/emp_id=4", "ops"),
    }
    # bound literal narrows to one dept
    rows2 = get_pattern(
        dm_catalog,
        [
            ("?e", B + "dm_emp#ref-dept_id", "?d"),
            ("?d", B + "dm_dept#dname", ("lit", "eng")),
        ],
        base=B,
    ).take_all()
    assert sorted(r["e"] for r in rows2) == [
        B + "dm_emp/emp_id=1",
        B + "dm_emp/emp_id=2",
    ]
    # fully-bound pattern: true → no effect, false → empty
    rows3 = get_pattern(
        dm_catalog,
        [
            (B + "dm_dept/dept_id=1", B + "dm_dept#dname", ("lit", "eng")),
            ("?e", B + "dm_emp#ref-dept_id", B + "dm_dept/dept_id=1"),
        ],
        base=B,
    ).take_all()
    assert len(rows3) == 2
    rows4 = get_pattern(
        dm_catalog,
        [
            (B + "dm_dept/dept_id=1", B + "dm_dept#dname", ("lit", "nope")),
            ("?e", B + "dm_emp#ref-dept_id", B + "dm_dept/dept_id=1"),
        ],
        base=B,
    ).take_all()
    assert rows4 == []


def test_get_pattern_store_matches_source(ray_session, dm_catalog, tmp_path):
    """BGP over the MATERIALIZED store (bucket pruning + parquet filters)
    gives the same bindings as the source-table planner."""
    from p5_rdf_rdb2rdf_ray.engine.lookup import get_pattern, get_pattern_store
    from p5_rdf_rdb2rdf_ray.sinks.triplestore import write_triplestore

    out = str(tmp_path / "store")
    spec = direct_mapping(dm_catalog, base=B)
    write_triplestore(run_mapping(spec, dm_catalog), out, num_buckets=4)
    pats = [
        ("?e", B + "dm_emp#ref-dept_id", "?d"),
        ("?d", B + "dm_dept#dname", "?dn"),
    ]
    want = {
        (r["e"], r["d"], r["dn"])
        for r in get_pattern(dm_catalog, pats, base=B).take_all()
    }
    got = {
        (r["e"], r["d"], r["dn"])
        for r in get_pattern_store(out, pats).take_all()
    }
    assert got == want and len(got) == 4


def test_get_pattern_term_kind_no_string_iri_join(ray_session):
    """A literal whose lexical form spells a DM row-node IRI must NOT
    join an IRI/subject binding (the Store joins RDF terms, not strings)."""
    from p5_rdf_rdb2rdf_ray.engine.lookup import get_pattern

    k = pa.table(
        {
            "kid": pa.array([1, 2], pa.int64()),
            # note of row 2 lexically equals row 1's subject IRI
            "note": pa.array([f"hello", f"{B}dm_k/kid=1"]),
        }
    )
    cat = Catalog(
        root="", tables={"dm_k": k},
        layouts={"dm_k": TableLayout(pkey=("kid",))},
    )
    rows = get_pattern(
        cat,
        [
            ("?x", B + "dm_k#note", "?v"),  # ?v binds literals here
            ("?v", B + "dm_k#kid", "?n"),   # ?v as subject: IRIs only
        ],
        base=B,
    ).take_all()
    assert rows == []


def test_lookup_uncastable_bound_value_is_empty(ray_session, dm_catalog):
    """Store semantics: an uncastable bound term matches nothing (no
    ValueError from the int/float cast)."""
    from p5_rdf_rdb2rdf_ray.engine.lookup import count_statements

    assert (
        count_statements(
            dm_catalog, predicate=B + "dm_dept#dept_id", obj_literal="abc",
            base=B,
        )
        == 0
    )
    assert (
        count_statements(dm_catalog, subject=B + "dm_dept/dept_id=xyz", base=B)
        == 0
    )
    assert (
        count_statements(
            dm_catalog, predicate=B + "dm_emp#ref-dept_id",
            obj=B + "dm_dept/dept_id=zz", base=B,
        )
        == 0
    )


def test_dm_over_csv_table(ray_session, tmp_path):
    """Direct Mapping over a CSV logical table (DBI-ish: any table the
    catalog resolves — .parquet preferred, then .csv/.json)."""
    d = str(tmp_path / "csvcat")
    import os

    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "dm_pets.csv"), "w") as f:
        f.write("pet_id,name,legs\n1,rex,4\n2,tweety,2\n")
    cat = Catalog(root=d, layouts={"dm_pets": TableLayout(pkey=("pet_id",))})
    spec = direct_mapping(cat, base=B)
    got = set(collect_ntriples(run_mapping(spec, cat, distinct_buckets=2)))
    xint = "http://www.w3.org/2001/XMLSchema#integer"
    assert f'<{B}dm_pets/pet_id=1> <{B}dm_pets#name> "rex" .' in got
    assert f'<{B}dm_pets/pet_id=2> <{B}dm_pets#legs> "2"^^<{xint}> .' in got
    assert len(got) == 8  # 2 rows x (type + 3 cols)
    # bound-value lookup pushdown over the csv table
    from p5_rdf_rdb2rdf_ray.engine.lookup import get_statements

    rows = get_statements(
        cat, predicate=B + "dm_pets#name", obj_literal="rex", base=B,
        distinct_buckets=2,
    ).take_all()
    assert len(rows) == 1 and rows[0]["subj"] == B + "dm_pets/pet_id=1"


def test_bgp_filter_semantics(ray_session, tiny_catalog=None):
    """FILTER over bindings: numeric compare drops non-numeric lexicals
    (SPARQL type-error semantics); string compare is lexical."""
    import pandas as pd
    import ray.data as rd

    from p5_rdf_rdb2rdf_ray.engine.lookup import _apply_binding_filters

    acc = rd.from_pandas(
        pd.DataFrame(
            {
                "v": ["10", "9", "abc", "10.5", None],
                "s": ["x", "y", "x", "z", "x"],
            }
        )
    ).repartition(2)
    got = (
        _apply_binding_filters(acc, [("?v", ">", 9.5)])
        .to_pandas().sort_values("v").reset_index(drop=True)
    )
    assert got.v.tolist() == ["10", "10.5"]  # 'abc'/None dropped, 9 filtered
    got2 = (
        _apply_binding_filters(acc, [("?s", "==", "x"), ("?v", "<=", 10)])
        .to_pandas().sort_values("v").reset_index(drop=True)
    )
    assert got2.v.tolist() == ["10"]


def test_dm_output_duplicate_free_without_distinct(ray_session, dm_catalog):
    """The invariant get_statements' distinct=False default relies on:
    DM output (PK subjects, no-PK bnode subjects, FK refs) carries no
    duplicate triples even with the set-semantics stage disabled."""
    spec = direct_mapping(dm_catalog, base=B)
    lines = collect_ntriples(
        run_mapping(spec, dm_catalog, distinct=False)
    )
    assert len(lines) == len(set(lines))
    assert set(lines) == _golden_dm_lines()
    # no-PK table: per-row skolem bnodes keep even duplicate ROWS distinct
    nopk = Catalog(
        root="",
        tables={
            "t": pa.table({"v": pa.array(["x", "x", "y"])})
        },
        layouts={"t": TableLayout()},
    )
    lines2 = collect_ntriples(
        run_mapping(direct_mapping(nopk, base=B), nopk, distinct=False)
    )
    assert len(lines2) == len(set(lines2))  # 3 type + 3 value triples
    assert len(lines2) == 6


def test_star_fusion_matches_generic_bgp(ray_session, dm_catalog):
    """Star-group fusion (one scan, within-batch pivot) must produce
    exactly the generic per-pattern-join bindings — including dropping
    subjects with a NULL in any fused pattern's column, and joining
    correctly against a non-fused pattern on the shared subject var."""
    from p5_rdf_rdb2rdf_ray.engine.lookup import (
        _bgp_join,
        _star_groups,
        get_pattern,
        get_statements,
    )

    pats = [
        ("?d", B + "dm_dept#dname", "?n"),
        ("?d", B + "dm_dept#city", "?c"),   # dept 2 has NULL city
    ]

    def stmt_fn(**kw):
        return get_statements(dm_catalog, base=B, **kw)

    units, rest = _star_groups(dm_catalog, pats, B)
    assert len(units) == 1 and rest == []
    fused = get_pattern(dm_catalog, pats, base=B).to_pandas()
    generic = _bgp_join(stmt_fn, pats, 4).to_pandas()
    key = sorted(fused.columns)
    assert sorted(map(tuple, fused[key].values.tolist())) == sorted(
        map(tuple, generic[key].values.tolist())
    )
    assert set(fused["n"]) == {"eng", "hr"}  # ops dropped (NULL city)

    # star + non-fused pattern (employee side) joined on the shared var
    pats3 = pats + [("?e", B + "dm_emp#ref-dept_id", "?d")]
    # ?d appears as an OBJECT in the emp pattern → not fusable with it
    units3, rest3 = _star_groups(dm_catalog, pats3, B)
    assert len(units3) == 1 and len(rest3) == 1
    fused3 = get_pattern(dm_catalog, pats3, base=B).to_pandas()
    generic3 = _bgp_join(stmt_fn, pats3, 4).to_pandas()
    key3 = sorted(fused3.columns)
    assert sorted(map(tuple, fused3[key3].values.tolist())) == sorted(
        map(tuple, generic3[key3].values.tolist())
    )
    # emps 1,2 → dept 1 (eng/NYC); emps 3,4 → dept 2, dropped (NULL city)
    assert len(fused3) == 2


def test_bgp_hash_join_spill_matches_broadcast(ray_session, dm_catalog):
    """Past broadcast_limit the BGP fold spills to the co-hash-shuffle
    join; bindings must be identical to the broadcast plan (including
    the non-literal reconciliation on the shared var, which in the
    spill path filters the lazy side instead of the collected table)."""
    from p5_rdf_rdb2rdf_ray.engine.lookup import _bgp_join, get_statements

    pats = [
        ("?d", B + "dm_dept#dname", "?n"),
        ("?e", B + "dm_emp#ref-dept_id", "?d"),  # ?d re-bound as object
    ]

    def stmt_fn(**kw):
        return get_statements(dm_catalog, base=B, **kw)

    bc = _bgp_join(stmt_fn, pats, 4).to_pandas()
    sp = _bgp_join(stmt_fn, pats, 4, broadcast_limit=1).to_pandas()
    key = sorted(bc.columns)
    assert sorted(map(tuple, bc[key].values.tolist())) == sorted(
        map(tuple, sp[key].values.tolist())
    )
    assert len(bc) == 4  # emps 1,2 → dept 1; emps 3,4 → dept 2


def test_bgp_solution_modifiers(ray_session, dm_catalog):
    """ORDER BY / LIMIT / OFFSET over BGP bindings: per-block prune +
    one merge equals a driver-side sort-and-slice; NULLS LAST; offset
    pages correctly; misuse raises."""
    from p5_rdf_rdb2rdf_ray.engine.lookup import (
        apply_solution_modifiers,
        get_pattern,
    )

    pats = [("?e", B + "dm_emp#ename", "?en")]
    full = (
        get_pattern(dm_catalog, pats, base=B)
        .to_pandas()
        .sort_values("en", ascending=False, kind="mergesort")
        .reset_index(drop=True)
    )
    assert len(full) >= 4
    # LIMIT + OFFSET page = the slice of the fully ordered solutions
    page = get_pattern(
        dm_catalog, pats, base=B,
        order_by=[("?en", "desc")], limit=2, offset=1,
    ).to_pandas().reset_index(drop=True)
    assert list(page["en"]) == list(full["en"].iloc[1:3])
    # ORDER BY without LIMIT: full distributed sort, same multiset
    allrows = get_pattern(
        dm_catalog, pats, base=B, order_by=["?en"]
    ).to_pandas()
    assert sorted(allrows["en"]) == sorted(full["en"])
    # NULLS LAST with a limit that reaches into the NULL tail
    import pandas as _pd
    import ray.data as rd

    src = rd.from_pandas(
        _pd.DataFrame({"v": [3.0, None, 1.0, None, 2.0], "id": range(5)})
    )
    got = apply_solution_modifiers(
        src, order_by=[("?v", "desc")], limit=4
    ).to_pandas()
    assert list(got["v"].iloc[:3]) == [3.0, 2.0, 1.0]
    assert _pd.isna(got["v"].iloc[3])
    # misuse fails loudly
    with pytest.raises(ValueError, match="order_by"):
        apply_solution_modifiers(src, limit=2)
    with pytest.raises(ValueError, match="offset without limit"):
        apply_solution_modifiers(src, order_by=["?v"], offset=2)


def test_bgp_cross_product_respects_broadcast_limit(ray_session, dm_catalog):
    """A variable-disjoint (cross-product) side has no join key to spill
    on — past broadcast_limit it must raise loudly instead of silently
    materializing the whole side on the driver (round-3 advice: the old
    guard was `shared and total > limit`, exempting cross products)."""
    from p5_rdf_rdb2rdf_ray.engine.lookup import _bgp_join, get_statements

    pats = [
        ("?d", B + "dm_dept#dname", "?n"),
        ("?e", B + "dm_emp#ref-dept_id", "?f"),  # no shared variable
    ]

    def stmt_fn(**kw):
        return get_statements(dm_catalog, base=B, **kw)

    # within the limit the cross product works: |dname bindings| × |refs|
    n_dname = len(_bgp_join(stmt_fn, pats[:1], 4).to_pandas())
    n_refs = len(_bgp_join(stmt_fn, pats[1:], 4).to_pandas())
    ok = _bgp_join(stmt_fn, pats, 4).to_pandas()
    assert len(ok) == n_dname * n_refs > 0
    assert set(ok.columns) >= {"d", "n", "e", "f"}
    with pytest.raises(ValueError, match="cross-product"):
        _bgp_join(stmt_fn, pats, 4, broadcast_limit=1).to_pandas()


def test_store_star_fusion_matches_source(ray_session, dm_catalog, tmp_path):
    """Store-side star fusion (one whole-bucket scan + pivot) gives the
    same bindings as the source-table planner, and still joins correctly
    against a non-fused pattern."""
    from p5_rdf_rdb2rdf_ray.engine.lookup import (
        _store_star_groups,
        get_pattern,
        get_pattern_store,
    )
    from p5_rdf_rdb2rdf_ray.sinks.triplestore import write_triplestore

    out = str(tmp_path / "store")
    spec = direct_mapping(dm_catalog, base=B)
    write_triplestore(run_mapping(spec, dm_catalog), out, num_buckets=4)
    pats = [
        ("?d", B + "dm_dept#dname", "?n"),
        ("?d", B + "dm_dept#city", "?c"),
        ("?e", B + "dm_emp#ref-dept_id", "?d"),
    ]
    units, rest = _store_star_groups(out, pats)
    assert len(units) == 1 and len(rest) == 1
    want = {
        (r["d"], r["n"], r["c"], r["e"])
        for r in get_pattern(dm_catalog, pats, base=B).take_all()
    }
    got = {
        (r["d"], r["n"], r["c"], r["e"])
        for r in get_pattern_store(out, pats).take_all()
    }
    assert got == want and len(got) == 2  # dept 2 dropped (NULL city)
    # solution modifiers work on the store-backed planner too
    first = get_pattern_store(
        out, pats, order_by=[("?e", "desc")], limit=1
    ).to_pandas()
    assert len(first) == 1
    assert first["e"].iloc[0] == max(t[3] for t in want)


def test_star_fusion_bound_literal(ray_session, dm_catalog):
    """A ("lit", value) pattern fuses into its subject's star group as an
    existence filter with the same lexical-equality semantics as the
    generic bound-object gate (typed literals match on lexical form)."""
    from p5_rdf_rdb2rdf_ray.engine.lookup import (
        _star_groups,
        get_pattern,
        get_statements,
        _bgp_join,
    )

    pats = [
        ("?e", B + "dm_emp#ename", "?n"),
        ("?e", B + "dm_emp#dept_id", ("lit", "1")),  # int column, lexical "1"
    ]
    units, rest = _star_groups(dm_catalog, pats, B)
    assert len(units) == 1 and rest == []
    got = get_pattern(dm_catalog, pats, base=B).to_pandas()
    assert sorted(got["n"]) == ["a", "b"]  # emps 1,2 are in dept 1

    def stmt_fn(**kw):
        return get_statements(dm_catalog, base=B, **kw)

    generic = _bgp_join(stmt_fn, pats, 4).to_pandas()
    assert sorted(generic["n"]) == sorted(got["n"])
    # non-matching lexical form ("01" is not the canonical int lexical)
    none = get_pattern(
        dm_catalog,
        [("?e", B + "dm_emp#ename", "?n"),
         ("?e", B + "dm_emp#dept_id", ("lit", "01"))],
        base=B,
    ).to_pandas()
    assert len(none) == 0


def test_star_fusion_survives_block_splits(ray_session, dm_catalog):
    """The pivot is fused into the expansion UDF, so Ray's output block
    splitting (forced here with a tiny target_max_block_size) can never
    separate a source row's triples before the within-batch merge."""
    import ray.data as rdd

    ctx = rdd.DataContext.get_current()
    old = ctx.target_max_block_size
    ctx.target_max_block_size = 1024  # force aggressive output splits
    try:
        from p5_rdf_rdb2rdf_ray.engine.lookup import get_pattern

        pats = [
            ("?e", B + "dm_emp#ename", "?n"),
            ("?e", B + "dm_emp#dept_id", "?dk"),
        ]
        got = get_pattern(dm_catalog, pats, base=B).to_pandas()
        assert sorted(got["n"]) == ["a", "b", "c", "d"]  # emp 5: NULL dept
    finally:
        ctx.target_max_block_size = old


def test_star_fusion_reserved_var_falls_back(ray_session, dm_catalog):
    """An object variable named like a triple column (?subj) must not be
    fused (the pivot's working frame would clobber it) — the generic
    path serves it with correct bindings."""
    from p5_rdf_rdb2rdf_ray.engine.lookup import _star_groups, get_pattern

    pats = [
        ("?d", B + "dm_dept#dname", "?subj"),
        ("?d", B + "dm_dept#city", "?c"),
    ]
    units, rest = _star_groups(dm_catalog, pats, B)
    assert not units and len(rest) == 2  # ?subj blocks the whole group's win
    got = get_pattern(dm_catalog, pats, base=B).to_pandas()
    assert sorted(got["subj"]) == ["eng", "hr"]


def test_bgp_optional_group(ray_session, dm_catalog, tmp_path):
    """OPTIONAL (left-outer) group semantics: required rows survive an
    unmatched group with NULL group vars; matched rows bind; the store
    variant agrees; a group sharing no variable raises."""
    import pandas as pd

    from p5_rdf_rdb2rdf_ray.engine.lookup import get_pattern, get_pattern_store
    from p5_rdf_rdb2rdf_ray.sinks.triplestore import write_triplestore

    req = [("?d", B + "dm_dept#dname", "?n")]
    opt = [("?d", B + "dm_dept#city", "?c")]  # dept 2 (ops) has NULL city
    out = (
        get_pattern(dm_catalog, req, base=B, optional=opt)
        .to_pandas().sort_values("n").reset_index(drop=True)
    )
    assert list(out["n"]) == ["eng", "hr", "ops"]
    assert list(out["c"])[:2] == ["NYC", "SFO"] and pd.isna(out["c"][2])

    # group rendered unmatched by a bound literal: every var NULL
    out2 = get_pattern(
        dm_catalog, req, base=B,
        optional=[("?d", B + "dm_dept#city", ("lit", "LA")),
                  ("?d", B + "dm_dept#dept_id", "?k")],
    ).to_pandas()
    assert len(out2) == 3 and out2["k"].isna().all()

    # FILTER on an optional var drops NULL bindings (SPARQL type error)
    out3 = get_pattern(
        dm_catalog, req, base=B, optional=opt, filters=[("?c", "!=", "NYC")]
    ).to_pandas()
    assert sorted(out3["n"]) == ["hr"]

    # store-served variant agrees
    store = str(tmp_path / "store")
    write_triplestore(
        run_mapping(direct_mapping(dm_catalog, base=B), dm_catalog),
        store, num_buckets=4,
    )
    got = (
        get_pattern_store(store, req, optional=opt)
        .to_pandas().sort_values("n").reset_index(drop=True)
    )
    assert got[["n"]].equals(out[["n"]])
    assert list(got["c"].fillna("-")) == list(out["c"].fillna("-"))

    with pytest.raises(ValueError, match="shares no variable"):
        get_pattern(
            dm_catalog, req, base=B,
            optional=[("?x", B + "dm_emp#ename", "?y")],
        )


def test_bgp_negation_minus_not_exists(ray_session, dm_catalog, tmp_path):
    """SPARQL 1.1 §8 negation over the BGP surface: MINUS / FILTER NOT
    EXISTS as a distributed anti-join on the shared variables; the two
    forms diverge exactly on variable-disjoint groups (§8.3.3)."""
    from p5_rdf_rdb2rdf_ray.engine.lookup import get_pattern, get_pattern_store
    from p5_rdf_rdb2rdf_ray.sinks.triplestore import write_triplestore

    req = [("?d", B + "dm_dept#dname", "?n")]
    neg = [("?e", B + "dm_emp#ref-dept_id", "?d")]  # depts 1,2 referenced

    # MINUS: departments with no employee. ?d is a SUBJECT on the
    # required side (no kind column) and an OBJECT in the group (kind
    # column) — the anti-join derives the subject side's kind.
    out = get_pattern(dm_catalog, req, base=B, minus=neg).to_pandas()
    assert list(out["n"]) == ["hr"]

    # NOT EXISTS coincides when variables are shared
    out2 = get_pattern(dm_catalog, req, base=B, not_exists=neg).to_pandas()
    assert list(out2["n"]) == ["hr"]

    # spill path (anti side past broadcast_limit → union-tag hash join)
    sp = get_pattern(
        dm_catalog, req, base=B, minus=neg, broadcast_limit=1
    ).to_pandas()
    assert list(sp["n"]) == ["hr"]

    # variable-disjoint group: MINUS is a no-op, NOT EXISTS is a global
    # existence gate
    disj = [("?e", B + "dm_emp#ename", "?y")]
    assert (
        get_pattern(dm_catalog, req, base=B, minus=disj).count() == 3
    )
    assert (
        get_pattern(dm_catalog, req, base=B, not_exists=disj).count() == 0
    )
    # ... and an unmatchable disjoint group gates nothing
    never = [("?e", B + "dm_emp#ename", ("lit", "zzz"))]
    assert (
        get_pattern(dm_catalog, req, base=B, not_exists=never).count() == 3
    )

    # store-served variant agrees
    store = str(tmp_path / "store")
    write_triplestore(
        run_mapping(direct_mapping(dm_catalog, base=B), dm_catalog),
        store, num_buckets=4,
    )
    got = get_pattern_store(store, req, minus=neg).to_pandas()
    assert list(got["n"]) == ["hr"]


def test_bgp_negation_term_kind_soundness(ray_session):
    """A literal whose lexical form spells a row-node IRI must SURVIVE a
    MINUS whose group binds that IRI — the anti-join compares RDF terms,
    not strings (and unlike the inner-join literal-filter trick, must
    not drop the literal row either)."""
    from p5_rdf_rdb2rdf_ray.engine.lookup import get_pattern

    k = pa.table(
        {
            "kid": pa.array([1, 2], pa.int64()),
            # note of row 2 lexically equals row 1's subject IRI
            "note": pa.array(["hello", f"{B}dm_k/kid=1"]),
        }
    )
    cat = Catalog(
        root="", tables={"dm_k": k},
        layouts={"dm_k": TableLayout(pkey=("kid",))},
    )
    # required: ?v binds the note LITERALS; group: ?v as the OBJECT of a
    # kid lookup... no ref map exists, so bind ?v as a SUBJECT instead:
    # the group solutions are the row-node IRIs. A lexical anti-join
    # would kill the row-2 literal; the term-aware one keeps both.
    out = get_pattern(
        cat,
        [("?x", B + "dm_k#note", "?v")],
        base=B,
        minus=[("?v", B + "dm_k#kid", "?n")],
    ).to_pandas()
    assert sorted(out["v"]) == ["hello", f"{B}dm_k/kid=1"]


def test_bgp_values_inline_data(ray_session, dm_catalog, tmp_path):
    """SPARQL VALUES §7.2: inline data joins the BGP as a term-typed
    binding unit — literal terms match literal bindings only, IRI terms
    match node bindings only; the store planner agrees; UNDEF rejects."""
    from p5_rdf_rdb2rdf_ray.engine.lookup import get_pattern, get_pattern_store
    from p5_rdf_rdb2rdf_ray.sinks.triplestore import write_triplestore

    pats = [("?d", B + "dm_dept#dname", "?n")]
    vals = (["?n"], [(("lit", "eng"),), (("lit", "hr"),)])
    out = get_pattern(dm_catalog, pats, base=B, values=vals).to_pandas()
    assert sorted(out["n"]) == ["eng", "hr"]

    # IRI term in VALUES never matches a literal binding
    out2 = get_pattern(
        dm_catalog, pats, base=B, values=(["?n"], [("eng",)])
    ).to_pandas()
    assert len(out2) == 0

    # two-variable VALUES rows constrain jointly (row-wise, not cross)
    pats2 = [
        ("?e", B + "dm_emp#ref-dept_id", "?d"),
        ("?d", B + "dm_dept#dname", "?n"),
    ]
    out3 = get_pattern(
        dm_catalog, pats2, base=B,
        values=(
            ["?d", "?n"],
            [
                (B + "dm_dept/dept_id=1", ("lit", "eng")),   # consistent
                (B + "dm_dept/dept_id=2", ("lit", "eng")),   # inconsistent
            ],
        ),
    ).to_pandas()
    assert sorted(out3["e"]) == [
        B + "dm_emp/emp_id=1", B + "dm_emp/emp_id=2",
    ]

    # store planner agrees
    store = str(tmp_path / "store")
    write_triplestore(
        run_mapping(direct_mapping(dm_catalog, base=B), dm_catalog),
        store, num_buckets=4,
    )
    got = get_pattern_store(store, pats, values=vals).to_pandas()
    assert sorted(got["n"]) == ["eng", "hr"]

    with pytest.raises(ValueError, match="UNDEF"):
        get_pattern(
            dm_catalog, pats, base=B, values=(["?n"], [(None,)])
        )


def test_bgp_filter_scan_pushdown(ray_session, dm_catalog):
    """FILTER → scan predicate pushdown: type-aligned comparisons reach
    the reader (pruning-only; binding filter still applies), mismatched
    classes and BIND vars stay binding-level, and results equal the
    unpushed plan exactly."""
    from p5_rdf_rdb2rdf_ray.engine.lookup import (
        _filter_pushdown_expr,
        get_pattern,
    )

    items = [(B + "dm_emp#emp_id", "i"), (B + "dm_emp#ename", "nm")]
    # aligned: numeric vs int column, string vs string column
    e = _filter_pushdown_expr(
        dm_catalog, B, "dm_emp", items,
        [("?i", ">=", 2), ("?nm", "==", "c")],
    )
    assert e is not None
    # misaligned: numeric compare on a string column must NOT push
    assert _filter_pushdown_expr(
        dm_catalog, B, "dm_emp", items, [("?nm", ">=", 3)]
    ) is None
    # unknown var (e.g. a BIND target) must not push
    assert _filter_pushdown_expr(
        dm_catalog, B, "dm_emp", items, [("?zz", "==", "x")]
    ) is None

    # disjunction: pushes only when EVERY disjunct pushes
    assert _filter_pushdown_expr(
        dm_catalog, B, "dm_emp", items,
        [("or", [("?i", ">=", 2), ("?nm", "==", "c")])],
    ) is not None
    assert _filter_pushdown_expr(
        dm_catalog, B, "dm_emp", items,
        [("or", [("?i", ">=", 2), ("?zz", "==", "x")])],
    ) is None
    # AND group inside: partial push of the conjunction is sound
    assert _filter_pushdown_expr(
        dm_catalog, B, "dm_emp", items,
        [("and", [("?i", ">=", 2), ("?zz", "==", "x")])],
    ) is not None

    # end-to-end: pushdown plan == binding-filter-only plan
    pats = [
        ("?e", B + "dm_emp#emp_id", "?i"),
        ("?e", B + "dm_emp#ename", "?nm"),
    ]
    flt = [("?i", ">=", 2), ("?nm", "!=", "d")]
    got = (
        get_pattern(dm_catalog, pats, base=B, filters=flt)
        .to_pandas()
        .sort_values("i")
        .reset_index(drop=True)
    )
    assert got["i"].tolist() == ["2", "3", "5"]
    assert got["nm"].tolist() == ["b", "c", "e"]


def test_bgp_store_filter_pushdown_multivalued(ray_session, tmp_path):
    """Store-side FILTER pushdown stays exact when a subject carries
    MULTIPLE values for the filtered predicate (general graphs, unlike
    DM): each triple row is its own binding row, so pruning a failing
    value's ROW equals the binding-level drop of that solution."""
    import pyarrow as pa
    import ray.data as rd

    from p5_rdf_rdb2rdf_ray.engine.lookup import get_pattern_store
    from p5_rdf_rdb2rdf_ray.sinks.triplestore import write_triplestore
    from p5_rdf_rdb2rdf_ray.terms import KIND_IRI, KIND_LITERAL, TRIPLE_SCHEMA

    P, Q = B + "p#tag", B + "p#size"
    rows = [
        (B + "s1", P, "apple", KIND_LITERAL, None, None, None),
        (B + "s1", P, "zebra", KIND_LITERAL, None, None, None),
        (B + "s1", Q, "small", KIND_LITERAL, None, None, None),
        (B + "s2", P, "apple", KIND_LITERAL, None, None, None),
        (B + "s2", Q, "large", KIND_LITERAL, None, None, None),
        (B + "s3", P, "mango", KIND_LITERAL, None, None, None),
        (B + "s3", Q, "small", KIND_LITERAL, None, None, None),
    ]
    t = pa.Table.from_arrays(
        [pa.array(c, f.type) for c, f in zip(zip(*rows), TRIPLE_SCHEMA)],
        schema=TRIPLE_SCHEMA,
    )
    store = str(tmp_path / "mv_store")
    write_triplestore(rd.from_arrow(t), store, num_buckets=4)

    pats = [("?s", P, "?v"), ("?s", Q, "?z")]
    got = (
        get_pattern_store(store, pats, filters=[("?v", "<=", "mango")])
        .to_pandas()
        .sort_values(["s", "v"])
        .reset_index(drop=True)
    )
    # s1 keeps ONLY its apple solution (zebra row pruned, subject stays
    # via its other value); s2 apple; s3 mango
    assert list(zip(got["s"], got["v"])) == [
        (B + "s1", "apple"),
        (B + "s2", "apple"),
        (B + "s3", "mango"),
    ]
    assert got["z"].tolist() == ["small", "large", "small"]
    # numeric filter on the store surface never pushes (lexical column);
    # still correct via the binding filter
    got2 = get_pattern_store(
        store, pats, filters=[("?v", ">=", 1)]
    ).to_pandas()
    assert len(got2) == 0  # no lexical form parses numeric

    # SAME predicate bound to TWO variables: the filter must NOT push
    # (the pruned row is still needed as the other variable's binding) —
    # s1 has P->apple and P->zebra; filtering ?v1<=mango must keep the
    # (apple, zebra) solution
    got3 = (
        get_pattern_store(
            store,
            [("?s", P, "?v1"), ("?s", P, "?v2")],
            filters=[("?v1", "<=", "mango")],
        )
        .to_pandas()
        .sort_values(["s", "v1", "v2"])
        .reset_index(drop=True)
    )
    s1 = got3[got3["s"] == B + "s1"]
    assert sorted(zip(s1["v1"], s1["v2"])) == [
        ("apple", "apple"),
        ("apple", "zebra"),
    ]


def test_bgp_bind_extend(ray_session, dm_catalog, tmp_path):
    """SPARQL BIND §7.6: computed variables extend the bindings before
    FILTER (a FILTER may constrain a BIND'd var); expression errors
    leave the var unbound (NULL, §10); ("iri", …) binds an IRI term
    CONSTRUCT can emit; rebinding an in-scope var raises; the store
    planner agrees."""
    from p5_rdf_rdb2rdf_ray.engine.lookup import get_pattern, get_pattern_store
    from p5_rdf_rdb2rdf_ray.sinks.triplestore import write_triplestore

    pats = [("?d", B + "dm_dept#dname", "?n")]
    out = get_pattern(
        dm_catalog, pats, base=B,
        bind=[
            ("?u", ("concat", ("ucase", "?n"), "!")),
            ("?l", ("strlen", "?n")),
        ],
    ).to_pandas()
    assert dict(zip(out["n"], out["u"])) == {
        "eng": "ENG!", "ops": "OPS!", "hr": "HR!",
    }
    assert dict(zip(out["n"], out["l"])) == {"eng": "3", "ops": "3", "hr": "2"}

    # FILTER sees the BIND'd variable
    out2 = get_pattern(
        dm_catalog, pats, base=B,
        bind=[("?l", ("strlen", "?n"))],
        filters=[("?l", ">=", 3)],
    ).to_pandas()
    assert sorted(out2["n"]) == ["eng", "ops"]

    # arithmetic over a non-numeric lexical form -> unbound (NULL)
    out3 = get_pattern(
        dm_catalog, pats, base=B, bind=[("?x", ("*", "?n", 2))]
    ).to_pandas()
    assert out3["x"].isna().all()
    # ... and numeric lexical forms compute (integral stays integer-form)
    out4 = get_pattern(
        dm_catalog,
        [("?e", B + "dm_emp#emp_id", "?i")],
        base=B,
        bind=[("?x", ("+", "?i", 10))],
    ).to_pandas()
    assert sorted(out4["x"]) == ["11", "12", "13", "14", "15"]

    # ("iri", ...) mints an IRI-kind binding usable by CONSTRUCT
    from p5_rdf_rdb2rdf_ray.engine.construct import construct

    bindings = get_pattern(
        dm_catalog, pats, base=B,
        bind=[("?s2", ("iri", ("concat", B + "alias/", "?n")))],
        keep_kinds=True,
    )
    trip = construct(
        bindings, [("?s2", B + "p#label", "?n")]
    ).to_pandas()
    assert set(trip["subj"]) == {
        B + "alias/eng", B + "alias/ops", B + "alias/hr",
    }
    assert set(trip["obj_kind"]) == {2}  # literal objects

    # IF / COALESCE: condition uses FILTER semantics; an erroring
    # (non-numeric) condition leaves the var unbound, not `else`
    out_if = get_pattern(
        dm_catalog,
        [("?e", B + "dm_emp#emp_id", "?i"), ("?e", B + "dm_emp#ename", "?nm")],
        base=B,
        bind=[
            ("?sz", ("if", ("?i", ">=", 3), "big", ("ucase", "?nm"))),
            ("?bad", ("if", ("?nm", ">", 2), "x", "y")),  # non-numeric cond
            ("?co", ("coalesce", ("if", ("?i", ">", 4), "five", None), "?nm")),
        ],
    ).to_pandas()
    m = out_if.set_index("i")
    assert m.loc["3", "sz"] == "big" and m.loc["1", "sz"] == "A"
    assert out_if["bad"].isna().all()
    assert m.loc["5", "co"] == "five" and m.loc["2", "co"] == "b"

    # sequential scoping (§7.6): a later BIND sees an earlier one
    out5 = get_pattern(
        dm_catalog, pats, base=B,
        bind=[
            ("?u", ("ucase", "?n")),
            ("?uu", ("concat", "?u", "+", "?u")),
        ],
    ).to_pandas()
    assert dict(zip(out5["n"], out5["uu"]))["eng"] == "ENG+ENG"

    # lexical form is PER-VALUE (block-layout independent): integral
    # division results print as integers, fractional ones as decimals
    out6 = get_pattern(
        dm_catalog,
        [("?e", B + "dm_emp#emp_id", "?i")],
        base=B,
        bind=[("?h", ("/", "?i", 2))],
    ).to_pandas()
    assert sorted(out6["h"]) == ["0.5", "1", "1.5", "2", "2.5"]

    # rebinding an in-scope variable is a query error
    with pytest.raises(ValueError, match="already in scope"):
        get_pattern(dm_catalog, pats, base=B, bind=[("?n", ("ucase", "?n"))])

    # store planner agrees
    store = str(tmp_path / "store")
    write_triplestore(
        run_mapping(direct_mapping(dm_catalog, base=B), dm_catalog),
        store, num_buckets=4,
    )
    got = get_pattern_store(
        store, pats, bind=[("?u", ("ucase", "?n"))]
    ).to_pandas()
    assert sorted(got["u"]) == ["ENG", "HR", "OPS"]


def test_describe_cbd_and_ask(ray_session, dm_catalog, tmp_path):
    """DESCRIBE = Concise Bounded Description: outgoing triples plus
    recursive blank-node closure (cycle-safe, depth-capped); other
    nodes' triples excluded. ASK early-exits with a boolean."""
    import pyarrow as pa
    import ray.data as rd

    from p5_rdf_rdb2rdf_ray.engine.lookup import ask, describe, describe_store, get_pattern
    from p5_rdf_rdb2rdf_ray.sinks.triplestore import write_triplestore
    from p5_rdf_rdb2rdf_ray.terms import (
        KIND_BNODE,
        KIND_IRI,
        KIND_LITERAL,
        TRIPLE_SCHEMA,
    )

    def row(s, p, o, k):
        return (s, p, o, k, None, None, None)

    rows = [
        row(B + "a", B + "p", "_:b1", KIND_BNODE),
        row("_:b1", B + "q", "v", KIND_LITERAL),
        row("_:b1", B + "r", "_:b2", KIND_BNODE),
        row("_:b2", B + "s", "w", KIND_LITERAL),
        row("_:b2", B + "back", "_:b1", KIND_BNODE),  # bnode cycle
        row(B + "a", B + "t", B + "c", KIND_IRI),     # IRI obj: no recursion
        row(B + "c", B + "u", "z", KIND_LITERAL),     # another node's triple
    ]
    t = pa.Table.from_arrays(
        [pa.array(col, f.type) for col, f in zip(zip(*rows), TRIPLE_SCHEMA)],
        schema=TRIPLE_SCHEMA,
    )
    store = str(tmp_path / "cbd_store")
    write_triplestore(rd.from_arrow(t), store, num_buckets=4)

    got = describe_store(store, B + "a").to_pandas()
    assert len(got) == 6  # everything except <c>'s own triple
    assert B + "u" not in set(got["pred"])
    assert len(got.drop_duplicates()) == 6

    # depth cap: 0 bnode-follow steps = the node's own triples only
    shallow = describe_store(store, B + "a", max_depth=0).to_pandas()
    assert sorted(shallow["pred"]) == [B + "p", B + "t"]

    # DM-surface describe: a node's own triples, multiple nodes union
    d = describe(
        dm_catalog, [B + "dm_dept/dept_id=1", B + "dm_dept/dept_id=2"], base=B
    ).to_pandas()
    assert set(d["subj"]) == {B + "dm_dept/dept_id=1", B + "dm_dept/dept_id=2"}
    assert (d["subj"] == B + "dm_dept/dept_id=1").sum() == 4  # type+3 cols

    # ASK: satisfiable / unsatisfiable
    pats_yes = [("?d", B + "dm_dept#dname", ("lit", "eng"))]
    pats_no = [("?d", B + "dm_dept#dname", ("lit", "nope"))]
    assert ask(get_pattern(dm_catalog, pats_yes, base=B)) is True
    assert ask(get_pattern(dm_catalog, pats_no, base=B)) is False


def test_bgp_union_alignment_and_dedup(ray_session, dm_catalog):
    """UNION groups align on the variable union (NULL where unbound),
    and identical terms from different groups collapse in the distinct
    even when only one group carried an explicit term-kind column."""
    from p5_rdf_rdb2rdf_ray.engine.lookup import get_pattern_union

    # both groups produce the SAME (d) binding: group 1 binds d as a
    # SUBJECT (no kind column), group 2 binds d as an OBJECT of the emp
    # ref (kind column present) — the surface-form kind fill must make
    # them collapse to one solution per dept
    out = get_pattern_union(
        dm_catalog,
        [
            [("?d", B + "dm_dept#dept_id", "?k")],
            [("?e", B + "dm_emp#ref-dept_id", "?d")],
        ],
        base=B,
    ).to_pandas()
    # group1: 3 depts with k bound; group2: 4 emp refs (depts 1,2 × 2
    # emps) with e bound, k NULL
    assert len(out) == 3 + 4
    # distinct collapses duplicate (d, NULL k, NULL e) rows within groups
    only_d = out[out["k"].isna() & out["e"].notna()]
    assert len(only_d) == 4


def test_store_union_matches_source_union(ray_session, dm_catalog, tmp_path):
    from p5_rdf_rdb2rdf_ray.engine.lookup import (
        get_pattern_store_union,
        get_pattern_union,
    )
    from p5_rdf_rdb2rdf_ray.sinks.triplestore import write_triplestore

    store = str(tmp_path / "store")
    write_triplestore(
        run_mapping(direct_mapping(dm_catalog, base=B), dm_catalog),
        store, num_buckets=4,
    )
    groups = [
        [("?d", B + "dm_dept#dname", "?x")],
        [("?d", B + "dm_dept#city", "?x")],
    ]
    want = {
        (r["d"], r["x"])
        for r in get_pattern_union(dm_catalog, groups, base=B).take_all()
    }
    got = {
        (r["d"], r["x"])
        for r in get_pattern_store_union(store, groups).take_all()
    }
    assert got == want and len(got) == 5  # 3 names + 2 non-null cities


def test_bgp_optional_filter_distinct_across_blocks(ray_session, dm_catalog):
    """Regression: the FILTER stage must not round-trip the nullable
    __k_* kind columns through pandas — blocks containing NULL kinds
    would widen to float64, hash differently from uint8 blocks, and the
    same logical solution would survive the final distinct twice."""
    from p5_rdf_rdb2rdf_ray.engine.lookup import get_pattern

    req = [("?d", B + "dm_dept#dname", "?n")]
    opt = [("?d", B + "dm_dept#city", "?c")]
    out = get_pattern(
        dm_catalog, req, base=B, optional=opt, filters=[("?n", "!=", "zzz")]
    ).to_pandas()
    # 3 logical solutions, exactly once each (mixed NULL/non-NULL kinds)
    assert len(out) == 3
    assert sorted(out["n"]) == ["eng", "hr", "ops"]

    # spill path (broadcast_limit=1) for the OPTIONAL left-outer join
    from p5_rdf_rdb2rdf_ray.engine.lookup import _bgp_join, get_statements

    def stmt_fn(**kw):
        return get_statements(dm_catalog, base=B, **kw)

    sp = _bgp_join(
        stmt_fn, req, 4, optional_groups=[(opt, [])], broadcast_limit=1
    ).to_pandas().sort_values("n").reset_index(drop=True)
    bc = _bgp_join(
        stmt_fn, req, 4, optional_groups=[(opt, [])]
    ).to_pandas().sort_values("n").reset_index(drop=True)
    assert list(sp["n"]) == list(bc["n"])
    assert list(sp["c"].fillna("-")) == list(bc["c"].fillna("-"))

    # the no-shared-variable error is structural, not data-dependent:
    # it raises even when a fully-bound group pattern matches nothing
    with pytest.raises(ValueError, match="shares no variable"):
        get_pattern(
            dm_catalog, req, base=B,
            optional=[
                (B + "dm_dept/dept_id=1", B + "dm_dept#dname", ("lit", "NO")),
                ("?x", B + "dm_emp#ename", "?y"),
            ],
        )


def test_dm_over_json_table(ray_session, tmp_path):
    """Direct Mapping over a JSON-lines logical table (the third
    catalog-resolvable source format; the CSV twin is above)."""
    import os

    d = str(tmp_path / "jsoncat")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "dm_pets.json"), "w") as f:
        f.write('{"pet_id": 1, "name": "rex", "legs": 4}\n')
        f.write('{"pet_id": 2, "name": "tweety", "legs": 2}\n')
    cat = Catalog(root=d, layouts={"dm_pets": TableLayout(pkey=("pet_id",))})
    spec = direct_mapping(cat, base=B)
    got = set(collect_ntriples(run_mapping(spec, cat, distinct=False)))
    xint = "http://www.w3.org/2001/XMLSchema#integer"
    assert f'<{B}dm_pets/pet_id=1> <{B}dm_pets#name> "rex" .' in got
    assert f'<{B}dm_pets/pet_id=2> <{B}dm_pets#legs> "2"^^<{xint}> .' in got
    assert len(got) == 8


def test_dm_over_sharded_directory_table(ray_session, tmp_path):
    """A DIRECTORY of parquet shards is a logical table (the at-scale
    layout): catalog resolution, schema, DM, and lookup all see it."""
    import os

    import pyarrow.parquet as pq

    d = str(tmp_path / "cat")
    os.makedirs(os.path.join(d, "dm_shards"))
    for i, ids in enumerate(([1, 2], [3])):
        pq.write_table(
            pa.table({"sid": pa.array(ids, pa.int64()),
                      "v": [f"v{x}" for x in ids]}),
            os.path.join(d, "dm_shards", f"part-{i}.parquet"),
        )
    cat = Catalog(root=d, layouts={"dm_shards": TableLayout(pkey=("sid",))})
    assert "dm_shards" in cat.table_names()
    assert len(cat.files("dm_shards")) == 2
    got = set(collect_ntriples(
        run_mapping(direct_mapping(cat, base=B), cat, distinct=False)
    ))
    assert f'<{B}dm_shards/sid=3> <{B}dm_shards#v> "v3" .' in got
    assert len(got) == 9  # 3 rows x (type + 2 cols)

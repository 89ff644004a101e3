"""SPARQL text front-end (engine/sparql.py): parser round-trips —
every supported algebra feature as a query STRING, checked against the
programmatic planner call or hand-derived expectations."""

from __future__ import annotations

import pyarrow as pa
import pytest
import ray.data as rd

from p5_rdf_rdb2rdf_ray.engine.sparql import parse_query, sparql
from p5_rdf_rdb2rdf_ray.terms import KIND_IRI, KIND_LITERAL

N = "http://n/"


@pytest.fixture(scope="module")
def store(ray_session, tmp_path_factory):
    from p5_rdf_rdb2rdf_ray.sinks.triplestore import write_triplestore

    I, L = KIND_IRI, KIND_LITERAL
    rows = [
        (N + "a", N + "p", N + "b", I),
        (N + "b", N + "p", N + "c", I),
        (N + "a", N + "name", "alpha", L),
        (N + "b", N + "name", "beta", L),
        (N + "c", N + "name", "gamma", L),
        (N + "a", N + "score", "3", L),
        (N + "b", N + "score", "7", L),
        (N + "c", N + "score", "7", L),
        (N + "a", N + "tag", "keep", L),
        (N + "b", N + "tag", "drop", L),
        (N + "a", N + "q", N + "c", I),
    ]
    t = pa.table(
        {
            "subj": [r[0] for r in rows],
            "pred": [r[1] for r in rows],
            "obj": [r[2] for r in rows],
            "obj_kind": pa.array([r[3] for r in rows], pa.uint8()),
            "lang": pa.array([None] * len(rows), pa.string()),
            "datatype": pa.array([None] * len(rows), pa.string()),
            "graph": pa.array([None] * len(rows), pa.string()),
        }
    )
    out = str(tmp_path_factory.mktemp("sparqlstore") / "store")
    write_triplestore(rd.from_arrow(t), out, num_buckets=4)
    return out


def _rows(ds):
    return ds.take_all()


def test_select_filter_order_limit(store):
    got = _rows(
        sparql(
            store,
            f"""
            # comment lines are skipped
            SELECT ?s ?nm WHERE {{
              ?s <{N}name> ?nm .
              FILTER(?nm != "beta" && ?nm >= "alpha")
            }} ORDER BY DESC(?nm) LIMIT 2
            """,
        )
    )
    assert [(r["s"], r["nm"]) for r in got] == [
        (N + "c", "gamma"),
        (N + "a", "alpha"),
    ]


def test_prefix_semicolon_comma_and_a(store):
    """PREFIX expansion, ``;`` predicate lists, ``,`` object lists; the
    parse is checked structurally (the store carries no rdf:type)."""
    q = parse_query(
        """
        PREFIX ex: <http://n/>
        SELECT * WHERE { ?s ex:p ?o , ?o2 ; a ex:Thing ; ex:name ?nm . }
        """
    )
    assert q.where.patterns == [
        ("?s", N + "p", "?o"),
        ("?s", N + "p", "?o2"),
        (
            "?s",
            "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
            N + "Thing",
        ),
        ("?s", N + "name", "?nm"),
    ]


def test_numeric_filter(store):
    got = _rows(
        sparql(
            store,
            f'SELECT ?s WHERE {{ ?s <{N}score> ?v . FILTER(?v > 5) }}',
        )
    )
    assert {r["s"] for r in got} == {N + "b", N + "c"}


def test_optional_minus_not_exists(store):
    got = _rows(
        sparql(
            store,
            f"""SELECT ?s ?nm ?tg WHERE {{
              ?s <{N}name> ?nm . OPTIONAL {{ ?s <{N}tag> ?tg }}
            }}""",
        )
    )
    tags = {r["s"]: r["tg"] for r in got}
    assert tags == {N + "a": "keep", N + "b": "drop", N + "c": None}

    got = _rows(
        sparql(
            store,
            f"""SELECT ?s WHERE {{
              ?s <{N}name> ?nm . MINUS {{ ?s <{N}tag> "drop" }}
            }}""",
        )
    )
    assert {r["s"] for r in got} == {N + "a", N + "c"}

    got = _rows(
        sparql(
            store,
            f"""SELECT ?s WHERE {{
              ?s <{N}name> ?nm .
              FILTER NOT EXISTS {{ ?s <{N}tag> ?t }}
            }}""",
        )
    )
    assert {r["s"] for r in got} == {N + "c"}


def test_filter_exists(store):
    # positive EXISTS with a shared variable: SEMI-join keeps exactly
    # the solutions whose ?s has a tag triple
    got = _rows(
        sparql(
            store,
            f"""SELECT ?s WHERE {{
              ?s <{N}name> ?nm .
              FILTER EXISTS {{ ?s <{N}tag> ?t }}
            }}""",
        )
    )
    assert {r["s"] for r in got} == {N + "a", N + "b"}

    # EXISTS group matching NOTHING drops every solution
    got = _rows(
        sparql(
            store,
            f"""SELECT ?s WHERE {{
              ?s <{N}name> ?nm .
              FILTER EXISTS {{ ?s <{N}absent> ?t }}
            }}""",
        )
    )
    assert got == []

    # no shared variable: a global gate — the group matches somewhere,
    # so every solution survives (dual of the NOT EXISTS global gate)
    got = _rows(
        sparql(
            store,
            f"""SELECT ?s WHERE {{
              ?s <{N}name> ?nm .
              FILTER EXISTS {{ ?x <{N}q> ?y }}
            }}""",
        )
    )
    assert {r["s"] for r in got} == {N + "a", N + "b", N + "c"}

    # ... and an unmatched independent group drops everything
    got = _rows(
        sparql(
            store,
            f"""SELECT ?s WHERE {{
              ?s <{N}name> ?nm .
              FILTER EXISTS {{ ?x <{N}absent> ?y }}
            }}""",
        )
    )
    assert got == []


def test_values_bind(store):
    got = _rows(
        sparql(
            store,
            f"""SELECT ?s ?label WHERE {{
              ?s <{N}name> ?nm .
              VALUES ?s {{ <{N}a> <{N}c> }}
              BIND(CONCAT(UCASE(?nm), "-", SUBSTR(?nm, 1, 2)) AS ?label)
            }}""",
        )
    )
    assert {(r["s"], r["label"]) for r in got} == {
        (N + "a", "ALPHA-al"),
        (N + "c", "GAMMA-ga"),
    }


def test_bind_if_arith(store):
    got = _rows(
        sparql(
            store,
            f"""SELECT ?s ?big ?twice WHERE {{
              ?s <{N}score> ?v .
              BIND(IF(?v > 5, "hi", "lo") AS ?big)
              BIND(?v * 2 AS ?twice)
            }}""",
        )
    )
    m = {r["s"]: (r["big"], r["twice"]) for r in got}
    assert m == {
        N + "a": ("lo", "6"),
        N + "b": ("hi", "14"),
        N + "c": ("hi", "14"),
    }


@pytest.mark.parametrize(
    "path,expect",
    [
        # seq: a -p-> b -name-> beta ; b -p-> c -name-> gamma
        (f"<{N}p>/<{N}name>", {("a", "beta"), ("b", "gamma")}),
        # inverse then name: object of p, backwards
        (f"^<{N}p>/<{N}name>", {("b", "alpha"), ("c", "beta")}),
        # plus closure over p
        (f"<{N}p>+", {("a", "b"), ("a", "c"), ("b", "c")}),
        # negated property set: every edge except p and name
        (
            f"!(<{N}p>|<{N}name>|<{N}tag>|<{N}score>)",
            {("a", "c")},
        ),
    ],
)
def test_paths(store, path, expect):
    got = _rows(
        sparql(store, f"SELECT ?x ?y WHERE {{ ?x {path} ?y }}")
    )
    strip = lambda v: v[len(N):] if v.startswith(N) else v  # noqa: E731
    assert {(strip(r["x"]), strip(r["y"])) for r in got} == expect


def test_union(store):
    got = _rows(
        sparql(
            store,
            f"""SELECT * WHERE {{
              {{ ?s <{N}tag> ?v }} UNION {{ ?s <{N}score> ?v }}
            }}""",
        )
    )
    assert len(got) == 5
    assert {(r["s"], r["v"]) for r in got} == {
        (N + "a", "keep"), (N + "b", "drop"),
        (N + "a", "3"), (N + "b", "7"), (N + "c", "7"),
    }


def test_group_by_count_sum_having(store):
    got = _rows(
        sparql(
            store,
            f"""SELECT ?v (COUNT(?s) AS ?c) WHERE {{
              ?s <{N}score> ?v
            }} GROUP BY ?v HAVING(COUNT(?s) >= 2) ORDER BY ?v""",
        )
    )
    assert [(r["v"], r["c"]) for r in got] == [("7", 2)]

    got = _rows(
        sparql(
            store,
            f"""SELECT ?v (SUM(?v) AS ?t) WHERE {{
              ?s <{N}score> ?v
            }} GROUP BY ?v ORDER BY ?v""",
        )
    )
    assert [(r["v"], r["t"]) for r in got] == [("3", 3.0), ("7", 14.0)]


def test_aggregate_over_expression(store, ray_session):
    """§18.2.4 aggregates over expressions: SUM(?v * 2) / AVG(?v + 1) /
    COUNT(DISTINCT SUBSTR(?nm, 1, 1)) desugar to a hidden BIND, so
    values match the plain-variable aggregates' machinery exactly."""
    got = _rows(
        sparql(
            store,
            f"""SELECT (SUM(?v * 2) AS ?s) (AVG(?v * 3) AS ?a)
            WHERE {{ ?x <{N}score> ?v }}""",
        )
    )
    # scores 3, 7, 7 → sum of doubles 34; avg of triples 17.0
    assert [(r["s"], r["a"]) for r in got] == [(34.0, 17.0)]
    got = _rows(
        sparql(
            store,
            f"""SELECT (COUNT(DISTINCT SUBSTR(?nm, 1, 1)) AS ?c)
            WHERE {{ ?x <{N}name> ?nm }}""",
        )
    )
    assert [r["c"] for r in got] == [3]  # a / b / g
    # grouped form: per score value, sum of doubled scores
    got = _rows(
        sparql(
            store,
            f"""SELECT ?v (SUM(?v * 10) AS ?t) WHERE {{
              ?s <{N}score> ?v
            }} GROUP BY ?v ORDER BY ?v""",
        )
    )
    assert [(r["v"], r["t"]) for r in got] == [("3", 30.0), ("7", 140.0)]
    # GROUP BY over an expression: key desugars to a BIND the same way
    got = _rows(
        sparql(
            store,
            f"""SELECT ?g (COUNT(*) AS ?c) WHERE {{
              ?s <{N}name> ?nm
            }} GROUP BY (STRLEN(?nm) AS ?g) ORDER BY ?g""",
        )
    )
    # alpha(5) beta(4) gamma(5)
    assert [(r["g"], r["c"]) for r in got] == [("4", 1), ("5", 2)]
    # HAVING repeats the SELECT's expression aggregate — matched
    # structurally against the recorded AST; a different expression
    # stays loud
    got = _rows(
        sparql(
            store,
            f"""SELECT ?v (SUM(?v * 10) AS ?t) WHERE {{
              ?s <{N}score> ?v
            }} GROUP BY ?v HAVING(SUM(?v * 10) > 100) ORDER BY ?v""",
        )
    )
    assert [(r["v"], r["t"]) for r in got] == [("7", 140.0)]
    with pytest.raises(ValueError, match="HAVING aggregate"):
        sparql(
            store,
            f"""SELECT ?v (SUM(?v * 10) AS ?t) WHERE {{
              ?s <{N}score> ?v
            }} GROUP BY ?v HAVING(SUM(?v * 11) > 100)""",
        )


def test_implicit_single_group(store, ray_session):
    """Aggregates WITHOUT GROUP BY aggregate over all solutions
    (SPARQL §18.3), including the §18.5 empty-group identity row."""
    got = _rows(
        sparql(
            store,
            f"""SELECT (COUNT(*) AS ?n) (SUM(?v) AS ?t)
                       (MIN(?v) AS ?lo) (MAX(?v) AS ?hi)
            WHERE {{ ?s <{N}score> ?v }}""",
        )
    )
    assert [(r["n"], r["t"], r["lo"], r["hi"]) for r in got] == [
        (3, 17.0, 3.0, 7.0)
    ]
    # a var used ONLY by MIN/MAX aggregates lexically (string compare)
    got = _rows(
        sparql(
            store,
            f"""SELECT (MIN(?nm) AS ?lo) (MAX(?nm) AS ?hi)
            WHERE {{ ?s <{N}name> ?nm }}""",
        )
    )
    assert [(r["lo"], r["hi"]) for r in got] == [("alpha", "gamma")]
    # COUNT(DISTINCT) single-group
    got = _rows(
        sparql(
            store,
            f"SELECT (COUNT(DISTINCT ?v) AS ?n) WHERE {{ ?s <{N}score> ?v }}",
        )
    )
    assert [r["n"] for r in got] == [2]
    # empty match: exactly ONE row with COUNT = 0 / SUM = 0
    got = _rows(
        sparql(
            store,
            f"""SELECT (COUNT(?v) AS ?n) (SUM(?v) AS ?t) WHERE {{
              ?s <{N}score> ?v . FILTER(?v > 99) }}""",
        )
    )
    assert [(r["n"], r["t"]) for r in got] == [(0, 0.0)]


def test_group_concat(store):
    got = _rows(
        sparql(
            store,
            f"""SELECT ?v (GROUP_CONCAT(?nm; SEPARATOR=",") AS ?names)
            WHERE {{ ?s <{N}score> ?v . ?s <{N}name> ?nm }}
            GROUP BY ?v ORDER BY ?v""",
        )
    )
    assert [(r["v"], r["names"]) for r in got] == [
        ("3", "alpha"),
        ("7", "beta,gamma"),
    ]


def test_ask_construct_describe(store):
    assert sparql(store, f'ASK {{ ?s <{N}name> "alpha" }}') is True
    assert sparql(store, f'ASK {{ ?s <{N}name> "omega" }}') is False

    g = _rows(
        sparql(
            store,
            f"""CONSTRUCT {{ ?x <{N}reach> ?y }}
            WHERE {{ ?x <{N}p>+ ?y }}""",
        )
    )
    assert {(r["subj"], r["obj"]) for r in g} == {
        (N + "a", N + "b"), (N + "a", N + "c"), (N + "b", N + "c"),
    }
    assert all(r["pred"] == N + "reach" for r in g)

    d = _rows(sparql(store, f"DESCRIBE <{N}a>"))
    assert {r["pred"] for r in d} == {
        N + "p", N + "name", N + "score", N + "tag", N + "q",
    }


def test_distinct_projection(store):
    # two subjects share score "7": projecting ?v alone must dedup
    got = _rows(
        sparql(store, f"SELECT DISTINCT ?v WHERE {{ ?s <{N}score> ?v }}")
    )
    assert sorted(r["v"] for r in got) == ["3", "7"]
    got = _rows(
        sparql(store, f"SELECT ?v WHERE {{ ?s <{N}score> ?v }}")
    )
    assert sorted(r["v"] for r in got) == ["3", "7", "7"]


def test_string_escapes_and_lang_datatype(store):
    q = parse_query(
        'SELECT * WHERE { ?s <http://n/name> "a\\"b\\nc" . '
        '?s <http://n/x> "en"@en . ?s <http://n/y> "5"^^<http://dt> }'
    )
    assert q.where.patterns[0][2] == ("lit", 'a"b\nc')
    assert q.where.patterns[1][2] == ("lit", "en")
    assert q.where.patterns[2][2] == ("lit", "5")


def test_fail_loud():
    for bad, msg in [
        ("SELECT ?s WHERE { ?s ?p ?o } GROUP BY ?s", "GROUP BY without"),
        (
            "SELECT ?s (COUNT(?s) AS ?c) WHERE { ?s <http://p> ?o }",
            "plain variable with aggregates but no GROUP BY",
        ),
        (
            "SELECT ?s WHERE { VALUES ?s { UNDEF } ?s <http://p> ?o }",
            "UNDEF",
        ),
        ("DESCRIBE ?who", "DESCRIBE ?var needs a WHERE"),
        (
            "DESCRIBE <http://n/a> ?who WHERE { ?who <http://p> ?o }",
            "mixes explicit IRIs and variables",
        ),
        # blank nodes are variables in PATTERNS now (test_bnode_patterns)
        # but stay forbidden in VALUES
        ("SELECT ?s WHERE { VALUES ?s { _:b } }", "blank nodes"),
    ]:
        with pytest.raises(ValueError, match=".*"):
            parse_query(bad)


def test_dm_catalog_source(ray_session):
    """The same front-end over the Direct-Mapping VIRTUAL graph —
    catalog source + base, including a path and an aggregate."""
    from p5_rdf_rdb2rdf_ray.pipelines.queries_kg import BASE, catalog_for

    cat = catalog_for("/root/testdata/sf0.001")
    got = _rows(
        sparql(
            cat,
            f"""SELECT ?nm ?rn WHERE {{
              ?n <{BASE}nation#n_name> ?nm ;
                 <{BASE}nation#ref-n_regionkey>/<{BASE}region#r_name> ?rn .
            }} ORDER BY ?nm LIMIT 3""",
            base=BASE,
        )
    )
    assert [r["nm"] for r in got] == ["NATION_0", "NATION_1", "NATION_10"]
    # five TPC-H-ish region names; every nation maps into one of them
    assert all(r["rn"].isupper() and r["rn"].isalpha() for r in got)


def _copy_store(store, tmp_path, name):
    import shutil

    dst = str(tmp_path / name)
    shutil.copytree(store, dst)
    return dst


def test_update_parse_forms():
    """parse_update: the five supported forms parse; vars in DATA,
    non-ground GRAPH-less template misuse, and SELECT reject."""
    from p5_rdf_rdb2rdf_ray.engine.sparql import parse_update

    u = parse_update('INSERT DATA { <http://x/s> <http://x/p> "v" . }')
    assert u.kind == "insert_data" and len(u.templates) == 1
    u = parse_update("DELETE WHERE { ?s <http://x/p> ?o }")
    assert u.kind == "delete_where" and u.where.patterns == u.templates
    u = parse_update(
        'PREFIX ex: <http://x/> DELETE { ?s ex:t "old" } '
        "WHERE { ?s ex:p ?o . FILTER(?o != \"z\") }"
    )
    assert u.kind == "delete" and u.where.filters
    u = parse_update(
        "INSERT { ?s <http://x/copy> ?o } WHERE { ?s <http://x/p> ?o }"
    )
    assert u.kind == "insert"
    u = parse_update(
        "DELETE { ?s <http://x/p> ?o } INSERT { ?s <http://x/q> ?o } "
        "WHERE { ?s <http://x/p> ?o }"
    )
    assert u.kind == "modify" and len(u.insert_templates) == 1
    with pytest.raises(ValueError, match="ground"):
        parse_update("DELETE DATA { ?s <http://x/p> <http://x/o> }")
    with pytest.raises(ValueError, match="INSERT or DELETE"):
        parse_update("SELECT ?s WHERE { ?s ?p ?o }")
    from p5_rdf_rdb2rdf_ray.engine.sparql import parse_update_ops

    ops = parse_update_ops(
        'PREFIX ex: <http://x/> INSERT DATA { ex:s ex:p "1" . } ; '
        "DELETE WHERE { ?s ex:p ?o } ;"  # trailing ; is legal
    )
    assert [o.kind for o in ops] == ["insert_data", "delete_where"]
    u = parse_update(
        'INSERT DATA { GRAPH <http://x/g> { <http://x/s> <http://x/p> "1" . } }'
    )
    assert u.kind == "insert_data" and u.graph == "http://x/g"
    u = parse_update("CLEAR GRAPH <http://x/g>")
    assert u.kind == "clear" and u.graph == "http://x/g"
    assert parse_update("DROP ALL").graph == "__all__"
    assert parse_update("CLEAR NAMED").graph == "__named__"
    assert parse_update("CLEAR DEFAULT").graph == "__default__"
    u = parse_update("ADD GRAPH <http://x/a> TO GRAPH <http://x/b>")
    assert (u.kind, u.graph, u.graph_to) == ("add", "http://x/a", "http://x/b")
    u = parse_update("MOVE SILENT <http://x/a> TO DEFAULT")
    assert (u.kind, u.graph_to) == ("move", "__default__")
    assert parse_update("COPY DEFAULT TO <http://x/b>").kind == "copy"
    u = parse_update(
        "WITH <http://x/g> DELETE { ?s <http://x/p> ?o } "
        "WHERE { ?s <http://x/p> ?o }"
    )
    assert (u.kind, u.graph) == ("delete", "http://x/g")
    assert parse_update(
        "WITH <http://x/g> DELETE WHERE { ?s <http://x/p> ?o }"
    ).graph == "http://x/g"
    with pytest.raises(ValueError, match="WITH does not apply"):
        parse_update(
            'WITH <http://x/g> INSERT DATA { <http://x/s> <http://x/p> "1" . }'
        )
    with pytest.raises(ValueError, match="exactly one"):
        parse_update('INSERT DATA { <http://x/s> <http://x/p> "1" . } ; '
                     "DELETE WHERE { ?s <http://x/p> ?o }")


def test_update_insert_delete_data(store, tmp_path, ray_session):
    """INSERT DATA upserts (idempotent re-run), DELETE DATA removes
    exactly the named triples and is a no-op for absent ones."""
    from p5_rdf_rdb2rdf_ray.engine.sparql import sparql_update
    from p5_rdf_rdb2rdf_ray.sinks.triplestore import read_triplestore

    s = _copy_store(store, tmp_path, "upd1")
    n0 = read_triplestore(s).count()
    ins = f'INSERT DATA {{ <{N}z> <{N}name> "zeta" . }}'
    assert sparql_update(s, ins)["rows_added"] == 1
    assert read_triplestore(s).count() == n0 + 1
    assert sparql_update(s, ins)["rows_added"] == 0  # idempotent
    m = sparql_update(s, f'DELETE DATA {{ <{N}z> <{N}name> "zeta" . }}')
    assert m["rows_removed"] == 1
    assert read_triplestore(s).count() == n0
    m = sparql_update(s, 'DELETE DATA { <http://no/x> <http://no/p> "q" . }')
    assert m["rows_removed"] == 0  # absent -> no-op


def test_update_delete_where_and_templates(store, tmp_path, ray_session):
    """DELETE WHERE removes every instantiation; INSERT ... WHERE mints
    derived triples; DELETE ... WHERE deletes template instantiations
    driven by a filtered binding set."""
    from p5_rdf_rdb2rdf_ray.engine.sparql import sparql, sparql_update
    from p5_rdf_rdb2rdf_ray.sinks.triplestore import read_triplestore

    s = _copy_store(store, tmp_path, "upd2")
    assert sparql_update(
        s, f"DELETE WHERE {{ ?s <{N}tag> ?t }}"
    )["rows_removed"] == 2
    assert not sparql(s, f"ASK {{ ?s <{N}tag> ?t }}")

    m = sparql_update(
        s,
        f"INSERT {{ ?s <{N}renamed> ?nm }} WHERE {{ ?s <{N}name> ?nm }}",
    )
    assert m["rows_added"] == 3
    got = sparql(
        s, f"SELECT ?nm WHERE {{ ?s <{N}renamed> ?nm }} ORDER BY ?nm"
    ).take_all()
    assert [r["nm"] for r in got] == ["alpha", "beta", "gamma"]

    # template-form DELETE: remove renamed triples for score-7 subjects
    m = sparql_update(
        s,
        f"""DELETE {{ ?s <{N}renamed> ?nm }} WHERE {{
            ?s <{N}renamed> ?nm ; <{N}score> ?sc . FILTER(?sc = "7")
        }}""",
    )
    assert m["rows_removed"] == 2
    got = sparql(s, f"SELECT ?nm WHERE {{ ?s <{N}renamed> ?nm }}").take_all()
    assert [r["nm"] for r in got] == ["alpha"]
    # ;-sequence: each op sees the previous op's state (§3.1)
    m = sparql_update(
        s,
        f"""INSERT DATA {{ <{N}w> <{N}score> "9" . }} ;
            DELETE WHERE {{ <{N}w> <{N}score> ?v }}""",
    )
    assert m["rows_added"] == 1 and m["rows_removed"] == 1
    assert len(m["ops"]) == 2
    assert not sparql(s, f'ASK {{ <{N}w> <{N}score> "9" }}')

    # §3.1.3 Modify: predicate rename in one operation — both halves
    # instantiate over the same pre-state solutions (delete-then-insert)
    m = sparql_update(
        s,
        f"""DELETE {{ ?s <{N}p> ?o }} INSERT {{ ?s <{N}p2> ?o }}
            WHERE {{ ?s <{N}p> ?o }}""",
    )
    assert m["rows_removed"] == 2 and m["insert_rows_added"] == 2
    assert not sparql(s, f"ASK {{ ?s <{N}p> ?o }}")
    got = sparql(
        s, f"SELECT ?o WHERE {{ ?s <{N}p2> ?o }} ORDER BY ?o"
    ).take_all()
    assert [r["o"] for r in got] == [N + "b", N + "c"]

    # buckets fully emptied are fine: delete every remaining triple
    # (variable predicates are outside the text subset — enumerate)
    total = read_triplestore(s).count()
    removed = 0
    for pred in ("p", "p2", "name", "score", "q", "renamed"):
        removed += sparql_update(
            s, f"DELETE WHERE {{ ?s <{N}{pred}> ?o }}"
        )["rows_removed"]
    assert removed == total
    assert read_triplestore(s).count() == 0


def test_filter_string_functions(store, ray_session):
    """REGEX / CONTAINS / STRSTARTS / STRENDS in FILTER: exact over
    lexical forms, NULL (OPTIONAL-unbound) bindings never pass, and
    they conjoin with comparisons."""
    def names(q):
        return sorted(r["nm"] for r in sparql(store, q).take_all())

    base = f"SELECT ?nm WHERE {{ ?s <{N}name> ?nm . %s }}"
    assert names(base % 'FILTER(REGEX(?nm, "^.e"))') == ["beta"]
    assert names(base % 'FILTER(CONTAINS(?nm, "am"))') == ["gamma"]
    assert names(base % 'FILTER(STRSTARTS(?nm, "a"))') == ["alpha"]
    assert names(base % 'FILTER(STRENDS(?nm, "a"))') == [
        "alpha", "beta", "gamma"
    ]
    assert names(
        base % 'FILTER(STRENDS(?nm, "a") && ?nm != "beta")'
    ) == ["alpha", "gamma"]
    # unbound OPTIONAL binding never passes the string test
    got = sparql(
        store,
        f"""SELECT ?s ?t WHERE {{
          ?s <{N}name> ?nm . OPTIONAL {{ ?s <{N}tag> ?t }}
          FILTER(CONTAINS(?t, "ee"))
        }}""",
    ).take_all()
    assert [r["s"] for r in got] == [N + "a"]


def test_string_tests_variable_args(store, ray_session):
    """§17.4.3 string tests with a VARIABLE second argument: row-pairwise
    over two binding columns, unbound either side is a type error, and
    a "?…" STRING constant is a constant (never a variable read)."""
    def names(q):
        return sorted(r["nm"] for r in sparql(store, q).take_all())

    base = f"SELECT ?nm WHERE {{ ?s <{N}name> ?nm . %s }}"
    # every name starts with its own 3-char prefix…
    assert names(
        base % 'BIND(SUBSTR(?nm, 1, 3) AS ?pre) FILTER(STRSTARTS(?nm, ?pre))'
    ) == ["alpha", "beta", "gamma"]
    # …and no lowercase name contains its uppercased self
    assert names(
        base % 'BIND(UCASE(?nm) AS ?up) FILTER(CONTAINS(?nm, ?up))'
    ) == []
    # unbound OPTIONAL side is a type error — only bound-tag rows pass
    assert names(
        base % f'OPTIONAL {{ ?s <{N}tag> ?t }} FILTER(STRSTARTS(?t, ?t))'
    ) == ["alpha", "beta"]
    # a string CONSTANT starting with "?" stays a constant in BIND
    got = sparql(
        store,
        f"""SELECT ?x WHERE {{
          ?s <{N}name> ?nm . BIND(CONCAT(?nm, "?x") AS ?x)
        }} ORDER BY ?x""",
    ).take_all()
    assert [r["x"] for r in got] == ["alpha?x", "beta?x", "gamma?x"]
    # variable separators / patterns fail loud, never silently mis-read
    with pytest.raises(ValueError, match="constant separator"):
        sparql(
            store,
            base % f'?s <{N}tag> ?t BIND(STRBEFORE(?nm, ?t) AS ?b)',
        ).take_all()
    with pytest.raises(ValueError, match="variable pattern"):
        sparql(store, base % "FILTER(REGEX(?nm, ?nm))")


def test_regex_flags(store, ray_session):
    """§17.4.3.14 REGEX flags: "i" is case-insensitive (the flagless
    form of the same pattern proves the default is sensitive), "s" lets
    dot cross newlines, "q" quotes metacharacters, and an unsupported
    flag fails loud at parse time."""
    def names(q):
        return sorted(r["nm"] for r in sparql(store, q).take_all())

    base = f"SELECT ?nm WHERE {{ ?s <{N}name> ?nm . %s }}"
    assert names(base % 'FILTER(REGEX(?nm, "^BET"))') == []
    assert names(base % 'FILTER(REGEX(?nm, "^BET", "i"))') == ["beta"]
    # "q": the pattern is a literal string, not a regex
    assert names(base % 'FILTER(REGEX(?nm, "a.pha"))') == ["alpha"]
    assert names(base % 'FILTER(REGEX(?nm, "a.pha", "q"))') == []
    assert names(base % 'FILTER(REGEX(?nm, "alpha", "q"))') == ["alpha"]
    with pytest.raises(ValueError, match="REGEX flags"):
        sparql(store, base % 'FILTER(REGEX(?nm, "a", "x"))')


def test_graph_scope_and_sample(store, ray_session):
    """GRAPH <g> scopes to a named context (the fixture store is all
    default-graph, so any named scope is empty — and so is GRAPH ?var,
    which ranges over named contexts only); GRAPH on a catalog source
    rejects; SAMPLE aggregates deterministically (lexical min)."""
    got = sparql(
        store,
        f"SELECT ?s WHERE {{ GRAPH <http://g/x> {{ ?s <{N}name> ?nm }} }}",
    ).take_all()
    assert got == []
    q = parse_query(
        f"SELECT ?s WHERE {{ GRAPH ?g {{ ?s <{N}name> ?nm }} }}"
    )
    assert q.graph_var == "g" and q.graph is None
    # the fixture is all default-graph: GRAPH ?var binds nothing
    got = sparql(
        store,
        f"SELECT ?g ?s WHERE {{ GRAPH ?g {{ ?s <{N}name> ?nm }} }}",
    ).take_all()
    assert got == []
    from p5_rdf_rdb2rdf_ray.pipelines.queries_kg import BASE, catalog_for

    with pytest.raises(ValueError, match="triple-store source"):
        sparql(
            catalog_for("/root/testdata/sf0.001"),
            f"SELECT ?s WHERE {{ GRAPH <http://g/x> {{ ?s <{BASE}nation#n_name> ?nm }} }}",
            base=BASE,
        )
    got = sparql(
        store,
        f"""SELECT ?v (SAMPLE(?nm) AS ?one) WHERE {{
          ?s <{N}score> ?v . ?s <{N}name> ?nm
        }} GROUP BY ?v ORDER BY ?v""",
    ).take_all()
    assert [(r["v"], r["one"]) for r in got] == [("3", "alpha"), ("7", "beta")]


def test_builtin_fns_and_term_tests(store, ray_session, tmp_path):
    """§17.4 built-ins: STR/STRBEFORE/STRAFTER/ABS/CEIL/FLOOR/ROUND/
    ENCODE_FOR_URI in BIND (non-numeric input → unbound; no-match
    separator → ""), and the isIRI/isBlank/isLiteral/isNumeric term
    tests in FILTER (kind columns where kept, derived elsewhere)."""
    from p5_rdf_rdb2rdf_ray.sinks.triplestore import write_triplestore
    from p5_rdf_rdb2rdf_ray.terms import KIND_BNODE

    got = sparql(
        store,
        f"""SELECT ?nm ?b ?a ?e ?st WHERE {{
          ?s <{N}name> ?nm
          BIND(STRBEFORE(?nm, "e") AS ?b) BIND(STRAFTER(?nm, "e") AS ?a)
          BIND(ENCODE_FOR_URI(CONCAT(?nm, " /1")) AS ?e)
          BIND(STR(?s) AS ?st)
        }} ORDER BY ?nm""",
    ).take_all()
    assert [(r["nm"], r["b"], r["a"], r["e"]) for r in got] == [
        ("alpha", "", "", "alpha%20%2F1"),
        ("beta", "b", "ta", "beta%20%2F1"),
        ("gamma", "", "", "gamma%20%2F1"),
    ]
    assert got[0]["st"] == N + "a"  # STR(?iri) = the IRI string

    got = sparql(
        store,
        f"""SELECT ?v ?ab ?c ?f ?r WHERE {{
          ?s <{N}score> ?v . ?s <{N}name> "alpha"
          BIND(ABS(?v - 10) AS ?ab) BIND(CEIL(?v / 2) AS ?c)
          BIND(FLOOR(?v / 2) AS ?f) BIND(ROUND(?v / 2) AS ?r)
        }}""",
    ).take_all()  # v=3: |3-10|=7, ceil(1.5)=2, floor=1, round(1.5)=2
    assert [(r["ab"], r["c"], r["f"], r["r"]) for r in got] == [
        ("7", "2", "1", "2")
    ]

    # term tests: STR(?s) is a literal; ?s itself an IRI; a bnode object
    # store: one IRI object, one bnode object, names are literals
    import pyarrow as pa2

    t = pa2.table(
        {
            "subj": [N + "x", N + "x", N + "x"],
            "pred": [N + "v"] * 3,
            "obj": [N + "y", "_:bn", "12"],
            "obj_kind": pa2.array(
                [KIND_IRI, KIND_BNODE, KIND_LITERAL], pa2.uint8()
            ),
            "lang": pa2.array([None] * 3, pa2.string()),
            "datatype": pa2.array([None] * 3, pa2.string()),
            "graph": pa2.array([None] * 3, pa2.string()),
        }
    )
    out = str(tmp_path / "termstore")
    write_triplestore(rd.from_arrow(t), out, num_buckets=2)

    def objs(test):
        return sorted(
            r["o"]
            for r in sparql(
                out, f"SELECT ?o WHERE {{ ?s <{N}v> ?o FILTER({test}) }}"
            ).take_all()
        )

    assert objs("isIRI(?o)") == [N + "y"]
    assert objs("isBlank(?o)") == ["_:bn"]
    assert objs("isLiteral(?o)") == ["12"]
    assert objs("isNumeric(?o)") == ["12"]
    assert objs("!isLiteral(?o)") == ["_:bn", N + "y"]
    # derived-kind path: subject position has no __k_ column
    got = sparql(
        out,
        f"SELECT ?s WHERE {{ ?s <{N}v> ?o FILTER(isIRI(?s)) }}",
    ).take_all()
    assert sorted({r["s"] for r in got}) == [N + "x"]


def test_projection_expressions(store, ray_session):
    """§18.2.4 SELECT (expr AS ?x): lowered to a BIND over the solution
    set; the alias projects, orders, and may serve as a GROUP BY key."""
    got = sparql(
        store,
        f"""SELECT ?nm (STRLEN(?nm) AS ?l) (CONCAT(?nm, "!") AS ?x)
        WHERE {{ ?s <{N}name> ?nm }} ORDER BY ?nm""",
    ).take_all()
    assert [(r["nm"], r["l"], r["x"]) for r in got] == [
        ("alpha", "5", "alpha!"), ("beta", "4", "beta!"),
        ("gamma", "5", "gamma!"),
    ]
    got = sparql(
        store,
        f"""SELECT (STRLEN(?nm) AS ?l) (COUNT(?s) AS ?c)
        WHERE {{ ?s <{N}name> ?nm }} GROUP BY ?l ORDER BY ?l""",
    ).take_all()
    assert [(r["l"], r["c"]) for r in got] == [("4", 1), ("5", 2)]
    # alias clash with an in-scope variable rejects (SPARQL §7.6)
    with pytest.raises(ValueError, match="already in scope"):
        sparql(
            store,
            f"SELECT (STRLEN(?nm) AS ?nm) WHERE {{ ?s <{N}name> ?nm }}",
        ).take_all()


def test_construct_where_shorthand(store, ray_session):
    """§10.2.2 CONSTRUCT WHERE { BGP }: the template is the pattern
    itself — byte-identical result to the explicit template form; the
    shorthand rejects non-BGP bodies."""
    short = sparql(store, f"CONSTRUCT WHERE {{ ?s <{N}name> ?o }}")
    full = sparql(
        store,
        f"CONSTRUCT {{ ?s <{N}name> ?o }} WHERE {{ ?s <{N}name> ?o }}",
    )
    key = lambda r: (r["subj"], r["pred"], r["obj"])  # noqa: E731
    assert sorted(map(key, short.take_all())) == sorted(
        map(key, full.take_all())
    )
    assert short.count() == 3
    with pytest.raises(ValueError, match="basic graph pattern"):
        parse_query(
            f'CONSTRUCT WHERE {{ ?s <{N}name> ?o FILTER(?o = "beta") }}'
        )


def test_filter_computed_left(store, ray_session):
    """FILTER with a computed LEFT side: function calls and arithmetic
    lower to the binding-filter algebra's expression atoms; they
    compose with && / ! and error rows (non-numeric lexicals) drop on
    both the positive and negated form."""
    def names(q):
        return sorted(r["nm"] for r in sparql(store, q).take_all())

    base = f"SELECT ?nm WHERE {{ ?s <{N}name> ?nm . %s }}"
    assert names(base % "FILTER(STRLEN(?nm) > 4)") == ["alpha", "gamma"]
    assert names(base % 'FILTER(UCASE(?nm) = "BETA")') == ["beta"]
    assert names(base % 'FILTER(STRAFTER(?nm, "mm") = "a")') == ["gamma"]
    assert names(
        base % 'FILTER(STRLEN(?nm) = 4 || CONCAT(?nm, "!") = "gamma!")'
    ) == ["beta", "gamma"]
    # arithmetic left side over a numeric lexical; the non-numeric
    # binding ("alpha"-less subjects have scores 3/7/7) never errors out
    got = sorted(
        r["v"]
        for r in sparql(
            store,
            f"SELECT ?v WHERE {{ ?s <{N}score> ?v FILTER(?v * 2 > 10) }}",
        ).take_all()
    )
    assert got == ["7", "7"]
    # negated computed atom: an unbound input is a type error and drops
    # under ! too (only a/b have tags, both len 4: !(4 > 4) passes;
    # gamma's unbound ?tg errors and never survives the negation)
    got = sorted(
        r["nm"]
        for r in sparql(
            store,
            f"""SELECT ?nm WHERE {{
              ?s <{N}name> ?nm OPTIONAL {{ ?s <{N}tag> ?tg }}
              FILTER(!(STRLEN(?tg) > 4))
            }}""",
        ).take_all()
    )
    assert got == ["alpha", "beta"]


@pytest.fixture(scope="module")
def quad_store(ray_session, tmp_path_factory):
    """Named-context fixture for GRAPH ?var: quads spread over two
    named graphs plus default-graph rows that must stay invisible."""
    from p5_rdf_rdb2rdf_ray.sinks.triplestore import write_triplestore

    I, L = KIND_IRI, KIND_LITERAL
    G1, G2 = N + "g1", N + "g2"
    rows = [
        (N + "a", N + "p", N + "b", I, G1),
        (N + "a", N + "name", "alpha", L, G1),
        (N + "a", N + "name", "alpha", L, G2),  # same triple, two graphs
        (N + "b", N + "name", "beta", L, G2),
        (N + "c", N + "name", "gamma", L, G2),
        (N + "d", N + "name", "delta", L, None),  # default graph: hidden
        (N + "b", N + "p", N + "c", I, None),
        (N + "a", N + "home", G1, I, G1),  # object == own context
        (N + "b", N + "home", G1, I, G2),  # object != own context
    ]
    t = pa.table(
        {
            "subj": [r[0] for r in rows],
            "pred": [r[1] for r in rows],
            "obj": [r[2] for r in rows],
            "obj_kind": pa.array([r[3] for r in rows], pa.uint8()),
            "lang": pa.array([None] * len(rows), pa.string()),
            "datatype": pa.array([None] * len(rows), pa.string()),
            "graph": pa.array([r[4] for r in rows], pa.string()),
        }
    )
    out = str(tmp_path_factory.mktemp("quadstore") / "store")
    write_triplestore(rd.from_arrow(t), out, num_buckets=4)
    return out


def test_graph_scoped_paths(quad_store, ray_session):
    """Property paths under a CONSTANT graph scope: edge reads and the
    §18.4 zero-length term domain restrict to the named context. The
    fixture's <p> edges: a→b in g1, b→c in the default graph — the
    unscoped closure chains them; the g1 scope sees one hop only."""
    G1 = N + "g1"
    un = sparql(quad_store, f"SELECT ?a ?b WHERE {{ ?a <{N}p>+ ?b }}")
    assert sorted(
        (r["a"], r["b"]) for r in un.take_all()
    ) == [(N + "a", N + "b"), (N + "a", N + "c"), (N + "b", N + "c")]
    sc = sparql(
        quad_store,
        f"SELECT ?a ?b WHERE {{ GRAPH <{G1}> {{ ?a <{N}p>+ ?b }} }}",
    )
    assert [(r["a"], r["b"]) for r in sc.take_all()] == [(N + "a", N + "b")]
    # zero-length identity ranges over the SCOPED graph's terms only:
    # ?x = <c> never appears in g1 (c's name quad lives in g2)
    got = sparql(
        quad_store,
        f"SELECT ?x WHERE {{ GRAPH <{G1}> {{ <{N}c> <{N}p>? ?x }} }}",
    ).take_all()
    assert got == []
    # GRAPH ?var still rejects paths loudly
    with pytest.raises(ValueError, match="paths"):
        sparql(
            quad_store,
            f"SELECT ?g ?a WHERE {{ GRAPH ?g {{ ?a <{N}p>+ ?b }} }}",
        )


def test_update_graph_scoped_and_clear(quad_store, tmp_path, ray_session):
    """GRAPH-scoped DATA blocks touch only the named context's quad;
    CLEAR GRAPH/DEFAULT/NAMED remove exactly the scoped slices."""
    from p5_rdf_rdb2rdf_ray.engine.sparql import sparql_update
    from p5_rdf_rdb2rdf_ray.sinks.triplestore import read_triplestore

    s = _copy_store(quad_store, tmp_path, "gupd")
    G1, G2 = N + "g1", N + "g2"
    n0 = read_triplestore(s).count()  # 9 quads (2 default-graph)

    # same triple exists in g1 AND g2 ("alpha"): a g1-scoped DELETE
    # DATA removes only the g1 row
    m = sparql_update(
        s, f'DELETE DATA {{ GRAPH <{G1}> {{ <{N}a> <{N}name> "alpha" . }} }}'
    )
    assert m["rows_removed"] == 1
    assert sparql(s, f'ASK {{ GRAPH <{G2}> {{ ?s <{N}name> "alpha" }} }}')
    assert not sparql(s, f'ASK {{ GRAPH <{G1}> {{ ?s <{N}name> "alpha" }} }}')

    m = sparql_update(s, f"CLEAR GRAPH <{G2}>")
    assert m["rows_removed"] == 4  # alpha+beta+gamma names + b's home
    m = sparql_update(s, "CLEAR DEFAULT")
    assert m["rows_removed"] == 2  # delta name + b p c
    m = sparql_update(s, "CLEAR NAMED")
    assert m["rows_removed"] == n0 - 1 - 4 - 2
    assert read_triplestore(s).count() == 0

    # §3.2.5-7 graph management on a fresh copy:
    # g1 = {a p b, a name alpha, a home g1} (3), g2 = 4, default = 2
    s2 = _copy_store(quad_store, tmp_path, "gmgmt")
    m = sparql_update(s2, f"ADD GRAPH <{G1}> TO DEFAULT")
    assert m["rows_added"] == 3 and m["rows_removed"] == 0
    m = sparql_update(s2, f"COPY DEFAULT TO <{G2}>")  # dst replaced
    assert m["rows_removed"] == 4 and m["rows_added"] == 5
    m = sparql_update(s2, f"MOVE GRAPH <{G1}> TO <{G2}>")
    assert m["rows_removed"] == 5 + 3 and m["rows_added"] == 3
    assert not sparql(s2, f'ASK {{ GRAPH <{G1}> {{ ?s ?p ?o }} }}')
    # ADD src == dst is the spec'd no-op
    m = sparql_update(s2, f"ADD GRAPH <{G2}> TO GRAPH <{G2}>")
    assert m == {"rows_added": 0, "rows_removed": 0}

    # WITH <g>: scopes BOTH matching and the template target (§3.1.3);
    # g2 holds {alpha, beta, gamma} names + b's home after the moves
    s3 = _copy_store(quad_store, tmp_path, "withupd")
    m = sparql_update(
        s3, f"WITH <{G2}> DELETE WHERE {{ ?s <{N}name> ?nm }}"
    )
    assert m["rows_removed"] == 3  # g1's alpha + the default delta stay
    assert sparql(s3, f'ASK {{ GRAPH <{G1}> {{ ?s <{N}name> "alpha" }} }}')
    assert sparql(s3, f'ASK {{ ?s <{N}name> "delta" }}')
    m = sparql_update(
        s3,
        f"WITH <{G1}> INSERT {{ ?o <{N}rev> ?s }} WHERE {{ ?s <{N}p> ?o }}",
    )
    assert m["rows_added"] == 1
    assert sparql(s3, f'ASK {{ GRAPH <{G1}> {{ <{N}b> <{N}rev> <{N}a> }} }}')


def test_graph_var(quad_store, ray_session):
    """GRAPH ?var [SPARQL §13.3] as distributed QUAD patterns: the
    context binds per solution, named graphs only, one shared context
    across the group's patterns, and the variable composes with
    aggregates, ASK, and other pattern variables."""
    G1, G2 = N + "g1", N + "g2"

    # context binding: one row per (quad match); default graph hidden
    got = sparql(
        quad_store,
        f"SELECT ?g ?s ?nm WHERE {{ GRAPH ?g {{ ?s <{N}name> ?nm }} }} "
        "ORDER BY ?nm ?g",
    ).take_all()
    assert [(r["g"], r["nm"]) for r in got] == [
        (G1, "alpha"), (G2, "alpha"), (G2, "beta"), (G2, "gamma")
    ]

    # same-context join: both patterns must hold in ONE graph
    got = sparql(
        quad_store,
        f"""SELECT ?g ?nm WHERE {{
          GRAPH ?g {{ ?s <{N}p> ?o . ?s <{N}name> ?nm }}
        }}""",
    ).take_all()
    assert [(r["g"], r["nm"]) for r in got] == [(G1, "alpha")]

    # graph var shared with an object position: term equality
    got = sparql(
        quad_store,
        f"SELECT ?s WHERE {{ GRAPH ?g {{ ?s <{N}home> ?g }} }}",
    ).take_all()
    assert [r["s"] for r in got] == [N + "a"]

    # aggregate over the context variable
    got = sparql(
        quad_store,
        f"""SELECT ?g (COUNT(?s) AS ?c) WHERE {{
          GRAPH ?g {{ ?s <{N}name> ?nm }}
        }} GROUP BY ?g ORDER BY ?g""",
    ).take_all()
    assert [(r["g"], r["c"]) for r in got] == [(G1, 1), (G2, 3)]

    # ASK + FILTER over the bound context
    assert sparql(
        quad_store,
        f'ASK {{ GRAPH ?g {{ ?s <{N}name> "beta" }} }}',
    )
    got = sparql(
        quad_store,
        f"""SELECT ?nm WHERE {{
          GRAPH ?g {{ ?s <{N}name> ?nm FILTER(?g = <{G1}>) }}
        }}""",
    ).take_all()
    assert [r["nm"] for r in got] == ["alpha"]

    # OPTIONAL is per-named-graph: Graph(?g, LeftJoin(A, B)) — a's
    # p-edge lives in g1 only, so its g2 name row NULL-extends; b's
    # p-edge is default-graph (invisible to GRAPH ?var)
    got = sparql(
        quad_store,
        f"""SELECT ?g ?nm ?o WHERE {{ GRAPH ?g {{
          ?s <{N}name> ?nm OPTIONAL {{ ?s <{N}p> ?o }}
        }} }} ORDER BY ?nm ?g""",
    ).take_all()
    assert [(r["g"], r["nm"], r["o"]) for r in got] == [
        (G1, "alpha", N + "b"), (G2, "alpha", None),
        (G2, "beta", None), (G2, "gamma", None),
    ]

    # MINUS is per-named-graph too: only (g1, alpha) has a same-graph
    # p-edge and drops
    got = sparql(
        quad_store,
        f"""SELECT ?g ?nm WHERE {{ GRAPH ?g {{
          ?s <{N}name> ?nm MINUS {{ ?s <{N}p> ?o }}
        }} }} ORDER BY ?nm ?g""",
    ).take_all()
    assert [(r["g"], r["nm"]) for r in got] == [
        (G2, "alpha"), (G2, "beta"), (G2, "gamma")
    ]


def test_subquery(store, ray_session):
    """11.2 subqueries: inner aggregate joins the outer patterns on the
    shared variable; subquery LIMIT applies before the outer join;
    SELECT * inside rejects; bare conjunctive nested groups FOLD."""
    got = sparql(
        store,
        f"""SELECT ?nm ?c WHERE {{
          {{ SELECT ?s (COUNT(?o) AS ?c) WHERE {{ ?s <{N}p> ?o }}
             GROUP BY ?s }}
          ?s <{N}name> ?nm
        }} ORDER BY ?nm""",
    ).take_all()
    assert [(r["nm"], r["c"]) for r in got] == [("alpha", 1), ("beta", 1)]

    # subquery LIMIT: pick ONE subject by ORDER, then enrich
    got = sparql(
        store,
        f"""SELECT ?nm WHERE {{
          {{ SELECT ?s WHERE {{ ?s <{N}score> "7" }}
             ORDER BY ?s LIMIT 1 }}
          ?s <{N}name> ?nm
        }}""",
    ).take_all()
    assert [r["nm"] for r in got] == ["beta"]

    with pytest.raises(ValueError, match="explicit projection"):
        parse_query(
            f"SELECT ?x WHERE {{ {{ SELECT * WHERE {{ ?x <{N}p> ?y }} }} }}"
        )
    # a bare conjunctive nested group folds into the outer BGP
    q = parse_query(
        f"SELECT ?x WHERE {{ ?x <{N}q> ?z . {{ ?x <{N}p> ?y }} }}"
    )
    assert len(q.where.patterns) == 2 and not q.where.subqueries


def test_describe_var(store, ray_session):
    """DESCRIBE ?var WHERE — the node set is the distinct non-literal
    bindings; literal bindings name no resource and yield nothing."""
    got = _rows(
        sparql(store, f'DESCRIBE ?s WHERE {{ ?s <{N}name> "alpha" }}')
    )
    # CBD of <a>: its five outgoing triples
    assert {(r["subj"], r["pred"]) for r in got} == {
        (N + "a", N + "p"),
        (N + "a", N + "name"),
        (N + "a", N + "score"),
        (N + "a", N + "tag"),
        (N + "a", N + "q"),
    }
    # every ?o binding is a literal -> empty description, stable schema
    got = sparql(store, f"DESCRIBE ?o WHERE {{ ?s <{N}name> ?o }}")
    assert got.count() == 0
    assert "subj" in got.schema().names


def test_multiple_optional_groups(store, ray_session):
    """Sibling OPTIONALs = sequential LeftJoins (SPARQL 1.1 §5.2):
    each group extends matching rows and NULL-pads the rest,
    independently of the other groups."""
    q = parse_query(
        f"""SELECT ?s ?tg ?qq WHERE {{
          ?s <{N}name> ?nm .
          OPTIONAL {{ ?s <{N}tag> ?tg }}
          OPTIONAL {{ ?s <{N}q> ?qq }}
        }}"""
    )
    assert len(q.where.optional) == 2
    got = _rows(
        sparql(
            store,
            f"""SELECT ?s ?tg ?qq WHERE {{
              ?s <{N}name> ?nm .
              OPTIONAL {{ ?s <{N}tag> ?tg }}
              OPTIONAL {{ ?s <{N}q> ?qq }}
            }}""",
        )
    )
    assert {(r["s"], r["tg"], r["qq"]) for r in got} == {
        (N + "a", "keep", N + "c"),
        (N + "b", "drop", None),
        (N + "c", None, None),
    }


def test_optional_mixed_kind_no_false_match(ray_session, tmp_path):
    """OPTIONAL sharing a var that is an OBJECT (kind-carrying) binding
    on the required side but a SUBJECT (implicitly non-literal) on the
    group side: a required LITERAL binding whose lexical form spells an
    IRI must NULL-extend, never falsely match (derived-kind join)."""
    from p5_rdf_rdb2rdf_ray.engine.lookup import get_pattern_store
    from p5_rdf_rdb2rdf_ray.sinks.triplestore import write_triplestore

    I, L = KIND_IRI, KIND_LITERAL
    rows = [
        (N + "x", N + "v", N + "b", I),      # IRI object -> must match
        (N + "y", N + "v", N + "b", L),      # literal spelling the IRI
        (N + "b", N + "w", "hit", L),
    ]
    t = pa.table(
        {
            "subj": [r[0] for r in rows],
            "pred": [r[1] for r in rows],
            "obj": [r[2] for r in rows],
            "obj_kind": pa.array([r[3] for r in rows], pa.uint8()),
            "lang": pa.array([None] * 3, pa.string()),
            "datatype": pa.array([None] * 3, pa.string()),
            "graph": pa.array([None] * 3, pa.string()),
        }
    )
    out = str(tmp_path / "mixedstore")
    write_triplestore(rd.from_arrow(t), out, num_buckets=2)
    got = get_pattern_store(
        out,
        [("?s", N + "v", "?o")],
        optional=[("?o", N + "w", "?h")],
    ).to_pandas()
    by_s = {r["s"]: r["h"] for _, r in got.iterrows()}
    assert by_s[N + "x"] == "hit"
    assert by_s[N + "y"] is None or by_s[N + "y"] != by_s[N + "y"]  # NULL


def test_filter_or_disjunction(store, ray_session):
    """FILTER || with standard precedence (&& binds tighter), nested
    parens, string tests inside a disjunct, and store execution."""
    q = parse_query(
        f"""
        SELECT ?s ?nm WHERE {{
          ?s <{N}name> ?nm .
          FILTER(?nm = "alpha" || ?nm = "beta" && STRENDS(?nm, "ta"))
        }}
        """
    )
    # precedence: a || (b && c)
    assert q.where.filters == [
        (
            "or",
            [
                ("?nm", "==", "alpha"),
                ("and", [("?nm", "==", "beta"), ("?nm", "strends", "ta")]),
            ],
        )
    ]
    got = _rows(
        sparql(
            store,
            f"""
            SELECT ?s ?nm WHERE {{
              ?s <{N}name> ?nm .
              FILTER(?nm = "alpha" || ?nm = "beta" && STRENDS(?nm, "ta"))
            }}
            """,
        )
    )
    assert {(r["s"], r["nm"]) for r in got} == {
        (N + "a", "alpha"),
        (N + "b", "beta"),
    }
    # parenthesized grouping flips the tree: (a || b) && c
    got = _rows(
        sparql(
            store,
            f"""
            SELECT ?s ?nm WHERE {{
              ?s <{N}name> ?nm .
              FILTER((?nm = "alpha" || ?nm = "beta") && STRENDS(?nm, "ta"))
            }}
            """,
        )
    )
    assert {(r["s"], r["nm"]) for r in got} == {(N + "b", "beta")}


def test_filter_in_bound_negation_varvar(store, ray_session):
    """§17.4 extras: ?x IN (...) / NOT IN (...), BOUND / !BOUND with
    OPTIONAL, ! negation of groups, and var-vs-var comparison."""
    q = parse_query(
        f'SELECT ?s WHERE {{ ?s <{N}name> ?nm . '
        f'FILTER(?nm IN ("alpha", "beta")) }}'
    )
    assert q.where.filters == [
        ("or", [("?nm", "==", "alpha"), ("?nm", "==", "beta")])
    ]
    got = _rows(
        sparql(
            store,
            f"""SELECT ?s WHERE {{ ?s <{N}name> ?nm .
              FILTER(?nm NOT IN ("alpha", "beta")) }}""",
        )
    )
    assert {r["s"] for r in got} == {N + "c"}
    # !BOUND is the OPTIONAL anti-join idiom: entities with NO tag
    got = _rows(
        sparql(
            store,
            f"""SELECT ?s WHERE {{ ?s <{N}name> ?nm .
              OPTIONAL {{ ?s <{N}tag> ?tg }} FILTER(!BOUND(?tg)) }}""",
        )
    )
    assert {r["s"] for r in got} == {N + "c"}
    # ! of a parenthesized group (De Morgan vs the || test above)
    got = _rows(
        sparql(
            store,
            f"""SELECT ?s WHERE {{ ?s <{N}name> ?nm .
              FILTER(!(?nm = "alpha" || ?nm = "beta")) }}""",
        )
    )
    assert {r["s"] for r in got} == {N + "c"}
    # var-vs-var: subjects whose score differs from <a>'s score
    got = _rows(
        sparql(
            store,
            f"""SELECT ?s WHERE {{ ?s <{N}score> ?v . ?a <{N}score> ?w .
              FILTER(?a = <{N}a>) FILTER(?v > ?w) }}""",
        )
    )
    assert {r["s"] for r in got} == {N + "b", N + "c"}


def test_filter_or_across_vars_and_numeric(store, ray_session):
    """Disjunction across two DIFFERENT variables (no store pushdown —
    binding-level only) mixing numeric and string atoms; an unbound
    OPTIONAL var inside one disjunct never passes but the other disjunct
    can still admit the row."""
    got = _rows(
        sparql(
            store,
            f"""
            SELECT ?s WHERE {{
              ?s <{N}name> ?nm ; <{N}score> ?v .
              OPTIONAL {{ ?s <{N}tag> ?tg }}
              FILTER(?tg = "keep" || ?v > 5)
            }}
            """,
        )
    )
    # a: tag=keep passes; b: tag=drop but score 7>5; c: no tag (unbound
    # never passes a FILTER atom) but score 7>5
    assert {r["s"] for r in got} == {N + "a", N + "b", N + "c"}


def test_ask_fully_bound_mu0(store, ray_session):
    """A WHERE group whose patterns are ALL fully bound has solution
    set {mu0} (one solution binding nothing, SPARQL 1.1 section 18.5
    Join identity) when every ground triple exists — ASK must answer
    True, not False-from-empty; any missing ground triple -> False."""
    assert sparql(store, f"ASK {{ <{N}a> <{N}p> <{N}b> }}") is True
    assert sparql(store, f"ASK {{ <{N}a> <{N}p> <{N}c> }}") is False
    assert (
        sparql(
            store,
            f"ASK {{ <{N}a> <{N}p> <{N}b> . <{N}b> <{N}p> <{N}c> }}",
        )
        is True
    )
    assert (
        sparql(
            store,
            f"ASK {{ <{N}a> <{N}p> <{N}b> . <{N}b> <{N}p> <{N}a> }}",
        )
        is False
    )
    # fully-bound PATH probe as the only unit: <a> p+ <c> holds via b
    assert sparql(store, f"ASK {{ <{N}a> <{N}p>+ <{N}c> }}") is True
    assert sparql(store, f"ASK {{ <{N}c> <{N}p>+ <{N}a> }}") is False
    # ground triple + a variable pattern: the mu0 branch must NOT fire;
    # the variable side carries the solutions
    got = sparql(
        store,
        f"SELECT ?nm WHERE {{ <{N}a> <{N}p> <{N}b> . "
        f"<{N}a> <{N}name> ?nm }}",
    ).take_all()
    assert [r["nm"] for r in got] == ["alpha"]


def test_subquery_literal_join(store, ray_session):
    """Subquery units carry term-kind columns: a LITERAL variable
    projected out of a subquery must join outer literal bindings (it
    was silently dropped when the unit lacked kind metadata), and a
    grouped subquery keyed on a literal keeps its kind through the
    aggregate."""
    got = sparql(
        store,
        f"""SELECT ?s ?nm WHERE {{
          {{ SELECT ?nm WHERE {{ ?x <{N}name> ?nm }} }}
          ?s <{N}name> ?nm
        }} ORDER BY ?nm""",
    ).take_all()
    assert [(r["s"], r["nm"]) for r in got] == [
        (N + "a", "alpha"),
        (N + "b", "beta"),
        (N + "c", "gamma"),
    ]

    # grouped subquery keyed on a literal: counts join back per key
    got = sparql(
        store,
        f"""SELECT ?sc ?c WHERE {{
          {{ SELECT ?sc (COUNT(?x) AS ?c)
             WHERE {{ ?x <{N}score> ?sc }} GROUP BY ?sc }}
          ?s <{N}score> ?sc
        }} ORDER BY ?sc""",
    ).take_all()
    assert [(r["sc"], r["c"]) for r in got] == [
        ("3", 1), ("7", 2), ("7", 2),
    ]

    # an aggregate OUTPUT joined by an outer pattern variable would need
    # literal-join semantics over a computed value -> fail loud
    with pytest.raises(NotImplementedError, match="aggregate output"):
        sparql(
            store,
            f"""SELECT ?c WHERE {{
              {{ SELECT ?x (COUNT(?o) AS ?c)
                 WHERE {{ ?x <{N}p> ?o }} GROUP BY ?x }}
              ?s <{N}score> ?c
            }}""",
        ).take_all()


def test_subquery_mixed_kind_no_false_match(ray_session, tmp_path):
    """A literal binding whose lexical form SPELLS an IRI, projected out
    of a subquery, must not falsely match an outer pattern where the
    shared variable sits in subject position (implicitly non-literal)."""
    from p5_rdf_rdb2rdf_ray.sinks.triplestore import write_triplestore

    I, L = KIND_IRI, KIND_LITERAL
    rows = [
        (N + "x", N + "v", N + "b", I),  # IRI object -> must match
        (N + "y", N + "v", N + "b", L),  # literal spelling the IRI
        (N + "b", N + "w", "hit", L),
    ]
    t = pa.table(
        {
            "subj": [r[0] for r in rows],
            "pred": [r[1] for r in rows],
            "obj": [r[2] for r in rows],
            "obj_kind": pa.array([r[3] for r in rows], pa.uint8()),
            "lang": pa.array([None] * 3, pa.string()),
            "datatype": pa.array([None] * 3, pa.string()),
            "graph": pa.array([None] * 3, pa.string()),
        }
    )
    out = str(tmp_path / "subqmixed")
    write_triplestore(rd.from_arrow(t), out, num_buckets=2)
    got = sparql(
        out,
        f"""SELECT ?o ?h WHERE {{
          {{ SELECT ?o WHERE {{ ?s <{N}v> ?o }} }}
          ?o <{N}w> ?h
        }}""",
    ).take_all()
    assert [(r["o"], r["h"]) for r in got] == [(N + "b", "hit")]


def test_update_delete_lexical_match(ray_session, tmp_path):
    """DELETE over the store matches on the LEXICAL identity
    (subj, pred, obj, obj_kind): typed, language-tagged and named-graph
    rows are removed by the patterns that matched them, even though the
    reconstructed delta carries NULL lang/datatype/graph."""
    from p5_rdf_rdb2rdf_ray.engine.sparql import sparql_update
    from p5_rdf_rdb2rdf_ray.sinks.triplestore import (
        read_triplestore,
        write_triplestore,
    )

    I, L = KIND_IRI, KIND_LITERAL
    X = "http://www.w3.org/2001/XMLSchema#"
    rows = [
        # (subj, pred, obj, kind, lang, datatype, graph)
        (N + "d", N + "n", "5", L, None, X + "integer", None),
        (N + "d", N + "hello", "hi", L, "en", None, None),
        (N + "d", N + "q", N + "e", I, None, None, N + "g1"),
        (N + "e", N + "n", "5", L, None, None, None),
    ]
    t = pa.table(
        {
            "subj": [r[0] for r in rows],
            "pred": [r[1] for r in rows],
            "obj": [r[2] for r in rows],
            "obj_kind": pa.array([r[3] for r in rows], pa.uint8()),
            "lang": pa.array([r[4] for r in rows], pa.string()),
            "datatype": pa.array([r[5] for r in rows], pa.string()),
            "graph": pa.array([r[6] for r in rows], pa.string()),
        }
    )
    s = str(tmp_path / "lexdel")
    write_triplestore(rd.from_arrow(t), s, num_buckets=2)

    # DELETE DATA with the plain lexical form removes the TYPED row
    m = sparql_update(s, f'DELETE DATA {{ <{N}d> <{N}n> "5" . }}')
    assert m["rows_removed"] == 1
    assert read_triplestore(s).count() == 3
    # the other subject's plain "5" is untouched
    assert sparql(s, f'ASK {{ <{N}e> <{N}n> "5" }}') is True

    # DELETE WHERE sweeps language-tagged and named-graph rows too
    m = sparql_update(s, f"DELETE WHERE {{ <{N}d> <{N}hello> ?o }}")
    assert m["rows_removed"] == 1
    m = sparql_update(s, f"DELETE WHERE {{ ?s <{N}q> ?o }}")
    assert m["rows_removed"] == 1
    assert read_triplestore(s).count() == 1
    # idempotent: re-running the same delete is a no-op
    m = sparql_update(s, f"DELETE WHERE {{ ?s <{N}q> ?o }}")
    assert m["rows_removed"] == 0


def test_filter_negation_error_semantics(store, ray_session):
    """SPARQL 1.1 section 17.2: !(error) = error — a row whose inner
    expression type-errors (unbound var, non-numeric lexical form under
    a numeric comparison) is DROPPED under negation, not kept."""
    # c has no tag: ?tg unbound -> (?tg = "keep") errors -> !(...) errors
    # -> c drops. a has tag "keep" (-> false), b has "drop" (-> true).
    got = _rows(
        sparql(
            store,
            f"""SELECT ?s WHERE {{ ?s <{N}name> ?nm .
              OPTIONAL {{ ?s <{N}tag> ?tg }}
              FILTER(!(?tg = "keep")) }}""",
        )
    )
    assert {r["s"] for r in got} == {N + "b"}
    # names are non-numeric: ?nm > 5 errors for every row -> negation
    # keeps nothing (old behavior kept ALL rows)
    got = _rows(
        sparql(
            store,
            f"""SELECT ?s WHERE {{ ?s <{N}name> ?nm .
              FILTER(!(?nm > 5)) }}""",
        )
    )
    assert got == []
    # scores ARE numeric: !(?v > 5) keeps exactly the complement
    got = _rows(
        sparql(
            store,
            f"""SELECT ?s WHERE {{ ?s <{N}score> ?v .
              FILTER(!(?v > 5)) }}""",
        )
    )
    assert {r["s"] for r in got} == {N + "a"}
    # error inside || : true-branch still admits the row (E || T = T),
    # error-only rows drop
    got = _rows(
        sparql(
            store,
            f"""SELECT ?s WHERE {{ ?s <{N}name> ?nm .
              OPTIONAL {{ ?s <{N}tag> ?tg }}
              FILTER(?tg = "keep" || ?nm = "gamma") }}""",
        )
    )
    assert {r["s"] for r in got} == {N + "a", N + "c"}


def test_tokenizer_positioned_errors():
    """Malformed input raises a positioned ValueError, never a raw
    int()/AttributeError/index crash."""
    with pytest.raises(ValueError, match=r"bad \\u escape"):
        parse_query('SELECT ?s WHERE { ?s <http://x/p> "a\\uZZZZ" }')
    with pytest.raises(ValueError, match="language tag"):
        parse_query('SELECT ?s WHERE { ?s <http://x/p> "a"@1 }')
    with pytest.raises(ValueError, match="unterminated datatype"):
        parse_query('SELECT ?s WHERE { ?s <http://x/p> "a"^^<http://x }')


def test_subquery_in_group_fails_loud():
    """Subqueries nested inside OPTIONAL / UNION groups are outside the
    supported subset — the parser rejects them instead of silently
    dropping them."""
    sub = f"{{ SELECT ?s WHERE {{ ?s <{N}p> ?o }} }}"
    with pytest.raises(ValueError, match="plain triple patterns"):
        parse_query(
            f"SELECT ?s WHERE {{ ?s <{N}p> ?o . OPTIONAL {{ {sub} }} }}"
        )
    with pytest.raises(ValueError, match="plain triple"):
        parse_query(
            f"SELECT ?s WHERE {{ {{ ?s <{N}p> ?o }} UNION {{ {sub} }} }}"
        )


def test_select_fully_bound_mu0(store, ray_session):
    """SELECT over a WHERE group binding no variables: explicit
    projections yield ONE all-unbound solution when the ground triples
    exist (never the internal __mu0 marker), zero rows when they do
    not; SELECT * fails loud."""
    got = sparql(
        store, f"SELECT ?x WHERE {{ <{N}a> <{N}p> <{N}b> }}"
    ).take_all()
    assert len(got) == 1 and got[0]["x"] is None
    got = sparql(
        store, f"SELECT ?x WHERE {{ <{N}a> <{N}p> <{N}c> }}"
    ).take_all()
    assert got == []
    with pytest.raises(NotImplementedError, match="binds no variables"):
        sparql(store, f"SELECT * WHERE {{ <{N}a> <{N}p> <{N}b> }}").take_all()


def test_subquery_agg_alias_clash_all_join_sites(store, ray_session):
    """The aggregate-output clash guard covers every outer JOIN site —
    VALUES and OPTIONAL, not just plain patterns."""
    sub = (
        f"{{ SELECT ?x (COUNT(?o) AS ?c) "
        f"WHERE {{ ?x <{N}p> ?o }} GROUP BY ?x }}"
    )
    with pytest.raises(NotImplementedError, match="aggregate output"):
        sparql(
            store,
            f'SELECT ?c WHERE {{ {sub} VALUES ?c {{ "2" }} }}',
        ).take_all()
    with pytest.raises(NotImplementedError, match="aggregate output"):
        sparql(
            store,
            f"SELECT ?c WHERE {{ {sub} ?x <{N}name> ?nm . "
            f"OPTIONAL {{ ?s <{N}score> ?c }} }}",
        ).take_all()
    # FILTER over the alias only READS the joined column — legal
    got = sparql(
        store,
        f"SELECT ?x WHERE {{ {sub} ?x <{N}name> ?nm . FILTER(?c >= 1) }}",
    ).take_all()
    assert {r["x"] for r in got} == {N + "a", N + "b"}


def test_subquery_optional_var_null_kind(store, ray_session):
    """A subquery projecting an OPTIONAL variable: unbound rows carry a
    NULL kind (not a fabricated IRI kind) and survive the outer join."""
    got = sparql(
        store,
        f"""SELECT ?s ?tg WHERE {{
          {{ SELECT ?s ?tg WHERE {{ ?s <{N}name> ?nm .
             OPTIONAL {{ ?s <{N}tag> ?tg }} }} }}
          ?s <{N}score> ?v
        }} ORDER BY ?s""",
    ).take_all()
    assert [(r["s"], r["tg"]) for r in got] == [
        (N + "a", "keep"), (N + "b", "drop"), (N + "c", None),
    ]


def test_tokenizer_u_escape_strictness():
    """\\u must be exactly 4 hex digits — int(x, 16)'s tolerance for
    whitespace / signs / underscores is not inherited."""
    for bad in ("\\u 041", "\\u+041", "\\u0_41", "\\u04"):
        with pytest.raises(ValueError, match=r"bad \\u escape"):
            parse_query(
                f'SELECT ?s WHERE {{ ?s <http://x/p> "a{bad}!" }}'
            )


def test_variable_predicate(store, ray_session):
    """SPARQL 19.8 Verb := VarOrIri — variable predicates are ordinary
    triple patterns: bound-subject enumeration, grouped counts over the
    full wildcard, ';' lists and OPTIONAL groups."""
    got = sparql(
        store, f"SELECT ?p ?o WHERE {{ <{N}c> ?p ?o }} ORDER BY ?p"
    ).take_all()
    assert [(r["p"], r["o"]) for r in got] == [
        (N + "name", "gamma"), (N + "score", "7"),
    ]
    got = sparql(
        store,
        "SELECT ?p (COUNT(?s) AS ?n) WHERE { ?s ?p ?o } "
        "GROUP BY ?p ORDER BY ?p",
    ).take_all()
    assert [(r["p"], r["n"]) for r in got] == [
        (N + "name", 3), (N + "p", 2), (N + "q", 1),
        (N + "score", 3), (N + "tag", 2),
    ]
    # ';' continues the same subject after a variable verb; OPTIONAL
    # groups accept variable verbs too
    got = sparql(
        store,
        f"""SELECT ?s ?o ?z WHERE {{
          ?s ?p ?o ; <{N}name> "alpha" .
          OPTIONAL {{ ?s <{N}tag> ?z }}
        }} ORDER BY ?o""",
    ).take_all()
    assert len(got) == 5 and all(r["s"] == N + "a" for r in got)
    assert all(r["z"] == "keep" for r in got)


def test_update_delete_wildcard(store, tmp_path, ray_session):
    """DELETE WHERE { ?s ?p ?o } — the variable-predicate wildcard
    empties the store in ONE statement (the per-predicate enumeration
    workaround is no longer needed)."""
    from p5_rdf_rdb2rdf_ray.engine.sparql import sparql_update
    from p5_rdf_rdb2rdf_ray.sinks.triplestore import read_triplestore

    s = _copy_store(store, tmp_path, "wipe")
    total = read_triplestore(s).count()
    m = sparql_update(s, "DELETE WHERE { ?s ?p ?o }")
    assert m["rows_removed"] == total
    assert read_triplestore(s).count() == 0


def test_variable_predicate_catalog_prune(ray_session):
    """Over the DM VIRTUAL graph, a ``?s ?p ?o`` wildcard whose subject
    is anchored by a bound-predicate sibling expands only that table's
    map (get_pattern's subject_tables prune) — and the prune is SOUND:
    the bindings equal the unpruned whole-catalog expansion's."""
    from p5_rdf_rdb2rdf_ray.engine.bgp_plan import subject_tables
    from p5_rdf_rdb2rdf_ray.engine.lookup import get_statements
    from p5_rdf_rdb2rdf_ray.pipelines.queries_kg import BASE, catalog_for

    cat = catalog_for("/root/testdata/sf0.001")
    sv = subject_tables(
        cat,
        [("?s", f"{BASE}region#r_name", "?nm"), ("?s", "?p", "?o")],
        BASE,
    )
    assert sv == {"s": {"region"}}
    # only_tables prunes the expansion; unknown tables yield empty
    assert get_statements(cat, only_tables=["region"]).count() == 15
    assert get_statements(cat, only_tables=["nosuch"]).count() == 0

    got = _rows(
        sparql(
            cat,
            f"""SELECT ?p (COUNT(?s) AS ?n) WHERE {{
              ?s <{BASE}region#r_name> ?nm . ?s ?p ?o
            }} GROUP BY ?p ORDER BY ?p""",
            base=BASE,
        )
    )
    # region: 2 columns + rdf:type, 5 rows each — nothing from the
    # other nine catalog tables leaks in, nothing of region is lost
    assert [(r["p"], r["n"]) for r in got] == [
        (f"{BASE}region#r_name", 5),
        (f"{BASE}region#r_regionkey", 5),
        ("http://www.w3.org/1999/02/22-rdf-syntax-ns#type", 5),
    ]


def test_select_star_no_match_keeps_scope_columns(store, ray_session):
    """A group that BINDS variables but contains a fully-bound pattern
    that misses is the EMPTY solution set: SELECT * returns zero rows
    whose columns are the in-scope variables (regression: the mu0
    handling raised NotImplementedError on _NO_MATCH's zero-column
    table, and the message blamed the group for binding nothing)."""
    got = sparql(
        store, f"SELECT * WHERE {{ ?s ?p ?o . <{N}a> <{N}p> <{N}nope> }}"
    )
    assert _rows(got) == []
    assert set(got.schema().names) == {"s", "p", "o"}
    # explicit projection over the same no-match group
    got = _rows(
        sparql(
            store,
            f"SELECT ?s WHERE {{ ?s ?p ?o . <{N}a> <{N}p> <{N}nope> }}",
        )
    )
    assert got == []


def test_select_projected_unbound_variable(store, ray_session):
    """Projecting a variable the group never binds is legal SPARQL —
    an all-NULL column (select_columns used to raise on it)."""
    got = _rows(
        sparql(store, f'SELECT ?s ?ghost WHERE {{ ?s <{N}tag> "keep" }}')
    )
    assert [(r["s"], r["ghost"]) for r in got] == [(N + "a", None)]


def test_select_over_fully_bound_group(store, ray_session):
    """Degenerate group (every pattern fully bound): {mu0} on a hit —
    one all-NULL row per projected variable — and empty on a miss."""
    got = _rows(sparql(store, f"SELECT ?x WHERE {{ <{N}a> <{N}p> <{N}b> }}"))
    assert [r["x"] for r in got] == [None]
    got = _rows(sparql(store, f"SELECT ?x WHERE {{ <{N}a> <{N}p> <{N}zz> }}"))
    assert got == []


def test_subquery_inherits_constant_graph_scope(quad_store, ray_session):
    """A {{ SELECT … }} inside GRAPH <g> evaluates against g — the
    active graph extends into the subquery (SPARQL 13.3). Regression:
    the nested parse zeroed the scope, so the subquery matched every
    context (g1+g2+default would add beta/gamma/delta here)."""
    G1 = N + "g1"
    got = {
        r["nm"]
        for r in _rows(
            sparql(
                quad_store,
                f"""SELECT ?nm WHERE {{ GRAPH <{G1}> {{
                  {{ SELECT ?nm WHERE {{ ?s <{N}name> ?nm }} }} }} }}""",
            )
        )
    }
    assert got == {"alpha"}


def test_unscoped_delete_data_targets_default_graph(ray_session, tmp_path):
    """DELETE DATA without GRAPH removes the DEFAULT-graph quad only —
    symmetric with INSERT DATA writing the nil context (W3C Update
    §3.1.2); the named-graph copy stays. Pattern-derived DELETE WHERE
    keeps the documented union sweep (test_update_delete_lexical_match)."""
    from p5_rdf_rdb2rdf_ray.engine.sparql import sparql_update
    from p5_rdf_rdb2rdf_ray.sinks.triplestore import (
        read_triplestore,
        write_triplestore,
    )

    G1 = N + "g1"
    L = KIND_LITERAL
    t = pa.table(
        {
            "subj": [N + "d", N + "d"],
            "pred": [N + "n", N + "n"],
            "obj": ["5", "5"],
            "obj_kind": pa.array([L, L], pa.uint8()),
            "lang": pa.array([None, None], pa.string()),
            "datatype": pa.array([None, None], pa.string()),
            "graph": pa.array([None, G1], pa.string()),
        }
    )
    s = str(tmp_path / "deldefault")
    write_triplestore(rd.from_arrow(t), s, num_buckets=2)

    from p5_rdf_rdb2rdf_ray.engine.sparql import sparql as _sparql

    m = sparql_update(s, f'DELETE DATA {{ <{N}d> <{N}n> "5" . }}')
    assert m["rows_removed"] == 1
    assert read_triplestore(s).count() == 1
    assert _sparql(s, f'ASK {{ GRAPH <{G1}> {{ <{N}d> <{N}n> "5" }} }}') is True
    # INSERT DATA ; DELETE DATA round-trips to the starting store
    m = sparql_update(
        s,
        f'INSERT DATA {{ <{N}d> <{N}n> "5" . }} ; '
        f'DELETE DATA {{ <{N}d> <{N}n> "5" . }}',
    )
    assert m["rows_added"] == 1 and m["rows_removed"] == 1
    assert read_triplestore(s).count() == 1


def test_modify_reports_rows_added(ray_session, tmp_path):
    """DELETE {} INSERT {} WHERE {} surfaces BOTH top-level counters,
    so ;-sequence totals include the modify's inserts."""
    from p5_rdf_rdb2rdf_ray.engine.sparql import sparql_update
    from p5_rdf_rdb2rdf_ray.sinks.triplestore import write_triplestore

    I = KIND_IRI
    t = pa.table(
        {
            "subj": [N + "a", N + "b"],
            "pred": [N + "p", N + "p"],
            "obj": [N + "x", N + "y"],
            "obj_kind": pa.array([I, I], pa.uint8()),
            "lang": pa.array([None, None], pa.string()),
            "datatype": pa.array([None, None], pa.string()),
            "graph": pa.array([None, None], pa.string()),
        }
    )
    s = str(tmp_path / "modcount")
    write_triplestore(rd.from_arrow(t), s, num_buckets=2)
    m = sparql_update(
        s,
        f"DELETE {{ ?s <{N}p> ?o }} INSERT {{ ?s <{N}q> ?o }} "
        f"WHERE {{ ?s <{N}p> ?o }}",
    )
    assert m["rows_removed"] == 2
    assert m["rows_added"] == 2


def test_filter_unspaced_signed_arithmetic(store, ray_session):
    """§19.8 NumericLiteralPositive: `?v+1` (no spaces) parses as the
    addition — the tokenizer folds the sign into the NUMBER and the
    additive grammar consumes it (the `-` twin already worked)."""
    got = _rows(
        sparql(
            store,
            f"SELECT ?s WHERE {{ ?s <{N}score> ?v . FILTER(?v+1 > 7) }}",
        )
    )
    assert {r["s"] for r in got} == {N + "b", N + "c"}
    got = _rows(
        sparql(
            store,
            f"SELECT ?s WHERE {{ ?s <{N}score> ?v . FILTER(?v-1 > 5) }}",
        )
    )
    assert {r["s"] for r in got} == {N + "b", N + "c"}
    # BIND form: spaced and unspaced agree
    a = _rows(
        sparql(
            store,
            f"SELECT ?s ?w WHERE {{ ?s <{N}score> ?v . "
            f"BIND(?v+1 AS ?w) }} ORDER BY ?s",
        )
    )
    b = _rows(
        sparql(
            store,
            f"SELECT ?s ?w WHERE {{ ?s <{N}score> ?v . "
            f"BIND(?v + 1 AS ?w) }} ORDER BY ?s",
        )
    )
    assert [(r["s"], r["w"]) for r in a] == [(r["s"], r["w"]) for r in b]
    assert [r["w"] for r in a] == ["4", "8", "8"]


def test_optional_with_inner_filter(store, ray_session):
    """FILTER inside OPTIONAL is the LeftJoin CONDITION (SPARQL 1.1
    §6): a required row whose optional match fails the filter keeps
    its row with the group's variables NULL — different from filtering
    after the join, which would drop it."""
    got = sorted(
        (r["s"], r["v"])
        for r in _rows(
            sparql(
                store,
                f"""SELECT ?s ?v WHERE {{ ?s <{N}name> ?nm
                  OPTIONAL {{ ?s <{N}score> ?v FILTER(?v > 5) }} }}""",
            )
        )
    )
    # scores: a=3 b=7 c=7 — a fails the bar but keeps its row
    assert got == [(N + "a", None), (N + "b", "7"), (N + "c", "7")]
    # a filter no optional row passes: every required row keeps NULL
    got = _rows(
        sparql(
            store,
            f"""SELECT ?s ?v WHERE {{ ?s <{N}name> ?nm
              OPTIONAL {{ ?s <{N}score> ?v FILTER(?v > 9) }} }}""",
        )
    )
    assert sorted(r["s"] for r in got) == [N + "a", N + "b", N + "c"]
    assert {r["v"] for r in got} == {None}
    # fail loud: the filter reads a variable the group does not bind
    with pytest.raises(ValueError, match="does not bind"):
        sparql(
            store,
            f"""SELECT ?s WHERE {{ ?s <{N}name> ?nm
              OPTIONAL {{ ?s <{N}score> ?v FILTER(?nm = "x") }} }}""",
        )


def test_nested_conjunctive_groups_fold(store, ray_session):
    """Nested plain groups are Join(outer, group) — triples, paths and
    FILTERs over the group's own variables flatten exactly (SPARQL
    §18.2); group-scoped forms (OPTIONAL/BIND/…) fail loud."""
    # group leading the body
    got = sorted(
        r["nm"]
        for r in _rows(
            sparql(
                store,
                f"""SELECT ?nm WHERE {{
                  {{ ?s <{N}name> ?nm . FILTER(?nm != "beta") }}
                  ?s <{N}score> ?v . FILTER(?v >= 7) }}""",
            )
        )
    )
    assert got == ["gamma"]
    # group mid-body
    got = sorted(
        r["nm"]
        for r in _rows(
            sparql(
                store,
                f"""SELECT ?nm WHERE {{ ?s <{N}score> ?v
                  {{ ?s <{N}name> ?nm }} FILTER(?v > 5) }}""",
            )
        )
    )
    assert got == ["beta", "gamma"]
    # WHERE { { g } } is exactly g — OPTIONAL inside is legal
    got = sorted(
        (r["s"], r["v"])
        for r in _rows(
            sparql(
                store,
                f"""SELECT ?s ?v WHERE {{ {{ ?s <{N}tag> ?t
                  OPTIONAL {{ ?s <{N}score> ?v }} }} }}""",
            )
        )
    )
    assert got == [(N + "a", "3"), (N + "b", "7")]
    # fail loud: OPTIONAL inside a folded (non-sole) nested group
    with pytest.raises(ValueError, match="conjunctive"):
        sparql(
            store,
            f"""SELECT ?s WHERE {{
              {{ ?s <{N}tag> ?t OPTIONAL {{ ?s <{N}score> ?v }} }}
              ?s <{N}name> ?nm }}""",
        )
    # fail loud: nested-group FILTER reading an outer variable
    with pytest.raises(ValueError, match="does not bind"):
        sparql(
            store,
            f"""SELECT ?s WHERE {{ ?s <{N}score> ?v
              {{ ?s <{N}name> ?nm . FILTER(?v > 5) }} }}""",
        )


def test_filter_var_walkers_shape_aware(ray_session, tmp_path):
    """The scope walkers are AST-shape-aware (regression ×3): a
    var-vs-var FILTER right side (('var', name)) counts as a read, so
    an outer-variable reference inside OPTIONAL fails at PARSE time
    instead of a KeyError inside a Ray task; a string constant that
    merely spells '?a' is NOT a variable; and a pattern literal
    spelling '?ghost' does not enter the scope set."""
    from p5_rdf_rdb2rdf_ray.sinks.triplestore import write_triplestore

    L = KIND_LITERAL
    rows = [
        (N + "a", N + "name", "alpha"), (N + "b", N + "name", "beta"),
        (N + "a", N + "score", "3"), (N + "b", N + "score", "7"),
        (N + "b", N + "alias", "7"),
    ]
    t = pa.table(
        {
            "subj": [r[0] for r in rows],
            "pred": [r[1] for r in rows],
            "obj": [r[2] for r in rows],
            "obj_kind": pa.array([L] * len(rows), pa.uint8()),
            "lang": pa.array([None] * len(rows), pa.string()),
            "datatype": pa.array([None] * len(rows), pa.string()),
            "graph": pa.array([None] * len(rows), pa.string()),
        }
    )
    s = str(tmp_path / "walkers")
    write_triplestore(rd.from_arrow(t), s, num_buckets=2)

    # var-vs-var right side reading an OUTER var: parse-time rejection
    with pytest.raises(ValueError, match="does not bind"):
        parse_query(
            f"""SELECT ?s WHERE {{ ?s <{N}name> ?nm
              OPTIONAL {{ ?s <{N}score> ?v FILTER(?v = ?nm) }} }}"""
        )
    # ... but var-vs-var with BOTH vars group-bound works
    got = sorted(
        (r["s"], r["v"])
        for r in sparql(
            s,
            f"""SELECT ?s ?v WHERE {{ ?s <{N}name> ?nm
              OPTIONAL {{ ?s <{N}score> ?v . ?s <{N}alias> ?al
                          FILTER(?v = ?al) }} }}""",
        ).take_all()
    )
    assert got == [(N + "a", None), (N + "b", "7")]
    # a string constant spelling '?a' is not a variable
    got = sorted(
        r["s"]
        for r in sparql(
            s,
            f"""SELECT ?s WHERE {{ ?s <{N}name> ?nm
              OPTIONAL {{ ?s <{N}score> ?v
                          FILTER(STRSTARTS(?v, "?a")) }} }}""",
        ).take_all()
    )
    assert got == [N + "a", N + "b"]
    # a pattern LITERAL spelling '?ghost' stays out of scope: the
    # projection falls to the NULL-column path instead of KeyError
    got = sparql(
        s,
        f'SELECT ?s ?ghost WHERE {{ ?s <{N}name> "alpha" . '
        f"?s <{N}score> ?v }}",
    ).take_all()
    assert got == [{"s": N + "a", "ghost": None}]
    # a constant FILTER on a fully-bound OPTIONAL group is a no-op
    # (the group binds nothing, so pass or fail returns every
    # required row unchanged), not an error
    got = sorted(
        r["s"]
        for r in sparql(
            s,
            f"""SELECT ?s WHERE {{ ?s <{N}name> ?nm
              OPTIONAL {{ <{N}b> <{N}alias> "7"
                          FILTER(STRLEN("x") > 0) }} }}""",
        ).take_all()
    )
    assert got == [N + "a", N + "b"]


def _tiny_store(tmp_path, name, rows, kinds=None):
    from p5_rdf_rdb2rdf_ray.sinks.triplestore import write_triplestore

    kinds = kinds or [KIND_LITERAL] * len(rows)
    t = pa.table(
        {
            "subj": [r[0] for r in rows],
            "pred": [r[1] for r in rows],
            "obj": [r[2] for r in rows],
            "obj_kind": pa.array(kinds, pa.uint8()),
            "lang": pa.array([None] * len(rows), pa.string()),
            "datatype": pa.array([None] * len(rows), pa.string()),
            "graph": pa.array([None] * len(rows), pa.string()),
        }
    )
    s = str(tmp_path / name)
    write_triplestore(rd.from_arrow(t), s, num_buckets=2)
    return s


def test_datetime_accessors(ray_session, tmp_path):
    """§17.4.5 YEAR/MONTH/DAY/HOURS/MINUTES/SECONDS/TZ over lexical
    xsd:dateTime / xsd:date forms: date-only binds the date accessors
    and leaves the time ones UNBOUND; a non-date form leaves everything
    unbound (expression error -> unbound); TZ is "" without a zone."""
    s = _tiny_store(
        tmp_path,
        "dt",
        [
            (N + "a", N + "ts", "2024-03-01T12:34:56.500-05:00"),
            (N + "b", N + "ts", "2023-11-30T23:05:09Z"),
            (N + "c", N + "ts", "2022-01-02"),
            (N + "d", N + "ts", "not-a-date"),
        ],
    )
    got = {
        r["s"]: (r["y"], r["mo"], r["d"], r["h"], r["mi"], r["sec"], r["z"])
        for r in sparql(
            s,
            f"""SELECT ?s ?y ?mo ?d ?h ?mi ?sec ?z WHERE {{
              ?s <{N}ts> ?ts .
              BIND(YEAR(?ts) AS ?y) BIND(MONTH(?ts) AS ?mo)
              BIND(DAY(?ts) AS ?d) BIND(HOURS(?ts) AS ?h)
              BIND(MINUTES(?ts) AS ?mi) BIND(SECONDS(?ts) AS ?sec)
              BIND(TZ(?ts) AS ?z)
            }}""",
        ).take_all()
    }
    assert got[N + "a"] == ("2024", "3", "1", "12", "34", "56.5", "-05:00")
    assert got[N + "b"] == ("2023", "11", "30", "23", "5", "9", "Z")
    assert got[N + "c"] == ("2022", "1", "2", None, None, None, "")
    assert got[N + "d"] == (None,) * 7


def test_hash_builtins(ray_session, tmp_path):
    """§17.4.6 MD5/SHA1/SHA256 equal hashlib digests of the UTF-8
    lexical form; unbound input stays unbound."""
    import hashlib

    s = _tiny_store(
        tmp_path, "hash",
        [(N + "a", N + "v", "abc"), (N + "b", N + "v", "héllo")],
    )
    got = {
        r["v"]: (r["m"], r["s1"], r["s2"])
        for r in sparql(
            s,
            f"""SELECT ?v ?m ?s1 ?s2 WHERE {{
              ?x <{N}v> ?v .
              BIND(MD5(?v) AS ?m) BIND(SHA1(?v) AS ?s1)
              BIND(SHA256(?v) AS ?s2)
            }}""",
        ).take_all()
    }
    for lex in ("abc", "héllo"):
        b = lex.encode("utf-8")
        assert got[lex] == (
            hashlib.md5(b).hexdigest(),
            hashlib.sha1(b).hexdigest(),
            hashlib.sha256(b).hexdigest(),
        )


def test_bnode_patterns(ray_session, tmp_path):
    """Blank nodes in patterns are non-distinguished variables
    (§4.1.4): a `_:label` joins across patterns like a variable, a
    nested `[ po-list ]` expands with fresh labels, a bare
    `[ po-list ]` is a whole triples block, and SELECT * excludes the
    blank-node columns from the projection."""
    I = KIND_IRI
    rows = [
        (N + "a", N + "p", N + "m", I),
        (N + "m", N + "q", "one", KIND_LITERAL),
        (N + "b", N + "p", N + "n", I),
        (N + "n", N + "q", "two", KIND_LITERAL),
    ]
    s = _tiny_store(tmp_path, "bn", rows, kinds=[r[3] for r in rows])

    # _:label joins the two patterns; SELECT * hides it
    got = sorted(
        tuple(sorted(r.items()))
        for r in sparql(
            s,
            f"SELECT * WHERE {{ ?s <{N}p> _:m . _:m <{N}q> ?v }}",
        ).take_all()
    )
    assert got == [
        (("s", N + "a"), ("v", "one")),
        (("s", N + "b"), ("v", "two")),
    ]
    # nested anonymous property list == the same join
    got2 = sorted(
        r["v"]
        for r in sparql(
            s, f"SELECT ?v WHERE {{ ?s <{N}p> [ <{N}q> ?v ] }}"
        ).take_all()
    )
    assert got2 == ["one", "two"]
    # bare [ po-list ] as a whole block, with a trailing ';'
    got3 = sorted(
        r["v"]
        for r in sparql(
            s, f"SELECT ?v WHERE {{ [ <{N}p> ?o ; <{N}p> ?o2 ] . "
               f"?o <{N}q> ?v . }}"
        ).take_all()
    )
    assert got3 == ["one", "two"]
    # ASK with only blank nodes
    assert sparql(s, f"ASK {{ [ <{N}q> 'one' ] }}") is True
    assert sparql(s, f"ASK {{ [ <{N}q> 'nope' ] }}") is False
    # blank nodes stay rejected where SPARQL forbids them
    with pytest.raises(ValueError, match="blank nodes"):
        parse_query(f"SELECT ?v WHERE {{ VALUES ?v {{ _:x }} }}")
    with pytest.raises(ValueError, match="reserved"):
        parse_query("SELECT ?__bn_a1 WHERE { ?s ?p ?__bn_a1 }")
    # SELECT * over a group binding ONLY blank nodes fails loud
    with pytest.raises(NotImplementedError, match="only blank"):
        sparql(s, f"SELECT * WHERE {{ [ <{N}q> 'one' ] }}").take_all()


@pytest.fixture(scope="module")
def lang_store(ray_session, tmp_path_factory):
    """Store with language-tagged + typed literals: the term metadata
    the LANG()/LANGMATCHES()/DATATYPE() filters consume at the scan."""
    from p5_rdf_rdb2rdf_ray.sinks.triplestore import write_triplestore

    L = KIND_LITERAL
    X = "http://www.w3.org/2001/XMLSchema#"
    rows = [
        # (subj, pred, obj, kind, lang, datatype)
        (N + "a", N + "label", "apple", L, "en", None),
        (N + "a", N + "label", "pomme", L, "fr", None),
        (N + "a", N + "label", "Apfel", L, "de-AT", None),
        (N + "b", N + "label", "bare", L, None, None),
        (N + "b", N + "label", "ball", L, "EN-us", None),
        (N + "a", N + "v", "5", L, None, X + "integer"),
        (N + "b", N + "v", "plain", L, None, None),
        (N + "c", N + "v", "tagged", L, "en", None),
        (N + "c", N + "v", N + "iriobj", KIND_IRI, None, None),
    ]
    t = pa.table(
        {
            "subj": [r[0] for r in rows],
            "pred": [r[1] for r in rows],
            "obj": [r[2] for r in rows],
            "obj_kind": pa.array([r[3] for r in rows], pa.uint8()),
            "lang": pa.array([r[4] for r in rows], pa.string()),
            "datatype": pa.array([r[5] for r in rows], pa.string()),
            "graph": pa.array([None] * len(rows), pa.string()),
        }
    )
    out = str(tmp_path_factory.mktemp("langstore") / "store")
    write_triplestore(rd.from_arrow(t), out, num_buckets=4)
    return out


def test_lang_filters(lang_store):
    def vals(q):
        return sorted(r["v"] for r in sparql(lang_store, q).take_all())

    # exact tag (case-sensitive on the stored tag)
    assert vals(
        f'SELECT ?v WHERE {{ ?s <{N}label> ?v FILTER(LANG(?v) = "en") }}'
    ) == ["apple"]
    # LANG(x) = "" matches untagged literals only
    assert vals(
        f'SELECT ?v WHERE {{ ?s <{N}label> ?v FILTER(LANG(?v) = "") }}'
    ) == ["bare"]
    # LANGMATCHES: case-insensitive + "-" prefix ranges (RFC 4647)
    assert vals(
        f'SELECT ?v WHERE {{ ?s <{N}label> ?v '
        f'FILTER(LANGMATCHES(LANG(?v), "EN")) }}'
    ) == ["apple", "ball"]
    assert vals(
        f'SELECT ?v WHERE {{ ?s <{N}label> ?v '
        f'FILTER(LANGMATCHES(LANG(?v), "de")) }}'
    ) == ["Apfel"]
    # "*" = any tagged literal
    assert vals(
        f'SELECT ?v WHERE {{ ?s <{N}label> ?v '
        f'FILTER(LANGMATCHES(LANG(?v), "*")) }}'
    ) == ["Apfel", "apple", "ball", "pomme"]
    # LANG of a non-literal is a type error: the IRI object row drops
    assert vals(
        f'SELECT ?v WHERE {{ ?s <{N}v> ?v '
        f'FILTER(LANGMATCHES(LANG(?v), "*")) }}'
    ) == ["tagged"]


def test_datatype_filters(lang_store):
    X = "http://www.w3.org/2001/XMLSchema#"

    def vals(q):
        return sorted(r["v"] for r in sparql(lang_store, q).take_all())

    # explicit datatype IRI
    assert vals(
        f"SELECT ?v WHERE {{ ?s <{N}v> ?v "
        f"FILTER(DATATYPE(?v) = <{X}integer>) }}"
    ) == ["5"]
    # RDF 1.1: a plain literal's datatype is xsd:string...
    assert vals(
        f"PREFIX xsd: <{X}> SELECT ?v WHERE {{ ?s <{N}v> ?v "
        f"FILTER(DATATYPE(?v) = xsd:string) }}"
    ) == ["plain"]
    # ...and a language-tagged literal's is rdf:langString
    assert vals(
        f"SELECT ?v WHERE {{ ?s <{N}v> ?v FILTER(DATATYPE(?v) = "
        f"<http://www.w3.org/1999/02/22-rdf-syntax-ns#langString>) }}"
    ) == ["tagged"]


def test_lang_filter_composes_with_join(lang_store):
    # the lang-filtered pattern folds into the BGP like any unit: only
    # subjects with an @en label survive the join with <v>
    got = sorted(
        (r["l"], r["v"])
        for r in sparql(
            lang_store,
            f'SELECT ?l ?v WHERE {{ ?s <{N}label> ?l ; <{N}v> ?v . '
            f'FILTER(LANG(?l) = "en") }}',
        ).take_all()
    )
    assert got == [("apple", "5")]


def test_lang_filter_fail_loud(lang_store, store):
    # two binders for the filtered variable → not scan-consumable
    with pytest.raises(NotImplementedError, match="LANG"):
        sparql(
            lang_store,
            f'SELECT ?v WHERE {{ ?a <{N}label> ?v . ?b <{N}alt> ?v . '
            f'FILTER(LANG(?v) = "en") }}',
        )
    # variable also used inside OPTIONAL → reject
    with pytest.raises(NotImplementedError, match="OPTIONAL"):
        sparql(
            lang_store,
            f'SELECT ?v WHERE {{ ?s <{N}label> ?v . '
            f'OPTIONAL {{ ?x <{N}alt> ?v }} FILTER(LANG(?v) = "en") }}',
        )
    # != is not consumable at one scan
    with pytest.raises(ValueError, match="'='"):
        parse_query(
            f'SELECT ?v WHERE {{ ?s <{N}label> ?v '
            f'FILTER(LANG(?v) != "en") }}'
        )
    # the DM virtual-graph source has no term-metadata scan path
    from p5_rdf_rdb2rdf_ray.engine.lookup import get_pattern

    with pytest.raises(ValueError, match="store"):
        from p5_rdf_rdb2rdf_ray.pipelines.queries_kg import catalog_for

        sparql(
            catalog_for("/root/testdata/sf0.001"),
            f'SELECT ?v WHERE {{ ?s <{N}label> ?v '
            f'FILTER(LANG(?v) = "en") }}',
            base="http://example.com/base/",
        ).take_all()


def test_sameterm(lang_store):
    # "5"^^xsd:integer vs <http://n/iriobj>: sameTerm needs kind match
    got = sorted(
        r["s"]
        for r in sparql(
            lang_store,
            f"SELECT ?s WHERE {{ ?s <{N}label> ?l ; <{N}v> ?v . "
            f"FILTER(sameTerm(?l, ?v)) }}",
        ).take_all()
    )
    assert got == []  # no label ever equals a v object
    # self-join via sameTerm: ?a <v> ?x, ?b <v> ?y, sameTerm(?x, ?y)
    got2 = sorted(
        (r["a"], r["b"])
        for r in sparql(
            lang_store,
            f"SELECT ?a ?b WHERE {{ ?a <{N}v> ?x . ?b <{N}v> ?y . "
            f"FILTER(sameTerm(?x, ?y)) FILTER(?a != ?b) }}",
        ).take_all()
    )
    assert got2 == []  # all v objects are distinct terms
    # and a positive case: same subject's x/y bind the same term
    got3 = sparql(
        lang_store,
        f"SELECT ?a WHERE {{ ?a <{N}v> ?x ; <{N}v> ?y . "
        f"FILTER(sameTerm(?x, ?y)) }}",
    ).take_all()
    assert sorted(r["a"] for r in got3) == sorted(
        [N + "a", N + "b", N + "c", N + "c"]
    )


def test_update_load(store, tmp_path, ray_session):
    """§3.1.4 LOAD: export a slice of the fixture store to N-Triples,
    LOAD it into a fresh store (bootstrap) and into an existing one
    (merge), with and without INTO GRAPH."""
    from p5_rdf_rdb2rdf_ray.engine.sparql import sparql_update
    from p5_rdf_rdb2rdf_ray.sinks.ntriples import write_ntriples
    from p5_rdf_rdb2rdf_ray.sinks.triplestore import store_statements

    nt = str(tmp_path / "dump")
    write_ntriples(
        store_statements(store, predicate=N + "name"), nt
    )
    # bootstrap a fresh store, into a named graph
    fresh = str(tmp_path / "fresh")
    m = sparql_update(fresh, f"LOAD <file://{nt}> INTO GRAPH <{N}g1>")
    assert m["rows_added"] == 3
    got = sorted(
        r["v"]
        for r in sparql(
            fresh,
            f"SELECT ?v WHERE {{ GRAPH <{N}g1> {{ ?s <{N}name> ?v }} }}",
        ).take_all()
    )
    assert got == ["alpha", "beta", "gamma"]
    # LOAD again without INTO GRAPH: default graph, disjoint from g1
    m2 = sparql_update(fresh, f"LOAD SILENT <file://{nt}>")
    assert m2["rows_added"] == 3
    both = sparql(
        fresh, f"SELECT ?s ?v WHERE {{ ?s <{N}name> ?v }}"
    ).take_all()
    assert len(both) == 3  # same (s,p,o) solutions across both graphs
    # idempotence: re-LOAD into the same graph adds nothing
    m3 = sparql_update(fresh, f"LOAD <file://{nt}> INTO GRAPH <{N}g1>")
    assert m3["rows_added"] == 0
    # a remote scheme fails loud (offline engine)
    with pytest.raises(ValueError, match="local"):
        sparql_update(fresh, "LOAD <http://example.org/data.nt>")

"""RefObjectMap join paths (W3C-R2RML §8; SURVEY §2 #21)."""

import pyarrow as pa
import pytest

from p5_rdf_rdb2rdf_ray.engine.runner import run_mapping
from p5_rdf_rdb2rdf_ray.mapping.spec import (
    MappingSpec,
    PredObjSpec,
    RefObjectSpec,
    TermMapSpec,
    TriplesMapSpec,
)
from p5_rdf_rdb2rdf_ray.sinks.ntriples import collect_ntriples

from p5_rdf_rdb2rdf_ray.sources.catalog import Catalog

EX = "http://ex.com/"

BOOKS = pa.table(
    {
        "book_id": pa.array([1, 2, 3], pa.int64()),
        "author_id": pa.array([10, 20, None], pa.int64()),
    }
)
AUTHORS = pa.table(
    {
        "author_id": pa.array([10, 20], pa.int64()),
        "slug": pa.array(["herman", "toby"]),
    }
)


def _spec(join_parent_template: str, join=(("author_id", "author_id"),)):
    """books map with a ref to authors; parent subject template decides
    whether the fast path applies."""
    return MappingSpec(
        base=EX,
        maps={
            "books": TriplesMapSpec(
                name="books",
                table="books",
                subject=TermMapSpec(kind="iri", template=EX + "book/{book_id}"),
                refs=(
                    RefObjectSpec(
                        pred=TermMapSpec(kind="iri", constant=EX + "author"),
                        parent="authors",
                        join=join,
                    ),
                ),
            ),
            "authors": TriplesMapSpec(
                name="authors",
                table="authors",
                subject=TermMapSpec(kind="iri", template=join_parent_template),
                classes=(EX + "Author",),
            ),
        },
    )


def test_fast_path_join(ray_session):
    # parent subject over the join column itself → derivable from child
    cat = Catalog(root="", tables={"books": BOOKS, "authors": AUTHORS})
    spec = _spec(EX + "author/{author_id}")
    lines = set(collect_ntriples(run_mapping(spec, cat)))
    assert f"<{EX}book/1> <{EX}author> <{EX}author/10> ." in lines
    assert f"<{EX}book/2> <{EX}author> <{EX}author/20> ." in lines
    # NULL fk → no ref triple
    assert not any("book/3" in l and "author>" in l for l in lines)
    # parent map still emits its own triples
    assert f"<{EX}author/10> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <{EX}Author> ." in lines


def test_general_path_broadcast_join(ray_session):
    # parent subject over a NON-join column (slug) → requires real join
    cat = Catalog(root="", tables={"books": BOOKS, "authors": AUTHORS})
    spec = _spec(EX + "a/{slug}")
    lines = set(collect_ntriples(run_mapping(spec, cat)))
    assert f"<{EX}book/1> <{EX}author> <{EX}a/herman> ." in lines
    assert f"<{EX}book/2> <{EX}author> <{EX}a/toby> ." in lines
    assert not any("book/3" in l and f"<{EX}author>" in l for l in lines)


def test_same_table_no_join_condition(ray_session):
    # empty join ⇒ object = parent subject of the same row
    cat = Catalog(root="", tables={"books": BOOKS})
    spec = MappingSpec(
        base=EX,
        maps={
            "b1": TriplesMapSpec(
                name="b1",
                table="books",
                subject=TermMapSpec(kind="iri", template=EX + "book/{book_id}"),
                refs=(
                    RefObjectSpec(
                        pred=TermMapSpec(kind="iri", constant=EX + "self"),
                        parent="b2",
                        join=(),
                    ),
                ),
            ),
            "b2": TriplesMapSpec(
                name="b2",
                table="books",
                subject=TermMapSpec(kind="iri", template=EX + "node/{book_id}"),
            ),
        },
    )
    lines = set(collect_ntriples(run_mapping(spec, cat)))
    assert f"<{EX}book/2> <{EX}self> <{EX}node/2> ." in lines


def test_general_path_hash_join(ray_session):
    # force the big×big hash-join path with broadcast_limit=0
    cat = Catalog(root="", tables={"books": BOOKS, "authors": AUTHORS})
    spec = _spec(EX + "a/{slug}")
    lines = set(
        collect_ntriples(run_mapping(spec, cat, broadcast_limit=0, hash_join_partitions=2))
    )
    assert f"<{EX}book/1> <{EX}author> <{EX}a/herman> ." in lines
    assert f"<{EX}book/2> <{EX}author> <{EX}a/toby> ." in lines


def test_hash_join_types_match_duckdb(ray_session):
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from p5_rdf_rdb2rdf_ray.engine.joins import hash_join

    rng = np.random.default_rng(31)
    # unmatched rows on BOTH sides + duplicate keys on both sides
    left = pd.DataFrame(
        {"k": rng.integers(0, 30, 200), "lv": np.arange(200)}
    )
    right = pd.DataFrame(
        {"rk": rng.integers(15, 45, 150), "rv": np.arange(150) * 10}
    )
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    L = rd.from_pandas(left).repartition(4)
    R = rd.from_pandas(right).repartition(3)

    def norm(df):
        df = df[sorted(df.columns)]
        return (
            df.sort_values(list(df.columns), kind="mergesort")
            .reset_index(drop=True)
        )

    cases = {
        "inner": "SELECT k, lv, rv FROM l JOIN r ON k = rk",
        "left outer": "SELECT k, lv, rv FROM l LEFT JOIN r ON k = rk",
        "full outer": (
            "SELECT COALESCE(k, rk) AS k, lv, rv "
            "FROM l FULL JOIN r ON k = rk"
        ),
        "left semi": "SELECT k, lv FROM l WHERE k IN (SELECT rk FROM r)",
        "left anti": "SELECT k, lv FROM l WHERE k NOT IN (SELECT rk FROM r)",
    }
    for jt, sql in cases.items():
        out = hash_join(
            L, R, ["k"], ["rk"], num_partitions=4, join_type=jt
        ).to_pandas()
        ref = con.sql(sql).df()
        # nullable int64 → float64 via pandas on both sides; unify
        got, want = norm(out).astype("float64"), norm(ref).astype("float64")
        pd.testing.assert_frame_equal(got, want), jt

    with pytest.raises(ValueError):
        hash_join(L, R, ["k"], ["rk"], join_type="right outer")


def test_hash_join_salted_matches_unsalted(ray_session):
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from p5_rdf_rdb2rdf_ray.engine.joins import hash_join

    rng = np.random.default_rng(47)
    # pathological skew: 80% of left rows share ONE key
    k = np.where(rng.random(3000) < 0.8, 7, rng.integers(0, 40, 3000))
    left = pd.DataFrame({"k": k, "lv": np.arange(3000)})
    right = pd.DataFrame({"rk": np.arange(0, 25), "rv": np.arange(0, 25) * 10})
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    L = rd.from_pandas(left).repartition(4)
    R = rd.from_pandas(right).repartition(2)

    def norm(df):
        df = df[sorted(df.columns)].astype("float64")
        return df.sort_values(list(df.columns), kind="mergesort").reset_index(
            drop=True
        )

    for jt, sql in {
        "inner": "SELECT k, lv, rv FROM l JOIN r ON k = rk",
        "left outer": "SELECT k, lv, rv FROM l LEFT JOIN r ON k = rk",
        "left semi": "SELECT k, lv FROM l WHERE k IN (SELECT rk FROM r)",
        "left anti": "SELECT k, lv FROM l WHERE k NOT IN (SELECT rk FROM r)",
    }.items():
        out = hash_join(
            L, R, ["k"], ["rk"], num_partitions=6, join_type=jt, salt=4
        ).to_pandas()
        pd.testing.assert_frame_equal(norm(out), norm(con.sql(sql).df())), jt

    with pytest.raises(ValueError):
        hash_join(L, R, ["k"], ["rk"], join_type="full outer", salt=4)
    with pytest.raises(ValueError):
        hash_join(L, R, ["k"], ["rk"], salt=1)

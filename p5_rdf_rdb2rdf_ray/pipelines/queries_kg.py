"""KG / RDB2RDF-core registry entries (SURVEY §2.1–2.3): Direct Mapping,
R2RML, Turtle front-end, store lookups, BGP algebra. Builders + their
DuckDB oracle SQL twins; assembled in ``pipelines.queries``. Shared
helpers ``catalog_for`` / ``_read`` / IRI constants also live here.
"""

from __future__ import annotations

import ray.data as rd

from ..engine.lookup import count_statements, get_statements
from ..engine.runner import run_mapping
from ..mapping.direct import direct_mapping
from ..mapping.spec import (
    IRI,
    LITERAL,
    MappingSpec,
    PredObjSpec,
    RefObjectSpec,
    TermMapSpec,
    TriplesMapSpec,
)
from ..sinks.ntriples import to_term_columns
from ..sources.catalog import Catalog, TableLayout
from ..stages.groupagg import grouped_aggregate

BASE = "http://example.com/base/"
XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"
XSD_DT = "http://www.w3.org/2001/XMLSchema#dateTime"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def catalog_for(sf_dir: str) -> Catalog:
    """TPC-H-ish layouts: the declared-key stand-in for DBI introspection."""
    return Catalog(
        root=sf_dir,
        layouts={
            "region": TableLayout(pkey=("r_regionkey",)),
            "nation": TableLayout(
                pkey=("n_nationkey",),
                fkeys=((("n_regionkey",), "region", ("r_regionkey",)),),
            ),
            "customer": TableLayout(
                pkey=("c_custkey",),
                fkeys=((("c_nationkey",), "nation", ("n_nationkey",)),),
            ),
            "supplier": TableLayout(pkey=("s_suppkey",)),
            "part": TableLayout(pkey=("p_partkey",)),
            "orders": TableLayout(
                pkey=("o_orderkey",),
                fkeys=((("o_custkey",), "customer", ("c_custkey",)),),
            ),
            "events": TableLayout(
                pkey=("event_id",),
                fkeys=((("user_id",), "customer", ("c_custkey",)),),
            ),
            "documents": TableLayout(pkey=("doc_id",)),
            "embeddings": TableLayout(pkey=("vec_id",)),
        },
    )


def _read(sf_dir: str, table: str, columns=None) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


# ---------------------------------------------------------------------------
# KG / RDB2RDF core


def q_dm_nation(sf_dir: str) -> rd.Dataset:
    """Direct Mapping of nation (PK subject, literals, FK ref to region)."""
    cat = catalog_for(sf_dir)
    # full spec so the FK parent (region) resolves; execute only nation's map
    spec = direct_mapping(cat, tables=["nation", "region"], base=BASE)
    return to_term_columns(
        # distinct=False: DM output is duplicate-free by construction
        # (row-unique subjects × distinct predicates; engine/lookup.py)
        run_mapping(spec, cat, distinct=False, only_maps=["nation"])
    )


SQL_DM_NATION = f"""
SELECT subj, pred, obj FROM (
  SELECT '<{BASE}nation/n_nationkey=' || n_nationkey || '>' AS subj,
         '<{RDF_TYPE}>' AS pred, '<{BASE}nation>' AS obj FROM nation
  UNION ALL
  SELECT '<{BASE}nation/n_nationkey=' || n_nationkey || '>',
         '<{BASE}nation#n_nationkey>',
         '"' || n_nationkey || '"^^<{XSD_INT}>' FROM nation
  UNION ALL
  SELECT '<{BASE}nation/n_nationkey=' || n_nationkey || '>',
         '<{BASE}nation#n_name>', '"' || n_name || '"' FROM nation
  UNION ALL
  SELECT '<{BASE}nation/n_nationkey=' || n_nationkey || '>',
         '<{BASE}nation#n_regionkey>',
         '"' || n_regionkey || '"^^<{XSD_INT}>' FROM nation
  UNION ALL
  SELECT '<{BASE}nation/n_nationkey=' || n_nationkey || '>',
         '<{BASE}nation#ref-n_regionkey>',
         '<{BASE}region/r_regionkey=' || n_regionkey || '>' FROM nation
) t
"""


_TS_CANON = (
    "regexp_replace(strftime({col}, '%Y-%m-%dT%H:%M:%S.%f'), '\\.?0+$', '')"
)


def q_dm_events(sf_dir: str) -> rd.Dataset:
    """Direct Mapping of events: int64 PK, timestamp canon, FK→customer.

    The value/props columns are excluded (double/json lexical forms are
    checked by scalar unit tests, not the SQL oracle).
    """
    cat = catalog_for(sf_dir)
    spec = direct_mapping(cat, tables=["events", "customer"], base=BASE)
    tm = spec.maps["events"]
    keep = {"event_id", "ts", "user_id", "event_type"}
    from dataclasses import replace

    tm = replace(
        tm, pos=tuple(p for p in tm.pos if p.obj.column in keep)
    )
    spec = MappingSpec(
        maps={"events": tm, "customer": spec.maps["customer"]}, base=BASE
    )
    return to_term_columns(
        # distinct=False: DM duplicate-free by construction (lookup.py)
        run_mapping(spec, cat, distinct=False, only_maps=["events"])
    )


SQL_DM_EVENTS = f"""
SELECT subj, pred, obj FROM (
  SELECT '<{BASE}events/event_id=' || event_id || '>' AS subj,
         '<{RDF_TYPE}>' AS pred, '<{BASE}events>' AS obj FROM events
  UNION ALL
  SELECT '<{BASE}events/event_id=' || event_id || '>',
         '<{BASE}events#event_id>', '"' || event_id || '"^^<{XSD_INT}>'
  FROM events
  UNION ALL
  SELECT '<{BASE}events/event_id=' || event_id || '>',
         '<{BASE}events#ts>',
         '"' || {_TS_CANON.format(col='ts')} || '"^^<{XSD_DT}>' FROM events
  UNION ALL
  SELECT '<{BASE}events/event_id=' || event_id || '>',
         '<{BASE}events#user_id>', '"' || user_id || '"^^<{XSD_INT}>'
  FROM events
  UNION ALL
  SELECT '<{BASE}events/event_id=' || event_id || '>',
         '<{BASE}events#event_type>', '"' || event_type || '"' FROM events
  UNION ALL
  SELECT '<{BASE}events/event_id=' || event_id || '>',
         '<{BASE}events#ref-user_id>',
         '<{BASE}customer/c_custkey=' || user_id || '>' FROM events
) t
"""


def q_r2rml_orders(sf_dir: str) -> rd.Dataset:
    """R2RML-style mapping: template subject, constant predicates, literal
    + dateTime objects, refObjectMap to customer (join fast path)."""
    cat = catalog_for(sf_dir)
    order_subj = TermMapSpec(kind=IRI, template=BASE + "order/{o_orderkey}")
    cust_subj = TermMapSpec(kind=IRI, template=BASE + "customer/{c_custkey}")
    orders = TriplesMapSpec(
        name="orders",
        table="orders",
        subject=order_subj,
        classes=(BASE + "Order",),
        pos=(
            PredObjSpec(
                pred=TermMapSpec(kind=IRI, constant=BASE + "status"),
                obj=TermMapSpec(kind=LITERAL, column="o_orderstatus"),
            ),
            PredObjSpec(
                pred=TermMapSpec(kind=IRI, constant=BASE + "priority"),
                obj=TermMapSpec(kind=LITERAL, column="o_orderpriority"),
            ),
            PredObjSpec(
                pred=TermMapSpec(kind=IRI, constant=BASE + "orderDate"),
                obj=TermMapSpec(kind=LITERAL, column="o_orderdate"),
            ),
        ),
        refs=(
            RefObjectSpec(
                pred=TermMapSpec(kind=IRI, constant=BASE + "customer"),
                parent="customers",
                join=(("o_custkey", "c_custkey"),),
            ),
        ),
    )
    customers = TriplesMapSpec(
        name="customers", table="customer", subject=cust_subj,
        classes=(BASE + "Customer",),
    )
    spec = MappingSpec(maps={"orders": orders, "customers": customers}, base=BASE)
    # "auto" proves this spec duplicate-free at compile time (PK-covering
    # templates, distinct constant preds, disjoint subject spaces) and
    # skips the set-semantics shuffle — see engine.runner.is_duplicate_free
    return to_term_columns(run_mapping(spec, cat, distinct="auto"))


SQL_R2RML_ORDERS = f"""
SELECT subj, pred, obj FROM (
  SELECT '<{BASE}order/' || o_orderkey || '>' AS subj,
         '<{RDF_TYPE}>' AS pred, '<{BASE}Order>' AS obj FROM orders
  UNION ALL
  SELECT '<{BASE}order/' || o_orderkey || '>', '<{BASE}status>',
         '"' || o_orderstatus || '"' FROM orders
  UNION ALL
  SELECT '<{BASE}order/' || o_orderkey || '>', '<{BASE}priority>',
         '"' || o_orderpriority || '"' FROM orders
  UNION ALL
  SELECT '<{BASE}order/' || o_orderkey || '>', '<{BASE}orderDate>',
         '"' || {_TS_CANON.format(col='o_orderdate')} || '"^^<{XSD_DT}>'
  FROM orders
  UNION ALL
  SELECT '<{BASE}order/' || o_orderkey || '>', '<{BASE}customer>',
         '<{BASE}customer/' || o_custkey || '>' FROM orders
  UNION ALL
  SELECT DISTINCT '<{BASE}customer/' || c_custkey || '>',
         '<{RDF_TYPE}>', '<{BASE}Customer>' FROM customer
) t
"""


def q_lookup_nation(sf_dir: str) -> rd.Dataset:
    """Pushdown point lookup: all triples of one DM subject (21c)."""
    cat = catalog_for(sf_dir)
    return to_term_columns(
        get_statements(
            cat, subject=BASE + "nation/n_nationkey=3", base=BASE,
            distinct_buckets=2,
        )
    )


SQL_LOOKUP_NATION = SQL_DM_NATION.rstrip().rstrip(
    ""
) + " WHERE subj = '<" + BASE + "nation/n_nationkey=3>'"


def q_lookup_nation_by_value(sf_dir: str) -> rd.Dataset:
    """Bound-OBJECT pushdown lookup (Store parity, [R: DirectMapping/
    Store.pm :: get_statements with bound $o]): bound column predicate +
    literal object → parquet value-WHERE; plus a bound ref predicate +
    parent-node object → FK-column WHERE, unioned."""
    cat = catalog_for(sf_dir)
    by_val = get_statements(
        cat, predicate=BASE + "nation#n_name", obj_literal="NATION_3",
        base=BASE, distinct_buckets=2,
    )
    by_ref = get_statements(
        cat, predicate=BASE + "nation#ref-n_regionkey",
        obj=BASE + "region/r_regionkey=1", base=BASE, distinct_buckets=2,
    )
    return to_term_columns(by_val.union(by_ref))


SQL_LOOKUP_NATION_BY_VALUE = f"""
SELECT '<{BASE}nation/n_nationkey=' || n_nationkey || '>' AS subj,
       '<{BASE}nation#n_name>' AS pred, '"' || n_name || '"' AS obj
FROM nation WHERE n_name = 'NATION_3'
UNION ALL
SELECT '<{BASE}nation/n_nationkey=' || n_nationkey || '>',
       '<{BASE}nation#ref-n_regionkey>',
       '<{BASE}region/r_regionkey=' || n_regionkey || '>'
FROM nation WHERE n_regionkey = 1
"""


def q_bgp_nation_region(sf_dir: str) -> rd.Dataset:
    """Store get_pattern parity [R: DirectMapping/Store.pm :: get_pattern]:
    a 3-pattern BGP with shared variables — nations joined to their
    regions (IRI bindings) plus the region name (literal binding),
    restricted to region 1 by a bound literal."""
    from ..engine.lookup import get_pattern

    cat = catalog_for(sf_dir)
    return get_pattern(
        cat,
        [
            ("?n", BASE + "nation#ref-n_regionkey", "?r"),
            ("?r", BASE + "region#r_name", "?rn"),
            ("?n", BASE + "nation#n_regionkey", ("lit", "1")),
        ],
        base=BASE,
    )


SQL_BGP_NATION_REGION = f"""
SELECT '{BASE}nation/n_nationkey=' || n_nationkey AS n,
       '{BASE}region/r_regionkey=' || r_regionkey AS r,
       r_name AS rn
FROM nation JOIN region ON n_regionkey = r_regionkey
WHERE n_regionkey = 1
"""


def q_bgp_topk(sf_dir: str) -> rd.Dataset:
    """BGP + SPARQL solution modifiers (ORDER BY / LIMIT / OFFSET)
    [graft extension — the SELECT-query shape on top of the Store's
    get_pattern surface]: nations with their region names, ordered by
    nation name DESC, page 2 (LIMIT 7 OFFSET 3). Distributed as
    per-block prune + one tiny merge (no all-to-all sort); n_name is
    unique, so the page is deterministic."""
    from ..engine.lookup import get_pattern

    cat = catalog_for(sf_dir)
    return get_pattern(
        cat,
        [
            ("?n", BASE + "nation#n_name", "?nn"),
            ("?n", BASE + "nation#ref-n_regionkey", "?r"),
            ("?r", BASE + "region#r_name", "?rn"),
        ],
        base=BASE,
        order_by=[("?nn", "desc")],
        limit=7,
        offset=3,
    )


SQL_BGP_TOPK = f"""
SELECT '{BASE}nation/n_nationkey=' || n_nationkey AS n,
       n_name AS nn,
       '{BASE}region/r_regionkey=' || r_regionkey AS r,
       r_name AS rn
FROM nation JOIN region ON n_regionkey = r_regionkey
ORDER BY n_name DESC LIMIT 7 OFFSET 3
"""


def q_bgp_filter(sf_dir: str) -> rd.Dataset:
    """BGP + SPARQL-style FILTER over the bindings [graft extension]:
    customers joined to their nation node, a numeric filter on the
    nation-key literal (>= 15) and a lexical one on the market segment."""
    from ..engine.lookup import get_pattern

    cat = catalog_for(sf_dir)
    return get_pattern(
        cat,
        [
            ("?c", BASE + "customer#c_nationkey", "?nk"),
            ("?c", BASE + "customer#c_mktsegment", "?seg"),
            ("?c", BASE + "customer#ref-c_nationkey", "?n"),
        ],
        base=BASE,
        filters=[("?nk", ">=", 15), ("?seg", "==", "BUILDING")],
    )


SQL_BGP_FILTER = f"""
SELECT '{BASE}customer/c_custkey=' || c_custkey AS c,
       CAST(c_nationkey AS VARCHAR) AS nk,
       c_mktsegment AS seg,
       '{BASE}nation/n_nationkey=' || c_nationkey AS n
FROM customer
WHERE c_nationkey >= 15 AND c_mktsegment = 'BUILDING'
"""


def q_bgp_bind(sf_dir: str) -> rd.Dataset:
    """BGP + SPARQL BIND (§7.6) [graft extension]: customers with a
    computed ``?tag`` (UCASE(segment) ‖ "-" ‖ nationkey*2) and a
    computed ``?nlen`` (STRLEN of the name), then a FILTER over the
    BIND'd variable — exercising extend-before-filter scoping. Map-only
    (no extra shuffle beyond the BGP's own distinct)."""
    from ..engine.lookup import get_pattern

    cat = catalog_for(sf_dir)
    return get_pattern(
        cat,
        [
            ("?c", BASE + "customer#c_mktsegment", "?seg"),
            ("?c", BASE + "customer#c_nationkey", "?nk"),
            ("?c", BASE + "customer#c_name", "?nm"),
        ],
        base=BASE,
        bind=[
            ("?tag", ("concat", ("ucase", "?seg"), "-", ("*", "?nk", 2))),
            ("?nlen", ("strlen", "?nm")),
        ],
        filters=[("?nlen", ">=", 18), ("?seg", "==", "MACHINERY")],
    )


SQL_BGP_BIND = f"""
SELECT '{BASE}customer/c_custkey=' || c_custkey AS c,
       c_mktsegment AS seg,
       CAST(c_nationkey AS VARCHAR) AS nk,
       c_name AS nm,
       UPPER(c_mktsegment) || '-' || CAST(c_nationkey * 2 AS VARCHAR) AS tag,
       CAST(LENGTH(c_name) AS VARCHAR) AS nlen
FROM customer
WHERE LENGTH(c_name) >= 18 AND c_mktsegment = 'MACHINERY'
"""


def _nation_region_store(sf_dir: str) -> str:
    """Materialize (resumably) the nation+region DM triples as a
    bucket-partitioned store under /tmp; a repeat run with the same
    input fingerprint skips the write. Shared by the store-served
    query entries."""
    import hashlib
    import os
    import tempfile

    from ..sinks.triplestore import fingerprint_files, write_triplestore

    cat = catalog_for(sf_dir)
    spec = direct_mapping(cat, tables=["nation", "region"], base=BASE)
    fp = fingerprint_files(cat.files("nation") + cat.files("region"))
    out = os.path.join(
        tempfile.gettempdir(),
        "p5kg_bgp_store_"
        + hashlib.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:12],
    )
    write_triplestore(
        run_mapping(
            # distinct=False: the store sink dedups in its bucket shuffle
            spec, cat, distinct=False, only_maps=["nation", "region"]
        ),
        out,
        num_buckets=8,
        input_fp=fp,
    )
    return out


def q_bgp_store(sf_dir: str) -> rd.Dataset:
    """The same BGP as bgp_nation_region, but served from the
    MATERIALIZED triple store: DM triples for nation+region are written
    to a bucket-partitioned store first (resumable — a repeat run with
    the same input fingerprint skips the write), then
    :func:`get_pattern_store` plans each pattern with bucket pruning +
    parquet filter pushdown. Same oracle as bgp_nation_region."""
    from ..engine.lookup import get_pattern_store

    out = _nation_region_store(sf_dir)
    return get_pattern_store(
        out,
        [
            ("?n", BASE + "nation#ref-n_regionkey", "?r"),
            ("?r", BASE + "region#r_name", "?rn"),
            ("?n", BASE + "nation#n_regionkey", ("lit", "1")),
        ],
    )


def q_describe_nation(sf_dir: str) -> rd.Dataset:
    """SPARQL DESCRIBE (Concise Bounded Description) served from the
    materialized store [graft extension]: the outgoing triples of two
    nodes (nation 3 + region 1) via bucket-pruned point lookups;
    blank-node closure exercises in pytest (DM emits no bnode objects)."""
    from ..engine.lookup import describe_store

    store = _nation_region_store(sf_dir)
    return to_term_columns(
        describe_store(
            store,
            [
                BASE + "nation/n_nationkey=3",
                BASE + "region/r_regionkey=1",
            ],
        )
    )


SQL_DESCRIBE_NATION = f"""
SELECT subj, pred, obj FROM (
  SELECT '<{BASE}nation/n_nationkey=' || n_nationkey || '>' AS subj,
         '<{RDF_TYPE}>' AS pred, '<{BASE}nation>' AS obj
  FROM nation WHERE n_nationkey = 3
  UNION ALL
  SELECT '<{BASE}nation/n_nationkey=' || n_nationkey || '>',
         '<{BASE}nation#n_nationkey>', '"' || n_nationkey || '"^^<{XSD_INT}>'
  FROM nation WHERE n_nationkey = 3
  UNION ALL
  SELECT '<{BASE}nation/n_nationkey=' || n_nationkey || '>',
         '<{BASE}nation#n_name>', '"' || n_name || '"'
  FROM nation WHERE n_nationkey = 3
  UNION ALL
  SELECT '<{BASE}nation/n_nationkey=' || n_nationkey || '>',
         '<{BASE}nation#n_regionkey>',
         '"' || n_regionkey || '"^^<{XSD_INT}>'
  FROM nation WHERE n_nationkey = 3
  UNION ALL
  SELECT '<{BASE}nation/n_nationkey=' || n_nationkey || '>',
         '<{BASE}nation#ref-n_regionkey>',
         '<{BASE}region/r_regionkey=' || n_regionkey || '>'
  FROM nation WHERE n_nationkey = 3
  UNION ALL
  SELECT '<{BASE}region/r_regionkey=' || r_regionkey || '>',
         '<{RDF_TYPE}>', '<{BASE}region>'
  FROM region WHERE r_regionkey = 1
  UNION ALL
  SELECT '<{BASE}region/r_regionkey=' || r_regionkey || '>',
         '<{BASE}region#r_regionkey>', '"' || r_regionkey || '"^^<{XSD_INT}>'
  FROM region WHERE r_regionkey = 1
  UNION ALL
  SELECT '<{BASE}region/r_regionkey=' || r_regionkey || '>',
         '<{BASE}region#r_name>', '"' || r_name || '"'
  FROM region WHERE r_regionkey = 1
) t
"""


def q_bgp_ask(sf_dir: str):
    """SPARQL ASK result form [graft extension]: two probes — one
    satisfiable BGP (a nation in region 1 whose region node carries a
    name) and one unsatisfiable (a region key outside the domain).
    ``ask`` plans the same BGP and stops at the first solution
    (``limit(1)`` → streaming early-exit)."""
    import pyarrow as _pa

    from ..engine.lookup import ask, get_pattern

    cat = catalog_for(sf_dir)

    def probe(regionkey: str) -> bool:
        return ask(
            get_pattern(
                cat,
                [
                    ("?n", BASE + "nation#ref-n_regionkey", "?r"),
                    ("?r", BASE + "region#r_name", "?rn"),
                    ("?n", BASE + "nation#n_regionkey", ("lit", regionkey)),
                ],
                base=BASE,
            )
        )

    return _pa.table(
        {
            "probe": ["neg", "pos"],
            "ask": [probe("999"), probe("1")],
        }
    )


SQL_BGP_ASK = """
SELECT 'neg' AS probe,
       EXISTS(SELECT 1 FROM nation JOIN region ON n_regionkey = r_regionkey
              WHERE n_regionkey = 999) AS ask
UNION ALL
SELECT 'pos',
       EXISTS(SELECT 1 FROM nation JOIN region ON n_regionkey = r_regionkey
              WHERE n_regionkey = 1)
"""


def q_path_seq_nation(sf_dir: str) -> rd.Dataset:
    """SPARQL §9.1 SEQUENCE path over the materialized store [graft
    extension — `stages.paths.eval_path`]:
    ``<nation#ref-n_regionkey>/<region#r_name>`` walks nation node →
    region node → region-name literal in one co-hash composition join
    (bag semantics, NT-formatted term endpoints)."""
    from ..stages.paths import eval_path

    store = _nation_region_store(sf_dir)
    return eval_path(
        store,
        f"<{BASE}nation#ref-n_regionkey>/<{BASE}region#r_name>",
        num_partitions=8,
    )


SQL_PATH_SEQ_NATION = f"""
SELECT '<{BASE}nation/n_nationkey=' || n_nationkey || '>' AS src,
       '"' || r_name || '"' AS dst
FROM nation JOIN region ON n_regionkey = r_regionkey
"""


def q_path_alt_region(sf_dir: str) -> rd.Dataset:
    """SPARQL §9.1 INVERSE + ALTERNATIVE path over the store:
    ``^<nation#ref-n_regionkey>|<region#r_name>`` — from a region node,
    backwards over the FK ref to its nations, unioned with its name
    literal (block union, no shuffle; duplicates preserved per spec)."""
    from ..stages.paths import eval_path

    store = _nation_region_store(sf_dir)
    return eval_path(
        store,
        f"^<{BASE}nation#ref-n_regionkey>|<{BASE}region#r_name>",
        num_partitions=8,
    )


SQL_PATH_ALT_REGION = f"""
SELECT '<{BASE}region/r_regionkey=' || n_regionkey || '>' AS src,
       '<{BASE}nation/n_nationkey=' || n_nationkey || '>' AS dst
FROM nation
UNION ALL
SELECT '<{BASE}region/r_regionkey=' || r_regionkey || '>',
       '"' || r_name || '"'
FROM region
"""


def q_path_star_nation(sf_dir: str) -> rd.Dataset:
    """SPARQL §9.1 ZERO-OR-MORE path ``<nation#ref-n_regionkey>*``:
    per §18.4 the zero-length part matches EVERY term in the graph
    (all subjects ∪ objects, streamed through one distinct shuffle),
    plus the path-doubling closure of the FK edges (here 1-hop: region
    nodes have no outgoing ref)."""
    from ..stages.paths import eval_path

    store = _nation_region_store(sf_dir)
    return eval_path(
        store, f"<{BASE}nation#ref-n_regionkey>*", num_partitions=8
    )


# zero-length part = every graph term paired with itself; the DM store
# over nation+region contains: row nodes, the two class IRIs, the typed
# integer literals and the plain name literals. UNION dedups identical
# literals exactly as the engine's distinct does.
SQL_PATH_STAR_NATION = f"""
WITH terms AS (
  SELECT '<{BASE}nation/n_nationkey=' || n_nationkey || '>' AS t FROM nation
  UNION
  SELECT '<{BASE}region/r_regionkey=' || r_regionkey || '>' FROM region
  UNION SELECT '<{BASE}nation>'
  UNION SELECT '<{BASE}region>'
  UNION SELECT '"' || n_nationkey || '"^^<{XSD_INT}>' FROM nation
  UNION SELECT '"' || n_regionkey || '"^^<{XSD_INT}>' FROM nation
  UNION SELECT '"' || r_regionkey || '"^^<{XSD_INT}>' FROM region
  UNION SELECT '"' || n_name || '"' FROM nation
  UNION SELECT '"' || r_name || '"' FROM region
)
SELECT t AS src, t AS dst FROM terms
UNION
SELECT '<{BASE}nation/n_nationkey=' || n_nationkey || '>',
       '<{BASE}region/r_regionkey=' || n_regionkey || '>'
FROM nation
"""


def q_bgp_path_star(sf_dir: str) -> rd.Dataset:
    """ZERO-OR-MORE path at the BGP surface (`get_pattern_store(paths=…)`
    with a ``*`` path and a BOUND object endpoint): per §18.4 the
    zero-length part pairs every graph term with itself, so the bound
    region node matches ITSELF (zero hops) in addition to the nations
    that reach it through the FK edge (one hop).  Pins the §18.4
    identity end-to-end through the store planner — `path_star_nation`
    pins the same semantics at the raw `eval_path` relation level."""
    from ..engine.lookup import get_pattern_store

    store = _nation_region_store(sf_dir)
    return get_pattern_store(
        store,
        [],
        paths=[
            (
                "?x",
                f"<{BASE}nation#ref-n_regionkey>*",
                f"{BASE}region/r_regionkey=1",
            )
        ],
    )


# zero hops: the bound region node itself; one hop: nations whose FK
# points at it. (Region nodes have no outgoing ref edge, so the closure
# stops at depth 1.)
SQL_BGP_PATH_STAR = f"""
SELECT '{BASE}region/r_regionkey=1' AS x
UNION
SELECT '{BASE}nation/n_nationkey=' || n_nationkey
FROM nation WHERE n_regionkey = 1
"""


def q_void_stats(sf_dir: str) -> rd.Dataset:
    """VoID-style per-predicate dataset statistics (`engine.void.
    void_statistics` over the materialized nation+region store): triple
    count + distinct subjects/objects per predicate — two keyed
    distinct shuffles + combiner-first counts, final predicate-sized
    merge."""
    from ..engine.void import void_statistics

    return void_statistics(_nation_region_store(sf_dir), num_partitions=4)


SQL_VOID_STATS = f"""
WITH t AS (
  SELECT '{RDF_TYPE}' AS pred,
         '{BASE}nation/n_nationkey=' || n_nationkey AS subj,
         '{BASE}nation' AS obj, 0 AS k FROM nation
  UNION ALL SELECT '{RDF_TYPE}',
         '{BASE}region/r_regionkey=' || r_regionkey, '{BASE}region', 0
  FROM region
  UNION ALL SELECT '{BASE}nation#n_nationkey',
         '{BASE}nation/n_nationkey=' || n_nationkey,
         CAST(n_nationkey AS VARCHAR), 2 FROM nation
  UNION ALL SELECT '{BASE}nation#n_name',
         '{BASE}nation/n_nationkey=' || n_nationkey, n_name, 2 FROM nation
  UNION ALL SELECT '{BASE}nation#n_regionkey',
         '{BASE}nation/n_nationkey=' || n_nationkey,
         CAST(n_regionkey AS VARCHAR), 2 FROM nation
  UNION ALL SELECT '{BASE}nation#ref-n_regionkey',
         '{BASE}nation/n_nationkey=' || n_nationkey,
         '{BASE}region/r_regionkey=' || n_regionkey, 0 FROM nation
  UNION ALL SELECT '{BASE}region#r_regionkey',
         '{BASE}region/r_regionkey=' || r_regionkey,
         CAST(r_regionkey AS VARCHAR), 2 FROM region
  UNION ALL SELECT '{BASE}region#r_name',
         '{BASE}region/r_regionkey=' || r_regionkey, r_name, 2 FROM region
)
SELECT pred, CAST(count(*) AS BIGINT) AS n_triples,
       CAST(count(DISTINCT subj) AS BIGINT) AS n_subjects,
       CAST(count(DISTINCT obj || '#' || k) AS BIGINT) AS n_objects
FROM t GROUP BY pred
"""


def q_path_dm_customer(sf_dir: str) -> rd.Dataset:
    """Property path over the Direct-Mapping VIRTUAL graph — NO
    materialized store: ``eval_path((catalog, base), …)`` compiles each
    path leaf to a single-column DM scan (`engine.lookup.
    get_statements` with the predicate bound), here the two-hop FK walk
    customer → nation → region as one sequence composition join."""
    from ..stages.paths import eval_path

    cat = catalog_for(sf_dir)
    return eval_path(
        (cat, BASE),
        f"<{BASE}customer#ref-c_nationkey>/<{BASE}nation#ref-n_regionkey>",
        num_partitions=8,
    )


SQL_PATH_DM_CUSTOMER = f"""
SELECT '<{BASE}customer/c_custkey=' || c_custkey || '>' AS src,
       '<{BASE}region/r_regionkey=' || n_regionkey || '>' AS dst
FROM customer JOIN nation ON c_nationkey = n_nationkey
"""


def q_bgp_path(sf_dir: str) -> rd.Dataset:
    """Property-path item COMPOSED with an ordinary triple pattern
    [graft extension — `get_pattern_store(paths=…)`]: ``?n <n_name> ?nm``
    joins on ``?n`` with the sequence path
    ``?n <ref-n_regionkey>/<region#r_name> ?rn`` — the path relation
    (one co-hash composition join) folds into the BGP like any other
    binding unit, endpoint term kinds derived statically."""
    from ..engine.lookup import get_pattern_store

    store = _nation_region_store(sf_dir)
    return get_pattern_store(
        store,
        [("?n", BASE + "nation#n_name", "?nm")],
        paths=[
            (
                "?n",
                f"<{BASE}nation#ref-n_regionkey>/<{BASE}region#r_name>",
                "?rn",
            )
        ],
    )


SQL_BGP_PATH = f"""
SELECT '{BASE}nation/n_nationkey=' || n_nationkey AS n,
       n_name AS nm, r_name AS rn
FROM nation JOIN region ON n_regionkey = r_regionkey
"""


def q_construct_from_path(sf_dir: str) -> rd.Dataset:
    """The full KG-enrichment loop over a PATH: sequence-path bindings
    (``?n <ref>/<r_name> ?rn`` — one composition join) instantiate a
    derived ``regionNamed`` edge via CONSTRUCT (zero joins, §10.2
    invalid-triple suppression), yielding store-ready TRIPLE_SCHEMA —
    paths, BGP units and CONSTRUCT composing end-to-end."""
    from ..engine.construct import construct
    from ..engine.lookup import get_pattern_store

    store = _nation_region_store(sf_dir)
    b = get_pattern_store(
        store,
        [],
        paths=[
            (
                "?n",
                f"<{BASE}nation#ref-n_regionkey>/<{BASE}region#r_name>",
                "?rn",
            )
        ],
        keep_kinds=True,
    )
    return to_term_columns(
        construct(b, [("?n", BASE + "regionNamed", "?rn")])
    )


SQL_CONSTRUCT_FROM_PATH = f"""
SELECT '<{BASE}nation/n_nationkey=' || n_nationkey || '>' AS subj,
       '<{BASE}regionNamed>' AS pred,
       '"' || r_name || '"' AS obj
FROM nation JOIN region ON n_regionkey = r_regionkey
"""


def q_bgp_optional(sf_dir: str) -> rd.Dataset:
    """BGP with an OPTIONAL (left-outer) group [graft extension]: every
    customer keeps its row; the nation-key binding appears only where
    the group's BUILDING-segment existence filter matches (NULL
    otherwise) — SPARQL-OPTIONAL-shaped over the Direct Mapping."""
    from ..engine.lookup import get_pattern

    cat = catalog_for(sf_dir)
    return get_pattern(
        cat,
        [("?c", BASE + "customer#c_custkey", "?k")],
        base=BASE,
        optional=[
            ("?c", BASE + "customer#c_mktsegment", ("lit", "BUILDING")),
            ("?c", BASE + "customer#c_nationkey", "?nk"),
        ],
    )


SQL_BGP_OPTIONAL = f"""
SELECT '{BASE}customer/c_custkey=' || c_custkey AS c,
       CAST(c_custkey AS VARCHAR) AS k,
       CASE WHEN c_mktsegment = 'BUILDING'
            THEN CAST(c_nationkey AS VARCHAR) END AS nk
FROM customer
"""


def q_bgp_union(sf_dir: str) -> rd.Dataset:
    """BGP UNION (alternation) [graft extension]: region-1 nations bind
    their name, region-2 nations bind their region node — solutions
    aligned on the variable union with NULLs where a group does not
    bind (SPARQL-UNION-shaped)."""
    from ..engine.lookup import get_pattern_union

    cat = catalog_for(sf_dir)
    return get_pattern_union(
        cat,
        [
            [
                ("?n", BASE + "nation#n_name", "?nn"),
                ("?n", BASE + "nation#n_regionkey", ("lit", "1")),
            ],
            [
                ("?n", BASE + "nation#ref-n_regionkey", "?r"),
                ("?n", BASE + "nation#n_regionkey", ("lit", "2")),
            ],
        ],
        base=BASE,
    )


SQL_BGP_UNION = f"""
SELECT '{BASE}nation/n_nationkey=' || n_nationkey AS n,
       n_name AS nn, CAST(NULL AS VARCHAR) AS r
FROM nation WHERE n_regionkey = 1
UNION
SELECT '{BASE}nation/n_nationkey=' || n_nationkey,
       CAST(NULL AS VARCHAR),
       '{BASE}region/r_regionkey=' || n_regionkey
FROM nation WHERE n_regionkey = 2
"""


def q_bgp_minus(sf_dir: str) -> rd.Dataset:
    """SPARQL negation over the BGP surface [graft extension — SPARQL
    1.1 §8 MINUS]: customers with NO fulfilled (status-F) order. The
    negation group is a 2-pattern star over orders (fused into ONE scan
    by the star planner); the shared variable ``?c`` binds in subject
    position on the required side and OBJECT position in the group, so
    the anti-join reconciles term-kind visibility by DERIVING the
    subject side's kind from the surface form — a literal spelling a
    customer IRI would not anti-match. Distribution: the group's
    distinct key projection broadcasts (Acero ``left anti`` per batch,
    no shuffle); past ``broadcast_limit`` it spills to the union-tag
    co-hash join."""
    from ..engine.lookup import get_pattern

    cat = catalog_for(sf_dir)
    return get_pattern(
        cat,
        [("?c", BASE + "customer#c_custkey", "?k")],
        base=BASE,
        minus=[
            ("?o", BASE + "orders#ref-o_custkey", "?c"),
            ("?o", BASE + "orders#o_orderstatus", ("lit", "F")),
        ],
    )


SQL_BGP_MINUS = f"""
SELECT '{BASE}customer/c_custkey=' || c_custkey AS c,
       CAST(c_custkey AS VARCHAR) AS k
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c_custkey AND o.o_orderstatus = 'F')
"""


def q_bgp_values(sf_dir: str) -> rd.Dataset:
    """SPARQL VALUES (inline data, §7.2) [graft extension]: the inline
    table enters the BGP fold as a pre-built binding unit with explicit
    term kinds — joined LAST so it broadcasts into the accumulator (a
    tiny Acero side), never forcing pattern sides through the driver.
    Nations restricted to two region names given inline as literals."""
    from ..engine.lookup import get_pattern

    cat = catalog_for(sf_dir)
    return get_pattern(
        cat,
        [
            ("?n", BASE + "nation#ref-n_regionkey", "?r"),
            ("?r", BASE + "region#r_name", "?rn"),
        ],
        base=BASE,
        values=(["?rn"], [(("lit", "ASIA"),), (("lit", "EUROPE"),)]),
    )


SQL_BGP_VALUES = f"""
SELECT '{BASE}nation/n_nationkey=' || n_nationkey AS n,
       '{BASE}region/r_regionkey=' || r_regionkey AS r,
       r_name AS rn
FROM nation JOIN region ON n_regionkey = r_regionkey
WHERE r_name IN ('ASIA', 'EUROPE')
"""


def q_bgp_construct(sf_dir: str) -> rd.Dataset:
    """SPARQL-CONSTRUCT-shaped KG enrichment [graft extension — SPARQL
    1.1 §10.2]: derive NEW edges absent from the source mapping.  BGP
    bindings (customer → nation → region, kinds kept) instantiate three
    templates per solution — a derived ``inRegion`` edge (collapsing
    the 2-hop FK chain), a class assertion and a constant literal —
    batch-wise with zero joins; set semantics in one distinct shuffle.
    The constructed Dataset is full TRIPLE_SCHEMA: it feeds the store /
    N-Triples / Turtle sinks like any mapping output."""
    from ..engine.construct import construct
    from ..engine.lookup import get_pattern

    cat = catalog_for(sf_dir)
    b = get_pattern(
        cat,
        [
            ("?c", BASE + "customer#ref-c_nationkey", "?n"),
            ("?n", BASE + "nation#ref-n_regionkey", "?r"),
        ],
        base=BASE,
        keep_kinds=True,
    )
    return to_term_columns(
        construct(
            b,
            [
                ("?c", BASE + "inRegion", "?r"),
                ("?c", RDF_TYPE, BASE + "RegionalCustomer"),
                ("?c", BASE + "note", ("lit", "derived")),
            ],
        )
    )


SQL_BGP_CONSTRUCT = f"""
SELECT '<{BASE}customer/c_custkey=' || c_custkey || '>' AS subj,
       '<{BASE}inRegion>' AS pred,
       '<{BASE}region/r_regionkey=' || n_regionkey || '>' AS obj
FROM customer JOIN nation ON c_nationkey = n_nationkey
UNION ALL
SELECT '<{BASE}customer/c_custkey=' || c_custkey || '>',
       '<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>',
       '<{BASE}RegionalCustomer>'
FROM customer JOIN nation ON c_nationkey = n_nationkey
UNION ALL
SELECT '<{BASE}customer/c_custkey=' || c_custkey || '>',
       '<{BASE}note>', '"derived"'
FROM customer JOIN nation ON c_nationkey = n_nationkey
"""


def q_bgp_aggregate(sf_dir: str) -> rd.Dataset:
    """SPARQL GROUP-BY-shaped composition [graft extension]: BGP
    bindings (customer → nation node) feed the engine's combiner-first
    grouped aggregate directly — the query surfaces compose; nothing
    special-cased."""
    from ..engine.lookup import get_pattern

    cat = catalog_for(sf_dir)
    bindings = get_pattern(
        cat,
        [("?c", BASE + "customer#ref-c_nationkey", "?n")],
        base=BASE,
    )
    return grouped_aggregate(
        bindings, keys=["n"], aggs={"n_customers": ("c", "count")},
        num_partitions=8,
    )


SQL_BGP_AGGREGATE = f"""
SELECT '{BASE}nation/n_nationkey=' || c_nationkey AS n,
       CAST(count(*) AS BIGINT) AS n_customers
FROM customer GROUP BY 1
"""


def q_bgp_group_concat(sf_dir: str) -> rd.Dataset:
    """SPARQL GROUP_CONCAT over BGP bindings [graft extension]: nation
    names per region node, ordered alphabetically inside each group —
    the query surfaces compose (`get_pattern` → `grouped_concat`), no
    special cases."""
    from ..engine.lookup import get_pattern
    from ..stages.groupagg import grouped_concat

    cat = catalog_for(sf_dir)
    bindings = get_pattern(
        cat,
        [
            ("?n", BASE + "nation#ref-n_regionkey", "?r"),
            ("?n", BASE + "nation#n_name", "?nn"),
        ],
        base=BASE,
    )
    return grouped_concat(
        bindings, keys=["r"], col="nn", sep=",", order_by=["nn"],
        out="names", num_partitions=4,
    )


SQL_BGP_GROUP_CONCAT = f"""
SELECT '{BASE}region/r_regionkey=' || n_regionkey AS r,
       string_agg(n_name, ',' ORDER BY n_name) AS names
FROM nation GROUP BY n_regionkey
"""


def q_bgp_having(sf_dir: str) -> rd.Dataset:
    """SPARQL HAVING + subquery composition [graft extension]: an inner
    GROUP-BY (customers per nation node) filters to above-average
    groups (HAVING), and the SURVIVING nodes feed the OUTER BGP as
    VALUES inline data — the subquery-into-BGP shape. The aggregate
    result is ≤ #nations rows, so the driver collect is the documented
    tiny-side broadcast, not a scale hazard; counts re-attach map-only."""
    import pyarrow as _pa

    from ..engine.lookup import get_pattern

    cat = catalog_for(sf_dir)
    agg = grouped_aggregate(
        get_pattern(
            cat,
            [("?c", BASE + "customer#ref-c_nationkey", "?n")],
            base=BASE,
        ),
        keys=["n"],
        aggs={"n_customers": ("c", "count")},
        num_partitions=8,
    ).to_pandas()
    thr = agg["n_customers"].sum() / len(agg)
    keep = agg[agg["n_customers"] > thr]
    out = get_pattern(
        cat,
        [("?n", BASE + "nation#n_name", "?nn")],
        base=BASE,
        values=(["?n"], [(x,) for x in keep["n"]]),
    )
    cmap = dict(zip(keep["n"], keep["n_customers"].astype("int64")))

    def attach(t: _pa.Table) -> _pa.Table:
        return t.append_column(
            "n_customers",
            _pa.array([cmap[x] for x in t.column("n").to_pylist()],
                      _pa.int64()),
        )

    return out.map_batches(attach, batch_format="pyarrow")


SQL_BGP_HAVING = f"""
WITH g AS (
  SELECT c_nationkey, count(*) AS n_customers
  FROM customer GROUP BY c_nationkey
),
k AS (
  SELECT * FROM g
  WHERE n_customers > (SELECT avg(n_customers) FROM g)
)
SELECT '{BASE}nation/n_nationkey=' || k.c_nationkey AS n,
       nat.n_name AS nn,
       CAST(k.n_customers AS BIGINT) AS n_customers
FROM k JOIN nation nat ON nat.n_nationkey = k.c_nationkey
"""


def _nation_ctx_store(sf_dir: str) -> str:
    """Materialize (resumably) the rr:graphMap quads of
    ``_NATION_GRAPH_TTL`` as a bucket-partitioned store under /tmp —
    the named-graph fixture shared by ``store_contexts`` and the GRAPH
    scope entry."""
    import hashlib
    import os
    import tempfile

    from ..mapping.r2rml import compile_r2rml
    from ..sinks.triplestore import fingerprint_files, write_triplestore

    cat = catalog_for(sf_dir)
    spec = compile_r2rml(_NATION_GRAPH_TTL, base=BASE)
    fp = fingerprint_files(cat.files("nation"))
    out = os.path.join(
        tempfile.gettempdir(),
        "p5kg_ctx_store_"
        + hashlib.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:12],
    )
    write_triplestore(
        # distinct=False: the store sink dedups in its bucket shuffle
        run_mapping(spec, cat, distinct=False), out, num_buckets=4,
        input_fp=fp,
    )
    return out


def q_store_contexts(sf_dir: str) -> rd.Dataset:
    """Store ``get_contexts`` parity [R: DirectMapping/Store.pm — the
    RDF::Trine::Store interface]: write the rr:graphMap quads of
    ``_NATION_GRAPH_TTL`` to a bucket-partitioned store (resumable —
    identical input fingerprint skips the write), then list the distinct
    named graphs. Default-graph quads (null graph) are not contexts."""
    from ..sinks.triplestore import store_contexts

    return store_contexts(_nation_ctx_store(sf_dir))


def q_sparql_graph_store(sf_dir: str) -> rd.Dataset:
    """SPARQL GRAPH scope over a quad store: the textual
    ``GRAPH <gNames> { … }`` wrapper restricts every pattern to one
    named context — pushed as a parquet row filter into the store star
    scans (`_store_star_groups(graph=…)`), never a post-filter."""
    from ..engine.sparql import sparql

    return sparql(
        _nation_ctx_store(sf_dir),
        f"""
        SELECT ?n ?nm WHERE {{
          GRAPH <{BASE}gNames> {{ ?n <{BASE}name> ?nm }}
        }} ORDER BY ?nm
        """,
    )


SQL_SPARQL_GRAPH_STORE = f"""
SELECT '{BASE}nation-g/' || n_nationkey AS n, n_name AS nm
FROM nation ORDER BY nm
"""


def q_sparql_graph_var(sf_dir: str) -> rd.Dataset:
    """``GRAPH ?var`` [SPARQL §13.3] over a quad store: every pattern
    becomes a QUAD pattern — the store's graph column binds ``?g``
    directly (named contexts only; no per-context fan-out, so the plan
    is one distributed scan + grouped count regardless of how many
    contexts exist). The region POM quads live in gMeta, one
    graph/{{rk}} context per region, and the nil (default) graph —
    the last must NOT appear in the result."""
    from ..engine.sparql import sparql

    return sparql(
        _nation_ctx_store(sf_dir),
        f"""
        SELECT ?g (COUNT(?n) AS ?c) WHERE {{
          GRAPH ?g {{ ?n <{BASE}region> ?r }}
        }} GROUP BY ?g ORDER BY ?g
        """,
    )


# region quads: every nation row in gMeta + its graph/{rk} context;
# rr:defaultGraph rows carry NULL graph and are excluded by GRAPH ?var.
SQL_SPARQL_GRAPH_VAR = f"""
SELECT g, c FROM (
  SELECT '{BASE}gMeta' AS g, CAST(count(*) AS BIGINT) AS c FROM nation
  UNION ALL
  SELECT '{BASE}graph/' || n_regionkey, CAST(count(*) AS BIGINT)
  FROM nation GROUP BY n_regionkey
) t ORDER BY g
"""


# Named contexts = the two constant graphs + one template graph per
# distinct n_regionkey; rr:defaultGraph quads carry a NULL graph and are
# excluded by get_contexts semantics.
SQL_STORE_CONTEXTS = f"""
SELECT graph FROM (
  SELECT '{BASE}gMeta' AS graph
  UNION ALL SELECT '{BASE}gNames'
  UNION ALL SELECT DISTINCT '{BASE}graph/' || n_regionkey FROM nation
) t
"""


def q_count_statements(sf_dir: str):
    """Store ``count_statements`` parity: per-pattern triple counts as a
    small table (subject-bound, predicate-bound, unbound)."""
    import pyarrow as pa

    cat = catalog_for(sf_dir)
    n_subj = count_statements(
        cat, subject=BASE + "nation/n_nationkey=3", base=BASE
    )
    n_pred = count_statements(
        cat, predicate=BASE + "nation#n_name", base=BASE
    )
    return pa.table(
        {
            "pattern": pa.array(["subject_bound", "predicate_bound"]),
            "n": pa.array([n_subj, n_pred], pa.int64()),
        }
    )


# a DM nation row emits 5 triples: rdf:type + 3 column literals + 1 FK ref
SQL_COUNT_STATEMENTS = """
SELECT 'subject_bound' AS pattern, CAST(count(*) * 5 AS BIGINT) AS n
FROM nation WHERE n_nationkey = 3
UNION ALL
SELECT 'predicate_bound', CAST(count(*) AS BIGINT) FROM nation
"""


def q_r2rml_sqlquery(sf_dir: str) -> rd.Dataset:
    """R2RML ``rr:sqlQuery`` logical table (SURVEY §2 #2): an arbitrary
    SQL view as the triples-map source (big-customer slice)."""
    cat = catalog_for(sf_dir)
    view = TriplesMapSpec(
        name="bigcust",
        table="__sql__",
        sql="SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 5000",
        subject=TermMapSpec(kind=IRI, template=BASE + "bigcustomer/{c_custkey}"),
        classes=(BASE + "BigCustomer",),
        pos=(
            PredObjSpec(
                pred=TermMapSpec(kind=IRI, constant=BASE + "name"),
                obj=TermMapSpec(kind=LITERAL, column="c_name"),
            ),
        ),
    )
    spec = MappingSpec(maps={"bigcust": view}, base=BASE)
    return to_term_columns(run_mapping(spec, cat, distinct_buckets=4))


# the reference's primary entry point is a Turtle mapping doc
# [R: R2RML.pm :: new]; this entry drives compile_r2rml + rr:graphMap
# end-to-end through the DuckDB gate (quads: subj/pred/obj/graph columns)
_NATION_GRAPH_TTL = f"""
@prefix rr: <http://www.w3.org/ns/r2rml#> .
@prefix ex: <{BASE}> .

<#NationMap>
  rr:logicalTable [ rr:tableName "nation" ];
  rr:subjectMap [
      rr:template "{BASE}nation-g/{{n_nationkey}}";
      rr:class ex:Nation;
      rr:graphMap [ rr:constant ex:gMeta ];
  ];
  rr:predicateObjectMap [
      rr:predicate ex:name;
      rr:objectMap [ rr:column "n_name"; rr:language "en" ];
      rr:graphMap [ rr:constant ex:gNames ];
  ];
  rr:predicateObjectMap [
      rr:predicate ex:region;
      rr:objectMap [ rr:template "{BASE}region-g/{{n_regionkey}}" ];
      rr:graphMap [ rr:template "{BASE}graph/{{n_regionkey}}" ];
      rr:graphMap [ rr:constant rr:defaultGraph ];
  ] .
"""


def q_r2rml_turtle_graph(sf_dir: str) -> rd.Dataset:
    """Turtle front-end end-to-end (SURVEY §3.1) with rr:graphMap quads:
    parse an actual ``rr:`` mapping doc, run it, emit the graph column.
    W3C §11.1 UNION semantics exercised: class triples → subject graph
    (gMeta); name POM → {gMeta, gNames}; region POM → {gMeta,
    graph/{{rk}}, explicit rr:defaultGraph} — 1+2+3 = 6 quads per row."""
    from ..mapping.r2rml import compile_r2rml

    cat = catalog_for(sf_dir)
    spec = compile_r2rml(_NATION_GRAPH_TTL, base=BASE)
    return to_term_columns(
        run_mapping(spec, cat, distinct_buckets=4), with_graph=True
    )


SQL_R2RML_TURTLE_GRAPH = f"""
SELECT subj, pred, obj, graph FROM (
  SELECT '<{BASE}nation-g/' || n_nationkey || '>' AS subj,
         '<{RDF_TYPE}>' AS pred, '<{BASE}Nation>' AS obj,
         '<{BASE}gMeta>' AS graph
  FROM nation
  UNION ALL
  SELECT '<{BASE}nation-g/' || n_nationkey || '>', '<{BASE}name>',
         '"' || n_name || '"@en', g
  FROM nation, (VALUES ('<{BASE}gMeta>'), ('<{BASE}gNames>')) AS gs(g)
  UNION ALL
  SELECT '<{BASE}nation-g/' || n_nationkey || '>', '<{BASE}region>',
         '<{BASE}region-g/' || n_regionkey || '>',
         '<{BASE}gMeta>'
  FROM nation
  UNION ALL
  SELECT '<{BASE}nation-g/' || n_nationkey || '>', '<{BASE}region>',
         '<{BASE}region-g/' || n_regionkey || '>',
         '<{BASE}graph/' || n_regionkey || '>'
  FROM nation
  UNION ALL
  SELECT '<{BASE}nation-g/' || n_nationkey || '>', '<{BASE}region>',
         '<{BASE}region-g/' || n_regionkey || '>',
         CAST(NULL AS VARCHAR)
  FROM nation
) t
"""


# rr:inverseExpression point lookup (W3C-R2RML §7.7): the subject term is
# inverted against the template, the inverse expression instantiated with
# the recovered value and used as a WHERE over the rr:sqlQuery logical
# table — seeing through the string concatenation no plain equality
# filter could [R: R2RML.pm accepts rr:inverseExpression on term maps].
_INVERSE_TTL = f"""
@prefix rr: <http://www.w3.org/ns/r2rml#> .
@prefix ex: <{BASE}> .

<#SuppCode>
  rr:logicalTable [ rr:sqlQuery \"\"\"
    SELECT s_suppkey, 'SUP-' || CAST(s_suppkey AS VARCHAR) AS code, s_name
    FROM supplier
  \"\"\" ];
  rr:subjectMap [
      rr:template "{BASE}sup/{{code}}";
      rr:inverseExpression
        "{{s_suppkey}} = CAST(substr({{code}}, 5) AS INTEGER)";
  ];
  rr:predicateObjectMap [
      rr:predicate ex:name;
      rr:objectMap [ rr:column "s_name" ];
  ].
"""


def q_r2rml_inverse_lookup(sf_dir: str) -> rd.Dataset:
    """Bound-subject point lookup over an R2RML mapping whose subject is a
    DERIVED column (engine.lookup.r2rml_lookup + rr:inverseExpression)."""
    from ..engine.lookup import r2rml_lookup
    from ..mapping.r2rml import compile_r2rml

    cat = catalog_for(sf_dir)
    spec = compile_r2rml(_INVERSE_TTL, base=BASE)
    return to_term_columns(
        r2rml_lookup(spec, cat, BASE + "sup/SUP-3", distinct_buckets=2)
    )


SQL_R2RML_INVERSE_LOOKUP = f"""
SELECT '<{BASE}sup/SUP-' || s_suppkey || '>' AS subj,
       '<{BASE}name>' AS pred,
       '"' || s_name || '"' AS obj
FROM supplier WHERE s_suppkey = 3
"""


SQL_R2RML_SQLQUERY = f"""
SELECT subj, pred, obj FROM (
  SELECT '<{BASE}bigcustomer/' || c_custkey || '>' AS subj,
         '<{RDF_TYPE}>' AS pred, '<{BASE}BigCustomer>' AS obj
  FROM customer WHERE c_acctbal > 5000
  UNION ALL
  SELECT '<{BASE}bigcustomer/' || c_custkey || '>', '<{BASE}name>',
         '"' || c_name || '"'
  FROM customer WHERE c_acctbal > 5000
) t
"""




# ---------------------------------------------------------------------------
# SPARQL text front-end (engine/sparql.py): the registry entries whose
# INPUT is a query STRING — parser → existing BGP algebra, zero new
# execution machinery [R: Store.pm delegates query strings to
# RDF::Query — recalled; these entries are the analogous surface].
# ---------------------------------------------------------------------------

def q_sparql_select(sf_dir: str) -> rd.Dataset:
    """Textual SELECT over the Direct-Mapping virtual graph: two-pattern
    star + FK join, FILTER, DISTINCT projection, ORDER BY + LIMIT — the
    parser compiles to exactly the `get_pattern` call `bgp_topk`-class
    entries make programmatically (star fusion + pushdown included)."""
    from ..engine.sparql import sparql

    return sparql(
        catalog_for(sf_dir),
        f"""
        SELECT DISTINCT ?nm ?rn WHERE {{
          ?n <{BASE}nation#n_name> ?nm ;
             <{BASE}nation#ref-n_regionkey> ?r .
          ?r <{BASE}region#r_name> ?rn .
          FILTER(?nm > "NATION_1")
        }} ORDER BY ?nm LIMIT 12
        """,
        base=BASE,
    )


SQL_SPARQL_SELECT = """
SELECT n_name AS nm, r_name AS rn
FROM nation JOIN region ON n_regionkey = r_regionkey
WHERE n_name > 'NATION_1'
ORDER BY nm LIMIT 12
"""


def q_sparql_builtins(sf_dir: str) -> rd.Dataset:
    """§17.4 built-ins end-to-end over the DM virtual graph: STRAFTER /
    ROUND (xpath ties-up) / ENCODE_FOR_URI / CONCAT in BIND plus the
    isLiteral/isIRI/isNumeric term tests in FILTER (all three are
    tautologies over this data — they must not drop rows)."""
    from ..engine.sparql import sparql

    return sparql(
        catalog_for(sf_dir),
        f"""
        SELECT ?nm ?suf ?r ?e WHERE {{
          ?n <{BASE}nation#n_name> ?nm ;
             <{BASE}nation#n_nationkey> ?k .
          FILTER(isLiteral(?nm) && isIRI(?n) && isNumeric(?k))
          BIND(STRAFTER(?nm, "_") AS ?suf)
          BIND(ROUND(?k / 2) AS ?r)
          BIND(ENCODE_FOR_URI(CONCAT(?nm, "/x")) AS ?e)
        }} ORDER BY ?nm
        """,
        base=BASE,
    )


# n_name is 'NATION_<k>' (suffix starts at char 8); ROUND is xpath
# fn:round (ties toward +inf) = floor(x + 0.5); '/' percent-encodes,
# the name's [A-Z0-9_] chars are RFC3986-unreserved and pass through.
SQL_SPARQL_BUILTINS = """
SELECT n_name AS nm,
       substr(n_name, 8) AS suf,
       CAST(CAST(floor(n_nationkey / 2.0 + 0.5) AS BIGINT) AS VARCHAR) AS r,
       n_name || '%2Fx' AS e
FROM nation ORDER BY nm
"""


def q_sparql_datetime(sf_dir: str) -> rd.Dataset:
    """§17.4.5 date/time accessors (YEAR/MONTH/DAY/HOURS/MINUTES) in
    BIND over the events ``ts`` dateTime literals of the DM virtual
    graph — the accessor family a transcript pipeline uses to bucket
    turns by wall-clock. Evaluated on the LEXICAL form (one vectorized
    regex per batch), no datetime-object round-trip."""
    from ..engine.sparql import sparql

    return sparql(
        catalog_for(sf_dir),
        f"""
        SELECT ?e ?y ?mo ?d ?h WHERE {{
          ?e <{BASE}events#ts> ?ts ;
             <{BASE}events#event_type> "purchase" .
          BIND(YEAR(?ts) AS ?y) BIND(MONTH(?ts) AS ?mo)
          BIND(DAY(?ts) AS ?d) BIND(HOURS(?ts) AS ?h)
        }}
        """,
        base=BASE,
    )


SQL_SPARQL_DATETIME = f"""
SELECT '{BASE}events/event_id=' || event_id AS e,
       CAST(EXTRACT(YEAR FROM ts) AS VARCHAR) AS y,
       CAST(EXTRACT(MONTH FROM ts) AS VARCHAR) AS mo,
       CAST(EXTRACT(DAY FROM ts) AS VARCHAR) AS d,
       CAST(EXTRACT(HOUR FROM ts) AS VARCHAR) AS h
FROM events WHERE event_type = 'purchase'
"""


def q_sparql_hash(sf_dir: str) -> rd.Dataset:
    """§17.4.6 hash built-ins MD5 / SHA256 in BIND (content
    fingerprinting at the SPARQL surface); digests are of the UTF-8
    lexical form, row-local inside each batch."""
    from ..engine.sparql import sparql

    return sparql(
        catalog_for(sf_dir),
        f"""
        SELECT ?nm ?h5 ?h256 WHERE {{
          ?n <{BASE}nation#n_name> ?nm .
          BIND(MD5(?nm) AS ?h5) BIND(SHA256(?nm) AS ?h256)
        }} ORDER BY ?nm
        """,
        base=BASE,
    )


SQL_SPARQL_HASH = """
SELECT n_name AS nm, md5(n_name) AS h5, sha256(n_name) AS h256
FROM nation ORDER BY nm
"""


def q_sparql_bnode(sf_dir: str) -> rd.Dataset:
    """Blank nodes in triple patterns (§4.1.4 — non-distinguished
    variables): a nested ``[ … ]`` property list spanning the
    nation→region FK join. The two anonymous nodes join like variables
    and stay out of the projection."""
    from ..engine.sparql import sparql

    return sparql(
        catalog_for(sf_dir),
        f"""
        SELECT ?nm ?rn WHERE {{
          [ <{BASE}nation#n_name> ?nm ;
            <{BASE}nation#ref-n_regionkey>
              [ <{BASE}region#r_name> ?rn ] ] .
        }} ORDER BY ?nm
        """,
        base=BASE,
    )


SQL_SPARQL_BNODE = """
SELECT n_name AS nm, r_name AS rn
FROM nation JOIN region ON n_regionkey = r_regionkey
ORDER BY nm
"""


def q_sparql_var_pred(sf_dir: str) -> rd.Dataset:
    """Textual VARIABLE-PREDICATE pattern (``?s ?p ?o`` — SPARQL §19.8
    Verb := VarOrIri): per-predicate triple counts over the nation
    subjects of the Direct-Mapping virtual graph. The unbound predicate
    enumerates every column-predicate + the FK ref + rdf:type; the
    bound ``n_name`` star pattern prunes the scan to one table before
    the wildcard expands, so the wildcard never touches the other
    catalog tables."""
    from ..engine.sparql import sparql

    return sparql(
        catalog_for(sf_dir),
        f"""
        SELECT ?p (COUNT(?s) AS ?n) WHERE {{
          ?s <{BASE}nation#n_name> ?nm .
          ?s ?p ?o
        }} GROUP BY ?p ORDER BY ?p
        """,
        base=BASE,
    )


SQL_SPARQL_VAR_PRED = f"""
SELECT p, COUNT(*) AS n FROM (
  SELECT '{BASE}nation#n_name' AS p FROM nation WHERE n_name IS NOT NULL
  UNION ALL
  SELECT '{BASE}nation#n_nationkey' FROM nation WHERE n_nationkey IS NOT NULL
  UNION ALL
  SELECT '{BASE}nation#n_regionkey' FROM nation WHERE n_regionkey IS NOT NULL
  UNION ALL
  SELECT '{BASE}nation#ref-n_regionkey' FROM nation
  WHERE n_regionkey IS NOT NULL
  UNION ALL
  SELECT 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' FROM nation
) GROUP BY p ORDER BY p
"""


def q_sparql_agg(sf_dir: str) -> rd.Dataset:
    """Textual GROUP BY + COUNT + HAVING + ORDER BY: the parser routes
    the aggregate through the combiner-first `grouped_aggregate` and
    filters the aggregated column with a vectorized Arrow mask."""
    from ..engine.sparql import sparql

    return sparql(
        catalog_for(sf_dir),
        f"""
        SELECT ?n (COUNT(?c) AS ?n_customers) WHERE {{
          ?c <{BASE}customer#ref-c_nationkey> ?n
        }} GROUP BY ?n HAVING(COUNT(?c) >= 3) ORDER BY ?n
        """,
        base=BASE,
    )


SQL_SPARQL_AGG = f"""
SELECT '{BASE}nation/n_nationkey=' || c_nationkey AS n,
       CAST(count(*) AS BIGINT) AS n_customers
FROM customer GROUP BY 1 HAVING count(*) >= 3 ORDER BY n
"""


def q_sparql_count_distinct(sf_dir: str) -> rd.Dataset:
    """Textual ``COUNT(DISTINCT ?v)`` (SPARQL §18.5 set-function COUNT
    with DISTINCT): distinct nation nodes per market segment over the
    DM virtual graph — routed through the pair-shuffle
    `grouped_count_distinct` (per-block dedupe combiner, ONE keyed
    shuffle); the same stage's ``approx=True`` HLL path is pinned by
    pytest with an error bound."""
    from ..engine.sparql import sparql

    return sparql(
        catalog_for(sf_dir),
        f"""
        SELECT ?seg (COUNT(DISTINCT ?n) AS ?n_nations) WHERE {{
          ?c <{BASE}customer#c_mktsegment> ?seg .
          ?c <{BASE}customer#ref-c_nationkey> ?n
        }} GROUP BY ?seg ORDER BY ?seg
        """,
        base=BASE,
    )


SQL_SPARQL_COUNT_DISTINCT = """
SELECT c_mktsegment AS seg,
       CAST(count(DISTINCT c_nationkey) AS BIGINT) AS n_nations
FROM customer GROUP BY 1 ORDER BY seg
"""


def q_sparql_subquery(sf_dir: str) -> rd.Dataset:
    """SPARQL §11.2 subquery: the inner GROUP BY + COUNT evaluates
    independently (combiner-first grouped aggregate) and its projected
    bindings fold into the outer BGP as a pre-built join unit on the
    shared ?n — the canonical aggregate-then-enrich shape."""
    from ..engine.sparql import sparql

    return sparql(
        catalog_for(sf_dir),
        f"""
        SELECT ?nm ?cnt WHERE {{
          {{ SELECT ?n (COUNT(?c) AS ?cnt) WHERE {{
               ?c <{BASE}customer#ref-c_nationkey> ?n
             }} GROUP BY ?n }}
          ?n <{BASE}nation#n_name> ?nm
        }} ORDER BY ?nm
        """,
        base=BASE,
    )


SQL_SPARQL_SUBQUERY = """
SELECT n_name AS nm, CAST(cnt AS BIGINT) AS cnt
FROM (SELECT c_nationkey, count(*) AS cnt FROM customer GROUP BY 1) c
JOIN nation ON n_nationkey = c_nationkey
ORDER BY nm
"""


def q_sparql_regex_filter(sf_dir: str) -> rd.Dataset:
    """SPARQL §17.4.3 string tests in FILTER (REGEX + STRSTARTS over
    the DM virtual graph): evaluated with Arrow match_substring_regex /
    starts_with kernels batch-wise; comparison pushdown skips them
    (pruning-only contract), the binding filter stays exact."""
    from ..engine.sparql import sparql

    return sparql(
        catalog_for(sf_dir),
        f"""
        SELECT ?nm WHERE {{
          ?n <{BASE}nation#n_name> ?nm .
          FILTER(REGEX(?nm, "^NATION_1[0-9]$") && STRSTARTS(?nm, "NATION"))
        }} ORDER BY ?nm
        """,
        base=BASE,
    )


SQL_SPARQL_REGEX_FILTER = """
SELECT n_name AS nm FROM nation
WHERE regexp_matches(n_name, '^NATION_1[0-9]$')
  AND starts_with(n_name, 'NATION')
ORDER BY nm
"""


def q_sparql_regex_flags(sf_dir: str) -> rd.Dataset:
    """REGEX with the §17.4.3.14 flags argument: ``"i"`` compiles to an
    RE2 ``(?i)`` inline group the Arrow kernel evaluates — the
    lowercase pattern matches the uppercase data ONLY through the flag
    (the flagless twin entry proves the same pattern shape is
    case-sensitive by default)."""
    from ..engine.sparql import sparql

    return sparql(
        catalog_for(sf_dir),
        f"""
        SELECT ?nm WHERE {{
          ?n <{BASE}nation#n_name> ?nm .
          FILTER(REGEX(?nm, "^nation_1[0-9]$", "i"))
        }} ORDER BY ?nm
        """,
        base=BASE,
    )


SQL_SPARQL_REGEX_FLAGS = """
SELECT n_name AS nm FROM nation
WHERE regexp_matches(n_name, '^nation_1[0-9]$', 'i')
ORDER BY nm
"""


def q_sparql_contains_var(sf_dir: str) -> rd.Dataset:
    """§17.4.3 string test with a VARIABLE second argument —
    CONTAINS(?text, ?lang) row-pairwise over two binding columns of the
    documents DM graph (the constant-argument form uses the Arrow
    kernel; the variable form zips inside the batch). Picks the docs
    whose body happens to mention their own language code."""
    from ..engine.sparql import sparql

    return sparql(
        catalog_for(sf_dir),
        f"""
        SELECT ?d ?lg WHERE {{
          ?doc <{BASE}documents#text> ?t ;
               <{BASE}documents#lang> ?lg ;
               <{BASE}documents#doc_id> ?d .
          FILTER(CONTAINS(?t, ?lg))
        }} ORDER BY ?d
        """,
        base=BASE,
    )


SQL_SPARQL_CONTAINS_VAR = """
SELECT CAST(doc_id AS VARCHAR) AS d, lang AS lg FROM documents
WHERE contains(text, lang)
ORDER BY d
"""


def q_sparql_agg_expr(sf_dir: str) -> rd.Dataset:
    """Aggregate over an EXPRESSION (§18.2.4): ``SUM(?k * 2)`` desugars
    in the parser to a hidden BIND evaluated over the solution set, so
    the grouped-aggregation machinery only ever sees plain binding
    columns — zero new shuffle shapes."""
    from ..engine.sparql import sparql

    return sparql(
        catalog_for(sf_dir),
        f"""
        SELECT ?r (SUM(?k * 2) AS ?s) WHERE {{
          ?n <{BASE}nation#n_nationkey> ?k ;
             <{BASE}nation#ref-n_regionkey> ?r .
        }} GROUP BY ?r ORDER BY ?r
        """,
        base=BASE,
    )


SQL_SPARQL_AGG_EXPR = f"""
SELECT '{BASE}region/r_regionkey=' || n_regionkey AS r,
       CAST(sum(n_nationkey * 2) AS DOUBLE) AS s
FROM nation GROUP BY 1 ORDER BY r
"""


def q_sparql_agg_global(sf_dir: str) -> rd.Dataset:
    """Implicit single-group aggregation (SPARQL §18.3: aggregates with
    NO GROUP BY aggregate over ALL solutions): one combiner-first pass
    keyed on a constant, ≤ 1 output row. SUM over int keys stays exact
    in float64 (< 2^53)."""
    from ..engine.sparql import sparql

    return sparql(
        catalog_for(sf_dir),
        f"""
        SELECT (COUNT(*) AS ?n) (SUM(?k) AS ?s)
               (MIN(?k) AS ?lo) (MAX(?k) AS ?hi)
        WHERE {{ ?c <{BASE}customer#c_custkey> ?k }}
        """,
        base=BASE,
    )


SQL_SPARQL_AGG_GLOBAL = """
SELECT CAST(count(*) AS BIGINT) AS n,
       CAST(sum(c_custkey) AS DOUBLE) AS s,
       CAST(min(c_custkey) AS DOUBLE) AS lo,
       CAST(max(c_custkey) AS DOUBLE) AS hi
FROM customer
"""


def q_sparql_filter_or(sf_dir: str) -> rd.Dataset:
    """FILTER boolean expressions (SPARQL §17.2: ``&&`` binds tighter
    than ``||``) mixing a string atom with a numeric-vs-double atom and
    a string test across THREE different variables. Both disjuncts map
    to pushable customer columns, so the whole ``||`` prunes at the
    parquet scan (superset contract) while the binding filter re-checks
    exactly; precedence here is a || (b && c)."""
    from ..engine.sparql import sparql

    return sparql(
        catalog_for(sf_dir),
        f"""
        SELECT ?k ?seg WHERE {{
          ?c <{BASE}customer#c_custkey> ?k ;
             <{BASE}customer#c_mktsegment> ?seg ;
             <{BASE}customer#c_acctbal> ?acct .
          FILTER(?seg = "BUILDING" || ?acct > 9000 && STRENDS(?seg, "RY"))
        }} ORDER BY ?k
        """,
        base=BASE,
    )


SQL_SPARQL_FILTER_OR = """
SELECT CAST(c_custkey AS VARCHAR) AS k, c_mktsegment AS seg
FROM customer
WHERE c_mktsegment = 'BUILDING'
   OR (c_acctbal > 9000 AND ends_with(c_mktsegment, 'RY'))
ORDER BY k
"""


def q_sparql_filter_in(sf_dir: str) -> rd.Dataset:
    """FILTER ?x IN (...) (§17.4.1.9 — lowered to the ||-algebra, so the
    whole disjunction still prunes at the parquet scan) plus a
    variable-vs-variable numeric comparison (binding-level only)."""
    from ..engine.sparql import sparql

    return sparql(
        catalog_for(sf_dir),
        f"""
        SELECT ?k ?seg WHERE {{
          ?c <{BASE}customer#c_custkey> ?k ;
             <{BASE}customer#c_mktsegment> ?seg ;
             <{BASE}customer#c_nationkey> ?nk .
          FILTER(?seg IN ("BUILDING", "MACHINERY"))
          FILTER(?nk < ?k)
        }} ORDER BY ?k
        """,
        base=BASE,
    )


SQL_SPARQL_FILTER_IN = """
SELECT CAST(c_custkey AS VARCHAR) AS k, c_mktsegment AS seg
FROM customer
WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
  AND c_nationkey < c_custkey
ORDER BY k
"""


def q_sparql_two_optionals(sf_dir: str) -> rd.Dataset:
    """Sibling OPTIONAL groups (SPARQL 1.1 §5.2: sequential LeftJoins)
    over the DM virtual graph — each group is an independent left-outer
    star join on the shared ?c; a customer with no F-order (or no
    P-order) keeps its row with that group's variable NULL. Mirrors SQL
    LEFT JOIN composition exactly because neither group references the
    other's variables."""
    from ..engine.sparql import sparql

    return sparql(
        catalog_for(sf_dir),
        f"""
        SELECT ?k ?fnum ?pnum WHERE {{
          ?c <{BASE}customer#c_custkey> ?k .
          OPTIONAL {{ ?f <{BASE}orders#ref-o_custkey> ?c ;
                         <{BASE}orders#o_orderstatus> "F" ;
                         <{BASE}orders#o_orderkey> ?fnum }}
          OPTIONAL {{ ?p <{BASE}orders#ref-o_custkey> ?c ;
                         <{BASE}orders#o_orderstatus> "P" ;
                         <{BASE}orders#o_orderkey> ?pnum }}
        }}
        """,
        base=BASE,
    )


SQL_SPARQL_TWO_OPTIONALS = """
SELECT CAST(c_custkey AS VARCHAR) AS k,
       CAST(f.o_orderkey AS VARCHAR) AS fnum,
       CAST(p.o_orderkey AS VARCHAR) AS pnum
FROM customer
LEFT JOIN orders f ON f.o_custkey = c_custkey AND f.o_orderstatus = 'F'
LEFT JOIN orders p ON p.o_custkey = c_custkey AND p.o_orderstatus = 'P'
"""


def q_sparql_optional_filter(sf_dir: str) -> rd.Dataset:
    """OPTIONAL with an inner FILTER (the LeftJoin CONDITION, SPARQL
    1.1 §6: a customer whose orders all miss the price bar keeps its
    row with ?onum NULL — different from filtering AFTER the join,
    which would drop it) plus a nested conjunctive group wrapping the
    required pattern (folds into the outer group exactly, §18.2 Join).
    SQL twin: the filter rides the LEFT JOIN's ON clause."""
    from ..engine.sparql import sparql

    return sparql(
        catalog_for(sf_dir),
        f"""
        SELECT ?k ?seg ?onum WHERE {{
          {{ ?c <{BASE}customer#c_custkey> ?k .
             ?c <{BASE}customer#c_mktsegment> ?seg .
             FILTER(?seg = "MACHINERY") }}
          OPTIONAL {{ ?o <{BASE}orders#ref-o_custkey> ?c ;
                         <{BASE}orders#o_orderkey> ?onum ;
                         <{BASE}orders#o_totalprice> ?tp
                      FILTER(?tp > 400000) }}
        }}
        """,
        base=BASE,
    )


SQL_SPARQL_OPTIONAL_FILTER = """
SELECT CAST(c_custkey AS VARCHAR) AS k, c_mktsegment AS seg,
       CAST(o.o_orderkey AS VARCHAR) AS onum
FROM customer
LEFT JOIN orders o ON o.o_custkey = c_custkey AND o.o_totalprice > 400000
WHERE c_mktsegment = 'MACHINERY'
"""


def q_sparql_exists(sf_dir: str) -> rd.Dataset:
    """Textual FILTER EXISTS (SPARQL 1.1 §8.4) — the positive dual of
    `bgp_minus`: customers WITH at least one fulfilled (status-F)
    order. The existence group is a 2-pattern star over orders (ONE
    fused scan); solutions keep exactly the rows whose shared ``?c``
    appears in the group — a distributed SEMI-join (broadcast Acero
    ``left semi`` under `broadcast_limit`, union-tag co-hash spill
    with a match-marker keep-filter past it)."""
    from ..engine.sparql import sparql

    return sparql(
        catalog_for(sf_dir),
        f"""
        SELECT ?c ?k WHERE {{
          ?c <{BASE}customer#c_custkey> ?k .
          FILTER EXISTS {{
            ?o <{BASE}orders#ref-o_custkey> ?c ;
               <{BASE}orders#o_orderstatus> "F" .
          }}
        }}
        """,
        base=BASE,
    )


SQL_SPARQL_EXISTS = f"""
SELECT '{BASE}customer/c_custkey=' || c_custkey AS c,
       CAST(c_custkey AS VARCHAR) AS k
FROM customer
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c_custkey AND o.o_orderstatus = 'F')
"""


def q_sparql_update_store(sf_dir: str) -> rd.Dataset:
    """SPARQL 1.1 Update lifecycle over a materialized store: COPY the
    nation+region store, apply a textual ``DELETE WHERE`` (drops every
    FK edge into region 3 — a bucket-local anti-join rewrite) and an
    ``INSERT DATA`` (one upserted ground triple via the incremental
    merge), then query the mutated store live. Pins parse → delta
    construct → `delete_triplestore`/`merge_triplestore` → BGP read
    end-to-end."""
    import hashlib
    import os
    import shutil
    import tempfile

    from ..engine.sparql import sparql, sparql_update

    src = _nation_region_store(sf_dir)
    store = os.path.join(
        tempfile.gettempdir(),
        "p5kg_upd_store_"
        + hashlib.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:12],
    )
    # updates MUTATE: always start from a fresh copy so the entry is a
    # pure function of sf_dir (driver reruns must agree)
    shutil.rmtree(store, ignore_errors=True)
    shutil.copytree(src, store)
    sparql_update(
        store,
        f"""
        DELETE WHERE {{
          ?n <{BASE}nation#ref-n_regionkey> <{BASE}region/r_regionkey=3>
        }}
        """,
    )
    sparql_update(
        store,
        f"""
        INSERT DATA {{
          <{BASE}nation/n_nationkey=999>
            <{BASE}nation#ref-n_regionkey> <{BASE}region/r_regionkey=0> .
        }}
        """,
    )
    return sparql(
        store,
        f"SELECT ?n ?r WHERE {{ ?n <{BASE}nation#ref-n_regionkey> ?r }}",
    )


SQL_SPARQL_UPDATE_STORE = f"""
SELECT '{BASE}nation/n_nationkey=' || n_nationkey AS n,
       '{BASE}region/r_regionkey=' || n_regionkey AS r
FROM nation WHERE n_regionkey != 3
UNION
SELECT '{BASE}nation/n_nationkey=999', '{BASE}region/r_regionkey=0'
"""


def q_sparql_path_store(sf_dir: str) -> rd.Dataset:
    """Textual SELECT whose predicate is a §9.1 SEQUENCE path, served
    from the materialized store — the parser builds the path AST and the
    planner folds the path relation as a binding unit (`_path_unit`)."""
    from ..engine.sparql import sparql

    return sparql(
        _nation_region_store(sf_dir),
        f"""
        SELECT ?s ?rn WHERE {{
          ?s <{BASE}nation#ref-n_regionkey>/<{BASE}region#r_name> ?rn .
        }}
        """,
    )


SQL_SPARQL_PATH_STORE = f"""
SELECT '{BASE}nation/n_nationkey=' || n_nationkey AS s, r_name AS rn
FROM nation JOIN region ON n_regionkey = r_regionkey
"""


def q_sparql_construct(sf_dir: str) -> rd.Dataset:
    """Textual CONSTRUCT over a path: enrichment triples minted from
    path solutions (`keep_kinds` bindings → batch-wise template
    instantiation); output is first-class TRIPLE_SCHEMA."""
    from ..engine.sparql import sparql

    return to_term_columns(
        sparql(
            _nation_region_store(sf_dir),
            f"""
            CONSTRUCT {{ ?n <{BASE}inRegionNamed> ?rn }}
            WHERE {{
              ?n <{BASE}nation#ref-n_regionkey>/<{BASE}region#r_name> ?rn
            }}
            """,
        )
    )


SQL_SPARQL_CONSTRUCT = f"""
SELECT '<{BASE}nation/n_nationkey=' || n_nationkey || '>' AS subj,
       '<{BASE}inRegionNamed>' AS pred,
       '"' || r_name || '"' AS obj
FROM nation JOIN region ON n_regionkey = r_regionkey
"""


def q_sparql_construct_where(sf_dir: str) -> rd.Dataset:
    """§10.2.2 CONSTRUCT WHERE shorthand: the BGP is its own template —
    byte-identical machinery to the explicit form (parser-level
    rewrite, zero new planning)."""
    from ..engine.sparql import sparql

    return to_term_columns(
        sparql(
            _nation_region_store(sf_dir),
            f"CONSTRUCT WHERE {{ ?n <{BASE}nation#n_name> ?nm }}",
        )
    )


SQL_SPARQL_CONSTRUCT_WHERE = f"""
SELECT '<{BASE}nation/n_nationkey=' || n_nationkey || '>' AS subj,
       '<{BASE}nation#n_name>' AS pred,
       '"' || n_name || '"' AS obj
FROM nation
"""


def q_sparql_graph_path(sf_dir: str) -> rd.Dataset:
    """Property path under a CONSTANT GRAPH scope: the closure's edge
    reads (and the §18.4 zero-length domain) restrict to one named
    context via the scoped-source wrapper — the gMeta context carries
    every region edge, the per-region graph/{{rk}} contexts only their
    own rows."""
    from ..engine.sparql import sparql

    store = _nation_ctx_store(sf_dir)
    meta = sparql(
        store,
        f"SELECT ?a ?b WHERE {{ GRAPH <{BASE}gMeta> "
        f"{{ ?a <{BASE}region>+ ?b }} }}",
    )
    one = sparql(
        store,
        f"SELECT ?a ?b WHERE {{ GRAPH <{BASE}graph/0> "
        f"{{ ?a <{BASE}region>+ ?b }} }}",
    )

    import pyarrow as pa

    def tag(ds, scope):
        return ds.map_batches(
            lambda t, _s=scope: t.append_column(
                "scope", pa.array([_s] * t.num_rows, pa.string())
            ),
            batch_format="pyarrow",
        )

    return tag(meta, "gMeta").union(tag(one, "graph0"))


SQL_SPARQL_GRAPH_PATH = f"""
SELECT '{BASE}nation-g/' || n_nationkey AS a,
       '{BASE}region-g/' || n_regionkey AS b, scope
FROM nation, (SELECT 'gMeta' AS scope) s
UNION ALL
SELECT '{BASE}nation-g/' || n_nationkey,
       '{BASE}region-g/' || n_regionkey, 'graph0'
FROM nation WHERE n_regionkey = 0
"""


def q_sparql_ask(sf_dir: str):
    """Textual ASK: satisfiable and unsatisfiable probes, each a
    streaming limit(1) early-exit through the parsed BGP."""
    import pyarrow as _pa

    from ..engine.sparql import sparql

    cat = catalog_for(sf_dir)

    def probe(regionkey: str) -> bool:
        return sparql(
            cat,
            f"""
            ASK {{
              ?n <{BASE}nation#ref-n_regionkey> ?r .
              ?r <{BASE}region#r_name> ?rn .
              ?n <{BASE}nation#n_regionkey> "{regionkey}" .
            }}
            """,
            base=BASE,
        )

    return _pa.table(
        {"probe": ["neg", "pos"], "ask": [probe("999"), probe("1")]}
    )


SQL_SPARQL_ASK = """
SELECT 'neg' AS probe,
       EXISTS(SELECT 1 FROM nation JOIN region ON n_regionkey = r_regionkey
              WHERE n_regionkey = 999) AS ask
UNION ALL
SELECT 'pos',
       EXISTS(SELECT 1 FROM nation JOIN region ON n_regionkey = r_regionkey
              WHERE n_regionkey = 1)
"""


# ---------------------------------------------------------------------------
# Federated multi-store BGP [graft extension]: base + delta queried as
# one UNION graph before compaction — the daily-delta deployment shape.
# ---------------------------------------------------------------------------

def _nation_region_split_stores(sf_dir: str) -> tuple[str, str]:
    """Materialize nation triples and region triples as TWO aligned
    stores (same num_buckets → same subject-hash layout), resumably —
    the base+delta pair the federated entries query."""
    import hashlib
    import os
    import tempfile

    from ..sinks.triplestore import fingerprint_files, write_triplestore

    cat = catalog_for(sf_dir)
    tag = hashlib.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    # ONE spec over both tables (the nation FK ref needs the region
    # layout), split at execution time per store via only_maps
    spec = direct_mapping(cat, tables=["nation", "region"], base=BASE)
    outs = []
    for table in ("nation", "region"):
        out = os.path.join(
            tempfile.gettempdir(), f"p5kg_fed_{table}_{tag}"
        )
        write_triplestore(
            run_mapping(spec, cat, distinct=False, only_maps=[table]),
            out,
            num_buckets=8,
            input_fp=fingerprint_files(cat.files(table)),
        )
        outs.append(out)
    return outs[0], outs[1]


def q_federated_store(sf_dir: str) -> rd.Dataset:
    """BGP over the UNION of two stores (base = nation triples, delta =
    region triples) — the query's join NEEDS both members: the FK ref
    lives in the base store, the region name in the delta. Aligned
    bucket layouts keep star fusion active (one task reads the same
    bucket from every member); same oracle as the single-store
    `bgp_store` entry, proving union-graph equivalence."""
    from ..engine.lookup import get_pattern_store

    base_s, delta_s = _nation_region_split_stores(sf_dir)
    return get_pattern_store(
        [base_s, delta_s],
        [
            ("?n", BASE + "nation#ref-n_regionkey", "?r"),
            ("?r", BASE + "region#r_name", "?rn"),
            ("?n", BASE + "nation#n_regionkey", ("lit", "1")),
        ],
    )


SQL_FEDERATED_STORE = SQL_BGP_NATION_REGION


def _lang_literal_store(sf_dir: str) -> str:
    """Materialize (resumably) a store with LANGUAGE-TAGGED and TYPED
    literals — the term metadata the LANG()/LANGMATCHES()/DATATYPE()
    filters consume at the star scan. R2RML-style spec over nation
    [W3C-R2RML §7.4 rr:language / rr:datatype]: one predicate with two
    language variants of the label (``n_name``@en and a derived
    ``{n_name}-fr``@fr), one predicate with a typed integer next to a
    plain string — so each filter's answer is a strict subset."""
    import hashlib
    import os
    import tempfile

    from ..sinks.triplestore import fingerprint_files, write_triplestore

    cat = catalog_for(sf_dir)
    tm = TriplesMapSpec(
        name="nation_lang",
        table="nation",
        subject=TermMapSpec(
            kind=IRI, template=BASE + "nation/n_nationkey={n_nationkey}"
        ),
        pos=(
            PredObjSpec(
                pred=TermMapSpec(kind=IRI, constant=BASE + "label"),
                obj=TermMapSpec(kind=LITERAL, column="n_name", lang="en"),
            ),
            PredObjSpec(
                pred=TermMapSpec(kind=IRI, constant=BASE + "label"),
                obj=TermMapSpec(
                    kind=LITERAL, template="{n_name}-fr", lang="fr"
                ),
            ),
            PredObjSpec(
                pred=TermMapSpec(kind=IRI, constant=BASE + "val"),
                obj=TermMapSpec(
                    kind=LITERAL, column="n_nationkey", datatype=XSD_INT
                ),
            ),
            PredObjSpec(
                pred=TermMapSpec(kind=IRI, constant=BASE + "val"),
                obj=TermMapSpec(kind=LITERAL, template="{n_name}"),
            ),
        ),
    )
    spec = MappingSpec(maps={"nation_lang": tm}, base=BASE)
    fp = fingerprint_files(cat.files("nation"))
    out = os.path.join(
        tempfile.gettempdir(),
        "p5kg_lang_store_"
        + hashlib.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:12],
    )
    write_triplestore(
        run_mapping(spec, cat, distinct=False, only_maps=["nation_lang"]),
        out,
        num_buckets=8,
        input_fp=fp,
    )
    return out


def q_sparql_lang_filter(sf_dir: str) -> rd.Dataset:
    """FILTER(LANGMATCHES(LANG(?v), "EN")) over a store with @en and
    @fr variants of one predicate — the atom is consumed at the fused
    star scan as a row filter on the store's ``lang`` column
    (case-insensitive RFC 4647 basic range; binding columns carry
    lexical forms only, so scan consumption is the only exact plan).
    Picks the @en labels; the @fr derived labels prove discrimination."""
    from ..engine.sparql import sparql

    return sparql(
        _lang_literal_store(sf_dir),
        f"""
        SELECT ?s ?v WHERE {{
          ?s <{BASE}label> ?v .
          FILTER(LANGMATCHES(LANG(?v), "EN"))
        }}
        """,
    )


SQL_SPARQL_LANG_FILTER = f"""
SELECT '{BASE}nation/n_nationkey=' || n_nationkey AS s, n_name AS v
FROM nation
"""


def q_sparql_datatype_filter(sf_dir: str) -> rd.Dataset:
    """FILTER(DATATYPE(?v) = xsd:string) over a predicate bound to both
    a typed integer and a plain string — pins the RDF 1.1 rule that a
    PLAIN literal's datatype is xsd:string (store rows with NULL
    datatype and NULL lang), consumed at the star scan like the LANG
    atoms."""
    from ..engine.sparql import sparql

    return sparql(
        _lang_literal_store(sf_dir),
        f"""
        PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
        SELECT ?s ?v WHERE {{
          ?s <{BASE}val> ?v .
          FILTER(DATATYPE(?v) = xsd:string)
        }}
        """,
    )


SQL_SPARQL_DATATYPE_FILTER = f"""
SELECT '{BASE}nation/n_nationkey=' || n_nationkey AS s, n_name AS v
FROM nation
"""


def q_sparql_load_store(sf_dir: str) -> rd.Dataset:
    """SPARQL 1.1 Update §3.1.4 LOAD lifecycle: the DM nation triples
    exported as N-Triples text (the line-oriented sink), then
    ``LOAD <file:…>`` into a FRESH store — the distributed NT read is
    the merge delta and a missing store bootstraps via
    ``write_triplestore`` — and the loaded graph queried live. Pins
    sink → reader → store write → BGP read end-to-end."""
    import hashlib
    import os
    import shutil
    import tempfile

    from ..engine.sparql import sparql, sparql_update
    from ..sinks.ntriples import write_ntriples

    cat = catalog_for(sf_dir)
    spec = direct_mapping(cat, tables=["nation", "region"], base=BASE)
    tag = hashlib.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    nt_dir = os.path.join(tempfile.gettempdir(), "p5kg_load_nt_" + tag)
    store = os.path.join(tempfile.gettempdir(), "p5kg_load_store_" + tag)
    # pure function of sf_dir: rebuild both artifacts every call
    shutil.rmtree(nt_dir, ignore_errors=True)
    shutil.rmtree(store, ignore_errors=True)
    write_ntriples(
        run_mapping(spec, cat, distinct=False, only_maps=["nation"]),
        nt_dir,
    )
    sparql_update(store, f"LOAD <file://{nt_dir}>")
    return sparql(
        store,
        f"SELECT ?n ?r WHERE {{ ?n <{BASE}nation#ref-n_regionkey> ?r }}",
    )


SQL_SPARQL_LOAD_STORE = f"""
SELECT '{BASE}nation/n_nationkey=' || n_nationkey AS n,
       '{BASE}region/r_regionkey=' || n_regionkey AS r
FROM nation
"""

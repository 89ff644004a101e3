"""Checkpoint/resume: failure injection at shard and bucket level."""

import glob
import json
import os
import shutil

import pytest
import ray.data as rd

from p5_rdf_rdb2rdf_ray.pipelines.flagship import BASE
from p5_rdf_rdb2rdf_ray.pipelines.resumable import run_flagship_resumable
from p5_rdf_rdb2rdf_ray.pipelines.transcripts import (
    generate_transcripts,
    write_transcripts,
)
from p5_rdf_rdb2rdf_ray.sinks.ntriples import collect_ntriples
from p5_rdf_rdb2rdf_ray.sinks.triplestore import read_triplestore

from .golden_kg import golden_kg_lines, precision_recall


@pytest.fixture()
def tx(tmp_path):
    d = str(tmp_path / "tx")
    write_transcripts(d, n_convs=40, num_files=4, seed=42)
    return d


def _store_lines(out):
    return set(collect_ntriples(read_triplestore(os.path.join(out, "store"))))


def test_full_run_matches_golden(ray_session, tx, tmp_path):
    out = str(tmp_path / "out")
    m = run_flagship_resumable(tx, out, num_buckets=8)
    assert m["rows_written"] > 0 and not m["buckets_skipped"]
    got = _store_lines(out)
    want = golden_kg_lines(generate_transcripts(40, seed=42), BASE)
    p, r = precision_recall(got, want)
    assert p == 1.0 and r == 1.0


def test_resume_is_noop_when_complete(ray_session, tx, tmp_path):
    out = str(tmp_path / "out")
    run_flagship_resumable(tx, out, num_buckets=8)
    parts_before = {
        p: os.path.getmtime(p)
        for p in glob.glob(os.path.join(out, "store", "bucket=*", "part-*"))
    }
    m2 = run_flagship_resumable(tx, out, num_buckets=8)
    assert m2["stage_a_shards_run"] == []
    assert m2["buckets_written"] == []
    assert len(m2["buckets_skipped"]) == 8
    parts_after = {
        p: os.path.getmtime(p)
        for p in glob.glob(os.path.join(out, "store", "bucket=*", "part-*"))
    }
    assert parts_before == parts_after  # nothing rewritten


def test_resume_after_partial_failure(ray_session, tx, tmp_path):
    out = str(tmp_path / "out")
    run_flagship_resumable(tx, out, num_buckets=8)
    want = _store_lines(out)

    # inject failure: one stage-A shard and one store bucket lost mid-run
    shutil.rmtree(os.path.join(out, "stageA", "shard=00002"))
    shutil.rmtree(os.path.join(out, "store", "bucket=00003"))
    # a second bucket lost only its manifest (crash between part and manifest)
    os.remove(os.path.join(out, "store", "bucket=00005", "_MANIFEST.json"))
    for p in glob.glob(os.path.join(out, "store", "bucket=00005", "part-*")):
        os.remove(p)

    m = run_flagship_resumable(tx, out, num_buckets=8)
    assert m["stage_a_shards_run"] == [2]
    # stage-A output changed (shard 2 parts have fresh names) → new input_fp
    # → ALL buckets rewritten: lineage says the old manifests no longer
    # describe this input. Correctness over cleverness.
    got = _store_lines(out)
    assert got == want


def test_resume_skips_buckets_same_input(ray_session, tx, tmp_path):
    """Bucket-level resume: stage A intact, some buckets missing."""
    out = str(tmp_path / "out")
    run_flagship_resumable(tx, out, num_buckets=8)
    want = _store_lines(out)
    shutil.rmtree(os.path.join(out, "store", "bucket=00003"))
    untouched = os.path.join(out, "store", "bucket=00001", "_MANIFEST.json")
    mtime = os.path.getmtime(untouched)
    m = run_flagship_resumable(tx, out, num_buckets=8)
    assert m["stage_a_shards_run"] == []
    assert m["buckets_written"] == [3]
    assert sorted(m["buckets_skipped"]) == [0, 1, 2, 4, 5, 6, 7]
    assert os.path.getmtime(untouched) == mtime
    assert _store_lines(out) == want


def test_store_point_lookup_prunes(ray_session, tx, tmp_path):
    from p5_rdf_rdb2rdf_ray.sinks.triplestore import lookup_store

    out = str(tmp_path / "out")
    run_flagship_resumable(tx, out, num_buckets=8)
    subj = BASE + "conv/c000003/turn/0"
    t = lookup_store(os.path.join(out, "store"), subj)
    assert t.num_rows >= 5  # type/role/text/ts/inConversation
    assert set(t.column("subj").to_pylist()) == {subj}
    got_preds = set(t.column("pred").to_pylist())
    assert BASE + "text" in got_preds and BASE + "inConversation" in got_preds
    # predicate-bound lookup
    t2 = lookup_store(os.path.join(out, "store"), subj, BASE + "text")
    assert t2.num_rows == 1


def test_store_lookup_absent_subject_and_empty_bucket(ray_session, tmp_path):
    """A lookup of an absent subject must return the empty triple table —
    including when the subject hashes to a bucket whose directory was
    never created (sparse store: 1 subject, 64 buckets → 63 missing dirs,
    the FileNotFoundError regression)."""
    import pyarrow as pa

    from p5_rdf_rdb2rdf_ray.sinks.triplestore import lookup_store, write_triplestore
    from p5_rdf_rdb2rdf_ray.terms import TRIPLE_SCHEMA

    one = pa.table(
        {
            "subj": [BASE + "conv/only/turn/0"],
            "pred": [BASE + "text"],
            "obj": ["hi"],
            "obj_kind": pa.array([2], pa.uint8()),
            "lang": pa.array([None], pa.string()),
            "datatype": pa.array([None], pa.string()),
            "graph": pa.array([None], pa.string()),
        }
    )
    store = str(tmp_path / "sparse_store")
    write_triplestore(rd.from_arrow(one), store, num_buckets=64, input_fp="x")
    for i in range(24):
        t = lookup_store(store, BASE + f"conv/absent{i}/turn/0")
        assert t.num_rows == 0
        assert t.schema.equals(TRIPLE_SCHEMA)
    assert lookup_store(store, BASE + "conv/only/turn/0").num_rows == 1


def test_store_lookup_unbound_shapes_are_lazy(ray_session, tx, tmp_path):
    """Unbound and predicate-only store lookups return a LAZY Dataset
    (the reference Store's lazy-iterator contract): no driver-side
    concatenation of the store — at 100 TB the eager version is a
    driver OOM (round-3 verdict scale-killer). Values must match the
    eager per-bucket reads; bound-subject point lookups stay eager
    ``pa.Table`` (one pruned bucket)."""
    from p5_rdf_rdb2rdf_ray.sinks.triplestore import (
        lookup_store,
        read_triplestore,
    )

    out = str(tmp_path / "out")
    run_flagship_resumable(tx, out, num_buckets=8)
    store = os.path.join(out, "store")

    from p5_rdf_rdb2rdf_ray.terms import TRIPLE_SCHEMA

    # predicate-only: lazy Dataset, filter pushed into the parquet scan
    ds = lookup_store(store, predicate=BASE + "role")
    assert isinstance(ds, rd.Dataset)
    t = ds.to_pandas()
    assert len(t) > 0
    assert set(t["pred"]) == {BASE + "role"}

    # fully unbound: lazy Dataset over every part, row count == store
    ds_all = lookup_store(store)
    assert isinstance(ds_all, rd.Dataset)
    assert ds_all.count() == read_triplestore(store).count()
    # schema contract on NON-empty branches: exactly TRIPLE_SCHEMA — no
    # phantom hive `bucket` column from the bucket=NNNNN directory names
    # (round-4 review find; the old eager pa.Table path never had it)
    for shape in (ds, ds_all, read_triplestore(store)):
        assert list(shape.schema().names) == list(TRIPLE_SCHEMA.names)

    # empty store: still a Dataset, with the canonical triple schema
    empty_dir = str(tmp_path / "empty_store")
    os.makedirs(empty_dir)
    ds_empty = lookup_store(empty_dir)
    assert isinstance(ds_empty, rd.Dataset) and ds_empty.count() == 0
    assert list(ds_empty.schema().names) == list(TRIPLE_SCHEMA.names)


def test_merge_triplestore_incremental(ray_session, tmp_path):
    """Incremental ingest: store(part A) + merge(delta B) == one-shot
    store(A ∪ B); existing parts untouched; re-merging B is a no-op."""
    from p5_rdf_rdb2rdf_ray.pipelines.flagship import build_kg
    from p5_rdf_rdb2rdf_ray.sinks.triplestore import (
        merge_triplestore,
        write_triplestore,
    )

    txa = generate_transcripts(20, seed=1)
    txb = generate_transcripts(12, seed=99)  # overlap-free conv ids? not
    # required — set semantics must hold regardless of overlap
    a = rd.from_arrow(txa)
    b = rd.from_arrow(txb)
    both = rd.from_arrow(txa).union(rd.from_arrow(txb))

    inc = str(tmp_path / "inc")
    write_triplestore(build_kg(a, distinct=False), inc, num_buckets=6,
                      input_fp="a", resume=False)
    parts_before = {
        p: os.path.getmtime(p)
        for p in glob.glob(os.path.join(inc, "bucket=*", "part-*"))
    }
    m = merge_triplestore(build_kg(b, distinct=False), inc, input_fp="b")
    assert m["rows_added"] > 0
    # original parts never rewritten (append-only merge)
    for p, mt in parts_before.items():
        assert os.path.getmtime(p) == mt

    full = str(tmp_path / "full")
    write_triplestore(build_kg(both, distinct=False), full, num_buckets=6,
                      input_fp="ab", resume=False)
    assert set(collect_ntriples(read_triplestore(inc))) == set(
        collect_ntriples(read_triplestore(full))
    )

    m2 = merge_triplestore(build_kg(b, distinct=False), inc, input_fp="b")
    assert m2["rows_added"] == 0  # idempotent

    # manifests stay consistent: per-bucket rows == actual part rows
    for mf in glob.glob(os.path.join(inc, "bucket=*", "_MANIFEST.json")):
        man = json.load(open(mf))
        d = os.path.dirname(mf)
        actual = sum(
            len(rd.read_parquet(os.path.join(d, p)).take_all())
            for p in man["parts"]
        )
        assert man["rows"] == actual


def test_store_writer_lock_single_writer(ray_session, tmp_path):
    """merge/compact are single-writer: a live holder blocks a second
    mutator with a clear error (their .inprogress staging and the merge's
    store-wide orphan sweep would destroy each other's work), a dead
    holder's lock is treated as a crash leftover and taken over, and the
    lock is always released afterwards."""
    from p5_rdf_rdb2rdf_ray.pipelines.flagship import build_kg
    from p5_rdf_rdb2rdf_ray.sinks.triplestore import (
        _store_write_lock,
        compact_triplestore,
        merge_triplestore,
        write_triplestore,
    )

    out = str(tmp_path / "locked")
    tx = generate_transcripts(8, seed=5)
    write_triplestore(build_kg(rd.from_arrow(tx), distinct=False), out,
                      num_buckets=4, input_fp="a", resume=False)
    lock = os.path.join(out, "_WRITER.lock")

    # a live holder (this very process) blocks both mutators
    with _store_write_lock(out):
        assert os.path.exists(lock)
        with pytest.raises(RuntimeError, match="locked by running writer"):
            merge_triplestore(
                build_kg(rd.from_arrow(tx), distinct=False), out,
                input_fp="b",
            )
        with pytest.raises(RuntimeError, match="locked by running writer"):
            compact_triplestore(out)
    assert not os.path.exists(lock)  # released on exit

    # a crash leftover (dead pid) is taken over, the mutation proceeds,
    # and the stale lock is replaced then released
    with open(lock, "w") as f:
        f.write("999999999")  # beyond pid_max — never a live process
    m = merge_triplestore(
        build_kg(rd.from_arrow(tx), distinct=False), out, input_fp="b"
    )
    assert m["rows_added"] == 0  # same input → idempotent no-op merge
    assert not os.path.exists(lock)


def test_merge_crash_leaves_store_clean(ray_session, tmp_path):
    """A merge that dies after writing delta parts but before the commit
    renames must leave the visible store untouched; the next merge sweeps
    the orphans and lands the full delta exactly once."""
    import pyarrow.parquet as pq

    from p5_rdf_rdb2rdf_ray.pipelines.flagship import build_kg
    from p5_rdf_rdb2rdf_ray.pipelines.transcripts import generate_transcripts
    from p5_rdf_rdb2rdf_ray.sinks.triplestore import (
        merge_triplestore,
        read_triplestore,
        write_triplestore,
    )

    txa = generate_transcripts(15, seed=3)
    txb = generate_transcripts(8, seed=77)
    store = str(tmp_path / "store")
    write_triplestore(build_kg(rd.from_arrow(txa), distinct=False), store,
                      num_buckets=4, input_fp="a", resume=False)
    before = set(collect_ntriples(read_triplestore(store)))

    # simulate the crash: uncommitted .inprogress parts strewn about
    # (what a merge killed mid-flight leaves behind)
    d = os.path.join(store, "bucket=00001")
    os.makedirs(d, exist_ok=True)
    orphan = os.path.join(d, "part-deadbeef.parquet.inprogress")
    some_part = glob.glob(
        os.path.join(store, "bucket=*", "part-*.parquet")
    )[0]
    pq.write_table(pq.read_table(some_part), orphan)
    # visible store unchanged by the orphan
    assert set(collect_ntriples(read_triplestore(store))) == before

    m = merge_triplestore(build_kg(rd.from_arrow(txb), distinct=False),
                          store, input_fp="b")
    assert not os.path.exists(orphan)  # swept at merge start
    assert m["rows_added"] > 0
    # committed result equals a one-shot build over a ∪ b
    full = str(tmp_path / "full")
    write_triplestore(
        build_kg(rd.from_arrow(txa).union(rd.from_arrow(txb)), distinct=False),
        full, num_buckets=4, input_fp="ab", resume=False)
    assert set(collect_ntriples(read_triplestore(store))) == set(
        collect_ntriples(read_triplestore(full))
    )
    # no .inprogress residue after a successful merge
    assert not glob.glob(os.path.join(store, "bucket=*", "*.inprogress"))


def test_compact_triplestore(ray_session, tmp_path):
    """After a build + merge, buckets hold 2 parts; compaction collapses
    each to one part with the triple set unchanged."""
    from p5_rdf_rdb2rdf_ray.pipelines.flagship import build_kg
    from p5_rdf_rdb2rdf_ray.sinks.triplestore import (
        compact_triplestore,
        merge_triplestore,
        write_triplestore,
    )

    txa = generate_transcripts(15, seed=5)
    txb = generate_transcripts(10, seed=55)
    store = str(tmp_path / "store")
    write_triplestore(build_kg(rd.from_arrow(txa), distinct=False), store,
                      num_buckets=4, input_fp="a", resume=False)
    merge_triplestore(build_kg(rd.from_arrow(txb), distinct=False), store,
                      input_fp="b")
    before = set(collect_ntriples(read_triplestore(store)))
    multi = [
        d for d in glob.glob(os.path.join(store, "bucket=*"))
        if len(glob.glob(os.path.join(d, "part-*.parquet"))) > 1
    ]
    assert multi  # the merge added second parts somewhere

    m = compact_triplestore(store)
    assert len(m["buckets_compacted"]) == len(multi)
    for d in glob.glob(os.path.join(store, "bucket=*")):
        parts = glob.glob(os.path.join(d, "part-*.parquet"))
        assert len(parts) <= 1
        man = json.load(open(os.path.join(d, "_MANIFEST.json")))
        assert man["parts"] == [os.path.basename(p) for p in parts]
    assert set(collect_ntriples(read_triplestore(store))) == before
    # idempotent: second compaction is a no-op
    assert compact_triplestore(store)["buckets_compacted"] == []


def test_store_contexts(ray_session, tmp_path):
    """get_contexts parity: distinct named graphs of the store; the
    default graph (null) is not a context; an empty store yields an
    empty single-column frame."""
    import pyarrow as pa

    from p5_rdf_rdb2rdf_ray.sinks.triplestore import (
        store_contexts,
        write_triplestore,
    )

    out = str(tmp_path / "store")
    quads = rd.from_arrow(
        pa.table(
            {
                "subj": ["s1", "s2", "s3", "s4"],
                "pred": ["p"] * 4,
                "obj": ["o1", "o2", "o3", "o4"],
                "obj_kind": pa.array([0, 0, 0, 0], pa.uint8()),
                "lang": pa.array([None] * 4, pa.string()),
                "datatype": pa.array([None] * 4, pa.string()),
                "graph": pa.array(["g1", "g2", "g1", None], pa.string()),
            }
        )
    )
    write_triplestore(quads, out, num_buckets=4, input_fp="t")
    got = sorted(store_contexts(out).to_pandas()["graph"])
    assert got == ["g1", "g2"]

    empty = str(tmp_path / "empty_store")
    os.makedirs(empty)
    assert store_contexts(empty).to_pandas().empty


def test_compact_crash_windows_heal(ray_session, tmp_path):
    """Both compaction crash windows heal on re-run: (a) a stale staged
    ``.inprogress`` file is never read and a re-run still compacts; (b)
    a crash after the staged rename but before old-part removal leaves
    transient duplicates that the next compaction dedups away."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from p5_rdf_rdb2rdf_ray.pipelines.flagship import build_kg
    from p5_rdf_rdb2rdf_ray.sinks.triplestore import (
        compact_triplestore,
        merge_triplestore,
        write_triplestore,
    )

    txa = generate_transcripts(12, seed=6)
    txb = generate_transcripts(8, seed=66)
    store = str(tmp_path / "store")
    write_triplestore(build_kg(rd.from_arrow(txa), distinct=False), store,
                      num_buckets=4, input_fp="a", resume=False)
    merge_triplestore(build_kg(rd.from_arrow(txb), distinct=False), store,
                      input_fp="b")
    before = set(collect_ntriples(read_triplestore(store)))
    buckets = sorted(glob.glob(os.path.join(store, "bucket=*")))
    multi = [
        d for d in buckets
        if len(glob.glob(os.path.join(d, "part-*.parquet"))) > 1
    ]
    assert multi

    # window (a): stale staged file from a pre-commit crash
    victim = multi[0]
    stale = os.path.join(victim, "part-deadbeef.parquet.inprogress")
    pq.write_table(
        pq.read_table(glob.glob(os.path.join(victim, "part-*.parquet"))[0]),
        stale,
    )
    assert set(collect_ntriples(read_triplestore(store))) == before

    # window (b): duplicate a committed part (rename done, removal not)
    dup_src = glob.glob(os.path.join(multi[-1], "part-*.parquet"))[0]
    pq.write_table(pq.read_table(dup_src),
                   os.path.join(multi[-1], "part-ffffffff.parquet"))

    compact_triplestore(store)
    # stale staged file ignored by readers and by compaction commits
    assert set(collect_ntriples(read_triplestore(store))) == before
    for d in buckets:
        parts = glob.glob(os.path.join(d, "part-*.parquet"))
        assert len(parts) <= 1
        # commit order guarantees the manifest always lists live parts
        # after a re-run (manifest written BEFORE old-part removal)
        mpath = os.path.join(d, "_MANIFEST.json")
        if parts and os.path.exists(mpath):
            man = json.load(open(mpath))
            assert man["parts"] == [os.path.basename(parts[0])]


def test_store_statements_graph_bound(ray_session, tmp_path):
    """get_statements context parity: a bound named graph and the nil
    (default) context each select exactly their quads."""
    import pyarrow as pa

    from p5_rdf_rdb2rdf_ray.sinks.triplestore import (
        store_statements,
        write_triplestore,
    )

    out = str(tmp_path / "store")
    quads = rd.from_arrow(
        pa.table(
            {
                "subj": ["s1", "s1", "s2", "s3"],
                "pred": ["p"] * 4,
                "obj": ["o1", "o2", "o3", "o4"],
                "obj_kind": pa.array([0] * 4, pa.uint8()),
                "lang": pa.array([None] * 4, pa.string()),
                "datatype": pa.array([None] * 4, pa.string()),
                "graph": pa.array(["g1", None, "g1", "g2"], pa.string()),
            }
        )
    )
    write_triplestore(quads, out, num_buckets=4, input_fp="g")
    g1 = store_statements(out, graph="g1").to_pandas()
    assert sorted(g1["obj"]) == ["o1", "o3"]
    dflt = store_statements(out, default_graph=True).to_pandas()
    assert list(dflt["obj"]) == ["o2"]
    # composes with a bound subject (bucket pruning + graph filter)
    s1g1 = store_statements(out, subject="s1", graph="g1").to_pandas()
    assert list(s1g1["obj"]) == ["o1"]
    with pytest.raises(ValueError):
        store_statements(out, graph="g1", default_graph=True)

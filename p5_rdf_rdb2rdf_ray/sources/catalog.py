"""Logical-table catalog over a directory of Parquet tables (SURVEY §2 #1–3).

Replaces the reference's live DBI handle + catalog introspection
[R: Simple.pm :: process executes SELECTs on $dbh; DirectMapping.pm ::
layout reads table_info/column_info/primary_key_info/foreign_key_info].

- plain table       → ``ray.data.read_parquet`` with column pruning
- rr:sqlQuery views → DuckDB over the parquet files, materialized to Arrow,
  then ``ray.data.from_arrow``. This is the *fixture/small-view* path (the
  reference pushes views to the RDBMS); at 100 TB an sqlQuery logical table
  should be re-expressed as Dataset ops (filter/project/join) — the R2RML
  front-end emits a warning when a large view goes through DuckDB.
- row ids           → Direct Mapping of a table without a primary key needs a
  per-row identity for fresh blank nodes (W3C-DM §2). Parquet has no rowid,
  so we derive ``(file index, row offset within file)`` from parquet
  metadata — deterministic across runs/retries, resumable-safe.
"""

from __future__ import annotations

import glob
import os
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

ROWID_COL = "__rowid"


@dataclass
class TableLayout:
    """Declared key metadata for one table — the Parquet stand-in for the
    DBI catalog [R: DirectMapping.pm :: layout]."""

    pkey: tuple[str, ...] = ()
    # (child_cols, parent_table, parent_cols)
    fkeys: tuple[tuple[tuple[str, ...], str, tuple[str, ...]], ...] = ()
    uniques: tuple[tuple[str, ...], ...] = ()


@dataclass
class Catalog:
    root: str
    layouts: dict[str, TableLayout] = field(default_factory=dict)
    # extra in-memory tables (tests/fixtures): name → pyarrow.Table
    tables: dict[str, pa.Table] = field(default_factory=dict)

    # -- catalog introspection (operator #3) -------------------------------

    _EXTS = (".parquet", ".csv", ".json")

    def table_names(self) -> list[str]:
        names = set(self.tables)
        if self.root:
            for ext in self._EXTS:
                for p in glob.glob(os.path.join(self.root, f"*{ext}")):
                    names.add(os.path.splitext(os.path.basename(p))[0])
            # sharded-directory tables: a directory of parquet files IS
            # the table (the at-scale layout; one file per input shard).
            # Skip dirs named like `t.parquet` — the extension glob above
            # already registered those as table `t`.
            for p in glob.glob(os.path.join(self.root, "*")):
                if (
                    os.path.isdir(p)
                    and not p.endswith(self._EXTS)
                    and glob.glob(os.path.join(p, "*.parquet"))
                ):
                    names.add(os.path.basename(p))
        return sorted(names)

    def schema(self, table: str) -> pa.Schema:
        if table in self.tables:
            return self.tables[table].schema
        p = self._path(table)
        if p.endswith(".csv"):
            import pyarrow.csv as pacsv

            with pacsv.open_csv(p) as r:  # streaming: header + first block
                return r.schema
        if p.endswith(".json"):
            import pyarrow.json as pajson

            return pajson.read_json(p).schema
        return pq.read_schema(self.files(table)[0])

    def layout(self, table: str) -> TableLayout:
        return self.layouts.get(table, TableLayout())

    def _path(self, table: str) -> str:
        """Resolve a logical table to a file/dir path: .parquet preferred,
        then .csv / .json, then a DIRECTORY of parquet shards — the shape
        every at-scale table actually has (one file per input shard)."""
        base = os.path.join(self.root, table)
        for ext in self._EXTS:
            if os.path.exists(base + ext):
                return base + ext
        if os.path.isdir(base):
            return base
        return base + ".parquet"

    def files(self, table: str) -> list[str]:
        p = self._path(table)
        if os.path.isdir(p):
            return sorted(glob.glob(os.path.join(p, "*.parquet")))
        return [p]

    # -- loading -----------------------------------------------------------

    def load(
        self,
        table: str,
        columns: list[str] | None = None,
        sql: str | None = None,
        rowid: bool = False,
        row_filter=None,
    ) -> rd.Dataset:
        """``row_filter`` is an optional ``pyarrow.dataset`` expression
        pushed into the scan (parquet row-group/page pruning); CSV/JSON
        and in-memory tables apply it right after the read. Callers use
        it as a PRUNING hint only — semantics must not depend on it."""
        if sql is not None:
            return self._load_sql(sql, columns)  # row_filter unsupported here
        if table in self.tables:
            t = self.tables[table]
            if rowid:
                t = t.append_column(
                    ROWID_COL, pa.array(range(t.num_rows), pa.int64())
                )
            if row_filter is not None:
                t = t.filter(row_filter)
            if columns is not None:
                keep = [c for c in columns if c in t.column_names]
                if rowid and ROWID_COL not in keep:
                    keep.append(ROWID_COL)
                t = t.select(keep)
            return rd.from_arrow(t)
        p = self._path(table)
        if p.endswith(".csv") or p.endswith(".json"):
            if rowid:
                raise NotImplementedError(
                    "deterministic rowids (no-PK Direct Mapping) need "
                    "parquet row-group metadata; declare a primary key or "
                    "convert the table to parquet"
                )
            ds = rd.read_csv(p) if p.endswith(".csv") else rd.read_json(p)
            if row_filter is not None:
                ds = ds.map_batches(
                    lambda t, _f=row_filter: t.filter(_f),
                    batch_format="pyarrow",
                )
            if columns is not None:
                ds = ds.select_columns(
                    [c for c in columns if c in self.schema(table).names]
                )
            return ds
        if rowid:
            if row_filter is not None:
                # rowids are minted from row-group offsets BEFORE any
                # filter can apply — pushing one would renumber rows
                raise ValueError("row_filter is incompatible with rowid")
            return self._load_with_rowid(table, columns)
        return rd.read_parquet(p, columns=columns, filter=row_filter)

    def _load_sql(self, sql: str, columns: list[str] | None) -> rd.Dataset:
        """rr:sqlQuery logical table.

        STREAMING path first: the simple-SQL subset (single-table
        SELECT/WHERE) compiles to a column-pruned, filter-pushed
        ``read_parquet`` — no driver materialization (see
        ``sources/sqlview.py``). Anything richer falls back to DuckDB
        views materialized to Arrow — the fixture/small-view path.
        """
        from .sqlview import parse_simple_select, resolve_plan, to_arrow_filter

        plan = parse_simple_select(sql)
        if plan is not None and plan.table not in self.tables:
            # SQL identifiers are case-insensitive: resolve the table name
            table = plan.table
            if not os.path.exists(self._path(table)):
                table = next(
                    (
                        n
                        for n in self.table_names()
                        if n.lower() == plan.table.lower()
                    ),
                    table,
                )
            p = self._path(table)
            if (
                p.endswith(".parquet")
                and os.path.exists(p)
                and table not in self.tables
            ):
                # schema-validate + coerce literals; None → DuckDB fallback
                plan = resolve_plan(plan, self.schema(table))
            else:
                plan = None
            if plan is not None:
                flt = to_arrow_filter(plan.conds)
                need = plan.columns
                if need is not None:
                    # read SELECT ∪ WHERE columns, project to SELECT
                    read_cols = list(
                        dict.fromkeys(need + [c for c, _, _ in plan.conds])
                    )
                else:
                    read_cols = None
                ds = rd.read_parquet(p, columns=read_cols, filter=flt)
                if need is not None and read_cols != need:
                    ds = ds.select_columns(need)
                if columns is not None:
                    keep = [c for c in columns if need is None or c in need]
                    if keep:
                        ds = ds.select_columns(keep)
                return ds

        import duckdb

        con = duckdb.connect()
        try:
            for name in self.table_names():
                if name in self.tables:
                    con.register(name, self.tables[name])
                else:
                    p = self._path(table=name)
                    fn = (
                        "read_csv_auto" if p.endswith(".csv")
                        else "read_json_auto" if p.endswith(".json")
                        else "read_parquet"
                    )
                    con.execute(
                        f"CREATE VIEW {name} AS SELECT * FROM {fn}('{p}')"
                    )
            out = con.execute(sql).arrow()
        finally:
            con.close()
        if columns is not None:
            out = out.select([c for c in columns if c in out.column_names])
        return rd.from_arrow(out)

    def _load_with_rowid(
        self, table: str, columns: list[str] | None
    ) -> rd.Dataset:
        """Deterministic (file, row-group)-derived row ids, streamed.

        The DRIVER reads only parquet *metadata* (row-group row counts →
        cumulative rowid bases); the row-group DATA is read inside Ray
        tasks (one row group per task, ``batch_size=1`` over a Dataset of
        fragment descriptors) — the driver never materializes the table,
        so a no-PK Direct Mapping over a multi-TB table streams like any
        other scan. Rowids are stable under retries/resume because they
        are a pure function of (file order, row-group order).
        """
        frags: list[dict] = []
        total = 0
        for f in self.files(table):
            md = pq.ParquetFile(f).metadata
            for rg in range(md.num_row_groups):
                frags.append({"path": f, "rg": rg, "base": total})
                total += md.row_group(rg).num_rows

        cols = list(columns) if columns is not None else None

        def read_frag(batch: pa.Table) -> pa.Table:
            outs = []
            for path, rg, base in zip(
                batch.column("path").to_pylist(),
                batch.column("rg").to_pylist(),
                batch.column("base").to_pylist(),
            ):
                t = pq.ParquetFile(path).read_row_group(rg, columns=cols)
                outs.append(
                    t.append_column(
                        ROWID_COL,
                        pa.array(range(base, base + t.num_rows), pa.int64()),
                    )
                )
            return pa.concat_tables(outs)

        return rd.from_items(frags).map_batches(
            read_frag, batch_format="pyarrow", batch_size=1
        )

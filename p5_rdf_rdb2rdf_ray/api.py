"""Top-level factory API mirroring the reference's entry point.

Reference [R: RDB2RDF.pm :: new]:

    RDF::RDB2RDF->new('Simple', %mapping)        ->process($dbh)
    RDF::RDB2RDF->new('R2RML', $turtle)          ->process($dbh)
    RDF::RDB2RDF->new('DirectMapping', prefix=>) ->process($dbh)

Ours (the $dbh becomes a :class:`Catalog` over Parquet):

    m = RDB2RDF("Simple", mapping_dict, base=..., namespaces=...)
    m = RDB2RDF("R2RML", turtle_text, base=...)
    m = RDB2RDF("DirectMapping", prefix=..., rdfs=True)
    triples_ds = m.process(catalog)            # ray.data.Dataset of triples
    lines = m.process_ntriples(catalog)        # list[str] (small graphs)
"""

from __future__ import annotations

from typing import Any

import ray.data as rd

from .engine.runner import run_mapping
from .mapping.direct import direct_mapping, rdfs_schema_triples
from .mapping.r2rml import compile_r2rml
from .mapping.spec import MappingSpec, compile_simple
from .sinks.ntriples import collect_ntriples
from .sources.catalog import Catalog


class RDB2RDF:
    def __init__(self, mapper: str, *args: Any, **kwargs: Any):
        self.mapper = mapper
        self._args = args
        self._kwargs = kwargs
        if mapper == "Simple":
            self._spec: MappingSpec | None = compile_simple(
                args[0],
                base=kwargs.get("base", "http://example.com/"),
                namespaces=kwargs.get("namespaces"),
            )
        elif mapper == "R2RML":
            self._spec = compile_r2rml(
                args[0], base=kwargs.get("base", "http://example.com/base/")
            )
        elif mapper == "DirectMapping":
            self._spec = None  # needs the catalog (schema introspection)
        else:
            raise ValueError(f"unknown mapper {mapper!r}")

    def spec(self, catalog: Catalog | None = None) -> MappingSpec:
        if self._spec is not None:
            return self._spec
        assert catalog is not None, "DirectMapping needs a catalog"
        return direct_mapping(
            catalog,
            tables=self._kwargs.get("tables"),
            base=self._kwargs.get("prefix", "http://example.com/base/"),
        )

    def process(self, catalog: Catalog, **run_kwargs: Any) -> rd.Dataset:
        """→ lazy Dataset of triple rows (the reference returns a populated
        in-memory model; we return the stream).

        ``distinct`` defaults to ``"auto"``: the set-semantics shuffle —
        the dominant exchange of a mapping run — is elided whenever
        :func:`..engine.runner.is_duplicate_free` PROVES the compiled
        spec cannot emit a duplicate (always true for Direct Mapping;
        true for R2RML specs with injective PK subjects and distinct
        constant predicates). Pass ``distinct=True`` to force it."""
        run_kwargs.setdefault("distinct", "auto")
        ds = run_mapping(self.spec(catalog), catalog, **run_kwargs)
        if self.mapper == "DirectMapping" and self._kwargs.get("rdfs"):
            extra = rdfs_schema_triples(
                catalog,
                tables=self._kwargs.get("tables"),
                base=self._kwargs.get("prefix", "http://example.com/base/"),
            )
            ds = ds.union(rd.from_arrow(extra))
        return ds

    def process_ntriples(self, catalog: Catalog, **run_kwargs: Any) -> list[str]:
        """Materialized N-Triples lines — small graphs / tests only."""
        return collect_ntriples(self.process(catalog, **run_kwargs))

    def process_turtle(
        self,
        catalog: Catalog,
        prefixes: dict[str, str] | None = None,
        **run_kwargs: Any,
    ) -> str:
        """Materialized Turtle document (prefixed, subject-grouped) —
        the reference's primary output [R: RDB2RDF.pm :: process_turtle];
        small graphs / tests. At scale use ``sinks.turtle.write_turtle``
        over the subject-bucketed store instead."""
        from .sinks.turtle import collect_turtle

        if prefixes is None:
            prefixes = dict(self.spec(catalog).namespaces or {})
        return collect_turtle(self.process(catalog, **run_kwargs), prefixes)

"""p5_rdf_rdb2rdf_ray — Ray-Data-native knowledge-graph construction engine.

A from-scratch reimplementation of the *semantics* of the CPAN distribution
``RDF-RDB2RDF`` (tobyink/p5-rdf-rdb2rdf — W3C R2RML + Direct Mapping,
RDB rows → RDF triples), re-architected Ray-Data-first for Parquet
transcript tables at 10^12-turn scale (SURVEY.md).

Architecture mirrors the reference's "one engine, three front-ends" design
[R: RDF/RDB2RDF.pm :: new — the factory dispatches Simple | R2RML |
DirectMapping onto one executor]:

- front-ends (driver-side, pure Python):
    * :mod:`.mapping.spec`    — the IR (``MappingSpec``) + Simple-dict API
    * :mod:`.mapping.r2rml`   — R2RML Turtle-subset parser
    * :mod:`.mapping.direct`  — Direct Mapping compiler from a ``TableLayout``
- executor (distributed, Ray Data):
    * :mod:`.engine.executor` — vectorized triple expansion via ``map_batches``
      over zero-copy Arrow batches
    * :mod:`.engine.joins`    — RefObjectMap fast path (map-only) + general
      broadcast / bucketed hash join
    * :mod:`.engine.distinct` — set semantics (hash-bucketed distinct)
- sinks: partitioned Parquet triple store with per-partition lineage
  manifests (resumable), N-Triples/N-Quads text.
- graft stages: mention detection actor pool, connected-components
  canonicalization, dedup / similarity / text-analysis operators.
"""

__version__ = "0.1.0"

import logging as _logging


class _SchemaHashNoiseFilter(_logging.Filter):
    """Silence Ray's per-block "Failed to hash the schemas (for
    deduplication): unhashable type: 'dict'" warning. It fires for ANY
    parquet written with pandas schema metadata (``hash(pa.Schema)``
    raises when the metadata dict is present — harmless: Ray just skips
    the early-exit and unifies field-by-field). Our inputs are read-only
    testdata files carrying that metadata, so the benign warning would
    otherwise repeat once per schema-unify in every pipeline log."""

    def filter(self, record: _logging.LogRecord) -> bool:
        return "Failed to hash the schemas" not in record.getMessage()


_logging.getLogger(
    "ray.data._internal.arrow_ops.transform_pyarrow"
).addFilter(_SchemaHashNoiseFilter())

from .terms import TRIPLE_SCHEMA, KIND_IRI, KIND_BNODE, KIND_LITERAL  # noqa: F401

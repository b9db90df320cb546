"""stellar-ingest, reimagined PySpark-native.

A from-scratch CDC / incremental-ingest engine over an Iceberg-semantics
snapshot table ("icebox") of multi-turn conversation transcripts.

Capability lineage: the reference (huyph/stellar-ingest, a fork of CSIRO
Data61's stellar-ingest) is a schema-driven, validated, deduplicating
ingestion front-end for a governed analytical store.  This rebuild keeps
that capability surface but re-expresses it web-scale on the public
PySpark 4.x DataFrame API: columnar, distributed, incremental,
exactly-once.  See SURVEY.md for the full blueprint; BASELINE.json
`north_rule` is the binding spec (the reference checkout is empty —
SURVEY.md §0 — so no file:line citations into it are possible).
"""

__version__ = "0.1.0"

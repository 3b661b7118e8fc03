"""PySpark-native analytics + ingestion engine.

A from-scratch re-expression of the capabilities of
stouch/redis-events-to-clickhouse-tables (see SURVEY.md) as an
idiomatic PySpark engine:

- Layer A (reference parity): a Structured-Streaming ingestion engine
  with dynamic schema inference, nested-structure flattening, schema
  evolution, system-column stamping, a user transform hook, and
  dead-letter delivery semantics (reference: src/main.ts,
  src/clickhouse-batch-client.class.ts, src/bulker.class.ts).
- Layer B (query surface): the relational operator inventory plus
  LLM-data-pipeline operators (dedup, similarity search, text
  analysis, multimodal plumbing) over the driver's TPC-H-ish tables.

Everything is public PySpark DataFrame / SQL / Structured Streaming
API — no RDD hot paths, no Catalyst extensions needed.
"""

__version__ = "0.1.0"

"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference MySQL->ClickHouse replication river
(xieyuhua/mysql-syncer-clickhouse), re-expressed Spark-first.

Layers (see SURVEY.md):
  1. CDC/ETL layer  -- changelog model, routing/projection/rename, scalar
     transforms, upsert-by-dedup (ReplacingMergeTree analog), streaming
     apply with checkpointing.
  2. Query layer    -- the relational operator surface the reference
     delegates to ClickHouse, exposed via Spark SQL / DataFrame.
  3. LLM-pipeline   -- dedup (exact/minhash/simhash/jaccard), similarity
     search over embeddings, text analysis, multimodal plumbing.

Everything is DataFrame-native; Catalyst plans the physical execution.
"""

__version__ = "0.1.0"

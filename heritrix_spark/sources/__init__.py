"""Table storage: versioned-parquet SnapshotCatalog with atomic multi-table
commits and exact resume (Iceberg-snapshot semantics; swap in a real Iceberg
catalog on a cluster — the engine only uses this module's narrow API)."""

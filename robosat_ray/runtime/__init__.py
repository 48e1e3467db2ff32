"""Runtime concerns: per-partition lineage records, checkpointed
partitioned output with resume, hot-key salting (salting lives in
stages/spatial_join.hot_cell_map)."""

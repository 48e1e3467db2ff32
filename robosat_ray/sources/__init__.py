"""Sources/sinks beyond parquet: tiles CSV (reference robosat
tiles.py:103-120 format), partitioned checkpointed parquet lives in
runtime/resume.py."""

"""Pipeline orchestration (SURVEY §3): per-file run plan, warehouse, run log."""

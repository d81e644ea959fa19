"""Stage-DAG orchestration + lineage (SURVEY.md §7.1)."""

"""Pipeline operators (each one idempotent stage: DataFrame in -> DataFrame out)."""

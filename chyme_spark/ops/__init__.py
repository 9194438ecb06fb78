"""Operator modules. Each registers queries via chyme_spark.registry.query."""

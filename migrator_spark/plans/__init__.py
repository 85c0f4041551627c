"""Named query plans: the engine's public query surface.

``registry.REGISTRY`` maps query name -> QuerySpec(spark_fn, oracle_sql).
``__spark_entry__.py`` (driver contract) and the pytest differential
harness both consume it.
"""

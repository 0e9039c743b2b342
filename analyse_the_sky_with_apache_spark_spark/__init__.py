"""analyse_the_sky_with_apache_spark_spark — a PySpark-native analytics engine.

A plan-construction library + query registry re-expressing the capabilities
of the reference project (CharlesGaydon/Analyse-the-Sky-with-Apache-Spark,
absent at survey time — see SURVEY.md §0) in idiomatic Spark: declarative
DataFrame/SQL plans optimized by Catalyst, executed by Tungsten. We build
the logical-plan surface; Spark is the executor.

Layout:
    session.py    — SparkSession factory with the engine's config block
    catalog.py    — fixture loaders (incl. the ns-timestamp workaround)
    registry.py   — queries()/oracle_sql() registration decorator
    sources/      — scan/sink operators (parquet, csv, json, partitioned)
    operators/    — relational operators (filter/join/agg/window/sort/setop)
    functions/    — scalar-function families + vector math helpers
    streaming/    — Structured Streaming queries + replay harness
    pipeline/     — LLM-data-pipeline ops (dedup, similarity, text, multimodal)
    plans/        — physical-plan assertions (pushdown, broadcast, top-k)
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy public API — import-light so ``import
    analyse_the_sky_with_apache_spark_spark`` stays cheap.

    Exposes the pieces a library user composes directly:
    ``get_spark``, ``load_table``, ``register_views``, ``queries``,
    ``oracle_sql``, ``asof_join``.
    """
    if name == "get_spark":
        from .session import get_spark
        return get_spark
    if name in ("load_table", "register_views"):
        from . import catalog
        return getattr(catalog, name)
    if name in ("queries", "oracle_sql"):
        from . import registry
        return getattr(registry, name)
    if name == "asof_join":
        from .operators.asof import asof_join
        return asof_join
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")

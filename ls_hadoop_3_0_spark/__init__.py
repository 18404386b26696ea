"""ls_hadoop_3_0_spark — a PySpark-native analytics engine.

Re-expresses the query/data-processing capability surface of the reference
(``yncxcw/LS-Hadoop-3.0``, an Apache Hadoop 3.0 fork: HDFS + YARN + the
MapReduce operator library — see SURVEY.md §0-§2; the reference checkout at
/root/reference is empty, so all citations are to SURVEY.md rows which map
the public ``org.apache.hadoop.mapreduce.lib.*`` classes) as idiomatic
Spark DataFrame/SQL plans, plus the LLM-data-pipeline extensions
(dedup, similarity search, multimodal columns, text analysis).

Layout
------
- ``registry``   — the query-key registry (driver contract surface)
- ``session``    — SparkSession construction + runtime-conf normalization
- ``tables``     — fixture loading
- ``operators/`` — relational operators (filter/join/agg/sort/setops/window/udf)
- ``sources/``   — scan & sink parity (text/csv/partitioned/roundtrip)
- ``functions/`` — scalar-function surface + text analysis
- ``streaming/`` — event-time windowed analytics (batch-equivalent + readStream demo)
- ``llm/``       — dedup (exact/minhash/simhash/ngram/embedding), knn, multimodal
- ``plans/``     — physical-plan introspection helpers (pushdown/broadcast checks)

Importing this package populates ``registry.QUERIES`` / ``registry.ORACLES``.
"""

from __future__ import annotations

from ls_hadoop_3_0_spark import registry  # noqa: F401

# Import for side effect: each module registers its query keys.
from ls_hadoop_3_0_spark.operators import (  # noqa: F401
    aggregates,
    analytics,
    examples,
    graph,
    joins,
    relational,
    setops,
    sort,
    subqueries,
    timeseries,
    udf,
    windows,
)
from ls_hadoop_3_0_spark.sources import io  # noqa: F401
from ls_hadoop_3_0_spark.functions import scalars, text  # noqa: F401
from ls_hadoop_3_0_spark.streaming import batch_equiv, equiv  # noqa: F401
from ls_hadoop_3_0_spark.llm import (  # noqa: F401
    classifier,
    curation,
    dedup,
    embeddings,
    multimodal,
    pipeline,
    similarity,
)

QUERIES = registry.QUERIES
ORACLES = registry.ORACLES

__all__ = ["QUERIES", "ORACLES", "registry"]

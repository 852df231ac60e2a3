"""L1-L10 LLM-data-pipeline queries — ordered import shim.

The single 1,900-line llm_queries.py was split by tier in r12 (registry
hygiene, r11 verdict task 8). Importing THIS module imports the three
tier modules in the exact order the monolith defined its queries, so
the registration sequence — and therefore the driver's sampled window —
is byte-identical to the pre-split registry.
"""

from __future__ import annotations

from actuarial_reserve_modelling_spark.plans import (  # noqa: F401
    llm_queries_dedup,
    llm_queries_incremental,
    llm_queries_persisted,
)
from actuarial_reserve_modelling_spark.plans.llm_queries_dedup import (  # noqa: F401
    PLANT_OFFSET,
    plant_twins,
)

"""Query plans: the SURVEY.md §2 operator inventory as runnable queries.

Importing :mod:`actuarial_reserve_modelling_spark.plans.registry` pulls in
every query module and populates the registry that ``__spark_entry__.py``
exposes to the driver.
"""

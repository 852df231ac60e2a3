"""Custom operators: compositions of built-ins for semantics Spark lacks
as single calls (as-of join, MinHash-LSH dedup, ANN search, winnowing)."""

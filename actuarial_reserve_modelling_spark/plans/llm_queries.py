"""L1-L6 — LLM-data-pipeline queries (SURVEY §2.10). Filled in
Milestone 3; importing this module registers its queries."""

from __future__ import annotations

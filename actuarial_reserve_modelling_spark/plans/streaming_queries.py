"""T1-T6 — Structured Streaming queries (SURVEY §2.9). Filled in
Milestone 4; importing this module registers its queries."""

from __future__ import annotations

"""LLM-data-pipeline EXT operators (SURVEY.md §2.2, #27–#30). Filled in M3."""

from __future__ import annotations

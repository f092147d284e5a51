"""Streaming EXT operators (SURVEY.md §2.2, #31–#33). Filled in M4."""

from __future__ import annotations

"""Relational EXT operators (SURVEY.md §2.2, #14–#26). Filled in M2."""

from __future__ import annotations

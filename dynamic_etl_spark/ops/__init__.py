"""Operator library: pure DataFrame -> DataFrame functions built from native
Column expressions (no row-at-a-time Python UDFs — SURVEY.md §2.13)."""

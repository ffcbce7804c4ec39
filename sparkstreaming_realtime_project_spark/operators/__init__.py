"""Operator inventory (SURVEY.md §2) as composable DataFrame -> DataFrame
functions. Each module documents the reference operators it covers with
file:line citations."""

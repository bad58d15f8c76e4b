"""Sources & sinks: Ditto text format, pair CSV, eval logs (SURVEY.md §2.1)."""

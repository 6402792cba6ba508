"""crawlspark — a from-scratch PySpark-native crawl-frontier + fetch-scheduler
engine with the capabilities of tokawah/TripAdvisor-Crawling-Suite (see
SURVEY.md; reference semantics pinned by BASELINE.json — the reference tree
was empty in this sandbox, SURVEY.md §0)."""

__version__ = "0.1.0"

"""The F1 domain itself: the reference's bronze→silver→gold models and
dashboard queries on the laps/results/weather schema (FIXTURES.md), so a
user of the reference can run every query they run today against this
engine unchanged in meaning."""

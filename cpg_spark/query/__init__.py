"""Query surface over the materialized nodes/edges tables."""

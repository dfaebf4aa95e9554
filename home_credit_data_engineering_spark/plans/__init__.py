"""Query plans: the declared-query registry and the medallion pipeline."""

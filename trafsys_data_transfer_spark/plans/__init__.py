"""Query plans: the reference-parity traffic pipeline and relational queries."""

"""Property-graph model, fixture generator, and TPC-H→graph derivation."""

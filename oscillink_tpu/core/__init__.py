"""Host-side lattice container, receipts verification, comparators."""

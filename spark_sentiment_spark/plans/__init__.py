"""Query catalog exposed to the correctness/bench harness."""

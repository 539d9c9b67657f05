"""Planning: token-range split math, job planning."""

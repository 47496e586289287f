"""Reference-parity streaming pipelines."""

"""Source builders (batch + streaming)."""

"""Query catalog assembly."""

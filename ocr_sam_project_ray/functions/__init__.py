"""Pure deterministic function library (no Ray imports here)."""

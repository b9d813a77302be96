"""Sinks: grouped/partitioned writers and tile-format encoders."""

"""Distributed Spark plan: scan → page fan-out → kernel UDFs → assembly → sinks."""

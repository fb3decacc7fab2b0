"""Sinks: sharded writers (O33) and the TFRecord container format (O35)."""

"""Structured Streaming operators (§2.9 extensions): windowed metrics,
histograms, drift, stateful running stats, watermark-bounded dedup."""

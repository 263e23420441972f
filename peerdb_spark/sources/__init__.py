"""Source-side decoders: wire formats → canonical changelog rows."""

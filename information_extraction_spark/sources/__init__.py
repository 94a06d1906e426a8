"""Table sources/sinks: fixture loaders, transcripts derivation, and
the partitioned graph writer."""

"""Sources and sinks: edge-list files, corpus tables, checkpoints."""
